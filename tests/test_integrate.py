"""Opacity-field integrate op vs a sequential numpy oracle.

The oracle restates the reference integrateCUDA semantics
(forward.cu:1156-1195) literally: per point, walk the gaussians whose tile
rect covers the point's pixel, evaluate the ray quadratic at
t = min(t_peak, point_depth), skip alpha < 1/255, and accumulate
sum alpha_i prod_{j<i} (1 - alpha_j) in order — which must equal the
order-independent product form the TPU op uses.
"""
import jax.numpy as jnp
import numpy as np

from f3d_gaus_tpu.core import gaussians as G
from f3d_gaus_tpu.ops import binning as B
from f3d_gaus_tpu.ops import integrate as I

from conftest import make_gaussian_cloud


def oracle_integrate(means, scales, quats, opac, shs, cam, points):
    pre = G.preprocess(jnp.asarray(means), jnp.asarray(scales),
                       jnp.asarray(quats), jnp.asarray(opac),
                       jnp.asarray(shs), 1, cam)
    xmin, ymin, xmax, ymax, _ = B.tile_rects(pre.means2d, pre.radii,
                                             cam.width, cam.height)
    xmin, ymin = np.asarray(xmin), np.asarray(ymin)
    xmax, ymax = np.asarray(xmax), np.asarray(ymax)
    mb = np.asarray(pre.v2g_mb)
    opa = np.asarray(pre.opa_coef)
    depths = np.asarray(pre.depths)

    px, py, pdepth, inside = I.project_query_points(
        jnp.asarray(points), jnp.asarray(cam.world_view),
        jnp.asarray(cam.full_proj), cam.width, cam.height)
    px, py = np.asarray(px), np.asarray(py)
    pdepth, inside = np.asarray(pdepth), np.asarray(inside)

    out = np.zeros(len(points), np.float32)
    order = np.argsort(depths, kind="stable")   # front-to-back, as binned
    for q in range(len(points)):
        if not inside[q]:
            continue
        tx, ty = int(px[q] // 16), int(py[q] // 16)
        u = (px[q] - cam.width / 2.0) / cam.focal_x
        v = (py[q] - cam.height / 2.0) / cam.focal_y
        d = np.array([u, v, 1.0], np.float32)
        T, acc = 1.0, 0.0
        for g in order:
            if not (xmin[g] <= tx < xmax[g] and ymin[g] <= ty < ymax[g]):
                continue
            M = mb[g, :9].reshape(3, 3)
            b = mb[g, 9:]
            a = M @ d
            AA = float(a @ a)
            t = -float(a @ b) / max(AA, 1e-12)
            t = min(t, float(pdepth[q]))
            gv = t * a + b
            alpha = min(0.99, opa[g] * np.exp(-0.5 * float(gv @ gv)))
            if alpha < 1.0 / 255.0:
                continue
            acc += alpha * T
            T *= 1.0 - alpha
        out[q] = acc
    return out


class TestIntegrate:
    def test_matches_sequential_oracle(self, rng, small_camera):
        means, scales, quats, opac, shs = make_gaussian_cloud(rng, 48)
        # query points: gaussian centers + jittered copies + outliers
        pts = np.concatenate([
            means,
            means + rng.normal(scale=0.05, size=means.shape).astype(np.float32),
            rng.normal(size=(32, 3)).astype(np.float32) * 2.0 + [0, 0, 7.667],
        ]).astype(np.float32)
        got = np.asarray(I.integrate_points(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs), small_camera,
            jnp.asarray(pts), pair_cap=1 << 12, max_per_tile=64, chunk=16,
            point_chunk=32)["alpha_integrated"])
        ref = oracle_integrate(means, scales, quats, opac, shs,
                               small_camera, pts)
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_field_direction(self, rng, small_camera):
        """Points behind the cloud see accumulated opacity; points far in
        front of it see ~none (the t-clamp kills every contribution)."""
        means, scales, quats, opac, shs = make_gaussian_cloud(
            rng, 64, spread=0.1, scale_range=(0.05, 0.1))
        opac[:] = 0.9
        behind = means + np.array([0, 0, 0.8], np.float32)
        front = means - np.array([0, 0, 0.8], np.float32)
        args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
                jnp.asarray(opac), jnp.asarray(shs), small_camera)
        a_behind = np.asarray(I.integrate_points(
            *args, jnp.asarray(behind), max_per_tile=128,
            point_chunk=64)["alpha_integrated"])
        a_front = np.asarray(I.integrate_points(
            *args, jnp.asarray(front), max_per_tile=128,
            point_chunk=64)["alpha_integrated"])
        assert a_behind.mean() > 0.5
        assert a_front.mean() < 0.05
        assert (a_behind >= a_front - 1e-5).mean() > 0.95

    def test_color_gather_and_outside_points(self, rng, small_camera):
        means, scales, quats, opac, shs = make_gaussian_cloud(rng, 16)
        img = jnp.arange(3 * 32 * 32, dtype=jnp.float32).reshape(3, 32, 32)
        pts = np.array([[100.0, 100.0, 7.7], [0.0, 0.0, 7.667]], np.float32)
        out = I.integrate_points(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs), small_camera,
            jnp.asarray(pts), pixel_color=img, point_chunk=8)
        c = np.asarray(out["color_integrated"])
        assert (c[0] == 0).all()            # outside the frustum
        assert (c[1] != 0).any()            # gathered from the image
