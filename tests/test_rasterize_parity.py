"""Parity of the XLA parallel-compositing rasterizer against the sequential
oracle (literal CUDA semantics), forward and backward, plus finite-difference
validation of the end-to-end gradients on the non-detached channels."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f3d_gaus_tpu.core import gaussians as G
from f3d_gaus_tpu.ops import binning, rasterize, rasterize_ref
from tests.conftest import make_gaussian_cloud


def _setup(rng, n=96, width=32, height=32, seed_cam=True):
    from f3d_gaus_tpu.core import cameras
    _, inv_first = cameras.canonical_camera_set(13.164, 7.667, 7.667,
                                                6.667, 8.667)
    cs = cameras.build_camera_set(
        np.array([0.12], np.float32), np.array([-0.07], np.float32),
        7.667, 7.667, 13.164, 6.667, 8.667, rebase=inv_first)
    cam = cs.camera(0, width, height, np.tan(13.164 * np.pi / 360),
                    np.tan(13.164 * np.pi / 360))
    cloud = make_gaussian_cloud(rng, n, spread=0.35, scale_range=(0.02, 0.12))
    return cam, cloud


def _pre(cam, cloud):
    means, scales, quats, opac, shs = cloud
    return G.preprocess(jnp.asarray(means), jnp.asarray(scales),
                        jnp.asarray(quats), jnp.asarray(opac),
                        jnp.asarray(shs), 1, cam)


class TestBinningParity:
    def test_tile_lists_match_oracle(self, rng):
        cam, cloud = _setup(rng)
        pre = _pre(cam, cloud)
        lists = rasterize_ref.build_tile_lists(
            np.asarray(pre.means2d), np.asarray(pre.radii),
            np.asarray(pre.depths), np.asarray(pre.valid),
            cam.width, cam.height)
        bng = binning.bin_gaussians(pre.means2d, pre.radii, pre.depths,
                                    cam.width, cam.height, pair_cap=1 << 14)
        assert not bool(bng.overflow)
        pl = np.asarray(bng.point_list)
        start = np.asarray(bng.tile_start)
        count = np.asarray(bng.tile_count)
        for t, ids in enumerate(lists):
            got = pl[start[t]:start[t] + count[t]]
            np.testing.assert_array_equal(got, ids,
                                          err_msg=f"tile {t} ordering differs")

    def test_culled_gaussian_between_visible_ones(self, rng):
        """Regression: a radii=0 gaussian INTERLEAVED between visible ones
        (the state per-scene training reaches after any prune) must not
        shift the pair expansion — slot owners are global gaussian indices,
        not ranks among non-empty gaussians."""
        cam, cloud = _setup(rng, n=5)
        pre = _pre(cam, cloud)
        radii = np.asarray(pre.radii).copy()
        assert (radii > 0).all()
        radii[1] = 0          # cull the second gaussian
        radii[3] = 0          # and a middle one
        radii_j = jnp.asarray(radii)
        lists = rasterize_ref.build_tile_lists(
            np.asarray(pre.means2d), radii,
            np.asarray(pre.depths), np.asarray(pre.valid),
            cam.width, cam.height)
        bng = binning.bin_gaussians(pre.means2d, radii_j, pre.depths,
                                    cam.width, cam.height, pair_cap=1 << 12)
        pl = np.asarray(bng.point_list)
        start = np.asarray(bng.tile_start)
        count = np.asarray(bng.tile_count)
        seen = set()
        for t, ids in enumerate(lists):
            got = pl[start[t]:start[t] + count[t]]
            np.testing.assert_array_equal(got, ids)
            seen.update(got.tolist())
        assert 1 not in seen and 3 not in seen
        assert {0, 2, 4} <= seen, "live gaussians after culled ones must render"

    def test_wide_frame_unpacked_fallback(self, rng):
        """grid_x > 127 (width > 2032) can't use the packed rect word; the
        two-pass fill-forward fallback must produce identical tile lists
        (capability the CUDA reference has for arbitrary widths)."""
        width, height = 2560, 32          # grid_x = 160
        cam, cloud = _setup(rng, n=48, width=width, height=height)
        pre = _pre(cam, cloud)
        lists = rasterize_ref.build_tile_lists(
            np.asarray(pre.means2d), np.asarray(pre.radii),
            np.asarray(pre.depths), np.asarray(pre.valid), width, height)
        bng = binning.bin_gaussians(pre.means2d, pre.radii, pre.depths,
                                    width, height, pair_cap=1 << 14)
        assert not bool(bng.overflow)
        pl = np.asarray(bng.point_list)
        start = np.asarray(bng.tile_start)
        count = np.asarray(bng.tile_count)
        for t, ids in enumerate(lists):
            np.testing.assert_array_equal(pl[start[t]:start[t] + count[t]],
                                          ids, err_msg=f"tile {t}")

    def test_packed_rank_middle_branch(self, rng):
        """slot_bits + tile_bits > 31 but rank fits: the packed-rank
        branch (marks cumsum) must produce identical tile lists to the
        oracle — large-frame x large-pair_cap configs stay off the slow
        3-operand wide sort."""
        width, height = 2048, 32           # 128 x 2 = 256 tiles (9 bits)
        cam, cloud = _setup(rng, n=32, width=width, height=height)
        pre = _pre(cam, cloud)
        lists = rasterize_ref.build_tile_lists(
            np.asarray(pre.means2d), np.asarray(pre.radii),
            np.asarray(pre.depths), np.asarray(pre.valid), width, height)
        # pair_cap 2^23 -> slot 23 + tile 9 = 32 > 31; rank bits(31) = 5
        bng = binning.bin_gaussians(pre.means2d, pre.radii, pre.depths,
                                    width, height, pair_cap=1 << 23)
        pl = np.asarray(bng.point_list)
        start = np.asarray(bng.tile_start)
        count = np.asarray(bng.tile_count)
        for t, ids in enumerate(lists):
            np.testing.assert_array_equal(pl[start[t]:start[t] + count[t]],
                                          ids, err_msg=f"tile {t}")

    def test_pair_count_and_overflow(self, rng):
        cam, cloud = _setup(rng)
        pre = _pre(cam, cloud)
        n = int(binning.count_pairs(pre.means2d, pre.radii, cam.width, cam.height))
        assert n > 0
        bng = binning.bin_gaussians(pre.means2d, pre.radii, pre.depths,
                                    cam.width, cam.height, pair_cap=max(n - 5, 1))
        assert bool(bng.overflow)


class TestForwardParity:
    def test_forward_matches_oracle(self, rng):
        cam, cloud = _setup(rng)
        pre = _pre(cam, cloud)
        bg = np.array([0.1, 0.2, 0.3], np.float32)
        oracle = rasterize_ref.render_forward(pre, cam, bg)

        means, scales, quats, opac, shs = cloud
        out = rasterize.render(jnp.asarray(means), jnp.asarray(scales),
                               jnp.asarray(quats), jnp.asarray(opac),
                               jnp.asarray(shs), cam, jnp.asarray(bg),
                               pair_cap=1 << 14, max_per_tile=256, chunk=32)
        got = np.asarray(out["out9"])
        # The oracle runs in f64; the XLA path is f32 like the CUDA kernel.
        # Measured: XLA-vs-f64 max err 8e-4 < f32-oracle-vs-f64 err 2.7e-3,
        # i.e. the parallel formulation is *more* accurate than a literal f32
        # evaluation; tolerances reflect f32 precision, not logic slack.
        np.testing.assert_allclose(got[0:3], oracle.out[0:3], atol=2e-3)
        np.testing.assert_allclose(got[3:6], oracle.out[3:6], atol=2e-3)
        np.testing.assert_allclose(got[7], oracle.out[7], atol=2e-3)
        # median depth: discrete selection — allow rare boundary flips
        frac_bad = np.mean(np.abs(got[6] - oracle.out[6]) > 1e-3)
        assert frac_bad < 0.01, f"median depth mismatch fraction {frac_bad}"
        np.testing.assert_allclose(got[8], oracle.out[8], atol=2e-3)

    def test_final_T_and_contributors(self, rng):
        cam, cloud = _setup(rng)
        pre = _pre(cam, cloud)
        bg = np.zeros(3, np.float32)
        oracle = rasterize_ref.render_forward(pre, cam, bg)
        means, scales, quats, opac, shs = cloud
        out = rasterize.render(jnp.asarray(means), jnp.asarray(scales),
                               jnp.asarray(quats), jnp.asarray(opac),
                               jnp.asarray(shs), cam, jnp.asarray(bg),
                               pair_cap=1 << 14, max_per_tile=256, chunk=32)
        aux = out["aux"]
        s = rasterize.RasterStatics(cam.width, cam.height, 2, 2,
                                    float(cam.focal_x), float(cam.focal_y), 256, 32)
        T_img = np.asarray(rasterize._tiles_to_image(
            np.asarray(aux.final_T)[..., None], s))[0]
        np.testing.assert_allclose(T_img, oracle.final_T[0], atol=3e-3)

    def test_background_only_where_empty(self, rng):
        cam, _ = _setup(rng)
        # one gaussian far off-screen
        means = np.array([[50.0, 50.0, 7.7]], np.float32)
        scales = np.full((1, 3), 0.05, np.float32)
        quats = np.array([[1, 0, 0, 0]], np.float32)
        opac = np.ones((1, 1), np.float32)
        shs = np.zeros((1, 4, 3), np.float32)
        bg = np.array([0.25, 0.5, 0.75], np.float32)
        out = rasterize.render(jnp.asarray(means), jnp.asarray(scales),
                               jnp.asarray(quats), jnp.asarray(opac),
                               jnp.asarray(shs), cam, jnp.asarray(bg),
                               pair_cap=1 << 10, max_per_tile=64, chunk=32)
        img = np.asarray(out["render"])
        np.testing.assert_allclose(img, bg[:, None, None] * np.ones_like(img), atol=1e-6)

    def test_early_stop_equivalence(self, rng):
        """Stack many near-opaque gaussians so the CUDA early-exit path
        triggers; masked-prefix formulation must agree with the oracle."""
        cam, _ = _setup(rng)
        n = 64
        means = np.tile(np.array([[0.0, 0.0, 7.4]], np.float32), (n, 1))
        means[:, 2] += np.linspace(0, 0.8, n).astype(np.float32)
        means[:, :2] += rng.normal(size=(n, 2)).astype(np.float32) * 0.02
        scales = np.full((n, 3), 0.3, np.float32)
        quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
        opac = np.full((n, 1), 0.95, np.float32)
        shs = rng.normal(size=(n, 4, 3)).astype(np.float32) * 0.2
        bg = np.zeros(3, np.float32)
        pre = G.preprocess(jnp.asarray(means), jnp.asarray(scales),
                           jnp.asarray(quats), jnp.asarray(opac),
                           jnp.asarray(shs), 1, cam)
        oracle = rasterize_ref.render_forward(pre, cam, bg)
        assert (oracle.final_T[0] < 1e-3).any(), "early stop should trigger"
        out = rasterize.render(jnp.asarray(means), jnp.asarray(scales),
                               jnp.asarray(quats), jnp.asarray(opac),
                               jnp.asarray(shs), cam, jnp.asarray(bg),
                               pair_cap=1 << 14, max_per_tile=256, chunk=16)
        np.testing.assert_allclose(np.asarray(out["out9"])[0:3],
                                   oracle.out[0:3], atol=5e-5)
        np.testing.assert_allclose(np.asarray(out["out9"])[6],
                                   oracle.out[6], atol=1e-4)


class TestBackwardParity:
    def test_backward_matches_oracle(self, rng):
        cam, cloud = _setup(rng, n=64)
        pre = _pre(cam, cloud)
        # Feed the oracle a v2g derived (in f64) from the SAME f32 (M, b)
        # values the XLA path consumes — otherwise the two independently
        # f32-rounded packings differ by ~1e-3 absolute in min_value (the
        # quadratic forms are ~1e4) and the comparison measures packing
        # noise, not backward logic.
        mb = np.asarray(pre.v2g_mb, np.float64)
        M = mb[:, :9].reshape(-1, 3, 3)
        b = mb[:, 9:]
        A = np.einsum('pki,pkj->pij', M, M)
        v2g64 = np.concatenate([
            np.stack([A[:, 0, 0], A[:, 0, 1], A[:, 0, 2],
                      A[:, 1, 1], A[:, 1, 2], A[:, 2, 2]], -1),
            np.einsum('pkj,pk->pj', M, b),
            np.sum(b * b, -1, keepdims=True)], -1)
        pre = pre._replace(v2g=v2g64)
        bg = np.array([0.15, 0.1, 0.05], np.float32)
        oracle_fwd = rasterize_ref.render_forward(pre, cam, bg)
        dL = rng.normal(size=(9, cam.height, cam.width)).astype(np.float32)
        dL[7] = 0.0  # alpha channel has no grad path in the reference
        oracle_bwd = rasterize_ref.render_backward(pre, cam, bg, oracle_fwd, dL)

        means, scales, quats, opac, shs = cloud

        def fn(v2g_mb, rgb, opa, conic, m2d_stats):
            bng = binning.bin_gaussians(pre.means2d, pre.radii, pre.depths,
                                        cam.width, cam.height, 1 << 14)
            s = rasterize.RasterStatics(cam.width, cam.height, 2, 2,
                                        float(cam.focal_x), float(cam.focal_y),
                                        256, 32)
            out, aux = rasterize.composite(v2g_mb, rgb, opa, conic,
                                           pre.means2d, m2d_stats,
                                           bng.point_list, bng.pair_valid,
                                           bng.tile_start, bng.tile_count,
                                           jnp.asarray(bg),
                                           jnp.zeros((), jnp.int32), s)
            img = rasterize._tiles_to_image(out, s)
            return jnp.sum(img * jnp.asarray(dL))

        m2d_stats = jnp.zeros((means.shape[0], 3), jnp.float32)
        grads = jax.grad(fn, argnums=(0, 1, 2, 4))(
            pre.v2g_mb, pre.rgb, pre.opa_coef, pre.conic, m2d_stats)
        dmb, drgb, dopa, dm2d = [np.asarray(g) for g in grads]

        # The composite loss depends on (M, b) exactly through the CUDA
        # 10-float packing v2g = pack(M, b) = (M^T M upper6, M^T b, |b|^2),
        # so the expected mb-gradient is the oracle cotangent pulled back
        # through pack's vjp.
        def pack(mb):
            M = mb[..., :9].reshape(mb.shape[:-1] + (3, 3))
            b = mb[..., 9:]
            A = jnp.einsum('...ki,...kj->...ij', M, M)
            B3 = jnp.einsum('...kj,...k->...j', M, b)
            C = jnp.sum(b * b, -1, keepdims=True)
            tri = jnp.stack([A[..., 0, 0], A[..., 0, 1], A[..., 0, 2],
                             A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]], -1)
            return jnp.concatenate([tri, B3, C], -1)

        mb64 = jnp.asarray(np.asarray(pre.v2g_mb), jnp.float32)
        _, vjp_fn = jax.vjp(pack, mb64)
        (dmb_expected,) = vjp_fn(jnp.asarray(oracle_bwd["dL_dv2g"], jnp.float32))
        dmb_expected = np.asarray(dmb_expected)

        scale = np.abs(dmb_expected).max() + 1e-6
        np.testing.assert_allclose(dmb, dmb_expected, atol=2e-4 * scale)
        np.testing.assert_allclose(drgb, oracle_bwd["dL_drgb"], atol=1e-4)
        np.testing.assert_allclose(dopa, oracle_bwd["dL_dopa_coef"], atol=2e-4)
        sc2 = np.abs(oracle_bwd["dL_dmean2d"]).max() + 1e-6
        np.testing.assert_allclose(dm2d, oracle_bwd["dL_dmean2d"],
                                   atol=2e-4 * sc2)


class TestEndToEndGradients:
    @pytest.mark.slow
    def test_finite_differences_rgb_normal(self, rng):
        """Full-chain gradients (through preprocess) vs central differences
        on the RGB+normal channels (no detached paths there)."""
        cam, cloud = _setup(rng, n=24)
        means, scales, quats, opac, shs = cloud
        bg = jnp.zeros(3, jnp.float32)
        w9 = rng.normal(size=(6, cam.height, cam.width)).astype(np.float32)

        def loss(means, scales, quats, opac, shs):
            out = rasterize.render(means, scales, quats, opac, shs, cam, bg,
                                   pair_cap=1 << 12, max_per_tile=128, chunk=32)
            return jnp.sum(out["out9"][0:6] * w9)

        args = [jnp.asarray(a) for a in (means, scales, quats, opac, shs)]
        grads = jax.grad(loss, argnums=tuple(range(5)))(*args)

        f64args = [np.asarray(a, np.float64) for a in args]

        def central_diff(ai, j, eps):
            flat = f64args[ai].reshape(-1)
            e = np.zeros_like(flat); e[j] = eps
            pert = [a.copy() for a in f64args]
            pert[ai] = (flat + e).reshape(f64args[ai].shape)
            lp = float(loss(*[jnp.asarray(p, jnp.float32) for p in pert]))
            pert[ai] = (flat - e).reshape(f64args[ai].shape)
            lm = float(loss(*[jnp.asarray(p, jnp.float32) for p in pert]))
            return (lp - lm) / (2 * eps)

        rng2 = np.random.default_rng(7)
        checked = 0
        for ai in range(5):
            flat = f64args[ai].reshape(-1)
            for trial in range(8):
                j = int(rng2.integers(flat.size))
                fd = central_diff(ai, j, 1e-4)
                fd2 = central_diff(ai, j, 3e-5)
                # discrete structures (tile membership, eligibility masks)
                # make the loss piecewise, and the f32 forward makes each FD
                # estimate noisy; skip indices where the two-step estimates
                # disagree (step straddles a boundary / noise-dominated) and
                # budget the tolerance with the observed FD disagreement.
                fd_noise = abs(fd - fd2)
                if fd_noise > 0.02 * max(1.0, abs(fd), abs(fd2)):
                    continue
                checked += 1
                an = float(np.asarray(grads[ai]).reshape(-1)[j])
                tol = 3e-2 * max(1.0, abs(fd), abs(an)) + 3.0 * fd_noise
                assert abs(fd - an) < tol, (
                    f"arg {ai} idx {j}: fd={fd:.5f} fd2={fd2:.5f} "
                    f"analytic={an:.5f}")
        assert checked >= 10, f"too few smooth FD samples ({checked})"

    def test_densification_stats_via_grad_tap(self, rng):
        cam, cloud = _setup(rng, n=32)
        means, scales, quats, opac, shs = cloud
        stats0 = jnp.zeros((means.shape[0], 3), jnp.float32)

        def loss(stats):
            out = rasterize.render(jnp.asarray(means), jnp.asarray(scales),
                                   jnp.asarray(quats), jnp.asarray(opac),
                                   jnp.asarray(shs), cam,
                                   jnp.zeros(3, jnp.float32),
                                   pair_cap=1 << 12, max_per_tile=128,
                                   chunk=32, means2d_stats=stats)
            return jnp.sum(out["render"])

        stats_grad = jax.grad(loss)(stats0)
        sg = np.asarray(stats_grad)
        assert np.isfinite(sg).all()
        assert (sg[:, 2] >= -1e-7).all(), "abs-grad channel is nonnegative"
        assert (np.abs(sg).sum() > 0), "stats should be populated"
