"""Record the framework's numerical accuracy vs the f64 oracle into
ACCURACY.json (the BASELINE.md "pixel-grad max abs err" row).

The oracle (ops/rasterize_ref.py) restates the CUDA kernel semantics
(forward.cu:409-612 / backward.cu:634-955) sequentially in numpy f64;
the production path runs f32 like the CUDA kernel itself, so the numbers
below bound |f32 path - exact math| — the same quantity "allclose to the
CUDA reference" targets, without needing a GPU in this image.

Runs on CPU (the oracle is numpy); the production path's TPU lowering is
separately anchored on-device by bench.py's parity_max_err.

Usage: python scripts/record_accuracy.py
"""
import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

from conftest import make_gaussian_cloud  # noqa: E402
from f3d_gaus_tpu.core import cameras, gaussians as G  # noqa: E402
from f3d_gaus_tpu.ops import binning, rasterize, rasterize_ref  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    _, inv_first = cameras.canonical_camera_set(13.164, 7.667, 7.667,
                                                6.667, 8.667)
    cs = cameras.build_camera_set(
        np.array([0.12], np.float32), np.array([-0.07], np.float32),
        7.667, 7.667, 13.164, 6.667, 8.667, rebase=inv_first)
    cam = cs.camera(0, 32, 32, np.tan(13.164 * np.pi / 360),
                    np.tan(13.164 * np.pi / 360))
    cloud = make_gaussian_cloud(rng, 96, spread=0.35,
                                scale_range=(0.02, 0.12))
    means, scales, quats, opac, shs = [jnp.asarray(a) for a in cloud]
    pre = G.preprocess(means, scales, quats, opac, shs, 1, cam)
    bg = np.array([0.15, 0.1, 0.05], np.float32)

    # ---- forward: production f32 vs f64 oracle
    oracle = rasterize_ref.render_forward(pre, cam, bg)
    out = rasterize.render(means, scales, quats, opac, shs, cam,
                           jnp.asarray(bg), pair_cap=1 << 14,
                           max_per_tile=256, chunk=32)
    got = np.asarray(out["out9"])
    fwd_err = {}
    names = {"rgb": slice(0, 3), "normal": slice(3, 6), "alpha": slice(7, 8),
             "distortion": slice(8, 9)}
    for k, sl in names.items():
        fwd_err[k] = float(np.abs(got[sl] - oracle.out[sl]).max())
    # depth is a discrete (median) selection; report the flip fraction
    fwd_err["depth_flip_fraction"] = float(
        np.mean(np.abs(got[6] - oracle.out[6]) > 1e-3))

    # ---- backward: composite grads vs f64 oracle backward (same contract
    # as tests/test_rasterize_parity.py::TestBackwardParity)
    mb = np.asarray(pre.v2g_mb, np.float64)
    M = mb[:, :9].reshape(-1, 3, 3)
    b = mb[:, 9:]
    A = np.einsum('pki,pkj->pij', M, M)
    v2g64 = np.concatenate([
        np.stack([A[:, 0, 0], A[:, 0, 1], A[:, 0, 2],
                  A[:, 1, 1], A[:, 1, 2], A[:, 2, 2]], -1),
        np.einsum('pkj,pk->pj', M, b),
        np.sum(b * b, -1, keepdims=True)], -1)
    pre64 = pre._replace(v2g=v2g64)
    ofwd = rasterize_ref.render_forward(pre64, cam, bg)
    dL = rng.normal(size=(9, cam.height, cam.width)).astype(np.float32)
    dL[7] = 0.0
    obwd = rasterize_ref.render_backward(pre64, cam, bg, ofwd, dL)

    def fn(v2g_mb, rgb, opa, m2d_stats):
        bng = binning.bin_gaussians(pre.means2d, pre.radii, pre.depths,
                                    cam.width, cam.height, 1 << 14)
        s = rasterize.RasterStatics(cam.width, cam.height, 2, 2,
                                    float(cam.focal_x), float(cam.focal_y),
                                    256, 32)
        o, _ = rasterize.composite(v2g_mb, rgb, opa, pre.conic,
                                   pre.means2d, m2d_stats,
                                   bng.point_list, bng.pair_valid,
                                   bng.tile_start, bng.tile_count,
                                   jnp.asarray(bg), jnp.zeros((), jnp.int32),
                                   s)
        return jnp.sum(rasterize._tiles_to_image(o, s) * jnp.asarray(dL))

    m2d_stats = jnp.zeros((means.shape[0], 3), jnp.float32)
    dmb, drgb, dopa, dm2d = [np.asarray(g) for g in jax.grad(
        fn, argnums=(0, 1, 2, 3))(pre.v2g_mb, pre.rgb, pre.opa_coef,
                                  m2d_stats)]

    def pack(mbq):
        Mq = mbq[..., :9].reshape(mbq.shape[:-1] + (3, 3))
        bq = mbq[..., 9:]
        Aq = jnp.einsum('...ki,...kj->...ij', Mq, Mq)
        B3 = jnp.einsum('...kj,...k->...j', Mq, bq)
        Cq = jnp.sum(bq * bq, -1, keepdims=True)
        tri = jnp.stack([Aq[..., 0, 0], Aq[..., 0, 1], Aq[..., 0, 2],
                         Aq[..., 1, 1], Aq[..., 1, 2], Aq[..., 2, 2]], -1)
        return jnp.concatenate([tri, B3, Cq], -1)

    _, vjp_fn = jax.vjp(pack, jnp.asarray(np.asarray(pre.v2g_mb)))
    (dmb_exp,) = vjp_fn(jnp.asarray(obwd["dL_dv2g"], jnp.float32))
    dmb_exp = np.asarray(dmb_exp)

    def rel(a, want):
        scale = np.abs(want).max() + 1e-6
        return {"max_abs_err": float(np.abs(a - want).max()),
                "max_abs_grad": float(np.abs(want).max()),
                "rel_err": float(np.abs(a - want).max() / scale)}

    bwd_err = {
        "d_view2gaussian_mb": rel(dmb, dmb_exp),
        "d_rgb": rel(drgb, obwd["dL_drgb"]),
        "d_opacity": rel(dopa, obwd["dL_dopa_coef"]),
        "d_mean2d_stats": rel(dm2d, obwd["dL_dmean2d"]),
    }

    rec = {"oracle": "ops/rasterize_ref.py (CUDA semantics, numpy f64)",
           "scene": "96 gaussians, 32x32, canonical F3D-Gaus camera",
           "forward_max_abs_err": fwd_err,
           "pixel_grad_err_vs_f64_oracle": bwd_err}
    path = os.path.join(ROOT, "ACCURACY.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
