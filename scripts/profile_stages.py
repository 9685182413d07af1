"""Fine-grained stage decomposition of the pallas fwd+bwd render on TPU.

Times each piece of the pipeline in isolation (own jit, block_until_ready)
so the perf work attacks the right bucket.  Usage:
    python scripts/profile_stages.py [pair_cap_log2] [max_per_tile]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from f3d_gaus_tpu.core import cameras, gaussians as G
from f3d_gaus_tpu.ops import rasterize as R, binning as B, pallas_raster as PR


def timed(fn, *args, iters=20, label=""):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:40s} {dt:8.2f} ms")
    return out, dt


def main(pair_cap_log2=18, max_per_tile=1024):
    res = 256
    n = 256 * 256
    pair_cap = 1 << pair_cap_log2
    rng = np.random.default_rng(0)
    _, inv_first = cameras.canonical_camera_set(13.164, 7.667, 7.667,
                                                6.667, 8.667)
    cs = cameras.build_camera_set(
        np.array([0.12], np.float32), np.array([-0.07], np.float32),
        7.667, 7.667, 13.164, 6.667, 8.667, rebase=inv_first)
    cam = cs.camera(0, res, res, np.tan(13.164 * np.pi / 360),
                    np.tan(13.164 * np.pi / 360))

    means = (rng.normal(size=(n, 3)) * 0.45 + [0, 0, 7.667]).astype(np.float32)
    scales = rng.uniform(0.004, 0.02, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.2, 0.9, size=(n, 1)).astype(np.float32)
    shs = (rng.normal(size=(n, 4, 3)) * 0.3).astype(np.float32)
    shs[:, 0] += 0.8
    args = [jnp.asarray(a) for a in (means, scales, quats, opac, shs)]
    bg = jnp.zeros(3, jnp.float32)

    print(f"pair_cap=2^{pair_cap_log2}  max_per_tile={max_per_tile}")

    # --- preprocess and subparts
    pre_fn = jax.jit(lambda *a: G.preprocess(*a, 1, cam, 0.0, 1.0))
    p, _ = timed(pre_fn, *args, label="preprocess total")
    wv = jnp.asarray(cam.world_view)
    fp = jnp.asarray(cam.full_proj)
    timed(jax.jit(lambda m: G.project_points(m, wv, fp)), args[0],
          label="  project_points")
    timed(jax.jit(lambda s, q: G.build_cov3d(s, q, 1.0)), args[1], args[2],
          label="  build_cov3d")
    c3 = jax.jit(lambda s, q: G.build_cov3d(s, q, 1.0))(args[1], args[2])
    timed(jax.jit(lambda m, c: G.cov2d_and_coef(
        m, c, wv, cam.focal_x, cam.focal_y, cam.tan_fovx, cam.tan_fovy, 0.0)),
        args[0], c3, label="  cov2d_and_coef")
    timed(jax.jit(lambda m, s, q: G.view2gaussian(m, s, q, wv)),
          args[0], args[1], args[2], label="  view2gaussian(10)")
    timed(jax.jit(lambda m, s, q: G.view2gaussian_mb(m, s, q, wv)),
          args[0], args[1], args[2], label="  view2gaussian_mb")
    from f3d_gaus_tpu.core import sh as shmod
    cc = jnp.asarray(cam.cam_center)
    timed(jax.jit(lambda sh_, m: shmod.sh_color_from_gaussians(1, sh_, m, cc)),
          args[4], args[0], label="  sh_color")

    # --- binning
    bin_fn = jax.jit(lambda m2, r, d: B.bin_gaussians(m2, r, d, res, res,
                                                      pair_cap))
    bng, _ = timed(bin_fn, p.means2d, p.radii, p.depths, label="binning total")
    cnt = np.asarray(bng.tile_count)
    print(f"    tile_count: max={cnt.max()} mean={cnt.mean():.0f} "
          f"total={cnt.sum()} overflow={np.asarray(bng.overflow)}")

    # --- feature expansion + window build
    gx = (res + B.BLOCK - 1) // B.BLOCK
    statics = R.RasterStatics(width=res, height=res,
                              grid_x=gx, grid_y=gx,
                              focal_x=float(cam.focal_x),
                              focal_y=float(cam.focal_y),
                              max_per_tile=max_per_tile, chunk=128)
    opa_flat = args[3].reshape(-1)
    feat_fn = jax.jit(lambda mb, rgb, o: R._expand_features(mb, rgb, o))
    feat, _ = timed(feat_fn, p.v2g_mb, p.rgb, opa_flat,
                    label="expand_features")

    slab_fn = jax.jit(lambda mb, rgb, o, c, m2, g: PR._build_slab(
        PR._all_features(mb, rgb, o, c, m2), g))
    slab, _ = timed(slab_fn, p.v2g_mb, p.rgb, opa_flat, p.conic, p.means2d,
                    bng.point_list, label="build_slab")
    print(f"    slab shape {slab.shape}  {slab.size * 4 / 1e6:.1f} MB")
    tstart = bng.tile_start
    roff = jnp.zeros((), jnp.int32)

    # --- forward kernel alone
    fwd_fn = jax.jit(lambda w, tc, ts: PR._run_forward(w, tc, ts, roff,
                                                       statics))
    (outf, outi), _ = timed(fwd_fn, slab, bng.tile_count, tstart,
                            label="fwd kernel alone")

    # --- backward kernel alone
    T_tiles = statics.grid_x * statics.grid_y
    rng2 = np.random.default_rng(1)
    gl = jnp.asarray(rng2.normal(size=(T_tiles, PR.PIX, 16)).astype(np.float32))
    bwf = jnp.zeros((T_tiles, PR.PIX, 8), jnp.float32)
    bwf = bwf.at[..., 0].set(outf[..., PR.AF_T])
    bwf = bwf.at[..., 1].set(outf[..., PR.AF_D1])
    bwi = jnp.zeros((T_tiles, PR.PIX, 8), jnp.int32)
    bwi = bwi.at[..., 0].set(outi[..., 0])
    bwi = bwi.at[..., 1].set(outi[..., 1])
    bwd_fn = jax.jit(lambda w, tc, ts, g, bf, bi: PR._run_backward(
        w, tc, ts, roff, g, bf, bi, statics))
    dwin, _ = timed(bwd_fn, slab, bng.tile_count, tstart, gl, bwf, bwi,
                    label="bwd kernel alone")
    print(f"    dwin shape {dwin.shape}  {dwin.size * 4 / 1e6:.1f} MB")

    # --- gradient slab reduction
    P = n

    def reduce_fn(dw, seg):
        rows = jnp.transpose(dw, (0, 2, 1)).reshape(-1, PR.FPAD)
        return jax.ops.segment_sum(rows, seg, num_segments=P + 1)[:P]
    d_all, _ = timed(jax.jit(reduce_fn), dwin, bng.point_list,
                     label="slab transpose+segment_sum")

    # --- expand vjp tail
    def tail(mb, rgb, o, d):
        _, evjp = jax.vjp(
            lambda mb_, rg_, op_: PR._all_features(mb_, rg_, op_, p.conic,
                                                   p.means2d)[:P],
            mb, rgb, o)
        return evjp(d)
    timed(jax.jit(tail), p.v2g_mb, p.rgb, opa_flat, d_all,
          label="expand vjp tail")

    # --- end-to-end for comparison
    w9 = jnp.asarray(rng2.normal(size=(9, res, res)).astype(np.float32))
    kw = dict(pair_cap=pair_cap, max_per_tile=max_per_tile, chunk=128,
              backend="pallas")

    def loss(*a):
        return jnp.sum(R.render(*a, cam, bg, **kw)["out9"] * w9)
    fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    _, dt = timed(fb, *args, label="fwd+bwd end-to-end")
    print(f"==> {res * res / 1e6 / (dt / 1e3):.3f} Mpix/s")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 18, int(a[1]) if len(a) > 1 else 1024)
