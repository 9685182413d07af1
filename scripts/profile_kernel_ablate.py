"""Ablate the pallas forward kernel's internals on real TPU: time variants
with pieces removed to locate the per-step cost."""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from f3d_gaus_tpu.core import cameras, gaussians as G
from f3d_gaus_tpu.ops import rasterize as R, binning as B, pallas_raster as PR

C = PR.C
PIX = PR.PIX
FPAD = PR.FPAD


def timed(fn, *args, iters=20, label=""):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:44s} {dt:8.2f} ms")
    return out


def make_kernel(s, NCH, mode):
    def kern(cnt_ref, win_ref, outf_ref, accf, stop_s):
        t = pl.program_id(0)
        k = pl.program_id(1)
        K = NCH * C

        @pl.when(k == 0)
        def _():
            col = jax.lax.broadcasted_iota(jnp.int32, (PIX, 16), 1)
            accf[:] = jnp.where(col == PR.AF_T, 1.0, 0.0)
            stop_s[0] = 0

        cnt = jnp.minimum(cnt_ref[t], K)
        active = (k * C < cnt) & (stop_s[0] == 0)

        @pl.when(active)
        def _():
            u, v, _, _ = PR._tile_uv(t, s)
            W = win_ref[0, 0]
            if mode == "dma_only":
                accf[:, 0] += jnp.sum(W[0:1, :] * u, axis=-1)
                return
            ct = PR._forms(W, u, v)
            alpha_raw, tt, m = ct["alpha_raw"], ct["t"], ct["m"]
            if mode == "forms_only":
                accf[:, 0] += alpha_raw[:, 0] + tt[:, 0] + m[:, 0] \
                    + ct["n0"][:, 0] + ct["r0"][:, 0]
                return

            slotpos = k * C + PR._lane_iota((PIX, C))
            vc = (tt > PR.NEAR_PLANE) & (alpha_raw >= PR.ALPHA_EPS) \
                & (slotpos < cnt)
            alpha = jnp.where(vc, alpha_raw, 0.0)
            om = 1.0 - alpha

            T_carry = accf[:, PR.AF_T:PR.AF_T + 1]
            stopped_c = accf[:, PR.AF_STOPPED:PR.AF_STOPPED + 1] > 0.5
            T_before = T_carry * PR._cumprod_excl(om)
            if mode == "no_stop":
                contrib = vc & (~stopped_c)
            else:
                stop = vc & (T_before * (1.0 - alpha_raw) < PR.STOP_T)
                stopped_incl = PR._cumsum_incl(stop.astype(jnp.float32)) >= 1.0
                contrib = vc & (~stopped_incl) & (~stopped_c)
            w = jnp.where(contrib, T_before * alpha, 0.0)

            for j, key in enumerate(("r0", "r1", "r2")):
                accf[:, PR.AF_RGB + j] += jnp.sum(w * ct[key], axis=-1)
            for j, key in enumerate(("n0", "n1", "n2")):
                accf[:, PR.AF_NN + j] += jnp.sum(w * ct[key], axis=-1)
            accf[:, PR.AF_ALPHA] += jnp.sum(w, axis=-1)

            if mode not in ("no_depth", "no_depth_dist"):
                sel = contrib & (T_before > 0.5)
                mpos = jnp.max(jnp.where(sel, slotpos, -1), axis=-1,
                               keepdims=True)
                has = mpos[:, 0] >= 0
                t_at = jnp.sum(jnp.where(slotpos == mpos,
                                         jnp.where(sel, tt, 0.0), 0.0),
                               axis=-1)
                accf[:, PR.AF_DEPTH] = jnp.where(has, t_at,
                                                 accf[:, PR.AF_DEPTH])

            if mode not in ("no_dist", "no_depth_dist"):
                A_acc = 1.0 - T_before
                mw = m * w
                m2w = m * mw
                both = jnp.concatenate([mw, m2w], axis=0)
                both_x = PR._cumsum_incl(both) - both
                d1x = accf[:, PR.AF_D1:PR.AF_D1 + 1] + both_x[:PIX]
                d2x = accf[:, PR.AF_D2:PR.AF_D2 + 1] + both_x[PIX:]
                err = m * m * A_acc + d2x - 2.0 * m * d1x
                accf[:, PR.AF_DIST] += jnp.sum(err * w, axis=-1)
                accf[:, PR.AF_D1] += jnp.sum(mw, axis=-1)
                accf[:, PR.AF_D2] += jnp.sum(m2w, axis=-1)

            omc = jnp.where(contrib, om, 1.0)
            accf[:, PR.AF_T] = (T_carry[:, 0]
                                * jnp.exp(jnp.sum(jnp.log(omc), axis=-1)))
            if mode != "no_stop":
                stopped_new = stopped_c[:, 0] | jnp.any(stop, axis=-1)
                accf[:, PR.AF_STOPPED] = stopped_new.astype(jnp.float32)

                @pl.when(jnp.all(stopped_new))
                def _():
                    stop_s[0] = 1

        @pl.when(k == NCH - 1)
        def _():
            outf_ref[0] = accf[:]

    return kern


def run_variant(win, tile_count, s, mode):
    T_tiles = s.grid_x * s.grid_y
    NCH = PR._n_chunks(s.max_per_tile)

    def win_index(t, k, cnt):
        last = jnp.maximum(jax.lax.div(jnp.minimum(cnt[t], NCH * C) + C - 1,
                                       C) - 1, 0)
        return (t, jnp.minimum(k, last), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T_tiles, NCH),
        in_specs=[pl.BlockSpec((1, 1, FPAD, C), win_index,
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, PIX, 16), lambda t, k, cnt: (t, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((PIX, 16), jnp.float32),
                        pltpu.SMEM((1,), jnp.int32)])
    return pl.pallas_call(
        make_kernel(s, NCH, mode),
        out_shape=(jax.ShapeDtypeStruct((T_tiles, PIX, 16), jnp.float32),),
        grid_spec=grid_spec,
    )(tile_count.astype(jnp.int32), win)


def main():
    res = 256
    n = 256 * 256
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

    pre = jax.jit(lambda *a: G.preprocess(*a, 1, cam, 0.0, 1.0,
                                          compute_v2g=False))(*args)
    pre = jax.block_until_ready(pre)
    bng = jax.block_until_ready(jax.jit(
        lambda m2, r, d: B.bin_gaussians(m2, r, d, res, res, 1 << 18))(
            pre.means2d, pre.radii, pre.depths))
    gx = (res + 15) // 16
    s = R.RasterStatics(width=res, height=res, grid_x=gx, grid_y=gx,
                        focal_x=float(cam.focal_x), focal_y=float(cam.focal_y),
                        max_per_tile=1024, chunk=128)
    feat = jax.jit(R._expand_features)(pre.v2g_mb, pre.rgb,
                                       args[3].reshape(-1))
    win, _, _ = jax.jit(lambda f, c, m2, pl_, pv, ts, tc: PR._build_windows(
        f, c, m2, pl_, pv, ts, tc, s))(feat, pre.conic, pre.means2d,
                                       bng.point_list, bng.pair_valid,
                                       bng.tile_start, bng.tile_count)
    win = jax.block_until_ready(win)
    tc = bng.tile_count

    modes = sys.argv[1:] or ["dma_only", "forms_only", "no_stop", "no_dist",
                             "no_depth", "no_depth_dist", "full"]
    for mode in modes:
        timed(jax.jit(functools.partial(run_variant, s=s, mode=mode)),
              win, tc, label=f"fwd[{mode}]")


if __name__ == "__main__":
    main()
