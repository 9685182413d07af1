"""Pallas TPU kernels for the GOF tile compositing (forward + backward).

This is the speed-of-light path the XLA scan in ops/rasterize.py prototypes
(same math, same reference semantics — CUDA forward.cu:409-612 /
backward.cu:634-955).  Where the CUDA kernel runs one *thread* per pixel
looping over depth-sorted gaussians with divergent early exit, this kernel
runs one *grid step* per (tile, depth-chunk) with

  * pixels on the sublane axis (16x16 tile -> 256 sublanes) and the
    gaussian chunk on the lane axis (C = 128 lanes) — every quantity is a
    (256, 128) f32 vreg tile, no per-thread scalar work anywhere;
  * per-tile accumulators (9 channels + T + distortion moments + stop
    flags) resident in VMEM scratch across the chunk loop — zero HBM
    traffic for the carry (the CUDA shared-memory staging, forward.cu:
    456-490, maps to the auto-pipelined slab BlockSpec);
  * feature blocks are DMA'd straight out of the ALIGNED SLAB built by
    ops/binning.py: tile t's depth-sorted pairs start at the 128-aligned
    offset tile_start[t], so the BlockSpec index_map is pure scalar
    arithmetic on two prefetched (T,) arrays — no per-window gather ops
    exist anywhere on the hot path (they cost ~4 ms/frame as XLA gathers);
  * transmittance/early-stop as log-step lane scans (Hillis-Steele over
    pltpu.roll) — cumsum/cumprod are not natively lowered by Mosaic;
  * occupancy-bounded iteration: tile_count rides a scalar-prefetch ref;
    chunks past a tile's count (or past saturation: every pixel's T below
    the 1e-4 stop) skip both compute (pl.when) and the feature DMA (the
    window index_map clamps to the last real chunk, so Mosaic re-uses the
    already-fetched block);
  * backward: reverse chunk traversal reconstructing T in LOG space
    (T = T/(1-a) walking back, backward.cu:816 — division by a product of
    up-to-128 (1-alpha) factors underflows f32, log-sum does not), suffix
    color/normal sums collapsed to ONE scan each via the per-pixel
    cotangent dot (sum_j gL_j * S_rgb[j] is a suffix sum of w * (gL.rgb)),
    and the quadratic-form gradients taken by jax.vjp of the SAME _forms
    the forward evaluates — inside the kernel;
  * atomics (backward.cu:836-952) become a per-(tile, slot) gradient slab
    reduced by one deterministic segment_sum outside the kernel.

The public entry is composite_pallas(), signature-identical to
rasterize.composite; rasterize.render(backend=...) dispatches.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import rasterize as R

BLOCK = R.BLOCK
PIX = R.PIX               # 256 pixels per tile
C = 128                   # default gaussians/chunk; statics.lanes overrides
FPAD = 24                 # feature rows: 19 used + conic(3) + means2d(2)
NEAR_PLANE = R.NEAR_PLANE
FAR_PLANE = R.FAR_PLANE
ALPHA_EPS = R.ALPHA_EPS
STOP_T = R.STOP_T

# dwin slab rows 19..21 carry the densification-stats gradients
# (dL/dmean2D.x, .y, abs) — rows 19..23 of the INPUT windows hold
# conic (3) + means2d (2), which receive no gradient of their own.
ROW_CONIC = R.NFEAT
ROW_M2D = R.NFEAT + 3

# accf scratch channels
AF_RGB = 0      # 0..2
AF_NN = 3       # 3..5
AF_DEPTH = 6
AF_ALPHA = 7
AF_DIST = 8
AF_T = 9
AF_D1 = 10
AF_D2 = 11
AF_STOPPED = 12


# ---------------------------------------------------------------------------
# lane scans (Hillis-Steele over pltpu.roll; Mosaic has no cumsum/cumprod)
# ---------------------------------------------------------------------------

def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _cumprod_excl(x):
    lane = _lane_iota(x.shape)
    n = x.shape[-1]
    y = x
    s = 1
    while s < n:
        y = y * jnp.where(lane >= s, pltpu.roll(y, s, axis=x.ndim - 1), 1.0)
        s *= 2
    return jnp.where(lane >= 1, pltpu.roll(y, 1, axis=x.ndim - 1), 1.0)


def _cumsum_incl(x):
    lane = _lane_iota(x.shape)
    n = x.shape[-1]
    y = x
    s = 1
    while s < n:
        y = y + jnp.where(lane >= s, pltpu.roll(y, s, axis=x.ndim - 1), 0.0)
        s *= 2
    return y


def _cumsum_excl(x):
    lane = _lane_iota(x.shape)
    y = _cumsum_incl(x)
    return jnp.where(lane >= 1, pltpu.roll(y, 1, axis=x.ndim - 1), 0.0)


def _cumsum_rev_incl(x):
    lane = _lane_iota(x.shape)
    n = x.shape[-1]
    y = x
    s = 1
    while s < n:
        y = y + jnp.where(lane < n - s, pltpu.roll(y, n - s, axis=x.ndim - 1),
                          0.0)
        s *= 2
    return y


def _cumsum_rev_excl(x):
    lane = _lane_iota(x.shape)
    n = x.shape[-1]
    y = _cumsum_rev_incl(x)
    return jnp.where(lane < n - 1, pltpu.roll(y, n - 1, axis=x.ndim - 1), 0.0)


# ---------------------------------------------------------------------------
# quadratic-form evaluation — the (PIX, C) restatement of
# rasterize._chunk_eval (same formulas; parity-tested against it)
# ---------------------------------------------------------------------------

def _passthrough_min(x, cap):
    return x + jax.lax.stop_gradient(jnp.minimum(x, cap) - x)


def _forms(W, U, V):
    """W: (FPAD, C) monomial-coefficient rows (qa6 | qk6 | B3 | rgb3 | opa1,
    see rasterize.py NFEAT layout); U, V: (PIX, 1) pixel ray coords.
    Returns dict of (PIX, C) maps.  Differentiable in W — the backward
    kernel jax.vjp's through this.

    Everything linear/quadratic in the ray is ONE MXU matmul: the 6-target
    coefficient matrix Wm (8, 6C) is assembled with row slices/concats
    (cheap lane ops), and the (PIX, 8) monomial basis [u^2, uv, v^2, u, v,
    1, 0, 0] contracts against it.  precision=HIGHEST keeps the matmul in
    f32 (TPU MXU default would round through bf16 and break parity)."""
    Cw = W.shape[1]
    one = jnp.ones_like(U)
    zero2 = jnp.zeros((2, Cw), W.dtype)
    zero3 = jnp.zeros((3, Cw), W.dtype)
    qa = W[0:6]
    qk = W[6:12]
    B3 = W[12:15]
    # n = (M^T M) d rows, un-doubling the baked off-diagonal 2s of qa
    n0r = jnp.concatenate([W[0:1], 0.5 * W[1:2], 0.5 * W[3:4]], 0)
    n1r = jnp.concatenate([0.5 * W[1:2], W[2:3], 0.5 * W[4:5]], 0)
    n2r = jnp.concatenate([0.5 * W[3:4], 0.5 * W[4:5], W[5:6]], 0)
    Wm = jnp.concatenate([
        jnp.concatenate([qa, zero2], 0),
        jnp.concatenate([qk, zero2], 0),
        jnp.concatenate([zero3, B3, zero2], 0),
        jnp.concatenate([zero3, n0r, zero2], 0),
        jnp.concatenate([zero3, n1r, zero2], 0),
        jnp.concatenate([zero3, n2r, zero2], 0)], axis=1)   # (8, 6C)
    Dmon = jnp.concatenate([U * U, U * V, V * V, U, V, one,
                            jnp.zeros_like(U), jnp.zeros_like(U)], axis=1)
    # HIGHEST keeps the matmul in f32 (Mosaic lowers only DEFAULT/HIGHEST,
    # and 1-pass bf16 would break the 1e-4 oracle tolerance)
    E = jax.lax.dot_general(Dmon, Wm, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    AA = E[:, 0:Cw]
    num = E[:, Cw:2 * Cw]
    BB = 2.0 * E[:, 2 * Cw:3 * Cw]
    nx = E[:, 3 * Cw:4 * Cw]
    ny = E[:, 4 * Cw:5 * Cw]
    nz = E[:, 5 * Cw:6 * Cw]

    # clamp the PSD forms at zero/tiny — f32 rounding can push them slightly
    # negative for thin gaussians (see rasterize._chunk_eval); one shared
    # reciprocal + rsqrt replace the three divides and the sqrt+div chain
    # (divides are multi-pass on the VPU)
    AA_safe = jnp.maximum(AA, 1e-12)
    num = jnp.maximum(num, 0.0)
    rAA = 1.0 / AA_safe
    t = -0.5 * BB * rAA
    min_value = num * rAA
    power = _passthrough_min(-0.5 * min_value, 0.0)
    G = jnp.exp(power)
    alpha_raw = _passthrough_min(W[18:19, :] * G, 0.99)

    inv_len = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + 1e-7)

    t_pos = jnp.maximum(t, 1e-6)
    # m = F(t-N) / ((F-N) t) = F/(F-N) - F N/(F-N) * (1/t)
    c1 = FAR_PLANE / (FAR_PLANE - NEAR_PLANE)
    m = c1 - (c1 * NEAR_PLANE) / t_pos
    zero = jnp.zeros_like(AA)
    return {"alpha_raw": alpha_raw, "G": G, "t": t, "m": m,
            "n0": -nx * inv_len, "n1": -ny * inv_len, "n2": -nz * inv_len,
            "r0": W[15:16, :] + zero, "r1": W[16:17, :] + zero,
            "r2": W[17:18, :] + zero}


def _tile_uv(t, s: "R.RasterStatics"):
    """Pixel-ray (u, v) of tile t, each (PIX, 1) f32."""
    tx = t % s.grid_x
    ty = t // s.grid_x
    p = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    ix = p % BLOCK
    iy = p // BLOCK
    px = (tx * BLOCK + ix).astype(jnp.float32) + 0.5
    py = (ty * BLOCK + iy).astype(jnp.float32) + 0.5
    u = (px - s.width / 2.0) / s.focal_x
    v = (py - s.height / 2.0) / s.focal_y
    return u, v, px, py


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(s, cnt_ref, bt_ref, bj_ref, roff_ref, win_ref, outf_ref,
                outi_ref, accf, acci, stop_s):
    """One grid step per SLAB BLOCK (not per (tile, chunk) pair): binning
    allocates exactly ceil(count/lanes) aligned blocks per tile, so a 1-D
    walk over blocks visits only real work — grid size is independent of
    max_per_tile and there are no inactive (tile, chunk) steps to pay for.
    bt/bj: prefetched block -> (owning tile, chunk index within tile);
    cnt is pre-capped at max_per_tile.  Tiles with zero blocks are fixed
    up outside (_fix_empty_tiles)."""
    b = pl.program_id(0)
    t = bt_ref[b]
    k = bj_ref[b]
    C = s.lanes

    @pl.when(k == 0)
    def _():
        col = jax.lax.broadcasted_iota(jnp.int32, (PIX, 16), 1)
        accf[:] = jnp.where(col == AF_T, 1.0, 0.0)
        acci[:] = jnp.full((PIX, 8), -1, jnp.int32)
        stop_s[0] = 0

    cnt = cnt_ref[t]
    active = (k * C < cnt) & (stop_s[0] == 0)

    @pl.when(active)
    def _():
        u, v, _, _ = _tile_uv(t + roff_ref[0] * s.grid_x, s)
        W = win_ref[0]
        ct = _forms(W, u, v)
        alpha_raw, tt, m = ct["alpha_raw"], ct["t"], ct["m"]

        slotpos = k * C + _lane_iota((PIX, C))
        vc = (tt > NEAR_PLANE) & (alpha_raw >= ALPHA_EPS) & (slotpos < cnt)
        alpha = jnp.where(vc, alpha_raw, 0.0)
        om = 1.0 - alpha

        T_carry = accf[:, AF_T:AF_T + 1]
        stopped_c = accf[:, AF_STOPPED:AF_STOPPED + 1] > 0.5
        T_before = T_carry * _cumprod_excl(om)
        # T is monotone non-increasing along lanes, so once any valid lane
        # crosses the stop test (T_after < STOP_T, forward.cu:528) every
        # LATER valid lane's own test also fires: T_before_j <= T_after_i
        # < STOP_T and (1-alpha_raw_j) <= 1.  Hence "at or after the first
        # stop" == "own stop test fires" on valid lanes — no inclusive
        # lane scan needed.
        stop = vc & (T_before * (1.0 - alpha_raw) < STOP_T)
        contrib = vc & (~stop) & (~stopped_c)
        w = jnp.where(contrib, T_before * alpha, 0.0)

        for j, key in enumerate(("r0", "r1", "r2")):
            accf[:, AF_RGB + j] += jnp.sum(w * ct[key], axis=-1)
        for j, key in enumerate(("n0", "n1", "n2")):
            accf[:, AF_NN + j] += jnp.sum(w * ct[key], axis=-1)
        accf[:, AF_ALPHA] += jnp.sum(w, axis=-1)

        # median depth: t of the LAST contributor with T_before > 0.5
        sel = contrib & (T_before > 0.5)
        mpos = jnp.max(jnp.where(sel, slotpos, -1), axis=-1, keepdims=True)
        has = mpos[:, 0] >= 0
        t_at = jnp.sum(jnp.where(slotpos == mpos, jnp.where(sel, tt, 0.0),
                                 0.0), axis=-1)
        accf[:, AF_DEPTH] = jnp.where(has, t_at, accf[:, AF_DEPTH])
        acci[:, 1] = jnp.where(has, mpos[:, 0], acci[:, 1])
        lpos = jnp.max(jnp.where(contrib, slotpos, -1), axis=-1)
        acci[:, 0] = jnp.maximum(acci[:, 0], lpos)

        # 2DGS distortion with running moments (forward.cu:543-557);
        # the two exclusive scans ride ONE lane-scan instruction stream
        # (stacked on sublanes; exclusive = inclusive - self)
        A_acc = 1.0 - T_before
        mw = m * w
        m2w = m * mw
        both = jnp.concatenate([mw, m2w], axis=0)
        both_x = _cumsum_excl(both)
        d1x = accf[:, AF_D1:AF_D1 + 1] + both_x[:PIX]
        d2x = accf[:, AF_D2:AF_D2 + 1] + both_x[PIX:]
        err = m * m * A_acc + d2x - 2.0 * m * d1x
        accf[:, AF_DIST] += jnp.sum(err * w, axis=-1)
        accf[:, AF_D1] += jnp.sum(mw, axis=-1)
        accf[:, AF_D2] += jnp.sum(m2w, axis=-1)

        # prod over lanes (Mosaic lacks reduce_prod); om >= 0.01 by the
        # 0.99 alpha clamp, so the log-sum is exact enough and safe
        omc = jnp.where(contrib, om, 1.0)
        accf[:, AF_T] = (T_carry[:, 0]
                         * jnp.exp(jnp.sum(jnp.log(omc), axis=-1)))
        stopped_new = stopped_c[:, 0] | jnp.any(stop, axis=-1)
        accf[:, AF_STOPPED] = stopped_new.astype(jnp.float32)

        @pl.when(jnp.all(stopped_new))
        def _():
            stop_s[0] = 1

    @pl.when(((k + 1) * C >= cnt) & (k * C < cnt))
    def _():
        outf_ref[0] = accf[:]
        outi_ref[0] = acci[:]


def _block_maps(tile_start, tile_count, NB, C, max_per_tile):
    """Block -> (owning tile, within-tile chunk) maps plus the per-tile
    capped count, computed from the aligned slab layout (tile t occupies
    blocks [tile_start[t]/C, ...), exactly ceil(min(count, mpt)/C) of
    them).  Zero-count tiles own no blocks (their aligned start collides
    with the next tile's; the fill-forward's last-wins rule skips them);
    global-tail blocks inherit the last tile id with j >= its chunk count,
    which every kernel treats as inactive."""
    T_tiles = tile_start.shape[0]
    ablk = tile_start // jnp.int32(C)
    cntc = jnp.minimum(tile_count, max_per_tile).astype(jnp.int32)
    tids = jnp.arange(T_tiles, dtype=jnp.int32)
    blk_tile = B_fill_forward(tids, ablk, NB)
    blk_ablk = B_fill_forward(ablk, ablk, NB)
    blk_j = jnp.arange(NB, dtype=jnp.int32) - blk_ablk
    return blk_tile, blk_j, cntc, ablk


def B_fill_forward(values, starts, n):
    from . import binning as _B
    return _B._fill_forward(values, starts, n)


def _fix_empty_tiles(outf, outi, cntc):
    """Tiles that own zero slab blocks are never visited by the block walk;
    overwrite their (uninitialized) rows with the empty-scene accumulator
    state (T=1, everything else 0 / -1)."""
    empty = (cntc == 0)[:, None, None]
    col = jax.lax.broadcasted_iota(jnp.int32, outf.shape, 2)
    init_f = jnp.where(col == AF_T, 1.0, 0.0)
    outf = jnp.where(empty, init_f, outf)
    outi = jnp.where(empty, jnp.int32(-1), outi)
    return outf, outi


def _run_forward(slab, tile_count, tile_start, row_off,
                 s: "R.RasterStatics", interpret=False):
    T_tiles = s.grid_x * s.grid_y
    C = s.lanes
    NB = slab.shape[0]
    blk_tile, blk_j, cntc, _ = _block_maps(tile_start, tile_count, NB, C,
                                           s.max_per_tile)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(NB,),
        in_specs=[pl.BlockSpec((1, FPAD, C), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, PIX, 16), lambda b, cnt, bt, bj, roff:
                         (bt[b], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX, 8), lambda b, cnt, bt, bj, roff:
                         (bt[b], 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((PIX, 16), jnp.float32),
                        pltpu.VMEM((PIX, 8), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32)])
    outf, outi = pl.pallas_call(
        functools.partial(_fwd_kernel, s),
        out_shape=(jax.ShapeDtypeStruct((T_tiles, PIX, 16), jnp.float32),
                   jax.ShapeDtypeStruct((T_tiles, PIX, 8), jnp.int32)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(cntc, blk_tile, blk_j,
      jnp.asarray(row_off, jnp.int32).reshape(1), slab)
    return _fix_empty_tiles(outf, outi, cntc)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(s, cnt_ref, bt_ref, bj_ref, roff_ref, win_ref, gl_ref,
                bwf_ref, bwi_ref, dwin_ref, accb, lim_s):
    """Reverse chunk traversal (the structure of backward.cu:738-953),
    walking each tile's slab blocks back-to-front: grid step b handles
    tile bt[b]'s chunk kk = nch-1-bj[b] (the window/output index maps
    realize the reversal).  Steps beyond the tile's last contributor
    (or tail blocks) zero their OWN block — those pairs contribute no
    gradient, and the zero write is what the segment reduction needs.
    gl channels: 0-2 gL_rgb, 3-5 gL_nn, 6 gL_depth, 7 gL_reg, 8 bg_dot.
    bwf channels: 0 final_T, 1 final_D1.  bwi: 0 last_pos, 1 max_pos."""
    b = pl.program_id(0)
    t = bt_ref[b]
    j = bj_ref[b]
    C = s.lanes
    cnt = cnt_ref[t]
    nch = jax.lax.div(cnt + C - 1, C)
    kk = nch - 1 - j

    @pl.when(j == 0)
    def _():
        T_final = bwf_ref[0, :, 0:1]
        col = jax.lax.broadcasted_iota(jnp.int32, (PIX, 8), 1)
        accb[:] = jnp.where(col == 0,
                            jnp.log(jnp.maximum(T_final, 1e-12)), 0.0)
        # per-tile chunk bound: nothing past the last contributor
        lim_s[0] = jnp.max(bwi_ref[0, :, 0])

    active = (j < nch) & (kk * C < cnt) & (kk * C <= lim_s[0])

    @pl.when(active)
    def _():
        u, v, px, py = _tile_uv(t + roff_ref[0] * s.grid_x, s)
        W = win_ref[0]
        ct, vjp_fn = jax.vjp(lambda Wv: _forms(Wv, u, v), W)
        alpha_raw, tt = ct["alpha_raw"], ct["t"]

        last_pos = bwi_ref[0, :, 0:1]
        max_pos = bwi_ref[0, :, 1:2]
        T_final = bwf_ref[0, :, 0:1]
        final_D1 = bwf_ref[0, :, 1:2]
        final_A = 1.0 - T_final

        slotpos = kk * C + _lane_iota((PIX, C))
        vc = (tt > NEAR_PLANE) & (alpha_raw >= ALPHA_EPS) & (slotpos < cnt)
        contrib = vc & (slotpos <= last_pos)
        alpha = jnp.where(contrib, alpha_raw, 0.0)
        om = 1.0 - alpha
        log_om = jnp.log(om)          # alpha <= 0.99 -> om >= 0.01

        # T reconstruction in log space: T_before_g = T_right / prod_{j>=g}
        # om_j (backward.cu:816) — the literal product underflows f32 at
        # ~19 near-opaque gaussians; exp(logT_right - suffix_logsum) cannot.
        logT_right = accb[:, 0:1]
        s_incl = _cumsum_rev_incl(log_om)
        T_before = jnp.exp(logT_right - s_incl)
        T_next = T_before * om
        T_next_safe = jnp.where(contrib, T_next, 1.0)
        om_safe = jnp.where(contrib, om, 1.0)
        w = jnp.where(contrib, T_before * alpha, 0.0)

        gl_rgb = [gl_ref[0, :, j:j + 1] for j in range(3)]
        gl_nn = [gl_ref[0, :, 3 + j:4 + j] for j in range(3)]
        gl_depth = gl_ref[0, :, 6:7]
        gl_reg = gl_ref[0, :, 7:8]
        bg_dot = gl_ref[0, :, 8:9]

        # per-pixel cotangent dots collapse the per-channel suffix sums
        # (backward.cu:822-877) to ONE scan each:
        #   sum_j gL_j * S_j[g]  ==  suffix_sum_g( w * (gL . c) )
        cbar_rgb = (gl_rgb[0] * ct["r0"] + gl_rgb[1] * ct["r1"]
                    + gl_rgb[2] * ct["r2"])
        cbar_nn = (gl_nn[0] * ct["n0"] + gl_nn[1] * ct["n1"]
                   + gl_nn[2] * ct["n2"])
        # both suffix sums in ONE reverse lane scan (stacked on sublanes)
        wboth = jnp.concatenate([w * cbar_rgb, w * cbar_nn], axis=0)
        wboth_x = _cumsum_rev_excl(wboth)
        S_rgb = accb[:, 1:2] + wboth_x[:PIX]
        S_nn = accb[:, 2:3] + wboth_x[PIX:]

        d_alpha = (cbar_rgb - S_rgb / T_next_safe
                   + cbar_nn - S_nn / T_next_safe) * T_before
        d_alpha = d_alpha + (-T_final / om_safe) * bg_dot
        d_alpha = jnp.where(contrib, d_alpha, 0.0)

        # distortion -> m chain (detached weights, backward.cu:839-852)
        d_m = 2.0 * w * (ct["m"] * final_A - final_D1) * gl_reg
        d_m = jnp.where(contrib, d_m, 0.0)
        d_t = jnp.where((slotpos == max_pos) & contrib, gl_depth, 0.0)

        zero = jnp.zeros_like(d_alpha)
        cots = {"alpha_raw": d_alpha, "G": zero, "t": d_t, "m": d_m}
        for j, key in enumerate(("n0", "n1", "n2")):
            cots[key] = jnp.where(contrib, w * gl_nn[j], 0.0)
        for j, key in enumerate(("r0", "r1", "r2")):
            cots[key] = jnp.where(contrib, w * gl_rgb[j], 0.0)
        (dW,) = vjp_fn(cots)

        # densification stats via the conic (backward.cu:896-909)
        opa_row = W[R.ROW_OPA:R.ROW_OPA + 1, :]
        dL_dG = jnp.where(contrib, opa_row * d_alpha, 0.0)
        Gv = ct["G"]
        dx = W[ROW_M2D:ROW_M2D + 1, :] - px
        dy = W[ROW_M2D + 1:ROW_M2D + 2, :] - py
        gdx, gdy = Gv * dx, Gv * dy
        con_a = W[ROW_CONIC:ROW_CONIC + 1, :]
        con_b = W[ROW_CONIC + 1:ROW_CONIC + 2, :]
        con_c = W[ROW_CONIC + 2:ROW_CONIC + 3, :]
        gx = dL_dG * (-gdx * con_a - gdy * con_b) * (0.5 * s.width)
        gy = dL_dG * (-gdy * con_c - gdx * con_b) * (0.5 * s.height)

        rows = jax.lax.broadcasted_iota(jnp.int32, (FPAD, C), 0)
        dW = jnp.where(rows == ROW_CONIC,
                       jnp.sum(gx, axis=0, keepdims=True), dW)
        dW = jnp.where(rows == ROW_CONIC + 1,
                       jnp.sum(gy, axis=0, keepdims=True), dW)
        dW = jnp.where(rows == ROW_CONIC + 2,
                       jnp.sum(jnp.abs(gx) + jnp.abs(gy), axis=0,
                               keepdims=True), dW)
        dwin_ref[0] = dW

        # advance carries toward the front
        accb[:, 0] = logT_right[:, 0] - jnp.sum(
            jnp.where(contrib, log_om, 0.0), axis=-1)
        accb[:, 1] += jnp.sum(w * cbar_rgb, axis=-1)
        accb[:, 2] += jnp.sum(w * cbar_nn, axis=-1)

    @pl.when(jnp.logical_not(active))
    def _():
        dwin_ref[0] = jnp.zeros((FPAD, C), jnp.float32)


def _run_backward(slab, tile_count, tile_start, row_off, gl, bwf, bwi,
                  s: "R.RasterStatics", interpret=False):
    """Writes the gradient slab in the SAME aligned layout as the feature
    slab: grid step b (tile t, within-tile index j) reads/writes block
    ablk[t] + nch-1-j — tile t's blocks back-to-front.  Inactive steps
    (past the last contributor, or global-tail blocks with j >= nch) zero
    their block: those pairs contribute nothing, and slab padding lanes
    are dropped by the sentinel segment ids downstream."""
    C = s.lanes
    NB = slab.shape[0]
    blk_tile, blk_j, cntc, ablk_arr = _block_maps(tile_start, tile_count,
                                                  NB, C, s.max_per_tile)

    def win_index(b, cnt, bt, bj, roff):
        t = bt[b]
        j = bj[b]
        nch = jax.lax.div(cnt[t] + C - 1, C)
        # active blocks reverse within the tile; tail blocks (j >= nch)
        # map to themselves (their zero write is harmless and in-bounds)
        return (jnp.where(j < nch, (b - j) + nch - 1 - j, b), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, FPAD, C), win_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX, 16), lambda b, cnt, bt, bj, roff:
                         (bt[b], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX, 8), lambda b, cnt, bt, bj, roff:
                         (bt[b], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX, 8), lambda b, cnt, bt, bj, roff:
                         (bt[b], 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, FPAD, C), win_index,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((PIX, 8), jnp.float32),
                        pltpu.SMEM((1,), jnp.int32)])
    dwin = pl.pallas_call(
        functools.partial(_bwd_kernel, s),
        out_shape=jax.ShapeDtypeStruct((NB, FPAD, C), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(cntc, blk_tile, blk_j,
      jnp.asarray(row_off, jnp.int32).reshape(1), slab, gl, bwf,
      bwi)
    return dwin


# ---------------------------------------------------------------------------
# feature slab + custom_vjp wrapper
# ---------------------------------------------------------------------------

def _all_features(v2g_mb, rgb, opa, conic, means2d):
    """(P+1, FPAD) feature table: the 19 monomial-coefficient columns of
    rasterize._expand_features plus conic (3) and means2d (2), assembled as
    ONE stack (a concatenate of pre-materialized column tensors costs an
    extra ~1 ms/frame in copies), with an all-zero sentinel row P appended.
    Differentiable in (v2g_mb, rgb, opa); conic/means2d ride as constants
    (their gradient channels carry densification STATS, not true grads)."""
    cols = R._expand_feature_columns(v2g_mb, rgb, opa)
    cols = cols + [jax.lax.stop_gradient(conic[:, i]) for i in range(3)]
    cols = cols + [jax.lax.stop_gradient(means2d[:, i]) for i in range(2)]
    while len(cols) < FPAD:
        cols.append(jnp.zeros_like(cols[0]))
    allf = jnp.stack(cols, axis=1)
    return jnp.concatenate([allf, jnp.zeros((1, FPAD), allf.dtype)], axis=0)


def _build_slab(allf, slab_gid, C=C):
    """(NB, FPAD, C) feature slab: row blocks of the per-gaussian feature
    table in the aligned pair order of ops/binning.py.  Padding slots
    (sentinel id P) hit the all-zero row, which self-masks in _forms:
    opa 0 -> alpha < ALPHA_EPS, t = 0 < NEAR_PLANE."""
    rows = allf[slab_gid]                              # (NPAD, FPAD)
    NB = slab_gid.shape[0] // C
    return jnp.transpose(rows.reshape(NB, C, FPAD), (0, 2, 1))


def _assemble_out(outf, outi, bg):
    """Kernel accumulators -> (out9, RenderAux) matching the XLA path."""
    Crgb = outf[..., AF_RGB:AF_RGB + 3]
    T_run = outf[..., AF_T]
    dist = outf[..., AF_DIST]
    out = jnp.concatenate([
        Crgb + T_run[..., None] * bg[None, None, :],
        outf[..., AF_NN:AF_NN + 3],
        outf[..., AF_DEPTH:AF_DEPTH + 1],
        outf[..., AF_ALPHA:AF_ALPHA + 1],
        (dist / ((1.0 - T_run) ** 2 + 1e-7))[..., None]], -1)
    aux = R.RenderAux(final_T=T_run, dist1=outf[..., AF_D1],
                      dist2=outf[..., AF_D2], raw_distortion=dist,
                      last_pos=outi[..., 0], max_pos=outi[..., 1])
    return out, aux


def _pallas_fwd_impl(allf, point_list, tile_start, tile_count, bg, row_off,
                     s):
    slab = _build_slab(allf, point_list, s.lanes)
    outf, outi = _run_forward(slab, tile_count, tile_start, row_off, s,
                              interpret=s.interpret)
    out, aux = _assemble_out(outf, outi, bg)
    return out, aux, slab


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def composite_from_features(allf, stats_dummy, point_list, tile_start,
                            tile_count, bg, row_off,
                            statics: "R.RasterStatics"):
    """Kernel compositing differentiable in the (P+1, FPAD) feature table
    (the NFEAT monomial columns + conic + means2d + an all-zero sentinel
    row, as built by _all_features).

    This is the custom_vjp boundary: everything upstream of the feature
    table ((M, b) packing, SH color, opacity coef) differentiates through
    ordinary JAX autodiff, so a gaussian-SHARDED caller (parallel/
    sharded.py) can expand features on its shard, all_gather only the
    compact 24-column table, and receive its gradient shard back through
    the gather's transpose (reduce_scatter) — per-gaussian work then
    scales with the mesh instead of replicating per device.

    stats_dummy: (P, 3) zeros whose cotangent receives the densification
    statistics (the screenspace_points analog); those rows are ZEROED in
    d_allf (they are stats, not true conic/means2d gradients)."""
    out, aux, _ = _pallas_fwd_impl(allf, point_list, tile_start, tile_count,
                                   bg, row_off, statics)
    return out, aux


def _cff_fwd(allf, stats_dummy, point_list, tile_start, tile_count, bg,
             row_off, statics):
    out, aux, slab_res = _pallas_fwd_impl(allf, point_list, tile_start,
                                          tile_count, bg, row_off, statics)
    # the feature slab rides the residuals (~28 MB at the flagship shape)
    # so the backward re-uses it instead of re-gathering — the exact
    # buffer-reuse design of the CUDA ctx save (rasterizer_impl.cu:444-446)
    res = (point_list, tile_start, tile_count, bg, row_off, aux, slab_res,
           allf.shape[0])
    return (out, aux), res


def _cff_bwd(statics, res, cts):
    (point_list, tile_start, tile_count, bg, row_off, aux, slab,
     nP1) = res
    g_out, _ = cts
    s = statics
    P = nP1 - 1

    T_tiles = s.grid_x * s.grid_y
    # concatenates, not .at[].set on zeros — the scatter form costs two
    # dynamic-update-slice ops (~0.35 ms/frame) on TPU
    bg_dot = jnp.einsum('j,tpj->tp', bg, g_out[..., 0:3])
    gl = jnp.concatenate([
        g_out[..., 0:7],
        # alpha channel (7) carries no gradient in the reference
        g_out[..., 8:9], bg_dot[..., None],
        jnp.zeros((T_tiles, PIX, 7), jnp.float32)], axis=-1)
    bwf = jnp.concatenate([
        aux.final_T[..., None], aux.dist1[..., None],
        jnp.zeros((T_tiles, PIX, 6), jnp.float32)], axis=-1)
    bwi = jnp.concatenate([
        aux.last_pos[..., None], aux.max_pos[..., None],
        jnp.zeros((T_tiles, PIX, 6), jnp.int32)], axis=-1)

    dwin = _run_backward(slab, tile_count, tile_start, row_off, gl, bwf,
                         bwi, s, interpret=s.interpret)
    rows = jnp.transpose(dwin, (0, 2, 1)).reshape(-1, FPAD)
    # point_list IS the segment map: aligned-slab padding carries the
    # sentinel id P, whose row lands in the (kept) sentinel segment — the
    # (P+1)-row cotangent matches allf's appended zero row
    d_all = jax.ops.segment_sum(rows, point_list, num_segments=nP1)
    d_stats = d_all[:P, ROW_CONIC:ROW_CONIC + 3]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, FPAD), 1)
    stats_cols = (cols >= ROW_CONIC) & (cols < ROW_CONIC + 3)
    d_allf = jnp.where(stats_cols, 0.0, d_all)
    zeros = jax.tree_util.tree_map(
        jnp.zeros_like, (point_list, tile_start, tile_count, bg, row_off))
    return (d_allf, d_stats) + zeros


composite_from_features.defvjp(_cff_fwd, _cff_bwd)


def composite_pallas(v2g_mb, rgb, opa, conic, means2d, means2d_stats,
                     point_list, pair_valid, tile_start, tile_count, bg,
                     row_off, statics: "R.RasterStatics"):
    """Drop-in kernel-backed replacement for rasterize.composite: expands
    the feature table and composites; gradients flow to (v2g_mb, rgb, opa)
    through ordinary autodiff of _all_features and to means2d_stats via
    the stats_dummy channel of composite_from_features."""
    allf = _all_features(v2g_mb, rgb, opa, conic, means2d)
    return composite_from_features(allf, means2d_stats, point_list,
                                   tile_start, tile_count, bg, row_off,
                                   statics)
