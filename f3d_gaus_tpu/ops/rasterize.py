"""The differentiable GOF tile rasterizer, TPU-native formulation (XLA).

Design — not a port.  The CUDA kernel (reference forward.cu:409-612) runs
one thread per pixel looping over depth-sorted Gaussians with
data-dependent early exit; its backward (backward.cu:634-955) re-walks the
list in reverse with atomicAdds.  Neither maps to a vector machine.  This
module restates the same math as a *parallel compositing* problem:

  * every per-pixel quantity of the GOF ray quadratic is evaluated from
    PER-GAUSSIAN LINEAR FORMS in the pixel ray d = (u, v, 1):
        a   = M d                     (3 linear forms; AA = |a|^2)
        BB  = 2 d . (M^T b)           (1 linear form)
        num = |b x a|^2 = |K d|^2,    K = [b]_x M   (3 linear forms)
        min_value = num / AA          (== CC - BB^2/4AA for ANY M, by
                                       |a|^2|b|^2 - (a.b)^2 = |a x b|^2)
        normal = M^T a
    Every quantity is a sum of SQUARES of linear forms, so the f32
    evaluation is cancellation-free — strictly more accurate than the CUDA
    double-precision patch-up of CC - BB^2/4AA (forward.cu:255,511-522) —
    and, crucially, exact as a *function of arbitrary (M, b)* (no
    orthogonality assumption), so its jax.vjp IS the reference gradient
    chain; the whole chunk evaluation is ~60 fused elementwise ops on
    (tiles, PIX, chunk) with no per-(pixel, gaussian) 3-vector tensors
    beyond the compositing outputs;
  * per-tile windows are gathered ONCE into a dense (tiles, K, F) feature
    tensor — the scan over depth chunks just slices it (the CUDA
    shared-memory staging, forward.cu:479-490, without re-gathers);
  * transmittance and the CUDA early-exit (T(1-a) < 1e-4 halts the pixel)
    are exclusive cumulative products / or-scans along the chunk axis —
    masking, not control flow;
  * backward: the compositing chain (suffix color/normal sums, T
    reconstruction, the reference's exact detachment choices) is
    hand-written, but the quadratic-evaluation gradients are obtained by
    `jax.vjp` of the SAME chunk evaluation the forward used — correct by
    construction; per-(tile, slot) gradients are stacked by the scan and
    reduced with ONE deterministic segment_sum (replacing atomicAdd);
  * CUDA's "resize buffers and relaunch" becomes static capacities
    (pair_cap, max_per_tile).

The backward implements the reference's exact gradient semantics,
including its intentional detachments and pass-through clamps — see
ops/rasterize_ref.py's docstring.  Parity vs the sequential oracle is
tested to ~1e-5 (tests/test_rasterize_parity.py).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import gaussians as G
from . import binning as B

NEAR_PLANE = G.NEAR_PLANE
FAR_PLANE = G.FAR_PLANE
ALPHA_EPS = 1.0 / 255.0
STOP_T = 1e-4
BLOCK = 16
PIX = BLOCK * BLOCK
# Feature layout: MONOMIAL-COEFFICIENT form.  Every per-pixel quantity of
# the ray quadratic is a polynomial in the ray coords d = (u, v, 1):
#   AA  = |M d|^2 = d^T (M^T M) d      — quadratic form, 6 coefficients
#   num = |K d|^2 = d^T (K^T K) d      — quadratic form, 6 coefficients
#   BB  = 2 d . (M^T b)                — linear, 3 coefficients
#   n   = (M^T M) d                    — linear, reuses AA's coefficients
# so one (PIX, 6) monomial basis [u^2, uv, v^2, u, v, 1] contracted against
# per-gaussian coefficient rows evaluates EVERYTHING — on the MXU, as one
# matmul per chunk, instead of ~40 VPU FMAs per (pixel, gaussian).
# Rows: qa[6] (A00, 2A01, A11, 2A02, 2A12, A22) | qk[6] (same form of K^T K)
#       | B[3] | rgb[3] | opa[1].
NFEAT = 19
ROW_QA = 0
ROW_QK = 6
ROW_B = 12
ROW_RGB = 15
ROW_OPA = 18


class RasterStatics(NamedTuple):
    """Hashable static configuration of one composite call."""
    width: int
    height: int
    grid_x: int
    grid_y: int
    focal_x: float
    focal_y: float
    max_per_tile: int    # per-tile gather window K
    chunk: int           # gaussians per scan step (XLA backend)
    interpret: bool = False   # Pallas interpret mode (CPU testing only)
    lanes: int = 128     # pallas chunk width == binning slab alignment


class RenderAux(NamedTuple):
    """Per-pixel side outputs (shape (num_tiles, PIX)), all non-differentiable."""
    final_T: jnp.ndarray
    dist1: jnp.ndarray
    dist2: jnp.ndarray
    raw_distortion: jnp.ndarray
    last_pos: jnp.ndarray   # int32 window pos of last contributor, -1 = none
    max_pos: jnp.ndarray    # int32 window pos of the median-depth contributor


def _tile_rays(s: RasterStatics, row_off=0):
    """Per-tile pixel rays: u, v of shape (num_tiles, PIX).  row_off (traced
    int) shifts the tile rows — the statics describe a BAND of grid_y tile
    rows starting at global row row_off, while width/height/focal stay the
    GLOBAL camera geometry (tile-sharded rendering, parallel/sharded.py)."""
    tiles = jnp.arange(s.grid_x * s.grid_y, dtype=jnp.int32)
    tx = (tiles % s.grid_x)[:, None]
    ty = (tiles // s.grid_x)[:, None] + row_off
    ix = (jnp.arange(PIX, dtype=jnp.int32) % BLOCK)[None, :]
    iy = (jnp.arange(PIX, dtype=jnp.int32) // BLOCK)[None, :]
    px = (tx * BLOCK + ix).astype(jnp.float32) + 0.5
    py = (ty * BLOCK + iy).astype(jnp.float32) + 0.5
    u = (px - s.width / 2.0) / s.focal_x
    v = (py - s.height / 2.0) / s.focal_y
    return u, v


def _quadform6(r0, r1, r2):
    """Monomial coefficients (xx, 2xy, yy, 2xz, 2yz, zz) of the quadratic
    form d^T (G^T G) d where G has rows r0, r1, r2 (each a 3-list of (P,))."""
    def cdot(i, j):
        return r0[i] * r0[j] + r1[i] * r1[j] + r2[i] * r2[j]
    return [cdot(0, 0), 2.0 * cdot(0, 1), cdot(1, 1),
            2.0 * cdot(0, 2), 2.0 * cdot(1, 2), cdot(2, 2)]


def _expand_feature_columns(v2g_mb, rgb, opa):
    """The NFEAT per-gaussian monomial-coefficient columns as a list of
    (P,) arrays — callers stack them together with whatever extra columns
    they carry (pallas_raster appends conic/means2d) in ONE fusion."""
    m = [v2g_mb[:, i] for i in range(9)]          # M row-major
    b0, b1, b2 = v2g_mb[:, 9], v2g_mb[:, 10], v2g_mb[:, 11]
    qa = _quadform6(m[0:3], m[3:6], m[6:9])
    # rows of K = [b]_x M:  K0 = -b2 M1 + b1 M2; K1 = b2 M0 - b0 M2;
    # K2 = -b1 M0 + b0 M1   (Mi = i-th row of M)
    k0 = [-b2 * m[3 + j] + b1 * m[6 + j] for j in range(3)]
    k1 = [b2 * m[j] - b0 * m[6 + j] for j in range(3)]
    k2 = [-b1 * m[j] + b0 * m[3 + j] for j in range(3)]
    qk = _quadform6(k0, k1, k2)
    # B = M^T b
    B = [m[i] * b0 + m[3 + i] * b1 + m[6 + i] * b2 for i in range(3)]
    return qa + qk + B + [rgb[:, 0], rgb[:, 1], rgb[:, 2], opa]


def _expand_features(v2g_mb, rgb, opa):
    """Per-gaussian monomial coefficients from the (M, b) packing — see the
    NFEAT layout note above.  K = [b]_x M, so |K d|^2 = |b x (M d)|^2.
    Pure SoA per-gaussian math (no (P, 3, 3) intermediates)."""
    return jnp.stack(_expand_feature_columns(v2g_mb, rgb, opa), axis=1)


def _chunk_eval(feat_c, u, v):
    """Evaluate one gaussian chunk against one tile's rays.

    feat_c: (T, C, NFEAT); u, v: (T, PIX).  Returns per-(tile, pixel,
    chunk) maps; all outputs (T, PIX, C) or (T, PIX, C, 3) for nn.
    Differentiable in feat_c (the backward jax.vjp's through this).
    """
    e = lambda i: feat_c[:, None, :, i]                  # (T, 1, C)
    U, V = u[..., None], v[..., None]                    # (T, PIX, 1)
    qa = [e(ROW_QA + i) for i in range(6)]
    qk = [e(ROW_QK + i) for i in range(6)]
    B_ = [e(ROW_B + i) for i in range(3)]
    opa = e(ROW_OPA)

    def quad(q):
        return ((q[0] * U + q[1] * V + q[3]) * U
                + (q[2] * V + q[4]) * V + q[5])
    AA = quad(qa)                                        # |M d|^2
    num = quad(qk)                                       # |b x (M d)|^2
    BB = 2.0 * (B_[0] * U + B_[1] * V + B_[2])           # 2 a.b

    # AA and num are values of PSD quadratic forms, so their TRUE values are
    # >= 0 — but the monomial-coefficient evaluation can round slightly
    # negative for thin gaussians (one scale ~1e-4: catastrophic cancellation
    # between the u^2/v^2 and cross terms).  A negative AA flips the sign of
    # t and min_value (spurious opaque splat at garbage depth), so clamp both
    # at zero/tiny — the clamp only binds in the degenerate regime where the
    # reference's f64 path (forward.cu:511-522) is itself at the noise floor.
    AA_safe = jnp.maximum(AA, 1e-12)
    num = jnp.maximum(num, 0.0)
    t = -BB / (2.0 * AA_safe)
    min_value = num / AA_safe
    # pass-through clamps (CUDA keeps full gradients through min():
    # backward.cu:912 uses G regardless of the 0.99 clamp)
    power = _passthrough_min(-0.5 * min_value, 0.0)
    Gv = jnp.exp(power)
    alpha_raw = _passthrough_min(opa * Gv, 0.99)

    # n = M^T a = (M^T M) d — linear in d with A's entries (un-doubling the
    # baked-in off-diagonal 2s)
    nx = qa[0] * U + 0.5 * qa[1] * V + 0.5 * qa[3]
    ny = 0.5 * qa[1] * U + qa[2] * V + 0.5 * qa[4]
    nz = 0.5 * qa[3] * U + 0.5 * qa[4] * V + qa[5]
    length = jnp.sqrt(nx * nx + ny * ny + nz * nz + 1e-7)
    inv_len = 1.0 / length
    nn = jnp.stack([-nx * inv_len, -ny * inv_len, -nz * inv_len], -1)

    t_pos = jnp.maximum(t, 1e-6)     # m-mapping guard; masked downstream
    m = (FAR_PLANE * t_pos - FAR_PLANE * NEAR_PLANE) / (
        (FAR_PLANE - NEAR_PLANE) * t_pos)
    return {"alpha_raw": alpha_raw, "G": Gv, "t": t, "m": m, "nn": nn,
            "rgb": feat_c[:, None, :, ROW_RGB:ROW_RGB + 3]
            + jnp.zeros_like(U[..., None])}


def _passthrough_min(x, cap):
    """min(x, cap) in value, identity in gradient (CUDA clamp semantics)."""
    return x + jax.lax.stop_gradient(jnp.minimum(x, cap) - x)


def _exclusive_cumprod(x, axis):
    incl = jnp.cumprod(x, axis=axis)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, -1)
    return jnp.pad(incl[tuple(sl)], pad, constant_values=1.0)


def _exclusive_cumsum(x, axis):
    return jnp.cumsum(x, axis=axis) - x


def _gather_windows(point_list, pair_valid, tile_start, tile_count,
                    s: RasterStatics, feat, extra=None):
    """Dense per-tile windows: (T, K) ids/valid + (T, K, F) features.

    Gathers ride a zero-padded table so the slab's sentinel id P lands on
    an all-zero row (which self-masks in _chunk_eval) — clamping to row
    P-1 instead would pull a REAL gaussian's features, whose values can be
    non-finite for z~0 culled gaussians and then NaN-poison the masked
    accumulators (NaN * 0 = NaN)."""
    K = s.max_per_tile
    offs = jnp.arange(K, dtype=jnp.int32)[None, :]
    idx = tile_start[:, None] + offs
    win_valid = offs < jnp.minimum(tile_count, K)[:, None]
    idx_c = jnp.clip(idx, 0, point_list.shape[0] - 1)
    gids = point_list[idx_c]
    win_valid = win_valid & pair_valid[idx_c]
    featz = jnp.concatenate([feat, jnp.zeros((1,) + feat.shape[1:],
                                             feat.dtype)], axis=0)
    wfeat = featz[gids]
    if extra is not None:
        extraz = jnp.concatenate([extra, jnp.zeros((1,) + extra.shape[1:],
                                                   extra.dtype)], axis=0)
        wextra = extraz[gids]
    else:
        wextra = None
    return gids, win_valid, wfeat, wextra


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _composite_fwd_impl(feat, point_list, pair_valid, tile_start, tile_count,
                        bg, s: RasterStatics, row_off=0):
    """Returns (out (num_tiles, PIX, 9), aux: RenderAux)."""
    T_tiles = s.grid_x * s.grid_y
    u, v = _tile_rays(s, row_off)
    n_chunks = max(s.max_per_tile // s.chunk, 1)
    C = s.chunk
    _, win_valid, wfeat, _ = _gather_windows(point_list, pair_valid,
                                             tile_start, tile_count, s, feat)

    def body(carry, chunk_idx):
        (T_run, stopped, Crgb, Cnn, Calpha, depth, max_pos, last_pos,
         d1, d2, dist) = carry
        feat_c = jax.lax.dynamic_slice_in_dim(wfeat, chunk_idx * C, C, 1)
        wv_c = jax.lax.dynamic_slice_in_dim(win_valid, chunk_idx * C, C, 1)
        ct = _chunk_eval(feat_c, u, v)
        t, m = ct["t"], ct["m"]
        vc = (t > NEAR_PLANE) & (ct["alpha_raw"] >= ALPHA_EPS) \
            & wv_c[:, None, :]
        alpha = jnp.where(vc, ct["alpha_raw"], 0.0)

        om = 1.0 - alpha
        T_before = T_run[..., None] * _exclusive_cumprod(om, axis=-1)
        # CUDA stop: first valid g with T(1-a) < 1e-4 halts the pixel; that
        # gaussian itself does not contribute (forward.cu:536-541).  T is
        # monotone non-increasing along the chunk, so every valid lane at
        # or after the first stop fires its OWN stop test — the inclusive
        # cumsum over stops is redundant (see pallas_raster._fwd_kernel).
        stop = vc & (T_before * (1.0 - ct["alpha_raw"]) < STOP_T)
        contrib = vc & (~stop) & (~stopped[..., None])
        w = jnp.where(contrib, T_before * alpha, 0.0)

        pos = (chunk_idx * C + jnp.arange(C, dtype=jnp.int32))[None, None, :]
        Crgb = Crgb + jnp.einsum('tpc,tpcj->tpj', w, ct["rgb"])
        Cnn = Cnn + jnp.einsum('tpc,tpcj->tpj', w, ct["nn"])
        Calpha = Calpha + jnp.sum(w, -1)

        # median depth: t of the LAST contributor with T_before > 0.5
        sel = contrib & (T_before > 0.5)
        t_masked = jnp.where(sel, t, 0.0)
        mpos = jnp.max(jnp.where(sel, pos, -1), axis=-1)
        has = mpos >= 0
        onehot = pos == mpos[..., None]
        t_at = jnp.sum(jnp.where(onehot, t_masked, 0.0), axis=-1)
        depth = jnp.where(has, t_at, depth)
        max_pos = jnp.where(has, mpos, max_pos)
        lpos = jnp.max(jnp.where(contrib, pos, -1), axis=-1)
        last_pos = jnp.maximum(last_pos, lpos)

        # 2DGS distortion with running accumulators (forward.cu:543-557)
        A_acc = 1.0 - T_before
        mw = m * w
        m2w = m * mw
        d1_excl = d1[..., None] + _exclusive_cumsum(mw, -1)
        d2_excl = d2[..., None] + _exclusive_cumsum(m2w, -1)
        err = m * m * A_acc + d2_excl - 2.0 * m * d1_excl
        dist = dist + jnp.sum(err * w, -1)
        d1 = d1 + jnp.sum(mw, -1)
        d2 = d2 + jnp.sum(m2w, -1)

        T_run = T_run * jnp.prod(jnp.where(contrib, om, 1.0), axis=-1)
        stopped = stopped | jnp.any(stop, axis=-1)
        return (T_run, stopped, Crgb, Cnn, Calpha, depth, max_pos, last_pos,
                d1, d2, dist), None

    dt = feat.dtype
    z = lambda *sh: jnp.zeros((T_tiles, PIX) + tuple(sh), dt)
    init = (jnp.ones((T_tiles, PIX), dt),                        # T_run
            jnp.zeros((T_tiles, PIX), bool),                     # stopped
            z(3), z(3), z(),                                     # Crgb Cnn Ca
            z(),                                                 # depth
            jnp.full((T_tiles, PIX), -1, jnp.int32),             # max_pos
            jnp.full((T_tiles, PIX), -1, jnp.int32),             # last_pos
            z(), z(), z())                                       # d1 d2 dist
    (T_run, stopped, Crgb, Cnn, Calpha, depth, max_pos, last_pos,
     d1, d2, dist), _ = jax.lax.scan(body, init,
                                     jnp.arange(n_chunks, dtype=jnp.int32))

    out = jnp.concatenate([
        Crgb + T_run[..., None] * bg[None, None, :],
        Cnn, depth[..., None], Calpha[..., None],
        (dist / ((1.0 - T_run) ** 2 + 1e-7))[..., None]], -1)
    aux = RenderAux(final_T=T_run, dist1=d1, dist2=d2, raw_distortion=dist,
                    last_pos=last_pos, max_pos=max_pos)
    return out, aux


# ---------------------------------------------------------------------------
# backward — reference gradient semantics (see module docstring)
# ---------------------------------------------------------------------------

def _composite_bwd_impl(feat, conic, means2d, point_list, pair_valid,
                        tile_start, tile_count, bg, s: RasterStatics,
                        aux: RenderAux, g_out, row_off=0):
    """Returns (d_feat (P, NFEAT), dmean2d_stats (P, 3)) via one
    deterministic segment reduction over the scan-stacked chunk grads."""
    P = feat.shape[0]
    u, v = _tile_rays(s, row_off)
    n_chunks = max(s.max_per_tile // s.chunk, 1)
    C = s.chunk
    extra = jnp.concatenate([conic, means2d], axis=1)           # (P, 5)
    gids, win_valid, wfeat, wextra = _gather_windows(
        point_list, pair_valid, tile_start, tile_count, s, feat, extra)

    gL_rgb = g_out[..., 0:3]
    gL_nn = g_out[..., 3:6]
    gL_depth = g_out[..., 6]
    # ALPHA channel (7) gets no gradient in the reference — dropped here too.
    gL_reg = g_out[..., 8]

    T_final = aux.final_T
    final_A = 1.0 - T_final
    final_D1 = aux.dist1
    bg_dot = jnp.einsum('j,tpj->tp', bg, gL_rgb)

    px = u * s.focal_x + s.width / 2.0 - 0.5    # pixf - 0.5 (backward.cu:770)
    py = v * s.focal_y + s.height / 2.0 - 0.5

    def _rev_cumprod_incl(x):
        return jnp.flip(jnp.cumprod(jnp.flip(x, -1), -1), -1)

    def _rev_cumsum_excl(x):
        incl = jnp.flip(jnp.cumsum(jnp.flip(x, -2), -2), -2)
        return incl - x

    def body(carry, chunk_idx):
        """Reverse traversal, the structure of backward.cu:738-953: suffix
        sums accumulate exactly from zero, T is reconstructed from T_final
        by division (T = T/(1-alpha), :816), the contributor mask re-uses
        the forward's last_pos (the n_contrib skip, :764), and the chunk
        cotangents are pulled back through jax.vjp of _chunk_eval."""
        (T_right, S_rgb_c, S_nn_c) = carry
        feat_c = jax.lax.dynamic_slice_in_dim(wfeat, chunk_idx * C, C, 1)
        wv_c = jax.lax.dynamic_slice_in_dim(win_valid, chunk_idx * C, C, 1)
        ex_c = jax.lax.dynamic_slice_in_dim(wextra, chunk_idx * C, C, 1)

        ct, vjp_fn = jax.vjp(lambda f: _chunk_eval(f, u, v), feat_c)
        alpha_raw, t = ct["alpha_raw"], ct["t"]
        vc = (t > NEAR_PLANE) & (alpha_raw >= ALPHA_EPS) & wv_c[:, None, :]

        pos = (chunk_idx * C + jnp.arange(C, dtype=jnp.int32))[None, None, :]
        contrib = vc & (pos <= aux.last_pos[..., None])
        alpha = jnp.where(contrib, alpha_raw, 0.0)
        om = 1.0 - alpha
        sp_incl = _rev_cumprod_incl(om)              # prod_{j>=g} om_j
        T_before = T_right[..., None] / sp_incl
        T_next = T_before * om
        T_next_safe = jnp.where(contrib, T_next, 1.0)
        w = jnp.where(contrib, T_before * alpha, 0.0)

        # exact suffix sums (reverse accumulation from zero, like CUDA)
        wc = w[..., None] * ct["rgb"]
        wnn = w[..., None] * ct["nn"]
        S_rgb = S_rgb_c[..., None, :] + _rev_cumsum_excl(wc)
        S_nn = S_nn_c[..., None, :] + _rev_cumsum_excl(wnn)
        om_safe = jnp.where(contrib, om, 1.0)

        # dL/dalpha (backward.cu:822-893): color + normal + bg terms
        accum_rec = S_rgb / T_next_safe[..., None]
        d_alpha = jnp.einsum('tpj,tpcj->tpc', gL_rgb, ct["rgb"] - accum_rec)
        accum_nrec = S_nn / T_next_safe[..., None]
        d_alpha = d_alpha + jnp.einsum('tpj,tpcj->tpc', gL_nn,
                                       ct["nn"] - accum_nrec)
        d_alpha = d_alpha * T_before
        d_alpha = d_alpha + (-T_final[..., None] / om_safe) * bg_dot[..., None]
        d_alpha = jnp.where(contrib, d_alpha, 0.0)

        # distortion -> t (detached weights; unnormalized — the reference's
        # own structure, backward.cu:839-852 + 879-882), via the m chain
        d_m = 2.0 * w * (ct["m"] * final_A[..., None] - final_D1[..., None]) \
            * gL_reg[..., None]
        d_m = jnp.where(contrib, d_m, 0.0)
        d_t_depth = jnp.where((pos == aux.max_pos[..., None]) & contrib,
                              gL_depth[..., None], 0.0)

        # normal channel cotangent: gL_nn weighted by alpha T (the
        # normalization chain lives inside _chunk_eval/vjp)
        d_nn = jnp.where(contrib[..., None],
                         w[..., None] * gL_nn[:, :, None, :], 0.0)

        # rgb cotangent
        d_rgb = jnp.where(contrib[..., None],
                          w[..., None] * gL_rgb[:, :, None, :], 0.0)

        cots = {"alpha_raw": d_alpha, "G": jnp.zeros_like(d_alpha),
                "t": d_t_depth, "m": d_m, "nn": d_nn, "rgb": d_rgb}
        (d_feat_c,) = vjp_fn(cots)

        # densification stats (conic-based, backward.cu:896-909)
        dL_dG = jnp.where(contrib, feat_c[:, None, :, ROW_OPA] * d_alpha, 0.0)
        Gv = ct["G"]
        dx = ex_c[..., 3][:, None, :] - px[..., None]
        dy = ex_c[..., 4][:, None, :] - py[..., None]
        gdx, gdy = Gv * dx, Gv * dy
        dG_ddelx = -gdx * ex_c[..., 0][:, None, :] \
            - gdy * ex_c[..., 1][:, None, :]
        dG_ddely = -gdy * ex_c[..., 2][:, None, :] \
            - gdx * ex_c[..., 1][:, None, :]
        gx = dL_dG * dG_ddelx * (0.5 * s.width)
        gy = dL_dG * dG_ddely * (0.5 * s.height)
        g_m2d = jnp.stack([jnp.sum(gx, 1), jnp.sum(gy, 1),
                           jnp.sum(jnp.abs(gx) + jnp.abs(gy), 1)], -1)

        # advance suffix carries (moving toward the front)
        S_rgb_c = S_rgb_c + jnp.sum(wc, axis=-2)
        S_nn_c = S_nn_c + jnp.sum(wnn, axis=-2)
        T_right = T_right / jnp.prod(om_safe, axis=-1)
        return (T_right, S_rgb_c, S_nn_c), (d_feat_c, g_m2d)

    dt = feat.dtype
    T_tiles = s.grid_x * s.grid_y
    z3 = jnp.zeros((T_tiles, PIX, 3), dt)
    init = (T_final.astype(dt), z3, z3)
    _, (d_feat_chunks, d_m2d_chunks) = jax.lax.scan(
        body, init, jnp.arange(n_chunks - 1, -1, -1, dtype=jnp.int32))

    # (n_chunks, T, C, F) -> (T, K, F); chunks were emitted in REVERSE order
    def to_slab(x):
        x = jnp.flip(x, 0)
        x = jnp.moveaxis(x, 0, 1)                    # (T, n_chunks, C, F)
        return x.reshape(T_tiles, n_chunks * C, *x.shape[3:])

    slab_feat = to_slab(d_feat_chunks)
    slab_m2d = to_slab(d_m2d_chunks)

    seg = jnp.where(win_valid, gids, P).reshape(-1)
    d_feat = jax.ops.segment_sum(
        slab_feat.reshape(-1, NFEAT), seg, num_segments=P + 1)[:P]
    d_m2d = jax.ops.segment_sum(
        slab_m2d.reshape(-1, 3), seg, num_segments=P + 1)[:P]
    return d_feat, d_m2d


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(12,))
def composite(v2g_mb, rgb, opa, conic, means2d, means2d_stats, point_list,
              pair_valid, tile_start, tile_count, bg, row_off,
              statics: RasterStatics):
    """Differentiable tile compositing.  Inputs with gradients: v2g_mb
    (the stable (M, b) ray-quadratic packing, (P, 12)), rgb, opa,
    means2d_stats (a zeros tensor whose cotangent receives the
    densification statistics — the JAX analog of the reference's
    screenspace_points dummy).  row_off: traced int32 global tile-row
    offset of this band (0 for full-frame).  Returns (out (tiles, PIX, 9),
    aux)."""
    feat = _expand_features(v2g_mb, rgb, opa)
    out, aux = _composite_fwd_impl(feat, point_list, pair_valid,
                                   tile_start, tile_count, bg, statics,
                                   row_off)
    return out, aux


def _composite_fwd(v2g_mb, rgb, opa, conic, means2d, means2d_stats,
                   point_list, pair_valid, tile_start, tile_count, bg,
                   row_off, statics):
    feat = _expand_features(v2g_mb, rgb, opa)
    out, aux = _composite_fwd_impl(feat, point_list, pair_valid,
                                   tile_start, tile_count, bg, statics,
                                   row_off)
    res = (v2g_mb, rgb, opa, feat, conic, means2d, point_list, pair_valid,
           tile_start, tile_count, bg, row_off, aux)
    return (out, aux), res


def _composite_bwd(statics, res, cts):
    (v2g_mb, rgb, opa, feat, conic, means2d, point_list, pair_valid,
     tile_start, tile_count, bg, row_off, aux) = res
    g_out, _ = cts   # aux is non-differentiable
    d_feat, d_m2d = _composite_bwd_impl(
        feat, conic, means2d, point_list, pair_valid, tile_start, tile_count,
        bg, statics, aux, g_out, row_off)
    # pull the feature cotangent back to (v2g_mb, rgb, opa) — the expansion
    # is pure per-gaussian math, autodiff is exact
    _, expand_vjp = jax.vjp(_expand_features, v2g_mb, rgb, opa)
    d_mb, d_rgb, d_opa = expand_vjp(d_feat)
    zeros_like = jax.tree_util.tree_map(
        jnp.zeros_like, (conic, means2d, point_list, pair_valid,
                         tile_start, tile_count, bg, row_off))
    return (d_mb, d_rgb, d_opa, zeros_like[0], zeros_like[1], d_m2d,
            zeros_like[2], zeros_like[3], zeros_like[4], zeros_like[5],
            zeros_like[6], zeros_like[7])


composite.defvjp(_composite_fwd, _composite_bwd)


# --- feature-table entry (the XLA twin of pallas_raster.
# composite_from_features): differentiable in the (P+1, FPAD=24) table of
# [19 monomial columns | conic(3) | means2d(2)] + zero sentinel row, so
# gaussian-sharded callers can expand on-shard and all_gather the table.

@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def composite_from_features(allf, stats_dummy, point_list, tile_start,
                            tile_count, bg, row_off, statics: RasterStatics):
    feat = allf[:-1, :NFEAT]
    pair_valid = point_list < allf.shape[0] - 1
    out, aux = _composite_fwd_impl(feat, point_list, pair_valid,
                                   tile_start, tile_count, bg, statics,
                                   row_off)
    return out, aux


def _cffx_fwd(allf, stats_dummy, point_list, tile_start, tile_count, bg,
              row_off, statics):
    out, aux = composite_from_features(allf, stats_dummy, point_list,
                                       tile_start, tile_count, bg, row_off,
                                       statics)
    res = (allf, point_list, tile_start, tile_count, bg, row_off, aux)
    return (out, aux), res


def _cffx_bwd(statics, res, cts):
    (allf, point_list, tile_start, tile_count, bg, row_off, aux) = res
    g_out, _ = cts
    nP1 = allf.shape[0]
    pair_valid = point_list < nP1 - 1
    d_feat, d_m2d = _composite_bwd_impl(
        allf[:-1, :NFEAT], allf[:-1, NFEAT:NFEAT + 3],
        allf[:-1, NFEAT + 3:NFEAT + 5], point_list, pair_valid, tile_start,
        tile_count, bg, statics, aux, g_out, row_off)
    d_allf = jnp.concatenate(
        [jnp.concatenate([d_feat, jnp.zeros((nP1 - 1, 5), d_feat.dtype)], 1),
         jnp.zeros((1, NFEAT + 5), d_feat.dtype)], 0)
    zeros = jax.tree_util.tree_map(
        jnp.zeros_like, (point_list, tile_start, tile_count, bg, row_off))
    return (d_allf, d_m2d) + zeros


composite_from_features.defvjp(_cffx_fwd, _cffx_bwd)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _tiles_to_image(x, s: RasterStatics):
    """(num_tiles, PIX, C) -> (C, H, W), cropping tile padding."""
    C = x.shape[-1]
    img = x.reshape(s.grid_y, s.grid_x, BLOCK, BLOCK, C)
    img = jnp.transpose(img, (4, 0, 2, 1, 3)).reshape(C, s.grid_y * BLOCK,
                                                      s.grid_x * BLOCK)
    return img[:, :s.height, :s.width]


def _pick_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def plan_caps(means3d, scales, quats, opacities, camera, *,
              kernel_size: float = 0.0, scale_modifier: float = 1.0,
              pair_bucket: int = 1 << 16, tile_bucket: int = 128,
              margin: float = 1.25):
    """Two-phase sizing, run OUTSIDE jit once per scene/shape: measure the
    exact pair count and the max per-tile occupancy, return static
    {'pair_cap', 'max_per_tile'} rounded up to buckets (x margin) so the
    subsequent jitted render is exact — the static-shape analog of the CUDA
    resize-and-relaunch (rasterize_points.cu:28-34).  Feed the result to
    render(); render's output dict carries an 'overflow' flag that is True
    iff the caps were still insufficient (then re-plan)."""
    shs_dummy = jnp.zeros((means3d.shape[0], 1, 3), jnp.float32)
    pre = G.preprocess(means3d, scales, quats, opacities, shs_dummy, 0,
                       camera, kernel_size, scale_modifier)
    total = int(B.count_pairs(pre.means2d, pre.radii, camera.width,
                              camera.height))
    pair_cap = B.suggest_pair_cap(int(total * margin), pair_bucket)
    bng = B.bin_gaussians(pre.means2d, pre.radii, pre.depths,
                          camera.width, camera.height, pair_cap)
    max_count = int(jnp.max(bng.tile_count))
    mpt = max(int(max_count * margin), tile_bucket)
    mpt = ((mpt + tile_bucket - 1) // tile_bucket) * tile_bucket
    return {"pair_cap": pair_cap, "max_per_tile": mpt}


def render(means3d, scales, quats, opacities, shs, camera, bg=None, *,
           sh_degree: int = 1, kernel_size: float = 0.0,
           scale_modifier: float = 1.0, pair_cap: int = 1 << 18,
           max_per_tile: int = 1024, chunk: int = 128,
           colors_precomp=None, means2d_stats=None, mask=None,
           backend: str = "auto", interpret: bool = False,
           tile_rows=None):
    """Render one Gaussian set through one camera.  The TPU-native
    counterpart of the reference's rasterize_gaussians + GOF settings
    (diff_gof_rasterization/__init__.py:21-307).

    backend: 'pallas' (TPU kernels, ops/pallas_raster.py), 'xla' (the
    portable scan formulation), or 'auto' (pallas on TPU, xla elsewhere).
    interpret=True runs the Pallas kernels in interpreter mode (CPU tests).

    tile_rows: None for the full frame, or (row_off, n_rows) to rasterize
    only the horizontal BAND of n_rows 16px tile rows starting at global
    tile row row_off (n_rows static int, row_off may be traced) — the unit
    of tile-axis sharding (parallel/sharded.py).  The output images then
    have height n_rows*16.

    Returns a dict mirroring render_predicted_more_v2_gof's output contract
    (src/gaussian_renderer/__init__.py:1059-1067): keys render (3,H,W),
    rendered_normal (camera-space, unnormalized), rendered_depth,
    rendered_alpha, distortion_map, plus radii, out9 and raster aux.
    """
    pre = G.preprocess(means3d, scales, quats, opacities, shs, sh_degree,
                       camera, kernel_size, scale_modifier)
    if mask is not None:
        # fixed-capacity training: dead slots are culled exactly like
        # frustum-failed gaussians (radii = 0 -> no tile pairs)
        pre = pre._replace(radii=jnp.where(mask, pre.radii, 0))
    if colors_precomp is not None:
        rgb = colors_precomp
    else:
        rgb = pre.rgb

    width, height = camera.width, camera.height
    if tile_rows is None:
        row_off = jnp.zeros((), jnp.int32)
        bin_m2d, bin_h = pre.means2d, height
    else:
        row_off, n_rows = tile_rows
        row_off = jnp.asarray(row_off, jnp.int32)
        # shift the gaussians into band-local pixel space for binning only;
        # rect clamping against the band's grid then culls out-of-band rects
        bin_m2d = pre.means2d - jnp.stack(
            [jnp.zeros((), jnp.float32), row_off.astype(jnp.float32) * BLOCK])
        bin_h = n_rows * BLOCK
    # 256-wide pallas chunks halve the kernel grid-step count (and its
    # fixed per-step cost) whenever the compositing window allows it
    lanes = 256 if max_per_tile % 256 == 0 else 128
    # the aligned slab is consumed in (lanes)-wide blocks — its pair region
    # must be a whole number of blocks (matters only for tiny pair_cap)
    pair_cap = ((pair_cap + lanes - 1) // lanes) * lanes
    bng = B.bin_gaussians(bin_m2d, pre.radii, pre.depths, width, bin_h,
                          pair_cap, max_per_tile=max_per_tile, align=lanes)
    statics = RasterStatics(width=width, height=height,
                            grid_x=bng.grid[0], grid_y=bng.grid[1],
                            focal_x=float(camera.focal_x),
                            focal_y=float(camera.focal_y),
                            max_per_tile=max_per_tile, chunk=chunk,
                            interpret=interpret, lanes=lanes)
    if bg is None:
        bg = jnp.zeros(3, jnp.float32)
    if means2d_stats is None:
        means2d_stats = jnp.zeros((means3d.shape[0], 3), jnp.float32)

    # reference-parity opacity gradient: value = opacity * coef but the
    # cotangent flows as d(conic_opacity.w) (backward.cu:912 skips the coef
    # chain; coef == 1 when kernel_size == 0 anyway).
    opa_flat = opacities.reshape(-1)
    opa_in = opa_flat + jax.lax.stop_gradient(pre.opa_coef - opa_flat)

    if _pick_backend(backend) == "pallas":
        from . import pallas_raster
        composite_fn = pallas_raster.composite_pallas
    else:
        composite_fn = composite
    out, aux = composite_fn(pre.v2g_mb, rgb, opa_in, pre.conic,
                            jax.lax.stop_gradient(pre.means2d), means2d_stats,
                            bng.point_list, bng.pair_valid,
                            bng.tile_start, bng.tile_count,
                            jax.lax.stop_gradient(jnp.asarray(bg, jnp.float32)),
                            row_off, statics)
    img_statics = statics if tile_rows is None else statics._replace(
        height=bin_h)
    img = _tiles_to_image(out, img_statics)
    # loud truncation flag (the CUDA reference is exact at any load —
    # rasterizer_impl.cu:247-405 resizes; static caps must self-report):
    # True iff pair_cap overflowed OR any tile holds more pairs than the
    # compositing window walks.  Check it (or use plan_caps) at new shapes.
    overflow = bng.overflow | jnp.any(bng.tile_count > max_per_tile)
    return {
        "render": img[0:3],
        "rendered_normal": img[3:6],
        "rendered_depth": img[6:7],
        "rendered_alpha": img[7:8],
        "distortion_map": img[8:9],
        "out9": img,
        "radii": pre.radii,
        "aux": aux,
        "binning": bng,
        "overflow": overflow,
    }
