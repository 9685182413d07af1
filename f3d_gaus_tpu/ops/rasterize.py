"""The differentiable GOF tile rasterizer, TPU-native formulation (XLA).

Design — not a port.  The CUDA kernel (reference forward.cu:409-612) runs one
thread per pixel looping over depth-sorted Gaussians with data-dependent
early exit; its backward (backward.cu:634-955) re-walks the list in reverse
with atomicAdds.  Neither maps to a vector machine.  This module restates
the same math as a *parallel compositing* problem:

  * per tile, the ray-quadratic terms AA/BB and the ray-space normals of a
    chunk of Gaussians are (pixels x 6/3) @ (6/3 x chunk) MATMULS — MXU work;
  * transmittance T_i = prod_{j<i}(1 - a_j) is an exclusive cumulative
    product along the Gaussian axis;
  * the CUDA early-exit (done once T(1-a) < 1e-4) is provably equivalent to
    masking every Gaussian at or after the FIRST position where the
    unstopped prefix satisfies the bound — a cumulative-or, not control flow;
  * the 2DGS distortion accumulators are exclusive cumulative sums;
  * backward: per-Gaussian gradients are computed per (tile, slot) and
    reduced with one deterministic segment_sum — replacing atomicAdd with a
    reproducible reduction;
  * CUDA's "resize buffers and relaunch" becomes static capacities
    (pair_cap, max_per_tile) chosen by a two-phase count (see
    render_auto_caps).

The backward implements the reference's exact gradient semantics, including
its intentional detachments — see ops/rasterize_ref.py's docstring for the
list.  Numerical parity vs the sequential oracle is tested to ~1e-5.
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


class RasterStatics(NamedTuple):
    """Hashable static configuration of one composite call."""
    width: int
    height: int
    grid_x: int
    grid_y: int
    focal_x: float
    focal_y: float
    max_per_tile: int    # per-tile gather window K
    chunk: int           # gaussians per scan step


class RenderAux(NamedTuple):
    """Per-pixel side outputs (shape (num_tiles, PIX)), all non-differentiable."""
    final_T: jnp.ndarray
    dist1: jnp.ndarray
    dist2: jnp.ndarray
    raw_distortion: jnp.ndarray
    last_pos: jnp.ndarray   # int32 window pos of last contributor, -1 = none
    max_pos: jnp.ndarray    # int32 window pos of the median-depth contributor


def _tile_rays(s: RasterStatics):
    """Per-tile pixel rays: u, v of shape (num_tiles, PIX)."""
    tiles = jnp.arange(s.grid_x * s.grid_y, dtype=jnp.int32)
    tx = (tiles % s.grid_x)[:, None]
    ty = (tiles // s.grid_x)[:, None]
    ix = (jnp.arange(PIX, dtype=jnp.int32) % BLOCK)[None, :]
    iy = (jnp.arange(PIX, dtype=jnp.int32) // BLOCK)[None, :]
    px = (tx * BLOCK + ix).astype(jnp.float32) + 0.5
    py = (ty * BLOCK + iy).astype(jnp.float32) + 0.5
    u = (px - s.width / 2.0) / s.focal_x
    v = (py - s.height / 2.0) / s.focal_y
    return u, v


def _chunk_terms(u, v, mb_c, opa_c, win_valid_c):
    """Shared fwd/bwd per-chunk math, from the cancellation-free (M, b)
    packing (core.gaussians.view2gaussian_mb).

    For ray d = (u, v, 1) and a = M d:
        AA = |a|^2,  BB = 2 a.b,  CC = |b|^2,
        min_value = |a x b|^2 / AA      (sum of squares — stable in f32,
                                         vs the CUDA double-precision
                                         CC - BB^2/4AA, forward.cu:511-522),
        normal = M^T a  (== Sigma^-1-metric normal, == the CUDA A d).

    u, v: (T, PIX); mb_c: (T, C, 12); opa_c: (T, C); win_valid_c: (T, C).
    Returns dict with (T, PIX, C) scalars and (T, PIX, C, 3) vectors a, n.
    """
    M = mb_c[..., 0:9].reshape(mb_c.shape[:-1] + (3, 3))   # (T, C, 3, 3)
    b = mb_c[..., 9:12]                                     # (T, C, 3)
    one = jnp.ones_like(u)
    ray3 = jnp.stack([u, v, one], -1)                       # (T, PIX, 3)

    a = jnp.einsum('tpm,tckm->tpck', ray3, M)               # a = M d   (MXU)
    n = jnp.einsum('tpck,tckj->tpcj', a, M)                 # n = M^T a = A d

    AA = jnp.sum(a * a, -1)
    ab = jnp.einsum('tpck,tck->tpc', a, b)
    BB = 2.0 * ab
    bx = b[:, None, :, :]
    cr0 = a[..., 1] * bx[..., 2] - a[..., 2] * bx[..., 1]
    cr1 = a[..., 2] * bx[..., 0] - a[..., 0] * bx[..., 2]
    cr2 = a[..., 0] * bx[..., 1] - a[..., 1] * bx[..., 0]

    AA_safe = jnp.where(AA == 0, 1e-12, AA)
    t = -BB / (2.0 * AA_safe)
    min_value = (cr0 * cr0 + cr1 * cr1 + cr2 * cr2) / AA_safe
    power = jnp.minimum(0.0, -0.5 * min_value)
    Gv = jnp.exp(power)
    alpha_raw = jnp.minimum(0.99, opa_c[:, None, :] * Gv)
    vc = (t > NEAR_PLANE) & (alpha_raw >= ALPHA_EPS) & win_valid_c[:, None, :]
    alpha = jnp.where(vc, alpha_raw, 0.0)

    t_safe = jnp.where(vc, t, 1.0)
    m = (FAR_PLANE * t_safe - FAR_PLANE * NEAR_PLANE) / ((FAR_PLANE - NEAR_PLANE) * t_safe)
    n0, n1, n2 = n[..., 0], n[..., 1], n[..., 2]
    length = jnp.sqrt(n0 * n0 + n1 * n1 + n2 * n2 + 1e-7)
    return dict(AA=AA_safe, BB=BB, t=t, t_safe=t_safe, alpha=alpha,
                alpha_raw=alpha_raw, G=Gv, vc=vc, m=m, a=a, n=n,
                M=M, b=b, ray3=ray3,
                n0=n0, n1=n1, n2=n2, length=length)


def _gather_chunk(point_list, pair_valid, tile_start, tile_count, chunk_idx,
                  s: RasterStatics, *arrays):
    """Gather chunk `chunk_idx` of each tile's window from per-Gaussian
    arrays.  Returns (gids (T, C), win_valid (T, C), gathered arrays...)."""
    C = s.chunk
    offs = chunk_idx * C + jnp.arange(C, dtype=jnp.int32)[None, :]   # (1, C)
    idx = tile_start[:, None] + offs                                  # (T, C)
    win_valid = (offs < tile_count[:, None]) & (offs < s.max_per_tile)
    idx_c = jnp.clip(idx, 0, point_list.shape[0] - 1)
    gids = point_list[idx_c]
    win_valid = win_valid & pair_valid[idx_c]
    out = [a[gids] for a in arrays]
    return gids, win_valid, out


def _exclusive_cumprod(x, axis):
    incl = jnp.cumprod(x, axis=axis)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, -1)
    return jnp.pad(incl[tuple(sl)], pad, constant_values=1.0)


def _exclusive_cumsum(x, axis):
    incl = jnp.cumsum(x, axis=axis)
    return incl - x


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _composite_fwd_impl(v2g_mb, rgb, opa, point_list, pair_valid, tile_start,
                        tile_count, bg, s: RasterStatics):
    """Returns (out (num_tiles, PIX, 9), aux: RenderAux)."""
    T_tiles = s.grid_x * s.grid_y
    u, v = _tile_rays(s)
    n_chunks = max(s.max_per_tile // s.chunk, 1)

    def body(carry, chunk_idx):
        (T_run, stopped, Crgb, Cnn, Calpha, depth, max_pos, last_pos,
         d1, d2, dist) = carry
        gids, win_valid, (mb_c, rgb_c, opa_c) = _gather_chunk(
            point_list, pair_valid, tile_start, tile_count, chunk_idx, s,
            v2g_mb, rgb, opa)
        ct = _chunk_terms(u, v, mb_c, opa_c, win_valid)
        alpha, vc, t_safe, m = ct['alpha'], ct['vc'], ct['t_safe'], ct['m']

        om = 1.0 - alpha
        T_before = T_run[..., None] * _exclusive_cumprod(om, axis=-1)
        # CUDA stop: first valid g with T(1-a) < 1e-4 halts the pixel; that
        # gaussian itself does not contribute (forward.cu:536-541).
        stop = vc & (T_before * (1.0 - ct['alpha_raw']) < STOP_T)
        stopped_incl = jnp.cumsum(stop.astype(jnp.int32), axis=-1) >= 1
        contrib = vc & (~stopped_incl) & (~stopped[..., None])
        w = jnp.where(contrib, T_before * alpha, 0.0)

        pos = (chunk_idx * s.chunk + jnp.arange(s.chunk, dtype=jnp.int32))[None, None, :]
        # rgb / normal / alpha accumulation
        Crgb = Crgb + jnp.einsum('tpc,tcj->tpj', w, rgb_c)
        inv_len = 1.0 / ct['length']
        Cnn = Cnn + jnp.stack([
            jnp.sum(w * (-ct['n0'] * inv_len), -1),
            jnp.sum(w * (-ct['n1'] * inv_len), -1),
            jnp.sum(w * (-ct['n2'] * inv_len), -1)], -1)
        Calpha = Calpha + jnp.sum(w, -1)

        # median depth: t of the LAST contributor with T_before > 0.5
        sel = contrib & (T_before > 0.5)
        mpos = jnp.max(jnp.where(sel, pos, -1), axis=-1)
        has = mpos >= 0
        local = jnp.clip(mpos - chunk_idx * s.chunk, 0, s.chunk - 1)
        t_at = jnp.take_along_axis(t_safe, local[..., None], axis=-1)[..., 0]
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

    dt = v2g_mb.dtype
    z = lambda *sh: jnp.zeros((T_tiles, PIX) + tuple(sh), dt)
    init = (jnp.ones((T_tiles, PIX), dt),                        # T_run
            jnp.zeros((T_tiles, PIX), bool),                     # stopped
            z(3), z(3), z(),                                     # Crgb Cnn Calpha
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

def _composite_bwd_impl(v2g_mb, rgb, opa, conic, means2d, point_list, pair_valid,
                        tile_start, tile_count, bg, s: RasterStatics,
                        out, aux: RenderAux, g_out):
    """Returns per-Gaussian grads (dv2g_mb (P,12), drgb (P,3), dopa (P,),
    dmean2d_stats (P,3)) via deterministic segment reduction."""
    T_tiles = s.grid_x * s.grid_y
    P = v2g_mb.shape[0]
    u, v = _tile_rays(s)
    n_chunks = max(s.max_per_tile // s.chunk, 1)

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
        # sum over j > i along the last axis
        incl = jnp.flip(jnp.cumsum(jnp.flip(x, -2), -2), -2)
        return incl - x

    def body(carry, chunk_idx):
        """Reverse traversal, the structure of backward.cu:738-953: suffix
        sums are accumulated exactly from zero, T is reconstructed from
        T_final by division (T = T/(1-alpha), :816), and the contributor
        mask re-uses the forward's last_pos (the n_contrib skip, :764)."""
        (T_right, S_rgb_c, S_nn_c, dv2g_p, drgb_p, dopa_p, dm2d_p) = carry
        gids, win_valid, (mb_c, rgb_c, opa_c, conic_c, m2d_c) = _gather_chunk(
            point_list, pair_valid, tile_start, tile_count, chunk_idx, s,
            v2g_mb, rgb, opa, conic, means2d)
        ct = _chunk_terms(u, v, mb_c, opa_c, win_valid)
        alpha, vc = ct['alpha'], ct['vc']

        pos = (chunk_idx * s.chunk + jnp.arange(s.chunk, dtype=jnp.int32))[None, None, :]
        contrib = vc & (pos <= aux.last_pos[..., None])
        alpha = jnp.where(contrib, alpha, 0.0)
        om = 1.0 - alpha
        sp_incl = _rev_cumprod_incl(om)              # prod_{j>=g} om_j
        T_before = T_right[..., None] / sp_incl
        T_next = T_before * om                       # == T_right / prod_{j>g}
        T_next_safe = jnp.where(contrib, T_next, 1.0)
        w = jnp.where(contrib, T_before * alpha, 0.0)

        # exact suffix sums (reverse accumulation from zero, like CUDA)
        wc = w[..., None] * rgb_c[:, None, :, :]                  # (T,PIX,C,3)
        inv_len = 1.0 / ct['length']
        nn = jnp.stack([-ct['n0'] * inv_len, -ct['n1'] * inv_len,
                        -ct['n2'] * inv_len], -1)                  # (T,PIX,C,3)
        wnn = w[..., None] * nn
        S_rgb = S_rgb_c[..., None, :] + _rev_cumsum_excl(wc)
        S_nn = S_nn_c[..., None, :] + _rev_cumsum_excl(wnn)

        om_safe = jnp.where(contrib, om, 1.0)

        # dL/dalpha (backward.cu:822-893): color + normal + bg terms
        accum_rec = S_rgb / T_next_safe[..., None]
        d_alpha = jnp.einsum('tpj,tpcj->tpc', gL_rgb,
                             rgb_c[:, None, :, :] - accum_rec)
        accum_nrec = S_nn / T_next_safe[..., None]
        d_alpha = d_alpha + jnp.einsum('tpj,tpcj->tpc', gL_nn, nn - accum_nrec)
        d_alpha = d_alpha * T_before
        d_alpha = d_alpha + (-T_final[..., None] / om_safe) * bg_dot[..., None]
        d_alpha = jnp.where(contrib, d_alpha, 0.0)

        # distortion -> t (detached weights; unnormalized — the reference's
        # own structure, backward.cu:839-852 + 879-882)
        dmax_t_dd = (FAR_PLANE * NEAR_PLANE) / ((FAR_PLANE - NEAR_PLANE) * ct['t_safe'] ** 2)
        dL_dmax_t = (2.0 * w * (ct['m'] * final_A[..., None] - final_D1[..., None])
                     * gL_reg[..., None] * dmax_t_dd)
        dL_dt = dL_dmax_t + jnp.where(pos == aux.max_pos[..., None],
                                      gL_depth[..., None], 0.0)
        dL_dt = jnp.where(contrib, dL_dt, 0.0)

        # alpha -> G -> quadratic (clamps pass gradients through, as in CUDA)
        dL_dG = opa_c[:, None, :] * d_alpha
        dopa_contrib = ct['G'] * d_alpha                           # note: no coef chain
        dL_dpower = dL_dG * ct['G']
        dL_dmin = -0.5 * dL_dpower
        AA, BB = ct['AA'], ct['BB']
        ratio = BB / AA
        dL_dA = dL_dmin * ratio * ratio / 4.0 + dL_dt * BB / (2.0 * AA * AA)
        dL_dB = dL_dmin * (-ratio) / 2.0 + dL_dt * (-1.0) / (2.0 * AA)
        dL_dC = dL_dmin

        # normal-channel gradient through the normalization (backward.cu:860-877)
        dL_dnn = (alpha * T_before)[..., None] * gL_nn[..., None, :]
        dL_dnn = jnp.where(contrib[..., None], dL_dnn, 0.0)
        n_vec = ct['n']
        dL_dlen = jnp.sum(dL_dnn * n_vec, -1) / (ct['length'] ** 2)
        dL_dnormal = (-dL_dnn + dL_dlen[..., None] * n_vec) / ct['length'][..., None]
        # fold dL_dA into the normal cotangent: AA = n . d exactly (n = A d),
        # the same fold the CUDA code does via dL_dnormal += dL_dA * d.
        ray3 = ct['ray3']
        gn = dL_dnormal + dL_dA[..., None] * ray3[:, :, None, :]

        # map (dL_dn, dL_dBB, dL_dCC) -> (dL_dM, dL_db).  With a = M d,
        # n = M^T a:  dL_dM = M (X + X^T) + 2 b yB^T,  dL_db = 2 M yB + 2 sC b,
        # where X = sum_p d_p gn_p^T, yB = sum_p dL_dBB,p d_p, sC = sum_p dL_dCC.
        # All pixel reductions are MXU contractions over PIX.
        M_c, b_c = ct['M'], ct['b']
        X = jnp.einsum('tpm,tpcn->tcmn', ray3, gn)
        Xs = X + jnp.swapaxes(X, -1, -2)
        yB = jnp.einsum('tpc,tpm->tcm', dL_dB, ray3)
        sC = jnp.sum(dL_dC, axis=1)
        g_M = (jnp.einsum('tckj,tcjq->tckq', M_c, Xs)
               + 2.0 * b_c[..., :, None] * yB[..., None, :])
        g_b = 2.0 * jnp.einsum('tckm,tcm->tck', M_c, yB) + 2.0 * sC[..., None] * b_c
        g_mb = jnp.concatenate(
            [g_M.reshape(g_M.shape[:2] + (9,)), g_b], -1)           # (T,C,12)
        g_rgb = jnp.einsum('tpc,tpj->tcj', w, gL_rgb)
        g_opa = jnp.sum(dopa_contrib, axis=1)

        # densification stats (conic-based, backward.cu:896-909)
        dx = m2d_c[..., 0][:, None, :] - px[..., None]
        dy = m2d_c[..., 1][:, None, :] - py[..., None]
        Gv = ct['G']
        gdx, gdy = Gv * dx, Gv * dy
        co = conic_c[:, None, :, :]
        dG_ddelx = -gdx * co[..., 0] - gdy * co[..., 1]
        dG_ddely = -gdy * co[..., 2] - gdx * co[..., 1]
        gx = dL_dG * dG_ddelx * (0.5 * s.width)
        gy = dL_dG * dG_ddely * (0.5 * s.height)
        gx = jnp.where(contrib, gx, 0.0)
        gy = jnp.where(contrib, gy, 0.0)
        g_m2d = jnp.stack([jnp.sum(gx, 1), jnp.sum(gy, 1),
                           jnp.sum(jnp.abs(gx) + jnp.abs(gy), 1)], -1)

        # scatter into pair slots (each slot written once per scan)
        offs = chunk_idx * s.chunk + jnp.arange(s.chunk, dtype=jnp.int32)[None, :]
        slot = jnp.clip(tile_start[:, None] + offs, 0, point_list.shape[0] - 1)
        wv = (offs < tile_count[:, None]) & (offs < s.max_per_tile)
        flat = slot.reshape(-1)
        wvf = wv.reshape(-1)
        dv2g_p = dv2g_p.at[flat].add(jnp.where(wvf[:, None], g_mb.reshape(-1, 12), 0.0))
        drgb_p = drgb_p.at[flat].add(jnp.where(wvf[:, None], g_rgb.reshape(-1, 3), 0.0))
        dopa_p = dopa_p.at[flat].add(jnp.where(wvf, g_opa.reshape(-1), 0.0))
        dm2d_p = dm2d_p.at[flat].add(jnp.where(wvf[:, None], g_m2d.reshape(-1, 3), 0.0))

        # advance suffix carries (moving toward the front)
        S_rgb_c = S_rgb_c + jnp.sum(wc, axis=-2)
        S_nn_c = S_nn_c + jnp.sum(wnn, axis=-2)
        T_right = T_right / jnp.prod(om_safe, axis=-1)
        return (T_right, S_rgb_c, S_nn_c, dv2g_p, drgb_p, dopa_p, dm2d_p), None

    dt = v2g_mb.dtype
    z3 = jnp.zeros((T_tiles, PIX, 3), dt)
    init = (T_final.astype(dt), z3, z3,
            jnp.zeros((point_list.shape[0], 12), dt),
            jnp.zeros((point_list.shape[0], 3), dt),
            jnp.zeros((point_list.shape[0],), dt),
            jnp.zeros((point_list.shape[0], 3), dt))
    (_, _, _, dv2g_p, drgb_p, dopa_p, dm2d_p), _ = jax.lax.scan(
        body, init, jnp.arange(n_chunks - 1, -1, -1, dtype=jnp.int32))

    seg = point_list
    dv2g = jax.ops.segment_sum(dv2g_p, seg, num_segments=P)
    drgb = jax.ops.segment_sum(drgb_p, seg, num_segments=P)
    dopa = jax.ops.segment_sum(dopa_p, seg, num_segments=P)
    dm2d = jax.ops.segment_sum(dm2d_p, seg, num_segments=P)
    return dv2g, drgb, dopa, dm2d


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def composite(v2g_mb, rgb, opa, conic, means2d, means2d_stats, point_list,
              pair_valid, tile_start, tile_count, bg, statics: RasterStatics):
    """Differentiable tile compositing.  Inputs with gradients: v2g_mb
    (the stable (M, b) ray-quadratic packing, (P, 12)), rgb, opa,
    means2d_stats (a zeros tensor whose cotangent receives the
    densification statistics — the JAX analog of the reference's
    screenspace_points dummy).  Returns (out (tiles, PIX, 9), aux)."""
    out, aux = _composite_fwd_impl(v2g_mb, rgb, opa, point_list, pair_valid,
                                   tile_start, tile_count, bg, statics)
    return out, aux


def _composite_fwd(v2g_mb, rgb, opa, conic, means2d, means2d_stats,
                   point_list, pair_valid, tile_start, tile_count, bg, statics):
    out, aux = _composite_fwd_impl(v2g_mb, rgb, opa, point_list, pair_valid,
                                   tile_start, tile_count, bg, statics)
    res = (v2g_mb, rgb, opa, conic, means2d, point_list, pair_valid,
           tile_start, tile_count, bg, out, aux)
    return (out, aux), res


def _composite_bwd(statics, res, cts):
    (v2g_mb, rgb, opa, conic, means2d, point_list, pair_valid,
     tile_start, tile_count, bg, out, aux) = res
    g_out, _ = cts   # aux is non-differentiable
    dv2g, drgb, dopa, dm2d = _composite_bwd_impl(
        v2g_mb, rgb, opa, conic, means2d, point_list, pair_valid,
        tile_start, tile_count, bg, statics, out, aux, g_out)
    zeros_like = jax.tree_util.tree_map(jnp.zeros_like,
                                        (conic, means2d, point_list, pair_valid,
                                         tile_start, tile_count, bg))
    return (dv2g, drgb, dopa, zeros_like[0], zeros_like[1], dm2d,
            zeros_like[2], zeros_like[3], zeros_like[4], zeros_like[5],
            zeros_like[6])


composite.defvjp(_composite_fwd, _composite_bwd)


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


def render(means3d, scales, quats, opacities, shs, camera, bg=None, *,
           sh_degree: int = 1, kernel_size: float = 0.0,
           scale_modifier: float = 1.0, pair_cap: int = 1 << 18,
           max_per_tile: int = 1024, chunk: int = 128,
           colors_precomp=None, means2d_stats=None, mask=None):
    """Render one Gaussian set through one camera.  The TPU-native
    counterpart of the reference's rasterize_gaussians + GOF settings
    (diff_gof_rasterization/__init__.py:21-307).

    Returns a dict mirroring render_predicted_more_v2_gof's output contract
    (src/gaussian_renderer/__init__.py:1059-1067): keys render (3,H,W),
    rendered_normal (camera-space, unnormalized), rendered_depth, rendered_alpha,
    distortion_map, plus radii, out9 and raster aux.
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
    bng = B.bin_gaussians(pre.means2d, pre.radii, pre.depths, width, height,
                          pair_cap)
    statics = RasterStatics(width=width, height=height,
                            grid_x=bng.grid[0], grid_y=bng.grid[1],
                            focal_x=float(camera.focal_x),
                            focal_y=float(camera.focal_y),
                            max_per_tile=max_per_tile, chunk=chunk)
    if bg is None:
        bg = jnp.zeros(3, jnp.float32)
    if means2d_stats is None:
        means2d_stats = jnp.zeros((means3d.shape[0], 3), jnp.float32)

    # reference-parity opacity gradient: value = opacity * coef but the
    # cotangent flows as d(conic_opacity.w) (backward.cu:912 skips the coef
    # chain; coef == 1 when kernel_size == 0 anyway).
    opa_flat = opacities.reshape(-1)
    opa_in = opa_flat + jax.lax.stop_gradient(pre.opa_coef - opa_flat)

    out, aux = composite(pre.v2g_mb, rgb, opa_in, pre.conic,
                         jax.lax.stop_gradient(pre.means2d), means2d_stats,
                         bng.point_list, bng.pair_valid,
                         bng.tile_start, bng.tile_count,
                         jax.lax.stop_gradient(jnp.asarray(bg, jnp.float32)),
                         statics)
    img = _tiles_to_image(out, statics)
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
    }
