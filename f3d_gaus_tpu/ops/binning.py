"""Tile binning under XLA static shapes — aligned-slab formulation.

The CUDA reference materializes a dynamically-sized (Gaussian, tile) pair
list (duplicateWithKeys + CUB radix sort + identifyTileRanges,
rasterizer_impl.cu:70-171, with host-side buffer resizing).  XLA requires
static shapes, so this module re-designs that as:

  * a static pair capacity `pair_cap` (over-allocate + mask) — the analog of
    the reference's resizeFunctional closures (rasterize_points.cu:28-34);
  * DEPTH-RANK-MAJOR EXPANSION: the P gaussians are depth-sorted ONCE
    (P-sized sort, ~20x smaller than the pair list; the float depth key
    is sorted as a BITCAST int32 — monotone for non-negative IEEE floats,
    and f32 comparators are ~20x slower than s32 on TPU), and pairs are
    expanded in that order, so the expansion SLOT index itself is a
    monotone depth tiebreak — no explicit rank array is materialized;
  * ONE packed int32 pair key `tile * 2^ceil_log2(pair_cap) + slot`
    (exactly the reference's 64-bit tile<<32|depth key, in 31 bits)
    sorted as a single array with the gaussian id as payload;
  * per-slot step functions (segment start, packed rect) recovered by rank
    GATHERS from P-sized tables after one scatter+cumsum builds the rank
    map — replacing four scatter+cumsum fill-forward passes;
  * ALIGNED SLAB OUTPUT: each tile's depth-sorted pair segment is placed at
    a 128-aligned offset (`tile_start` is always a multiple of 128, gaps
    padded with the sentinel id P).  Downstream kernels then address a
    tile's pairs by BLOCK INDEX — the Pallas compositing kernels DMA
    feature blocks straight out of the slab with zero gather ops, which is
    the TPU analog of the CUDA kernel's shared-memory staging by
    `point_list` offset (forward.cu:456-490).

Everything here is order/selection logic: it runs under stop_gradient; the
differentiable path consumes only the resulting gather indices.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

BLOCK = 16
ALIGN = 128           # default slab alignment == pallas chunk width
INT32_MAX = jnp.int32(2147483647)


class Binning(NamedTuple):
    # point_list is the ALIGNED SLAB: size pair_cap + num_tiles*ALIGN;
    # tile t's pairs occupy [tile_start[t], tile_start[t] + tile_count[t]),
    # depth-sorted; tile_start[t] % ALIGN == 0; padding slots hold the
    # sentinel id P (== number of gaussians).
    point_list: jnp.ndarray    # (slab_cap,) int32 gaussian ids, P = padding
    pair_valid: jnp.ndarray    # (slab_cap,) bool — point_list < P
    tile_start: jnp.ndarray    # (num_tiles,) int32, multiples of ALIGN
    tile_count: jnp.ndarray    # (num_tiles,) int32 (UNclamped true count)
    num_pairs: jnp.ndarray     # () int32 — actual pairs (<= pair_cap if no overflow)
    overflow: jnp.ndarray      # () bool — true if pair_cap was insufficient
    grid: tuple                # (grid_x, grid_y) static


def slab_cap(pair_cap: int, width: int, height: int,
             align: int = ALIGN) -> int:
    """Static size of the aligned slab for a given pair capacity + image."""
    grid_x = (width + BLOCK - 1) // BLOCK
    grid_y = (height + BLOCK - 1) // BLOCK
    return pair_cap + grid_x * grid_y * align


def tile_rects(means2d: jnp.ndarray, radii: jnp.ndarray, width: int, height: int):
    """Vectorized getRect (auxiliary.h:64-74).  Returns (xmin, ymin, xmax,
    ymax, count) int32.  radii <= 0 yields count 0."""
    grid_x = (width + BLOCK - 1) // BLOCK
    grid_y = (height + BLOCK - 1) // BLOCK
    r = radii.astype(jnp.float32)
    x, y = means2d[..., 0], means2d[..., 1]
    # (int) cast truncates toward zero; negatives are clamped to 0 anyway so
    # floor is equivalent after the clamp.
    xmin = jnp.clip(jnp.floor((x - r) / BLOCK), 0, grid_x).astype(jnp.int32)
    ymin = jnp.clip(jnp.floor((y - r) / BLOCK), 0, grid_y).astype(jnp.int32)
    xmax = jnp.clip(jnp.floor((x + r + BLOCK - 1) / BLOCK), 0, grid_x).astype(jnp.int32)
    ymax = jnp.clip(jnp.floor((y + r + BLOCK - 1) / BLOCK), 0, grid_y).astype(jnp.int32)
    count = jnp.maximum(xmax - xmin, 0) * jnp.maximum(ymax - ymin, 0)
    count = jnp.where(radii > 0, count, 0)
    return xmin, ymin, xmax, ymax, count


def _sortable_depth_key(depths, radii):
    """Monotone int32 key for non-negative f32 depths (culled -> +inf).
    IEEE non-negative floats bitcast to int32 preserve order; f32 sort
    comparators are ~20x slower than s32 on TPU, so this is load-bearing."""
    dk = jnp.where(radii > 0, jnp.maximum(depths.astype(jnp.float32), 0.0),
                   jnp.inf)
    return jax.lax.bitcast_convert_type(dk, jnp.int32)


def _fill_forward(values, starts, n):
    """Reconstruct the per-slot step function slot -> values[segment(slot)]
    by scattering per-segment diffs at the (monotone) segment starts and
    integrating.  Duplicate starts (empty segments) telescope to the LAST
    segment's value — exactly the slot-ownership rule.  int32-exact."""
    diffs = values - jnp.concatenate([values[:1] * 0, values[:-1]])
    acc = jnp.zeros(n, values.dtype).at[starts].add(diffs, mode='drop')
    return jnp.cumsum(acc)


def bin_gaussians(means2d: jnp.ndarray, radii: jnp.ndarray, depths: jnp.ndarray,
                  width: int, height: int, pair_cap: int,
                  max_per_tile: int | None = None,
                  align: int = ALIGN) -> Binning:
    """Build the aligned per-tile depth-sorted gaussian slab.

    means2d: (P, 2) pixel coords; radii: (P,) int32 (0 = culled);
    depths: (P,) view z (non-negative for visible gaussians).  All inputs
    are treated as constants (stop_gradient applied internally).

    max_per_tile: if given, pairs beyond the first max_per_tile of a tile
    are dropped from the slab (they become sentinel padding) so every slab
    block is walked by an NCH = max_per_tile/128 chunk loop — REQUIRED when
    the slab feeds the Pallas kernels (unwalked blocks would otherwise pass
    uninitialized gradient rows into the segment reduction).  tile_count
    stays unclamped so callers can detect the truncation (overflow check in
    rasterize.render).
    """
    means2d = jax.lax.stop_gradient(means2d)
    radii = jax.lax.stop_gradient(radii)
    depths = jax.lax.stop_gradient(depths)

    grid_x = (width + BLOCK - 1) // BLOCK
    grid_y = (height + BLOCK - 1) // BLOCK
    num_tiles = grid_x * grid_y
    P = means2d.shape[0]
    NPAD = pair_cap + num_tiles * align

    # --- depth-rank relabeling (sortable-int keys).  Two-key non-stable
    # sort == stable single-key sort here (ids are unique and ascending,
    # so the id tiebreak reproduces original order on equal depths), and
    # XLA lowers it ~5x faster on TPU than is_stable=True.
    ids = jnp.arange(P, dtype=jnp.int32)
    ik = _sortable_depth_key(depths, radii)
    _, perm = jax.lax.sort((ik, ids), num_keys=2, is_stable=False)

    xmin, ymin, xmax, ymax, count = tile_rects(means2d[perm], radii[perm],
                                               width, height)
    offsets = jnp.cumsum(count)                       # inclusive
    total = offsets[-1] if P > 0 else jnp.int32(0)
    overflow = total > pair_cap

    slots = jnp.arange(pair_cap, dtype=jnp.int32)
    starts = offsets - count                          # exclusive offsets
    pair_valid = slots < total

    # Per-slot step functions via fill-forward (scatter diffs + integrate).
    # Scalar TPU gathers run ~9 ns/element (serial emitter) so table[rank]
    # lookups are 3-4x SLOWER than one more scatter+cumsum; values are
    # bit-packed so the common shapes need only TWO passes:
    #   word A = start * 128 + rect_w          (start < pair_cap, rect_w <= 127)
    #   word B = base_tile * 2^ceil_log2(P) + gaussian_id
    # rect_w <= grid_x <= 127 for any width <= 2032; wider frames take the
    # unpacked two-pass path below (one extra scatter+cumsum).
    base_tile = ymin * grid_x + xmin
    rect_w = jnp.maximum(xmax - xmin, 1)
    gid_bits = max(int(P).bit_length(), 1)
    packA = pair_cap <= (1 << 24) and grid_x <= 127   # start*128+rect_w fits
    packB = gid_bits + int(num_tiles).bit_length() <= 31
    if packA:
        a_f = _fill_forward(starts * jnp.int32(128) + rect_w, starts,
                            pair_cap)
        start_f = a_f // jnp.int32(128)
        rectw_f = jnp.maximum(a_f % jnp.int32(128), 1)
    else:
        start_f = _fill_forward(starts, starts, pair_cap)
        rectw_f = jnp.maximum(_fill_forward(rect_w, starts, pair_cap), 1)
    if packB:
        gmod = jnp.int32(1 << gid_bits)
        b_f = _fill_forward(base_tile * gmod + perm, starts, pair_cap)
        base_f = b_f // gmod
        gid_f = b_f % gmod
    else:
        base_f = _fill_forward(base_tile, starts, pair_cap)
        gid_f = _fill_forward(perm, starts, pair_cap)

    delta = slots - start_f
    tile = base_f + delta % rectw_f + (delta // rectw_f) * grid_x

    # --- ONE packed int32 sort key: tile * 2^bits(pair_cap) + SLOT.  The
    # expansion slots are already rank-major (slot index is monotone in
    # the gaussian's global depth rank, and a gaussian appears at most
    # once per tile), so the slot itself is a valid — and unique, hence
    # deterministic — depth tiebreak; no rank array or marks cumsum is
    # ever materialized.  Gaussian id rides as the payload array
    # (f32-keyed or 3-array sorts are slower).
    slot_bits = max(int(pair_cap - 1).bit_length(), 1)
    rank_bits = max(int(P - 1).bit_length(), 1)
    tile_bits = int(num_tiles).bit_length()
    if slot_bits + tile_bits <= 31:
        smod = jnp.int32(1 << slot_bits)
        key = jnp.where(pair_valid, tile * smod + slots, INT32_MAX)
        key_s, gid_s = jax.lax.sort((key, gid_f), num_keys=1)
        valid_s = key_s != INT32_MAX
        tile_bounds = jnp.arange(num_tiles + 1, dtype=jnp.int32) * smod
        bounds = jnp.searchsorted(key_s, tile_bounds,
                                  side='left').astype(jnp.int32)
    elif rank_bits + tile_bits <= 31:
        # large frame x large pair_cap: the slot doesn't fit next to the
        # tile bits, but the gaussian's global depth RANK (bits(P) <=
        # bits(pair_cap)) does — materialize it with one marks cumsum
        # (the only path that pays this extra pass) and keep the fast
        # packed single-key sort
        marks = jnp.zeros(pair_cap, jnp.int32).at[starts].add(1,
                                                             mode='drop')
        rank = jnp.cumsum(marks) - 1
        rmod = jnp.int32(1 << rank_bits)
        key = jnp.where(pair_valid, tile * rmod + rank, INT32_MAX)
        key_s, gid_s = jax.lax.sort((key, gid_f), num_keys=1)
        valid_s = key_s != INT32_MAX
        tile_bounds = jnp.arange(num_tiles + 1, dtype=jnp.int32) * rmod
        bounds = jnp.searchsorted(key_s, tile_bounds,
                                  side='left').astype(jnp.int32)
    else:
        # wide fallback (huge P x huge grid): classic 2-key sort
        tile_k = jnp.where(pair_valid, tile, num_tiles)
        tile_s, _, gid_s = jax.lax.sort((tile_k, slots, gid_f), num_keys=2)
        valid_s = tile_s < num_tiles
        tgrid = jnp.arange(num_tiles + 1, dtype=jnp.int32)
        bounds = jnp.searchsorted(tile_s, tgrid, side='left').astype(jnp.int32)
    gid_s = jnp.where(valid_s, gid_s, P)

    tile_start_c = bounds[:-1]                        # compact coords
    tile_count = bounds[1:] - bounds[:-1]

    # --- aligned slab placement: tile t's segment starts at a multiple of
    # ALIGN; downstream kernels block-index it without gathers.
    keep = jnp.minimum(tile_count, pair_cap if max_per_tile is None
                       else max_per_tile)
    csz = ((keep + align - 1) // align) * align
    aligned_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(csz)[:-1]])
    shift_f = _fill_forward(aligned_start - tile_start_c, tile_start_c,
                            pair_cap)
    pos = jnp.where(valid_s, slots + shift_f, NPAD)
    if max_per_tile is not None:
        # drop pairs past the compositing window so every slab block is
        # covered by the kernels' chunk walk
        within = slots - _fill_forward(tile_start_c, tile_start_c, pair_cap)
        pos = jnp.where(within < max_per_tile, pos, NPAD)
    slab = jnp.full((NPAD + 1,), P, jnp.int32).at[pos].set(
        gid_s, mode='drop')[:NPAD]

    return Binning(point_list=slab, pair_valid=slab < P,
                   tile_start=aligned_start, tile_count=tile_count,
                   num_pairs=jnp.minimum(total, pair_cap),
                   overflow=overflow, grid=(grid_x, grid_y))


def count_pairs(means2d, radii, width: int, height: int) -> jnp.ndarray:
    """Exact number of (gaussian, tile) pairs — use to size pair_cap
    (two-phase sizing, the static-shape analog of the CUDA resize-on-demand)."""
    *_, count = tile_rects(jax.lax.stop_gradient(means2d),
                           jax.lax.stop_gradient(radii), width, height)
    return jnp.sum(count)


def suggest_pair_cap(n: int, bucket: int = 1 << 16) -> int:
    """Round a pair count up to a bucket so jit retraces rarely."""
    n = max(int(n), 1)
    return ((n + bucket - 1) // bucket) * bucket
