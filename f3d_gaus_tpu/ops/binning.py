"""Tile binning under XLA static shapes.

The CUDA reference materializes a dynamically-sized (Gaussian, tile) pair
list (duplicateWithKeys + CUB radix sort + identifyTileRanges,
rasterizer_impl.cu:70-171, with host-side buffer resizing).  XLA requires
static shapes, so this module re-designs that as:

  * a static pair capacity `pair_cap` (over-allocate + mask) — the analog of
    the reference's resizeFunctional closures (rasterize_points.cu:28-34);
  * DEPTH-RANK RELABELING: the P gaussians are depth-sorted ONCE (P-sized
    sort, ~20x smaller than the pair list), and every pair carries the
    gaussian's depth RANK instead of its float depth — sorting pairs by
    (tile, rank) is then exactly the reference's (tile, depth, id) order,
    with two int keys instead of a float key + stability requirements;
  * pair expansion with NO gathers over the pair axis: per-slot step
    functions (segment start, base tile, rect width, gaussian id) are
    reconstructed by scattering per-gaussian VALUE DIFFS at the segment
    starts and integrating with an int32 cumsum — exact in integer
    arithmetic, and ~2 ms/channel cheaper than a random 1M-element gather
    on TPU (measured: the gather formulation cost 13.8 ms of a 14.2 ms
    binning pass at pair_cap 2^18; this formulation ~2 ms total);
  * per-tile ranges via searchsorted (only num_tiles queries — cheap)
    instead of identifyTileRanges.

Everything here is order/selection logic: it runs under stop_gradient; the
differentiable path consumes only the resulting gather indices.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

BLOCK = 16


class Binning(NamedTuple):
    point_list: jnp.ndarray    # (pair_cap,) int32 gaussian ids, depth-sorted per tile
    pair_valid: jnp.ndarray    # (pair_cap,) bool
    tile_start: jnp.ndarray    # (num_tiles,) int32
    tile_count: jnp.ndarray    # (num_tiles,) int32
    num_pairs: jnp.ndarray     # () int32 — actual pairs (<= pair_cap if no overflow)
    overflow: jnp.ndarray      # () bool — true if pair_cap was insufficient
    grid: tuple                # (grid_x, grid_y) static


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


def _fill_forward(values, starts, pair_cap):
    """Reconstruct the per-slot step function slot -> values[segment(slot)]
    by scattering per-segment diffs at the (monotone) segment starts and
    integrating.  Duplicate starts (empty segments) telescope to the LAST
    segment's value — exactly the slot-ownership rule.  int32-exact."""
    diffs = values - jnp.concatenate([values[:1] * 0, values[:-1]])
    # barrier: keep the scatter-add out of kCustom fusions (XLA-TPU's fused
    # scatter emitter is serial — ~12x slower than the standalone scatter)
    diffs = jax.lax.optimization_barrier(diffs)
    acc = jax.lax.optimization_barrier(
        jnp.zeros(pair_cap, values.dtype).at[starts].add(diffs, mode='drop'))
    return jnp.cumsum(acc)


def bin_gaussians(means2d: jnp.ndarray, radii: jnp.ndarray, depths: jnp.ndarray,
                  width: int, height: int, pair_cap: int) -> Binning:
    """Build the depth-sorted per-tile gaussian lists.

    means2d: (P, 2) pixel coords; radii: (P,) int32 (0 = culled);
    depths: (P,) view z.  All inputs are treated as constants
    (stop_gradient applied internally).
    """
    means2d = jax.lax.stop_gradient(means2d)
    radii = jax.lax.stop_gradient(radii)
    depths = jax.lax.stop_gradient(depths)

    grid_x = (width + BLOCK - 1) // BLOCK
    grid_y = (height + BLOCK - 1) // BLOCK
    num_tiles = grid_x * grid_y
    P = means2d.shape[0]

    # Depth-rank relabeling: pairs carry the gaussian's depth RANK, so the
    # within-tile order (depth asc, id asc — the reference's 64-bit
    # tile|depth key + stable expansion order) is ONE int key.  Culled
    # gaussians sort to the back (inf) but emit no pairs anyway.
    ids = jnp.arange(P, dtype=jnp.int32)
    dk = jnp.where(radii > 0, depths.astype(jnp.float32), jnp.inf)
    _, perm = jax.lax.sort((dk, ids), num_keys=1, is_stable=True)

    xmin, ymin, xmax, ymax, count = tile_rects(means2d[perm], radii[perm],
                                               width, height)
    offsets = jnp.cumsum(count)                       # inclusive
    total = offsets[-1] if P > 0 else jnp.int32(0)
    overflow = total > pair_cap

    # Slot j belongs to rank r = (number of segment starts at or before j)
    # - 1.  Empty segments (culled gaussians) scatter a duplicate mark at
    # the next non-empty segment's start; the cumsum counts them, keeping
    # rank a GLOBAL index into the depth order (regression:
    # tests/test_rasterize_parity.py::test_culled_gaussian_between_visible).
    slots = jnp.arange(pair_cap, dtype=jnp.int32)
    starts = offsets - count                          # exclusive offsets
    marks = jnp.zeros(pair_cap, jnp.int32).at[starts].add(1, mode='drop')
    rank = jnp.cumsum(marks) - 1
    pair_valid = slots < total

    # Per-slot step functions, fill-forward (no pair-axis gathers):
    base_tile = ymin * grid_x + xmin
    rect_w = jnp.maximum(xmax - xmin, 1)
    start_f = _fill_forward(starts, starts, pair_cap)
    base_f = _fill_forward(base_tile, starts, pair_cap)
    rectw_f = jnp.maximum(_fill_forward(rect_w, starts, pair_cap), 1)
    gid_f = _fill_forward(perm, starts, pair_cap)

    delta = slots - start_f
    tile = base_f + delta % rectw_f + (delta // rectw_f) * grid_x
    tile = jnp.where(pair_valid, tile, num_tiles)      # sentinel sorts last

    # (tile, rank) is unique per pair -> unstable 2-key sort is exact.
    tile_s, _, gid_s = jax.lax.sort((tile, rank, gid_f), num_keys=2)
    valid_s = tile_s < num_tiles

    tile_start = jnp.searchsorted(tile_s, jnp.arange(num_tiles, dtype=jnp.int32),
                                  side='left').astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_s, jnp.arange(num_tiles, dtype=jnp.int32),
                                side='right').astype(jnp.int32)
    return Binning(point_list=gid_s, pair_valid=valid_s,
                   tile_start=tile_start, tile_count=tile_end - tile_start,
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
