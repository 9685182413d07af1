"""Tile binning under XLA static shapes.

The CUDA reference materializes a dynamically-sized (Gaussian, tile) pair
list (duplicateWithKeys + CUB radix sort + identifyTileRanges,
rasterizer_impl.cu:70-171, with host-side buffer resizing).  XLA requires
static shapes, so this module re-designs that as:

  * a static pair capacity `pair_cap` (over-allocate + mask) — the analog of
    the reference's resizeFunctional closures (rasterize_points.cu:28-34);
  * pair expansion via scatter-of-segment-starts + inclusive cumsum (a
    1M-query searchsorted here costs ~130 ms/frame on TPU — the log-N
    gather loop is the wrong shape; one scatter + one cumsum is ~20x
    cheaper);
  * ONE lexicographic `jax.lax.sort` on (tile_id, depth, gaussian_id)
    replacing the 64-bit-key radix sort — float depth sorts identically to
    its bit pattern for positive values, and the explicit id key reproduces
    the stable tie-break;
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

    xmin, ymin, xmax, ymax, count = tile_rects(means2d, radii, width, height)
    offsets = jnp.cumsum(count)                       # inclusive
    total = offsets[-1] if P > 0 else jnp.int32(0)
    overflow = total > pair_cap

    # slot j belongs to gaussian g = first index with offsets[g] > j.
    # Scatter a 1 at EVERY gaussian's exclusive offset (empty gaussians
    # scatter a duplicate at the next non-empty gaussian's start, so the
    # cumsum still counts them): the running count of segment starts at or
    # before j is exactly g + 1 where g is the GLOBAL gaussian index.
    # (Dropping empty segments here would make the cumsum a rank among
    # non-empty gaussians only — wrong whenever a culled gaussian precedes
    # a visible one, e.g. dead alive-mask slots in per-scene training.)
    slots = jnp.arange(pair_cap, dtype=jnp.int32)
    starts = offsets - count                          # exclusive offsets
    marks = jnp.zeros(pair_cap, jnp.int32).at[starts].add(1, mode='drop')
    gauss = jnp.cumsum(marks) - 1
    pair_valid = slots < total
    gauss_c = jnp.clip(gauss, 0, P - 1)

    start = offsets[gauss_c] - count[gauss_c]          # exclusive offset
    delta = slots - start
    rect_w = jnp.maximum(xmax[gauss_c] - xmin[gauss_c], 1)
    tx = xmin[gauss_c] + delta % rect_w
    ty = ymin[gauss_c] + delta // rect_w
    tile = ty * grid_x + tx
    tile = jnp.where(pair_valid, tile, num_tiles)      # sentinel sorts last

    depth_key = jnp.where(pair_valid, depths[gauss_c], jnp.inf).astype(jnp.float32)
    tile_s, _, gid_s, valid_s = jax.lax.sort(
        (tile, depth_key, gauss_c, pair_valid), num_keys=2, is_stable=True)

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
