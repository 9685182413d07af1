"""Nearest-neighbor mean distance for per-point scale initialization.

TPU-native equivalent of simple-knn (reference
src/gaussian-splatting/submodules/simple-knn/simple_knn.cu:185-221, exposed
as `distCUDA2`): for every point, the mean of the squared distances to its
3 nearest neighbors.  The per-scene trainer initializes log-scales from it
(scene/gaussian_model.py:134: log(sqrt(clamp(dist2, 1e-7)))).

Design — not a port.  The CUDA code radix-sorts 30-bit Morton codes, then
runs a per-thread scan over 1024-point boxes with AABB distance rejection
(exact, but wildly divergent).  On TPU the same locality idea becomes a
fully vectorized windowed search:

  * 10-bit-per-axis Morton codes (coord2Morton, simple_knn.cu:41-61) via
    int bit-interleaving — pure jnp integer ops;
  * ONE `jax.lax.sort` by code (TPU-native radix sort);
  * candidates = the union of +/-W windows along SEVERAL SHIFTED Morton
    curves (a single Morton curve has systematic misses at cell-boundary
    crossings; shifted copies of the curve are the standard fix for
    space-filling-curve KNN) — gathered as one (P, S*2W) matrix;
  * per-row sort by distance with carried ids, duplicate-id masking, then
    top-3 (K is tiny and fixed).

The +/-3-seeded exact AABB re-scan of the reference is replaced by this
candidate union: approximate for adversarial point sets, but with multiple
shifts the miss rate is tiny for the distributions that occur in scale
init, and any error strictly OVERestimates the distance (a missed neighbor
can only make the reported distance larger) — see tests/test_knn.py for
measured agreement.  `mean_dist3_exact` is the O(P^2) chunked oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

K = 3  # neighbors, fixed by the reference contract


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so consecutive bits are 3 apart
    (Morton prep; the integer sequence of simple_knn.cu:41-52)."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton_codes(points: jnp.ndarray, shift: float = 0.0,
                 scale: float = 1023.0) -> jnp.ndarray:
    """30-bit 3D Morton codes on the bounding box of `points` (P, 3).

    `shift` (in quantization-grid units, up to 1023 - scale) translates the
    whole domain before quantization: shifted copies of the curve have their
    coarse cell boundaries in different places, which is what makes the
    multi-curve candidate union (Chan-style shifted-grid KNN) work.
    """
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    ext = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(((points - lo) / ext) * scale + shift, 0.0, 1023.0)
    q = q.astype(jnp.uint32)
    x, y, z = _expand_bits(q[:, 0]), _expand_bits(q[:, 1]), _expand_bits(q[:, 2])
    return (x | (y << jnp.uint32(1)) | (z << jnp.uint32(2))).astype(jnp.uint32)


def _top3_mean(d2: jnp.ndarray) -> jnp.ndarray:
    """Mean of the 3 smallest entries along the last axis. d2: (P, C)."""
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    total = jnp.zeros(d2.shape[:-1], jnp.float32)
    for _ in range(K):
        m = jnp.min(d2, axis=-1)
        total = total + m
        # mask exactly one occurrence of the current minimum
        is_min = d2 == m[..., None]
        first = jnp.cumsum(is_min.astype(jnp.int32), axis=-1) == 1
        d2 = jnp.where(is_min & first, big, d2)
    return total / K


@functools.partial(jax.jit, static_argnames=("window", "shifts"))
def mean_dist3(points: jnp.ndarray, window: int = 32,
               shifts: int = 6) -> jnp.ndarray:
    """Approximate mean squared distance to the 3 nearest neighbors.

    points: (P, 3) float32.  Returns (P,) float32 — the distCUDA2 contract
    (spatial.cu:15-26).  `window` = candidates gathered on each side of
    every point along each of `shifts` shifted Morton curves; the union is
    deduplicated by candidate id before the top-3 selection.
    """
    points = points.astype(jnp.float32)
    P = points.shape[0]
    big = jnp.finfo(jnp.float32).max
    offs = jnp.concatenate([jnp.arange(-window, 0), jnp.arange(1, window + 1)])

    # leave room for the largest shift: quantize with `scale`, shift by
    # i * (1023 - scale) / (shifts - 1)
    scale = 1023.0 * (2.0 / (shifts + 1.0))
    cand_ids = []
    for s in range(shifts):
        shift = s * (1023.0 - scale) / max(shifts - 1, 1)
        order = jnp.argsort(morton_codes(points, shift=shift, scale=scale))
        rank = jnp.zeros(P, jnp.int32).at[order].set(
            jnp.arange(P, dtype=jnp.int32))
        idx = rank[:, None] + offs[None, :]                  # (P, 2W) ranks
        valid = (idx >= 0) & (idx < P)
        ids = order[jnp.clip(idx, 0, P - 1)]                 # original ids
        cand_ids.append(jnp.where(valid, ids, P))            # P = sentinel
    cand = jnp.concatenate(cand_ids, axis=1)                 # (P, S*2W)

    cand_c = jnp.clip(cand, 0, P - 1)
    diff = points[cand_c] - points[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(cand == P, big, d2)

    # dedup: row-sort by (d2, id); duplicates become adjacent equal pairs
    d2s, ids_s = jax.lax.sort((d2, cand), num_keys=2, dimension=1)
    dup = jnp.concatenate(
        [jnp.zeros((P, 1), bool), ids_s[:, 1:] == ids_s[:, :-1]], axis=1)
    d2s = jnp.where(dup, big, d2s)
    # after masking, the 3 smallest are among the first 3 + (#masked<=S-1)
    head = d2s[:, : 3 * shifts]
    return _top3_mean(head)


def mean_dist3_exact(points: jnp.ndarray, chunk: int = 1024) -> jnp.ndarray:
    """Exact O(P^2) oracle, chunked over rows.  Test/small-P use only."""
    points = jnp.asarray(points, jnp.float32)
    P = points.shape[0]
    pad = (-P) % chunk
    pts_pad = jnp.pad(points, ((0, pad), (0, 0)))

    def row_chunk(c):
        rows = jax.lax.dynamic_slice_in_dim(pts_pad, c * chunk, chunk)
        d2 = jnp.sum((rows[:, None, :] - points[None, :, :]) ** 2, -1)
        row_ids = c * chunk + jnp.arange(chunk)
        self_mask = row_ids[:, None] == jnp.arange(P)[None, :]
        d2 = jnp.where(self_mask, jnp.finfo(jnp.float32).max, d2)
        return _top3_mean(d2)

    n_chunks = (P + pad) // chunk
    out = jax.lax.map(row_chunk, jnp.arange(n_chunks)).reshape(-1)
    return out[:P]


def initial_log_scales(points: jnp.ndarray, window: int = 32) -> jnp.ndarray:
    """log(sqrt(clamp(dist2, 1e-7))) per point, tiled to 3 axes — the
    isotropic scale init of GaussianModel.create_from_pcd
    (scene/gaussian_model.py:132-135)."""
    d2 = jnp.clip(mean_dist3(points, window=window), 1e-7, None)
    s = jnp.log(jnp.sqrt(d2))
    return jnp.tile(s[:, None], (1, 3))
