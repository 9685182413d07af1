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
  * candidates = a +/-W window in Morton order, gathered as a (P, 2W)
    matrix — a single gather, no divergence;
  * top-3 via three masked row minimums (K is tiny and fixed).

The +/-3-seeded exact re-scan of the reference is replaced by a wider
window (default 48 ≈ 16x the CUDA seed window): approximate in adversarial
point sets, indistinguishable for the uniform/cluster distributions that
occur in scale init (see tests/test_knn.py for measured agreement with the
exact oracle).  `mean_dist3_exact` is the O(P^2) chunked oracle.
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


def morton_codes(points: jnp.ndarray) -> jnp.ndarray:
    """30-bit 3D Morton codes on the bounding box of `points` (P, 3)."""
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    ext = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(((points - lo) / ext) * 1023.0, 0.0, 1023.0).astype(jnp.uint32)
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


@functools.partial(jax.jit, static_argnames=("window",))
def mean_dist3(points: jnp.ndarray, window: int = 48) -> jnp.ndarray:
    """Approximate mean squared distance to the 3 nearest neighbors.

    points: (P, 3) float32.  Returns (P,) float32 — the distCUDA2 contract
    (spatial.cu:15-26).  `window` = Morton-order candidates examined on each
    side of every point.
    """
    points = points.astype(jnp.float32)
    P = points.shape[0]
    codes = morton_codes(points)
    order = jnp.argsort(codes)             # radix sort on TPU
    sorted_pts = points[order]

    offs = jnp.concatenate([jnp.arange(-window, 0), jnp.arange(1, window + 1)])
    idx = jnp.arange(P)[:, None] + offs[None, :]            # (P, 2W)
    valid = (idx >= 0) & (idx < P)
    idx = jnp.clip(idx, 0, P - 1)
    cand = sorted_pts[idx]                                   # (P, 2W, 3)
    diff = cand - sorted_pts[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(valid, d2, jnp.finfo(jnp.float32).max)
    mean3_sorted = _top3_mean(d2)

    out = jnp.zeros(P, jnp.float32).at[order].set(mean3_sorted)
    return out


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


def initial_log_scales(points: jnp.ndarray, window: int = 48) -> jnp.ndarray:
    """log(sqrt(clamp(dist2, 1e-7))) per point, tiled to 3 axes — the
    isotropic scale init of GaussianModel.create_from_pcd
    (scene/gaussian_model.py:132-135)."""
    d2 = jnp.clip(mean_dist3(points, window=window), 1e-7, None)
    s = jnp.log(jnp.sqrt(d2))
    return jnp.tile(s[:, None], (1, 3))
