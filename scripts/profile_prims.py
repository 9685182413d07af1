"""Micro-benchmarks of the TPU primitives the rasterizer leans on:
row gathers, scatter-add/segment_sum, sorts — to pick layouts."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def timed(fn, *args, iters=30, label=""):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:52s} {dt:8.3f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    P = 65536
    NPAIR = 262144

    feat32 = jnp.asarray(rng.normal(size=(P, 32)).astype(np.float32))
    feat128 = jnp.asarray(rng.normal(size=(P, 128)).astype(np.float32))
    gids = jnp.asarray(rng.integers(0, P, size=(NPAIR,)).astype(np.int32))
    gids_sorted = jnp.sort(gids)

    timed(lambda f, g: f[g], feat32, gids, label="gather (262k rows x 32f)")
    timed(lambda f, g: f[g], feat128, gids, label="gather (262k rows x 128f)")
    timed(lambda f, g: f[g], feat32, gids_sorted,
          label="gather sorted ids (262k x 32f)")
    timed(lambda f, g: jnp.take(f, g, axis=0, indices_are_sorted=True),
          feat32, gids_sorted, label="take sorted-flag (262k x 32f)")
    ft = jnp.asarray(np.ascontiguousarray(np.asarray(feat32).T))
    timed(lambda f, g: f[:, g], ft, gids, label="gather lanes (32 x 262k)")

    slab = jnp.asarray(rng.normal(size=(NPAIR, 32)).astype(np.float32))
    timed(lambda s, g: jax.ops.segment_sum(s, g, num_segments=P),
          slab, gids, label="segment_sum random ids")
    timed(lambda s, g: jax.ops.segment_sum(s, g, num_segments=P,
                                           indices_are_sorted=True),
          slab, gids_sorted, label="segment_sum sorted ids")
    # cumsum + boundary-gather alternative
    starts = jnp.asarray(np.arange(0, NPAIR, 4).astype(np.int32))

    def cumsum_reduce(s, st):
        pref = jnp.cumsum(s, axis=0)
        lo = jnp.concatenate([jnp.zeros((1, 32), s.dtype), pref])[st]
        hi = jnp.concatenate([jnp.zeros((1, 32), s.dtype),
                              pref])[jnp.minimum(st + 4, NPAIR)]
        return hi - lo
    timed(cumsum_reduce, slab, starts, label="cumsum+boundary gather")

    # sorts
    keys2 = (jnp.asarray(rng.integers(0, 256, NPAIR).astype(np.int32)),
             jnp.asarray(rng.integers(0, P, NPAIR).astype(np.int32)),
             jnp.asarray(rng.integers(0, P, NPAIR).astype(np.int32)))
    timed(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2), *keys2,
          label="sort 262k 2-key + 1 payload")
    packed = keys2[0] * (1 << 18) + keys2[1]
    timed(lambda a: jax.lax.sort((a,), num_keys=1)[0], packed,
          label="sort 262k 1-key no payload")
    timed(lambda a, b: jax.lax.sort((a, b), num_keys=1), packed, keys2[2],
          label="sort 262k 1-key + 1 payload")
    packed1m = jnp.concatenate([packed] * 4)
    timed(lambda a: jax.lax.sort((a,), num_keys=1)[0], packed1m,
          label="sort 1M 1-key no payload")

    # scatter with unique indices (inverse-permutation build)
    perm = jnp.asarray(rng.permutation(NPAIR).astype(np.int32))
    timed(lambda p: jnp.zeros(NPAIR, jnp.int32).at[p].set(
        jnp.arange(NPAIR, dtype=jnp.int32), unique_indices=True), perm,
        label="scatter unique int32 262k (inv perm)")
    # one-hot matmul reduce: 2048 blocks of 128 rows -> 128 local segments
    blk = slab.reshape(2048, 128, 32)
    loc = jnp.asarray(rng.integers(0, 128, size=(2048, 128)).astype(np.int32))

    def onehot_reduce(b, l):
        oh = jax.nn.one_hot(l, 128, dtype=jnp.float32)      # (2048,128,128)
        return jnp.einsum('bks,bkf->bsf', oh, b)
    timed(onehot_reduce, blk, loc, label="block one-hot matmul reduce")

    # transcendentals on (256*256, 128) ~ kernel-tile scale
    x = jnp.asarray(rng.uniform(0.1, 1.0, size=(65536, 128)).astype(np.float32))
    timed(lambda x: jnp.exp(x), x, label="exp (65536x128)")
    timed(lambda x: jnp.log(x), x, label="log (65536x128)")
    timed(lambda x: x * 1.5 + 0.1, x, label="fma (65536x128)")


if __name__ == "__main__":
    main()
