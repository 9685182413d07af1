"""Decompose binning cost on the real TPU and A/B alternative designs.

Current design (ops/binning.py): slot expansion (scatter+cumsum over
pair_cap) + ONE lexicographic 2-key/4-operand jax.lax.sort over pair_cap.

Candidate redesign (counting sort): depth-sort the P gaussians once (P <<
pairs), build the (P, T) coverage-prefix matrix by cumsum, compute each
pair's final position directly as tile_start[t] + prefix[g, t], scatter.
No comparison sort over the pair list at all.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from f3d_gaus_tpu.core import cameras, gaussians as G
from f3d_gaus_tpu.ops import binning as B


def timed(fn, *args, iters=20, label=""):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:44s} {dt:8.2f} ms")
    return out


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
    p = jax.block_until_ready(
        jax.jit(lambda *a: G.preprocess(*a, 1, cam, 0.0, 1.0))(*args))
    m2, radii, depths = p.means2d, p.radii, p.depths

    for cap_log in (18, 20):
        cap = 1 << cap_log
        timed(jax.jit(lambda a, b, c: B.bin_gaussians(a, b, c, res, res, cap)),
              m2, radii, depths, label=f"bin_gaussians cap=2^{cap_log}")

    # --- sub-steps at cap=2^18 ---
    cap = 1 << 18
    grid_x = grid_y = res // 16
    num_tiles = grid_x * grid_y

    def expand(m2, radii, depths):
        xmin, ymin, xmax, ymax, count = B.tile_rects(m2, radii, res, res)
        offsets = jnp.cumsum(count)
        starts = offsets - count
        marks = jnp.zeros(cap, jnp.int32).at[starts].add(1, mode='drop')
        gauss = jnp.cumsum(marks) - 1
        slots = jnp.arange(cap, dtype=jnp.int32)
        total = offsets[-1]
        pair_valid = slots < total
        gauss_c = jnp.clip(gauss, 0, n - 1)
        start = offsets[gauss_c] - count[gauss_c]
        delta = slots - start
        rect_w = jnp.maximum(xmax[gauss_c] - xmin[gauss_c], 1)
        tx = xmin[gauss_c] + delta % rect_w
        ty = ymin[gauss_c] + delta // rect_w
        tile = ty * grid_x + tx
        tile = jnp.where(pair_valid, tile, num_tiles)
        dk = jnp.where(pair_valid, depths[gauss_c], jnp.inf)
        return tile, dk, gauss_c, pair_valid

    tile, dk, gauss_c, pair_valid = timed(
        jax.jit(expand), m2, radii, depths, label="  expansion only")

    timed(jax.jit(lambda *a: jax.lax.sort(a, num_keys=2, is_stable=True)),
          tile, dk, gauss_c, pair_valid, label="  sort 2key/4op")
    timed(jax.jit(lambda *a: jax.lax.sort(a, num_keys=2, is_stable=True)),
          tile, dk, gauss_c, label="  sort 2key/3op")
    timed(jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1,
                                            is_stable=True)),
          tile.astype(jnp.float32) * 16.0 + dk, gauss_c,
          label="  sort 1key/2op (packed f32)")
    timed(jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1)),
          tile, gauss_c, label="  sort 1key/2op int unstable")

    # depth-sort P gaussians only
    timed(jax.jit(lambda d: jax.lax.sort(
        (d, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=True)),
        depths, label="  depth-sort P=65k")

    # counting-sort position computation
    def counting(m2, radii, depths):
        dk = jnp.where(radii > 0, depths, jnp.inf)
        _, perm = jax.lax.sort((dk, jnp.arange(n, dtype=jnp.int32)),
                               num_keys=1, is_stable=True)
        xmin, ymin, xmax, ymax, count = B.tile_rects(
            m2[perm], radii[perm], res, res)
        # coverage prefix (P, T): number of earlier (nearer) gaussians per tile
        tx = jnp.arange(grid_x, dtype=jnp.int32)
        ty = jnp.arange(grid_y, dtype=jnp.int32)
        covx = (tx[None, :] >= xmin[:, None]) & (tx[None, :] < xmax[:, None])
        covy = (ty[None, :] >= ymin[:, None]) & (ty[None, :] < ymax[:, None])
        cov = (covx[:, None, :] & covy[:, :, None]).reshape(n, num_tiles)
        cov = cov.astype(jnp.int32)
        prefix = jnp.cumsum(cov, axis=0) - cov              # exclusive over P
        tile_count = prefix[-1] + cov[-1]
        tile_start = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                      jnp.cumsum(tile_count)[:-1]])
        pos = tile_start[None, :] + prefix                  # (P, T)
        # scatter ranked-gaussian ids at pos where covered
        flatpos = jnp.where(cov > 0, pos, cap)
        gids = jnp.broadcast_to(perm[:, None], (n, num_tiles))
        point_list = jnp.zeros(cap + 1, jnp.int32).at[
            flatpos.reshape(-1)].set(gids.reshape(-1), mode='drop')
        return point_list[:cap], tile_start, tile_count

    pl2, ts2, tc2 = timed(jax.jit(counting), m2, radii, depths,
                          label="counting-sort total")

    # verify equality against the reference binning
    bng = jax.jit(lambda a, b, c: B.bin_gaussians(a, b, c, res, res, cap))(
        m2, radii, depths)
    npairs = int(bng.num_pairs)
    ok_tiles = np.array_equal(np.asarray(bng.tile_count), np.asarray(tc2))
    pl_ref = np.asarray(bng.point_list)[:npairs]
    pl_new = np.asarray(pl2)[:npairs]
    ok_list = np.array_equal(pl_ref, pl_new)
    print(f"counting == sort-based: tiles={ok_tiles} list={ok_list} "
          f"pairs={npairs}")
    if not ok_list:
        bad = np.nonzero(pl_ref != pl_new)[0]
        print("  first mismatches at", bad[:10])


if __name__ == "__main__":
    main()
