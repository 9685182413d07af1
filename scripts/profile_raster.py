"""Decompose fwd+bwd render time on the real TPU: preprocess / binning /
window build / forward kernel / backward kernel."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from f3d_gaus_tpu.core import cameras, gaussians as G
from f3d_gaus_tpu.ops import rasterize as R, binning as B


def timed(fn, *args, iters=20, label=""):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:32s} {dt:8.2f} ms")
    return dt


def main(backend="pallas"):
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
    bg = jnp.zeros(3, jnp.float32)
    w = jnp.asarray(rng.normal(size=(9, res, res)).astype(np.float32))
    kw = dict(pair_cap=1 << 20, max_per_tile=1024, chunk=128, backend=backend)

    pre = jax.jit(lambda *a: G.preprocess(*a, 1, cam, 0.0, 1.0))
    timed(pre, *args, label="preprocess")
    p = jax.block_until_ready(pre(*args))

    bin_fn = jax.jit(lambda m2, r, d: B.bin_gaussians(m2, r, d, res, res,
                                                      1 << 20))
    timed(bin_fn, p.means2d, p.radii, p.depths, label="binning")
    bng = jax.block_until_ready(bin_fn(p.means2d, p.radii, p.depths))
    cnt = np.asarray(bng.tile_count)
    print(f"  tile_count: max={cnt.max()} mean={cnt.mean():.0f} "
          f"total_pairs={cnt.sum()} overflow={np.asarray(bng.overflow)}")

    fwd = jax.jit(lambda *a: R.render(*a, cam, bg, **kw)["out9"])
    timed(fwd, *args, label=f"forward total ({backend})")

    def loss(*a):
        return jnp.sum(R.render(*a, cam, bg, **kw)["out9"] * w)
    fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    timed(fb, *args, label=f"fwd+bwd total ({backend})")

    vjp_only = jax.jit(lambda *a: jax.vjp(loss, *a)[0])
    timed(vjp_only, *args, label="fwd-of-vjp (fwd+residual)")


if __name__ == "__main__":
    import sys
    main(*(sys.argv[1:] or ["pallas"]))
