"""rays/s scaling of the tile+gaussian-sharded renderer over a device mesh.

Two modes:
  python scripts/bench_scaling.py cpu    # 1..8 virtual CPU devices —
      validates the SHAPE of the scaling curve (collective overheads vs
      band compute) where no multi-chip TPU hardware is available
  python scripts/bench_scaling.py tpu    # single real chip rays/s anchor

rays/s counts forward+backward through every pixel ray of a 256^2 frame
(65,536 rays/frame).  The sharded program is parallel/sharded.py:
tile-band compositing + gaussian-sharded preprocess with all_gather, and
psum of per-gaussian gradient partials on the backward.
"""
import json
import os
import sys
import time

MODE = sys.argv[1] if len(sys.argv) > 1 else "cpu"
if MODE == "cpu":
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

if MODE == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from f3d_gaus_tpu.core import cameras  # noqa: E402
from f3d_gaus_tpu.ops import rasterize  # noqa: E402
from f3d_gaus_tpu.parallel import sharded  # noqa: E402


def make_scene(res=256, n=256 * 256):
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
    cloud = [jnp.asarray(a) for a in (means, scales, quats, opac, shs)]
    return cam, cloud


def timed(fn, *args, iters=8):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_devices(n_dev, cam, cloud, caps, res):
    bg = jnp.zeros(3, jnp.float32)
    w9 = jnp.asarray(np.random.default_rng(1).normal(
        size=(9, res, res)).astype(np.float32))
    kw = dict(chunk=128, **caps)

    if n_dev == 1:
        def loss(*c):
            return jnp.sum(rasterize.render(*c, cam, bg, **kw)["out9"] * w9)
        fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
        return timed(fb, *cloud)

    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("tile",))
    # per-device pair capacity shrinks with the band
    kw_s = dict(kw)
    kw_s["pair_cap"] = max(
        rasterize.B.suggest_pair_cap(caps["pair_cap"] // n_dev + 4096),
        1 << 15)

    def loss(*c):
        out = sharded.render_tile_sharded(mesh, "tile", *c, cam, bg,
                                          gaussian_shard=True, **kw_s)
        return jnp.sum(out["out9"] * w9)
    fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    return timed(fb, *cloud)


def main():
    res = 256
    cam, cloud = make_scene(res)
    caps = rasterize.plan_caps(*cloud[:4], cam)
    rays = res * res

    if MODE == "tpu":
        counts = [1]
    else:
        counts = [1, 2, 4, 8]
    results = []
    base = None
    for n in counts:
        dt = bench_devices(n, cam, cloud, caps, res)
        rps = rays / dt
        if base is None:
            base = rps
        eff = rps / (base * n)
        results.append({"devices": n, "rays_per_s": round(rps),
                        "ms_per_frame": round(dt * 1e3, 2),
                        "scaling_efficiency": round(eff, 3)})
        print(json.dumps(results[-1]))
    out = {"mode": MODE, "resolution": res, "rays_per_frame": rays,
           "fwd_bwd": True, "results": results}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"SCALING_{MODE}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
