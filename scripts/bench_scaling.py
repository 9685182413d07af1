"""rays/s scaling of the tile+gaussian-sharded renderer over a device mesh.

Modes:
  python scripts/bench_scaling.py cpu    # 1..8 virtual CPU devices —
      validates the SHAPE of the scaling curve (collective overheads vs
      band compute) where no multi-chip TPU hardware is available
  python scripts/bench_scaling.py tpu    # single real chip rays/s anchor
  python scripts/bench_scaling.py tpu --multihost
      # multi-host slice: calls parallel.mesh.distributed_init() (env-var
      # driven: JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
      # JAX_PROCESS_ID) and meshes over every process's devices.
      # UNTESTABLE on this single-host box — the flag exists so a pod run
      # is one env-var setup away; see BASELINE.md for the caveat.

MEASUREMENT CAVEAT (cpu mode): the 8 "devices" are XLA host-platform
virtual devices sharing one physical CPU's cores.  Efficiency numbers
therefore measure mostly core contention, NOT interconnect behavior, and
are NOT evidence for or against the >=80%-linear ICI target — only the
curve's qualitative shape (does sharding the bands + gathering the
feature table function and roughly amortize) is meaningful.  Real
scaling must be measured on a multi-chip slice.

Per device count the script also times the gaussian_shard=False variant
(every device redoes the full preprocess; NO all_gather) — the delta
isolates the collective cost (all_gather fwd + reduce_scatter bwd) from
band compute.

rays/s counts forward+backward through every pixel ray of a 256^2 frame
(65,536 rays/frame).  The sharded program is parallel/sharded.py:
tile-band compositing + gaussian-sharded preprocess with all_gather, and
psum of per-gaussian gradient partials on the backward.
"""
import json
import os
import sys
import time

ARGS = sys.argv[1:]
MODE = ARGS[0] if ARGS else "cpu"
MULTIHOST = "--multihost" in ARGS
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


def bench_devices(n_dev, cam, cloud, caps, res, gaussian_shard=True):
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
    # replicate the cloud as GLOBAL arrays on the mesh — required under
    # --multihost (process-local arrays cannot feed a global-mesh
    # shard_map; every process holds identical seeded data), harmless
    # single-host
    from jax.sharding import NamedSharding, PartitionSpec
    repl = NamedSharding(mesh, PartitionSpec())
    cloud = [jax.device_put(c, repl) for c in cloud]
    # per-device pair capacity shrinks with the band
    kw_s = dict(kw)
    kw_s["pair_cap"] = max(
        rasterize.B.suggest_pair_cap(caps["pair_cap"] // n_dev + 4096),
        1 << 15)

    def loss(*c):
        out = sharded.render_tile_sharded(mesh, "tile", *c, cam, bg,
                                          gaussian_shard=gaussian_shard,
                                          **kw_s)
        return jnp.sum(out["out9"] * w9)
    fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    return timed(fb, *cloud)


def main():
    if MULTIHOST:
        from f3d_gaus_tpu.parallel import mesh as M
        initialized = M.distributed_init()
        print(f"multihost: distributed_init -> {initialized}, "
              f"process {jax.process_index()}/{jax.process_count()}, "
              f"{len(jax.devices())} global devices")

    res = 256
    cam, cloud = make_scene(res)
    caps = rasterize.plan_caps(*cloud[:4], cam)
    rays = res * res

    if MULTIHOST:
        # only the FULL global mesh is valid multi-host: a sub-count mesh
        # would contain only process-0's devices while every process runs
        # the program (non-addressable placement error); per-device-count
        # curves come from single-host runs
        counts = [len(jax.devices())]
    elif MODE == "tpu":
        counts = [1]
    else:
        counts = sorted({1, 2, 4, len(jax.devices())})
    results = []
    base = None
    for n in counts:
        if n > len(jax.devices()):
            continue
        dt = bench_devices(n, cam, cloud, caps, res)
        rps = rays / dt
        if base is None:
            base = rps
        eff = rps / (base * n)
        rec = {"devices": n, "rays_per_s": round(rps),
               "ms_per_frame": round(dt * 1e3, 2),
               "scaling_efficiency": round(eff, 3)}
        if n > 1:
            # collective-cost decomposition: gaussian_shard=False removes
            # the all_gather/reduce_scatter (preprocess replicated), so
            # the delta isolates collective time from band compute
            dt_ns = bench_devices(n, cam, cloud, caps, res,
                                  gaussian_shard=False)
            rec["ms_no_gaussian_shard"] = round(dt_ns * 1e3, 2)
            rec["ms_collective_delta"] = round((dt - dt_ns) * 1e3, 2)
        results.append(rec)
        print(json.dumps(rec))
    out = {"mode": MODE, "resolution": res, "rays_per_frame": rays,
           "fwd_bwd": True, "multihost": MULTIHOST, "results": results,
           "methodology_caveat": (
               "cpu mode runs 8 XLA host-platform virtual devices on ONE "
               "physical CPU's shared cores: efficiency measures core "
               "contention, not interconnect, and is NOT evidence for or "
               "against the >=80% ICI-linear target; only the functional "
               "shape of the curve is meaningful. ms_collective_delta "
               "(sharded-preprocess all_gather + grad reduce_scatter vs "
               "replicated preprocess) separates collective cost from "
               "band compute. Real scaling requires a multi-chip slice "
               "(run with --multihost on a pod).")}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"SCALING_{MODE}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
