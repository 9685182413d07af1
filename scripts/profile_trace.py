"""Capture a jax.profiler trace of the e2e fwd+bwd render and print the
per-op time breakdown (parsed from the perfetto trace JSON)."""
import glob
import gzip
import json
import os
import shutil
import sys
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from f3d_gaus_tpu.core import cameras
from f3d_gaus_tpu.ops import rasterize as R

TRACE_DIR = "/tmp/jaxtrace"


def main(pair_cap_log2=18, max_per_tile=1024):
    res = 256
    n = 256 * 256
    pair_cap = 1 << pair_cap_log2
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
    rng2 = np.random.default_rng(1)
    w9 = jnp.asarray(rng2.normal(size=(9, res, res)).astype(np.float32))
    kw = dict(pair_cap=pair_cap, max_per_tile=max_per_tile, chunk=128,
              backend="pallas")

    def loss(*a):
        return jnp.sum(R.render(*a, cam, bg, **kw)["out9"] * w9)

    fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    jax.block_until_ready(fb(*args))

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(5):
            out = fb(*args)
        jax.block_until_ready(out)

    # parse the perfetto trace
    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, os.listdir(TRACE_DIR)
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # find the TPU op track(s): pids whose process_name mentions TPU and
    # thread names with "XLA Ops" or similar
    names = {}
    threads = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            threads[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    optimes = defaultdict(float)
    opcnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        tname = threads.get((e.get("pid"), e.get("tid")), "")
        pname = names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        if "step" in tname.lower() or "Steps" in tname:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        nm = e["name"]
        optimes[nm] += dur
        opcnt[nm] += 1
        total += dur
    print(f"# total device op time over 5 iters: {total:.2f} ms "
          f"({total / 5:.2f} ms/iter)")
    for nm, tm in sorted(optimes.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{tm / 5:9.3f} ms/iter  x{opcnt[nm] // 5:<4d} {nm[:110]}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 18, int(a[1]) if len(a) > 1 else 1024)
