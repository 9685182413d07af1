"""Benchmark: fwd+bwd throughput of the differentiable GOF renderer.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Measures the north-star metric (BASELINE.json): Mpix/s/chip for
forward+backward at 256x256 with a pixel-aligned 65,536-Gaussian set — the
exact shape of one F3D-Gaus predictor output (SURVEY.md §6).

vs_baseline: the reference publishes no numbers (BASELINE.md); the divisor
is an engineering estimate of the CUDA diff-gof-rasterization fwd+bwd on
the reference's single-GPU setup: ~8 ms fwd + ~17 ms bwd at 256^2/65k
Gaussians => ~2.6 Mpix/s.  Recorded so the ratio is comparable round to
round; the absolute Mpix/s value is the real signal.
"""
import json
import time

import numpy as np

CUDA_REF_MPIX_S = 2.6


def main():
    import jax
    import jax.numpy as jnp
    from f3d_gaus_tpu.core import cameras
    from f3d_gaus_tpu.ops import rasterize

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

    # two-phase sizing (the framework's operating mode: measure once per
    # scene shape, then render exactly under static caps)
    caps = rasterize.plan_caps(*args[:4], cam)

    @jax.jit
    def fwd_bwd(means, scales, quats, opac, shs):
        def loss(*a):
            out = rasterize.render(*a, cam, bg, chunk=128, **caps)
            return jnp.sum(out["out9"] * w)
        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(means, scales, quats,
                                                       opac, shs)

    # --- on-hardware correctness anchor: the compiled pallas kernels must
    # match the portable XLA formulation ON THIS CHIP before we time them
    # (catches Mosaic lowering differences that interpret-mode CPU tests
    # cannot see).  Channels 0-5,7,8; depth (6) excluded — its
    # max-contributor selection is discrete.  Tolerances allow the known
    # benign discrete flips: a gaussian whose alpha lands exactly at
    # ALPHA_EPS = 1/255 can be included by one backend and excluded by the
    # other (f32 rounding differs between the MXU monomial matmul and the
    # XLA scalar chain), moving a pixel by up to ~alpha*|color| ~ 5e-3 —
    # so the anchor bounds the max error at 2e-2 AND the fraction of
    # pixels above f32 noise at 0.1%.
    parity_max_err = None
    if jax.default_backend() != "cpu":
        sm = slice(0, 4096)
        small = [a[sm] for a in args]
        pa = rasterize.render(*small, cam, bg, chunk=128,
                              backend="pallas", **caps)["out9"]
        xl = rasterize.render(*small, cam, bg, chunk=128,
                              backend="xla", **caps)["out9"]
        ch = jnp.asarray(list(range(6)) + [7, 8])
        err = jnp.abs(pa[ch] - xl[ch])
        parity_max_err = float(jnp.max(err))
        frac_off = float(jnp.mean((err > 1e-3).astype(jnp.float32)))
        assert parity_max_err < 2e-2 and frac_off < 1e-3, (
            f"pallas-vs-xla on-device parity broke: max={parity_max_err} "
            f"frac>1e-3={frac_off}")

    # compile + warmup (two calls: the second absorbs any lazy re-layout)
    out = fwd_bwd(*args)
    jax.block_until_ready(out)
    out = fwd_bwd(*args)
    jax.block_until_ready(out)
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd_bwd(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    mpix_s = (res * res / 1e6) / dt
    rec = {
        "metric": "fwd_bwd_render_256_mpix_per_s_chip",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix_s / CUDA_REF_MPIX_S, 3),
    }
    if parity_max_err is not None:
        rec["parity_max_err"] = parity_max_err
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
