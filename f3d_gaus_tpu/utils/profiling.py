"""Tracing / profiling utilities (SURVEY.md §5.1).

The reference times iterations with paired CUDA events
(src/gaussian-splatting/train.py:44-95); the TPU equivalents here are
`jax.profiler` trace capture (Perfetto/XPlane) plus a block-until-ready
step timer and a cheap EMA iteration clock for train loops.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in Perfetto/TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, iters: int = 10, warmup: int = 1, **kw):
    """Wall-clock a jitted callable with device sync; returns (mean_s, out)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


class StepTimer:
    """EMA per-iteration timer for training loops (the iter_time scalar of
    the reference's tensorboard report, train.py:160)."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema = None
        self._last = None

    def tick(self) -> float:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.ema = dt if self.ema is None else \
                (1 - self.alpha) * self.ema + self.alpha * dt
        self._last = now
        return self.ema or 0.0
