"""Profiling helpers (the reference has only ad-hoc @time calls —
SURVEY.md §5; here: structured tracing + simple timers)."""

from __future__ import annotations

import contextlib
import time
import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/spock_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that blocks on device results.

    with Timer() as t:
        out = fn(x)
        t.block(out)
    print(t.elapsed)
    """

    def __enter__(self):
        self.t0 = time.perf_counter()
        self.elapsed = None
        return self

    def block(self, out):
        jax.block_until_ready(out)
        return out

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False


def time_fn(fn, *args, iters: int = 3, warmup: int = 1) -> float:
    """Median wall time of ``fn(*args)`` with compile warmup."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
