"""Profiling / tracing hooks.

The reference ships no profiling (SURVEY.md §5 — tqdm bars only). On TPU
these wrappers make `jax.profiler` traces and wall-clock step timing
one-liners:

    with trace('/tmp/trace'):            # open in xprof/tensorboard
        pipe(prompt)

    timer = StepTimer()
    for batch in loader:
        with timer:
            state, _ = step(state, batch, rng)   # blocks on result
    print(timer.summary())
"""
from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (device + host timelines)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timing with device synchronization on exit."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync:
            # flush all pending work before stamping
            jax.effects_barrier()
        self.times.append(time.perf_counter() - self._t0)

    def summary(self, skip_warmup: int = 1) -> dict:
        ts = self.times[skip_warmup:] or self.times
        return {
            'steps': len(self.times),
            'mean_s': sum(ts) / max(len(ts), 1),
            'min_s': min(ts) if ts else 0.0,
            'max_s': max(ts) if ts else 0.0,
        }
