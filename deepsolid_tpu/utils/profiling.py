"""Profiling hooks (jax.profiler integration).

The reference has no profiling support (SURVEY.md §5). Here traces are a
first-class utility: wrap any training span in `trace()` to get a
TensorBoard/XProf trace directory, or use `annotate()` for named regions
inside jitted steps.

Usage:
    from deepsolid_tpu.utils import profiling
    with profiling.trace("/tmp/tb"):
        for _ in range(10):
            step(...)
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(logdir: str, with_host: bool = True) -> Iterator[None]:
    """Capture a device+host trace for the enclosed span."""
    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logging.info("Profiler trace written to %s", logdir)


def annotate(name: str):
    """Named trace region (shows up in XProf timelines)."""
    return jax.profiler.TraceAnnotation(name)


class StepTracer:
    """Capture a windowed device trace from inside a training loop.

    Driven by `cfg.log.trace_path` (train/process.py): call `step(i)` once
    per loop iteration with the loop-relative index; the tracer starts a
    jax.profiler trace at `start` (after compile/warmup noise) and stops it
    `steps` iterations later. `close()` is safe to call unconditionally.
    """

    def __init__(self, logdir: str, start: int = 10, steps: int = 5):
        self.logdir = logdir
        self.start = start
        self.stop = start + steps
        self._active = False

    def step(self, i: int) -> None:
        if not self.logdir:
            return
        if i == self.start and not self._active:
            jax.profiler.start_trace(self.logdir, create_perfetto_link=False)
            self._active = True
        elif i >= self.stop and self._active:
            self.close()

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            logging.info("Profiler trace written to %s", self.logdir)


@contextlib.contextmanager
def timed(name: str, sync: bool = True) -> Iterator[None]:
    """Wall-clock a host span (blocks on async dispatch when sync=True)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            (jax.device_put(0.0) + 0).block_until_ready()
        logging.info("%s: %.1f ms", name, (time.perf_counter() - t0) * 1e3)
