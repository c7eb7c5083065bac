"""Timing and profiling utilities.

The TPU equivalents of the reference's aux tooling (SURVEY.md §5):
CpuTimer/GpuTimer with GCUPS printing (hpc_helpers/timers.cuh) become
``ScopedTimer``; NVTX ranges + nsys wiring become ``device_trace`` around
``jax.profiler`` (view with TensorBoard or xprof).
"""

from __future__ import annotations

import contextlib
import time


class ScopedTimer:
    """CpuTimer-style scoped wall timer; prints on stop like the reference
    (`TIMING: <label>: <s> s`), optionally with GCUPS given a cell count."""

    def __init__(self, label: str, cells: float | None = None, verbose: bool = True):
        self.label = label
        self.cells = cells
        self.verbose = verbose
        self.seconds = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0
        if self.verbose:
            msg = f"TIMING: {self.label}: {self.seconds:.6g} s"
            if self.cells:
                msg += f", {self.cells / 1e9 / self.seconds:.6g} GCUPS"
            print(msg)
        return False


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """Capture a device profile into ``trace_dir`` (no-op when None)."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
