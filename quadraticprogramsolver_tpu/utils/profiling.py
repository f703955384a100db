"""Tracing/profiling helpers (SURVEY.md §5 tracing plan).

The reference profiles with BenchmarkTools timing macros
(`RunBenchmarks.jl:98-104`); the TPU-native equivalents are wall-clock
timing around hard-synced jitted calls (bench/harness.py) and XLA profiler
traces for kernel-level inspection, wrapped here.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto.

    >>> with trace("/tmp/qps-trace"):
    ...     sol = qps.solve_jit(qp, settings)
    ...     jax.block_until_ready(sol.x)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating wall-clock timer.

    Call :func:`hard_sync` on the result *inside* the block, otherwise the
    measurement ends before the (async-dispatched) device work does:

    >>> t = Timer()
    >>> with t.measure():
    ...     sol = qps.solve_jit(qp, settings)
    ...     hard_sync(sol)
    """

    def __init__(self):
        self.total = 0.0
        self.count = 0

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.total += time.perf_counter() - t0
        self.count += 1

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)


def hard_sync(tree) -> None:
    """Pull one scalar to host — reliable completion barrier even through
    remote-TPU relays where block_until_ready returns early."""
    import jax
    import numpy as np

    leaves = jax.tree.leaves(tree)
    if leaves:
        float(np.asarray(leaves[0].ravel()[0]))
