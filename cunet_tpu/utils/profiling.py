"""Tracing / profiling utilities.

The reference's observability is wall-clock ``AverageMeter``s for batch/data
time (ref:cu-net-face-prev-version.py:143-156) plus ``cudnn.benchmark``
autotuning (ref:cu-net.py:31). TPU-native equivalents: a data-vs-step timer,
``jax.profiler`` trace capture around chosen steps (viewable in
TensorBoard/XProf), and XLA cost analysis of compiled steps (FLOPs/bytes,
the static analog of an autotuner report).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax

from cunet_tpu.utils.history import AverageMeter


class StepTimer:
    """Separates host data-wait time from device step time, the analog of the
    reference's data_time/batch_time meter pair."""

    def __init__(self):
        self.data_time = AverageMeter()
        self.step_time = AverageMeter()
        self._mark = time.perf_counter()

    def data_ready(self):
        now = time.perf_counter()
        self.data_time.update(now - self._mark)
        self._mark = now

    def step_done(self):
        now = time.perf_counter()
        self.step_time.update(now - self._mark)
        self._mark = now

    def summary(self) -> str:
        return (
            f"data {self.data_time.avg*1e3:.1f}ms/it "
            f"step {self.step_time.avg*1e3:.1f}ms/it"
        )


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """``jax.profiler`` trace context; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_cost(fn, *args) -> Dict[str, float]:
    """Lower+compile ``fn`` and return XLA's cost analysis (flops, bytes)."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis() or {}
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
    }


def roofline_fraction(flops: float, seconds: float, peak_flops: float) -> float:
    return (flops / seconds) / peak_flops if seconds > 0 and peak_flops > 0 else 0.0


def enable_warning_traces():
    """Turn warnings into printed tracebacks (the reference's debug hook,
    ref:cu-net.py:2-8)."""
    import traceback
    import warnings

    def hook(message, category, filename, lineno, file=None, line=None):
        print(warnings.formatwarning(message, category, filename, lineno, line))
        traceback.print_stack()

    warnings.showwarning = hook
