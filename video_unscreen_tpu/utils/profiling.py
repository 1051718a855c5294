"""Tracing / profiling.

The reference's only instrumentation is a host wall-clock dict printed
per run (`tools/unscreen/green.py:21-28,58-66`). This module keeps that
user-facing report (`StageTimer`) and adds the TPU-native layer: JAX
profiler traces (`trace()` context, viewable in TensorBoard/Perfetto) and
compiled-program cost introspection (`compiled_stats`).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class StageTimer:
    """Per-stage wall-clock accumulator (the reference's `runtime` dict).

    Stages on device are timed to completion by blocking on the stage
    output when `block=True` (otherwise dispatch time is measured, which
    is what the reference effectively measured for CUDA calls).
    """

    def __init__(self, block: bool = False):
        self.times: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.block = block

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if self.block and result is not None:
                jax.block_until_ready(result)
            self.times[name] += time.perf_counter() - start
            self.counts[name] += 1

    def add(self, name: str, seconds: float):
        self.times[name] += seconds
        self.counts[name] += 1

    def report(self, numframes: Optional[int] = None) -> str:
        """The reference's report format (`green.py:21-28`)."""
        lines = ["-" * 10 + "runtime" + "-" * 10]
        denom = numframes or 1
        for key, value in self.times.items():
            lines.append(f"{key:>16s}: {value / denom:.3f}s")
        lines.append("-" * 10 + "-------" + "-" * 10)
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vu_trace"):
    """JAX profiler trace around a region; view with TensorBoard/Perfetto.

    Also honored implicitly when $VU_TRACE_DIR is set (see `maybe_trace`).
    """
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def maybe_trace():
    """Trace iff $VU_TRACE_DIR is set (zero-cost otherwise)."""
    log_dir = os.environ.get("VU_TRACE_DIR")
    if log_dir:
        with trace(log_dir):
            yield
    else:
        yield


def compiled_stats(compiled) -> Dict[str, float]:
    """FLOPs / memory analysis of a lowered-and-compiled function."""
    try:
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return {"flops": analysis.get("flops", -1.0),
                "bytes_accessed": analysis.get("bytes accessed", -1.0)}
    except Exception:
        return {}
