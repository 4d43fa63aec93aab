"""Profiling & observability hooks.

TPU-native replacement for the reference's hand-rolled timing (reference
utils/misc.py:129-190 iter/data-time windows + cuda max-memory print and the
commented-out ptflops counts, main_pretrain.py:308-315):

- ``trace`` context manager wraps steps in a jax.profiler trace viewable in
  TensorBoard/Perfetto;
- ``device_memory_stats`` reports per-device HBM usage;
- ``count_params`` / ``count_flops`` report model size and compiled FLOPs
  (XLA cost analysis — the ptflops equivalent).
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Capture a profiler trace of the enclosed steps."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict[str, float]:
    """Per-device memory in MB (equivalent of the reference's max-memory
    column, utils/misc.py:140-179); empty when the backend lacks stats."""
    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use_mb": stats.get("bytes_in_use", 0) / 1e6,
                "peak_bytes_in_use_mb": stats.get("peak_bytes_in_use", 0) / 1e6,
            }
    return out


def count_params(params: Any) -> float:
    """Trainable parameter count in millions
    (reference main_finetune_cls.py:394-398)."""
    return sum(np.prod(x.shape) for x in jax.tree.leaves(params)) / 1e6


def count_flops(fn: Callable, *args, **kwargs) -> Optional[float]:
    """FLOPs of the compiled fn via XLA cost analysis (ptflops equivalent)."""
    try:
        compiled = jax.jit(fn).lower(*args, **kwargs).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0))
    except Exception:
        return None
