"""Metric logging: smoothed windows, ETA, JSON-lines epoch log.

Equivalent of reference utils/misc.py:24-190 (SmoothedValue / MetricLogger).
No distributed sync machinery is needed: metrics come out of the jitted step
already reduced over the global batch; `log_every` is purely a host-side
progress reporter. Device metrics are fetched lazily (one blocking transfer
per print window, not per step) to keep the device queue full.
"""

from __future__ import annotations

import collections
import datetime
import json
import os
import time
from typing import Any, Iterable, Iterator

import numpy as np
import jax


class SmoothedValue:
    """Track a series with a smoothing window (reference misc.py:24-83)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = collections.deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        value = float(value)
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


def _peak_device_mb():
    """Peak device-memory use in MB, or None where the backend lacks stats
    (CPU, and the axon relay does not forward memory_stats)."""
    try:
        stats = jax.devices()[0].memory_stats()
        return stats["peak_bytes_in_use"] / 2 ** 20
    except Exception:
        return None


class MetricLogger:
    """Progress logging over an iterable (reference misc.py:86-190)."""

    def __init__(self, delimiter: str = "  "):
        self.meters: dict[str, SmoothedValue] = collections.defaultdict(
            SmoothedValue
        )
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items()
        )

    def log_every(
        self, iterable: Iterable, print_freq: int, header: str = "",
        on_print=None,
    ) -> Iterator:
        i = 0
        start = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        try:
            total = len(iterable)  # type: ignore[arg-type]
        except TypeError:
            total = None
        space = len(str(total)) if total else 6
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or (total and i == total - 1):
                if on_print is not None:
                    on_print()
                if total:
                    eta = iter_time.global_avg * (total - i)
                    eta_str = str(datetime.timedelta(seconds=int(eta)))
                    prog = f"[{i:{space}d}/{total}] eta: {eta_str}"
                else:
                    prog = f"[{i}]"
                parts = [header, prog, str(self),
                         f"time: {iter_time}", f"data: {data_time}"]
                mem = _peak_device_mb()
                if mem is not None:
                    # reference log lines carry max CUDA memory
                    # (utils/misc.py:140-179); this is the HBM equivalent
                    parts.append(f"mem: {mem:.0f}MB")
                print(self.delimiter.join(parts), flush=True)
            i += 1
            end = time.time()
        elapsed = time.time() - start
        print(
            f"{header} Total time: "
            f"{str(datetime.timedelta(seconds=int(elapsed)))} "
            f"({elapsed / max(i, 1):.4f} s/it)",
            flush=True,
        )

    def global_averages(self) -> dict[str, float]:
        return {k: m.global_avg for k, m in self.meters.items()}


def append_log_line(output_dir: str, record: dict[str, Any]):
    """JSON-lines epoch log (reference main_pretrain.py:382-386)."""
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "log.txt"), "a") as f:
        f.write(json.dumps(record) + "\n")


class ScalarWriter:
    """Optional TensorBoard scalar writer (reference main_pretrain.py:222-234
    SummaryWriter + the epoch_1000x calibrated x-axis, pr_trainer.py:65-73).

    No-ops cleanly when tensorboard is unavailable.
    """

    def __init__(self, log_dir: str | None):
        self._writer = None
        if log_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                os.makedirs(log_dir, exist_ok=True)
                self._writer = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._writer = None

    def write(self, metrics: dict, epoch: float, prefix: str = ""):
        if self._writer is None:
            return
        step = int(epoch * 1000)  # epoch_1000x convention
        for k, v in metrics.items():
            try:
                self._writer.add_scalar(f"{prefix}{k}", float(v), step)
            except (TypeError, ValueError):
                pass
        self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()


def count_params(tree) -> float:
    """Re-export of utils.profiling.count_params for CLI convenience."""
    from eventpretrain_tpu.utils.profiling import count_params as _cp

    return _cp(tree)
