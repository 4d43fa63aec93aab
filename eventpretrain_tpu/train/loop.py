"""Host-side epoch loops over jitted steps.

Equivalents of the reference trainer functions' non-compute responsibilities
(reference trainer/finetune_cls/ft_cls_trainer.py:15-192,
trainer/pretrain/pr_trainer.py:9-89): iterate the pipeline, call the jitted
step, accumulate metrics. LR scheduling lives inside the optimizer (optax
schedule on the step counter), so there is no per-iteration host adjustment.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import numpy as np

from eventpretrain_tpu.data.prefetch import Prefetcher
from eventpretrain_tpu.train.state import TrainState
from eventpretrain_tpu.utils.logging import MetricLogger


def accepts_step_index(step: Callable) -> bool:
    """Does this step take an explicit ``step_index`` kwarg? Swin pretrain
    steps do (the host cell-mask schedule is keyed by global step index,
    train/steps.py::_HostCellMasker); jitted steps generally don't."""
    cached = getattr(step, "_accepts_step_index", None)
    if cached is not None:
        return cached
    import inspect

    try:
        return "step_index" in inspect.signature(step).parameters
    except (TypeError, ValueError):
        return False


def train_one_epoch(
    step: Callable,
    state: TrainState,
    pipeline: Iterable,
    rng_key: jax.Array,
    *,
    epoch: int = 0,
    print_freq: int = 20,
    header: Optional[str] = None,
) -> tuple[TrainState, dict]:
    """Metric fetches are deferred to the print boundary: a per-step
    ``float()`` forces a device round trip (expensive through the axon
    relay), so steps dispatch asynchronously and metrics flush in bulk
    every ``print_freq`` batches (the step chain on ``state`` still forces
    every step to execute)."""
    logger = MetricLogger()
    header = header or f"Epoch: [{epoch}]"
    pending: list[dict] = []

    def flush():
        for m in pending:
            logger.update(**{k: float(v) for k, v in m.items()})
        pending.clear()

    # the loop owns the authoritative step counter: steps with a host-side
    # schedule (swin cell masks) receive it explicitly, so the
    # _HostCellMasker is_ready() resync heuristic never has to fire in
    # production runs (it remains a fallback for direct step calls)
    pass_index = accepts_step_index(step)
    start_step = int(state.step) if pass_index else 0

    i = 0
    for batch in logger.log_every(
        Prefetcher(pipeline), print_freq, header, on_print=flush
    ):
        rng_key, sub = jax.random.split(rng_key)
        if pass_index:
            state, metrics = step(state, batch, sub,
                                  step_index=start_step + i)
        else:
            state, metrics = step(state, batch, sub)
        pending.append(metrics)
        # keep a bounded dispatch queue (donated buffers + relay memory)
        if len(pending) >= print_freq:
            flush()
        i += 1
    flush()
    return state, logger.global_averages()


def evaluate(
    eval_step: Callable,
    state: TrainState,
    pipeline: Iterable,
    *,
    print_freq: int = 50,
    header: str = "Val:",
) -> dict:
    logger = MetricLogger()
    pending: list[dict] = []
    warned = [False]

    def flush():
        for m in pending:
            vals = {k: float(v) for k, v in m.items()}
            # steps report '_n' = true (unpadded) sample count so wrapped
            # tail-batch pads don't skew the global averages
            n = vals.pop("_n", None)
            if n is None:
                # raw-sum steps (keys like epe_sum/count) are reduced by the
                # caller and don't need weights; a per-sample-mean step
                # without '_n' would silently weight tail-batch pads in
                if not warned[0] and not all(
                    k.endswith("_sum") or k == "count" for k in vals
                ):
                    print("[evaluate] WARNING: eval step metrics lack '_n' "
                          "(unpadded sample count); padded tail batches will "
                          f"skew averages. keys={sorted(vals)}")
                    warned[0] = True
                n = 1
            n = int(n) or 1
            for k, v in vals.items():
                logger.meters[k].update(v, n=n)
        pending.clear()

    for batch in logger.log_every(
        Prefetcher(pipeline), print_freq, header, on_print=flush
    ):
        pending.append(eval_step(state, batch))
        if len(pending) >= print_freq:
            flush()
    flush()
    return logger.global_averages()
