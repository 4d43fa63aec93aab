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
    logger = MetricLogger()
    header = header or f"Epoch: [{epoch}]"
    for batch in logger.log_every(Prefetcher(pipeline), print_freq, header):
        rng_key, sub = jax.random.split(rng_key)
        state, metrics = step(state, batch, sub)
        logger.update(**{k: float(v) for k, v in metrics.items()})
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
    for batch in logger.log_every(Prefetcher(pipeline), print_freq, header):
        metrics = {k: float(v) for k, v in eval_step(state, batch).items()}
        # steps report '_n' = true (unpadded) sample count so wrapped
        # tail-batch pads don't skew the global averages
        n = int(metrics.pop("_n", 1)) or 1
        for k, v in metrics.items():
            logger.meters[k].update(v, n=n)
    return logger.global_averages()
