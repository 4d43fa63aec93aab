"""Jittable train-step factories for the three pretrain stages.

Equivalents of reference trainer/pretrain/pr_trainer.py:9-304's four epoch
functions, redesigned as pure step functions: the epoch loop stays on host
(see train/loop.py); each step is one jitted (grad, update, metrics) program
over the global batch. Under a data-sharded mesh the partitioner inserts
gradient all-reduces and contrastive-key all-gathers automatically.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from eventpretrain_tpu.objectives import (
    reconstruct_loss,
    token_infonce_queue,
    global_token_infonce,
)
from eventpretrain_tpu.ops.masking import masking_noise, make_mask_from_noise
from eventpretrain_tpu.train.optim import global_grad_norm
from eventpretrain_tpu.train.state import TrainState


def make_rec_step(
    hub,
    *,
    patch_size: int,
    num_patches: int,
    mask_ratio: float = 0.75,
    masking_strategy: str = "random",
    norm_pix_loss: bool = True,
) -> Callable:
    """Stage-1 difference-guided masked-modeling step.

    batch = {'evg': (B,H,W,bins), 'frame': (B,H,W,C)} (reference
    pr_trainer.py:9-89 pr_rec_one_epoch + pr_hub_model.py:190-206).
    """
    len_keep = int(num_patches * (1 - mask_ratio))

    def loss_fn(params, state: TrainState, batch, rng):
        rng_mask, rng_drop = jax.random.split(rng)
        evg = batch["evg"]
        noise = masking_noise(rng_mask, evg, patch_size, masking_strategy)
        ids_keep, mask, ids_restore = make_mask_from_noise(noise, len_keep)
        pred, *_ = state.apply_fn(
            {"params": params},
            evg,
            ids_keep,
            ids_restore,
            deterministic=False,
            method=hub.forward_rec,
            rngs={"dropout": rng_drop},
        )
        loss = reconstruct_loss(
            pred,
            batch["frame"],
            mask,
            patch_size=patch_size,
            norm_pix_loss=norm_pix_loss,
            mask_ratio=mask_ratio,
        )
        return loss, {}

    @jax.jit
    def step(state: TrainState, batch, rng):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state, batch, rng
        )
        new_state = state.apply_gradients(grads)
        metrics = {"loss": loss, "grad_norm": global_grad_norm(grads)}
        return new_state, metrics

    return step


def make_con_step(
    hub,
    *,
    use_queue: bool = False,
    temperature: float = 0.07,
) -> Callable:
    """Stage-2/3 contrastive step.

    batch = {'evg': (B,H,W,bins), 'clip_emb': (B,1+L,512)}. Stage 2 vs 3
    differ only in the optimizer's trainable mask (reference
    main_pretrain.py:281-284), not here. Queue mode threads QueueState
    (reference contrastive_loss_queue); global mode uses in-batch negatives
    (reference contrastive_loss).
    """

    def loss_fn(params, state: TrainState, batch, rng):
        variables = {"params": params, "batch_stats": state.batch_stats}
        (q, k, *_), updates = state.apply_fn(
            variables,
            batch["evg"],
            batch["clip_emb"],
            train=True,
            method=hub.forward_con,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        if use_queue:
            loss, new_queue = token_infonce_queue(
                q, k, state.queue, temperature
            )
        else:
            loss = global_token_infonce(q, k, temperature)
            new_queue = state.queue
        return loss, (updates["batch_stats"], new_queue)

    @jax.jit
    def step(state: TrainState, batch, rng):
        (loss, (new_stats, new_queue)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state, batch, rng)
        new_state = state.apply_gradients(
            grads, batch_stats=new_stats, queue=new_queue
        )
        metrics = {"loss": loss, "grad_norm": global_grad_norm(grads)}
        return new_state, metrics

    return step


def make_rec_and_con_step(
    hub,
    *,
    patch_size: int,
    num_patches: int,
    mask_ratio: float = 0.75,
    masking_strategy: str = "random",
    norm_pix_loss: bool = True,
    use_queue: bool = False,
    temperature: float = 0.07,
) -> Callable:
    """Combined rec+con step (reference pr_rec_and_con_one_epoch,
    pr_trainer.py:225-304: two forwards, summed losses)."""
    len_keep = int(num_patches * (1 - mask_ratio))

    def loss_fn(params, state: TrainState, batch, rng):
        rng_mask, rng_drop, rng_drop2 = jax.random.split(rng, 3)
        evg = batch["evg"]
        noise = masking_noise(rng_mask, evg, patch_size, masking_strategy)
        ids_keep, mask, ids_restore = make_mask_from_noise(noise, len_keep)
        pred, *_ = state.apply_fn(
            {"params": params},
            evg,
            ids_keep,
            ids_restore,
            deterministic=False,
            method=hub.forward_rec,
            rngs={"dropout": rng_drop},
        )
        rec = reconstruct_loss(
            pred, batch["frame"], mask,
            patch_size=patch_size, norm_pix_loss=norm_pix_loss,
            mask_ratio=mask_ratio,
        )
        variables = {"params": params, "batch_stats": state.batch_stats}
        (q, k, *_), updates = state.apply_fn(
            variables,
            evg,
            batch["clip_emb"],
            train=True,
            method=hub.forward_con,
            rngs={"dropout": rng_drop2},
            mutable=["batch_stats"],
        )
        if use_queue:
            con, new_queue = token_infonce_queue(q, k, state.queue, temperature)
        else:
            con = global_token_infonce(q, k, temperature)
            new_queue = state.queue
        return rec + con, (updates["batch_stats"], new_queue, rec, con)

    @jax.jit
    def step(state: TrainState, batch, rng):
        (loss, (new_stats, new_queue, rec, con)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state, batch, rng)
        new_state = state.apply_gradients(
            grads, batch_stats=new_stats, queue=new_queue
        )
        metrics = {
            "loss": loss,
            "rec_loss": rec,
            "con_loss": con,
            "grad_norm": global_grad_norm(grads),
        }
        return new_state, metrics

    return step


def make_cls_train_step(hub, *, smoothing: float = 0.0) -> Callable:
    """Classification finetune step (reference ft_cls_trainer.py:15-109).

    batch = {'evg': (B,H,W,C), 'label': (B,)}.
    """
    from eventpretrain_tpu.objectives.cls import cls_loss
    from eventpretrain_tpu.eval.metrics import topk_accuracy

    def loss_fn(params, state: TrainState, batch, rng):
        _, logits, _ = state.apply_fn(
            {"params": params},
            batch["evg"],
            train=True,
            rngs={"dropout": rng},
        )
        loss = cls_loss(logits, batch["label"], smoothing)
        return loss, logits

    @jax.jit
    def step(state: TrainState, batch, rng):
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state, batch, rng
        )
        new_state = state.apply_gradients(grads)
        metrics = {
            "loss": loss,
            "grad_norm": global_grad_norm(grads),
            **topk_accuracy(
                logits, batch["label"],
                topk=(1,) if logits.shape[-1] < 5 else (1, 5),
            ),
        }
        return new_state, metrics

    return step


def make_cls_eval_step(hub) -> Callable:
    """Validation step (reference ft_val, ft_cls_trainer.py:111-192)."""
    from eventpretrain_tpu.objectives.cls import cls_loss
    from eventpretrain_tpu.eval.metrics import topk_accuracy

    @jax.jit
    def step(state: TrainState, batch):
        _, logits, _ = state.apply_fn(
            {"params": state.params}, batch["evg"], train=False
        )
        loss = cls_loss(logits, batch["label"])
        metrics = {
            "loss": loss,
            **topk_accuracy(
                logits, batch["label"],
                topk=(1,) if logits.shape[-1] < 5 else (1, 5),
            ),
        }
        return metrics

    return step
