"""Orbax checkpointing of train-state pytrees.

Equivalent of reference utils/misc.py:318-403 (save_model / save_best_model /
load_model): writes {params, batch_stats, opt_state, step, queue, ema} under
``<dir>/checkpoints/<step>``; restore resumes model+optimizer+step. Rank
gating is unnecessary — under global-view jit there is one process per host
and Orbax coordinates multi-host writes itself.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from eventpretrain_tpu.train.state import TrainState


def _ckpt_dir(output_dir: str) -> str:
    path = os.path.join(os.path.abspath(output_dir), "checkpoints")
    os.makedirs(path, exist_ok=True)
    return path


def save_checkpoint(
    output_dir: str, state: TrainState, *, step: Optional[int] = None,
    name: Optional[str] = None,
) -> str:
    """Save the pytree portion of a TrainState; returns the checkpoint path."""
    step = int(state.step) if step is None else step
    tag = name or str(step)
    path = os.path.join(_ckpt_dir(output_dir), tag)
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    if state.queue is not None:
        # queues are pytrees (QueueState, or a tuple of SampleQueueStates for
        # ECDP); store leaves + let restore rebuild via the state template
        payload["queue"] = jax.tree.leaves(state.queue)
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def latest_step(output_dir: str) -> Optional[int]:
    path = _ckpt_dir(output_dir)
    steps = [int(d) for d in os.listdir(path) if d.isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(
    output_dir: str, state: TrainState, *, step: Optional[int] = None,
    name: Optional[str] = None,
) -> TrainState:
    """Restore into the structure of ``state`` (same model/optimizer)."""
    if name is None:
        step = latest_step(output_dir) if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {output_dir}")
        name = str(step)
    path = os.path.join(_ckpt_dir(output_dir), name)

    template = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    if state.queue is not None:
        template["queue"] = jax.tree.leaves(state.queue)
    if state.ema_params is not None:
        template["ema_params"] = state.ema_params
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, template)
    updates = dict(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    if state.queue is not None:
        treedef = jax.tree.structure(state.queue)
        updates["queue"] = jax.tree.unflatten(treedef, restored["queue"])
    if state.ema_params is not None:
        updates["ema_params"] = restored["ema_params"]
    return state.replace(**updates)
