"""Orbax checkpointing of train-state pytrees.

Equivalent of reference utils/misc.py:318-403 (save_model / save_best_model /
load_model): writes {params, batch_stats, opt_state, step, queue, ema} under
``<dir>/checkpoints/<step>``; restore resumes model+optimizer+step. Rank
gating is unnecessary — under global-view jit there is one process per host
and Orbax coordinates multi-host writes itself.
"""

from __future__ import annotations

import atexit
import os
import threading
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from eventpretrain_tpu.train.state import TrainState

_CKPTR: Optional[ocp.StandardCheckpointer] = None


def _checkpointer() -> ocp.StandardCheckpointer:
    """Process-wide async checkpointer.

    ``StandardCheckpointer`` is an AsyncCheckpointer: ``save`` blocks only
    for the device->host copy and writes to disk on a background thread,
    so epoch-boundary saves overlap the next epoch's steps (the reference
    torch.save blocks the loop, misc.py:318-364). A shared instance is
    kept (instead of the one-save ``with`` block) so the background write
    survives the call; atexit drains it so process exit can't truncate the
    final checkpoint (orbax's atomic rename already prevents a *corrupt*
    one).
    """
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
        # CPython finalization runs threading._shutdown (which closes the
        # default thread-pool executors) BEFORE atexit callbacks, and
        # orbax's background commit schedules asyncio.to_thread work — an
        # atexit-registered drain is too late and the commit dies with
        # "cannot schedule new futures after shutdown". Threading's own
        # atexit hooks run LIFO at the START of threading._shutdown, ahead
        # of concurrent.futures' shutdown hook, so register there (private
        # but stable since 3.9); fall back to plain atexit.
        drain = _drain_quietly
        try:
            threading._register_atexit(drain)
        except Exception:
            atexit.register(drain)
    return _CKPTR


def _drain_quietly() -> None:
    try:
        if _CKPTR is not None:
            _CKPTR.wait_until_finished()
    except Exception:
        pass  # exit path: never turn a drained-late save into a crash


def wait_for_saves() -> None:
    """Block until all in-flight async checkpoint writes are durable."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def _ckpt_dir(output_dir: str) -> str:
    path = os.path.join(os.path.abspath(output_dir), "checkpoints")
    os.makedirs(path, exist_ok=True)
    return path


def save_checkpoint(
    output_dir: str, state: TrainState, *, step: Optional[int] = None,
    name: Optional[str] = None, wait: bool = False,
) -> str:
    """Save the pytree portion of a TrainState; returns the checkpoint path.

    Async by default: returns once the device->host copy is done and the
    disk write continues in the background (``wait=True`` or
    :func:`wait_for_saves` blocks until durable; restore always drains
    pending writes first).
    """
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
    ckptr = _checkpointer()
    ckptr.save(path, payload, force=True)
    if wait:
        ckptr.wait_until_finished()
    return path


def latest_step(output_dir: str) -> Optional[int]:
    # orbax materializes the checkpoint dir name only on finalize, so an
    # in-flight async save is invisible to the scan — drain first
    wait_for_saves()
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
    ckptr = _checkpointer()
    # a just-written checkpoint may still be draining to disk
    ckptr.wait_until_finished()
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
