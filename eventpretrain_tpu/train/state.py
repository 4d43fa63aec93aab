"""Functional train state: params + batch stats + optimizer + aux state.

Replaces the reference's mutable module-buffer state (MoCo queue / queue_ptr,
pr_hub_model.py:85-87; EMA key encoder, pr_ecdp_hub_model.py:87-89) with an
explicit pytree threaded through jitted steps.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax
from flax import struct

from eventpretrain_tpu.objectives.contrastive import QueueState


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)
    queue: Optional[QueueState] = None
    ema_params: Optional[Any] = None

    def apply_gradients(self, grads, **updates):
        new_updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, new_updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            **updates,
        )

    @classmethod
    def create(cls, *, apply_fn, params, tx, batch_stats=None, queue=None,
               ema_params=None):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats if batch_stats is not None else {},
            opt_state=tx.init(params),
            queue=queue,
            ema_params=ema_params,
            tx=tx,
            apply_fn=apply_fn,
        )


def merge_params(*trees):
    """Recursively merge param trees (later trees win on leaves).

    Needed when a hub is initialized via several methods (forward_rec /
    forward_con) that each create overlapping-but-different subtrees — a
    plain dict union would drop e.g. the rec-only stage decode convs inside
    the shared 'backbone' subtree.
    """
    out = {}
    for tree in trees:
        for k, v in tree.items():
            if (
                k in out
                and isinstance(out[k], dict)
                and isinstance(v, dict)
            ):
                out[k] = merge_params(out[k], v)
            else:
                out[k] = v
    return out
