"""Optical-flow objective: masked L1 on valid pixels.

Parity with reference trainer/finetune_flow/flow_loss.py:5-17: valid pixels
require target_valid >= 0.5 and |target| < max_flow; the L1 mean runs over
valid elements of both flow components.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def flow_l1_loss(
    predict: jax.Array,
    target: jax.Array,
    target_valid: jax.Array,
    max_flow: float = 400.0,
) -> jax.Array:
    """predict/target: (B, H, W, 2); target_valid: (B, H, W)."""
    predict = predict.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mag = jnp.sqrt((target ** 2).sum(axis=-1))
    valid = (target_valid >= 0.5) & (mag < max_flow)
    w = valid.astype(jnp.float32)[..., None]
    abs_err = jnp.abs(predict - target) * w
    # mean over valid elements of both components (w broadcasts over 2)
    return abs_err.sum() / jnp.maximum(w.sum() * 2.0, 1.0)
