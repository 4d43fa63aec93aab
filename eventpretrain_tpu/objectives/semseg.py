"""Semantic-segmentation objective: CE (ignore-index) + multi-class Dice.

Parity with reference trainer/finetune_semseg/semseg_loss.py:8-112:
  * CE with ignore_index excluded from the mean
  * Dice over softmax probabilities per class, binary dice with smooth=1 and
    squared denominator (p=2), ignore-index pixels zeroed on both sides,
    averaged over ALL classes (including the skipped ignore class, matching
    the reference's ``total_loss / target.shape[1]``).
Total = w_decode*(ce+dice) + w_aux*(ce+dice) on resized predictions
(reference ft_semseg_trainer.py:77-114).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def semseg_ce_loss(
    logits: jax.Array, labels: jax.Array, ignore_index: Optional[int] = None
) -> jax.Array:
    """logits: (B, H, W, C); labels: (B, H, W) int."""
    logits = logits.astype(jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits, jnp.maximum(labels, 0)
    )
    if ignore_index is None:
        return ce.mean()
    keep = (labels != ignore_index).astype(jnp.float32)
    return (ce * keep).sum() / jnp.maximum(keep.sum(), 1.0)


def semseg_dice_loss(
    logits: jax.Array,
    labels: jax.Array,
    num_classes: int,
    ignore_index: Optional[int] = None,
    smooth: float = 1.0,
) -> jax.Array:
    logits = logits.astype(jnp.float32)
    if ignore_index is None:
        keep = jnp.ones_like(labels, jnp.float32)
    else:
        keep = (labels != ignore_index).astype(jnp.float32)
    labels_masked = jnp.where(keep > 0, labels, 0)
    one_hot = jax.nn.one_hot(labels_masked, num_classes) * keep[..., None]
    probs = jax.nn.softmax(logits, axis=-1) * keep[..., None]

    total = 0.0
    for c in range(num_classes):
        if ignore_index is not None and c == ignore_index:
            continue
        p = probs[..., c].reshape(probs.shape[0], -1)
        t = one_hot[..., c].reshape(one_hot.shape[0], -1)
        num = (p * t).sum() * 2 + smooth
        den = (p ** 2 + t ** 2).sum() + smooth
        total = total + (1 - num / den)
    return total / num_classes


def semseg_loss(
    logits: jax.Array,
    labels: jax.Array,
    num_classes: int,
    ignore_index: Optional[int] = None,
) -> tuple[jax.Array, jax.Array]:
    """Returns (ce, dice) like reference SemsegLoss.forward."""
    return (
        semseg_ce_loss(logits, labels, ignore_index),
        semseg_dice_loss(logits, labels, num_classes, ignore_index),
    )
