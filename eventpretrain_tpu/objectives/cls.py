"""Classification objective (CE / label-smoothing CE).

Equivalent of reference trainer/finetune_cls/ft_cls_trainer.py:61-64
(torch.nn.CrossEntropyLoss / timm LabelSmoothingCrossEntropy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cls_loss(
    logits: jax.Array, labels: jax.Array, smoothing: float = 0.0
) -> jax.Array:
    logits = logits.astype(jnp.float32)
    if smoothing > 0.0:
        one_hot = jax.nn.one_hot(labels, logits.shape[-1])
        soft = optax.smooth_labels(one_hot, smoothing)
        return optax.softmax_cross_entropy(logits, soft).mean()
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels
    ).mean()
