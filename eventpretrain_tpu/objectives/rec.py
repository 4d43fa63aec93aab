"""Difference-guided masked-modeling reconstruction loss (stage 1).

Pure-function equivalent of reference model/pretrain/pr_hub_model.py:124-141
(PrHubModel.reconstruct_loss): patch-normalized MSE on masked patches of the
temporal intensity-difference frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eventpretrain_tpu.ops.reshape import frame2emb


def reconstruct_loss(
    pred: jax.Array,
    sub_frame: jax.Array,
    mask: jax.Array,
    *,
    patch_size: int,
    norm_pix_loss: bool = True,
    mask_ratio: float = 0.75,
) -> jax.Array:
    """pred: (B, L, p*p*C); sub_frame: (B, H, W, C); mask: (B, L), 1=masked.

    With ``norm_pix_loss`` the target patches are standardized with the
    *unbiased* variance (torch ``Tensor.var`` default, reference
    pr_hub_model.py:129-131). ``mask_ratio == 0`` averages over all patches
    (reference pr_hub_model.py:136-139).
    """
    target = frame2emb(patch_size, sub_frame).astype(jnp.float32)
    pred = pred.astype(jnp.float32)

    if norm_pix_loss:
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True, ddof=1)
        target = (target - mean) / (var + 1.0e-6) ** 0.5

    loss = ((pred - target) ** 2).mean(axis=-1)  # (B, L)
    if mask_ratio == 0:
        return loss.mean()
    return (mask * loss).sum() / mask.sum()
