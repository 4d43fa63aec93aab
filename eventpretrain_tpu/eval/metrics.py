"""Task metrics as pure jittable functions.

Equivalents of the reference's metric code:
  * topk_accuracy      <- timm.utils.accuracy usage (ft_cls_trainer.py:156-164)
  * confusion_matrix / miou / macc
                       <- trainer/finetune_semseg/semseg_metric.py:4-35
                          (bincount trick; the reference's swapped arg names
                          are NOT replicated — args here are (predict, target))
  * flow_error         <- trainer/finetune_flow/flow_metric.py:4-38
                          (AEE + %outliers with epe>3 and epe/mag>0.05)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def topk_accuracy(
    logits: jax.Array, labels: jax.Array, topk: tuple[int, ...] = (1, 5),
    weights: jax.Array | None = None,
) -> dict[str, jax.Array]:
    """Per-batch top-k accuracy in percent; ``weights`` (B,) masks samples
    (wrapped tail-batch pads carry weight 0)."""
    out = {}
    max_k = max(topk)
    _, pred = jax.lax.top_k(logits, max_k)  # (B, max_k)
    correct = pred == labels[:, None]
    for k in topk:
        hit = correct[:, :k].any(axis=1).astype(jnp.float32)
        if weights is None:
            out[f"acc{k}"] = hit.mean() * 100.0
        else:
            out[f"acc{k}"] = (
                (hit * weights).sum() / jnp.maximum(weights.sum(), 1.0) * 100.0
            )
    return out


def confusion_matrix(
    predict: jax.Array,
    target: jax.Array,
    num_classes: int,
    ignore_label: Optional[int] = None,
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Confusion counts (num_classes, num_classes), rows=predict, cols=target.

    Matches semseg_metric.py:4-18: pixels where *predict* equals the ignore
    label are dropped, and the flat bin index is target + C * predict.
    ``valid`` is an optional boolean mask broadcastable to ``predict``
    (e.g. per-sample tail-pad mask) ANDed into the keep set.
    """
    if valid is not None:
        valid = jnp.broadcast_to(valid, predict.shape).reshape(-1)
    predict = predict.reshape(-1).astype(jnp.int32)
    target = target.reshape(-1).astype(jnp.int32)
    if ignore_label is not None:
        keep = predict != ignore_label
    else:
        keep = jnp.ones_like(predict, bool)
    if valid is not None:
        keep = keep & valid
    # One-hot matmul instead of a scatter-add: the bincount formulation
    # scatters 4.5M data-dependent indices per DSEC batch, which serializes
    # on TPU; (N, C)^T @ (N, C) rides the MXU. Counts stay exact: f32
    # integers are exact to 2^24, far above any batch's pixel count.
    classes = jnp.arange(num_classes, dtype=jnp.int32)
    # bf16 one-hots: 0/1 are exact in bf16 and the dot accumulates in f32,
    # so this halves the (N, C) footprint (~200 MB each at DSEC eval
    # shapes) with bit-identical counts
    p_oh = (
        (predict[:, None] == classes) & keep[:, None]
    ).astype(jnp.bfloat16)
    t_oh = (target[:, None] == classes).astype(jnp.bfloat16)
    conf = jax.lax.dot_general(
        p_oh, t_oh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return conf.astype(jnp.int32)


def miou_from_confusion(confusion: jax.Array) -> jax.Array:
    """Mean IoU in percent (semseg_metric.py:20-26)."""
    confusion = confusion.astype(jnp.float64)
    diag = jnp.diagonal(confusion)
    denom = confusion.sum(axis=1) + confusion.sum(axis=0) - diag
    iou = 100.0 * diag / jnp.maximum(denom, 1e-12)
    return iou.mean()


def macc_from_confusion(confusion: jax.Array) -> jax.Array:
    """Mean class accuracy in percent (semseg_metric.py:28-35)."""
    confusion = confusion.astype(jnp.float64)
    diag = jnp.diagonal(confusion)
    acc = 100.0 * diag / jnp.maximum(confusion.sum(axis=1), 1e-12)
    return acc.mean()


def flow_error(
    predict: jax.Array,
    target: jax.Array,
    valid: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """(AEE, %outliers) over valid pixels.

    predict/target: (..., H, W, 2) channels-last; valid: (..., H, W) or None.
    Outlier: epe > 3 and epe/|target| > 0.05 (flow_metric.py:23-29).
    """
    epe = jnp.sqrt(((predict - target) ** 2).sum(axis=-1))
    mag = jnp.sqrt((target ** 2).sum(axis=-1))
    if valid is None:
        w = jnp.ones_like(epe)
    else:
        w = (valid == 1).astype(epe.dtype)
    total = jnp.maximum(w.sum(), 1.0)
    aee = (epe * w).sum() / total
    outlier = (
        ((epe > 3.0) & ((epe / jnp.maximum(mag, 1e-12)) > 0.05)).astype(
            epe.dtype
        )
        * w
    ).sum() / total * 100.0
    return aee, outlier
