"""ECDP baseline objectives: EMA momentum, vector projection, sinkhorn-KL.

Pure-function equivalents of reference model/pretrain/pr_ecdp_hub_model.py:
  * ``ema_update``          <- _momentum_update (123-126), as a tree lerp
  * ``cosine_ema_momentum`` <- pr_ecdp_trainer.py:10-13
  * ``vector_project``      <- vector_project (128-133), including the
                               reference's elementwise form
  * ``sample_infonce_queue``/``global_sample_infonce``
                            <- contrastive_loss_queue / contrastive_loss
                               (148-192) over per-sample (B, C) embeddings;
                               the global loss is scaled by 2*T
  * ``sinkhorn`` + ``kl_loss`` <- sinkhorn (194-219) and kl_loss (221-234):
                               KL(log_softmax(q.q^T / T) || sinkhorn(k.k^T / T))
Distributed all-reduces/all-gathers dissolve into the global view under jit.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def ema_update(params, ema_params, momentum):
    """param_k = m * param_k + (1 - m) * param_q."""
    return jax.tree.map(
        lambda k, q: k * momentum + q * (1.0 - momentum), ema_params, params
    )


def cosine_ema_momentum(base_m: float, epoch_frac, total_epochs: float):
    """Cosine-increasing momentum (reference pr_ecdp_trainer.py:10-13).

    jnp-based so it works on traced epoch fractions inside jitted steps.
    """
    return 1.0 - (1.0 - base_m) * (
        jnp.cos(jnp.pi * epoch_frac / total_epochs) + 1.0
    ) / 2.0


def vector_project(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """Elementwise 'projection' of v1 onto the clip direction v2
    (reference pr_ecdp_hub_model.py:128-133: (v1*v2) * (v2 / sum(v2**2)),
    where the sum runs over the batch axis elementwise)."""
    denom = (v2 ** 2).sum(axis=0)
    return (v1 * v2) * (v2 / jnp.maximum(denom, 1e-12))


class SampleQueueState(NamedTuple):
    buffer: jax.Array  # (C, K)
    ptr: jax.Array


def init_sample_queue(key, proj_dim: int, queue_length: int):
    q = jax.random.normal(key, (proj_dim, queue_length))
    q = q / jnp.linalg.norm(q, axis=0, keepdims=True)
    return SampleQueueState(buffer=q, ptr=jnp.zeros((), jnp.int32))


def _l2(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def sample_infonce_queue(
    q: jax.Array, k: jax.Array, queue: SampleQueueState,
    temperature: float, l2_norm: bool = True,
) -> tuple[jax.Array, SampleQueueState]:
    """Per-sample InfoNCE vs queue (reference pr_ecdp_hub_model.py:148-173)."""
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)
    if l2_norm:
        q, k = _l2(q), _l2(k)
    l_pos = jnp.einsum("bc,bc->b", q, k)[:, None]
    l_neg = jnp.einsum("bc,ck->bk", q, jax.lax.stop_gradient(queue.buffer))
    logits = jnp.concatenate([l_pos, l_neg], axis=-1) / temperature
    labels = jnp.zeros((logits.shape[0],), jnp.int32)
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

    new_buf = jax.lax.dynamic_update_slice(
        queue.buffer, jax.lax.stop_gradient(k).T, (0, queue.ptr)
    )
    new_ptr = (queue.ptr + k.shape[0]) % queue.buffer.shape[-1]
    return loss, SampleQueueState(buffer=new_buf, ptr=new_ptr)


def global_sample_infonce(
    q: jax.Array, k: jax.Array, temperature: float, l2_norm: bool = True,
) -> jax.Array:
    """Global-batch InfoNCE * 2T (reference pr_ecdp_hub_model.py:175-192)."""
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)
    if l2_norm:
        q, k = _l2(q), _l2(k)
    logits = jnp.einsum("nc,mc->nm", q, k) / temperature
    labels = jnp.arange(q.shape[0], dtype=jnp.int32)
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels
    ).mean() * (2 * temperature)


def sinkhorn(out: jax.Array, iters: int = 3) -> jax.Array:
    """Distributed sinkhorn normalization (reference
    pr_ecdp_hub_model.py:194-219); global view needs no all-reduce."""
    q = jnp.exp(out.astype(jnp.float32)).T  # (K, B)
    k, b = q.shape
    q = q / jax.lax.stop_gradient(q.sum())
    for _ in range(iters):
        q = q / jax.lax.stop_gradient(q.sum(axis=1, keepdims=True))
        q = q / k
        q = q / q.sum(axis=0, keepdims=True)
        q = q / b
    return (q * b).T


def ecdp_kl_loss(q: jax.Array, k: jax.Array, temperature: float) -> jax.Array:
    """KL(log_softmax(sim_q) || sinkhorn(sim_k)) with batchmean reduction
    (reference pr_ecdp_hub_model.py:221-234)."""
    q = _l2(q.astype(jnp.float32))
    k = _l2(k.astype(jnp.float32))
    sim_q = jnp.einsum("nc,mc->nm", q, q) / temperature
    sim_k = jnp.einsum("nc,mc->nm", k, k) / temperature
    log_p = jax.nn.log_softmax(sim_q, axis=-1)
    target = sinkhorn(sim_k)
    # torch KLDivLoss(batchmean, log_target=False): sum(t * (log t - log p)) / B
    safe_log_t = jnp.where(target > 0, jnp.log(jnp.maximum(target, 1e-30)), 0.0)
    kl = target * (safe_log_t - log_p)
    return kl.sum() / q.shape[0]
