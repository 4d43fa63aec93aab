"""Contrastive objectives for feature-transition / focus-aimed stages (2-3).

Pure-function equivalents of reference model/pretrain/pr_hub_model.py:
  * ``token_infonce_queue``  <- contrastive_loss_queue (143-168): per-token
    InfoNCE of q against its paired key vs a ring-buffer queue of negatives.
    The queue is *functional state*: the caller threads ``(queue, ptr)``
    through the train step (the reference mutates registered buffers,
    pr_hub_model.py:112-122).
  * ``global_token_infonce`` <- contrastive_loss (170-188): global InfoNCE
    where every other sample in the (all-gathered) batch is a negative.
    Written in the global view: under jit over a data-sharded mesh the
    partitioner inserts the all-gather automatically and the labels are just
    ``arange(N_global)`` — no rank offsets (reference pr_hub_model.py:181-184
    and concat_all_gather:248-259 become this single einsum).

Temperature default T=0.07 (reference pr_hub_model.py:17).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class QueueState(NamedTuple):
    buffer: jax.Array  # (C, L, K) normalized key queue
    ptr: jax.Array     # () int32


def init_queue(
    key: jax.Array, embed_dim: int, num_patches: int, queue_length: int
) -> QueueState:
    """Random-normalized queue init (reference pr_hub_model.py:85-87)."""
    q = jax.random.normal(key, (embed_dim, num_patches, queue_length))
    q = q / jnp.linalg.norm(q, axis=0, keepdims=True)
    return QueueState(buffer=q, ptr=jnp.zeros((), jnp.int32))


def _l2norm(x: jax.Array, axis: int = -1) -> jax.Array:
    return x / jnp.maximum(
        jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12
    )


def token_infonce_queue(
    emb_h: jax.Array,
    clip_emb: jax.Array,
    queue: QueueState,
    temperature: float = 0.07,
) -> tuple[jax.Array, QueueState]:
    """Per-token InfoNCE against the queue; returns (loss, updated queue).

    emb_h (q) and clip_emb (k): (B, L, C). Logits are [q.k_pos | q.queue]
    over 1+K classes with label 0 (reference pr_hub_model.py:144-163). The
    key batch is enqueued at ptr afterwards; queue_length must be divisible
    by the (global) batch size (reference asserts this, pr_hub_model.py:117).
    """
    q = _l2norm(emb_h.astype(jnp.float32))
    k = _l2norm(clip_emb.astype(jnp.float32))

    l_pos = jnp.einsum("blc,blc->bl", q, k)[..., None]            # (B, L, 1)
    l_neg = jnp.einsum(
        "blc,clk->blk", q, jax.lax.stop_gradient(queue.buffer)
    )                                                              # (B, L, K)
    logits = jnp.concatenate([l_pos, l_neg], axis=-1) / temperature
    labels = jnp.zeros(logits.shape[:2], jnp.int32)
    loss = optax.softmax_cross_entropy_with_integer_labels(
        logits, labels
    ).mean()

    batch = k.shape[0]
    # enqueue k.T == (C, L, B) at ptr (reference pr_hub_model.py:112-122)
    new_buf = jax.lax.dynamic_update_slice(
        queue.buffer,
        jnp.einsum("blc->clb", jax.lax.stop_gradient(k)),
        (0, 0, queue.ptr),
    )
    new_ptr = (queue.ptr + batch) % queue.buffer.shape[-1]
    return loss, QueueState(buffer=new_buf, ptr=new_ptr)


def init_local_queue(
    key: jax.Array, num_devices: int, embed_dim: int, num_patches: int,
    queue_length: int,
) -> QueueState:
    """Per-device queue bank for local-enqueue parity mode: buffer
    (D, C, L, K) sharded over the data axis, one independent ring buffer
    per device (each initialized differently, like per-rank init)."""
    keys = jax.random.split(key, num_devices)
    q = jax.vmap(
        lambda k: init_queue(k, embed_dim, num_patches, queue_length).buffer
    )(keys)
    return QueueState(
        buffer=q, ptr=jnp.zeros((num_devices,), jnp.int32)
    )


def token_infonce_queue_local(
    emb_h: jax.Array,
    clip_emb: jax.Array,
    queue: QueueState,
    mesh,
    temperature: float = 0.07,
    axis: str = "data",
) -> tuple[jax.Array, QueueState]:
    """Queue InfoNCE with REFERENCE DDP semantics: each device keeps its own
    full-length queue and enqueues only its local keys.

    The reference enqueues only the local batch in queue mode
    (pr_hub_model.py:166: ``self._dequeue_and_enqueue(k)`` without
    all-gather), so under N-way DP each rank's queue spans N× more steps of
    history than a single shared queue fed by the global batch. This
    shard_map variant reproduces that: q/k arrive sharded on ``axis``;
    ``queue.buffer`` is a (D, C, L, K) bank sharded on its leading device
    axis (init_local_queue); the per-shard loss is pmean-reduced, exactly
    the DDP-averaged gradient.

    With identical buffer content on every device this equals
    ``token_infonce_queue`` on the global batch (tested); the two modes
    diverge only in which keys the negatives age over.
    """
    from jax.sharding import PartitionSpec as P

    def shard_fn(q_s, k_s, buf_s, ptr_s):
        loss, new_q = token_infonce_queue(
            q_s, k_s, QueueState(buffer=buf_s[0], ptr=ptr_s[0]),
            temperature,
        )
        loss = jax.lax.pmean(loss, axis)
        return loss, new_q.buffer[None], new_q.ptr[None]

    loss, new_buf, new_ptr = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(axis), P(axis)),
    )(emb_h, clip_emb, queue.buffer, queue.ptr)
    return loss, QueueState(buffer=new_buf, ptr=new_ptr)


def global_token_infonce(
    emb_h: jax.Array,
    clip_emb: jax.Array,
    temperature: float = 0.07,
    axis_name: str | None = None,
) -> jax.Array:
    """Global InfoNCE: positives on the diagonal, all other samples negative.

    emb_h (q), clip_emb (k): (N, L, C) — the *global* batch under jit, or the
    local shard when ``axis_name`` is given (shard_map style: keys are
    all-gathered and labels offset by the axis index, exactly the reference's
    DDP semantics, pr_hub_model.py:170-188).
    """
    q = _l2norm(emb_h.astype(jnp.float32))
    k = _l2norm(clip_emb.astype(jnp.float32))
    n = q.shape[0]

    if axis_name is None:
        labels = jnp.arange(n, dtype=jnp.int32)
    else:
        k = jax.lax.all_gather(
            jax.lax.stop_gradient(k), axis_name, axis=0, tiled=True
        )
        labels = jnp.arange(n, dtype=jnp.int32) + n * jax.lax.axis_index(
            axis_name
        )

    logits = jnp.einsum("nlc,mlc->nlm", q, k) / temperature
    labels = jnp.broadcast_to(labels[:, None], logits.shape[:2])
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels
    ).mean()
