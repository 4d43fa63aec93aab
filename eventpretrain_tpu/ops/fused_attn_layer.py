"""Fully fused attention *layer* Pallas kernel (qkv proj + MHA + out proj).

Motivation (measured on TPU v5e, MAE-decoder shapes B=128 L=196 C=512 H=16
D=32; see BASELINE.md "MFU analysis"): the decoder's attention lowers to a
2048-instance batched matmul of tiny (196x32) operands plus an HBM
round-trip of the (B, H, L, L) f32 softmax, and the earlier standalone MHA
kernel (ops/pallas_attention.py) — gridded (batch, head) with 12.5 KB
blocks — beat XLA in isolation but LOST in context because the pallas_call
boundary stopped XLA from fusing the surrounding qkv/proj matmuls and
layout changes.

This kernel erases that boundary by fusing the whole layer:

    y = concat_h[ softmax(q_h k_h^T * scale) v_h ] @ Wo + bo,
    (q|k|v)_h = slices of (x @ Wqkv + bqkv)

with a 1-D grid over batch: one (L, C) token block per step, both weight
matrices resident in VMEM across all steps (constant block index), every
intermediate — qkv, per-head f32 scores/softmax, concatenated head outputs
— living entirely in VMEM. Blocks are ~200 KB (vs 12.5 KB before), so DMA
is deep and the per-step compute (~0.6 GFLOP) keeps the MXU busy.

The backward is a second fused kernel that recomputes qkv/softmax in VMEM
(cheaper than saving (B, H, L, L) to HBM) and accumulates dWqkv/dWo/db in
f32 VMEM across the batch grid (constant-index outputs zeroed at step 0),
emitting per-block dx — the canonical Pallas grid-reduction pattern.

The reference (PyTorch vit_block.py:118-143) materializes attention in HBM
every block; this kernel is the TPU-native answer for small-head-dim
attention, not a translation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

MAX_FUSED_SEQ_LEN = 1024


def supports_fused_attn_layer(seq_len: int, dim: int, num_heads: int) -> bool:
    if dim % num_heads != 0:
        return False
    head_dim = dim // num_heads
    return (
        seq_len <= MAX_FUSED_SEQ_LEN
        and head_dim % 8 == 0
        and head_dim <= 256
        and dim % 128 == 0
    )


def _attention_heads(qkv, c: int, num_heads: int, scale: float, dtype):
    """(L, 3C) packed qkv -> list of per-head (o_h, p_h, q_h, k_h, v_h)."""
    d = c // num_heads
    outs = []
    for h in range(num_heads):
        q = qkv[:, h * d:(h + 1) * d]
        k = qkv[:, c + h * d:c + (h + 1) * d]
        v = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(
            p.astype(dtype), v, preferred_element_type=jnp.float32
        ).astype(dtype)
        outs.append((o, p, q, k, v))
    return outs


def _fwd_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, y_ref,
                *, num_heads: int, scale: float):
    x = x_ref[0]  # (L, C)
    c = x.shape[-1]
    qkv = jnp.dot(x, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)
    heads = _attention_heads(qkv, c, num_heads, scale, x.dtype)
    o = jnp.concatenate([t[0] for t in heads], axis=-1)  # (L, C)
    y = jnp.dot(o, wo_ref[...], preferred_element_type=jnp.float32)
    y = y + bo_ref[...].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, dy_ref,
                dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
                *, num_heads: int, scale: float):
    @pl.when(pl.program_id(0) == 0)
    def _zero():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)

    x = x_ref[0]
    dy = dy_ref[0]
    c = x.shape[-1]
    d = c // num_heads

    # recompute forward intermediates in VMEM
    qkv = jnp.dot(x, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)
    heads = _attention_heads(qkv, c, num_heads, scale, x.dtype)
    o = jnp.concatenate([t[0] for t in heads], axis=-1)

    # out-proj backward
    dy_f = dy.astype(jnp.float32)
    dwo_ref[...] += jax.lax.dot_general(
        o, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbo_ref[...] += jnp.sum(dy_f, axis=0, keepdims=True)
    do = jax.lax.dot_general(
        dy, wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # (L, C)

    # per-head attention backward
    dqs, dks, dvs = [], [], []
    for h, (_, p, q, k, v) in enumerate(heads):
        do_h = do[:, h * d:(h + 1) * d]
        dv = jax.lax.dot_general(
            p.astype(do_h.dtype), do_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (L, D)
        dp = jax.lax.dot_general(
            do_h, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (L, L)
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale)
        ds = ds.astype(x.dtype)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dqs.append(dq.astype(x.dtype))
        dks.append(dk.astype(x.dtype))
        dvs.append(dv.astype(x.dtype))
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)  # (L, 3C)

    # qkv-proj backward
    dwqkv_ref[...] += jax.lax.dot_general(
        x, dqkv, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)
    dx = jax.lax.dot_general(
        dqkv, wqkv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _fwd_call(x, wqkv, bqkv, wo, bo, num_heads, scale, interpret):
    b, l, c = x.shape
    xblk = pl.BlockSpec((1, l, c), lambda i: (i, 0, 0))
    wqkv_blk = pl.BlockSpec(wqkv.shape, lambda i: (0, 0))
    b1_blk = pl.BlockSpec((1, 3 * c), lambda i: (0, 0))
    wo_blk = pl.BlockSpec(wo.shape, lambda i: (0, 0))
    b2_blk = pl.BlockSpec((1, c), lambda i: (0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads, scale=scale),
        grid=(b,),
        in_specs=[xblk, wqkv_blk, b1_blk, wo_blk, b2_blk],
        out_specs=xblk,
        out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
        interpret=interpret,
    )(x, wqkv, bqkv.reshape(1, -1), wo, bo.reshape(1, -1))


def _bwd_call(x, wqkv, bqkv, wo, dy, num_heads, scale, interpret):
    b, l, c = x.shape
    xblk = pl.BlockSpec((1, l, c), lambda i: (i, 0, 0))
    wqkv_blk = pl.BlockSpec(wqkv.shape, lambda i: (0, 0))
    b1_blk = pl.BlockSpec((1, 3 * c), lambda i: (0, 0))
    wo_blk = pl.BlockSpec(wo.shape, lambda i: (0, 0))
    b2_blk = pl.BlockSpec((1, c), lambda i: (0, 0))
    dx, dwqkv, dbqkv, dwo, dbo = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads, scale=scale),
        grid=(b,),
        in_specs=[xblk, wqkv_blk, b1_blk, wo_blk, xblk],
        out_specs=[xblk, wqkv_blk, b1_blk, wo_blk, b2_blk],
        out_shape=[
            jax.ShapeDtypeStruct((b, l, c), x.dtype),
            jax.ShapeDtypeStruct(wqkv.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct(wo.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, wqkv, bqkv.reshape(1, -1), wo, dy)
    return dx, dwqkv, dbqkv.reshape(-1), dwo, dbo.reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_attn_layer(x, wqkv, bqkv, wo, bo, num_heads, scale, interpret):
    return _fwd_call(x, wqkv, bqkv, wo, bo, num_heads, scale, interpret)


def _fused_fwd(x, wqkv, bqkv, wo, bo, num_heads, scale, interpret):
    y = _fwd_call(x, wqkv, bqkv, wo, bo, num_heads, scale, interpret)
    return y, (x, wqkv, bqkv, wo)


def _fused_bwd(num_heads, scale, interpret, res, dy):
    x, wqkv, bqkv, wo = res
    dx, dwqkv, dbqkv, dwo, dbo = _bwd_call(
        x, wqkv, bqkv, wo, dy, num_heads, scale, interpret
    )
    return (
        dx,
        dwqkv.astype(wqkv.dtype),
        dbqkv.astype(bqkv.dtype),
        dwo.astype(wo.dtype),
        dbo.astype(wo.dtype),
    )


_fused_attn_layer.defvjp(_fused_fwd, _fused_bwd)


def fused_attn_layer(
    x: jax.Array,
    wqkv: jax.Array,
    bqkv: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    *,
    num_heads: int,
    scale: float,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused attention layer over (B, L, C) tokens.

    Equivalent (to bf16 tolerance) to::

        qkv = (x @ wqkv + bqkv).reshape(B, L, 3, H, D)
        o = dot_product_attention(q, k, v, scale=scale).reshape(B, L, C)
        y = o @ wo + bo

    with the qkv packing of a fused Dense(3C) — feature index =
    which*(H*D) + h*D + d — matching models/layers.py::Attention.
    ``interpret=None`` auto-selects the Mosaic kernel on TPU and the
    interpreter elsewhere (CPU tests).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fused_attn_layer(
        x, wqkv, bqkv, wo, bo, int(num_heads), float(scale), bool(interpret)
    )
