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

from eventpretrain_tpu.ops.pallas_common import (
    MAX_FUSED_SEQ_LEN,
    VMEM_LIMIT as _BWD_VMEM_LIMIT,
    ln_forward as _ln_forward_shared,
)


def supports_fused_attn_layer(seq_len: int, dim: int, num_heads: int,
                              dtype=None) -> bool:
    # VMEM budgets (resident qkv/proj weights + f32 dW accumulators in the
    # backward) are calibrated for 2-byte weights; an f32 model doubles them
    # and risks a Mosaic compile failure, so f32 stays on XLA.
    if dtype is not None and jnp.dtype(dtype).itemsize > 2:
        return False
    if dim % num_heads != 0:
        return False
    head_dim = dim // num_heads
    return (
        seq_len <= MAX_FUSED_SEQ_LEN
        and head_dim % 8 == 0
        and head_dim <= 256
        and dim % 128 == 0
    )


def _head_slices(qkv, c: int, d: int, h: int):
    q = qkv[:, h * d:(h + 1) * d]
    k = qkv[:, c + h * d:c + (h + 1) * d]
    v = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
    return q, k, v


def _head_softmax(q, k, scale: float):
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _attention_heads(qkv, c: int, num_heads: int, scale: float, dtype):
    """(L, 3C) packed qkv -> list of per-head outputs o_h (L, D).

    Head-streamed: each head's f32 (L, L) softmax dies before the next
    head's is built — keeping all H of them live was what pushed the
    backward past the 16 MB scoped-VMEM limit at decoder shapes.
    """
    d = c // num_heads
    outs = []
    for h in range(num_heads):
        q, k, v = _head_slices(qkv, c, d, h)
        p = _head_softmax(q, k, scale)
        outs.append(
            jnp.dot(
                p.astype(dtype), v, preferred_element_type=jnp.float32
            ).astype(dtype)
        )
    return outs


def _layer_fwd(x, wqkv_ref, bqkv_ref, wo_ref, bo_ref, num_heads, scale):
    """(L, C) tokens -> (L, C) f32 layer output (qkv proj + MHA + out proj)."""
    c = x.shape[-1]
    qkv = jnp.dot(x, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)
    o = jnp.concatenate(
        _attention_heads(qkv, c, num_heads, scale, x.dtype), axis=-1
    )  # (L, C)
    y = jnp.dot(o, wo_ref[...], preferred_element_type=jnp.float32)
    return y + bo_ref[...].astype(jnp.float32)


def _layer_bwd(x, dy, wqkv_ref, bqkv_ref, wo_ref,
               dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, num_heads, scale):
    """Backward of ``_layer_fwd``: recomputes in VMEM, accumulates dW into
    the constant-index refs, returns f32 dx for the token block."""
    c = x.shape[-1]
    d = c // num_heads

    qkv = jnp.dot(x, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)
    o = jnp.concatenate(
        _attention_heads(qkv, c, num_heads, scale, x.dtype), axis=-1
    )

    dy_f = dy.astype(jnp.float32)
    dwo_ref[...] += jax.lax.dot_general(
        o, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbo_ref[...] += jnp.sum(dy_f, axis=0, keepdims=True)
    do = jax.lax.dot_general(
        dy, wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # (L, C)

    # Head-streamed attention backward: recompute each head's softmax (an
    # extra ~1.6% of layer FLOPs) so only one f32 (L, L) matrix is ever
    # live, instead of carrying all H of them from the forward recompute.
    dqs, dks, dvs = [], [], []
    for h in range(num_heads):
        q, k, v = _head_slices(qkv, c, d, h)
        p = _head_softmax(q, k, scale)
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

    dwqkv_ref[...] += jax.lax.dot_general(
        x, dqkv, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)
    return jax.lax.dot_general(
        dqkv, wqkv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, y_ref,
                *, num_heads: int, scale: float):
    x = x_ref[0]  # (L, C)
    y = _layer_fwd(x, wqkv_ref, bqkv_ref, wo_ref, bo_ref, num_heads, scale)
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
    dx = _layer_bwd(
        x, dy, wqkv_ref, bqkv_ref, wo_ref,
        dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, num_heads, scale,
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
        compiler_params=None if interpret else _BWD_VMEM_LIMIT,
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
        compiler_params=None if interpret else _BWD_VMEM_LIMIT,
    )(x, wqkv, bqkv.reshape(1, -1), wo, dy)
    return dx, dwqkv, dbqkv.reshape(-1), dwo, dbo.reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_attn_layer(x, wqkv, bqkv, wo, bo, num_heads, scale, interpret):
    return _fwd_call(x, wqkv, bqkv, wo, bo, num_heads, scale, interpret)


def _fused_fwd(x, wqkv, bqkv, wo, bo, num_heads, scale, interpret):
    y = _fwd_call(x, wqkv, bqkv, wo, bo, num_heads, scale, interpret)
    return y, (x, wqkv, bqkv, wo, bo)


def _fused_bwd(num_heads, scale, interpret, res, dy):
    x, wqkv, bqkv, wo, bo = res
    dx, dwqkv, dbqkv, dwo, dbo = _bwd_call(
        x, wqkv, bqkv, wo, dy, num_heads, scale, interpret
    )
    return (
        dx,
        dwqkv.astype(wqkv.dtype),
        dbqkv.astype(bqkv.dtype),
        dwo.astype(wo.dtype),
        dbo.astype(bo.dtype),
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


# ---------------------------------------------------------------------------
# LN + attention layer + residual: y = x + AttnLayer(LayerNorm(x))
#
# Folding the pre-norm and the residual add into the kernel removes the last
# HBM round-trips of the (B, L, C) token stream around the attention layer:
# LN's read+write and the separate residual add (XLA fuses LN into *some*
# neighbor, but the pallas_call boundary of the fused layer had cut that
# off, leaving a standalone LN+add pass per block). LN stats and the
# residual sum are computed in f32 inside VMEM; dgamma/dbeta accumulate in
# f32 across the batch grid like the weight grads.
# ---------------------------------------------------------------------------


_ln_forward = _ln_forward_shared


def _ln_fwd_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                   y_ref, *, num_heads: int, scale: float, eps: float):
    x = x_ref[0]  # (L, C)
    yln, _, _ = _ln_forward(x, g_ref, b_ref, eps)
    y = _layer_fwd(yln, wqkv_ref, bqkv_ref, wo_ref, bo_ref, num_heads, scale)
    y_ref[0] = (x.astype(jnp.float32) + y).astype(y_ref.dtype)


def _ln_bwd_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wo_ref, dy_ref,
                   dx_ref, dg_ref, db_ref, dwqkv_ref, dbqkv_ref, dwo_ref,
                   dbo_ref, *, num_heads: int, scale: float, eps: float):
    @pl.when(pl.program_id(0) == 0)
    def _zero():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)

    x = x_ref[0]
    dy = dy_ref[0]
    yln, xhat, rstd = _ln_forward(x, g_ref, b_ref, eps)

    d_yln = _layer_bwd(
        yln, dy, wqkv_ref, bqkv_ref, wo_ref,
        dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, num_heads, scale,
    )  # (L, C) f32

    dg_ref[...] += jnp.sum(d_yln * xhat, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(d_yln, axis=0, keepdims=True)
    dxhat = d_yln * g_ref[...].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[0] = (dy.astype(jnp.float32) + dx_ln).astype(dx_ref.dtype)


def _ln_fwd_call(x, g, b, wqkv, bqkv, wo, bo, num_heads, scale, eps,
                 interpret):
    bsz, l, c = x.shape
    xblk = pl.BlockSpec((1, l, c), lambda i: (i, 0, 0))
    vec_blk = pl.BlockSpec((1, c), lambda i: (0, 0))
    return pl.pallas_call(
        functools.partial(
            _ln_fwd_kernel, num_heads=num_heads, scale=scale, eps=eps
        ),
        grid=(bsz,),
        in_specs=[
            xblk,
            vec_blk,
            vec_blk,
            pl.BlockSpec(wqkv.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec(wo.shape, lambda i: (0, 0)),
            vec_blk,
        ],
        out_specs=xblk,
        out_shape=jax.ShapeDtypeStruct((bsz, l, c), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _BWD_VMEM_LIMIT,
    )(
        x, g.reshape(1, -1), b.reshape(1, -1), wqkv,
        bqkv.reshape(1, -1), wo, bo.reshape(1, -1),
    )


def _ln_bwd_call(x, g, b, wqkv, bqkv, wo, dy, num_heads, scale, eps,
                 interpret):
    bsz, l, c = x.shape
    xblk = pl.BlockSpec((1, l, c), lambda i: (i, 0, 0))
    vec_blk = pl.BlockSpec((1, c), lambda i: (0, 0))
    outs = pl.pallas_call(
        functools.partial(
            _ln_bwd_kernel, num_heads=num_heads, scale=scale, eps=eps
        ),
        grid=(bsz,),
        in_specs=[
            xblk,
            vec_blk,
            vec_blk,
            pl.BlockSpec(wqkv.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec(wo.shape, lambda i: (0, 0)),
            xblk,
        ],
        out_specs=[
            xblk,
            vec_blk,
            vec_blk,
            pl.BlockSpec(wqkv.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec(wo.shape, lambda i: (0, 0)),
            vec_blk,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, l, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct(wqkv.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct(wo.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _BWD_VMEM_LIMIT,
    )(
        x, g.reshape(1, -1), b.reshape(1, -1), wqkv,
        bqkv.reshape(1, -1), wo, dy,
    )
    dx, dg, db, dwqkv, dbqkv, dwo, dbo = outs
    return (
        dx, dg.reshape(-1), db.reshape(-1), dwqkv, dbqkv.reshape(-1),
        dwo, dbo.reshape(-1),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _fused_ln_attn_layer(x, g, b, wqkv, bqkv, wo, bo, num_heads, scale, eps,
                         interpret):
    return _ln_fwd_call(
        x, g, b, wqkv, bqkv, wo, bo, num_heads, scale, eps, interpret
    )


def _fused_ln_fwd(x, g, b, wqkv, bqkv, wo, bo, num_heads, scale, eps,
                  interpret):
    y = _ln_fwd_call(
        x, g, b, wqkv, bqkv, wo, bo, num_heads, scale, eps, interpret
    )
    return y, (x, g, b, wqkv, bqkv, wo, bo)


def _fused_ln_bwd(num_heads, scale, eps, interpret, res, dy):
    x, g, b, wqkv, bqkv, wo, bo = res
    dx, dg, db, dwqkv, dbqkv, dwo, dbo = _ln_bwd_call(
        x, g, b, wqkv, bqkv, wo, dy, num_heads, scale, eps, interpret
    )
    return (
        dx,
        dg.astype(g.dtype),
        db.astype(b.dtype),
        dwqkv.astype(wqkv.dtype),
        dbqkv.astype(bqkv.dtype),
        dwo.astype(wo.dtype),
        dbo.astype(bo.dtype),
    )


_fused_ln_attn_layer.defvjp(_fused_ln_fwd, _fused_ln_bwd)


def fused_ln_attn_layer(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    wqkv: jax.Array,
    bqkv: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    *,
    num_heads: int,
    scale: float,
    eps: float = 1e-6,
    interpret: bool | None = None,
) -> jax.Array:
    """``x + AttnLayer(LayerNorm(x))`` over (B, L, C) tokens, one kernel.

    The pre-norm transformer attention sub-block (reference
    vit_block.py:246-247: ``x + drop_path(attn(norm1(x)))`` at
    drop_path=0) with LN statistics, softmax, and the residual sum all in
    f32 VMEM. Same qkv packing as :func:`fused_attn_layer`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fused_ln_attn_layer(
        x, ln_scale, ln_bias, wqkv, bqkv, wo, bo,
        int(num_heads), float(scale), float(eps), bool(interpret),
    )
