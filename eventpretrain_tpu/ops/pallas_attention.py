"""Fused multi-head attention Pallas kernel for small head dims.

Motivation (measured on TPU v5e, decoder shapes B=128 H=16 L=196 D=32):
XLA lowers per-head attention to a 2048-instance batched matmul whose
per-instance work is tiny (2.5 MFLOP), leaving the MXU idle between
instances (~1.2 TFLOP/s effective), and it round-trips the (B, H, L, L)
f32 softmax through HBM. jax's bundled flash kernel
(jax.experimental.pallas.ops.tpu.flash_attention) is tuned for long
sequences and head_dim >= 128; at D=32 its lane padding makes it 3x
SLOWER than XLA.

This kernel instead assigns one (batch, head) pair per grid step —
TPU grids are sequential, so the 2048 steps pipeline back-to-back with
double-buffered DMA and zero dispatch overhead — and keeps the whole
(L, L) score matrix in VMEM: no flash-style tiling is needed because
the sequences this framework sees (<= 1024 tokens) fit comfortably.
Softmax runs in f32 on the VPU; both dots accumulate in f32 on the MXU.

Used by models/layers.py Attention as the default TPU path (replacing
jax.nn.dot_product_attention); numerics match dpa to bf16 tolerance.
The reference (PyTorch, reference model/sub_module/vit_block.py:118-143)
materializes attention in HBM every block — this kernel is the
TPU-native answer, not a translation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# past this many tokens the (L, L) f32 score matrix stops fitting VMEM
# comfortably; callers should fall back to jax.nn.dot_product_attention
MAX_FUSED_SEQ_LEN = 1024


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]  # (L, D)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (L, L) f32
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    # recompute the softmax (cheaper than round-tripping (L, L) via HBM)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    pt = p.astype(do.dtype)
    dv = jax.lax.dot_general(
        pt, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (L, D) = p^T @ do
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (L, L) = do @ v^T
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    ds = ds.astype(q.dtype)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (L, D) = ds^T @ q
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _specs(b, h, l, d):
    blk = pl.BlockSpec((1, 1, l, d), lambda i, j: (i, j, 0, 0))
    return dict(grid=(b, h), in_specs=None, out_specs=None, block=blk)


def _fwd_call(q, k, v, scale, interpret):
    b, h, l, d = q.shape
    blk = pl.BlockSpec((1, 1, l, d), lambda i, j: (i, j, 0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(b, h),
        in_specs=[blk, blk, blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((b, h, l, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _bwd_call(q, k, v, do, scale, interpret):
    b, h, l, d = q.shape
    blk = pl.BlockSpec((1, 1, l, d), lambda i, j: (i, j, 0, 0))
    shape = jax.ShapeDtypeStruct((b, h, l, d), q.dtype)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(b, h),
        in_specs=[blk, blk, blk, blk],
        out_specs=[blk, blk, blk],
        out_shape=[shape, shape, shape],
        interpret=interpret,
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_mha_bhld(q, k, v, scale, interpret):
    return _fwd_call(q, k, v, scale, interpret)


def _fused_fwd(q, k, v, scale, interpret):
    return _fwd_call(q, k, v, scale, interpret), (q, k, v)


def _fused_bwd(scale, interpret, res, do):
    q, k, v = res
    dq, dk, dv = _bwd_call(q, k, v, do, scale, interpret)
    return dq, dk, dv


_fused_mha_bhld.defvjp(_fused_fwd, _fused_bwd)


def supports_fused_mha(seq_len: int, head_dim: int) -> bool:
    return seq_len <= MAX_FUSED_SEQ_LEN and head_dim <= 256


def fused_mha(
    q: jax.Array, k: jax.Array, v: jax.Array, *, scale: float,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused softmax(q k^T * scale) v over (B, L, H, D) tensors.

    Same contract as ``jax.nn.dot_product_attention(q, k, v, scale=scale)``
    (no mask / bias / dropout). ``interpret=None`` auto-selects the Mosaic
    kernel on TPU and the interpreter elsewhere (tests on CPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # (B, L, H, D) -> (B, H, L, D): heads become grid steps
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _fused_mha_bhld(qt, kt, vt, float(scale), bool(interpret))
    return out.transpose(0, 2, 1, 3)
