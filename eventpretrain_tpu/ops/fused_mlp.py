"""Fused transformer-MLP Pallas kernel (fc1 + GELU + fc2).

Companion to ops/fused_attn_layer.py, same architecture: a 1-D grid over
batch, one (L, C) token block per step, both weight matrices VMEM-resident
(constant block index), the (L, 4C) hidden activation never leaving VMEM.
XLA runs this MLP as two large flattened matmuls at ~100 TFLOP/s fwd+bwd
but round-trips the hidden layer (B*L*4C, ~100 MB at decoder shapes)
through HBM between fc1/GELU/fc2 and again in the backward; fusing removes
that traffic and the kernel-launch/fusion seams.

The backward recomputes the hidden pre-activation in VMEM and accumulates
dW1/dW2/db1/db2 in f32 across the grid (zeroed at step 0). VMEM footprint
is weights (bf16) + dW accumulators (f32) + activation scratch, about
15 MB at C=512 (MAE decoder) — inside the ~16 MB/core budget; the
``supports_fused_mlp`` gate excludes widths whose accumulators would not
fit (e.g. C=768 encoder MLPs need ~28 MB and stay on XLA).

GELU parity: models/layers.py::Mlp uses exact (erf-based) GELU, reference
vit_block.py:215-231 / torch nn.GELU; the kernel matches, incl. the exact
d/dx gelu(x) = Phi(x) + x phi(x).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from eventpretrain_tpu.ops.pallas_common import (
    MAX_FUSED_SEQ_LEN,
    VMEM_LIMIT as _BWD_VMEM_LIMIT,
    ln_forward as _ln_forward_shared,
)
# bf16 weights (2*4*C^2*2B) + f32 dW accumulators (2*4*C^2*4B) must leave
# room for activations in ~16MB VMEM: C=512 -> 12MB + scratch. C=768 -> 28MB.
MAX_FUSED_WIDTH = 512


def _half_precision(dtype) -> bool:
    """The VMEM budgets above assume 2-byte weights; an f32 model doubles
    the in-kernel weight + transient footprint and can exceed the scoped
    VMEM limit, so f32 configs stay on the XLA path. ``dtype=None``
    preserves the historical bf16 assumption for callers that pre-cast."""
    return dtype is None or jnp.dtype(dtype).itemsize <= 2


def supports_fused_mlp(seq_len: int, dim: int, hidden_dim: int,
                       dtype=None) -> bool:
    return (
        _half_precision(dtype)
        and seq_len <= MAX_FUSED_SEQ_LEN
        and dim <= MAX_FUSED_WIDTH
        and dim % 128 == 0
        and hidden_dim % 128 == 0
        and hidden_dim == 4 * dim
    )


def supports_fused_ln_mlp(seq_len: int, dim: int, hidden_dim: int,
                          dtype=None) -> bool:
    """Gate for the LN+MLP+residual variant: the forward kernel only needs
    the bf16 weights resident (C=768 fits at 9.4 MB); widths ≤ 512 also run
    the hidden-chunked Pallas backward, wider ones take the XLA backward."""
    return (
        _half_precision(dtype)
        and seq_len <= MAX_FUSED_SEQ_LEN
        and dim <= 768
        and dim % 128 == 0
        and hidden_dim % 256 == 0
        and hidden_dim == 4 * dim
    )


_SQRT_2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (|err| < 1.5e-7, far below bf16
    rounding): Mosaic has no erf primitive, so the kernel carries its own."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741
                                   + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    # exact (erf-based) GELU on f32, matching jax.nn.gelu(approximate=False)
    return x * 0.5 * (1.0 + _erf(x / _SQRT_2))


def _gelu_grad(x):
    phi = _INV_SQRT_2PI * jnp.exp(-0.5 * x * x)
    cdf = 0.5 * (1.0 + _erf(x / _SQRT_2))
    return cdf + x * phi


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
    x = x_ref[0]  # (L, C)
    h_pre = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h_pre = h_pre + b1_ref[...].astype(jnp.float32)
    h = _gelu(h_pre).astype(x.dtype)
    y = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    y = y + b2_ref[...].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, dy_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    @pl.when(pl.program_id(0) == 0)
    def _zero():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[0]
    dy = dy_ref[0]
    h_pre = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h_pre = h_pre + b1_ref[...].astype(jnp.float32)
    h = _gelu(h_pre).astype(x.dtype)

    dw2_ref[...] += jax.lax.dot_general(
        h, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db2_ref[...] += jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)
    dh = jax.lax.dot_general(
        dy, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (L, 4C) f32
    dh_pre = (dh * _gelu_grad(h_pre)).astype(x.dtype)

    dw1_ref[...] += jax.lax.dot_general(
        x, dh_pre, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db1_ref[...] += jnp.sum(dh_pre.astype(jnp.float32), axis=0, keepdims=True)
    dx = jax.lax.dot_general(
        dh_pre, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _fwd_call(x, w1, b1, w2, b2, interpret):
    b, l, c = x.shape
    hd = w1.shape[1]
    xblk = pl.BlockSpec((1, l, c), lambda i: (i, 0, 0))
    return pl.pallas_call(
        _fwd_kernel,
        grid=(b,),
        in_specs=[
            xblk,
            pl.BlockSpec(w1.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, hd), lambda i: (0, 0)),
            pl.BlockSpec(w2.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=xblk,
        out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _BWD_VMEM_LIMIT,
    )(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))


def _bwd_call(x, w1, b1, w2, dy, interpret):
    b, l, c = x.shape
    hd = w1.shape[1]
    xblk = pl.BlockSpec((1, l, c), lambda i: (i, 0, 0))
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        _bwd_kernel,
        grid=(b,),
        in_specs=[
            xblk,
            pl.BlockSpec(w1.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, hd), lambda i: (0, 0)),
            pl.BlockSpec(w2.shape, lambda i: (0, 0)),
            xblk,
        ],
        out_specs=[
            xblk,
            pl.BlockSpec(w1.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, hd), lambda i: (0, 0)),
            pl.BlockSpec(w2.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, l, c), x.dtype),
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, hd), jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _BWD_VMEM_LIMIT,
    )(x, w1, b1.reshape(1, -1), w2, dy)
    return dx, dw1, db1.reshape(-1), dw2, db2.reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_mlp(x, w1, b1, w2, b2, interpret):
    return _fwd_call(x, w1, b1, w2, b2, interpret)


def _fused_fwd(x, w1, b1, w2, b2, interpret):
    return _fwd_call(x, w1, b1, w2, b2, interpret), (x, w1, b1, w2, b2)


def _fused_bwd(interpret, res, dy):
    x, w1, b1, w2, b2 = res
    dx, dw1, db1, dw2, db2 = _bwd_call(x, w1, b1, w2, dy, interpret)
    return (
        dx,
        dw1.astype(w1.dtype),
        db1.astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(b2.dtype),
    )


_fused_mlp.defvjp(_fused_fwd, _fused_bwd)


def fused_mlp(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused ``gelu(x @ w1 + b1) @ w2 + b2`` over (B, L, C) tokens."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fused_mlp(x, w1, b1, w2, b2, bool(interpret))


# ---------------------------------------------------------------------------
# LN + MLP + residual: y = x + MLP(LayerNorm(x))
#
# The pre-norm transformer MLP sub-block in one kernel (companion of
# fused_attn_layer.fused_ln_attn_layer; same motivation: keep the (B, L, C)
# token stream out of HBM between LN, the matmuls, and the residual add).
# ---------------------------------------------------------------------------


_ln_forward = _ln_forward_shared


def _ln_fwd_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   y_ref, *, eps: float):
    x = x_ref[0]  # (L, C)
    yln, _, _ = _ln_forward(x, g_ref, b_ref, eps)
    h_pre = jnp.dot(yln, w1_ref[...], preferred_element_type=jnp.float32)
    h_pre = h_pre + b1_ref[...].astype(jnp.float32)
    h = _gelu(h_pre).astype(x.dtype)
    y = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    y = y + b2_ref[...].astype(jnp.float32)
    y_ref[0] = (x.astype(jnp.float32) + y).astype(y_ref.dtype)


def _ln_bwd_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, dy_ref,
                   dx_ref, dg_ref, dbeta_ref, dw1_ref, db1_ref, dw2_ref,
                   db2_ref, *, eps: float, hidden_chunks: int):
    @pl.when(pl.program_id(0) == 0)
    def _zero():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbeta_ref[...] = jnp.zeros_like(dbeta_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[0]
    dy = dy_ref[0]
    yln, xhat, rstd = _ln_forward(x, g_ref, b_ref, eps)
    db2_ref[...] += jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)

    # Hidden-dim chunking: the whole-hidden f32 transients (h_pre, dh) are
    # what pushed scoped VMEM past 16 MB at C=512 (17.06M); processing the
    # hidden dim in static chunks halves/quarters them at identical FLOPs.
    hd = w1_ref.shape[1]
    cs = hd // hidden_chunks
    d_yln = jnp.zeros(x.shape, jnp.float32)
    for ci in range(hidden_chunks):
        sl = slice(ci * cs, (ci + 1) * cs)
        h_pre_c = jnp.dot(
            yln, w1_ref[:, sl], preferred_element_type=jnp.float32
        ) + b1_ref[:, sl].astype(jnp.float32)
        h_c = _gelu(h_pre_c).astype(x.dtype)
        dw2_ref[sl, :] += jax.lax.dot_general(
            h_c, dy, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh_c = jax.lax.dot_general(
            dy, w2_ref[sl, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh_pre_c = (dh_c * _gelu_grad(h_pre_c)).astype(x.dtype)
        dw1_ref[:, sl] += jax.lax.dot_general(
            yln, dh_pre_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db1_ref[:, sl] += jnp.sum(
            dh_pre_c.astype(jnp.float32), axis=0, keepdims=True
        )
        d_yln = d_yln + jax.lax.dot_general(
            dh_pre_c, w1_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dg_ref[...] += jnp.sum(d_yln * xhat, axis=0, keepdims=True)
    dbeta_ref[...] += jnp.sum(d_yln, axis=0, keepdims=True)
    dxhat = d_yln * g_ref[...].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[0] = (dy.astype(jnp.float32) + dx_ln).astype(dx_ref.dtype)


def _ln_fwd_call(x, g, b, w1, b1, w2, b2, eps, interpret):
    bsz, l, c = x.shape
    hd = w1.shape[1]
    xblk = pl.BlockSpec((1, l, c), lambda i: (i, 0, 0))
    cvec = pl.BlockSpec((1, c), lambda i: (0, 0))
    return pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        grid=(bsz,),
        in_specs=[
            xblk,
            cvec,
            cvec,
            pl.BlockSpec(w1.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, hd), lambda i: (0, 0)),
            pl.BlockSpec(w2.shape, lambda i: (0, 0)),
            cvec,
        ],
        out_specs=xblk,
        out_shape=jax.ShapeDtypeStruct((bsz, l, c), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _BWD_VMEM_LIMIT,
    )(
        x, g.reshape(1, -1), b.reshape(1, -1), w1, b1.reshape(1, -1),
        w2, b2.reshape(1, -1),
    )


def _ln_bwd_call(x, g, b, w1, b1, w2, dy, eps, interpret, hidden_chunks=None):
    bsz, l, c = x.shape
    hd = w1.shape[1]
    if hidden_chunks is None:
        # 4 chunks when lane alignment allows (C=512's backward sat at
        # 16.06M with 2 chunks in-context — 62K over the scoped limit)
        hidden_chunks = 4 if hd % 512 == 0 else 2
    xblk = pl.BlockSpec((1, l, c), lambda i: (i, 0, 0))
    cvec = pl.BlockSpec((1, c), lambda i: (0, 0))
    dx, dg, dbeta, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(
            _ln_bwd_kernel, eps=eps, hidden_chunks=hidden_chunks
        ),
        grid=(bsz,),
        in_specs=[
            xblk,
            cvec,
            cvec,
            pl.BlockSpec(w1.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, hd), lambda i: (0, 0)),
            pl.BlockSpec(w2.shape, lambda i: (0, 0)),
            xblk,
        ],
        out_specs=[
            xblk,
            cvec,
            cvec,
            pl.BlockSpec(w1.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, hd), lambda i: (0, 0)),
            pl.BlockSpec(w2.shape, lambda i: (0, 0)),
            cvec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, l, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, hd), jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _BWD_VMEM_LIMIT,
    )(x, g.reshape(1, -1), b.reshape(1, -1), w1, b1.reshape(1, -1), w2, dy)
    return (
        dx, dg.reshape(-1), dbeta.reshape(-1), dw1, db1.reshape(-1),
        dw2, db2.reshape(-1),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused_ln_mlp(x, g, b, w1, b1, w2, b2, eps, interpret):
    return _ln_fwd_call(x, g, b, w1, b1, w2, b2, eps, interpret)


def _fused_ln_mlp_fwd(x, g, b, w1, b1, w2, b2, eps, interpret):
    y = _ln_fwd_call(x, g, b, w1, b1, w2, b2, eps, interpret)
    return y, (x, g, b, w1, b1, w2, b2)


def _xla_ln_mlp_bwd(x, g, b, w1, b1, w2, dy, eps):
    """XLA backward for widths whose Pallas backward can't fit VMEM
    (C=768 encoder: bf16 weights alone are 9.4 MB, f32 dW accumulators
    18.9 MB). Recomputes LN + fc1 as big flattened matmuls."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    yln = (
        xhat * g.astype(jnp.float32) + b.astype(jnp.float32)
    ).astype(x.dtype)

    h_pre = jnp.dot(
        yln, w1, preferred_element_type=jnp.float32
    ) + b1.astype(jnp.float32)
    h = _gelu(h_pre).astype(x.dtype)

    dy_f = dy.astype(jnp.float32)
    bl = (((0, 1), (0, 1)), ((), ()))  # contract over (batch, tokens)
    dw2 = jax.lax.dot_general(h, dy, bl, preferred_element_type=jnp.float32)
    db2 = jnp.sum(dy_f, axis=(0, 1))
    dh = jax.lax.dot_general(
        dy, w2, (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dh_pre = (dh * _gelu_grad(h_pre)).astype(x.dtype)
    dw1 = jax.lax.dot_general(
        yln, dh_pre, bl, preferred_element_type=jnp.float32
    )
    db1 = jnp.sum(dh_pre.astype(jnp.float32), axis=(0, 1))
    d_yln = jax.lax.dot_general(
        dh_pre, w1, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    dg = jnp.sum(d_yln * xhat, axis=(0, 1))
    dbeta = jnp.sum(d_yln, axis=(0, 1))
    dxhat = d_yln * g.astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (dy_f + rstd * (dxhat - m1 - xhat * m2)).astype(x.dtype)
    return dx, dg, dbeta, dw1, db1, dw2, db2


def _fused_ln_mlp_bwd(eps, interpret, res, dy):
    x, g, b, w1, b1, w2, b2 = res
    if x.shape[-1] <= MAX_FUSED_WIDTH:
        dx, dg, dbeta, dw1, db1, dw2, db2 = _ln_bwd_call(
            x, g, b, w1, b1, w2, dy, eps, interpret
        )
    else:
        dx, dg, dbeta, dw1, db1, dw2, db2 = _xla_ln_mlp_bwd(
            x, g, b, w1, b1, w2, dy, eps
        )
    return (
        dx,
        dg.astype(g.dtype),
        dbeta.astype(b.dtype),
        dw1.astype(w1.dtype),
        db1.astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(b2.dtype),
    )


_fused_ln_mlp.defvjp(_fused_ln_mlp_fwd, _fused_ln_mlp_bwd)


def fused_ln_mlp(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    eps: float = 1e-6,
    interpret: bool | None = None,
) -> jax.Array:
    """``x + MLP(LayerNorm(x))`` over (B, L, C) tokens, one kernel.

    The pre-norm transformer MLP sub-block (reference vit_block.py:248:
    ``x + drop_path(mlp(norm2(x)))`` at drop_path=0).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fused_ln_mlp(
        x, ln_scale, ln_bias, w1, b1, w2, b2, float(eps), bool(interpret)
    )
