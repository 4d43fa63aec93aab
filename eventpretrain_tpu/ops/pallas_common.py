"""Shared pieces of the fused sub-block Pallas kernels.

Home for the helpers that fused_attn_layer.py and fused_mlp.py both need,
so LN numerics and the VMEM budget can never silently diverge between the
two kernel families.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

# Trace-time override for the fused-kernel auto-enable gates. None = auto
# (fused iff the host backend is TPU); False = force the portable XLA path
# (utils/export_infer.py portable artifacts — pallas_call cannot stage a
# symbolic batch grid and the artifact must not depend on the export
# host's backend); True = force the fused kernels regardless of host
# backend (TPU-native exports: Mosaic cross-lowers from CPU hosts, so CI
# can bake kernel-full TPU artifacts).
_FUSED_OVERRIDE: list = [None]


@contextlib.contextmanager
def force_xla():
    prev = _FUSED_OVERRIDE[0]
    _FUSED_OVERRIDE[0] = False
    try:
        yield
    finally:
        _FUSED_OVERRIDE[0] = prev


@contextlib.contextmanager
def force_fused():
    prev = _FUSED_OVERRIDE[0]
    _FUSED_OVERRIDE[0] = True
    try:
        yield
    finally:
        _FUSED_OVERRIDE[0] = prev


def xla_forced() -> bool:
    return _FUSED_OVERRIDE[0] is False


def fused_forced() -> bool:
    return _FUSED_OVERRIDE[0] is True

# The kernels' f32 dW accumulators + resident weights legitimately need
# more than the 16 MB default scoped-VMEM budget at C=512/768; raise the
# per-kernel cap (v5e VMEM is far larger than the conservative default).
VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)

# Longest token-block length the fused sub-block kernels are enabled for.
# Every production sequence (MAE decoder 196, masked encoder 49, dense
# encoders 196/197, swin stages route elsewhere) fits; L=1024 was measured
# to FAIL compilation on v5e even in the forward (the f32 (L, L) softmax
# block alone is 4 MB and the transposed-layout transients blow the scoped
# budget), so the gate is bounded by what is verified to fit, not by a
# wish.
MAX_FUSED_SEQ_LEN = 256


def ln_forward(x, g_ref, b_ref, eps):
    """f32 LayerNorm of an (L, C) block; returns (yln[x.dtype], xhat, rstd)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    yln = xhat * g_ref[...].astype(jnp.float32) + b_ref[...].astype(
        jnp.float32
    )
    return yln.astype(x.dtype), xhat, rstd
