"""Prototype: batch-tiled fused LN+attn+residual kernel (T samples/step).

Tests whether processing T>1 samples per grid step — flattening the
projections to (T*L, C) matmuls and looping T*H heads — beats the T=1
production kernel by amortizing per-step overheads and growing matmul M.

MEASURED (2026-08-17, v5e): no. Decoder fwd T=2 2.40 ms vs T=1 ~2.48,
T=4 2.71, T=8 2.70; encoder T=2 1.42 vs T=1 1.48, T=4 1.84. The ~3%
T=2 edge is inside run variance and the backward would double its f32
transients, so production stays at one sample per grid step — the (L, C)
block already keeps the MXU fed and weight loads amortized across the
whole grid. Kept as the experiment record.
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eventpretrain_tpu.ops.fused_attn_layer import (
    _head_slices,
    _head_softmax,
    _ln_forward,
    fused_ln_attn_layer,
)

LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _tiled_fwd_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wo_ref,
                      bo_ref, y_ref, *, num_heads, scale, eps, tile):
    c = x_ref.shape[-1]
    l = x_ref.shape[-2]
    d = c // num_heads
    x2 = x_ref[...].reshape(tile * l, c)
    yln, _, _ = _ln_forward(x2, g_ref, b_ref, eps)
    qkv = jnp.dot(yln, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x2.dtype)
    outs = []
    for t in range(tile):
        qkv_t = qkv[t * l:(t + 1) * l]
        heads = []
        for h in range(num_heads):
            q, k, v = _head_slices(qkv_t, c, d, h)
            p = _head_softmax(q, k, scale)
            heads.append(
                jnp.dot(p.astype(x2.dtype), v,
                        preferred_element_type=jnp.float32).astype(x2.dtype)
            )
        outs.append(jnp.concatenate(heads, axis=-1))
    o = jnp.concatenate(outs, axis=0)  # (T*L, C)
    y = jnp.dot(o, wo_ref[...], preferred_element_type=jnp.float32)
    y = y + bo_ref[...].astype(jnp.float32)
    y_ref[...] = (x2.astype(jnp.float32) + y).reshape(tile, l, c).astype(
        y_ref.dtype
    )


def tiled_fwd(x, g, b, wqkv, bqkv, wo, bo, num_heads, scale, eps, tile):
    bsz, l, c = x.shape
    xblk = pl.BlockSpec((tile, l, c), lambda i: (i, 0, 0))
    vec = pl.BlockSpec((1, c), lambda i: (0, 0))
    return pl.pallas_call(
        functools.partial(
            _tiled_fwd_kernel, num_heads=num_heads, scale=scale, eps=eps,
            tile=tile,
        ),
        grid=(bsz // tile,),
        in_specs=[
            xblk, vec, vec,
            pl.BlockSpec(wqkv.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec(wo.shape, lambda i: (0, 0)),
            vec,
        ],
        out_specs=xblk,
        out_shape=jax.ShapeDtypeStruct((bsz, l, c), x.dtype),
        interpret=jax.default_backend() != "tpu",
        compiler_params=LIMIT,
    )(x, g.reshape(1, -1), b.reshape(1, -1), wqkv, bqkv.reshape(1, -1),
      wo, bo.reshape(1, -1))


def bench(fn, args, iters=30):
    out = fn(*args)
    jnp.sum(out).block_until_ready()
    x = args[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x, *args[1:])
    float(jnp.sum(x))
    return (time.perf_counter() - t0) / iters * 1e3


def run(tag, B, L, C, H):
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def arr(*s, scale=0.05):
        return jnp.asarray(rng.normal(size=s) * scale, dt)

    x = arr(B, L, C, scale=1.0)
    g = jnp.ones((C,), jnp.float32)
    b = jnp.zeros((C,), jnp.float32)
    wqkv, bqkv = arr(C, 3 * C), arr(3 * C)
    wo, bo = arr(C, C), arr(C)
    scale = (C // H) ** -0.5

    base = jax.jit(lambda *a: fused_ln_attn_layer(
        *a, num_heads=H, scale=scale))
    print(f"[{tag}] B={B} L={L} C={C} H={H}")
    print(f"  T=1 (prod) fwd: {bench(base, (x, g, b, wqkv, bqkv, wo, bo)):7.3f} ms")
    for tile in (2, 4, 8):
        f = jax.jit(lambda *a, t=tile: tiled_fwd(
            *a, num_heads=H, scale=scale, eps=1e-6, tile=t))
        y1 = base(x, g, b, wqkv, bqkv, wo, bo)
        y2 = f(x, g, b, wqkv, bqkv, wo, bo)
        err = float(jnp.abs(
            y1.astype(jnp.float32) - y2.astype(jnp.float32)).max())
        print(f"  T={tile} fwd: {bench(f, (x, g, b, wqkv, bqkv, wo, bo)):7.3f} ms (err {err:.2e})")


if __name__ == "__main__":
    run("decoder", 192, 196, 512, 16)
    run("encoder", 192, 49, 768, 12)
