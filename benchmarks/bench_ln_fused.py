"""Microbenchmark: LN+residual-fused sub-block kernels vs compositions.

Measures, at MAE-decoder and ViT-B-encoder shapes on the real chip:
  attn sub-block  y = x + AttnLayer(LN(x)):
    a) XLA LN + fused_attn_layer (current production path) + XLA residual
    b) fused_ln_attn_layer (one kernel)
  mlp sub-block   y = x + MLP(LN(x)):
    a) pure XLA composition (current production path)
    b) fused_ln_mlp (one kernel)

Timing on axon needs value-fetch sync and varying inputs per call (the
relay caches identical (executable, inputs) executions) — each iteration
feeds the previous output back in.
"""

import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

from eventpretrain_tpu.ops.fused_attn_layer import (
    fused_attn_layer,
    fused_ln_attn_layer,
)
from eventpretrain_tpu.ops.fused_mlp import fused_ln_mlp


def ln(x, g, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def bench(fn, args, iters=30):
    out = fn(*args)
    jnp.sum(out[0] if isinstance(out, tuple) else out).block_until_ready()
    x = args[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(x, *args[1:])
        x = y
    float(jnp.sum(x))  # value fetch: reliable sync on axon
    return (time.perf_counter() - t0) / iters * 1e3


def run(tag, B, L, C, H):
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def arr(*s, scale=0.05):
        return jnp.asarray(rng.normal(size=s) * scale, dt)

    x = arr(B, L, C, scale=1.0)
    g = jnp.ones((C,), dt)
    b = jnp.zeros((C,), dt)
    wqkv, bqkv = arr(C, 3 * C), arr(3 * C)
    wo, bo = arr(C, C), arr(C)
    w1, b1 = arr(C, 4 * C), arr(4 * C)
    w2, b2 = arr(4 * C, C), arr(C)
    scale = (C // H) ** -0.5

    def attn_a(x, g, b, wqkv, bqkv, wo, bo):
        return x + fused_attn_layer(
            ln(x, g, b), wqkv, bqkv, wo, bo, num_heads=H, scale=scale
        )

    def attn_b(x, g, b, wqkv, bqkv, wo, bo):
        return fused_ln_attn_layer(
            x, g, b, wqkv, bqkv, wo, bo, num_heads=H, scale=scale
        )

    def mlp_a(x, g, b, w1, b1, w2, b2):
        y = ln(x, g, b)
        h = jax.nn.gelu(
            jnp.dot(y, w1, preferred_element_type=jnp.float32) + b1,
            approximate=False,
        ).astype(x.dtype)
        return x + (jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
                    ).astype(x.dtype)

    def mlp_b(x, g, b, w1, b1, w2, b2):
        return fused_ln_mlp(x, g, b, w1, b1, w2, b2)

    def vjp_wrap(f):
        @jax.jit
        def fb(x, *rest):
            def loss(x, *rest):
                return jnp.sum(f(x, *rest).astype(jnp.float32) ** 2)
            l, grads = jax.value_and_grad(loss, argnums=(0,) + tuple(
                range(1, 1 + len(rest))))(x, *rest)
            return grads[0] + x * 1e-6  # feed-back friendly output
        return fb

    aa = (x, g, b, wqkv, bqkv, wo, bo)
    ma = (x, g, b, w1, b1, w2, b2)
    print(f"[{tag}] B={B} L={L} C={C} H={H}")
    print(f"  attn fwd   composed {bench(jax.jit(attn_a), aa):7.3f} ms"
          f" | fused_ln {bench(jax.jit(attn_b), aa):7.3f} ms")
    print(f"  attn fwd+bwd comp.  {bench(vjp_wrap(attn_a), aa):7.3f} ms"
          f" | fused_ln {bench(vjp_wrap(attn_b), aa):7.3f} ms")
    print(f"  mlp  fwd   composed {bench(jax.jit(mlp_a), ma):7.3f} ms"
          f" | fused_ln {bench(jax.jit(mlp_b), ma):7.3f} ms")
    line = f"  mlp  fwd+bwd comp.  {bench(vjp_wrap(mlp_a), ma):7.3f} ms"
    try:
        line += f" | fused_ln {bench(vjp_wrap(mlp_b), ma):7.3f} ms"
    except Exception as e:  # C=512 bwd: scoped-vmem OOM (17.06M > 16M)
        line += f" | fused_ln FAILED ({type(e).__name__})"
    print(line)


if __name__ == "__main__":
    run("decoder", 192, 196, 512, 16)
    run("encoder", 192, 49, 768, 12)
