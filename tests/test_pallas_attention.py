"""Parity tests for the opt-in fused MHA Pallas kernel.

On CPU the kernel runs in interpreter mode (tiny shapes only); the TPU
Mosaic path was validated on hardware against jax.nn.dot_product_attention
(fwd max err 2e-3 in bf16, grads equal to ~1e-9 — see BASELINE.md).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eventpretrain_tpu.ops.pallas_attention import fused_mha, supports_fused_mha


@pytest.mark.parametrize("l,h,d", [(16, 2, 8), (24, 4, 16)])
def test_fused_mha_matches_dpa(l, h, d):
    rng = np.random.default_rng(0)
    shape = (2, l, h, d)
    q = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=shape), jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), jnp.float32)
    scale = d ** -0.5
    ref = jax.nn.dot_product_attention(q, k, v, scale=scale)
    out = fused_mha(q, k, v, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_mha_grads_match_dpa():
    rng = np.random.default_rng(1)
    shape = (2, 16, 2, 8)
    q = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=shape), jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), jnp.float32)
    scale = 8 ** -0.5
    tgt = jnp.asarray(rng.normal(size=shape), jnp.float32)

    def loss(attn_fn):
        def f(q, k, v):
            return ((attn_fn(q, k, v) - tgt) ** 2).mean()
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    g_ref = loss(lambda q, k, v: jax.nn.dot_product_attention(
        q, k, v, scale=scale))
    g_new = loss(lambda q, k, v: fused_mha(
        q, k, v, scale=scale, interpret=True))
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_attention_module_opt_in():
    from eventpretrain_tpu.models.layers import Attention

    assert supports_fused_mha(196, 32)
    assert not supports_fused_mha(4096, 32)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 16, 32)),
                    jnp.float32)
    attn = Attention(num_heads=4, use_fused_kernel=True)
    variables = attn.init(jax.random.key(0), x)
    out_fused, _ = attn.apply(variables, x)
    out_ref, _ = Attention(num_heads=4).apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)
