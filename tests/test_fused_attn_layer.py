"""Fused attention-layer kernel (ops/fused_attn_layer.py) parity tests.

Runs in Pallas interpret mode on CPU; the Mosaic path is exercised on real
TPU by bench.py / the verify drive (models auto-enable it on the tpu
backend only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eventpretrain_tpu.models.layers import Attention
from eventpretrain_tpu.ops.fused_attn_layer import (
    fused_attn_layer,
    supports_fused_attn_layer,
)


def _reference(x, wqkv, bqkv, wo, bo, num_heads, scale):
    b, l, c = x.shape
    d = c // num_heads
    qkv = (x @ wqkv + bqkv).reshape(b, l, 3, num_heads, d)
    q, k, v = (
        qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)
    )  # (b, h, l, d)
    s = (q @ k.transpose(0, 1, 3, 2)) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(x.dtype)
    o = (p @ v).transpose(0, 2, 1, 3).reshape(b, l, c)
    return o @ wo + bo


@pytest.mark.parametrize(
    "b,l,c,h", [(3, 20, 128, 4), (2, 49, 256, 8), (1, 196, 128, 4)]
)
def test_kernel_matches_reference(b, l, c, h):
    d = c // h
    scale = d**-0.5
    rng = np.random.default_rng(b * 100 + l)
    x = jnp.asarray(rng.normal(size=(b, l, c)), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * c,)) * 0.1, jnp.float32)
    wo = jnp.asarray(rng.normal(size=(c, c)) * 0.05, jnp.float32)
    bo = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)

    y = fused_attn_layer(x, wqkv, bqkv, wo, bo, num_heads=h, scale=scale)
    y_ref = _reference(x, wqkv, bqkv, wo, bo, h, scale)
    np.testing.assert_allclose(y, y_ref, atol=1e-5, rtol=1e-5)


def test_kernel_gradients_match_reference():
    b, l, c, h = 2, 24, 128, 4
    scale = (c // h) ** -0.5
    rng = np.random.default_rng(7)
    args = (
        jnp.asarray(rng.normal(size=(b, l, c)), jnp.float32),
        jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(3 * c,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(c, c)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32),
    )

    def loss_fused(*a):
        return jnp.sum(
            jnp.sin(fused_attn_layer(*a, num_heads=h, scale=scale))
        )

    def loss_ref(*a):
        return jnp.sum(jnp.sin(_reference(*a, h, scale)))

    g1 = jax.grad(loss_fused, argnums=tuple(range(5)))(*args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(5)))(*args)
    for name, a, b_ in zip(["dx", "dwqkv", "dbqkv", "dwo", "dbo"], g1, g2):
        scale_ref = float(jnp.max(jnp.abs(b_))) + 1e-9
        err = float(jnp.max(jnp.abs(a - b_))) / scale_ref
        assert err < 1e-5, (name, err)


def test_attention_module_paths_agree():
    """Fused and unfused Attention share one param tree and one output."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 24, 128)), jnp.float32)
    fused = Attention(num_heads=4, use_fused_layer=True)
    unfused = Attention(num_heads=4, use_fused_layer=False)

    v_f = fused.init(jax.random.key(0), x)
    v_u = unfused.init(jax.random.key(0), x)
    assert jax.tree.all(
        jax.tree.map(lambda a, b: bool(jnp.allclose(a, b)), v_f, v_u)
    ), "init param trees must be byte-identical across paths"

    y_f, attn_f = fused.apply(v_f, x)
    y_u, _ = unfused.apply(v_f, x)
    assert attn_f is None
    np.testing.assert_allclose(y_f, y_u, atol=2e-5, rtol=2e-5)

    # return_attn falls back to the unfused path with the same params
    y_a, attn = fused.apply(v_f, x, True, True)
    assert attn.shape == (2, 4, 24, 24)
    np.testing.assert_allclose(y_a, y_u, atol=2e-5, rtol=2e-5)


def test_qkv_bias_false_supported():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 16, 128)), jnp.float32)
    for flag in (True, False):
        att = Attention(num_heads=4, qkv_bias=False, use_fused_layer=flag)
        v = att.init(jax.random.key(0), x)
        assert "bias" not in v["params"]["qkv"]
    y_f, _ = Attention(
        num_heads=4, qkv_bias=False, use_fused_layer=True
    ).apply(v, x)
    y_u, _ = Attention(
        num_heads=4, qkv_bias=False, use_fused_layer=False
    ).apply(v, x)
    np.testing.assert_allclose(y_f, y_u, atol=2e-5, rtol=2e-5)


def test_supports_gate():
    assert supports_fused_attn_layer(196, 512, 16)
    assert supports_fused_attn_layer(49, 768, 12)
    assert not supports_fused_attn_layer(2048, 512, 16)  # seq too long
    assert not supports_fused_attn_layer(196, 512, 5)  # indivisible heads
    assert not supports_fused_attn_layer(196, 96, 2)  # dim not 128-aligned


def _ln(x, g, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * g + b


def test_ln_fused_matches_composition():
    from eventpretrain_tpu.ops.fused_attn_layer import fused_ln_attn_layer

    b, l, c, h = 2, 24, 128, 4
    scale = (c // h) ** -0.5
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(b, l, c)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * c,)) * 0.1, jnp.float32)
    wo = jnp.asarray(rng.normal(size=(c, c)) * 0.05, jnp.float32)
    bo = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)

    def composed(x, g, beta, wqkv, bqkv, wo, bo):
        return x + _reference(_ln(x, g, beta), wqkv, bqkv, wo, bo, h, scale)

    args = (x, g, beta, wqkv, bqkv, wo, bo)
    y = fused_ln_attn_layer(*args, num_heads=h, scale=scale)
    np.testing.assert_allclose(y, composed(*args), atol=2e-5, rtol=2e-5)

    g1 = jax.grad(
        lambda *a: jnp.sum(
            jnp.sin(fused_ln_attn_layer(*a, num_heads=h, scale=scale))
        ),
        argnums=tuple(range(7)),
    )(*args)
    g2 = jax.grad(
        lambda *a: jnp.sum(jnp.sin(composed(*a))), argnums=tuple(range(7))
    )(*args)
    names = ["dx", "dg", "dbeta", "dwqkv", "dbqkv", "dwo", "dbo"]
    for name, a, b_ in zip(names, g1, g2):
        err = float(jnp.max(jnp.abs(a - b_))) / (
            float(jnp.max(jnp.abs(b_))) + 1e-9
        )
        assert err < 1e-5, (name, err)


def test_vitblock_fused_block_parity():
    """The LN-fused sub-block path of ViTBlock is numerically the unfused
    pre-norm block, with an identical param tree."""
    from eventpretrain_tpu.models.layers import ViTBlock

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 128)), jnp.float32)
    blk_f = ViTBlock(num_heads=4, use_fused_layer=True)
    blk_u = ViTBlock(num_heads=4, use_fused_layer=False)
    v = blk_u.init(jax.random.key(0), x)
    v2 = blk_f.init(jax.random.key(0), x)
    assert jax.tree.structure(v) == jax.tree.structure(v2)

    yf = blk_f.apply(v, x, False)
    yu = blk_u.apply(v, x, False)
    np.testing.assert_allclose(yf, yu, atol=2e-5, rtol=2e-5)

    gf = jax.grad(
        lambda p: jnp.sum(blk_f.apply({"params": p}, x, False) ** 2)
    )(v["params"])
    gu = jax.grad(
        lambda p: jnp.sum(blk_u.apply({"params": p}, x, False) ** 2)
    )(v["params"])
    errs = jax.tree.map(
        lambda a, b: float(
            jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9)
        ),
        gf, gu,
    )
    assert max(jax.tree.leaves(errs)) < 1e-5
