"""Fused MLP kernel (ops/fused_mlp.py) parity tests (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eventpretrain_tpu.models.layers import Mlp
from eventpretrain_tpu.ops.fused_mlp import fused_mlp, supports_fused_mlp


def _ref(x, w1, b1, w2, b2):
    return jax.nn.gelu(x @ w1 + b1, approximate=False) @ w2 + b2


def test_kernel_matches_reference():
    rng = np.random.default_rng(0)
    b, l, c = 3, 20, 128
    x = jnp.asarray(rng.normal(size=(b, l, c)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(4 * c,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * c, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    y = fused_mlp(x, w1, b1, w2, b2)
    # in-kernel erf is the A&S 7.1.26 approximation: |err| < 1.5e-7 per erf
    np.testing.assert_allclose(y, _ref(x, w1, b1, w2, b2), atol=2e-5, rtol=2e-5)

    g1 = jax.grad(
        lambda *a: jnp.sum(jnp.sin(fused_mlp(*a))), argnums=tuple(range(5))
    )(x, w1, b1, w2, b2)
    g2 = jax.grad(
        lambda *a: jnp.sum(jnp.sin(_ref(*a))), argnums=tuple(range(5))
    )(x, w1, b1, w2, b2)
    for name, a, b_ in zip(["dx", "dw1", "db1", "dw2", "db2"], g1, g2):
        rel = float(jnp.max(jnp.abs(a - b_))) / (
            float(jnp.max(jnp.abs(b_))) + 1e-9
        )
        assert rel < 1e-4, (name, rel)


def test_mlp_module_paths_agree():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 128)), jnp.float32)
    fused = Mlp(hidden_dim=512, use_fused=True)
    plain = Mlp(hidden_dim=512, use_fused=False)
    v_f = fused.init(jax.random.key(0), x)
    v_p = plain.init(jax.random.key(0), x)
    assert jax.tree.all(
        jax.tree.map(lambda a, b: bool(jnp.allclose(a, b)), v_f, v_p)
    )
    y_f = fused.apply(v_f, x)
    y_p = plain.apply(v_f, x)
    np.testing.assert_allclose(y_f, y_p, atol=2e-5, rtol=2e-5)


def test_supports_gate():
    assert supports_fused_mlp(196, 512, 2048)
    assert not supports_fused_mlp(196, 768, 3072)  # accumulators miss VMEM
    assert not supports_fused_mlp(196, 512, 1024)  # non-4x hidden
    assert not supports_fused_mlp(2048, 512, 2048)  # seq too long


def _ln(x, g, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * g + b


@pytest.mark.parametrize("c", [128, 640])  # 640 > MAX_FUSED_WIDTH: XLA bwd
def test_ln_fused_matches_composition(c):
    from eventpretrain_tpu.ops.fused_mlp import (
        fused_ln_mlp,
        supports_fused_ln_mlp,
    )

    assert supports_fused_ln_mlp(16, c, 4 * c)
    b, l = 2, 16
    rng = np.random.default_rng(c)
    x = jnp.asarray(rng.normal(size=(b, l, c)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(4 * c,)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * c, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)) * 0.05, jnp.float32)

    def composed(x, g, beta, w1, b1, w2, b2):
        h = jax.nn.gelu(_ln(x, g, beta) @ w1 + b1, approximate=False)
        return x + (h @ w2 + b2)

    args = (x, g, beta, w1, b1, w2, b2)
    np.testing.assert_allclose(
        fused_ln_mlp(*args), composed(*args), atol=2e-5, rtol=2e-5
    )

    g1 = jax.grad(
        lambda *a: jnp.sum(jnp.sin(fused_ln_mlp(*a))),
        argnums=tuple(range(7)),
    )(*args)
    g2 = jax.grad(
        lambda *a: jnp.sum(jnp.sin(composed(*a))), argnums=tuple(range(7))
    )(*args)
    for name, a, b_ in zip(
        ["dx", "dg", "dbeta", "dw1", "db1", "dw2", "db2"], g1, g2
    ):
        rel = float(jnp.max(jnp.abs(a - b_))) / (
            float(jnp.max(jnp.abs(b_))) + 1e-9
        )
        assert rel < 1e-4, (name, rel)


def test_supports_ln_gate():
    from eventpretrain_tpu.ops.fused_mlp import supports_fused_ln_mlp

    assert supports_fused_ln_mlp(196, 512, 2048)
    assert supports_fused_ln_mlp(49, 768, 3072)  # XLA-backward width
    assert not supports_fused_ln_mlp(196, 1024, 4096)  # fwd weights > VMEM
    assert not supports_fused_ln_mlp(2048, 512, 2048)
