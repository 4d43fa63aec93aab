"""Tests for SwinECDDP and EvRepSL EffWNet."""

import jax
import jax.numpy as jnp
import numpy as np


def test_swin_ecddp_dense():
    from eventpretrain_tpu.models.swin_ecddp import SwinECDDP

    model = SwinECDDP(
        input_size=64, patch_size=4, embed_dims=(16, 32, 64, 128),
        depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2), window_size=4,
        num_bins=5,
    )
    x = jnp.ones((2, 64, 64, 5))
    variables = model.init(
        jax.random.key(0), x, method=model.encode_dense, return_pyramid=True
    )
    _, _, emb_h, out_embs, _ = model.apply(
        variables, x, method=model.encode_dense, return_pyramid=True
    )
    assert emb_h.shape == (2, 4, 128)
    assert [tuple(o.shape) for o in out_embs] == [
        (2, 16, 16, 16), (2, 8, 8, 32), (2, 4, 4, 64), (2, 2, 2, 128)
    ]


def test_swin_ecddp_cls_head():
    from eventpretrain_tpu.models.swin_ecddp import SwinECDDP

    model = SwinECDDP(
        num_classes=7, input_size=64, patch_size=4,
        embed_dims=(16, 32, 64, 128), depths=(1, 1, 1, 1),
        num_heads=(2, 2, 2, 2), window_size=4, num_bins=5,
    )
    x = jnp.ones((2, 64, 64, 5))
    variables = model.init(jax.random.key(0), x)
    logits = model.apply(variables, x)
    assert logits.shape == (2, 7)


def test_evrepsl_effwnet():
    from eventpretrain_tpu.models.evrepsl import evrepsl_net

    model = evrepsl_net()
    # pool sizes [3,3,2,2]: input must be divisible by 36
    x = jnp.ones((1, 180, 180, 3))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    # concat(x, clean_ie, c) -> 3 + 1 + 1 channels
    assert out.shape == (1, 180, 180, 5)
    assert bool(jnp.isfinite(out).all())
