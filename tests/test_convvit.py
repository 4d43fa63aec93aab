"""ConvViT backbone tests (reference model/backbone/convvit.py parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from eventpretrain_tpu.models.convvit import (
    ConvViT,
    convvit_small_patch16,
    _upsample_mask,
)
from eventpretrain_tpu.ops import random_masking


def tiny_convvit(**kw):
    cfg = dict(
        input_size=64, patch_sizes=(4, 2, 2), embed_dims=(16, 24, 32),
        depths=(1, 1, 2), num_heads=4,
    )
    cfg.update(kw)
    return ConvViT(**cfg)


def test_upsample_mask():
    mask = jnp.asarray([[0.0, 1.0, 1.0, 0.0]])  # 2x2 grid
    up = _upsample_mask(mask, 2, 2)
    want = np.array(
        [[[0, 0, 1, 1], [0, 0, 1, 1], [1, 1, 0, 0], [1, 1, 0, 0]]], np.float32
    )
    np.testing.assert_array_equal(np.asarray(up), want)


def test_dense_shapes():
    model = tiny_convvit(with_fpn=True)
    x = jnp.ones((2, 64, 64, 5))
    variables = model.init(
        jax.random.key(0), x, method=model.encode_dense, return_pyramid=True
    )
    emb_l1, emb_l2, emb_h, out_embs, attn = model.apply(
        variables, x, method=model.encode_dense,
        return_attn=True, return_pyramid=True,
    )
    assert emb_l1.shape == (2, 16, 16, 16)   # 64/4
    assert emb_l2.shape == (2, 8, 8, 24)     # /2
    assert emb_h.shape == (2, 16, 32)        # 4x4 grid tokens
    assert [tuple(o.shape) for o in out_embs] == [
        (2, 16, 16, 16), (2, 8, 8, 24), (2, 4, 4, 32), (2, 1, 1, 32)
    ]
    assert attn.shape == (2, 4, 16, 16)


def test_masked_shapes_and_gating():
    model = tiny_convvit()
    x = jnp.ones((2, 64, 64, 5))
    ids_keep, mask, ids_restore = random_masking(jax.random.key(1), 2, 16, 0.75)
    dvars = model.init(
        jax.random.key(0), x, ids_keep, mask=mask, method=model.encode_masked
    )
    emb_l1, emb_l2, emb_lh = model.apply(
        dvars, x, ids_keep, mask=mask, method=model.encode_masked
    )
    assert emb_lh.shape == (2, 4, 32)
    assert bool(jnp.isfinite(emb_lh).all())


def test_full_rec_pretrain_with_convvit():
    from eventpretrain_tpu.models.pretrain_hub import PrHub
    from eventpretrain_tpu.models.decoder import RecDecoder
    from eventpretrain_tpu.train import build_optimizer, TrainState
    from eventpretrain_tpu.train.steps import make_rec_step

    backbone = tiny_convvit(name="backbone")
    decoder = RecDecoder(
        patch_size=16, num_patches=16, embed_dim=32, depth=1, num_heads=4,
        frame_chans=1, name="pretrain_rec_decoder",
    )
    hub = PrHub(backbone=backbone, decoder=decoder, embed_dim=32,
                num_patches=16, mlp_dim=32, clip_emb_dim=16)
    rng = np.random.default_rng(0)
    evg = jnp.asarray(rng.normal(size=(4, 64, 64, 5)), jnp.float32)
    frame = jnp.asarray(rng.normal(size=(4, 64, 64, 1)), jnp.float32)
    ids_keep, mask, ids_restore = random_masking(jax.random.key(0), 4, 16, 0.75)
    variables = hub.init(
        jax.random.key(1), evg, ids_keep, ids_restore, mask=mask,
        method=hub.forward_rec,
    )
    tx = build_optimizer(
        variables["params"], learning_rate=1e-3, num_layers=4,
        backbone_type="convvit",
    )
    state = TrainState.create(
        apply_fn=hub.apply, params=variables["params"], tx=tx
    )
    step = make_rec_step(hub, patch_size=16, num_patches=16, mask_ratio=0.75)
    batch = {"evg": evg, "frame": frame}
    key = jax.random.key(2)
    first = None
    for i in range(10):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first


def test_layer_decay_ids_for_convvit():
    from eventpretrain_tpu.train.optim import vit_layer_id

    assert vit_layer_id(["backbone", "patch_embed1", "proj", "kernel"], 13,
                        "convvit") == 0
    assert vit_layer_id(["backbone", "conv_block1_0", "conv1", "kernel"], 13,
                        "convvit") == 1
    assert vit_layer_id(["backbone", "conv_block2_1", "conv1", "kernel"], 13,
                        "convvit") == 2
    assert vit_layer_id(["backbone", "vit_block_0", "attn", "qkv", "kernel"],
                        13, "convvit") == 3
    assert vit_layer_id(["classify_head", "kernel"], 13, "convvit") == 13
