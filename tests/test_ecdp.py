"""ECDP baseline tests: backbone, objectives, EMA train step."""

import numpy as np
import jax
import jax.numpy as jnp

from eventpretrain_tpu.models.vit_ecdp import ViTECDP
from eventpretrain_tpu.models.ecdp_hub import EcdpEncoder, EcdpModel
from eventpretrain_tpu.objectives.ecdp import (
    ema_update,
    cosine_ema_momentum,
    sinkhorn,
    ecdp_kl_loss,
    global_sample_infonce,
    sample_infonce_queue,
    init_sample_queue,
)
from eventpretrain_tpu.ops import random_masking
from eventpretrain_tpu.train import build_optimizer, TrainState
from eventpretrain_tpu.train.steps import make_ecdp_step


def tiny_ecdp_model():
    backbone = ViTECDP(
        input_size=32, patch_size=8, embed_dim=48, depth=2, num_heads=4,
        num_bins=2, out_indices=(0, 1), name="backbone",
    )
    encoder = EcdpEncoder(backbone=backbone, proj_dim=16, mlp_dim=32,
                          name="encoder")
    return EcdpModel(encoder=encoder, proj_dim=16, mlp_dim=32,
                     clip_emb_dim=24)


class TestViTECDP:
    def test_masked_returns_two_tokens(self):
        model = ViTECDP(input_size=32, patch_size=8, embed_dim=48, depth=2,
                        num_heads=4, num_bins=2)
        x = jnp.ones((2, 32, 32, 2))
        ids_keep, _, _ = random_masking(jax.random.key(0), 2, 16, 0.75)
        variables = model.init(
            jax.random.key(1), x, ids_keep, method=model.encode_masked
        )
        ev, im, _ = model.apply(
            variables, x, ids_keep, method=model.encode_masked
        )
        assert ev.shape == (2, 48) and im.shape == (2, 48)

    def test_dense_concat(self):
        model = ViTECDP(input_size=32, patch_size=8, embed_dim=48, depth=2,
                        num_heads=4, num_bins=2)
        x = jnp.ones((2, 32, 32, 2))
        variables = model.init(jax.random.key(0), x)
        emb, _, _ = model.apply(variables, x)
        assert emb.shape == (2, 96)  # 2 tokens concatenated


class TestEcdpObjectives:
    def test_ema_update(self):
        p = {"w": jnp.ones(3)}
        e = {"w": jnp.zeros(3)}
        out = ema_update(p, e, 0.9)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.1)

    def test_cosine_momentum_endpoints(self):
        assert abs(cosine_ema_momentum(0.99, 0, 100) - 0.99) < 1e-9
        assert abs(cosine_ema_momentum(0.99, 100, 100) - 1.0) < 1e-9

    def test_sinkhorn_columns_sum_to_one(self, rng):
        out = jnp.asarray(rng.normal(size=(6, 6)), jnp.float32)
        q = sinkhorn(out)
        # rows of returned Q^T (per-sample assignments) sum to 1
        np.testing.assert_allclose(np.asarray(q.sum(axis=1)), 1.0, rtol=1e-4)

    def test_kl_loss_finite_and_nonneg_at_alignment(self, rng):
        v = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
        loss = ecdp_kl_loss(v, v, 0.1)
        assert np.isfinite(float(loss))

    def test_global_sample_infonce_prefers_diagonal(self, rng):
        v = jnp.asarray(rng.normal(size=(6, 16)), jnp.float32)
        aligned = global_sample_infonce(v, v, 0.1)
        shuffled = global_sample_infonce(v, v[::-1], 0.1)
        assert float(aligned) < float(shuffled)

    def test_sample_queue_roundtrip(self, rng):
        q = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
        queue = init_sample_queue(jax.random.key(0), 16, 8)
        loss, queue = sample_infonce_queue(q, k, queue, 0.1)
        assert np.isfinite(float(loss))
        assert int(queue.ptr) == 4


class TestEcdpStep:
    def test_loss_decreases_and_ema_moves(self, rng):
        model = tiny_ecdp_model()
        img_q = jnp.asarray(rng.normal(size=(4, 32, 32, 2)), jnp.float32)
        img_k = jnp.asarray(rng.normal(size=(4, 32, 32, 2)), jnp.float32)
        clip_emb = jnp.asarray(rng.normal(size=(4, 24)), jnp.float32)
        ids_keep, _, _ = random_masking(jax.random.key(0), 4, 16, 0.75)
        variables = model.init(
            jax.random.key(1), img_q, ids_keep, clip_emb,
            method=model.forward_query,
        )
        params = variables["params"]
        tx = build_optimizer(params, learning_rate=1e-3, num_layers=2)
        # copies: the step donates its input state buffers
        ema0 = jax.tree.map(jnp.copy, params["encoder"])
        state = TrainState.create(
            apply_fn=model.apply,
            params=jax.tree.map(jnp.copy, params),
            batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
            tx=tx,
            ema_params=jax.tree.map(jnp.copy, ema0),
        )
        step = make_ecdp_step(
            model, num_patches=16, mask_ratio=0.75,
            total_epochs=10, steps_per_epoch=2,
        )
        batch = {"img_q": img_q, "img_k": img_k, "clip_emb": clip_emb}
        # fixed key -> fixed masks -> deterministic objective must decrease
        sub = jax.random.key(2)
        losses = []
        for _ in range(6):
            state, metrics = step(state, batch, sub)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]
        # EMA drifted from init towards the trained params
        d = jax.tree.leaves(
            jax.tree.map(
                lambda a, b: jnp.abs(a - b).sum(), state.ema_params, ema0
            )
        )
        assert float(sum(d)) > 0


def test_vit_mem_cls():
    from eventpretrain_tpu.models.cls_hub import cls_hub_vit_mem_small

    hub = cls_hub_vit_mem_small(num_classes=4, input_size=32, patch_size=8)
    x = jnp.ones((2, 32, 32, 3))
    variables = hub.init(jax.random.key(0), x)
    _, logits, _ = hub.apply(variables, x)
    assert logits.shape == (2, 4)


def test_vit_ecdp_cls_head_dim():
    from eventpretrain_tpu.models.cls_hub import cls_hub_vit_ecdp_small

    hub = cls_hub_vit_ecdp_small(num_classes=4, input_size=32, patch_size=8,
                                 embed_dim=48, depth=2, num_heads=4)
    x = jnp.ones((2, 32, 32, 2))
    variables = hub.init(jax.random.key(0), x)
    # head input is 2*embed_dim (token concat)
    assert variables["params"]["classify_head"]["kernel"].shape == (96, 4)
    _, logits, _ = hub.apply(variables, x)
    assert logits.shape == (2, 4)


def test_convvit_ecdp_paths(rng):
    from eventpretrain_tpu.models.convvit_ecdp import ConvViTECDP
    from eventpretrain_tpu.ops import random_masking

    model = ConvViTECDP(
        input_size=64, patch_sizes=(4, 2, 2), embed_dims=(16, 24, 32),
        depths=(1, 1, 2), num_heads=4, num_bins=2,
    )
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 2)), jnp.float32)
    ids_keep, mask, _ = random_masking(jax.random.key(0), 2, 16, 0.75)
    variables = model.init(
        jax.random.key(1), x, ids_keep, mask=mask, method=model.encode_masked
    )
    ev, im, _ = model.apply(
        variables, x, ids_keep, mask=mask, method=model.encode_masked
    )
    assert ev.shape == (2, 32) and im.shape == (2, 32)
    dvars = model.init(jax.random.key(2), x)
    emb, _, _ = model.apply(dvars, x)
    assert emb.shape == (2, 64)
