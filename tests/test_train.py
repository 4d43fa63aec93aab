"""Train-stack tests: optimizer semantics, sharded steps, loss decreases."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from eventpretrain_tpu.models.pretrain_hub import PrHub
from eventpretrain_tpu.models.vit import ViT
from eventpretrain_tpu.models.decoder import RecDecoder
from eventpretrain_tpu.train import (
    cosine_warmup_schedule,
    build_optimizer,
    layer_scale_tree,
    weight_decay_mask,
    frozen_except_norm_mask,
    TrainState,
)
from eventpretrain_tpu.train.steps import make_rec_step, make_con_step
from eventpretrain_tpu.parallel import make_mesh, shard_batch, replicate


def tiny_hub(with_decoder=True):
    backbone = ViT(
        input_size=32, patch_size=8, embed_dim=48, depth=4, num_heads=4,
        num_bins=5, out_indices=(1, 3), name="backbone",
    )
    decoder = (
        RecDecoder(
            patch_size=8, num_patches=16, embed_dim=32, depth=2, num_heads=4,
            frame_chans=1, name="pretrain_rec_decoder",
        )
        if with_decoder
        else None
    )
    return PrHub(
        backbone=backbone, decoder=decoder, embed_dim=48, num_patches=16,
        mlp_dim=64, clip_emb_dim=24,
    )


class TestSchedule:
    def test_warmup_then_cosine(self):
        sched = cosine_warmup_schedule(1e-3, 1e-5, 5, 100, 10)
        assert float(sched(0)) == 0.0
        np.testing.assert_allclose(float(sched(25)), 1e-3 * 2.5 / 5)
        np.testing.assert_allclose(float(sched(50)), 1e-3, rtol=1e-6)
        # end of schedule hits min_lr
        np.testing.assert_allclose(float(sched(1000)), 1e-5, rtol=1e-4)
        # midpoint of cosine
        np.testing.assert_allclose(
            float(sched((5 + (100 - 5) / 2) * 10)),
            1e-5 + (1e-3 - 1e-5) * 0.5,
            rtol=1e-5,
        )


class TestLayerDecay:
    def test_scales_by_depth(self):
        params = {
            "backbone": {
                "patch_embed": {"proj": {"kernel": jnp.ones((2, 2))}},
                "vit_block_0": {"attn": {"qkv": {"kernel": jnp.ones((2, 2))}}},
                "vit_block_3": {"attn": {"qkv": {"kernel": jnp.ones((2, 2))}}},
                "norm_layer": {"scale": jnp.ones((2,))},
            },
            "head": {"kernel": jnp.ones((2, 2))},
        }
        scales = layer_scale_tree(params, num_layers=4, layer_decay=0.5)
        assert scales["backbone"]["patch_embed"]["proj"]["kernel"] == 0.5 ** 4
        assert scales["backbone"]["vit_block_0"]["attn"]["qkv"]["kernel"] == 0.5 ** 3
        assert scales["backbone"]["vit_block_3"]["attn"]["qkv"]["kernel"] == 0.5 ** 0
        assert scales["head"]["kernel"] == 1.0
        grafted = layer_scale_tree(params, 4, layer_grafted=True)
        assert grafted["backbone"]["vit_block_0"]["attn"]["qkv"]["kernel"] == 0.01
        assert grafted["head"]["kernel"] == 1.0

    def test_convvit_swin_and_grafted_ids(self):
        """Golden ids vs reference lr_decay.py:77-106 mappings."""
        w = {"kernel": jnp.ones((2, 2))}
        params = {
            "backbone": {
                "patch_embed1": {"proj": w},
                "conv_block1_0": {"conv1": w},
                "conv_block2_0": {"conv1": w},
                "vit_block_0": {"attn": {"qkv": w}},
                "vit_block_10": {"attn": {"qkv": w}},
                "swin_block_1": {"attn": w},
            },
            "decoder": {"pred": w},
        }
        # convvit: num_layers = depth + 2; vit_block id + 3 (lr_decay.py:100)
        s = layer_scale_tree(
            params, num_layers=13, layer_decay=0.5, backbone_type="convvit"
        )
        b = s["backbone"]
        assert b["patch_embed1"]["proj"]["kernel"] == 0.5 ** 13
        assert b["conv_block1_0"]["conv1"]["kernel"] == 0.5 ** 12  # id 1
        assert b["conv_block2_0"]["conv1"]["kernel"] == 0.5 ** 11  # id 2
        assert b["vit_block_0"]["attn"]["qkv"]["kernel"] == 0.5 ** 10  # id 3
        assert b["vit_block_10"]["attn"]["qkv"]["kernel"] == 0.5 ** 0  # id 13
        assert s["decoder"]["pred"]["kernel"] == 1.0
        # swin blocks fall through to the top scale (lr_decay.py:104-106:
        # 'swin_block' never matches 'vit_block')
        assert b["swin_block_1"]["attn"]["kernel"] == 0.5 ** 0
        # grafted thirds: blocks 0-3 -> 0.01, 4-7 -> 0.1, 8+ -> 1; conv
        # stages -> 0.01; non-backbone -> 1 (lr_decay.py:80-92)
        g = layer_scale_tree(params, 12, layer_grafted=True)
        gb = g["backbone"]
        assert gb["conv_block1_0"]["conv1"]["kernel"] == 0.01
        assert gb["conv_block2_0"]["conv1"]["kernel"] == 0.01
        assert gb["vit_block_0"]["attn"]["qkv"]["kernel"] == 0.01
        assert gb["vit_block_10"]["attn"]["qkv"]["kernel"] == 1.0
        assert g["decoder"]["pred"]["kernel"] == 1.0

    def test_weight_decay_mask(self):
        params = {"w": jnp.ones((2, 2)), "b": jnp.ones((2,))}
        mask = weight_decay_mask(params)
        assert bool(mask["w"]) and not bool(mask["b"])

    def test_frozen_except_norm(self):
        params = {
            "backbone": {
                "vit_block_0": {"norm1": {"scale": jnp.ones(2)}},
                "norm_layer": {"scale": jnp.ones(2)},
            },
            "emb_h_proj": {"fc0": {"kernel": jnp.ones((2, 2))}},
        }
        mask = frozen_except_norm_mask(params)
        assert not mask["backbone"]["vit_block_0"]["norm1"]["scale"]
        assert mask["backbone"]["norm_layer"]["scale"]
        assert mask["emb_h_proj"]["fc0"]["kernel"]

    def test_frozen_params_do_not_move(self):
        params = {
            "backbone": {"vit_block_0": {"w": jnp.ones((2, 2))}},
            "head": {"w": jnp.ones((2, 2))},
        }
        tx = build_optimizer(
            params,
            learning_rate=0.1,
            weight_decay=0.0,
            trainable_mask=frozen_except_norm_mask(params),
        )
        opt_state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, opt_state, params)
        assert float(jnp.abs(updates["backbone"]["vit_block_0"]["w"]).sum()) == 0
        assert float(jnp.abs(updates["head"]["w"]).sum()) > 0


class TestRecStep:
    def _setup(self):
        hub = tiny_hub()
        rng = np.random.default_rng(0)
        evg = jnp.asarray(rng.normal(size=(8, 32, 32, 5)), jnp.float32)
        frame = jnp.asarray(rng.normal(size=(8, 32, 32, 1)), jnp.float32)
        variables = hub.init(
            jax.random.key(0),
            evg,
            jnp.arange(4)[None].repeat(8, 0),
            jnp.arange(16)[None].repeat(8, 0),
            method=hub.forward_rec,
        )
        tx = build_optimizer(
            variables["params"], learning_rate=1e-3, num_layers=4
        )
        state = TrainState.create(
            apply_fn=hub.apply, params=variables["params"], tx=tx
        )
        step = make_rec_step(
            hub, patch_size=8, num_patches=16, mask_ratio=0.75
        )
        return step, state, {"evg": evg, "frame": frame}

    def test_loss_decreases(self):
        step, state, batch = self._setup()
        key = jax.random.key(0)
        first = None
        for i in range(20):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first
        assert int(state.step) == 20

    def test_sharded_step_runs(self, devices):
        step, state, batch = self._setup()
        mesh = make_mesh(devices)
        state = replicate(mesh, state)
        batch = shard_batch(mesh, batch)
        state, metrics = step(state, batch, jax.random.key(1))
        assert bool(jnp.isfinite(metrics["loss"]))
        # params remain replicated after the update
        p = jax.tree.leaves(state.params)[0]
        assert p.sharding.is_fully_replicated


class TestConStep:
    def test_queue_and_global_modes(self):
        hub = tiny_hub(with_decoder=False)
        rng = np.random.default_rng(0)
        evg = jnp.asarray(rng.normal(size=(4, 32, 32, 5)), jnp.float32)
        clip_emb = jnp.asarray(rng.normal(size=(4, 17, 24)), jnp.float32)
        variables = hub.init(
            jax.random.key(0), evg, clip_emb, method=hub.forward_con
        )
        from eventpretrain_tpu.objectives import init_queue

        for use_queue in (False, True):
            tx = build_optimizer(
                variables["params"], learning_rate=1e-3, num_layers=4
            )
            queue = (
                init_queue(jax.random.key(1), 48, 16, 16) if use_queue else None
            )
            state = TrainState.create(
                apply_fn=hub.apply,
                # copy: steps donate their input state buffers
                params=jax.tree.map(jnp.copy, variables["params"]),
                batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
                tx=tx,
                queue=queue,
            )
            step = make_con_step(hub, use_queue=use_queue)
            batch = {"evg": evg, "clip_emb": clip_emb}
            key = jax.random.key(2)
            losses = []
            for _ in range(5):
                key, sub = jax.random.split(key)
                state, metrics = step(state, batch, sub)
                losses.append(float(metrics["loss"]))
            assert all(np.isfinite(losses))
            if use_queue:
                assert int(state.queue.ptr) == (5 * 4) % 16

    def test_stage2_freeze_only_norms_move(self):
        hub = tiny_hub(with_decoder=False)
        rng = np.random.default_rng(0)
        evg = jnp.asarray(rng.normal(size=(4, 32, 32, 5)), jnp.float32)
        clip_emb = jnp.asarray(rng.normal(size=(4, 17, 24)), jnp.float32)
        variables = hub.init(
            jax.random.key(0), evg, clip_emb, method=hub.forward_con
        )
        params0 = variables["params"]
        tx = build_optimizer(
            params0,
            learning_rate=1e-2,
            num_layers=4,
            trainable_mask=frozen_except_norm_mask(params0),
        )
        state = TrainState.create(
            apply_fn=hub.apply,
            # copy: the step donates its input state buffers
            params=jax.tree.map(jnp.copy, params0),
            batch_stats=variables["batch_stats"], tx=tx,
        )
        step = make_con_step(hub, use_queue=False)
        state, _ = step(state, {"evg": evg, "clip_emb": clip_emb}, jax.random.key(3))
        # backbone block weights frozen; backbone final norm + heads move
        w0 = params0["backbone"]["vit_block_0"]["attn"]["qkv"]["kernel"]
        w1 = state.params["backbone"]["vit_block_0"]["attn"]["qkv"]["kernel"]
        np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))
        n0 = params0["backbone"]["norm_layer"]["scale"]
        n1 = state.params["backbone"]["norm_layer"]["scale"]
        assert not np.allclose(np.asarray(n0), np.asarray(n1))
        h0 = params0["emb_h_proj"]["fc0"]["kernel"]
        h1 = state.params["emb_h_proj"]["fc0"]["kernel"]
        assert not np.allclose(np.asarray(h0), np.asarray(h1))

    def test_partitioned_grad_matches_masked_optimizer(self):
        """The adj-phase fast path (trainable_mask on make_con_step: the
        frozen trunk's backward is never built) must produce the SAME new
        params as the slow path (full backward + optax.masked set_to_zero).
        The only intended difference is the grad_norm metric, which drops
        frozen params — matching torch's norm over p.grad is not None."""
        hub = tiny_hub(with_decoder=False)
        rng = np.random.default_rng(1)
        evg = jnp.asarray(rng.normal(size=(4, 32, 32, 5)), jnp.float32)
        clip_emb = jnp.asarray(rng.normal(size=(4, 17, 24)), jnp.float32)
        variables = hub.init(
            jax.random.key(0), evg, clip_emb, method=hub.forward_con
        )
        params0 = variables["params"]
        mask = frozen_except_norm_mask(params0)
        batch = {"evg": evg, "clip_emb": clip_emb}

        def run(step):
            tx = build_optimizer(
                params0, learning_rate=1e-2, num_layers=4,
                trainable_mask=mask,
            )
            state = TrainState.create(
                apply_fn=hub.apply,
                params=jax.tree.map(jnp.copy, params0),
                batch_stats=jax.tree.map(
                    jnp.copy, variables["batch_stats"]
                ),
                tx=tx,
            )
            state, metrics = step(state, batch, jax.random.key(3))
            return state, metrics

        s_slow, m_slow = run(make_con_step(hub, use_queue=False))
        s_fast, m_fast = run(
            make_con_step(hub, use_queue=False, trainable_mask=mask)
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            ),
            s_slow.params, s_fast.params,
        )
        np.testing.assert_allclose(
            float(m_slow["loss"]), float(m_fast["loss"]), rtol=1e-6
        )
        # trainable-only norm is strictly smaller than the full-tree norm
        assert float(m_fast["grad_norm"]) < float(m_slow["grad_norm"])


def test_prefetcher_order_and_errors():
    from eventpretrain_tpu.data.prefetch import Prefetcher

    assert list(Prefetcher(range(10))) == list(range(10))

    def gen():
        yield 1
        raise ValueError("boom")

    import pytest as _pytest

    with _pytest.raises(ValueError):
        list(Prefetcher(gen()))


def test_training_is_deterministic():
    # same seeds -> identical losses across two fresh runs (the reference only
    # pins global seeds; here determinism is structural via explicit keys)
    def run():
        hub = tiny_hub()
        rng = np.random.default_rng(0)
        evg = jnp.asarray(rng.normal(size=(4, 32, 32, 5)), jnp.float32)
        frame = jnp.asarray(rng.normal(size=(4, 32, 32, 1)), jnp.float32)
        variables = hub.init(
            jax.random.key(0), evg,
            jnp.arange(4)[None].repeat(4, 0),
            jnp.arange(16)[None].repeat(4, 0),
            method=hub.forward_rec,
        )
        tx = build_optimizer(variables["params"], learning_rate=1e-3,
                             num_layers=4)
        state = TrainState.create(
            apply_fn=hub.apply, params=variables["params"], tx=tx
        )
        step = make_rec_step(hub, patch_size=8, num_patches=16,
                             mask_ratio=0.75)
        losses = []
        key = jax.random.key(7)
        for _ in range(3):
            key, sub = jax.random.split(key)
            state, metrics = step(state, {"evg": evg, "frame": frame}, sub)
            losses.append(float(metrics["loss"]))
        return losses

    np.testing.assert_allclose(run(), run(), rtol=0, atol=0)


def test_host_sharded_source():
    from eventpretrain_tpu.parallel import HostShardedSource

    class Src:
        def __len__(self):
            return 10

        def load(self, i):
            return i

    a = HostShardedSource(Src(), 0, 2)
    b = HostShardedSource(Src(), 1, 2)
    assert len(a) == len(b) == 5
    assert [a.load(i) for i in range(5)] == [0, 2, 4, 6, 8]
    assert [b.load(i) for i in range(5)] == [1, 3, 5, 7, 9]
