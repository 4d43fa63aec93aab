"""Regression tests for the whole-round review fixes:

1. Orbax checkpointing of ECDP tuple-of-queue states (and the MoCo queue).
2. Positional dropout with drop_rate > 0 initializes and runs.
3. Flow eval derives a sparse event-presence mask from the input voxels.
4. ECDP pipeline draws q/k from independent source loads.
5. Eval tail-batch wrap does not double-count the wrapped samples.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


class TestQueueCheckpoint:
    def test_ecdp_queue_tuple_roundtrip(self, tmp_path):
        import optax

        from eventpretrain_tpu.ckpt.orbax_io import (
            restore_checkpoint, save_checkpoint,
        )
        from eventpretrain_tpu.objectives.ecdp import init_sample_queue
        from eventpretrain_tpu.train.state import TrainState

        params = {"w": jnp.ones((4, 4))}
        tx = optax.sgd(0.1)
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        queues = tuple(init_sample_queue(k, 8, 16) for k in keys)
        state = TrainState.create(
            apply_fn=lambda *a, **k: None, params=params, tx=tx,
            queue=queues,
        )
        state = state.replace(
            queue=(
                queues[0]._replace(ptr=jnp.asarray(5, jnp.int32)),
                queues[1],
            )
        )
        save_checkpoint(str(tmp_path), state)

        fresh = TrainState.create(
            apply_fn=lambda *a, **k: None,
            params=jax.tree.map(jnp.zeros_like, params), tx=tx,
            queue=tuple(init_sample_queue(k, 8, 16)
                        for k in jax.random.split(jax.random.PRNGKey(9), 2)),
        )
        restored = restore_checkpoint(str(tmp_path), fresh)
        assert isinstance(restored.queue, tuple) and len(restored.queue) == 2
        assert int(restored.queue[0].ptr) == 5
        np.testing.assert_allclose(
            np.asarray(restored.queue[0].buffer),
            np.asarray(state.queue[0].buffer),
        )
        np.testing.assert_allclose(
            np.asarray(restored.params["w"]), np.ones((4, 4))
        )


class TestPosDropout:
    @pytest.mark.parametrize("model_name", ["vit", "vit_ecdp"])
    def test_drop_rate_runs(self, model_name):
        if model_name == "vit":
            from eventpretrain_tpu.models.vit import ViT

            m = ViT(input_size=32, patch_size=16, embed_dim=32, depth=2,
                    num_heads=2, num_bins=5, drop_rate=0.1,
                    masked_taps=(0, 1), dense_taps=(0, 1),
                    out_indices=(0, 1))
            x = jnp.ones((2, 32, 32, 5))
        else:
            from eventpretrain_tpu.models.vit_ecdp import ViTECDP

            m = ViTECDP(input_size=32, patch_size=16, embed_dim=32, depth=2,
                        num_heads=2, num_bins=2, drop_rate=0.1,
                        out_indices=(0, 1))
            x = jnp.ones((2, 32, 32, 2))
        variables = m.init(jax.random.PRNGKey(0), x, deterministic=True)
        # non-deterministic apply exercises the dropout RNG path
        out = m.apply(
            variables, x, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        leaves = jax.tree.leaves(out)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves if
                   hasattr(l, "dtype"))


class TestEvalTailWeighting:
    def test_cls_eval_weights_out_padding(self):
        from eventpretrain_tpu.eval.metrics import topk_accuracy

        logits = jnp.asarray([
            [5.0, 0.0], [5.0, 0.0], [0.0, 5.0], [0.0, 5.0],
        ])
        labels = jnp.asarray([0, 0, 0, 0])
        full = topk_accuracy(logits, labels, topk=(1,))
        assert float(full["acc1"]) == 50.0
        w = jnp.asarray([1.0, 1.0, 0.0, 0.0])  # last two are pads
        masked = topk_accuracy(logits, labels, topk=(1,), weights=w)
        assert float(masked["acc1"]) == 100.0

    def test_confusion_matrix_valid_mask(self):
        from eventpretrain_tpu.eval.metrics import confusion_matrix

        pred = jnp.zeros((2, 2, 2), jnp.int32)
        target = jnp.zeros((2, 2, 2), jnp.int32)
        valid = jnp.asarray([True, False])[:, None, None]
        conf = confusion_matrix(pred, target, 2, valid=valid)
        assert int(conf[0, 0]) == 4  # only the first sample's 4 pixels

    def test_evaluate_weights_by_reported_n(self):
        from eventpretrain_tpu.train.loop import evaluate

        batches = [{"v": 1.0, "n": 4}, {"v": 0.0, "n": 1}]

        def eval_step(state, batch):
            return {"metric": jnp.asarray(batch["v"]),
                    "_n": jnp.asarray(batch["n"])}

        out = evaluate(eval_step, None, batches)
        assert out["metric"] == pytest.approx(4.0 / 5.0)

    def test_cls_pipeline_tail_num_valid(self):
        from eventpretrain_tpu.data.cls_pipeline import (
            ClsDataConfig, ClsPipeline, SyntheticClsSource,
        )

        src = SyntheticClsSource(num_classes=1, samples_per_class=5)
        cfg = ClsDataConfig(num_classes=2, num_bins=5, input_size=32,
                            canvas_height=48, canvas_width=48,
                            fix_events_num=256, val_fix_events_num=256)
        pipe = ClsPipeline(src, cfg, batch_size=4, train=False,
                           drop_last=False)
        batches = list(pipe)
        assert len(batches) == 2
        assert int(batches[0]["num_valid"]) == 4
        assert int(batches[1]["num_valid"]) == 1
        assert batches[1]["evg"].shape[0] == 4  # still statically padded


class TestEcdpIndependentViews:
    def test_qk_draw_independent_loads(self):
        from eventpretrain_tpu.data.pretrain_pipeline import (
            EcdpPretrainPipeline, PretrainDataConfig,
        )

        class CountingSource:
            """Returns a distinct constant grid per load call."""

            def __init__(self):
                self.calls = 0

            def __len__(self):
                return 4

            def load(self, index):
                self.calls += 1
                evg = np.full((32, 32, 2), float(self.calls), np.float32)
                return {"evg": evg,
                        "clip_emb": np.zeros((512,), np.float32)}

        src = CountingSource()
        cfg = PretrainDataConfig(num_bins=2, input_size=32)
        pipe = EcdpPretrainPipeline(src, cfg, batch_size=2, train=False)
        batch = next(iter(pipe))
        # 2 samples x 2 views = 4 loads; eval path has identity geometry so
        # the normalized views differ iff the underlying loads differ
        assert src.calls == 4
        assert not np.allclose(np.asarray(batch["img_q"]),
                               np.asarray(batch["img_k"]))


class TestMemRelPosFallback:
    def test_shared_table_fills_any_depth(self):
        import torch

        from eventpretrain_tpu.ckpt.torch_import import import_torch_params
        from eventpretrain_tpu.models.vit_mem import ViTMEM

        m = ViTMEM(input_size=32, patch_size=16, embed_dim=32, depth=2,
                   num_heads=2, num_bins=2)
        params = m.init(
            jax.random.key(0), jnp.ones((1, 32, 32, 2)), deterministic=True
        )["params"]
        num_rel = (2 * 2 - 1) ** 2 + 3  # grid 2
        sd = {"backbone.rel_pos_bias.relative_position_bias_table":
              torch.arange(num_rel * 2, dtype=torch.float32)
              .reshape(num_rel, 2)}
        new, missing, _ = import_torch_params(
            sd, params, prefix="backbone.", verbose=False
        )
        assert not [k for k in missing if "relative_position" in k]
        for blk in ("vit_block_0", "vit_block_1"):
            got = np.asarray(
                new[blk]["attn"]["relative_position_bias_table"]
            )
            np.testing.assert_allclose(got[:, 0], np.arange(num_rel) * 2)


class TestFlowSparseMask:
    def test_mask_derived_from_input(self):
        from eventpretrain_tpu.train.steps import make_flow_eval_step
        from eventpretrain_tpu.train.state import TrainState
        import optax

        class TinyFlow:
            def apply(self, variables, x, train=False):
                b, h, w, _ = x.shape
                return None, None, jnp.zeros((b, h, w, 2)), None

        hub = TinyFlow()
        state = TrainState.create(
            apply_fn=hub.apply, params={"w": jnp.zeros(())},
            tx=optax.sgd(0.1),
        )
        step = make_flow_eval_step(hub)
        b, h, w = 1, 8, 8
        evg = jnp.zeros((b, h, w, 5)).at[0, :4].set(1.0)  # top half active
        flow = jnp.ones((b, h, w, 2))  # epe = sqrt(2) everywhere
        valid = jnp.ones((b, h, w))
        out = step(state, {"evg": evg, "flow": flow, "valid": valid})
        # only the 4*8=32 event-active pixels should count
        assert int(out["count"]) == 32
        assert float(out["epe_sum"]) == pytest.approx(32 * np.sqrt(2), rel=1e-5)
