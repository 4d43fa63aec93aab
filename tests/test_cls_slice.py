"""End-to-end classification slice: pipeline -> model -> train -> eval.

The minimum-slice integration test (SURVEY §7 step 4): synthetic
oriented-motion events, tiny ViT, must learn above chance within one epoch.
"""

import jax
import jax.numpy as jnp
import numpy as np

from eventpretrain_tpu.data.cls_pipeline import (
    ClsDataConfig,
    ClsPipeline,
    SyntheticClsSource,
)
from eventpretrain_tpu.models.cls_hub import FtClsHub
from eventpretrain_tpu.models.vit import ViT
from eventpretrain_tpu.train import build_optimizer, TrainState
from eventpretrain_tpu.train.steps import make_cls_train_step, make_cls_eval_step
from eventpretrain_tpu.train.loop import train_one_epoch, evaluate
from eventpretrain_tpu.eval.metrics import topk_accuracy


def small_cfg(num_bins=5):
    return ClsDataConfig(
        num_classes=2,
        num_bins=num_bins,
        input_size=32,
        fix_events_num=2048,
        val_fix_events_num=2048,
        canvas_height=100,
        canvas_width=120,
    )


def tiny_cls_hub(num_bins=5, num_classes=2):
    backbone = ViT(
        input_size=32, patch_size=8, embed_dim=48, depth=2, num_heads=4,
        num_bins=num_bins, out_indices=(0, 1), masked_taps=(0, 1),
        dense_taps=(0, 1), name="backbone",
    )
    return FtClsHub(backbone=backbone, num_classes=num_classes)


class TestPipeline:
    def test_batches_have_expected_shapes(self):
        cfg = small_cfg()
        src = SyntheticClsSource(num_classes=2, samples_per_class=8)
        pipe = ClsPipeline(src, cfg, batch_size=4, train=True, seed=0)
        batches = list(pipe)
        assert len(batches) == 4
        for b in batches:
            assert b["evg"].shape == (4, 32, 32, 5)
            assert b["label"].shape == (4,)
            assert bool(jnp.isfinite(b["evg"]).all())

    def test_representation_modes(self):
        for num_bins, chans in ((2, 2), (3, 3), (5, 5)):
            cfg = small_cfg(num_bins)
            src = SyntheticClsSource(num_classes=2, samples_per_class=2)
            pipe = ClsPipeline(src, cfg, batch_size=4, train=False, seed=0)
            batch = next(iter(pipe))
            assert batch["evg"].shape == (4, 32, 32, chans)
            if num_bins == 2:
                # (x/(amax+1) - 0.5)*2 in [-1, 1]
                assert float(batch["evg"].min()) >= -1.0
                assert float(batch["evg"].max()) <= 1.0
            if num_bins == 3:
                assert float(batch["evg"][..., 0::2].max()) <= 1.0 + 1e-6
                assert float(jnp.abs(batch["evg"][..., 1]).max()) == 0.0

    def test_val_is_deterministic(self):
        # with streams shorter than the window cap the val path draws no
        # randomness (the reference's val window is random when streams are
        # longer, events_augment.py:5-20 — same here)
        cfg = small_cfg()
        src = SyntheticClsSource(
            num_classes=2, samples_per_class=4, num_events=2000
        )
        a = list(ClsPipeline(src, cfg, batch_size=4, train=False, seed=0))
        b = list(ClsPipeline(src, cfg, batch_size=4, train=False, seed=5))
        for x, y in zip(a, b):
            np.testing.assert_allclose(
                np.asarray(x["evg"]), np.asarray(y["evg"]), atol=1e-6
            )


class TestEndToEnd:
    def test_learns_above_chance(self):
        cfg = small_cfg()
        src = SyntheticClsSource(num_classes=2, samples_per_class=24, seed=0)
        val_src = SyntheticClsSource(num_classes=2, samples_per_class=8, seed=99)
        hub = tiny_cls_hub()
        variables = hub.init(jax.random.key(0), jnp.zeros((1, 32, 32, 5)))
        tx = build_optimizer(
            variables["params"], learning_rate=1e-3, num_layers=2,
            clip_grad=5.0,
        )
        state = TrainState.create(
            apply_fn=hub.apply, params=variables["params"], tx=tx
        )
        train_step = make_cls_train_step(hub, smoothing=0.1)
        eval_step = make_cls_eval_step(hub)

        key = jax.random.key(0)
        for epoch in range(3):
            pipe = ClsPipeline(src, cfg, batch_size=8, train=True, seed=epoch)
            state, train_metrics = train_one_epoch(
                step=train_step, state=state, pipeline=pipe,
                rng_key=jax.random.fold_in(key, epoch),
                epoch=epoch, print_freq=100,
            )
        val_pipe = ClsPipeline(val_src, cfg, batch_size=8, train=False)
        val_metrics = evaluate(eval_step, state, val_pipe)
        assert val_metrics["acc1"] > 75.0, val_metrics
        assert int(state.step) == 3 * 6


def test_topk_accuracy():
    logits = jnp.asarray(
        [[5.0, 1.0, 0.0], [0.0, 5.0, 1.0], [0.0, 1.0, 5.0], [5.0, 1.0, 0.0]]
    )
    labels = jnp.asarray([0, 1, 2, 1])
    m = topk_accuracy(logits, labels, topk=(1, 2))
    np.testing.assert_allclose(float(m["acc1"]), 75.0)
    np.testing.assert_allclose(float(m["acc2"]), 100.0)
