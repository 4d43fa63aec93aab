"""Dense downstream tests: heads, hub, semseg/flow objectives + steps."""

import numpy as np
import jax
import jax.numpy as jnp

from eventpretrain_tpu.models.dense_heads import (
    adaptive_avg_pool,
    UPerHead,
    FCNHead,
)
from eventpretrain_tpu.models.dense_hub import FtDenseHub
from eventpretrain_tpu.models.convvit import ConvViT
from eventpretrain_tpu.objectives.semseg import (
    semseg_ce_loss,
    semseg_dice_loss,
)
from eventpretrain_tpu.objectives.flow import flow_l1_loss
from eventpretrain_tpu.eval.metrics import (
    confusion_matrix,
    miou_from_confusion,
    macc_from_confusion,
    flow_error,
)
from eventpretrain_tpu.train import build_optimizer, TrainState
from eventpretrain_tpu.train.steps import (
    make_semseg_train_step,
    make_semseg_eval_step,
    make_flow_train_step,
    make_flow_eval_step,
)


def test_adaptive_avg_pool_matches_torch_bins():
    # H=5 -> 3 bins: [0:2], [1:4], [3:5] (torch adaptive pooling semantics)
    x = jnp.arange(5.0).reshape(1, 5, 1, 1)
    out = adaptive_avg_pool(x, (3, 1))
    np.testing.assert_allclose(
        np.asarray(out[0, :, 0, 0]), [0.5, 2.0, 3.5]
    )


def test_uperhead_shapes(rng):
    inputs = [
        jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32),
        jnp.asarray(rng.normal(size=(2, 8, 8, 12)), jnp.float32),
        jnp.asarray(rng.normal(size=(2, 4, 4, 16)), jnp.float32),
        jnp.asarray(rng.normal(size=(2, 2, 2, 16)), jnp.float32),
    ]
    head = UPerHead(in_channels=(8, 12, 16, 16), channels=16, num_classes=11)
    variables = head.init(jax.random.key(0), inputs)
    out = head.apply(variables, inputs)
    assert out.shape == (2, 16, 16, 11)  # finest resolution


def test_fcnhead_shapes(rng):
    inputs = [jnp.zeros((2, 4, 4, 16))] * 4
    head = FCNHead(channels=8, num_classes=11, in_index=2)
    variables = head.init(jax.random.key(0), inputs)
    assert head.apply(variables, inputs).shape == (2, 4, 4, 11)


def tiny_dense_hub(num_classes):
    backbone = ConvViT(
        input_size=64, patch_sizes=(4, 2, 2), embed_dims=(16, 24, 32),
        depths=(1, 1, 2), num_heads=4, with_rec_decoders=False,
        with_fpn=True, name="backbone",
    )
    return FtDenseHub(
        backbone=backbone, num_classes=num_classes,
        decode_in_channels=(16, 24, 32, 32), decode_channels=16,
        aux_channels=8,
    )


class TestSemseg:
    def test_losses(self, rng):
        logits = jnp.asarray(rng.normal(size=(2, 8, 8, 5)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, 5, (2, 8, 8)), jnp.int32)
        ce = semseg_ce_loss(logits, labels, ignore_index=4)
        dice = semseg_dice_loss(logits, labels, 5, ignore_index=4)
        assert np.isfinite(float(ce)) and 0 < float(dice) < 5

    def test_perfect_prediction_low_loss(self):
        labels = jnp.asarray([[[0, 1], [2, 3]]], jnp.int32)
        logits = jax.nn.one_hot(labels, 4) * 100.0
        assert float(semseg_ce_loss(logits, labels)) < 1e-5

    def test_confusion_and_miou(self):
        pred = jnp.asarray([0, 0, 1, 1, 2])
        target = jnp.asarray([0, 1, 1, 1, 2])
        conf = confusion_matrix(pred, target, 3)
        assert int(conf[0, 0]) == 1 and int(conf[0, 1]) == 1
        assert int(conf[1, 1]) == 2 and int(conf[2, 2]) == 1
        miou = float(miou_from_confusion(conf))
        want = 100 * (1 / 2 + 2 / 3 + 1) / 3
        np.testing.assert_allclose(miou, want, rtol=1e-6)
        assert np.isfinite(float(macc_from_confusion(conf)))

    def test_train_and_eval_steps(self, rng):
        hub = tiny_dense_hub(num_classes=6)
        evg = jnp.asarray(rng.normal(size=(2, 64, 64, 5)), jnp.float32)
        label = jnp.asarray(rng.integers(0, 6, (2, 64, 64)), jnp.int32)
        variables = hub.init(jax.random.key(0), evg)
        tx = build_optimizer(variables["params"], learning_rate=1e-3,
                             num_layers=4, backbone_type="convvit")
        state = TrainState.create(
            apply_fn=hub.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}), tx=tx,
        )
        step = make_semseg_train_step(hub, num_classes=6)
        batch = {"evg": evg, "label": label}
        key = jax.random.key(1)
        first = None
        for _ in range(8):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first
        eval_step = make_semseg_eval_step(hub, num_classes=6)
        conf = eval_step(state, batch)
        assert conf.shape == (6, 6)
        assert int(conf.sum()) == 2 * 64 * 64


class TestFlow:
    def test_l1_loss_masks(self):
        pred = jnp.ones((1, 4, 4, 2))
        target = jnp.zeros((1, 4, 4, 2))
        valid = jnp.zeros((1, 4, 4)).at[0, 0, 0].set(1.0)
        loss = flow_l1_loss(pred, target, valid)
        np.testing.assert_allclose(float(loss), 1.0)
        # max_flow excludes huge targets
        target = target.at[0, 0, 0].set(1000.0)
        loss = flow_l1_loss(pred, target, valid, max_flow=400)
        np.testing.assert_allclose(float(loss), 0.0)

    def test_flow_error(self):
        pred = jnp.zeros((1, 2, 2, 2))
        target = jnp.ones((1, 2, 2, 2)) * 4  # epe = sqrt(32) > 3
        aee, outlier = flow_error(pred, target)
        np.testing.assert_allclose(float(aee), np.sqrt(32), rtol=1e-6)
        np.testing.assert_allclose(float(outlier), 100.0)

    def test_train_and_eval_steps(self, rng):
        hub = tiny_dense_hub(num_classes=2)
        evg = jnp.asarray(rng.normal(size=(2, 64, 64, 5)), jnp.float32)
        flow = jnp.asarray(rng.normal(size=(2, 64, 64, 2)), jnp.float32)
        valid = jnp.ones((2, 64, 64), jnp.float32)
        variables = hub.init(jax.random.key(0), evg)
        tx = build_optimizer(variables["params"], learning_rate=1e-3,
                             num_layers=4, backbone_type="convvit")
        state = TrainState.create(
            apply_fn=hub.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}), tx=tx,
        )
        step = make_flow_train_step(hub)
        batch = {"evg": evg, "flow": flow, "valid": valid}
        key = jax.random.key(1)
        first = None
        for _ in range(8):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first
        eval_step = make_flow_eval_step(hub)
        out = eval_step(state, batch)
        assert float(out["count"]) == 2 * 64 * 64
        assert np.isfinite(float(out["epe_sum"]))


def test_dice_matches_one_hot_loop_formula():
    """The vectorized dice (segment sums, no one-hot materialization) must
    equal the reference's explicit per-class one-hot formula
    (semseg_loss.py:48-112) to float precision."""
    import jax

    rng = np.random.default_rng(11)
    B, H, W, C = 2, 17, 23, 5
    logits = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, C, size=(B, H, W)), jnp.int32)
    # sprinkle ignore pixels
    labels = labels.at[0, :3, :3].set(255)

    def loop_dice(logits, labels, num_classes, ignore_index, smooth=1.0):
        keep = (labels != ignore_index).astype(jnp.float32)
        lm = jnp.where(keep > 0, labels, 0)
        one_hot = jax.nn.one_hot(lm, num_classes) * keep[..., None]
        probs = jax.nn.softmax(logits, axis=-1) * keep[..., None]
        total = 0.0
        for c in range(num_classes):
            if c == ignore_index:
                continue
            p = probs[..., c]
            t = one_hot[..., c]
            num = (p * t).sum() * 2 + smooth
            den = (p ** 2 + t ** 2).sum() + smooth
            total = total + (1 - num / den)
        return total / num_classes

    for ignore in (255, 4):
        got = float(semseg_dice_loss(logits, labels, C, ignore_index=ignore))
        want = float(loop_dice(logits, labels, C, ignore))
        assert abs(got - want) < 1e-6, (ignore, got, want)

    # no-ignore path
    labels2 = jnp.asarray(rng.integers(0, C, size=(B, H, W)), jnp.int32)
    got = float(semseg_dice_loss(logits, labels2, C))
    want = float(loop_dice(logits, labels2, C, ignore_index=-1))
    assert abs(got - want) < 1e-6


def test_ce_dense_matches_optax_and_handles_oob_ignore():
    """semseg_ce_loss computes the label logit densely (no gather): equal to
    optax on in-range labels, and FINITE for out-of-range ignore labels
    (e.g. 255) where the gather formulation produced nan*0=nan on CPU."""
    import jax
    import optax

    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(2, 9, 7, 5)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 5, size=(2, 9, 7)), jnp.int32)

    got = float(semseg_ce_loss(logits, labels))
    want = float(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    )
    assert abs(got - want) < 1e-6

    ga = jax.grad(lambda l: semseg_ce_loss(l, labels))(logits)
    gb = jax.grad(
        lambda l: optax.softmax_cross_entropy_with_integer_labels(
            l, labels
        ).mean()
    )(logits)
    assert float(jnp.abs(ga - gb).max()) < 1e-6

    # in-range ignore index: masked mean matches the masked optax mean
    ig = 4
    got = float(semseg_ce_loss(logits, labels, ig))
    keep = (labels != ig).astype(jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    want = float((ce * keep).sum() / keep.sum())
    assert abs(got - want) < 1e-6

    # out-of-range ignore label (DSEC's 255): finite loss and grads
    labels255 = labels.at[0, 0, :3].set(255)
    val = float(semseg_ce_loss(logits, labels255, 255))
    g = jax.grad(lambda l: semseg_ce_loss(l, labels255, 255))(logits)
    assert np.isfinite(val) and bool(jnp.isfinite(g).all())
    # ignored pixels contribute no gradient
    assert float(jnp.abs(g[0, 0, :3]).max()) == 0.0
