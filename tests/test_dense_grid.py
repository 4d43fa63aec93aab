"""Baseline-backbone grid for downstream tasks (VERDICT round-1 item 2).

The reference finetunes semseg/flow on vit_ecdp / convvit_ecdp / vit_mem /
swin_ecddp too (reference ft_dense_hub_model.py:108-237, forward branches
:249-270) and classifies with convvit_ecdp (ft_cls_hub_model.py:143-177).
These tests init + one-train-step every family through the same FtDenseHub /
FtClsHub used by the CLIs, at tiny shapes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eventpretrain_tpu.models.dense_hub import FtDenseHub
from eventpretrain_tpu.models.cls_hub import FtClsHub
from eventpretrain_tpu.train import build_optimizer, TrainState
from eventpretrain_tpu.train.steps import (
    make_semseg_train_step,
    make_semseg_eval_step,
    make_flow_train_step,
    make_cls_train_step,
)


def tiny_backbone(family):
    if family == "vit_ecdp":
        from eventpretrain_tpu.models.vit_ecdp import ViTECDP

        return ViTECDP(
            input_size=32, patch_size=8, embed_dim=32, depth=4, num_heads=2,
            out_indices=(0, 1, 2, 3), num_bins=2, name="backbone",
        ), 2, (32, 32, 32, 32)
    if family == "convvit_ecdp":
        from eventpretrain_tpu.models.convvit_ecdp import ConvViTECDP

        return ConvViTECDP(
            input_size=32, patch_sizes=(2, 2, 2), embed_dims=(8, 16, 32),
            depths=(1, 1, 4), num_heads=2, out_indices=(0, 1, 2, 3),
            num_bins=2, name="backbone",
        ), 2, (32, 32, 32, 32)
    if family == "vit_mem":
        from eventpretrain_tpu.models.vit_mem import ViTMEM

        return ViTMEM(
            input_size=32, patch_size=8, embed_dim=32, depth=4, num_heads=2,
            out_indices=(0, 1, 2, 3), num_bins=3, name="backbone",
        ), 3, (32, 32, 32, 32)
    if family == "swin_ecddp":
        from eventpretrain_tpu.models.swin_ecddp import SwinECDDP

        return SwinECDDP(
            input_size=32, patch_size=4, embed_dims=(8, 16, 32, 64),
            depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2), window_size=4,
            num_bins=5, name="backbone",
        ), 5, (8, 16, 32, 64)
    raise ValueError(family)


FAMILIES = ["vit_ecdp", "convvit_ecdp", "vit_mem", "swin_ecddp"]


@pytest.mark.parametrize("family", FAMILIES)
def test_dense_hub_semseg_step(family, rng):
    backbone, num_bins, in_ch = tiny_backbone(family)
    hub = FtDenseHub(
        backbone=backbone, num_classes=6, decode_in_channels=in_ch,
        decode_channels=16, aux_channels=8,
    )
    evg = jnp.asarray(rng.normal(size=(2, 32, 32, num_bins)), jnp.float32)
    label = jnp.asarray(rng.integers(0, 6, (2, 32, 32)), jnp.int32)
    variables = hub.init(jax.random.key(0), evg)
    emb_h, out_embs, decode, aux = hub.apply(variables, evg)
    assert len(out_embs) == 4
    assert decode.shape[0] == 2 and decode.shape[-1] == 6
    assert aux.shape[-1] == 6
    tx = build_optimizer(variables["params"], learning_rate=1e-3,
                         num_layers=4, backbone_type=family)
    state = TrainState.create(
        apply_fn=hub.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=tx,
    )
    step = make_semseg_train_step(hub, num_classes=6)
    state, metrics = step(state, {"evg": evg, "label": label},
                          jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    conf = make_semseg_eval_step(hub, num_classes=6)(
        state, {"evg": evg, "label": label}
    )
    assert int(conf.sum()) == 2 * 32 * 32


@pytest.mark.parametrize("family", ["vit_ecdp", "swin_ecddp"])
def test_dense_hub_flow_step(family, rng):
    backbone, num_bins, in_ch = tiny_backbone(family)
    hub = FtDenseHub(
        backbone=backbone, num_classes=2, decode_in_channels=in_ch,
        decode_channels=16, aux_channels=8,
    )
    evg = jnp.asarray(rng.normal(size=(2, 32, 32, num_bins)), jnp.float32)
    flow = jnp.asarray(rng.normal(size=(2, 32, 32, 2)), jnp.float32)
    valid = jnp.ones((2, 32, 32), jnp.float32)
    variables = hub.init(jax.random.key(0), evg)
    tx = build_optimizer(variables["params"], learning_rate=1e-3,
                         num_layers=4, backbone_type=family)
    state = TrainState.create(
        apply_fn=hub.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=tx,
    )
    step = make_flow_train_step(hub)
    state, metrics = step(state, {"evg": evg, "flow": flow, "valid": valid},
                          jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))


def test_cls_hub_convvit_ecdp_token_concat(rng):
    """convvit_ecdp cls head sees concat(event, image) tokens: the head's
    input dim is 2*embed_dim (reference ft_cls_hub_model.py:143-177)."""
    backbone, num_bins, _ = tiny_backbone("convvit_ecdp")
    hub = FtClsHub(backbone=backbone, num_classes=7)
    evg = jnp.asarray(rng.normal(size=(2, 32, 32, num_bins)), jnp.float32)
    variables = hub.init(jax.random.key(0), evg)
    emb, logits, _ = hub.apply(variables, evg)
    assert logits.shape == (2, 7)
    assert emb.shape == (2, 64)  # 2 * embed_dim=32
    head_kernel = variables["params"]["classify_head"]["kernel"]
    assert head_kernel.shape == (64, 7)
    # and it trains through the shared cls step
    tx = build_optimizer(variables["params"], learning_rate=1e-3,
                         num_layers=4, backbone_type="convvit_ecdp")
    state = TrainState.create(apply_fn=hub.apply, params=variables["params"],
                              tx=tx)
    step = make_cls_train_step(hub)
    label = jnp.asarray(rng.integers(0, 7, (2,)), jnp.int32)
    state, metrics = step(state, {"evg": evg, "label": label},
                          jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))


def test_vit_mem_pools_before_norm(rng):
    """Parity fix: reference vit_mem.py:83-84 mean-pools patch tokens THEN
    applies the final LayerNorm; norm(mean(x)) != mean(norm(x))."""
    from eventpretrain_tpu.models.vit_mem import ViTMEM

    model = ViTMEM(input_size=32, patch_size=8, embed_dim=32, depth=2,
                   num_heads=2, num_bins=3)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, method=model.encode_dense)
    emb, out_embs, _ = model.apply(variables, x, method=model.encode_dense)
    g = variables["params"]["norm_layer"]["scale"]
    b = variables["params"]["norm_layer"]["bias"]
    # emb must be an exact LayerNorm output of SOMETHING pooled: check the
    # LN invariant (per-row mean==bias-mean contribution) instead of
    # re-running the trunk: mean(emb - b) ~ 0 and std governed by g
    centered = (emb - b[None]) / g[None]
    np.testing.assert_allclose(np.asarray(centered.mean(-1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray((centered ** 2).mean(-1)), 1.0, atol=1e-3
    )


def test_cli_grids_cover_all_backbones():
    from eventpretrain_tpu.cli.finetune_semseg import BACKBONES, HUBS

    for b in BACKBONES:
        assert (b, "small") in HUBS, b
    assert set(BACKBONES) == {
        "vit", "convvit", "swin", "vit_ecdp", "convvit_ecdp", "vit_mem",
        "swin_ecddp",
    }
