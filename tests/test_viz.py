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
