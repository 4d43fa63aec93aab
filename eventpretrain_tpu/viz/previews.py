"""Visualization primitives: event previews, flow color wheel, semseg colors.

Parity with reference visualize/visualize_utils/make_events_preview.py:7-124
(positive events red, negative blue on white; signed count-image handling)
and visualize/ft_flow_visualize.py:16-131 (Middlebury flow color wheel).
All inputs are channels-last numpy/jax arrays.
"""

from __future__ import annotations

import numpy as np


def _signed_sum(evg: np.ndarray) -> np.ndarray:
    """Per-pixel signed event sum of an (H, W, C) representation."""
    evg = np.asarray(evg, np.float64).copy()
    c = evg.shape[-1]
    if c not in (5, 6):
        if c == 2:       # ECDP [pos, neg]
            evg[..., 1] *= -1
        elif c == 3:     # MEM [pos, 0, neg]
            evg[..., 2] *= -1
        else:
            raise ValueError(f"unsupported channel count {c}")
    return evg.sum(axis=-1)


def make_events_preview(evg: np.ndarray) -> np.ndarray:
    """(H, W, C) -> (H, W, 3) uint8: pos red, neg blue on white
    (reference make_events_preview.py:7-57; channel order RGB here)."""
    s = _signed_sum(evg)
    frame = np.full(s.shape + (3,), 255, np.uint8)
    frame[s > 0] = [255, 0, 0]
    frame[s < 0] = [0, 0, 255]
    return frame


def make_events_preview_norm(evg: np.ndarray) -> np.ndarray:
    """Grayscale normalized preview (reference :59-77): positives mapped to
    [0.5, 1], negatives to [0, 0.5], zeros to 0.5."""
    s = np.asarray(evg, np.float64)
    if s.ndim == 3:
        s = s.sum(axis=-1)
    out = s.copy()
    pos = s >= 0
    neg = s <= 0
    if pos.any() and s[pos].max() > s[pos].min():
        out[pos] = (s[pos] - s[pos].min()) / (s[pos].max() - s[pos].min()) * 0.5 + 0.5
    elif pos.any():
        out[pos] = 0.5
    if neg.any() and s[neg].max() > s[neg].min():
        out[neg] = (s[neg] - s[neg].min()) / (s[neg].max() - s[neg].min()) * 0.5
    elif neg.any():
        out[neg] = 0.5
    out[s == 0] = 0.5
    return out


def make_events_preview_rgb_norm(evg: np.ndarray) -> np.ndarray:
    """Intensity-scaled red/blue preview (reference :79-124)."""
    s = _signed_sum(evg)
    norm = s.copy()
    pos = s >= 0
    neg = s <= 0
    if pos.any() and s[pos].max() > s[pos].min():
        norm[pos] = (s[pos] - s[pos].min()) / (s[pos].max() - s[pos].min())
    if neg.any() and s[neg].max() > s[neg].min():
        norm[neg] = (s[neg] - s[neg].min()) / (s[neg].max() - s[neg].min()) - 1
    norm[s == 0] = 0

    frame = np.full(s.shape + (3,), 255, np.uint8)
    p = norm > 0
    n = norm < 0
    frame[p, 0] = 255
    frame[p, 1] = (150 * (1 - norm[p])).astype(np.uint8)
    frame[p, 2] = (150 * (1 - norm[p])).astype(np.uint8)
    frame[n, 2] = 255
    frame[n, 0] = (150 * (1 + norm[n])).astype(np.uint8)
    frame[n, 1] = (150 * (1 + norm[n])).astype(np.uint8)
    return frame


def make_colorwheel() -> np.ndarray:
    """Middlebury color wheel (reference ft_flow_visualize.py:16-64)."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:RY, 0] = 255
    wheel[0:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col:col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col:col + YG, 1] = 255
    col += YG
    wheel[col:col + GC, 1] = 255
    wheel[col:col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col:col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col:col + CB, 2] = 255
    col += CB
    wheel[col:col + BM, 2] = 255
    wheel[col:col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col:col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col:col + MR, 0] = 255
    return wheel


def flow_uv_to_colors(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """(reference ft_flow_visualize.py:66-103)."""
    image = np.zeros(u.shape + (3,), np.uint8)
    wheel = make_colorwheel()
    ncols = wheel.shape[0]
    rad = np.sqrt(u ** 2 + v ** 2)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(np.int32)
    k1 = k0 + 1
    k1[k1 == ncols] = 0
    f = fk - k0
    for i in range(3):
        col0 = wheel[k0, i] / 255.0
        col1 = wheel[k1, i] / 255.0
        col = (1 - f) * col0 + f * col1
        idx = rad <= 1
        col[idx] = 1 - rad[idx] * (1 - col[idx])
        col[~idx] = col[~idx] * 0.75
        image[..., i] = np.floor(255 * col)
    return image


def flow_to_image(flow_uv: np.ndarray, clip_flow: float | None = None) -> np.ndarray:
    """(H, W, 2) -> (H, W, 3) uint8 (reference ft_flow_visualize.py:105-129)."""
    flow_uv = np.asarray(flow_uv, np.float64)
    assert flow_uv.ndim == 3 and flow_uv.shape[2] == 2
    if clip_flow is not None:
        flow_uv = np.clip(flow_uv, 0, clip_flow)
    u, v = flow_uv[..., 0], flow_uv[..., 1]
    rad_max = np.sqrt(u ** 2 + v ** 2).max()
    eps = 1e-5
    return flow_uv_to_colors(u / (rad_max + eps), v / (rad_max + eps))


# Per-dataset class palettes, value-exact vs the reference's color tensors
# (ft_semseg_visualize.py:15-40: dsec_color_class_0..10 / ddd17_color_class_0..5)
DSEC_PALETTE = np.array(
    [[0, 0, 0], [70, 70, 70], [190, 153, 153], [220, 20, 60],
     [153, 153, 153], [128, 64, 128], [244, 35, 232], [107, 142, 35],
     [0, 0, 142], [102, 102, 156], [220, 220, 0]], np.uint8,
)
DDD17_PALETTE = np.array(
    [[128, 64, 128], [70, 70, 70], [220, 220, 0], [107, 142, 35],
     [220, 20, 60], [0, 0, 142]], np.uint8,
)
# generic fallback (Cityscapes ordering) for datasets outside the reference's
# two semseg sources
_SEMSEG_PALETTE = np.array(
    [[128, 64, 128], [244, 35, 232], [70, 70, 70], [102, 102, 156],
     [190, 153, 153], [153, 153, 153], [250, 170, 30], [220, 220, 0],
     [107, 142, 35], [70, 130, 180], [220, 20, 60], [0, 0, 142],
     [0, 60, 100], [119, 11, 32]], np.uint8,
)
_PALETTES = {"dsec": DSEC_PALETTE, "ddd17": DDD17_PALETTE}


def semseg_to_color(label: np.ndarray, dataset: str | None = None) -> np.ndarray:
    """(H, W) int -> (H, W, 3) uint8 (reference draw_semseg_color_map,
    ft_semseg_visualize.py:34-78: per-dataset palettes; out-of-range ids —
    e.g. the 255 ignore label — render black like the reference's zeros
    init)."""
    palette = _PALETTES.get(dataset, _SEMSEG_PALETTE)
    label = np.asarray(label, np.int64)
    out = np.zeros(label.shape + (3,), np.uint8)
    valid = (label >= 0) & (label < len(palette))
    out[valid] = palette[label[valid]]
    return out
