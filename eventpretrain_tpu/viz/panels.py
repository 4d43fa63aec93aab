"""Diagnostic figure panels saved under vis_train/ / vis_val/.

Functional equivalents of the reference's per-task matplotlib figures
(visualize/pr_visualize.py:15-147 reconstruction panels,
ft_cls_visualize.py, ft_semseg_visualize.py, ft_flow_visualize.py): each
panel shows the event preview alongside targets/predictions. Matplotlib is
imported lazily so headless training never pays for it.
"""

from __future__ import annotations

import os

import numpy as np

from eventpretrain_tpu.viz.previews import (
    make_events_preview,
    make_events_preview_norm,
    flow_to_image,
    semseg_to_color,
)


def _tap_to_hwc(tap: np.ndarray) -> np.ndarray:
    """(L, D) token taps -> (h, w, D) grids; (h, w, D) passes through."""
    tap = np.asarray(tap, np.float32)
    if tap.ndim == 2:
        g = int(round(tap.shape[0] ** 0.5))
        if g * g == tap.shape[0]:
            tap = tap.reshape(g, g, tap.shape[-1])
        else:  # non-square token counts (e.g. with extra tokens): drop tail
            tap = tap[: g * g].reshape(g, g, tap.shape[-1])
    return tap


def _attn_to_map(attn: np.ndarray) -> np.ndarray:
    """(H, L, L) or (L, L) attention -> (g, g) mean-attention map
    (reference ft_cls_visualize.py:38-46: mean over heads and queries)."""
    attn = np.asarray(attn, np.float32)
    while attn.ndim > 1 and attn.shape[0] != attn.shape[-1]:
        attn = attn.mean(axis=0)
    if attn.ndim == 2:
        attn = attn.mean(axis=0)
    g = int(round(attn.shape[-1] ** 0.5))
    return attn[: g * g].reshape(g, g)


def _save(fig, out_dir: str, name: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, name)
    fig.savefig(path, bbox_inches="tight", dpi=100)
    import matplotlib.pyplot as plt

    plt.close(fig)
    return path


def save_reconstruction_panel(
    out_dir: str, name: str, evg, target_frame, pred_frame, mask_frame=None,
) -> str:
    """Event preview | target diff-frame | prediction (| mask).

    Equivalent of reference vis_pr_rec (pr_visualize.py:15-147).
    """
    import matplotlib.pyplot as plt

    panels = [
        ("events", make_events_preview(np.asarray(evg))),
        ("target", np.asarray(target_frame)[..., 0]),
        ("pred", np.asarray(pred_frame)[..., 0]),
    ]
    if mask_frame is not None:
        panels.append(("mask", np.asarray(mask_frame)))
    fig, axes = plt.subplots(1, len(panels), figsize=(4 * len(panels), 4))
    for ax, (title, img) in zip(np.atleast_1d(axes), panels):
        if img.ndim == 2:
            ax.imshow(img, cmap="gray")
        else:
            ax.imshow(img)
        ax.set_title(title)
        ax.axis("off")
    return _save(fig, out_dir, name)


def save_cls_panel(out_dir: str, name: str, evg, label: int, pred: int) -> str:
    """Event preview titled with gt/pred (reference ft_cls_visualize.py)."""
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(4, 4))
    ax.imshow(make_events_preview(np.asarray(evg)))
    ax.set_title(f"gt={label} pred={pred}")
    ax.axis("off")
    return _save(fig, out_dir, name)


def save_semseg_panel(out_dir: str, name: str, evg, label, pred,
                      aux_pred=None) -> str:
    """Events | gt colors | pred colors (| aux pred)
    (reference ft_semseg_visualize.py:78-178 incl. the aux head column)."""
    import matplotlib.pyplot as plt

    panels = [
        ("events", make_events_preview(np.asarray(evg))),
        ("label", semseg_to_color(np.asarray(label))),
        ("pred", semseg_to_color(np.asarray(pred))),
    ]
    if aux_pred is not None:
        panels.append(("aux pred", semseg_to_color(np.asarray(aux_pred))))
    fig, axes = plt.subplots(1, len(panels), figsize=(4 * len(panels), 4))
    for ax, (t, img) in zip(np.atleast_1d(axes), panels):
        ax.imshow(img)
        ax.set_title(t)
        ax.axis("off")
    return _save(fig, out_dir, name)


def save_flow_panel(out_dir: str, name: str, evg, flow_gt, flow_pred,
                    sparse_mask=None, aux_pred=None) -> str:
    """Events (| sparse mask) | gt flow | pred flow (| aux flow)
    (reference ft_flow_visualize.py:131-256 incl. mask and aux columns)."""
    import matplotlib.pyplot as plt

    panels = [("events", make_events_preview(np.asarray(evg)), "gray")]
    if sparse_mask is not None:
        panels.append(("sparse mask", np.asarray(sparse_mask, np.float32),
                       "gray"))
    panels.append(("gt flow", flow_to_image(np.asarray(flow_gt)), None))
    panels.append(("pred flow", flow_to_image(np.asarray(flow_pred)), None))
    if aux_pred is not None:
        panels.append(("aux flow", flow_to_image(np.asarray(aux_pred)), None))
    fig, axes = plt.subplots(1, len(panels), figsize=(4 * len(panels), 4))
    for ax, (t, img, cmap) in zip(np.atleast_1d(axes), panels):
        ax.imshow(img, cmap=cmap)
        ax.set_title(t)
        ax.axis("off")
    return _save(fig, out_dir, name)


def save_feature_panel(
    out_dir: str, name: str, evg, taps=None, attn=None, title: str = "",
) -> str:
    """Events previews + mean-attention map + 4-channel tiles per tap.

    One generic panel covering the reference's 16 per-backbone figure
    variants (ft_cls_visualize.py:14-262, pr_visualize.py:320-411, ...):
    row 1 = events preview / normalized preview / mean attention; one row
    per feature tap showing its first 4 channels (reference shows exactly
    this per emb_l1/emb_l2/emb_h; swin simply has more taps, ECDP/MEM have
    none — pass taps={} for the attention-only variants).
    """
    import matplotlib.pyplot as plt

    taps = dict(taps or {})
    cols = 4
    rows = 1 + len(taps)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows),
                             squeeze=False)
    evg = np.asarray(evg)
    axes[0][0].imshow(make_events_preview(evg), cmap="gray")
    axes[0][0].set_title("events", fontsize=8)
    axes[0][1].imshow(make_events_preview_norm(evg), cmap="gray")
    axes[0][1].set_title("events norm", fontsize=8)
    if attn is not None:
        axes[0][2].imshow(_attn_to_map(attn), cmap="viridis")
        axes[0][2].set_title("attention map", fontsize=8)
    for r, (tap_name, tap) in enumerate(taps.items(), start=1):
        grid = _tap_to_hwc(tap)
        for c in range(cols):
            if c < grid.shape[-1]:
                axes[r][c].imshow(grid[..., c], cmap="viridis")
                axes[r][c].set_title(f"{tap_name}_{c + 1}", fontsize=8)
    for row in axes:
        for ax in row:
            ax.axis("off")
    if title:
        fig.suptitle(title, fontsize=10)
    return _save(fig, out_dir, name)


def save_con_panel(
    out_dir: str, name: str, evg, emb_h_org, emb_h_proj,
    clip_emb_org, clip_emb_proj, attn=None, title: str = "",
) -> str:
    """Contrastive-phase panel (reference vis_pr_con, pr_visualize.py:320-411):
    events previews + attention + backbone/projected vs CLIP/projected taps."""
    return save_feature_panel(
        out_dir, name, evg,
        taps={
            "emb_h_org": emb_h_org, "emb_h_proj": emb_h_proj,
            "clip_emb_org": clip_emb_org, "clip_emb_proj": clip_emb_proj,
        },
        attn=attn, title=title,
    )


def save_ecdp_panel(
    out_dir: str, name: str, events_image_q, events_image_k, title: str = "",
) -> str:
    """ECDP q/k count-image pair (reference vis_pr_ecdp,
    pr_visualize.py:604+)."""
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(8, 4))
    for ax, (nm, img) in zip(axes, (
        ("events q", events_image_q), ("events k", events_image_k),
    )):
        ax.imshow(make_events_preview(np.asarray(img)), cmap="gray")
        ax.set_title(nm, fontsize=8)
        ax.axis("off")
    if title:
        fig.suptitle(title, fontsize=10)
    return _save(fig, out_dir, name)
