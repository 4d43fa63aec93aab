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
    flow_to_image,
    semseg_to_color,
)


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


def save_semseg_panel(out_dir: str, name: str, evg, label, pred) -> str:
    """Events | gt colors | pred colors (reference ft_semseg_visualize.py)."""
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    axes[0].imshow(make_events_preview(np.asarray(evg)))
    axes[0].set_title("events")
    axes[1].imshow(semseg_to_color(np.asarray(label)))
    axes[1].set_title("label")
    axes[2].imshow(semseg_to_color(np.asarray(pred)))
    axes[2].set_title("pred")
    for ax in axes:
        ax.axis("off")
    return _save(fig, out_dir, name)


def save_flow_panel(out_dir: str, name: str, evg, flow_gt, flow_pred) -> str:
    """Events | gt flow colors | pred flow colors
    (reference ft_flow_visualize.py:133+)."""
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    axes[0].imshow(make_events_preview(np.asarray(evg)))
    axes[0].set_title("events")
    axes[1].imshow(flow_to_image(np.asarray(flow_gt)))
    axes[1].set_title("gt flow")
    axes[2].imshow(flow_to_image(np.asarray(flow_pred)))
    axes[2].set_title("pred flow")
    for ax in axes:
        ax.axis("off")
    return _save(fig, out_dir, name)
