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


def _minmax(a: np.ndarray) -> np.ndarray:
    a = np.asarray(a, np.float32)
    lo, hi = a.min(), a.max()
    return (a - lo) / (hi - lo) if hi > lo else np.zeros_like(a)

def unshuffle_visible(tap: np.ndarray, ids_restore: np.ndarray) -> np.ndarray:
    """Visible-token tap (K, D) -> full-grid (h, w, D) stage map.

    Reference pr_visualize.py:49-61: min-max normalize the visible tokens,
    append zero rows for the masked tokens, unshuffle by ids_restore, and
    fold to the patch grid — masked patches render black.
    """
    tap = _minmax(tap)
    ids = np.asarray(ids_restore, np.int64).reshape(-1)
    full = np.zeros((ids.shape[0], tap.shape[-1]), np.float32)
    full[: tap.shape[0]] = tap
    return _tap_to_hwc(full[ids])


def _mask_to_pixels(mask: np.ndarray, patch_size: int,
                    hw: tuple[int, int]) -> np.ndarray:
    """(L,) per-patch binary mask (1=masked) -> (H, W) pixel mask
    (reference pr_visualize.py:113-119 mask upsampling)."""
    g = int(round(np.asarray(mask).size ** 0.5))
    m = np.asarray(mask, np.float32).reshape(g, g)
    m = np.repeat(np.repeat(m, patch_size, 0), patch_size, 1)
    return m[: hw[0], : hw[1]]


def save_reconstruction_panel(
    out_dir: str, name: str, evg, target_frame, pred_frame, mask_frame=None,
    *, mask=None, patch_size: int = 16, taps=None, ids_restore=None,
    title: str = "",
) -> str:
    """Reconstruction diagnostic, reference vis_pr_rec parity
    (pr_visualize.py:15-147).

    Minimal call (events | target | pred) stays available; with
    ``mask`` ((L,) per-patch, 1=masked), ``taps`` ({name: (K, D) visible
    tokens or (h, w, D) grids}) and ``ids_restore``, renders the full
    layout: events previews, one row of 4 channels per unshuffled stage
    map, and the final target | masked target | pred | masked-composite
    row (visible pixels from the target, predicted pixels at the masked
    patches — pr_visualize.py:121-142).
    """
    import matplotlib.pyplot as plt

    evg = np.asarray(evg)
    target = np.asarray(target_frame, np.float32)[..., 0]
    pred = np.asarray(pred_frame, np.float32)[..., 0]
    taps = dict(taps or {})
    if mask is None:
        panels = [
            ("events", make_events_preview(evg)),
            ("target", target),
            ("pred", pred),
        ]
        if mask_frame is not None:
            panels.append(("mask", np.asarray(mask_frame)))
        fig, axes = plt.subplots(1, len(panels),
                                 figsize=(4 * len(panels), 4))
        for ax, (t, img) in zip(np.atleast_1d(axes), panels):
            ax.imshow(img, cmap="gray" if img.ndim == 2 else None)
            ax.set_title(t)
            ax.axis("off")
        return _save(fig, out_dir, name)

    cols = 4
    rows = 2 + len(taps)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows),
                             squeeze=False)
    axes[0][0].imshow(make_events_preview(evg), cmap="gray")
    axes[0][0].set_title("events", fontsize=8)
    axes[0][1].imshow(make_events_preview_norm(evg), cmap="gray")
    axes[0][1].set_title("events norm", fontsize=8)
    for r, (tap_name, tap) in enumerate(taps.items(), start=1):
        tap = np.asarray(tap, np.float32)
        grid = (
            unshuffle_visible(tap, ids_restore)
            if tap.ndim == 2 and ids_restore is not None
            and tap.shape[0] < np.asarray(ids_restore).size
            else _tap_to_hwc(_minmax(tap))
        )
        for c in range(min(cols, grid.shape[-1])):
            axes[r][c].imshow(grid[..., c], cmap="viridis")
            axes[r][c].set_title(f"{tap_name}_{c + 1}", fontsize=8)

    mask_px = _mask_to_pixels(mask, patch_size, target.shape)
    target_n, pred_n = _minmax(target), _minmax(pred)
    composite = target_n * (1 - mask_px) + pred_n * mask_px
    last = rows - 1
    for c, (t, img) in enumerate((
        ("sub frame", target_n),
        ("masked sub frame", target_n * (1 - mask_px)),
        ("reconstruct frame", pred_n),
        ("reconstruct visible sub frame", composite),
    )):
        axes[last][c].imshow(img, cmap="gray")
        axes[last][c].set_title(t, fontsize=8)
    for row in axes:
        for ax in row:
            ax.axis("off")
    if title:
        fig.suptitle(title, fontsize=10)
    return _save(fig, out_dir, name)


def _tap_rows(axes, taps, ids_restore=None, start_row: int = 1,
              cols: int = 4):
    """Render one 4-channel row per feature tap starting at start_row
    (reference emb_l1/emb_l2/emb_h rows, e.g. ft_semseg_visualize.py:136-171).
    Visible-token (K, D) taps are unshuffled to the full grid when
    ids_restore is given."""
    for r, (tap_name, tap) in enumerate(taps.items(), start=start_row):
        tap = np.asarray(tap, np.float32)
        grid = (
            unshuffle_visible(tap, ids_restore)
            if tap.ndim == 2 and ids_restore is not None
            and tap.shape[0] < np.asarray(ids_restore).size
            else _tap_to_hwc(_minmax(tap))
        )
        for c in range(min(cols, grid.shape[-1])):
            axes[r][c].imshow(grid[..., c], cmap="viridis")
            axes[r][c].set_title(f"{tap_name}_{c + 1}", fontsize=8)


def save_cls_panel(out_dir: str, name: str, evg, label: int, pred: int) -> str:
    """Event preview titled with gt/pred (reference ft_cls_visualize.py)."""
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(4, 4))
    ax.imshow(make_events_preview(np.asarray(evg)))
    ax.set_title(f"gt={label} pred={pred}")
    ax.axis("off")
    return _save(fig, out_dir, name)


def save_semseg_panel(out_dir: str, name: str, evg, label, pred,
                      aux_pred=None, *, attn=None, taps=None,
                      dataset=None, title: str = "") -> str:
    """Semseg diagnostic, reference vis_ft_semseg parity
    (ft_semseg_visualize.py:80-178).

    Minimal call (events | gt | pred | aux) keeps the condensed row; with
    ``taps`` ({name: (L, D) tokens or (h, w, D) grids}) and ``attn`` the
    full 5x4 reference layout renders: events / norm / attention row,
    label / decode / aux color-map row (per-dataset palettes via
    ``dataset``), one 4-channel row per tap."""
    import matplotlib.pyplot as plt

    evg = np.asarray(evg)
    color = lambda a: semseg_to_color(np.asarray(a), dataset)  # noqa: E731
    if taps is None:
        panels = [
            ("events", make_events_preview(evg)),
            ("label", color(label)),
            ("pred", color(pred)),
        ]
        if aux_pred is not None:
            panels.append(("aux pred", color(aux_pred)))
        fig, axes = plt.subplots(1, len(panels), figsize=(4 * len(panels), 4))
        for ax, (t, img) in zip(np.atleast_1d(axes), panels):
            ax.imshow(img)
            ax.set_title(t)
            ax.axis("off")
        return _save(fig, out_dir, name)

    taps = dict(taps)
    cols, rows = 4, 2 + len(taps)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows),
                             squeeze=False)
    axes[0][0].imshow(make_events_preview(evg), cmap="gray")
    axes[0][0].set_title("events frame", fontsize=8)
    axes[0][1].imshow(make_events_preview_norm(evg), cmap="gray")
    axes[0][1].set_title("events frame norm", fontsize=8)
    if attn is not None:
        axes[0][2].imshow(_attn_to_map(attn), cmap="viridis")
        axes[0][2].set_title("attention map", fontsize=8)
    axes[1][0].imshow(color(label))
    axes[1][0].set_title("semseg label", fontsize=8)
    axes[1][1].imshow(color(pred))
    axes[1][1].set_title("decode predict", fontsize=8)
    if aux_pred is not None:
        axes[1][2].imshow(color(aux_pred))
        axes[1][2].set_title("aux predict", fontsize=8)
    _tap_rows(axes, taps, start_row=2)
    for row in axes:
        for ax in row:
            ax.axis("off")
    if title:
        fig.suptitle(title, fontsize=10)
    return _save(fig, out_dir, name)


def save_flow_panel(out_dir: str, name: str, evg, flow_gt, flow_pred,
                    sparse_mask=None, aux_pred=None, *, valid=None,
                    attn=None, taps=None, title: str = "") -> str:
    """Flow diagnostic, reference vis_ft_flow parity
    (ft_flow_visualize.py:131-260).

    Minimal call keeps the condensed events|gt|pred row; with ``taps`` the
    full 6x4 reference layout renders: events / norm / attention row, the
    valid-masked flow colorizations (label / decode / aux — reference zeros
    invalid pixels BEFORE colorizing, :170-196), the sparse-mask white-out
    row (pixels without events render white, :198-212), one 4-channel row
    per tap. ``valid`` is the (H, W) gt-valid mask; ``sparse_mask`` the
    (H, W) event-presence mask."""
    import matplotlib.pyplot as plt

    evg = np.asarray(evg)

    def colorize(f):
        f = np.asarray(f, np.float32).copy()
        if valid is not None:
            f[np.asarray(valid) == 0] = 0
        return flow_to_image(f)

    if taps is None:
        panels = [("events", make_events_preview(evg), "gray")]
        if sparse_mask is not None:
            panels.append(("sparse mask",
                           np.asarray(sparse_mask, np.float32), "gray"))
        panels.append(("gt flow", colorize(flow_gt), None))
        panels.append(("pred flow", colorize(flow_pred), None))
        if aux_pred is not None:
            panels.append(("aux flow", colorize(aux_pred), None))
        fig, axes = plt.subplots(1, len(panels), figsize=(4 * len(panels), 4))
        for ax, (t, img, cmap) in zip(np.atleast_1d(axes), panels):
            ax.imshow(img, cmap=cmap)
            ax.set_title(t)
            ax.axis("off")
        return _save(fig, out_dir, name)

    taps = dict(taps)
    have_sparse = sparse_mask is not None
    cols, rows = 4, 2 + int(have_sparse) + len(taps)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows),
                             squeeze=False)
    axes[0][0].imshow(make_events_preview(evg), cmap="gray")
    axes[0][0].set_title("events frame", fontsize=8)
    axes[0][1].imshow(make_events_preview_norm(evg), cmap="gray")
    axes[0][1].set_title("events frame norm", fontsize=8)
    if attn is not None:
        axes[0][2].imshow(_attn_to_map(attn), cmap="viridis")
        axes[0][2].set_title("attention map", fontsize=8)
    images = [("flow label", colorize(flow_gt)),
              ("decode predict", colorize(flow_pred))]
    if aux_pred is not None:
        images.append(("aux predict", colorize(aux_pred)))
    for c, (t, img) in enumerate(images):
        axes[1][c].imshow(img)
        axes[1][c].set_title(t, fontsize=8)
    next_row = 2
    if have_sparse:
        sm = np.asarray(sparse_mask) == 0
        for c, (t, img) in enumerate(images):
            white = img.copy()
            white[sm] = 255
            axes[next_row][c].imshow(white)
            axes[next_row][c].set_title(t + " mask", fontsize=8)
        next_row += 1
    _tap_rows(axes, taps, start_row=next_row)
    for row in axes:
        for ax in row:
            ax.axis("off")
    if title:
        fig.suptitle(title, fontsize=10)
    return _save(fig, out_dir, name)


def save_rec_con_panel(
    out_dir: str, name: str, evg, target_frame, pred_frame, *, mask,
    emb_h_org, emb_h_proj, clip_emb_org, clip_emb_proj,
    patch_size: int = 16, taps=None, ids_restore=None, attn=None,
    title: str = "",
) -> str:
    """Combined rec+con diagnostic, reference vis_pr_rec_and_con parity
    (pr_visualize.py:413-601, 9x4): the reconstruction layout (events row,
    backbone tap rows, target/masked/pred/composite row) followed by the
    contrastive tap rows (emb_h_org/proj, clip_emb org/proj)."""
    import matplotlib.pyplot as plt

    evg = np.asarray(evg)
    target = np.asarray(target_frame, np.float32)[..., 0]
    pred = np.asarray(pred_frame, np.float32)[..., 0]
    taps = dict(taps or {})
    con_taps = {
        "emb_h_org": emb_h_org, "emb_h_proj": emb_h_proj,
        "clip_emb_org": clip_emb_org, "clip_emb_proj": clip_emb_proj,
    }
    cols = 4
    rows = 2 + len(taps) + len(con_taps)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows),
                             squeeze=False)
    axes[0][0].imshow(make_events_preview(evg), cmap="gray")
    axes[0][0].set_title("events frame", fontsize=8)
    axes[0][1].imshow(make_events_preview_norm(evg), cmap="gray")
    axes[0][1].set_title("events frame norm", fontsize=8)
    if attn is not None:
        axes[0][2].imshow(_attn_to_map(attn), cmap="viridis")
        axes[0][2].set_title("attention map", fontsize=8)
    _tap_rows(axes, taps, ids_restore=ids_restore, start_row=1)

    rec_row = 1 + len(taps)
    mask_px = _mask_to_pixels(mask, patch_size, target.shape)
    target_n, pred_n = _minmax(target), _minmax(pred)
    composite = target_n * (1 - mask_px) + pred_n * mask_px
    for c, (t, img) in enumerate((
        ("sub frame", target_n),
        ("masked sub frame", target_n * (1 - mask_px)),
        ("reconstruct frame", pred_n),
        ("reconstruct visible sub frame", composite),
    )):
        axes[rec_row][c].imshow(img, cmap="gray")
        axes[rec_row][c].set_title(t, fontsize=8)
    _tap_rows(axes, con_taps, start_row=rec_row + 1)
    for row in axes:
        for ax in row:
            ax.axis("off")
    if title:
        fig.suptitle(title, fontsize=10)
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


def _vec_to_tile(v: np.ndarray, width: int = 16) -> np.ndarray:
    """1-D embedding -> 2-D tile for imshow (reference pr_visualize.py:692-704
    reshapes 384->16x24 / 256->16x16; non-divisible tails are zero-padded)."""
    v = np.asarray(v, np.float32).reshape(-1)
    rows = -(-v.size // width)
    out = np.zeros(rows * width, np.float32)
    out[: v.size] = v
    return out.reshape(rows, width)


def _cls_attn_map(attn: np.ndarray, ids_restore=None, skip: int = 2):
    """ECDP CLS-query attention -> (g, g) map (reference
    pr_visualize.py:663-689: heads' row 0 minus the ``skip`` extra tokens,
    mean over heads, min-max, zero-pad the masked tokens, unshuffle by
    ids_restore, fold to the patch grid)."""
    attn = np.asarray(attn, np.float32)
    a = attn[:, 0, skip:].reshape(attn.shape[0], -1).mean(axis=0)
    a = _minmax(a)
    if ids_restore is not None:
        ids = np.asarray(ids_restore, np.int64).reshape(-1)
        full = np.zeros(ids.shape[0], np.float32)
        full[: a.shape[0]] = a
        a = full[ids]
    g = int(round(a.size ** 0.5))
    return a[: g * g].reshape(g, g)


def save_ecdp_panel(
    out_dir: str, name: str, events_image_q, events_image_k, *,
    mask_q=None, mask_k=None, ids_restore_q=None, ids_restore_k=None,
    attn_q=None, attn_k=None, clip_emb_org=None, clip_emb_proj=None,
    emb_image_q_org=None, emb_image_q=None, emb_event_q_org=None,
    emb_event_q=None, patch_size: int = 16, title: str = "",
) -> str:
    """ECDP diagnostic, reference vis_pr_ecdp parity (pr_visualize.py:604-740).

    Minimal call renders the q/k count-image pair; with masks/attention/
    embeddings the full 3x4 layout renders: q | masked q | k | masked k
    (mask upsampled to pixels, masked patches blacked — :628-660),
    CLS-attention maps q/k (visible tokens unshuffled by ids_restore),
    clip_emb org/proj tiles, and the image/event projection tiles."""
    import matplotlib.pyplot as plt

    pv_q = make_events_preview(np.asarray(events_image_q))
    pv_k = make_events_preview(np.asarray(events_image_k))
    if mask_q is None:
        fig, axes = plt.subplots(1, 2, figsize=(8, 4))
        for ax, (nm, img) in zip(axes, (
            ("events q", pv_q), ("events k", pv_k),
        )):
            ax.imshow(img, cmap="gray")
            ax.set_title(nm, fontsize=8)
            ax.axis("off")
        if title:
            fig.suptitle(title, fontsize=10)
        return _save(fig, out_dir, name)

    fig, axes = plt.subplots(3, 4, figsize=(12, 9), squeeze=False)

    def masked(pv, mask):
        m = _mask_to_pixels(mask, patch_size, pv.shape[:2])
        return (pv * (1 - m[..., None])).astype(np.uint8)

    row0 = (("events image q", pv_q), ("masked q", masked(pv_q, mask_q)),
            ("events image k", pv_k), ("masked k", masked(pv_k, mask_k)))
    for c, (t, img) in enumerate(row0):
        axes[0][c].imshow(img)
        axes[0][c].set_title(t, fontsize=8)
    row1 = (
        ("attn q", None if attn_q is None
         else _cls_attn_map(attn_q, ids_restore_q), "viridis"),
        ("attn k", None if attn_k is None
         else _cls_attn_map(attn_k, ids_restore_k), "viridis"),
        ("clip_emb_org", None if clip_emb_org is None
         else _vec_to_tile(clip_emb_org), "viridis"),
        ("clip_emb_proj", None if clip_emb_proj is None
         else _vec_to_tile(clip_emb_proj), "viridis"),
    )
    for c, (t, img, cmap) in enumerate(row1):
        if img is not None:
            axes[1][c].imshow(img, cmap=cmap)
            axes[1][c].set_title(t, fontsize=8)
    row2 = (("emb_image_q_org", emb_image_q_org),
            ("emb_image_q", emb_image_q),
            ("emb_event_q", emb_event_q),
            ("emb_event_q_org", emb_event_q_org))
    for c, (t, v) in enumerate(row2):
        if v is not None:
            axes[2][c].imshow(_vec_to_tile(v))
            axes[2][c].set_title(t, fontsize=8)
    for row in axes:
        for ax in row:
            ax.axis("off")
    if title:
        fig.suptitle(title, fontsize=10)
    return _save(fig, out_dir, name)
