"""Device-side batched view augmentations (crop / resize / flip / time-flip).

TPU-first redesign of reference dataset/augmentation/view_augment.py:9-134:
instead of per-sample torch ops in DataLoader workers, augmentation
*parameters* are sampled on host (tiny numpy arrays, preserving the
reference's draw semantics) and *applied* on device as one fused, batched,
statically-shaped resample per view. Crop+resize collapses into a single
``jax.image.scale_and_translate`` (linear/cubic) or gather (nearest), so a
random-resized-crop costs one pass over HBM regardless of crop size.

Seed coupling (reference pr_ef_imagenet_dataset.py:187-206,
ft_dsec_dataset.py:193-278) — where the reference replays a numpy seed to
keep event/label/frame augmentations aligned — becomes explicit: one
``ViewParams`` is sampled per sample and passed to every coupled view.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ViewParams(NamedTuple):
    """Per-sample view-augmentation parameters (all arrays have leading B)."""

    crop_y: jax.Array  # int32 (B,)
    crop_x: jax.Array  # int32 (B,)
    crop_h: jax.Array  # int32 (B,)
    crop_w: jax.Array  # int32 (B,)
    hflip: jax.Array   # bool  (B,)
    tflip: jax.Array   # bool  (B,)


def sample_crop(
    rng: np.random.Generator,
    height: int,
    width: int,
    scale: tuple[float, float] = (0.8, 1.0),
    ratio: tuple[float, float] = (3 / 4, 4 / 3),
) -> tuple[int, int, int, int]:
    """Sample one RRC-style crop box (y, x, h, w).

    Draw-for-draw parity with reference view_augment.py:9-33 (view_crop):
    10 attempts; aspect ratio scaled by sensor w/h; 50% chance of swapping
    the box sides; fall back to the full view.
    """
    area = width * height
    for _ in range(10):
        target_area = rng.uniform(scale[0], scale[1]) * area
        aspect = rng.uniform(width / height * ratio[0], width / height * ratio[1])
        crop_w = int(round(math.sqrt(target_area * aspect)))
        crop_h = int(round(math.sqrt(target_area / aspect)))
        if rng.integers(0, 10) < 5:
            crop_w, crop_h = crop_h, crop_w
        if crop_w < width and crop_h < height:
            x0 = int(rng.integers(0, width - crop_w))
            y0 = int(rng.integers(0, height - crop_h))
            return y0, x0, crop_h, crop_w
    return 0, 0, height, width


def sample_view_params(
    rng: np.random.Generator,
    batch: int,
    height: int,
    width: int,
    scale_min: float = 0.8,
    hflip_prob: float = 0.5,
    tflip_prob: float = 0.5,
) -> ViewParams:
    """Sample a batch of view parameters on host."""
    boxes = np.array(
        [sample_crop(rng, height, width, (scale_min, 1.0)) for _ in range(batch)],
        np.int32,
    ).reshape(batch, 4)
    hflip = rng.random(batch) < hflip_prob
    tflip = rng.random(batch) < tflip_prob
    return ViewParams(
        crop_y=jnp.asarray(boxes[:, 0]),
        crop_x=jnp.asarray(boxes[:, 1]),
        crop_h=jnp.asarray(boxes[:, 2]),
        crop_w=jnp.asarray(boxes[:, 3]),
        hflip=jnp.asarray(hflip),
        tflip=jnp.asarray(tflip),
    )


def identity_view_params(batch: int, height: int, width: int) -> ViewParams:
    """Resize-only parameters (validation path)."""
    zeros = jnp.zeros((batch,), jnp.int32)
    return ViewParams(
        crop_y=zeros,
        crop_x=zeros,
        crop_h=jnp.full((batch,), height, jnp.int32),
        crop_w=jnp.full((batch,), width, jnp.int32),
        hflip=jnp.zeros((batch,), bool),
        tflip=jnp.zeros((batch,), bool),
    )


def _crop_resize_one(
    view: jax.Array,
    crop_y: jax.Array,
    crop_x: jax.Array,
    crop_h: jax.Array,
    crop_w: jax.Array,
    out_h: int,
    out_w: int,
    mode: str,
) -> jax.Array:
    """Fused crop+resize of one (H, W, C) view to (out_h, out_w, C)."""
    if mode == "nearest":
        # half-pixel nearest: src = floor((i + 0.5) * crop / out) + crop0
        ys = crop_y + ((jnp.arange(out_h) + 0.5) * crop_h / out_h).astype(jnp.int32)
        xs = crop_x + ((jnp.arange(out_w) + 0.5) * crop_w / out_w).astype(jnp.int32)
        ys = jnp.clip(ys, 0, view.shape[0] - 1)
        xs = jnp.clip(xs, 0, view.shape[1] - 1)
        return view[ys][:, xs]
    method = {"bilinear": "linear", "bicubic": "cubic"}[mode]
    scale = jnp.array([out_h / crop_h, out_w / crop_w], jnp.float32)
    translation = -jnp.array([crop_y, crop_x], jnp.float32) * scale
    return jax.image.scale_and_translate(
        view,
        (out_h, out_w, view.shape[-1]),
        (0, 1),
        scale,
        translation,
        method=method,
        antialias=False,
    )


def apply_view_augment(
    views: jax.Array,
    params: ViewParams,
    out_size: tuple[int, int],
    mode: str = "nearest",
    *,
    time_flip: bool = True,
    negate_on_tflip: bool = True,
) -> jax.Array:
    """Apply crop->resize->hflip->time-flip to a batch ``(B, H, W, C)``.

    Equivalent of reference view_augment.py:65-77 (evg_augment). Time-flip
    reverses the channel (bin) order and, for temporally-signed grids
    (num_bins 5/6 voxel grids, reference view_augment.py:49-58), negates
    values; pass ``negate_on_tflip=False`` for count-based representations.
    """
    out_h, out_w = out_size

    def one(view, cy, cx, ch, cw, hf, tf):
        out = _crop_resize_one(view, cy, cx, ch, cw, out_h, out_w, mode)
        out = jnp.where(hf, out[:, ::-1, :], out)
        if time_flip:
            flipped = out[..., ::-1]
            if negate_on_tflip:
                flipped = -flipped
            out = jnp.where(tf, flipped, out)
        return out

    return jax.vmap(one)(
        views, params.crop_y, params.crop_x, params.crop_h, params.crop_w,
        params.hflip, params.tflip,
    )


def apply_frame_augment(
    frames: jax.Array,
    params: ViewParams,
    out_size: tuple[int, int],
    mode: str = "bicubic",
) -> jax.Array:
    """Augment target frames coupled to an event view.

    Equivalent of reference view_augment.py:79-89 (frame_augment): same
    crop/hflip as the event view; if the event view was time-flipped the
    temporal-difference frame flips sign.
    """
    out_h, out_w = out_size

    def one(frame, cy, cx, ch, cw, hf, tf):
        out = _crop_resize_one(frame, cy, cx, ch, cw, out_h, out_w, mode)
        out = jnp.where(hf, out[:, ::-1, :], out)
        out = jnp.where(tf, -out, out)
        return out

    return jax.vmap(one)(
        frames, params.crop_y, params.crop_x, params.crop_h, params.crop_w,
        params.hflip, params.tflip,
    )


def apply_semseg_label_augment(
    labels: jax.Array, params: ViewParams, out_size: tuple[int, int]
) -> jax.Array:
    """Augment integer label maps ``(B, H, W)`` (reference view_augment.py:91-99).

    Nearest resampling; no time-flip effect on labels.
    """
    out_h, out_w = out_size

    def one(label, cy, cx, ch, cw, hf):
        out = _crop_resize_one(
            label[..., None], cy, cx, ch, cw, out_h, out_w, "nearest"
        )[..., 0]
        return jnp.where(hf, out[:, ::-1], out)

    return jax.vmap(one)(
        labels, params.crop_y, params.crop_x, params.crop_h, params.crop_w,
        params.hflip,
    )


def apply_flow_label_augment(
    flows: jax.Array,
    params: ViewParams,
    out_size: tuple[int, int],
    *,
    use_tflip: bool = True,
) -> jax.Array:
    """Augment flow fields ``(B, H, W, 2)`` (reference view_augment.py:101-124).

    Vectors are rescaled by (out/crop) after resize; hflip negates u;
    time-flip negates both components.
    """
    out_h, out_w = out_size

    def one(flow, cy, cx, ch, cw, hf, tf):
        out = _crop_resize_one(flow, cy, cx, ch, cw, out_h, out_w, "nearest")
        scale = jnp.stack(
            [out_w / cw.astype(jnp.float32), out_h / ch.astype(jnp.float32)]
        )
        out = out * scale
        out = jnp.where(hf, out[:, ::-1, :] * jnp.array([-1.0, 1.0]), out)
        if use_tflip:
            out = jnp.where(tf, out * jnp.array([-1.0, -1.0]), out)
        return out

    return jax.vmap(one)(
        flows, params.crop_y, params.crop_x, params.crop_h, params.crop_w,
        params.hflip, params.tflip,
    )


def apply_flow_valid_augment(
    valid: jax.Array, params: ViewParams, out_size: tuple[int, int]
) -> jax.Array:
    """Augment flow validity masks ``(B, H, W)`` (reference view_augment.py:126-134)."""
    return apply_semseg_label_augment(valid, params, out_size)
