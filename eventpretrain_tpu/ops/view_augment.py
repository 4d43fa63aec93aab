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


def _cubic_w(frac: jax.Array, a: float = -0.75) -> jax.Array:
    """4-tap cubic-convolution weights for fractional offsets ``frac`` (N,).

    Torch's bicubic kernel (a = -0.75, upsample_bicubic2d): taps at
    floor(src)-1 .. floor(src)+2.
    """
    def cc1(x):  # |x| <= 1
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0

    def cc2(x):  # 1 < |x| < 2
        return ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a

    return jnp.stack(
        [cc2(frac + 1.0), cc1(frac), cc1(1.0 - frac), cc2(2.0 - frac)],
        axis=-1,
    )


def _resample_weights(
    crop0: jax.Array, crop_len: jax.Array, out_len: int, full_len: int,
    mode: str,
) -> jax.Array:
    """(out_len, full_len) torch-convention resampling matrix for one axis.

    Value-exact with ``F.interpolate(view[crop], mode=mode)`` (reference
    utils/reshape.py:40-43 used by view_augment.py:35-39): source positions
    are computed inside the crop window and every tap index is clamped to the
    crop — cropping *then* resizing replicates crop borders, never reads the
    surrounding canvas. Conventions per mode (torch upsample kernels):
      nearest : src = floor(i * crop/out)           (asymmetric, floor)
      bilinear: src = max((i+0.5) * crop/out - .5, 0), 2 taps i0, i0+1
      bicubic : src = (i+0.5) * crop/out - .5 (unclamped), 4 taps, a=-0.75
    Expressed as a dense weight matrix so a batched crop+resize is one
    (out, H) x (H, W, C) contraction per axis — MXU work instead of gathers.
    """
    i = jnp.arange(out_len, dtype=jnp.float32)
    crop0 = jnp.asarray(crop0, jnp.int32)
    crop_len = jnp.asarray(crop_len, jnp.int32)
    crop_f = crop_len.astype(jnp.float32)
    cols = jnp.arange(full_len)
    if mode == "nearest":
        # integer rational floor: exact where double rounding could flip
        src = (jnp.arange(out_len) * crop_len) // out_len
        src = jnp.clip(src, 0, crop_len - 1) + crop0
        return (src[:, None] == cols[None, :]).astype(jnp.float32)
    src = (i + 0.5) * crop_f / out_len - 0.5
    if mode == "bilinear":
        src = jnp.maximum(src, 0.0)
        i0 = jnp.floor(src)
        frac = src - i0
        taps = i0.astype(jnp.int32)[:, None] + jnp.arange(2)
        weights = jnp.stack([1.0 - frac, frac], axis=-1)
    elif mode == "bicubic":
        i0 = jnp.floor(src)
        frac = src - i0
        taps = i0.astype(jnp.int32)[:, None] + jnp.arange(-1, 3)
        weights = _cubic_w(frac)
    else:
        raise ValueError(f"unknown resize mode: {mode}")
    taps = jnp.clip(taps, 0, crop_len - 1) + crop0  # replicate crop borders
    onehot = (taps[:, :, None] == cols[None, None, :]).astype(jnp.float32)
    return jnp.einsum("ok,okj->oj", weights, onehot)


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
    """Fused crop+resize of one (H, W, C) view to (out_h, out_w, C).

    Torch-exact (see _resample_weights); two dense contractions over the
    static canvas axes, so crops of any dynamic size compile to one fixed
    XLA program.
    """
    w_y = _resample_weights(crop_y, crop_h, out_h, view.shape[0], mode)
    w_x = _resample_weights(crop_x, crop_w, out_w, view.shape[1], mode)
    out = jnp.einsum(
        "oh,hwc,pw->opc", w_y, view.astype(jnp.float32), w_x,
        optimize=True,
    )
    if jnp.issubdtype(view.dtype, jnp.integer):
        return jnp.round(out).astype(view.dtype)  # nearest: exact one-hots
    return out.astype(view.dtype)


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
