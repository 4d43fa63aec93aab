"""EF-ImageNet tree builder: raw event/frame recordings -> the precomputed
tensor tree consumed by EFImageNetSource / the reference
PretrainEFImageNetDataset.

The reference ships only the raw-organization LOADER
(dataset/pretrain/pr_ef_imagenet_dataset.py:16-118, EForgNImageNetDataset:
per-image ``events/noisy/<image>_noisy_events.txt`` ESIM-style text streams
(t x y p, 6 header lines), ``frames/<image>_KK.png`` video frames at 30 fps,
and the paired raw N-ImageNet ``.npz``) but not the script that produced the
precomputed trees its training consumes (:147-182). This tool closes that
gap with this repo's own kernels, so stage-1 pretraining is reproducible
from raw events end to end:

  out/<class>/<image>/
    events/noisy/<image>_0K_noisy_events_voxel_grid.pt   K in [0, frames)
    events/clean/<image>_0K_clean_events_voxel_grid.pt   (when clean streams
                                                          exist in the org)
    sub_frames/<image>_0K_sub_frame.pt                    (1, S, S) f32
    <image>_clip_emb.pt                                   (197, 512) f32
                                                          (with --clip_weights)

Per frame window K (events between video frames K+1 and K+2, exactly the
reference's ``get_index``/``load_ef_events`` slicing at 30 fps):
  * coordinates rescaled from the sensor to --input_size
    (events_augment.py:22-26) and rasterized with
    ops/events.events_to_voxel_grid_batch — the same kernel the training
    pipelines use, batched over the K windows on device;
  * the sub-frame target is the grayscale temporal difference
    gray(frame_{K+2}) - gray(frame_{K+1}) over the window, resized to
    --input_size (the "difference-guided" reconstruction target,
    reference pr_hub_model.py:124-141 consumes it as-is);
  * the CLIP embedding is the frozen ViT-B/16 token sequence of the paired
    ImageNet JPEG (models/clip.py), written only when --clip_weights is
    given.

Usage:
  python -m eventpretrain_tpu.data.prep_ef_imagenet \
      --org_root /path/EF-ImageNet-org --out /path/EF-ImageNet \
      [--imagenet_root /path/ImageNet] [--clip_weights ViT-B-16.pt]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def read_event_text(path: str, skiprows: int = 6) -> np.ndarray:
    """(N, 4) txyp float64 from an ESIM-style text stream (reference
    pr_ef_imagenet_dataset.py:61: pandas read_csv skiprows=6, sep=' ')."""
    return np.loadtxt(path, skiprows=skiprows, ndmin=2)


def frame_window_indices(t: np.ndarray, fps: float = 30.0) -> list[int]:
    """Frame-boundary event indices (reference get_index,
    pr_ef_imagenet_dataset.py:44-55): index_list[i] = first event at/after
    frame time i/fps; windows are [idx[K+1], idx[K+2])."""
    period = 1.0 / fps
    frames_num = int(t[-1] // period)
    idx = [0]
    for i in range(1, frames_num + 1):
        idx.append(int(np.searchsorted(t, period * i)))
    return idx


def to_gray(img: np.ndarray) -> np.ndarray:
    """(H, W[, C]) uint8/float -> (H, W) float32 luminance in [0, 1]."""
    arr = np.asarray(img, np.float32)
    if arr.max() > 1.5:
        arr = arr / 255.0
    if arr.ndim == 3:
        arr = arr[..., :3] @ np.array([0.299, 0.587, 0.114], np.float32)
    return arr


def build_windows(events_txyp: np.ndarray, num_frames: int,
                  fps: float) -> list[np.ndarray] | None:
    """Split a txyp stream into the first ``num_frames`` per-frame windows
    as xytp arrays; None if the recording is too short."""
    idx = frame_window_indices(events_txyp[:, 0], fps)
    if len(idx) < num_frames + 2:
        return None
    out = []
    for k in range(num_frames):
        win = events_txyp[idx[k + 1]: idx[k + 2]]
        # txyp -> xytp (the kernel convention)
        out.append(np.stack(
            [win[:, 1], win[:, 2], win[:, 0], win[:, 3]], axis=1
        ))
    return out


def voxelize_windows(windows: list[np.ndarray], sensor_hw, input_size: int,
                     num_bins: int) -> np.ndarray:
    """(K, bins, S, S) float32 voxel grids via the device batch kernel."""
    import jax.numpy as jnp

    from eventpretrain_tpu.data.event_transforms import (
        pad_events, rescale_coords,
    )
    from eventpretrain_tpu.ops.events import events_to_voxel_grid_batch

    h, w = sensor_hw
    cap = max(max((win.shape[0] for win in windows), default=1), 1)
    packed, counts = [], []
    for win in windows:
        win = rescale_coords(
            win.astype(np.float64), w, h, input_size, input_size
        )
        arr, n = pad_events(win.astype(np.float32), cap)
        packed.append(arr)
        counts.append(n)
    grids = events_to_voxel_grid_batch(
        jnp.asarray(np.stack(packed)), jnp.asarray(np.asarray(counts)),
        num_bins=num_bins, height=input_size, width=input_size,
    )
    return np.asarray(grids, np.float32).transpose(0, 3, 1, 2)


def resize_frame(gray: np.ndarray, input_size: int) -> np.ndarray:
    """Bicubic resize of a (H, W) map to (input_size, input_size) with the
    torch-exact resampler (ops/view_augment.py)."""
    import jax.numpy as jnp

    from eventpretrain_tpu.ops.view_augment import _crop_resize_one

    out = _crop_resize_one(
        jnp.asarray(gray[..., None]), 0, 0, gray.shape[0], gray.shape[1],
        input_size, input_size, "bicubic",
    )
    return np.asarray(out, np.float32)[..., 0]


def prep_image(org_dir: str, out_dir: str, image_name: str, *,
               input_size: int = 224, num_bins: int = 5, fps: float = 30.0,
               num_frames: int = 10, noisy_dir: str = "events/noisy",
               clean_dir: str = "events/clean",
               frames_dir: str = "frames") -> dict:
    """Build one image's tree; returns a summary dict (what was written)."""
    import torch

    written = {"noisy": 0, "clean": 0, "sub_frames": 0}

    # frames (needed for sensor size + sub-frame targets)
    frame_files = sorted(os.listdir(os.path.join(org_dir, frames_dir)))
    frames = [
        to_gray(_read_image(os.path.join(org_dir, frames_dir, f)))
        for f in frame_files
    ]
    if len(frames) < num_frames + 2:
        return {"skipped": f"only {len(frames)} frames"}
    sensor_hw = frames[0].shape

    for kind, dir_name in (("noisy", noisy_dir), ("clean", clean_dir)):
        txt = os.path.join(
            org_dir, dir_name, f"{image_name}_{kind}_events.txt"
        )
        if not os.path.exists(txt):
            continue
        windows = build_windows(read_event_text(txt), num_frames, fps)
        if windows is None:
            return {"skipped": "recording shorter than the frame count"}
        grids = voxelize_windows(windows, sensor_hw, input_size, num_bins)
        d = os.path.join(out_dir, dir_name)
        os.makedirs(d, exist_ok=True)
        for k in range(num_frames):
            torch.save(
                torch.from_numpy(grids[k].copy()),
                os.path.join(
                    d, f"{image_name}_0{k}_{kind}_events_voxel_grid.pt"
                ),
            )
            written[kind] += 1

    d = os.path.join(out_dir, "sub_frames")
    os.makedirs(d, exist_ok=True)
    for k in range(num_frames):
        # window K spans video frames K+1 -> K+2 (get_index slicing): the
        # temporal intensity difference the events of window K encode
        diff = frames[k + 2] - frames[k + 1]
        sub = resize_frame(diff, input_size)[None]
        torch.save(torch.from_numpy(np.asarray(sub, np.float32)),
                   os.path.join(d, f"{image_name}_0{k}_sub_frame.pt"))
        written["sub_frames"] += 1
    return written


def _read_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path))


def write_clip_embeddings(out_root: str, items, imagenet_root: str,
                          clip_weights: str, batch_size: int = 32) -> int:
    """CLIP ViT-B/16 token embeddings (197, 512) for each paired JPEG."""
    import jax
    import jax.numpy as jnp
    import torch

    from eventpretrain_tpu.models.clip import (
        clip_vit_b16, load_clip_visual_weights, preprocess_images,
    )

    model = clip_vit_b16()
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3))
    )["params"]
    params = load_clip_visual_weights(clip_weights, params)

    @jax.jit
    def encode(imgs):
        return model.apply(
            {"params": params},
            preprocess_images(imgs.astype(jnp.float32) / 255.0),
        )

    n = 0
    for start in range(0, len(items), batch_size):
        chunk = items[start:start + batch_size]
        imgs = np.stack([
            _center_crop_224(
                os.path.join(imagenet_root, cls, name + ".JPEG")
            )
            for cls, name in chunk
        ])
        embs = np.asarray(encode(jnp.asarray(imgs)), np.float32)
        for (cls, name), emb in zip(chunk, embs):
            d = os.path.join(out_root, cls, name)
            os.makedirs(d, exist_ok=True)
            torch.save(torch.from_numpy(emb),
                       os.path.join(d, f"{name}_clip_emb.pt"))
            n += 1
    return n


def _center_crop_224(path: str) -> np.ndarray:
    """CLIP preprocess geometry (bicubic short-side 224 + center crop)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    scale = 224 / min(w, h)
    img = img.resize((round(w * scale), round(h * scale)),
                     Image.Resampling.BICUBIC)
    w, h = img.size
    left, top = (w - 224) // 2, (h - 224) // 2
    return np.asarray(img.crop((left, top, left + 224, top + 224)), np.uint8)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("prep_ef_imagenet")
    p.add_argument("--org_root", required=True,
                   help="raw EF-ImageNet organization "
                        "(<class>/<image>/{events/noisy/*.txt, frames/})")
    p.add_argument("--out", required=True, help="output tree root")
    p.add_argument("--imagenet_root", default=None,
                   help="paired ImageNet JPEG tree (for clip embeddings)")
    p.add_argument("--clip_weights", default=None,
                   help="OpenAI CLIP ViT-B/16 checkpoint; embeddings are "
                        "skipped when omitted")
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--num_bins", type=int, default=5)
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--num_frames", type=int, default=10)
    return p


def main(args=None):
    args = build_parser().parse_args(args)
    items = []
    for cls in sorted(os.listdir(args.org_root)):
        for image_name in sorted(
            os.listdir(os.path.join(args.org_root, cls))
        ):
            items.append((cls, image_name))
    done = skipped = 0
    for cls, image_name in items:
        summary = prep_image(
            os.path.join(args.org_root, cls, image_name),
            os.path.join(args.out, cls, image_name),
            image_name,
            input_size=args.input_size, num_bins=args.num_bins,
            fps=args.fps, num_frames=args.num_frames,
        )
        if "skipped" in summary:
            skipped += 1
            print(f"[skip] {cls}/{image_name}: {summary['skipped']}")
        else:
            done += 1
    print(f"prepared {done} images ({skipped} skipped) under {args.out}")
    if args.clip_weights and args.imagenet_root:
        n = write_clip_embeddings(
            args.out, items, args.imagenet_root, args.clip_weights
        )
        print(f"wrote {n} clip embeddings")
    elif args.clip_weights or args.imagenet_root:
        print("[warn] clip embeddings need BOTH --clip_weights and "
              "--imagenet_root; skipped")
    return done


if __name__ == "__main__":
    main()
