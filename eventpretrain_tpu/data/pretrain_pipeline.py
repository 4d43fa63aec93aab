"""Pretrain input pipeline (EF-ImageNet-format precomputed tensors).

Equivalent of reference dataset/pretrain/pr_ef_imagenet_dataset.py:120-244:
per-image directories hold precomputed noisy/clean event voxel grids,
temporal-difference sub-frames, and CLIP embeddings. The host loads arrays
and samples one coupled ViewParams per sample; crop/resize/flip/time-flip of
the grid (nearest) and sub-frame (bicubic, sign-flipped on time-flip) run as
one jitted batched device program — the reference's seed-replay coupling
(pr_ef_imagenet_dataset.py:187-206) becomes shared params.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import re
from typing import Iterator, Optional, Protocol

import numpy as np
import jax
import jax.numpy as jnp

from eventpretrain_tpu.ops.view_augment import (
    ViewParams,
    sample_view_params,
    identity_view_params,
    apply_view_augment,
    apply_frame_augment,
)


class PretrainSource(Protocol):
    def __len__(self) -> int: ...

    def load(self, index: int) -> dict:
        """Returns {'evg': (H,W,bins), 'frame': (H,W,1)?, 'clip_emb': (L,512)?}."""
        ...


@dataclasses.dataclass(frozen=True)
class PretrainDataConfig:
    pr_phase: str = "rec"           # rec | adj | con | rec+con
    num_bins: int = 5
    input_size: int = 224
    crop_min: float = 0.8
    frame_chans: int = 1
    # host->device dtype for the precomputed grids. bf16 halves the PCIe /
    # relay bytes of the dominant transfer; exact relative to bf16-model
    # compute (the first conv casts inputs to bf16 anyway, and the nearest
    # crop/flip augment does no arithmetic). Frames/clip stay f32 (loss
    # targets, and a fraction of the bytes).
    transfer_dtype: str = "float32"


@functools.partial(jax.jit, static_argnames=("out_size", "negate"))
def _augment_evg(evg, params, *, out_size: int, negate: bool):
    return apply_view_augment(
        evg, params, (out_size, out_size), "nearest", negate_on_tflip=negate
    )


@functools.partial(jax.jit, static_argnames=("out_size",))
def _augment_frame(frames, params, *, out_size: int):
    return apply_frame_augment(frames, params, (out_size, out_size), "bicubic")


class PretrainPipeline:
    """Yields batches {'evg', 'frame'?, 'clip_emb'?} ready for the step fns."""

    def __init__(
        self,
        source: PretrainSource,
        cfg: PretrainDataConfig,
        batch_size: int,
        train: bool = True,
        seed: int = 0,
        num_workers: int = 8,
    ):
        self.source = source
        self.cfg = cfg
        self.batch_size = batch_size
        self.train = train
        self.rng = np.random.default_rng(seed)
        from eventpretrain_tpu.data.io_pool import make_pool

        self._pool = make_pool(num_workers)

    def __len__(self) -> int:
        return len(self.source) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        cfg = self.cfg
        order = np.arange(len(self.source))
        if self.train:
            self.rng.shuffle(order)
        bs = self.batch_size
        need_frame = cfg.pr_phase in ("rec", "rec+con")
        need_clip = cfg.pr_phase in ("adj", "con", "rec+con")
        from eventpretrain_tpu.data.io_pool import map_loads

        import ml_dtypes

        tdtype = (
            ml_dtypes.bfloat16 if cfg.transfer_dtype == "bfloat16"
            else np.float32
        )
        for b in range(len(self)):
            idx = order[b * bs : (b + 1) * bs]
            evgs, frames, clips = [], [], []
            for item in map_loads(self.source.load, idx, self._pool):
                evg = np.asarray(item["evg"], np.float32)
                if cfg.num_bins == 1:
                    evg = evg.sum(axis=-1, keepdims=True)
                evgs.append(evg.astype(tdtype))
                if need_frame:
                    frames.append(np.asarray(item["frame"], np.float32))
                if need_clip:
                    clips.append(np.asarray(item["clip_emb"], np.float32))
            evg = jnp.asarray(np.stack(evgs))
            h, w = evg.shape[1], evg.shape[2]
            if self.train:
                params = sample_view_params(
                    self.rng, len(idx), h, w, scale_min=cfg.crop_min
                )
            else:
                params = identity_view_params(len(idx), h, w)
            batch = {
                "evg": _augment_evg(
                    evg, params, out_size=cfg.input_size,
                    negate=cfg.num_bins in (5, 6),
                )
            }
            if need_frame:
                batch["frame"] = _augment_frame(
                    jnp.asarray(np.stack(frames)), params,
                    out_size=cfg.input_size,
                )
            if need_clip:
                batch["clip_emb"] = jnp.asarray(np.stack(clips))
            yield batch


def _load_tensor(path: str) -> np.ndarray:
    if path.endswith(".pt"):
        import torch

        return torch.load(path, map_location="cpu", weights_only=False).numpy()
    return np.load(path)


class EFImageNetSource:
    """Reference EF-ImageNet layout (pr_ef_imagenet_dataset.py:120-182):

    root/<class>/<image>/{<noisy_dir>/<image>_0K_noisy_events_voxel_grid.pt,
                          <sub_frames_dir>/<image>_0K_sub_frame.pt,
                          <image>_clip_emb.pt}
    Tensors stored CHW are transposed to channels-last.
    """

    def __init__(
        self,
        root: str,
        pr_phase: str = "rec",
        noisy_events_dir: str = "events/noisy",
        sub_frames_dir: str = "sub_frames",
        num_frames: int = 10,
        seed: int = 0,
        fixed_frame: Optional[int] = None,
    ):
        import threading

        self.root = root
        self.pr_phase = pr_phase
        self.noisy_events_dir = noisy_events_dir
        self.sub_frames_dir = sub_frames_dir
        self.num_frames = num_frames
        self.seed = seed
        # pin the frame index (reference PretrainEFImageNetTestDataset uses
        # frame 7, pr_ef_imagenet_dataset.py:300-303); None = random per visit
        self.fixed_frame = fixed_frame
        # frame choice is derived from (seed, index, visit) so parallel
        # pool loads stay deterministic regardless of thread interleaving
        # (a shared np.Generator would make epochs depend on load order)
        self._visits: dict[int, int] = {}
        self._visits_lock = threading.Lock()
        self.items: list[tuple[str, str]] = []  # (class_dir, image_name)
        for cls in sorted(os.listdir(root)):
            for image_name in sorted(os.listdir(os.path.join(root, cls))):
                self.items.append((cls, image_name))

    def __len__(self) -> int:
        return len(self.items)

    @staticmethod
    def _to_hwc(arr: np.ndarray) -> np.ndarray:
        # stored (C,H,W) with small C
        if arr.ndim == 3 and arr.shape[0] < arr.shape[-1]:
            return arr.transpose(1, 2, 0)
        return arr

    def load(self, index: int) -> dict:
        cls, image_name = self.items[index]
        base = os.path.join(self.root, cls, image_name)
        if self.fixed_frame is not None:
            frame_index = int(self.fixed_frame)
        else:
            with self._visits_lock:
                visit = self._visits.get(index, 0)
                self._visits[index] = visit + 1
            frame_index = int(
                np.random.default_rng([self.seed, index, visit]).integers(
                    0, self.num_frames
                )
            )
        evg = _load_tensor(
            os.path.join(
                base, self.noisy_events_dir,
                f"{image_name}_0{frame_index}_noisy_events_voxel_grid.pt",
            )
        )
        out = {"evg": self._to_hwc(evg)}
        if self.pr_phase in ("rec", "rec+con"):
            frame = _load_tensor(
                os.path.join(
                    base, self.sub_frames_dir,
                    f"{image_name}_0{frame_index}_sub_frame.pt",
                )
            )
            out["frame"] = self._to_hwc(frame)
        if self.pr_phase in ("adj", "con", "rec+con"):
            clip = _load_tensor(os.path.join(base, f"{image_name}_clip_emb.pt"))
            out["clip_emb"] = np.squeeze(clip)
        return out


class SyntheticPretrainSource:
    """Structured synthetic voxel grids + difference frames for smoke runs.

    The sub-frame is a deterministic function of the grid (per-pixel net
    polarity), so the reconstruction loss has learnable signal.
    """

    def __init__(self, n: int = 64, size: int = 224, num_bins: int = 5,
                 clip_dim: int = 512, clip_tokens: int = 197, seed: int = 0):
        self.n = n
        self.size = size
        self.num_bins = num_bins
        self.clip_dim = clip_dim
        self.clip_tokens = clip_tokens
        self.seed = seed

    def __len__(self) -> int:
        return self.n

    def load(self, index: int) -> dict:
        rng = np.random.default_rng(self.seed + index)
        s = self.size
        # a few gaussian blobs of signed events
        evg = np.zeros((s, s, self.num_bins), np.float32)
        yy, xx = np.mgrid[0:s, 0:s]
        for _ in range(4):
            cy, cx = rng.uniform(0.2 * s, 0.8 * s, 2)
            sig = rng.uniform(0.03 * s, 0.1 * s)
            blob = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig ** 2))
            sign = rng.choice([-1.0, 1.0])
            for c in range(self.num_bins):
                evg[..., c] += sign * blob * rng.uniform(0.5, 1.5)
        frame = evg.sum(axis=-1, keepdims=True) / self.num_bins
        clip = rng.normal(size=(self.clip_tokens, self.clip_dim)).astype(
            np.float32
        )
        return {"evg": evg, "frame": frame, "clip_emb": clip}


class EcdpPretrainPipeline:
    """Two independently-augmented views + CLIP cls embedding.

    Equivalent of reference PretrainECDPEFImageNetDataset
    (pr_ef_imagenet_dataset.py:246-298): q/k views of the same grid with
    independent crop/flip draws; clip_emb is the CLS token (B, 512).
    """

    def __init__(self, source, cfg: PretrainDataConfig, batch_size: int,
                 train: bool = True, seed: int = 0, num_workers: int = 8):
        self.source = source
        self.cfg = cfg
        self.batch_size = batch_size
        self.train = train
        self.rng = np.random.default_rng(seed)
        from eventpretrain_tpu.data.io_pool import make_pool

        self._pool = make_pool(num_workers)

    def __len__(self):
        return len(self.source) // self.batch_size

    def __iter__(self):
        cfg = self.cfg
        order = np.arange(len(self.source))
        if self.train:
            self.rng.shuffle(order)
        bs = self.batch_size
        for b in range(len(self)):
            idx = order[b * bs : (b + 1) * bs]
            # q and k each come from their OWN source.load so sources with
            # stochastic windows give the two views independent event windows
            # (reference pr_ef_imagenet_dataset.py:258-283 calls the loader
            # once per view); clip_emb comes from the q load
            from eventpretrain_tpu.data.io_pool import map_loads

            evgs_qk, clips = ([], []), []
            # one pool round per view: each index appears once per round, so
            # per-(index, visit) frame draws stay deterministic under threads
            for v in range(2):
                for item in map_loads(self.source.load, idx, self._pool):
                    evgs_qk[v].append(np.asarray(item["evg"], np.float32))
                    if v == 0:
                        clip = np.asarray(item["clip_emb"], np.float32)
                        clips.append(clip[0] if clip.ndim == 2 else clip)
            negate = cfg.num_bins in (5, 6)
            views = []
            for v in range(2):
                evg = jnp.asarray(np.stack(evgs_qk[v]))
                h, w = evg.shape[1], evg.shape[2]
                params = (
                    sample_view_params(self.rng, len(idx), h, w,
                                       scale_min=cfg.crop_min)
                    if self.train else identity_view_params(len(idx), h, w)
                )
                views.append(
                    _augment_evg(evg, params, out_size=cfg.input_size,
                                 negate=negate)
                )
            # per-image normalization x/(amax+1), (x-0.5)*2 (reference
            # pr_n_imagenet_dataset.py:125-181 ECDP variant)
            def norm(v):
                amax = v.max(axis=(1, 2), keepdims=True)
                return (v / (amax + 1.0) - 0.5) * 2.0

            yield {
                "img_q": norm(views[0]),
                "img_k": norm(views[1]),
                "clip_emb": jnp.asarray(np.stack(clips)),
            }


# ---------------------------------------------------------------------------
# Raw N-ImageNet path (adj-n / con-n): raw event streams + paired RGB images,
# CLIP embeddings computed in-loop on device.
# ---------------------------------------------------------------------------


class NImageNetPairedSource:
    """Raw N-ImageNet ``.npz`` event streams + paired ImageNet JPEGs.

    Mirrors reference dataset/pretrain/pr_n_imagenet_dataset.py:18-75
    (NImageNetDataset.load_events: structured ``event_data`` arrays with
    x/y/t/p fields, timestamps scaled to seconds) and
    PretrainNImageNetDataset.load_image (:69-74): the image with the same
    name under ``imagenet_root/<class>/<name>.JPEG`` run through the CLIP
    preprocess (bicubic resize of the short side to 224 + center crop; the
    normalize step runs on device in models/clip.py preprocess_images).
    """

    SENSOR_HW = (480, 640)

    def __init__(self, n_imagenet_root: str, imagenet_root: str = None,
                 num_classes: Optional[int] = None,
                 clip_emb_root: Optional[str] = None):
        """``imagenet_root``: paired JPEGs for in-loop CLIP encoding;
        ``clip_emb_root``: precomputed <class>/<name>/<name>_clip_emb.pt
        tree instead (the reference's --imagenet_clip_emb_root intent —
        its PretrainECDPNImageNetDataset.load_clip_emb reads an attribute
        that is never assigned, pr_n_imagenet_dataset.py:118; implemented
        here as it was evidently meant to work). Exactly one must be set."""
        assert (imagenet_root is None) != (clip_emb_root is None), (
            "pass exactly one of imagenet_root / clip_emb_root"
        )
        self.n_imagenet_root = n_imagenet_root
        self.imagenet_root = imagenet_root
        self.clip_emb_root = clip_emb_root
        classes = sorted(os.listdir(n_imagenet_root))
        if num_classes is not None:
            classes = classes[:num_classes]
        self.files = []
        for cls in classes:
            for f in sorted(os.listdir(os.path.join(n_imagenet_root, cls))):
                if f.endswith(".npz"):
                    self.files.append((cls, f[:-4]))

    def __len__(self) -> int:
        return len(self.files)

    def load(self, index: int) -> dict:
        cls, name = self.files[index]
        raw = np.load(os.path.join(self.n_imagenet_root, cls, name + ".npz"))
        ev = raw["event_data"]
        events = np.stack(
            [ev["x"], ev["y"], ev["t"].astype(np.float64) / 1e6, ev["p"]],
            axis=1,
        ).astype(np.float64)
        out = {"events": events, "hw": self.SENSOR_HW}
        if self.clip_emb_root is not None:
            emb = _load_tensor(os.path.join(
                self.clip_emb_root, cls, name, name + "_clip_emb.pt"
            ))
            out["clip_emb"] = np.squeeze(np.asarray(emb, np.float32))
        else:
            out["image"] = self._load_image(cls, name)
        return out

    def _load_image(self, cls: str, name: str) -> np.ndarray:
        from PIL import Image

        path = os.path.join(self.imagenet_root, cls, name + ".JPEG")
        img = Image.open(path).convert("RGB")
        w, h = img.size
        scale = 224 / min(w, h)
        img = img.resize((round(w * scale), round(h * scale)),
                         Image.Resampling.BICUBIC)
        w, h = img.size
        left, top = (w - 224) // 2, (h - 224) // 2
        return np.asarray(img.crop((left, top, left + 224, top + 224)),
                          np.uint8)


class SyntheticRawPretrainSource:
    """Synthetic raw event streams + paired images for smoke runs."""

    def __init__(self, n: int = 64, hw: tuple = (128, 128),
                 num_events: int = 8192, seed: int = 0):
        self.n = n
        self.hw = hw
        self.num_events = num_events
        self.seed = seed

    def __len__(self) -> int:
        return self.n

    def load(self, index: int) -> dict:
        rng = np.random.default_rng(self.seed + index)
        h, w = self.hw
        n = self.num_events
        events = np.stack([
            rng.uniform(0, w - 1, n),
            rng.uniform(0, h - 1, n),
            np.sort(rng.uniform(0, 0.05, n)),
            rng.choice([-1.0, 1.0], n),
        ], axis=1)
        image = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
        return {"events": events, "image": image, "hw": self.hw}


def _rescale_packed_coords(packed: np.ndarray, hws, out_size: int) -> None:
    """In-place x/y rescale of a packed (B, E, 4) batch from per-sample
    sensor sizes to ``out_size`` (reference events_augment.py:22-26
    events_reshape, applied at pr_n_imagenet_dataset.py:85-86,137-138,156-157
    AFTER the stream augment and BEFORE rasterizing at input resolution)."""
    hw = np.asarray(hws, np.float32)  # (B, 2) = (h, w)
    packed[:, :, 0] *= (out_size / hw[:, 1])[:, None]
    packed[:, :, 1] *= (out_size / hw[:, 0])[:, None]


class RawPretrainPipeline:
    """Raw-event pretrain batches {'evg', 'image'} for the -n phases.

    Host: random fixed-count window (reference events_augment.py:5-20),
    erase/add stream augmentation (at sensor size), coordinate rescale to
    input resolution (events_reshape), fixed-capacity packing + compact
    codec. Device: voxelize at the input-size canvas + fused
    crop/resize/flip view augment (one jitted program, shared with the cls
    pipeline) — the reference's exact composition
    (pr_n_imagenet_dataset.py:80-89: window -> augment -> reshape ->
    voxelize at input_size -> evg_augment). The paired image rides along
    for in-loop CLIP encoding (ClipEncodingPipeline).
    """

    def __init__(self, source, cfg: "RawPretrainDataConfig",
                 batch_size: int, train: bool = True, seed: int = 0,
                 num_workers: int = 8):
        self.source = source
        self.cfg = cfg
        self.batch_size = batch_size
        self.train = train
        self.rng = np.random.default_rng(seed)
        self._pack_buffers = [None, None]
        self._pack_i = 0
        self._enc_buffers = [None, None]
        from eventpretrain_tpu.data.io_pool import make_pool

        self._pool = make_pool(num_workers)

    def __len__(self) -> int:
        return max(len(self.source) // self.batch_size, 1)

    def __iter__(self) -> Iterator[dict]:
        from eventpretrain_tpu.data.cls_pipeline import _device_preprocess
        from eventpretrain_tpu.data.codec import encode_for_transfer
        from eventpretrain_tpu.data.event_transforms import (
            erase_and_add_events,
        )
        from eventpretrain_tpu.native import (
            augment_pack_event_batch, pack_event_batch,
        )

        cfg = self.cfg
        order = np.arange(len(self.source))
        if self.train:
            self.rng.shuffle(order)
        bs = self.batch_size
        cap = cfg.fix_events_num
        augmenting = self.train and cfg.stream_augment
        # +1% packing headroom: erase_and_add may grow a full window
        pack_cap = cap + max(cap // 100, 1) if augmenting else cap
        for b in range(len(self)):
            idx = order[b * bs : (b + 1) * bs]
            streams, windows, hws, images = [], [], [], []
            from eventpretrain_tpu.data.io_pool import map_loads

            # loads (npz decode + JPEG decode) fan over the pool; the
            # window draws below stay on this thread in index order
            for item in map_loads(self.source.load, idx, self._pool):
                ev = np.asarray(item["events"])
                n = ev.shape[0]
                if self.train and n > cap:
                    start = int(self.rng.integers(0, n - cap))
                else:
                    start = 0
                windows.append((start, min(start + cap, n)))
                streams.append(ev.astype(np.float32))
                hws.append(tuple(item["hw"]))
                images.append(np.asarray(item["image"], np.uint8))
            self._pack_i ^= 1
            if augmenting:
                seeds = self.rng.integers(0, 2 ** 63, len(idx))
                native_out = augment_pack_event_batch(
                    streams, windows, hws, pack_cap, seeds,
                    out=self._pack_buffers[self._pack_i],
                )
                if native_out is not None:
                    packed, counts = native_out
                else:
                    py = [
                        erase_and_add_events(
                            self.rng, s[w[0]:w[1]].astype(np.float64), hw
                        ).astype(np.float32)
                        for s, w, hw in zip(streams, windows, hws)
                    ]
                    packed, counts = pack_event_batch(
                        py, pack_cap, out=self._pack_buffers[self._pack_i]
                    )
            else:
                packed, counts = pack_event_batch(
                    [s[w[0]:w[1]] for s, w in zip(streams, windows)], pack_cap,
                    out=self._pack_buffers[self._pack_i],
                )
            self._pack_buffers[self._pack_i] = packed
            # events_reshape: rasterize at input resolution, not the sensor
            # canvas (reference pr_n_imagenet_dataset.py:85-87)
            _rescale_packed_coords(packed, hws, cfg.input_size)
            size = cfg.input_size
            if self.train:
                params = sample_view_params(
                    self.rng, len(idx), size, size, scale_min=cfg.crop_min,
                )
            else:
                params = identity_view_params(len(idx), size, size)
            dev_events, dev_t_range, self._enc_buffers[self._pack_i] = (
                encode_for_transfer(
                    packed, counts, cfg.compact_transfer,
                    out=self._enc_buffers[self._pack_i],
                    codec=cfg.transfer_codec,
                )
            )
            evg = _device_preprocess(
                dev_events,
                jnp.asarray(counts),
                jnp.asarray(
                    np.full((len(idx), 2), size, np.int32)
                ),
                params,
                num_bins=cfg.num_bins,
                height=size,
                width=size,
                out_size=size,
                mode="nearest",
                use_evrep=False,
                t_range=dev_t_range,
            )
            yield {"evg": evg, "image": jnp.asarray(np.stack(images))}


class EcdpRawPretrainPipeline:
    """Raw N-ImageNet ECDP q/k batches (reference PretrainECDPNImageNetDataset,
    pr_n_imagenet_dataset.py:109-181).

    Each view draws its OWN window + stream augment from the once-loaded
    raw stream, rescales coordinates to input resolution, builds the
    2-channel ECDP count image on device, applies an independent
    crop/resize/flip view augment and the per-image normalization
    ``x/(amax+1), (x-0.5)*2`` (all inside the shared _device_preprocess
    with num_bins=2). Yields {'img_q', 'img_k', 'image'} for in-loop CLIP
    (ClipEncodingPipeline maps image -> clip_emb) or {'img_q', 'img_k',
    'clip_emb'} when the source provides precomputed embeddings.
    """

    def __init__(self, source, cfg: "RawPretrainDataConfig",
                 batch_size: int, train: bool = True, seed: int = 0,
                 num_workers: int = 8):
        self.source = source
        self.cfg = cfg
        self.batch_size = batch_size
        self.train = train
        self.rng = np.random.default_rng(seed)
        self._pack_buffers = [None, None, None, None]
        self._pack_i = 0
        from eventpretrain_tpu.data.io_pool import make_pool

        self._pool = make_pool(num_workers)

    def __len__(self) -> int:
        return max(len(self.source) // self.batch_size, 1)

    def _one_view(self, streams, hws):
        """Window + stream-augment + rescale + pack one view of the batch."""
        from eventpretrain_tpu.data.event_transforms import (
            erase_and_add_events,
        )
        from eventpretrain_tpu.native import (
            augment_pack_event_batch, pack_event_batch,
        )

        cfg = self.cfg
        cap = cfg.fix_events_num
        augmenting = self.train and cfg.stream_augment
        # erase_and_add can grow a full window by up to 1% (reference keeps
        # every added event); pack with that headroom
        pack_cap = cap + max(cap // 100, 1) if augmenting else cap
        windows = []
        for ev in streams:
            n = ev.shape[0]
            if n > cap:
                start = int(self.rng.integers(0, n - cap))
            else:
                start = 0
            windows.append((start, min(start + cap, n)))
        self._pack_i = (self._pack_i + 1) % len(self._pack_buffers)
        buf = self._pack_buffers[self._pack_i]
        if augmenting:
            seeds = self.rng.integers(0, 2 ** 63, len(streams))
            native_out = augment_pack_event_batch(
                streams, windows, hws, pack_cap, seeds, out=buf,
            )
            if native_out is not None:
                packed, counts = native_out
            else:
                py = [
                    erase_and_add_events(
                        self.rng, s[w[0]:w[1]].astype(np.float64), hw
                    ).astype(np.float32)
                    for s, w, hw in zip(streams, windows, hws)
                ]
                packed, counts = pack_event_batch(py, pack_cap, out=buf)
        else:
            packed, counts = pack_event_batch(
                [s[w[0]:w[1]] for s, w in zip(streams, windows)], pack_cap,
                out=buf,
            )
        self._pack_buffers[self._pack_i] = packed
        _rescale_packed_coords(packed, hws, cfg.input_size)
        size = cfg.input_size
        if self.train:
            params = sample_view_params(
                self.rng, len(streams), size, size, scale_min=cfg.crop_min,
            )
        else:
            params = identity_view_params(len(streams), size, size)
        from eventpretrain_tpu.data.cls_pipeline import _device_preprocess

        return _device_preprocess(
            jnp.asarray(packed),
            jnp.asarray(counts),
            jnp.asarray(np.full((len(streams), 2), size, np.int32)),
            params,
            num_bins=2,
            height=size,
            width=size,
            out_size=size,
            mode="nearest",
        )

    def __iter__(self) -> Iterator[dict]:
        from eventpretrain_tpu.data.io_pool import map_loads

        cfg = self.cfg
        order = np.arange(len(self.source))
        if self.train:
            self.rng.shuffle(order)
        bs = self.batch_size
        for b in range(len(self)):
            idx = order[b * bs : (b + 1) * bs]
            streams, hws, extras = [], [], []
            for item in map_loads(self.source.load, idx, self._pool):
                streams.append(
                    np.ascontiguousarray(item["events"], np.float32)
                )
                hws.append(tuple(item["hw"]))
                if "clip_emb" in item:
                    emb = np.asarray(item["clip_emb"], np.float32)
                    # ECDP consumes the CLS embedding (B, 512); trees store
                    # the full (197, 512) token grid
                    extras.append(emb[0] if emb.ndim == 2 else emb)
                else:
                    extras.append(np.asarray(item["image"], np.uint8))
            img_q = self._one_view(streams, hws)
            img_k = self._one_view(streams, hws)
            out = {"img_q": img_q, "img_k": img_k}
            key = "clip_emb" if extras and extras[0].ndim == 1 else "image"
            out[key] = jnp.asarray(np.stack(extras))
            yield out


@dataclasses.dataclass(frozen=True)
class RawPretrainDataConfig:
    num_bins: int = 5
    input_size: int = 224
    crop_min: float = 0.8
    fix_events_num: int = 30000
    canvas_height: int = 480
    canvas_width: int = 640
    stream_augment: bool = True
    compact_transfer: bool = True
    transfer_codec: str = "u32"


class ClipEncodingPipeline:
    """Wraps a {'evg', 'image'} pipeline; emits {'evg', 'clip_emb'}.

    The TPU-native form of the reference's in-loop CLIP encoding
    (pr_trainer.py:176-179: ``clip_model.encode_image(image_preprocess)``
    inside the epoch loop): the frozen CLIP visual tower runs as its own
    jitted program per batch, producing the (B, 197, 512) projected token
    sequence the adj/con objectives consume.
    """

    def __init__(self, inner, clip_model, clip_params, dtype=jnp.float32,
                 cls_only: bool = False):
        self.inner = inner
        self.clip_model = clip_model
        self.clip_params = clip_params
        # ECDP consumes only the projected CLS embedding (B, 512)
        # (reference pr_ecdp_hub_model.py:99 clip_emb Linear on the pooled
        # embedding); adj/con consume the full (B, 197, 512) token grid
        self.cls_only = cls_only

        @jax.jit
        def encode(params, images):
            from eventpretrain_tpu.models.clip import preprocess_images

            x = images.astype(jnp.float32)
            if images.dtype == jnp.uint8:
                x = x / 255.0
            return clip_model.apply({"params": params},
                                    preprocess_images(x))

        self._encode = encode

    def __len__(self) -> int:
        return len(self.inner)

    def __iter__(self) -> Iterator[dict]:
        for batch in self.inner:
            out = {k: v for k, v in batch.items() if k != "image"}
            emb = self._encode(self.clip_params, batch["image"])
            out["clip_emb"] = emb[:, 0, :] if self.cls_only else emb
            yield out
