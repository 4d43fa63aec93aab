"""Classification input pipeline: host windowing -> device rasterize+augment.

TPU-native redesign of the reference's DataLoader-worker hot path (reference
dataset/finetune_cls/ft_n_cars_dataset.py:54-107 and siblings): the host only
decodes files, picks the fixed-count window, applies the (cheap, variable
-length) event-stream augmentation and pads; rasterization, view augmentation
and normalization run as ONE jitted batched program on device
(see data/representations.py, ops/view_augment.py).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Iterator, Optional, Protocol, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from eventpretrain_tpu.data.event_transforms import (
    random_window,
    erase_and_add_events,
    add_noise_events,
)
from eventpretrain_tpu.data.codec import encode_for_transfer, decode_events_u16
from eventpretrain_tpu.native import pack_event_batch, augment_pack_event_batch
from eventpretrain_tpu.data.representations import (
    build_representation,
    normalize_representation,
    num_channels,
)
from eventpretrain_tpu.ops.view_augment import (
    ViewParams,
    sample_crop,
    apply_view_augment,
)


class EventClsSource(Protocol):
    """A classification dataset: indexable (events_xytp, label) pairs."""

    def __len__(self) -> int: ...

    def load(self, index: int) -> tuple[np.ndarray, int]: ...


@dataclasses.dataclass(frozen=True)
class ClsDataConfig:
    num_classes: int
    num_bins: int = 5
    input_size: int = 224
    fix_events_num: int = 30000
    val_fix_events_num: int = 30000
    canvas_height: int = 128        # >= dataset max sensor height
    canvas_width: int = 128
    # reference cls datasets resize the grid with args.resize_mode,
    # default 'bilinear' (main_finetune_cls.py:48, ft_n_cars_dataset.py:85-87)
    resize_mode: str = "bilinear"
    crop_min: float = 0.8
    infer_sensor_size: bool = True  # N-Cars: from event maxima (ref :64)
    event_noise: bool = False       # robustness eval (--val_event_noise)
    stream_augment: bool = True     # erase_and_add in training
    use_evrep: bool = False         # EvRepSL 3-channel representation
    compact_transfer: bool = True   # compact event codec (see data/codec.py)
    transfer_codec: str = "u32"     # "u32" (4 B/event) | "u16" (8 B/event)
    # true sensor size for the stream augment when it differs from the
    # raster canvas (only meaningful with rescale_to_input != "never")
    sensor_height: Optional[int] = None
    sensor_width: Optional[int] = None
    # reference events_reshape placement (events_augment.py:22-26): some
    # datasets rescale event coords sensor -> input AFTER the stream augment
    # and raster at input resolution. "always": every representation
    # (N-ImageNet, ft_n_imagenet_dataset.py:92-93); "ecdp": num_bins == 2
    # only (CIFAR10-DVS :69-72, DVS128 :73-76, UCF101 :75-78); "never":
    # raster at sensor size (N-Cars, N-Caltech101, ES-ImageNet)
    rescale_to_input: str = "never"
    # EvRep receives microsecond timestamps (ft_n_caltech101_dataset.py:
    # 79-80 passes t * 1e6); the source streams carry seconds
    evrep_time_scale: float = 1e6

    @property
    def rescale_active(self) -> bool:
        return self.rescale_to_input == "always" or (
            self.rescale_to_input == "ecdp" and self.num_bins == 2
        )


@functools.partial(
    jax.jit,
    static_argnames=("num_bins", "height", "width", "out_size", "mode",
                     "use_evrep", "evrep_time_scale"),
)
def _device_preprocess(
    events,
    counts,
    sensor_hw,
    params: ViewParams,
    *,
    num_bins: int,
    height: int,
    width: int,
    out_size: int,
    mode: str,
    use_evrep: bool = False,
    t_range=None,
    evrep_time_scale: float = 1e6,
):
    if events.dtype == jnp.uint16:
        events = decode_events_u16(events, t_range)
    elif events.dtype == jnp.uint32:
        from eventpretrain_tpu.data.codec import decode_events_u32

        events = decode_events_u32(events, t_range)
    if use_evrep and evrep_time_scale != 1.0:
        # reference feeds EvRep microsecond timestamps (ft_n_caltech101
        # _dataset.py:79-80); streams carry seconds
        events = events * jnp.asarray(
            [1.0, 1.0, evrep_time_scale, 1.0], events.dtype
        )
    evg = build_representation(
        events, counts, num_bins=num_bins, height=height, width=width,
        sensor_hw=sensor_hw, use_evrep=use_evrep,
    )
    evg = apply_view_augment(
        evg, params, (out_size, out_size), mode,
        negate_on_tflip=(not use_evrep) and num_bins in (5, 6),
    )
    if use_evrep:
        return evg
    return normalize_representation(evg, num_bins)


class ClsPipeline:
    """Iterates device-ready batches {'evg': (B,S,S,C), 'label': (B,)}."""

    def __init__(
        self,
        source: EventClsSource,
        cfg: ClsDataConfig,
        batch_size: int,
        train: bool,
        seed: int = 0,
        drop_last: Optional[bool] = None,
        num_workers: int = 8,
    ):
        self.source = source
        self.cfg = cfg
        self.batch_size = batch_size
        self.train = train
        self.rng = np.random.default_rng(seed)
        self._pack_buffers = [None, None]  # rotate to dodge page faults
        self._pack_i = 0
        self._enc_buffers = [None, None]
        self.drop_last = train if drop_last is None else drop_last
        from eventpretrain_tpu.data.io_pool import make_pool

        self._pool = make_pool(num_workers)

    def __len__(self) -> int:
        n = len(self.source)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _augmenting(self) -> bool:
        cfg = self.cfg
        return (self.train and cfg.stream_augment) or (
            not self.train and cfg.event_noise
        )

    def _batch_loads(self, idx):
        """Fan the rng-free ``source.load`` calls over the IO pool; the
        random-window draws happen afterwards on this thread in index
        order, so the rng stream is identical to sequential loading."""
        from eventpretrain_tpu.data.io_pool import map_loads

        return map_loads(self.source.load, idx, self._pool)

    def _load_sample(self, index: int, loaded=None):
        """Returns (raw float32 stream, (start, end) window, (h, w), label)."""
        cfg = self.cfg
        events, label = (
            self.source.load(index) if loaded is None else loaded
        )
        events = np.ascontiguousarray(events, np.float32)
        cap = cfg.fix_events_num if self.train else cfg.val_fix_events_num
        start, end = random_window(self.rng, events.shape[0], cap)

        if cfg.infer_sensor_size:
            view = events[start:end]
            sensor_h = int(view[:, 1].max()) + 1
            sensor_w = int(view[:, 0].max()) + 1
        elif cfg.sensor_height is not None:
            sensor_h, sensor_w = cfg.sensor_height, cfg.sensor_width
        else:
            sensor_h, sensor_w = cfg.canvas_height, cfg.canvas_width
        if not cfg.rescale_active:
            # the sensor region must fit the raster canvas; with an active
            # rescale the raster happens at input_size instead, so the true
            # (possibly larger) sensor size is kept for the stream augment
            sensor_h = min(sensor_h, cfg.canvas_height)
            sensor_w = min(sensor_w, cfg.canvas_width)
        return events, (start, end), (sensor_h, sensor_w), label

    def _prepare_sample(self, index: int, loaded=None):
        """Python fallback path: window + augment one sample."""
        events, (start, end), hw, label = self._load_sample(index, loaded)
        events = events[start:end].astype(np.float64)
        if self._augmenting():
            events = erase_and_add_events(self.rng, events, hw)
        return events.astype(np.float32), hw, label

    def _sample_view(self, sensor_hw: Sequence[tuple[int, int]]) -> ViewParams:
        cfg = self.cfg
        boxes, hflips, tflips = [], [], []
        for h, w in sensor_hw:
            if self.train:
                boxes.append(sample_crop(self.rng, h, w, (cfg.crop_min, 1.0)))
                hflips.append(self.rng.random() < 0.5)
                tflips.append(self.rng.random() < 0.5)
            else:
                boxes.append((0, 0, h, w))
                hflips.append(False)
                tflips.append(False)
        boxes = np.asarray(boxes, np.int32)
        return ViewParams(
            crop_y=jnp.asarray(boxes[:, 0]),
            crop_x=jnp.asarray(boxes[:, 1]),
            crop_h=jnp.asarray(boxes[:, 2]),
            crop_w=jnp.asarray(boxes[:, 3]),
            hflip=jnp.asarray(np.asarray(hflips)),
            tflip=jnp.asarray(np.asarray(tflips)),
        )

    def __iter__(self) -> Iterator[dict]:
        cfg = self.cfg
        cap = cfg.fix_events_num if self.train else cfg.val_fix_events_num
        if self._augmenting():
            # erase_and_add can GROW a full window by up to int(0.01 * n)
            # events (reference events_augment.py:38-52 keeps them all);
            # give the packed capacity that headroom so no events are clipped
            cap = cap + max(cap // 100, 1)
        order = np.arange(len(self.source))
        if self.train:
            self.rng.shuffle(order)
        bs = self.batch_size
        num_batches = len(self)
        for b in range(num_batches):
            idx = order[b * bs : (b + 1) * bs]
            num_valid = len(idx)
            if len(idx) < bs:  # pad tail batch by wrapping; num_valid marks
                # the real samples so eval weighting skips the pads
                idx = np.concatenate([idx, order[: bs - len(idx)]])
            self._pack_i ^= 1
            if self._augmenting():
                # fused native augment+pack (single pass, thread-parallel);
                # numpy per-sample fallback when the library is unavailable
                streams, windows, hws, labels = [], [], [], []
                for i, loaded in zip(idx, self._batch_loads(idx)):
                    stream, window, hw, label = self._load_sample(
                        int(i), loaded
                    )
                    streams.append(stream)
                    windows.append(window)
                    hws.append(hw)
                    labels.append(label)
                seeds = self.rng.integers(0, 2 ** 63, len(idx))
                native_out = augment_pack_event_batch(
                    streams, windows, hws, cap, seeds,
                    out=self._pack_buffers[self._pack_i],
                )
                if native_out is not None:
                    packed, counts = native_out
                else:
                    py_streams = [
                        erase_and_add_events(
                            self.rng,
                            s[w[0]:w[1]].astype(np.float64), hw
                        ).astype(np.float32)
                        for s, w, hw in zip(streams, windows, hws)
                    ]
                    packed, counts = pack_event_batch(
                        py_streams, cap, out=self._pack_buffers[self._pack_i]
                    )
            else:
                streams, hws, labels = [], [], []
                for i, loaded in zip(idx, self._batch_loads(idx)):
                    stream, hw, label = self._prepare_sample(int(i), loaded)
                    streams.append(stream)
                    hws.append(hw)
                    labels.append(label)
                packed, counts = pack_event_batch(
                    streams, cap, out=self._pack_buffers[self._pack_i]
                )
            self._pack_buffers[self._pack_i] = packed
            if cfg.rescale_active:
                # reference events_reshape (events_augment.py:22-26) AFTER
                # the stream augment: scale coords sensor -> input and raster
                # at input resolution (padded rows are zeros; 0 * s == 0).
                # The multiply runs in f64 and the result is floored on the
                # host: every downstream rasterizer truncates coords anyway
                # (reference .long()), and f32 storage of the f64 product
                # could round 223.999... up across a pixel boundary
                hw_arr = np.asarray(hws, np.float64)
                sx = (cfg.input_size / hw_arr[:, 1])[:, None]
                sy = (cfg.input_size / hw_arr[:, 0])[:, None]
                packed[:, :, 0] = np.floor(
                    packed[:, :, 0].astype(np.float64) * sx
                )
                packed[:, :, 1] = np.floor(
                    packed[:, :, 1].astype(np.float64) * sy
                )
                hws = [(cfg.input_size, cfg.input_size)] * len(hws)
            params = self._sample_view(hws)
            dev_events, dev_t_range, self._enc_buffers[self._pack_i] = (
                encode_for_transfer(
                    packed, counts,
                    cfg.compact_transfer and not cfg.use_evrep,
                    out=self._enc_buffers[self._pack_i],
                    codec=cfg.transfer_codec,
                )
            )
            evg = _device_preprocess(
                dev_events,
                jnp.asarray(counts),
                jnp.asarray(np.asarray(hws, np.int32)),
                params,
                num_bins=cfg.num_bins,
                height=cfg.canvas_height,
                width=cfg.canvas_width,
                out_size=cfg.input_size,
                mode=cfg.resize_mode,
                use_evrep=cfg.use_evrep,
                t_range=dev_t_range,
                evrep_time_scale=cfg.evrep_time_scale,
            )
            yield {
                "evg": evg,
                "label": jnp.asarray(np.asarray(labels, np.int32)),
                "num_valid": jnp.asarray(num_valid, jnp.int32),
            }


class NCarsSource:
    """N-Cars directory layout: root/<class>/<class>_*.npy with xytp rows.

    Reference dataset/finetune_cls/ft_n_cars_dataset.py:15-52.
    """

    def __init__(self, root: str):
        self.root = root
        self.classes = sorted(os.listdir(root))
        self.files: list[tuple[str, int]] = []
        for label, cls in enumerate(self.classes):
            cls_dir = os.path.join(root, cls)
            for name in sorted(os.listdir(cls_dir)):
                self.files.append((os.path.join(cls_dir, name), label))

    def __len__(self) -> int:
        return len(self.files)

    def load(self, index: int) -> tuple[np.ndarray, int]:
        path, label = self.files[index]
        return np.load(path), label


class SyntheticClsSource:
    """Synthetic event streams with flip-invariant class structure.

    Class k scatters events around ``(k+1)^2`` grid-arranged blobs — a purely
    spatial signature that survives the horizontal/time-flip augmentations —
    so a few optimizer steps must lift accuracy above chance (the de-facto
    smoke test the reference lacks, SURVEY §4).
    """

    def __init__(
        self,
        num_classes: int = 2,
        samples_per_class: int = 32,
        num_events: int = 3000,
        sensor_hw: tuple[int, int] = (100, 120),
        seed: int = 0,
        cache: bool = False,
    ):
        self.num_classes = num_classes
        self.n = num_classes * samples_per_class
        self.num_events = num_events
        self.sensor_hw = sensor_hw
        self.seed = seed
        self._cache: dict | None = {} if cache else None

    def __len__(self) -> int:
        return self.n

    def load(self, index: int) -> tuple[np.ndarray, int]:
        if self._cache is not None and index in self._cache:
            return self._cache[index]
        out = self._generate(index)
        if self._cache is not None:
            self._cache[index] = out
        return out

    def _generate(self, index: int) -> tuple[np.ndarray, int]:
        rng = np.random.default_rng(self.seed + index)
        label = index % self.num_classes
        h, w = self.sensor_hw
        side = label + 1  # class k -> (k+1)x(k+1) blob grid (flip-symmetric)
        centers_y = (np.arange(side) + 0.5) / side * h
        centers_x = (np.arange(side) + 0.5) / side * w
        cy = np.repeat(centers_y, side)
        cx = np.tile(centers_x, side)
        pick = rng.integers(0, side * side, self.num_events)
        sigma = min(h, w) / (6.0 * side)
        x = np.clip(cx[pick] + rng.normal(0, sigma, self.num_events), 0, w - 1)
        y = np.clip(cy[pick] + rng.normal(0, sigma, self.num_events), 0, h - 1)
        t = np.sort(rng.uniform(0, 1, self.num_events))
        p = rng.integers(0, 2, self.num_events)
        return np.stack([x, y, t, p], 1), label
