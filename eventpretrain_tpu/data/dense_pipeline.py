"""Dense-task input pipelines: DSEC / DDD17 semseg, MVSEC flow.

TPU-native counterparts of reference dataset/finetune_semseg/ft_dsec_dataset.py,
ft_ddd17_dataset.py and dataset/finetune_flow/ft_mvsec_dataset.py: the host
side streams events out of HDF5/memmap storage with fixed-count backward
windows from label timestamps and rectification; rasterization and the
seed-coupled event/label view augmentation run as one jitted device program
(shared ViewParams replace seed replay, reference ft_dsec_dataset.py:193-278).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Iterator, Optional, Protocol

import numpy as np
import jax
import jax.numpy as jnp

from eventpretrain_tpu.data.event_transforms import (
    erase_and_add_events,
)
from eventpretrain_tpu.data.codec import encode_for_transfer, decode_events_u16
from eventpretrain_tpu.native import pack_event_batch, augment_pack_event_batch
from eventpretrain_tpu.ops.view_augment import (
    ViewParams,
    sample_view_params,
    identity_view_params,
    apply_view_augment,
    apply_semseg_label_augment,
    apply_flow_label_augment,
    apply_flow_valid_augment,
)


class DenseSource(Protocol):
    def __len__(self) -> int: ...

    def load(self, index: int) -> dict:
        """{'events': (N,4) xytp, 'label': (H,W) int} or
        {'events', 'flow': (H,W,2), 'valid': (H,W)}."""
        ...


@dataclasses.dataclass(frozen=True)
class DenseDataConfig:
    task: str                      # 'semseg' | 'flow'
    num_bins: int = 5
    input_size: int = 224
    fix_events_num: int = 200_000
    val_fix_events_num: int = 200_000
    sensor_height: int = 440
    sensor_width: int = 640
    crop_min: float = 0.8
    stream_augment: bool = True
    # evg resize interpolation: the reference hardcodes 'bilinear' for the
    # dense tasks (ft_dsec_dataset.py:255-258, ft_ddd17_dataset.py:154-157,
    # ft_mvsec_dataset.py:232-239); labels keep their own nearest/flow modes
    resize_mode: str = "bilinear"
    label_size: Optional[tuple[int, int]] = None  # None = input_size
    compact_transfer: bool = True   # uint16 event codec (data/codec.py)
    transfer_codec: str = "u32"     # "u32" | "u16" (data/codec.py)
    # Large-grid rasterizer: "auto" routes voxel grids too big for the
    # dense MXU splat (DSEC 440x640) through host tile bucketing + the
    # tiled MXU kernel (ops/pallas_voxel.py::voxelize_batch_mxu_tiled,
    # measured 6.7x the XLA scatter on v5e) on TPU; "on"/"off" force it
    # (tests use "on" to exercise the path in interpret mode on CPU).
    tiled_raster: str = "auto"      # "auto" | "on" | "off"


@functools.partial(
    jax.jit,
    static_argnames=("num_bins", "height", "width", "out_size", "task",
                     "label_h", "label_w", "resize_mode"),
)
def _device_preprocess(
    events, counts, labels, valid, params: ViewParams, *,
    num_bins: int, height: int, width: int, out_size: int, task: str,
    label_h: int, label_w: int, resize_mode: str = "bilinear", t_range=None,
    tile_table=None, tile_chunk_trange=None,
):
    from eventpretrain_tpu.data.representations import build_representation

    if events.dtype == jnp.uint16:
        events = decode_events_u16(events, t_range)
    elif events.dtype == jnp.uint32:
        from eventpretrain_tpu.data.codec import decode_events_u32

        events = decode_events_u32(events, t_range)
    from eventpretrain_tpu.data.representations import (
        normalize_representation,
    )

    # tile_table selects the host-bucketed large-grid MXU splat path
    # (native/bucket_pack_event_batch + pallas_voxel tiled kernels)
    evg_org = build_representation(
        events, counts, num_bins=num_bins, height=height, width=width,
        tile_table=tile_table, t_range=t_range,
        chunk_trange=tile_chunk_trange,
    )
    evg = apply_view_augment(
        evg_org, params, (out_size, out_size), resize_mode,
        negate_on_tflip=num_bins in (5, 6),
    )
    # per-sample ECDP/MEM normalization runs AFTER the view augment, exactly
    # like the reference dense datasets (ft_dsec_dataset.py:260-265,
    # ft_ddd17_dataset.py:159-164, ft_mvsec_dataset.py:241-249)
    evg = normalize_representation(evg, num_bins)
    out = {"evg": evg}
    if task == "semseg":
        # labels arrive uint8 (transfer codec); widen on device before the
        # nearest-resample augment
        out["label"] = apply_semseg_label_augment(
            labels.astype(jnp.int32), params, (label_h, label_w)
        ).astype(jnp.int32)
    else:
        # widen wire dtypes on device (f16 gt / u8 valid under compact
        # transfer) before the resampling augments
        out["flow"] = apply_flow_label_augment(
            labels.astype(jnp.float32), params, (label_h, label_w)
        )
        out["valid"] = apply_flow_valid_augment(
            valid.astype(jnp.float32), params, (label_h, label_w)
        )
        # sparse val mask from the UNAUGMENTED original-resolution grid
        # (reference ft_flow_trainer.py:198-199 uses events_voxel_grid_org,
        # not the network input); train steps ignore this key
        presence = (
            jnp.linalg.norm(evg_org.astype(jnp.float32), axis=-1) > 0
        ).astype(jnp.float32)
        if presence.shape[1:] != (label_h, label_w):
            from eventpretrain_tpu.ops.reshape import resize

            presence = resize(
                presence[..., None], (label_h, label_w), "nearest"
            )[..., 0]
        out["event_mask"] = presence
    return out


class DensePipeline:
    def __init__(self, source: DenseSource, cfg: DenseDataConfig,
                 batch_size: int, train: bool, seed: int = 0):
        self.source = source
        self.cfg = cfg
        self.batch_size = batch_size
        self.train = train
        self.rng = np.random.default_rng(seed)
        self._enc_buffers = [None, None]
        self._enc_i = 0
        self._pack_buffers = [None, None]  # rotate to dodge page faults
        self._pack_i = 0
        if cfg.tiled_raster == "auto":
            from eventpretrain_tpu.ops.pallas_voxel import (
                supports_mxu_voxelizer,
            )

            self._tiled = (
                not supports_mxu_voxelizer(
                    cfg.sensor_height, cfg.sensor_width
                )
                and jax.default_backend() == "tpu"
            )
        else:
            self._tiled = cfg.tiled_raster == "on"
        self._bucket_buffers = [None, None]
        self._bucket_i = 0

    def __len__(self) -> int:
        return max(len(self.source) // self.batch_size, 1)

    def __iter__(self) -> Iterator[dict]:
        cfg = self.cfg
        order = np.arange(len(self.source))
        if self.train:
            self.rng.shuffle(order)
        bs = self.batch_size
        cap = cfg.fix_events_num if self.train else cfg.val_fix_events_num
        if self.train and cfg.stream_augment:
            # headroom for erase_and_add growth (up to int(0.01 * n) added
            # events, reference events_augment.py:38-52 keeps them all)
            cap = cap + max(cap // 100, 1)
        label_hw = cfg.label_size or (cfg.input_size, cfg.input_size)
        for b in range(len(self)):
            idx = order[b * bs : (b + 1) * bs]
            num_valid = len(idx)
            if len(idx) < bs:  # pad by wrapping; num_valid marks real samples
                idx = np.concatenate([idx, order[: bs - len(idx)]])
            streams, labels, valids = [], [], []
            for i in idx:
                item = self.source.load(int(i))
                streams.append(np.asarray(item["events"]))
                if cfg.task == "semseg":
                    # semseg labels are uint8-valued (class ids + 255
                    # ignore); shipping them as int32 would cost more
                    # transfer bytes than the event stream itself
                    # (18 MB vs 14 MB per DSEC batch-16) — keep uint8 on
                    # the wire, cast on device after the label augment
                    lab = np.asarray(item["label"])
                    labels.append(
                        lab if lab.dtype == np.uint8 else
                        lab.astype(np.uint8) if
                        (lab.min() >= 0 and lab.max() <= 255) else
                        lab.astype(np.int32)
                    )
                else:
                    # flow gt rides the wire as f16 under compact_transfer
                    # (~1e-3 relative on gt vectors, documented in
                    # PARITY.md; pass compact_transfer=False for exact
                    # f32 — the parity tests do); the valid mask is 0/1
                    # so uint8 is lossless
                    labels.append(np.asarray(
                        item["flow"],
                        np.float16 if cfg.compact_transfer else np.float32,
                    ))
                    valids.append(np.asarray(item["valid"]).astype(np.uint8))
            self._pack_i ^= 1
            if self.train and cfg.stream_augment:
                # fused native erase/add + pack (one thread-parallel pass;
                # the per-sample numpy path cost ~150 ms/batch-16 at DSEC
                # windows on a 1-core host). Same fallback/draw structure
                # as ClsPipeline so coupled-draw parity tests can route
                # through the numpy path.
                hws = [(float(cfg.sensor_height), float(cfg.sensor_width))
                       ] * len(idx)
                windows = [(0, s.shape[0]) for s in streams]
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
                            self.rng, s.astype(np.float64),
                            (cfg.sensor_height, cfg.sensor_width),
                        ).astype(np.float32) if s.shape[0] > 0 else
                        s.astype(np.float32)
                        for s in streams
                    ]
                    packed, counts = pack_event_batch(
                        py_streams, cap,
                        out=self._pack_buffers[self._pack_i],
                    )
            else:
                packed, counts = pack_event_batch(
                    streams, cap, out=self._pack_buffers[self._pack_i]
                )
            self._pack_buffers[self._pack_i] = packed
            if self.train:
                params = sample_view_params(
                    self.rng, len(idx), cfg.sensor_height, cfg.sensor_width,
                    scale_min=cfg.crop_min,
                )
            else:
                params = identity_view_params(
                    len(idx), cfg.sensor_height, cfg.sensor_width
                )
            labels_arr = jnp.asarray(np.stack(labels))
            valid_arr = (
                jnp.asarray(np.stack(valids)) if valids else jnp.zeros(())
            )
            tile_table = tile_chunk_trange = None
            if self._tiled:
                from eventpretrain_tpu.native import (
                    bucket_pack_event_batch,
                    bucket_pack_event_batch_u32,
                )

                if cfg.compact_transfer:
                    # bucketed layouts always ride the u32 codec (the only
                    # one whose sentinels + explicit-window encoder the
                    # tiled voxelizer's contract needs); bucketing and
                    # encoding are one fused native pass
                    self._enc_i ^= 1
                    enc, table, t_rng, chunk_tr = (
                        bucket_pack_event_batch_u32(
                            packed, counts, height=cfg.sensor_height,
                            width=cfg.sensor_width,
                            out=self._enc_buffers[self._enc_i],
                        )
                    )
                    self._enc_buffers[self._enc_i] = enc
                    dev_events = jnp.asarray(enc)
                else:
                    self._bucket_i ^= 1
                    bucketed, table, t_rng, chunk_tr = (
                        bucket_pack_event_batch(
                            packed, counts, height=cfg.sensor_height,
                            width=cfg.sensor_width,
                            out=self._bucket_buffers[self._bucket_i],
                        )
                    )
                    self._bucket_buffers[self._bucket_i] = bucketed
                    dev_events = jnp.asarray(bucketed)
                dev_t_range = jnp.asarray(t_rng)
                tile_table = jnp.asarray(table)
                tile_chunk_trange = jnp.asarray(chunk_tr)
            else:
                self._enc_i ^= 1
                dev_events, dev_t_range, self._enc_buffers[self._enc_i] = (
                    encode_for_transfer(
                        packed, counts, cfg.compact_transfer,
                        out=self._enc_buffers[self._enc_i],
                        codec=cfg.transfer_codec,
                    )
                )
            batch = _device_preprocess(
                dev_events,
                jnp.asarray(counts),
                labels_arr,
                valid_arr,
                params,
                num_bins=cfg.num_bins,
                height=cfg.sensor_height,
                width=cfg.sensor_width,
                out_size=cfg.input_size,
                task=cfg.task,
                label_h=label_hw[0],
                label_w=label_hw[1],
                resize_mode=cfg.resize_mode,
                t_range=dev_t_range,
                tile_table=tile_table,
                tile_chunk_trange=tile_chunk_trange,
            )
            batch["num_valid"] = jnp.asarray(num_valid, jnp.int32)
            yield batch


class DsecSource:
    """DSEC semantic-segmentation sequence reader.

    Streams events from ``events/left/events.h5`` keeping handles open,
    resolves label timestamps via the ``ms_to_idx`` table with binary-search
    end refinement, takes a fixed-count backward window, rectifies event
    coordinates through ``rectify_map.h5`` and drops out-of-bounds events
    (parity with reference ft_dsec_dataset.py:87-226; labels are every other
    timestamp, index*2, ft_dsec_dataset.py:195).
    """

    TRAIN_SEQUENCES = [
        "zurich_city_00_a", "zurich_city_01_a", "zurich_city_02_a",
        "zurich_city_04_a", "zurich_city_05_a", "zurich_city_06_a",
        "zurich_city_07_a", "zurich_city_08_a",
    ]
    VAL_SEQUENCES = ["zurich_city_13_a", "zurich_city_14_c", "zurich_city_15_a"]

    def __init__(self, root: str, sequences: list[str],
                 fix_events_num: int = 200_000,
                 sensor_hw: tuple[int, int] = (440, 640),
                 org_sensor_hw: tuple[int, int] = (480, 640),
                 remove_time_window_ms: int = 250,
                 labels_dirname: str = "semantic/left/11classes"):
        import h5py  # hdf5plugin optional; required for compressed files

        try:
            import hdf5plugin  # noqa: F401
        except ImportError:
            pass
        self.sensor_hw = sensor_hw
        self.org_sensor_hw = org_sensor_hw
        self.fix_events_num = fix_events_num
        self.items: list[tuple[int, int]] = []  # (seq_idx, label_idx)
        self.seqs = []
        for seq in sequences:
            path = os.path.join(root, seq)
            label_dir = os.path.join(path, labels_dirname)
            # reference layout names the file <seq>_semantic_timestamps.txt
            # (ft_dsec_dataset.py:70); accept plain timestamps.txt too
            ts_path = os.path.join(
                path, "semantic", "left", f"{seq}_semantic_timestamps.txt"
            )
            if not os.path.exists(ts_path):
                ts_path = os.path.join(path, "semantic", "left",
                                       "timestamps.txt")
            ts = np.loadtxt(ts_path, dtype=np.int64)
            labels = sorted(
                f for f in os.listdir(label_dir) if f.endswith(".png")
            )
            skip = (remove_time_window_ms // 100 + 1) * 2
            ts = ts[skip:]
            labels = labels[skip:]
            h5 = h5py.File(
                os.path.join(path, "events", "left", "events.h5"), "r"
            )
            ev = {k: h5[f"events/{k}"] for k in ("p", "x", "y", "t")}
            t_offset = int(h5["t_offset"][()]) if "t_offset" in h5 else 0
            ms_to_idx = np.asarray(h5["ms_to_idx"], np.int64)
            import h5py as _h5

            rect = _h5.File(
                os.path.join(path, "events", "left", "rectify_map.h5"), "r"
            )["rectify_map"][()]
            seq_idx = len(self.seqs)
            self.seqs.append(
                dict(events=ev, t_offset=t_offset, ms_to_idx=ms_to_idx,
                     rectify=rect, timestamps=ts,
                     labels=[os.path.join(label_dir, f) for f in labels])
            )
            # every other label; odd-length tails keep the final one
            # (ft_dsec_dataset.py:292-293: (size + 1) // 2)
            for li in range((len(ts) + 1) // 2):
                self.items.append((seq_idx, li))

    def __len__(self) -> int:
        return len(self.items)

    def _event_end_index(self, seq, t_end_us: int) -> int:
        """ms_to_idx lookup + exact refinement (ft_dsec_dataset.py:152-183)."""
        t_end_us -= seq["t_offset"]
        lo_ms = math.floor(t_end_us / 1000)
        hi_ms = math.ceil(t_end_us / 1000)
        lo = int(seq["ms_to_idx"][lo_ms])
        hi = int(seq["ms_to_idx"][hi_ms])
        if lo == hi:
            return lo
        t_slice = np.asarray(seq["events"]["t"][lo:hi])
        return lo + int(np.searchsorted(t_slice, t_end_us, side="left"))

    def load(self, index: int) -> dict:
        from PIL import Image

        seq_idx, li = self.items[index]
        seq = self.seqs[seq_idx]
        ts_end = int(seq["timestamps"][li * 2])
        end = self._event_end_index(seq, ts_end)
        start = max(end - self.fix_events_num, 0)
        x = np.asarray(seq["events"]["x"][start:end], np.int64)
        y = np.asarray(seq["events"]["y"][start:end], np.int64)
        t = np.asarray(seq["events"]["t"][start:end], np.float64)
        p = np.asarray(seq["events"]["p"][start:end], np.float64)

        xy_rect = seq["rectify"][y, x]
        x_r, y_r = xy_rect[:, 0], xy_rect[:, 1]
        h, w = self.sensor_hw
        keep = (x_r >= 0) & (x_r < w) & (y_r >= 0) & (y_r < h)
        events = np.stack(
            [x_r[keep], y_r[keep], t[keep], p[keep]], axis=-1
        )
        label = np.array(Image.open(seq["labels"][li * 2]), np.int32)
        return {"events": events, "label": label}


class Ddd17Source:
    """DDD17 semseg reader over the reference's on-disk layout
    (parity with reference ft_ddd17_dataset.py:38-127): per sequence,
    ``events.dat.t`` int64-ns memmap + ``events.dat.xyp`` int16 memmap,
    ``index/index_50ms.npy`` rows of ``(t_ns, event_idx, event_idx_before)``
    mapping image j -> last event index, and ``segmentation_masks/*.png``
    whose filename suffix encodes the 1-based image index. Per item: a
    backward window of ``window_events_num`` (= train fix + 10000,
    ft_ddd17_dataset.py:87) events before the label's image, sensor-bounds
    masked, trimmed to the last ``fix_events_num``. Timestamps pass through
    float32 exactly like the reference's memmap cast
    (ft_ddd17_dataset.py:95-97)."""

    def __init__(self, root: str, sequences: list[str],
                 fix_events_num: int = 80_000,
                 window_events_num: Optional[int] = None,
                 sensor_hw: tuple[int, int] = (200, 346),
                 labels_dirname: str = "segmentation_masks"):
        self.sensor_hw = sensor_hw
        self.fix_events_num = fix_events_num
        self.window_events_num = (
            window_events_num
            if window_events_num is not None
            else fix_events_num + 10_000
        )
        self.items = []
        self.seqs = []
        for seq in sequences:
            path = os.path.join(root, seq)
            t_map = np.memmap(
                os.path.join(path, "events.dat.t"), dtype=np.int64, mode="r"
            )
            xyp_map = np.memmap(
                os.path.join(path, "events.dat.xyp"), dtype=np.int16, mode="r"
            ).reshape(-1, 3)
            index = np.load(os.path.join(path, "index", "index_50ms.npy"))
            label_dir = os.path.join(path, labels_dirname)
            labels = sorted(
                f for f in os.listdir(label_dir) if f.endswith(".png")
            )
            seq_idx = len(self.seqs)
            self.seqs.append(
                dict(t=t_map, xyp=xyp_map, index=index,
                     labels=[os.path.join(label_dir, f) for f in labels])
            )
            for li in range(len(labels)):
                self.items.append((seq_idx, li))

    def __len__(self):
        return len(self.items)

    def load(self, index: int) -> dict:
        from PIL import Image

        seq_idx, li = self.items[index]
        seq = self.seqs[seq_idx]
        label_file = os.path.basename(seq["labels"][li])
        # image index from the label filename (ft_ddd17_dataset.py:113)
        img_index = int(label_file[:-4].split("_")[-1]) - 1
        end = int(seq["index"][img_index][1])
        start = max(end - self.window_events_num, 0)
        t = np.asarray(seq["t"][start:end], np.float32)
        xyp = np.asarray(seq["xyp"][start:end], np.float32)
        events = np.stack([xyp[:, 0], xyp[:, 1], t, xyp[:, 2]], axis=-1)
        h, w = self.sensor_hw
        keep = ((events[:, 0] >= 0) & (events[:, 0] < w)
                & (events[:, 1] >= 0) & (events[:, 1] < h))
        events = events[keep][-self.fix_events_num:]
        label = np.array(Image.open(seq["labels"][li]), np.int32)
        return {"events": events.astype(np.float64), "label": label}


class SyntheticDenseSource:
    """Synthetic events + labels for smoke training (semseg or flow)."""

    def __init__(self, task: str, n: int = 16, num_classes: int = 6,
                 sensor_hw: tuple[int, int] = (64, 64),
                 num_events: int = 4000, seed: int = 0,
                 cache: bool = False):
        self.task = task
        self.n = n
        self.num_classes = num_classes
        self.sensor_hw = sensor_hw
        self.num_events = num_events
        self.seed = seed
        # benchmarks measure the framework, not synthesis: cache samples
        self._cache: dict[int, dict] | None = {} if cache else None

    def __len__(self):
        return self.n

    def load(self, index: int) -> dict:
        if self._cache is not None:
            if index not in self._cache:
                self._cache[index] = self._generate(index)
            return self._cache[index]
        return self._generate(index)

    def _generate(self, index: int) -> dict:
        rng = np.random.default_rng(self.seed + index)
        h, w = self.sensor_hw
        # events concentrated in one quadrant; label marks that quadrant
        qy, qx = rng.integers(0, 2), rng.integers(0, 2)
        y = rng.uniform(qy * h / 2, (qy + 1) * h / 2, self.num_events)
        x = rng.uniform(qx * w / 2, (qx + 1) * w / 2, self.num_events)
        t = np.sort(rng.uniform(0, 1, self.num_events))
        p = rng.integers(0, 2, self.num_events)
        events = np.stack([x, y, t, p], 1)
        yy, xx = np.mgrid[0:h, 0:w]
        region = ((yy >= qy * h / 2) & (yy < (qy + 1) * h / 2)
                  & (xx >= qx * w / 2) & (xx < (qx + 1) * w / 2))
        if self.task == "semseg":
            label = np.where(region, (qy * 2 + qx) + 1, 0).astype(np.int32)
            return {"events": events, "label": label}
        flow = np.zeros((h, w, 2), np.float32)
        flow[region] = [qx * 2 - 1, qy * 2 - 1]
        return {
            "events": events, "flow": flow,
            "valid": np.ones((h, w), np.float32),
        }
