"""Sample-level A/B of the dense-task datasets vs the reference's own code.

Round-3 extension of the tier-(b) harness (tests/test_e2e_parity.py):
DSEC / DDD17 semseg and MVSEC flow were the last un-A/B'd dataset
pipelines. Each test builds a synthetic fixture tree in the reference's
exact on-disk layout, runs the IMPORTED reference Dataset ``__getitem__``
(dataset/finetune_semseg/ft_dsec_dataset.py:43-293,
ft_ddd17_dataset.py:38-187; dataset/finetune_flow/ft_mvsec_dataset.py:47-315)
against our sources + DensePipeline on the same tree, and asserts
value-level agreement of the event representation, labels, masks, and
(for flow) the temporally-propagated ground truth.

Train-path tests couple the random draws onto the reference's global
``np.random`` stream exactly like the cls/EF tests (window-free here:
dense windows are deterministic backward windows from label timestamps).
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._torch_ref import load_reference, ref_args
from tests.test_e2e_parity import EraseAddScriptRng

load_reference()

# ft_dsec_dataset.py imports hdf5plugin (not installed) purely to register
# HDF5 decompression filters; synthetic fixtures are uncompressed, so a
# stub module suffices for the import
if "hdf5plugin" not in sys.modules:
    _stub = types.ModuleType("hdf5plugin")
    _stub.PLUGINS_PATH = ""
    sys.modules["hdf5plugin"] = _stub


class DenseCoupledRng:
    """Routes DensePipeline's train-path draw sequence onto the reference
    dense ``__getitem__``'s: erase/add script (global stream, via
    EraseAddScriptRng reordering) -> re-seed with the item's view seed ->
    crop/flip draws (evg_augment/label_augment re-seed with the same seed,
    ft_ddd17_dataset.py:112,155,172)."""

    def __init__(self, n_events: int, view_seed: int):
        self.n = n_events
        self.view_seed = view_seed
        self.script: EraseAddScriptRng | None = None
        self.phase = "erase"

    def shuffle(self, a):
        assert len(a) == 1, "coupled runs use a single-sample source"

    def integers(self, low, high=None, size=None):
        if high is not None and high == 2 ** 63:  # native-augment seed draw
            return np.zeros(size or 1, np.uint64)
        if self.phase == "erase":
            if self.script is None:
                self.script = EraseAddScriptRng(self.n)
                return self.script.erase_num
            return self.script.add_num
        return np.random.randint(low, high, size)

    def choice(self, a, size=None, replace=True, shuffle=True):
        return self.script.choice(a, size=size, replace=replace)

    def normal(self, loc, scale, size=None):
        out = self.script.normal(loc, scale, size)
        if self.script._normal_calls == 3:
            self.phase = "view"
            np.random.seed(self.view_seed)
        return out

    def uniform(self, low, high, size=None):
        return np.random.uniform(low, high, size)

    def random(self, size=None):
        return np.random.random(size)


def our_dense_cfg(task, num_bins, sensor_hw, input_size=48,
                  fix=3000, val_fix=3000):
    from eventpretrain_tpu.data.dense_pipeline import DenseDataConfig

    return DenseDataConfig(
        task=task, num_bins=num_bins, input_size=input_size,
        fix_events_num=fix, val_fix_events_num=val_fix,
        sensor_height=sensor_hw[0], sensor_width=sensor_hw[1],
        label_size=sensor_hw, compact_transfer=False,
    )


def evg_chw(batch):
    return np.asarray(batch["evg"][0]).transpose(2, 0, 1)


# ---------------------------------------------------------------------------
# DDD17 (memmap layout, ft_ddd17_dataset.py)
# ---------------------------------------------------------------------------

DDD17_HW = (20, 34)  # scaled-down sensor; reference default is (200, 346)


def build_ddd17_seq(root, seq, rng, n_events=9000, n_labels=3,
                    hw=DDD17_HW):
    """Reference DDD17 layout: events.dat.t (int64 ns), events.dat.xyp
    (int16, includes out-of-bounds rows the loader must mask), index/
    index_50ms.npy rows (t_ns, event_idx, event_idx_before), and
    segmentation_masks/<seq>_frame_<n>.png (1-based image index)."""
    h, w = hw
    path = os.path.join(root, seq)
    os.makedirs(os.path.join(path, "index"))
    os.makedirs(os.path.join(path, "segmentation_masks"))

    t = np.sort(rng.integers(0, 5_000_000, n_events)).astype(np.int64)
    x = rng.integers(-2, w + 3, n_events).astype(np.int16)  # some OOB
    y = rng.integers(-2, h + 3, n_events).astype(np.int16)
    p = rng.integers(0, 2, n_events).astype(np.int16)
    np.asarray(t).tofile(os.path.join(path, "events.dat.t"))
    np.stack([x, y, p], 1).astype(np.int16).tofile(
        os.path.join(path, "events.dat.xyp")
    )

    n_images = n_labels + 2
    idx_table = np.zeros((n_images, 3), np.int64)
    for j in range(n_images):
        end = int(n_events * (j + 1) / n_images)
        idx_table[j] = (int(t[end - 1]), end, max(end - 4000, 0))
    np.save(os.path.join(path, "index", "index_50ms.npy"), idx_table)

    from PIL import Image

    for k in range(n_labels):
        img_index = k + 2  # 1-based image index in the filename
        lab = rng.integers(0, 6, (h, w)).astype(np.uint8)
        Image.fromarray(lab).save(
            os.path.join(path, "segmentation_masks",
                         f"{seq}_frame_{img_index:06d}.png")
        )


def ddd17_args(root, num_bins, fix=3000, val_fix=3000, input_size=48):
    return ref_args(
        num_bins=num_bins, num_classes=6, input_size=input_size,
        fix_events_num=fix, val_fix_events_num=val_fix,
        val_event_noise=False, use_evrepsl=False, crop_min=0.8,
        ddd17_train_root=str(root), ddd17_val_root=str(root),
        ddd17_sensor_h=DDD17_HW[0], ddd17_sensor_w=DDD17_HW[1],
    )


@pytest.mark.parametrize("num_bins", [5, 2, 3])
def test_ddd17_val_samples_vs_reference(tmp_path, num_bins):
    """Validation path end to end: reference FinetuneDDD17SeqDataset
    (is_train=False) vs Ddd17Source + DensePipeline on the same memmap
    tree — filename-derived image index, 3-column index table, +10000
    window headroom, sensor-bounds mask, float32 timestamp cast, and the
    post-resize ECDP/MEM normalization must all agree."""
    from dataset.finetune_semseg.ft_ddd17_dataset import (
        FinetuneDDD17SeqDataset,
    )

    from eventpretrain_tpu.data.dense_pipeline import (
        Ddd17Source,
        DensePipeline,
    )

    rng = np.random.default_rng(42)
    build_ddd17_seq(str(tmp_path), "dir1", rng)
    args = ddd17_args(tmp_path, num_bins)
    ref_ds = FinetuneDDD17SeqDataset(args, False, "dir1")

    src = Ddd17Source(
        str(tmp_path), ["dir1"], fix_events_num=args.val_fix_events_num,
        window_events_num=args.fix_events_num + 10_000, sensor_hw=DDD17_HW,
    )
    pipe = DensePipeline(src, our_dense_cfg("semseg", num_bins, DDD17_HW),
                         batch_size=1, train=False, seed=0)
    n = 0
    for i, batch in enumerate(iter(pipe)):
        ref_item = ref_ds[i]
        np.testing.assert_allclose(
            evg_chw(batch), np.asarray(ref_item["events_voxel_grid"]),
            atol=1e-4, rtol=1e-4, err_msg=f"sample {i}",
        )
        np.testing.assert_array_equal(
            np.asarray(batch["label"][0]),
            np.asarray(ref_item["semseg_label"][0]),
        )
        n += 1
    assert n == len(ref_ds) == 3


@pytest.mark.parametrize("num_bins", [5, 2])
@pytest.mark.parametrize("seed", [0, 7])
def test_ddd17_train_sample_vs_reference(tmp_path, monkeypatch, num_bins,
                                         seed):
    """Training path with coupled draws: erase/add on the bounded window,
    then the shared-seed evg/label view augmentation
    (ft_ddd17_dataset.py:111-172) vs our single ViewParams draw."""
    from dataset.finetune_semseg.ft_ddd17_dataset import (
        FinetuneDDD17SeqDataset,
    )

    from eventpretrain_tpu.data import dense_pipeline as dpl

    rng = np.random.default_rng(5)
    build_ddd17_seq(str(tmp_path), "dir0", rng, n_labels=1)
    args = ddd17_args(tmp_path, num_bins)

    np.random.seed(seed)
    ref_item = FinetuneDDD17SeqDataset(args, True, "dir0")[0]

    src = dpl.Ddd17Source(
        str(tmp_path), ["dir0"], fix_events_num=args.fix_events_num,
        sensor_hw=DDD17_HW,
    )
    n_window = src.load(0)["events"].shape[0]
    pipe = dpl.DensePipeline(src, our_dense_cfg("semseg", num_bins, DDD17_HW),
                             batch_size=1, train=True, seed=0)
    # coupled draws ride the numpy erase/add path (native is
    # distribution-equivalent but draws its own stream)
    monkeypatch.setattr(dpl, "augment_pack_event_batch",
                        lambda *a, **k: None)
    np.random.seed(seed)
    view_seed = int(np.random.randint(1000))
    pipe.rng = DenseCoupledRng(n_window, view_seed)
    batch = next(iter(pipe))
    np.testing.assert_allclose(
        evg_chw(batch), np.asarray(ref_item["events_voxel_grid"]),
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(batch["label"][0]),
        np.asarray(ref_item["semseg_label"][0]),
    )


# ---------------------------------------------------------------------------
# DSEC (HDF5 layout, ft_dsec_dataset.py)
# ---------------------------------------------------------------------------

DSEC_ORG_HW = (48, 64)  # scaled-down from (480, 640)
DSEC_HW = (44, 64)      # bottom rows removed, like 440/480


def build_dsec_seq(root, seq, rng, n_events=9000, n_ts=10, t_offset=1000):
    """Reference DSEC layout (ft_dsec_dataset.py:43-115): events/left/
    events.h5 {events/{p,x,y,t}, ms_to_idx, t_offset} + rectify_map.h5,
    semantic/left/{<seq>_semantic_timestamps.txt, 11classes/*.png}."""
    import h5py
    from PIL import Image

    oh, ow = DSEC_ORG_HW
    path = os.path.join(root, seq)
    os.makedirs(os.path.join(path, "events", "left"))
    os.makedirs(os.path.join(path, "semantic", "left", "11classes"))

    t = np.sort(rng.integers(0, 400_000, n_events)).astype(np.int64)  # us
    x = rng.integers(0, ow, n_events).astype(np.uint16)
    y = rng.integers(0, oh, n_events).astype(np.uint16)
    p = rng.integers(0, 2, n_events).astype(np.uint8)

    max_ms = int(np.ceil(t[-1] / 1000)) + 2
    ms_to_idx = np.searchsorted(t, np.arange(max_ms) * 1000, side="left")

    with h5py.File(os.path.join(path, "events", "left", "events.h5"),
                   "w") as f:
        f.create_dataset("events/p", data=p)
        f.create_dataset("events/x", data=x)
        f.create_dataset("events/y", data=y)
        f.create_dataset("events/t", data=t)
        f.create_dataset("ms_to_idx", data=ms_to_idx.astype(np.int64))
        f.create_dataset("t_offset", data=np.int64(t_offset))

    # near-identity rectification with jitter; some rows land in the
    # removed bottom band (y >= DSEC_HW[0]) to exercise the bounds mask
    gy, gx = np.mgrid[0:oh, 0:ow]
    rect = np.stack(
        [gx + rng.normal(0, 1.0, (oh, ow)),
         gy + rng.normal(0, 1.0, (oh, ow))], axis=-1
    ).astype(np.float32)
    with h5py.File(os.path.join(path, "events", "left", "rectify_map.h5"),
                   "w") as f:
        f.create_dataset("rectify_map", data=rect)

    # timestamps: one label every ~40 ms, absolute (t_offset added)
    ts = (np.linspace(t[-1] * 0.55, t[-1] * 0.98, n_ts).astype(np.int64)
          + t_offset)
    np.savetxt(
        os.path.join(path, "semantic", "left",
                     f"{seq}_semantic_timestamps.txt"),
        ts, fmt="%d",
    )
    for k in range(n_ts):
        lab = rng.integers(0, 11, DSEC_ORG_HW).astype(np.uint8)[:DSEC_HW[0]]
        Image.fromarray(lab).save(
            os.path.join(path, "semantic", "left", "11classes",
                         f"{k:06d}.png")
        )


def dsec_args(root, num_bins, fix=3000, val_fix=3000, input_size=48):
    return ref_args(
        num_bins=num_bins, num_classes=11, input_size=input_size,
        fix_events_num=fix, val_fix_events_num=val_fix,
        val_event_noise=False, use_evrepsl=False, crop_min=0.8,
        dsec_train_root=str(root), dsec_val_root=str(root),
        dsec_org_sensor_h=DSEC_ORG_HW[0], dsec_org_sensor_w=DSEC_ORG_HW[1],
        dsec_sensor_h=DSEC_HW[0], dsec_sensor_w=DSEC_HW[1],
    )


@pytest.mark.parametrize("num_bins", [5, 2])
def test_dsec_val_samples_vs_reference(tmp_path, num_bins):
    """Validation path: reference FinetuneDSECSeqDataset vs DsecSource +
    DensePipeline on one fixture sequence — ms_to_idx end-index refinement,
    t_offset handling, rectification + bottom-band mask, every-other
    labels, and the (size+1)//2 item count."""
    from dataset.finetune_semseg.ft_dsec_dataset import (
        FinetuneDSECSeqDataset,
    )

    from eventpretrain_tpu.data.dense_pipeline import (
        DensePipeline,
        DsecSource,
    )

    rng = np.random.default_rng(3)
    seq = "zurich_city_13_a"
    build_dsec_seq(str(tmp_path), seq, rng, n_ts=9)  # odd post-skip tail
    args = dsec_args(tmp_path, num_bins)
    ref_ds = FinetuneDSECSeqDataset(args, False, seq)

    src = DsecSource(
        str(tmp_path), [seq], fix_events_num=args.val_fix_events_num,
        sensor_hw=DSEC_HW, org_sensor_hw=DSEC_ORG_HW,
    )
    pipe = DensePipeline(src, our_dense_cfg("semseg", num_bins, DSEC_HW),
                         batch_size=1, train=False, seed=0)
    n = 0
    for i, batch in enumerate(iter(pipe)):
        ref_item = ref_ds[i]
        np.testing.assert_allclose(
            evg_chw(batch), np.asarray(ref_item["events_voxel_grid"]),
            atol=1e-4, rtol=1e-4, err_msg=f"sample {i}",
        )
        np.testing.assert_array_equal(
            np.asarray(batch["label"][0]),
            np.asarray(ref_item["semseg_label"][0]),
        )
        n += 1
    assert n == len(ref_ds) == 2


@pytest.mark.parametrize("seed", [1, 4])
def test_dsec_train_sample_vs_reference(tmp_path, monkeypatch, seed):
    """Training path with coupled draws over the rectified window."""
    from dataset.finetune_semseg.ft_dsec_dataset import (
        FinetuneDSECSeqDataset,
    )

    from eventpretrain_tpu.data import dense_pipeline as dpl

    rng = np.random.default_rng(8)
    seq = "zurich_city_00_a"
    build_dsec_seq(str(tmp_path), seq, rng, n_ts=8)
    args = dsec_args(tmp_path, 5)

    np.random.seed(seed)
    ref_item = FinetuneDSECSeqDataset(args, True, seq)[0]

    src = dpl.DsecSource(
        str(tmp_path), [seq], fix_events_num=args.fix_events_num,
        sensor_hw=DSEC_HW, org_sensor_hw=DSEC_ORG_HW,
    )
    n_window = src.load(0)["events"].shape[0]
    pipe = dpl.DensePipeline(src, our_dense_cfg("semseg", 5, DSEC_HW),
                             batch_size=1, train=True, seed=0)
    monkeypatch.setattr(dpl, "augment_pack_event_batch",
                        lambda *a, **k: None)
    np.random.seed(seed)
    view_seed = int(np.random.randint(1000))
    pipe.rng = DenseCoupledRng(n_window, view_seed)
    batch = next(iter(pipe))
    np.testing.assert_allclose(
        evg_chw(batch), np.asarray(ref_item["events_voxel_grid"]),
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(batch["label"][0]),
        np.asarray(ref_item["semseg_label"][0]),
    )


# ---------------------------------------------------------------------------
# MVSEC (HDF5 layout, ft_mvsec_dataset.py)
# ---------------------------------------------------------------------------

MVSEC_HW = (26, 34)  # scaled-down from (260, 346)


def build_mvsec_seq(root, seq, rng, events_per_gap=3000, flow_every=10,
                    t0=1.5e9, lo=314, hi=2199):
    """Reference MVSEC layout: <seq>_data.hdf5 davis/left/{events,
    image_raw, image_raw_ts, image_raw_event_inds} + <seq>_gt.hdf5
    davis/left/{flow_dist, flow_dist_ts}. Image timestamps are absolute
    epoch seconds; ground-truth flow frames every ``flow_every`` images so
    both gen_correspond_gt_flow branches (single-interval scaling and
    multi-flow cv2 propagation, ft_mvsec_dataset.py:121-178) are
    reachable via skip_num. ``lo/hi`` mirror the Valid_Time_Index entry
    in force (patch it for small trajectory fixtures)."""
    import h5py

    h, w = MVSEC_HW
    n_images = hi + 40
    image_ts = t0 + np.arange(n_images) * 0.022  # ~45 Hz, float64

    # events only under the first few tested indices keep the file small
    gaps = np.ones(n_images, np.int64) * 2
    gaps[lo:min(lo + 30, n_images)] = events_per_gap
    inds = np.concatenate([[0], np.cumsum(gaps)])[:n_images]
    n_events = int(inds[-1] + gaps[-1])
    ev_t = np.empty(n_events, np.float64)
    for j in range(n_images - 1):
        a, b = inds[j], inds[j + 1]
        ev_t[a:b] = np.sort(
            rng.uniform(image_ts[j], image_ts[j + 1], b - a)
        )
    ev_t[inds[-1]:] = image_ts[-1]
    events = np.stack(
        [rng.integers(0, w, n_events).astype(np.float64),
         rng.integers(0, h, n_events).astype(np.float64),
         ev_t,
         rng.choice(np.array([-1.0, 1.0]), n_events)], axis=1
    )

    with h5py.File(os.path.join(root, f"{seq}_data.hdf5"), "w") as f:
        f.create_dataset("davis/left/events", data=events)
        f.create_dataset("davis/left/image_raw",
                         data=np.zeros((n_images, 1, 1), np.uint8))
        f.create_dataset("davis/left/image_raw_ts", data=image_ts)
        f.create_dataset("davis/left/image_raw_event_inds",
                         data=inds.astype(np.int64))

    # gt flow frames bracketing the image range; values include zeros so
    # the propagation mask path (flow==0 -> invalid) is exercised
    flow_ts = image_ts[::flow_every].copy()
    n_flow = len(flow_ts)
    flow = rng.normal(0, 2.0, (n_flow, 2, h, w)).astype(np.float32)
    flow[:, :, ::5, ::7] = 0.0
    with h5py.File(os.path.join(root, f"{seq}_gt.hdf5"), "w") as f:
        f.create_dataset("davis/left/flow_dist", data=flow)
        f.create_dataset("davis/left/flow_dist_ts", data=flow_ts)


def mvsec_args(root, skip_num=1, fix=3000, input_size=48, seed=0):
    return ref_args(
        num_bins=5, input_size=input_size, skip_num=skip_num, seed=seed,
        fix_events_num=fix, val_fix_events_num=fix,
        val_event_noise=False, use_evrepsl=False, crop_min=0.8,
        mvsec_root=str(root),
        mvsec_sensor_h=MVSEC_HW[0], mvsec_sensor_w=MVSEC_HW[1],
    )


def test_prop_flow_vs_cv2_reference(tmp_path):
    """Our numpy nearest remap (data/mvsec.py:28-47) vs the reference's
    cv2.remap INTER_NEAREST propagation (ft_mvsec_dataset.py:180-188),
    including out-of-bounds indices (zero border) and the zero-flow mask."""
    from dataset.finetune_flow.ft_mvsec_dataset import (
        FinetuneMVSECSeqDataset,
    )

    from eventpretrain_tpu.data.mvsec import prop_flow as our_prop

    rng = np.random.default_rng(0)
    h, w = 19, 23
    ref_self = FinetuneMVSECSeqDataset.__new__(FinetuneMVSECSeqDataset)

    for trial in range(5):
        x_flow = rng.normal(0, 3.0, (h, w)).astype(np.float32)
        y_flow = rng.normal(0, 3.0, (h, w)).astype(np.float32)
        x_flow[::4, ::3] = 0.0
        xi, yi = np.meshgrid(np.arange(w), np.arange(h))
        # indices pushed partly out of bounds
        xi = (xi + rng.normal(0, 4.0, (h, w))).astype(np.float32)
        yi = (yi + rng.normal(0, 4.0, (h, w))).astype(np.float32)
        xm = np.ones((h, w), bool)
        ym = np.ones((h, w), bool)
        r_xi, r_yi, r_xm, r_ym = (xi.copy(), yi.copy(), xm.copy(), ym.copy())
        FinetuneMVSECSeqDataset.prop_flow(
            ref_self, x_flow.copy(), y_flow.copy(), r_xi, r_yi, r_xm, r_ym,
            scale_factor=0.7,
        )
        our_prop(x_flow.copy(), y_flow.copy(), xi, yi, xm, ym,
                 scale_factor=0.7)
        np.testing.assert_allclose(xi, r_xi, atol=1e-5)
        np.testing.assert_allclose(yi, r_yi, atol=1e-5)
        np.testing.assert_array_equal(xm, r_xm)
        np.testing.assert_array_equal(ym, r_ym)


@pytest.mark.parametrize("skip_num", [1, 15])
def test_mvsec_val_samples_vs_reference(tmp_path, skip_num):
    """Validation path: reference FinetuneMVSECSeqDataset (is_train=False)
    vs MvsecSource + DensePipeline — events between image indices, both
    gt-propagation branches (skip_num=1: single-interval scaling;
    skip_num=15: multi-flow cv2 warping), validity mask, and the sparse
    event-presence mask from the unaugmented original-resolution grid."""
    from dataset.finetune_flow.ft_mvsec_dataset import (
        FinetuneMVSECSeqDataset,
    )

    from eventpretrain_tpu.data.dense_pipeline import DensePipeline
    from eventpretrain_tpu.data.mvsec import MvsecSource

    rng = np.random.default_rng(11)
    seq = "indoor_flying2"
    build_mvsec_seq(str(tmp_path), seq, rng)
    args = mvsec_args(tmp_path, skip_num=skip_num)
    ref_ds = FinetuneMVSECSeqDataset(args, False, seq)

    # the reference never caps MVSEC events (all events between the two
    # image indices are used); size the static-shape cap over the largest
    # tested window so the pipelines see identical streams
    cap = 4000 * max(skip_num, 1) * 2
    src = MvsecSource(str(tmp_path), seq, fix_events_num=cap,
                      skip_num=skip_num, is_train=False, seed=args.seed)
    assert len(src) == len(ref_ds)
    pipe = DensePipeline(src, our_dense_cfg("flow", 5, MVSEC_HW, fix=cap,
                                            val_fix=cap),
                         batch_size=1, train=False, seed=0)
    it = iter(pipe)
    for i in range(3):
        batch = next(it)
        ref_item = ref_ds[i]
        np.testing.assert_allclose(
            evg_chw(batch), np.asarray(ref_item["events_voxel_grid"]),
            atol=1e-4, rtol=1e-4, err_msg=f"sample {i}",
        )
        np.testing.assert_allclose(
            np.asarray(batch["flow"][0]).transpose(2, 0, 1),
            np.asarray(ref_item["flow_label"]),
            atol=1e-4, rtol=1e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(batch["valid"][0]),
            np.asarray(ref_item["flow_label_valid"][0]),
        )
        # sparse val mask == per-pixel presence of the UNAUGMENTED original
        # grid (ft_flow_trainer.py:198-199 over events_voxel_grid_org)
        ref_presence = (
            np.linalg.norm(
                np.asarray(ref_item["events_voxel_grid_org"]), axis=0
            ) > 0
        ).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(batch["event_mask"][0]), ref_presence
        )


@pytest.mark.parametrize("seed", [2, 9])
def test_mvsec_train_sample_vs_reference(tmp_path, monkeypatch, seed):
    """Training path with coupled draws: erase/add, then the shared-seed
    evg/flow/valid augmentation with hflip u-negation and time-flip
    uv-negation (ft_mvsec_dataset.py:231-290, view_augment.py:101-134)."""
    from dataset.finetune_flow.ft_mvsec_dataset import (
        FinetuneMVSECSeqDataset,
    )

    from eventpretrain_tpu.data import dense_pipeline as dpl
    from eventpretrain_tpu.data.mvsec import MvsecSource

    rng = np.random.default_rng(13)
    seq = "indoor_flying2"
    build_mvsec_seq(str(tmp_path), seq, rng)
    args = mvsec_args(tmp_path)

    np.random.seed(seed)
    ref_ds = FinetuneMVSECSeqDataset(args, True, seq)
    ref_item = ref_ds[0]

    src = MvsecSource(str(tmp_path), seq, fix_events_num=4000,
                      skip_num=1, is_train=True, seed=args.seed)
    # single-item view for batch assembly without extra draws
    src.raw_index = src.raw_index[:1]
    n_window = src.load(0)["events"].shape[0]
    pipe = dpl.DensePipeline(
        src, our_dense_cfg("flow", 5, MVSEC_HW, fix=4000, val_fix=4000),
        batch_size=1, train=True, seed=0,
    )
    monkeypatch.setattr(dpl, "augment_pack_event_batch",
                        lambda *a, **k: None)
    np.random.seed(seed)
    view_seed = int(np.random.randint(1000))
    pipe.rng = DenseCoupledRng(n_window, view_seed)
    batch = next(iter(pipe))
    np.testing.assert_allclose(
        evg_chw(batch), np.asarray(ref_item["events_voxel_grid"]),
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(batch["flow"][0]).transpose(2, 0, 1),
        np.asarray(ref_item["flow_label"]),
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(batch["valid"][0]),
        np.asarray(ref_item["flow_label_valid"][0]),
        atol=1e-5,
    )


def test_mvsec_indoor_flying1_split_vs_reference(tmp_path):
    """The seeded 1% train split of indoor_flying1 and its complement val
    split must select the same raw indices as the reference's
    random.sample (ft_mvsec_dataset.py:57-68)."""
    from dataset.finetune_flow.ft_mvsec_dataset import (
        FinetuneMVSECSeqDataset,
    )

    from eventpretrain_tpu.data.mvsec import MvsecSource

    rng = np.random.default_rng(21)
    seq = "indoor_flying1"
    build_mvsec_seq(str(tmp_path), seq, rng)
    args = mvsec_args(tmp_path, seed=123)

    for is_train in (True, False):
        ref_ds = FinetuneMVSECSeqDataset(args, is_train, seq)
        src = MvsecSource(str(tmp_path), seq, skip_num=1,
                          is_train=is_train, seed=args.seed)
        assert src.raw_index == list(ref_ds.raw_index)
