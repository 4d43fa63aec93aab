"""Sample-level A/B of the 5 remaining cls dataset loaders vs the imported
reference Datasets (VERDICT r3 item 1).

Fixture trees are built in the REFERENCE's on-disk layouts
(ft_n_caltech101_dataset.py:25-46, ft_cifar10_dvs_dataset.py:23-44,
ft_es_imagenet_dataset.py:25-87, ft_dvs128_gesture_dataset.py:23-54,
ft_ucf101_dvs_dataset.py:24-50, ft_n_imagenet_dataset.py:61-69) and fed to
BOTH the reference Dataset __getitem__ and our source+ClsPipeline; outputs
must agree value-for-value on the val path (deterministic) and draw-for-draw
on the train path (PipelineCoupledRng routes our Generator calls onto the
reference's global np.random stream).

Round-4 drifts this harness surfaced and fixed (see PARITY.md):
  * N-ImageNet cls source read the wrong structured field names
    (timestamp/polarity vs the reference's x/y/t/p), skipped the /1e6
    microsecond->second scale, and rescaled coords BEFORE the stream
    augment instead of after (ft_n_imagenet_dataset.py:66-69, 90-93);
  * CIFAR10-DVS rescaled coords at load time for every representation —
    the reference rasters voxel/MEM at the 128x128 sensor and rescales
    only for ECDP, after the augment (ft_cifar10_dvs_dataset.py:63-78);
  * DVS128-Gesture labels came from the sorted directory position, not the
    integer directory name (ft_dvs128_gesture_dataset.py:51-54) — wrong
    for every class >= '10';
  * UCF101-DVS used the DAVIS240 native 240x320 sensor; the reference
    augments/rasters at ucf_sensor 180x240 (main_finetune_cls.py:181-182);
  * ES-ImageNet ignored the num_classes class-list slice
    (ft_es_imagenet_dataset.py:25);
  * the EvRep representation received second-scale timestamps; the
    reference feeds microseconds (ft_n_caltech101_dataset.py:79-80).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._torch_ref import load_reference, ref_args
from tests.test_e2e_parity import PipelineCoupledRng, make_stream

load_reference()

from eventpretrain_tpu.data import cls_pipeline as clp
from eventpretrain_tpu.data import cls_sources as cs


# ---------------------------------------------------------------------------
# fixture trees in the reference's on-disk layouts
# ---------------------------------------------------------------------------

def build_caltech_tree(root, classes=("accordion", "airplanes"), n=2,
                       n_events=4000, t_us_int=False):
    for cls in classes:
        d = os.path.join(root, cls)
        os.makedirs(d)
        for i in range(n):
            ev = make_stream(
                np.random.default_rng(hash((cls, i)) % 2 ** 31),
                n_events, w=240, h=180,
            )
            if t_us_int:
                # N-Caltech timestamps are integer microseconds stored as
                # seconds; EvRep consumes t * 1e6
                # (ft_n_caltech101_dataset.py:79-80)
                ev[:, 2] = np.sort(
                    np.random.default_rng(hash((cls, i, "t")) % 2 ** 31)
                    .integers(0, 100000, len(ev))
                ) / 1e6
            # ft_n_caltech101_dataset.py:40-41 derives the class by
            # stripping the last 28 characters of the FILE name
            suffix = f"_{i:05d}_0000000000_events.npy"
            assert len(suffix) == 28
            np.save(os.path.join(d, f"{cls}{suffix}"), ev)


def build_cifar_tree(root, classes=("airplane", "bird"), n=2, n_events=4000):
    # class sits at split('_')[1] of the FILE name
    # (ft_cifar10_dvs_dataset.py:38-39)
    for cls in classes:
        d = os.path.join(root, cls)
        os.makedirs(d)
        for i in range(n):
            ev = make_stream(
                np.random.default_rng(hash((cls, i, "c")) % 2 ** 31),
                n_events, w=128, h=128,
            )
            np.save(os.path.join(d, f"cifar10_{cls}_{i}.npy"), ev)


def build_es_tree(root, label_path, classes=("n01440764", "n01443537"), n=2,
                  n_events=4000):
    lines = []
    for cls in classes:
        d = os.path.join(root, cls)
        os.makedirs(d)
        for i in range(n):
            rng = np.random.default_rng(hash((cls, i, "es")) % 2 ** 31)
            a, b = int(rng.integers(180, 254)), int(rng.integers(180, 254))
            npos = n_events // 2
            nneg = n_events - npos
            # stored (row, col, t) with t starting at 1
            # (ft_es_imagenet_dataset.py:62-77)
            pos = np.stack([
                rng.integers(0, a, npos), rng.integers(0, b, npos),
                np.sort(rng.integers(1, 5000, npos)),
            ], axis=-1)
            neg = np.stack([
                rng.integers(0, a, nneg), rng.integers(0, b, nneg),
                np.sort(rng.integers(1, 5000, nneg)),
            ], axis=-1)
            name = f"{cls}_{i}.npz"
            np.savez(os.path.join(d, name), pos=pos, neg=neg)
            lines.append(f"{name} {a} {b} 0\n")
    with open(label_path, "w") as f:
        f.writelines(lines)


def build_dvs128_tree(root, classes=("0", "1", "10", "2"), n=1,
                      n_events=4000):
    for cls in classes:
        d = os.path.join(root, cls)
        os.makedirs(d)
        for i in range(n):
            ev = make_stream(
                np.random.default_rng(hash((cls, i, "g")) % 2 ** 31),
                n_events, w=128, h=128,
            )
            np.savez(os.path.join(d, f"user0{i}.npz"), x=ev[:, 0],
                     y=ev[:, 1], t=ev[:, 2], p=ev[:, 3])


def build_ucf_tree(root, classes=("ApplyEyeMakeup", "Archery"), n=1,
                   n_events=4000):
    import scipy.io

    for cls in classes:
        d = os.path.join(root, cls)
        os.makedirs(d)
        for i in range(n):
            ev = make_stream(
                np.random.default_rng(hash((cls, i, "u")) % 2 ** 31),
                n_events, w=240, h=180,
            )
            scipy.io.savemat(
                os.path.join(d, f"v_{cls}_{i}.mat"),
                {"x": ev[:, [0]], "y": ev[:, [1]], "ts": ev[:, [2]],
                 "pol": ev[:, [3]]},
            )


def build_nimagenet_tree(root, classes=("n01440764", "n01443537"), n=2,
                         n_events=4000):
    for cls in classes:
        d = os.path.join(root, cls)
        os.makedirs(d)
        for i in range(n):
            rng = np.random.default_rng(hash((cls, i, "n")) % 2 ** 31)
            arr = np.zeros(n_events, dtype=[("x", "<u2"), ("y", "<u2"),
                                            ("t", "<i8"), ("p", "?")])
            arr["x"] = rng.integers(0, 640, n_events)
            arr["y"] = rng.integers(0, 480, n_events)
            arr["t"] = np.sort(rng.integers(0, 10 ** 6, n_events))
            arr["p"] = rng.integers(0, 2, n_events).astype(bool)
            np.savez(os.path.join(d, f"{cls}_{i}.npz"), event_data=arr)


# ---------------------------------------------------------------------------
# per-dataset spec: reference Dataset + args, our source + pipeline config
# ---------------------------------------------------------------------------


def _common_args(num_bins, num_classes, input_size, fix, val_fix, **extra):
    return ref_args(
        num_bins=num_bins, num_classes=num_classes, input_size=input_size,
        fix_events_num=fix, val_fix_events_num=val_fix,
        val_event_noise=False, resize_mode="bilinear", crop_min=0.8,
        use_evrepsl=False, **extra,
    )


class Spec:
    name: str
    sensor_hw: tuple[int, int]
    rescale: str = "never"
    num_classes: int = 2

    def __init__(self, tmp_path):
        self.root = str(tmp_path / self.name)
        os.makedirs(self.root, exist_ok=True)
        self.aux = str(tmp_path / f"{self.name}_labels.txt")

    def our_cfg(self, num_bins, input_size, fix=3000, val_fix=40000,
                use_evrep=False):
        rescale_active = self.rescale == "always" or (
            self.rescale == "ecdp" and num_bins == 2
        )
        canvas = ((input_size, input_size) if rescale_active
                  else self.sensor_hw)
        return clp.ClsDataConfig(
            num_classes=self.num_classes, num_bins=num_bins,
            input_size=input_size, fix_events_num=fix,
            val_fix_events_num=val_fix,
            canvas_height=canvas[0], canvas_width=canvas[1],
            infer_sensor_size=False,
            sensor_height=self.sensor_hw[0], sensor_width=self.sensor_hw[1],
            rescale_to_input=self.rescale, resize_mode="bilinear",
            compact_transfer=False, use_evrep=use_evrep,
        )


class CaltechSpec(Spec):
    name = "caltech"
    sensor_hw = (180, 240)

    def build(self, **kw):
        build_caltech_tree(self.root, **kw)

    def ref_dataset(self, num_bins, input_size, is_train, fix=3000,
                    val_fix=40000, use_evrepsl=False):
        from dataset.finetune_cls.ft_n_caltech101_dataset import (
            FinetuneNCaltech101Dataset,
        )

        args = _common_args(
            num_bins, self.num_classes, input_size, fix, val_fix,
            cal_sensor_h=180, cal_sensor_w=240,
            n_caltech101_train_root=self.root,
            n_caltech101_val_root=self.root,
        )
        args.use_evrepsl = use_evrepsl
        return FinetuneNCaltech101Dataset(args, is_train=is_train)

    def our_source(self):
        return cs.NCaltech101Source(self.root)


class CifarSpec(Spec):
    name = "cifar"
    sensor_hw = (128, 128)
    rescale = "ecdp"

    def build(self, **kw):
        build_cifar_tree(self.root, **kw)

    def ref_dataset(self, num_bins, input_size, is_train, fix=3000,
                    val_fix=40000):
        from dataset.finetune_cls.ft_cifar10_dvs_dataset import (
            FinetuneCIFAR10DVSDataset,
        )

        args = _common_args(
            num_bins, self.num_classes, input_size, fix, val_fix,
            cifar_sensor_h=128, cifar_sensor_w=128,
            cifar10_dvs_train_root=self.root, cifar10_dvs_val_root=self.root,
        )
        return FinetuneCIFAR10DVSDataset(args, is_train=is_train)

    def our_source(self):
        return cs.Cifar10DvsSource(self.root)


class EsSpec(Spec):
    name = "es"
    sensor_hw = (224, 224)

    def build(self, **kw):
        build_es_tree(self.root, self.aux, **kw)

    def ref_dataset(self, num_bins, input_size, is_train, fix=3000,
                    val_fix=40000):
        from dataset.finetune_cls.ft_es_imagenet_dataset import (
            FinetuneESImageNetDataset,
        )

        args = _common_args(
            num_bins, self.num_classes, input_size, fix, val_fix,
            esimg_sensor_h=224, esimg_sensor_w=224,
            es_imagenet_train_root=self.root, es_imagenet_val_root=self.root,
            es_imagenet_train_label_path=self.aux,
            es_imagenet_val_label_path=self.aux,
        )
        return FinetuneESImageNetDataset(args, is_train=is_train)

    def our_source(self):
        return cs.EsImageNetSource(self.root, self.aux, self.num_classes)


class Dvs128Spec(Spec):
    name = "dvs128"
    sensor_hw = (128, 128)
    rescale = "ecdp"
    num_classes = 4

    def build(self, **kw):
        build_dvs128_tree(self.root, **kw)

    def ref_dataset(self, num_bins, input_size, is_train, fix=3000,
                    val_fix=40000):
        from dataset.finetune_cls.ft_dvs128_gesture_dataset import (
            FinetuneDVS128GestureDataset,
        )

        args = _common_args(
            num_bins, self.num_classes, input_size, fix, val_fix,
            gesture_sensor_h=128, gesture_sensor_w=128,
            dvs128_gesture_train_root=self.root,
            dvs128_gesture_val_root=self.root,
        )
        return FinetuneDVS128GestureDataset(args, is_train=is_train)

    def our_source(self):
        return cs.Dvs128GestureSource(self.root)


class UcfSpec(Spec):
    name = "ucf"
    sensor_hw = (180, 240)
    rescale = "ecdp"

    def build(self, **kw):
        build_ucf_tree(self.root, **kw)

    def ref_dataset(self, num_bins, input_size, is_train, fix=3000,
                    val_fix=40000):
        from dataset.finetune_cls.ft_ucf101_dvs_dataset import (
            FinetuneUCF101DVSDataset,
        )

        args = _common_args(
            num_bins, self.num_classes, input_size, fix, val_fix,
            ucf_sensor_h=180, ucf_sensor_w=240,
            ucf101_dvs_train_root=self.root, ucf101_dvs_val_root=self.root,
        )
        return FinetuneUCF101DVSDataset(args, is_train=is_train)

    def our_source(self):
        return cs.Ucf101DvsSource(self.root)


class NImagenetSpec(Spec):
    name = "nimagenet"
    sensor_hw = (480, 640)
    rescale = "always"

    def build(self, **kw):
        build_nimagenet_tree(self.root, **kw)

    def ref_dataset(self, num_bins, input_size, is_train, fix=3000,
                    val_fix=40000):
        from dataset.finetune_cls.ft_n_imagenet_dataset import (
            FinetuneNImageNetDataset,
        )

        args = _common_args(
            num_bins, self.num_classes, input_size, fix, val_fix,
            img_sensor_h=480, img_sensor_w=640,
            n_imagenet_train_root=self.root,
            n_imagenet_val_origin_root=self.root,
        )
        return FinetuneNImageNetDataset(args, is_train=is_train)

    def our_source(self):
        return cs.NImageNetSource(self.root, self.num_classes)


SPECS = {
    "caltech": CaltechSpec,
    "cifar": CifarSpec,
    "es": EsSpec,
    "dvs128": Dvs128Spec,
    "ucf": UcfSpec,
    "nimagenet": NImagenetSpec,
}


def _assert_batch_matches(batch, ref_item, i=0, atol=1e-4):
    np.testing.assert_allclose(
        np.asarray(batch["evg"][0]).transpose(2, 0, 1),
        np.asarray(ref_item["events_voxel_grid"]),
        atol=atol, rtol=1e-4,
        err_msg=f"sample {i} ({ref_item['image_name']})",
    )
    assert int(batch["label"][0]) == int(ref_item["label"])


# ---------------------------------------------------------------------------
# val path: deterministic end-to-end agreement per representation
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("num_bins", [5, 2, 3])
@pytest.mark.parametrize(
    "ds", ["caltech", "cifar", "es", "dvs128", "ucf", "nimagenet"]
)
def test_cls_val_samples_vs_reference(tmp_path, ds, num_bins):
    """Validation path, every sample: reference Dataset __getitem__
    (is_train=False) vs our source+ClsPipeline on the same reference-layout
    tree, for voxel / ECDP / MEM representations."""
    spec = SPECS[ds](tmp_path)
    spec.build()
    # reference ES-ImageNet rasters the ECDP image directly at input_size
    # from 0..223 coords (ft_es_imagenet_dataset.py:110) — only input 224
    # is well-defined (bincount reshape requires coords < input_size)
    input_size = 224 if (ds == "es" and num_bins == 2) else 48
    ref_ds = spec.ref_dataset(num_bins, input_size, is_train=False)
    pipe = clp.ClsPipeline(
        spec.our_source(), spec.our_cfg(num_bins, input_size),
        batch_size=1, train=False, seed=0, num_workers=0,
    )
    n = 0
    for i, batch in enumerate(iter(pipe)):
        _assert_batch_matches(batch, ref_ds[i], i)
        n += 1
    assert n == len(ref_ds) > 0


def test_caltech_evrep_val_vs_reference(tmp_path):
    """EvRepSL representation path (ft_n_caltech101_dataset.py:78-82):
    microsecond timestamps, sensor-size EvRep grid, bilinear view resize.

    The count and polarity channels must agree exactly. The delta-t std
    channel carries irreducible f32 noise: the reference accumulates
    microsecond-scale deltas and their squares in float32
    (events_to_image.py:93-94,113-119), so its sq_sum - mean^2 cancellation
    is itself only good to ~1e-7 * max(t_us)^2 — two correct f32
    implementations with different accumulation orders disagree by up to
    ~sqrt(ulp). The formula itself is pinned exactly (second-scale inputs)
    in test_e2e_parity.py::test_evrep_vs_reference; here E_T gets a
    cancellation-scale tolerance."""
    spec = CaltechSpec(tmp_path)
    spec.build(t_us_int=True)
    ref_ds = spec.ref_dataset(5, 48, is_train=False, use_evrepsl=True)
    pipe = clp.ClsPipeline(
        spec.our_source(), spec.our_cfg(5, 48, use_evrep=True),
        batch_size=1, train=False, seed=0, num_workers=0,
    )
    n = 0
    for i, batch in enumerate(iter(pipe)):
        ref_item = ref_ds[i]
        ours = np.asarray(batch["evg"][0]).transpose(2, 0, 1)
        ref = np.asarray(ref_item["events_voxel_grid"])
        np.testing.assert_allclose(ours[:2], ref[:2], atol=1e-3, rtol=1e-4)
        np.testing.assert_allclose(ours[2], ref[2], atol=30.0)
        assert int(batch["label"][0]) == int(ref_item["label"])
        n += 1
    assert n == len(ref_ds) == 4


# ---------------------------------------------------------------------------
# train path: draw-coupled single-sample agreement (window -> erase/add ->
# [reshape] -> representation -> crop/resize/flip/tflip -> normalize)
# ---------------------------------------------------------------------------

_TRAIN_CASES = [
    # (dataset, num_bins): cover each loader's riskiest representation —
    # bins=2 exercises the post-augment events_reshape on the "ecdp" group
    ("caltech", 5),
    ("caltech", 2),
    ("cifar", 2),
    ("cifar", 5),
    ("es", 5),
    ("dvs128", 2),
    ("ucf", 5),
    ("ucf", 2),
    ("nimagenet", 5),
    ("nimagenet", 2),
]


@pytest.mark.parametrize("ds,num_bins", _TRAIN_CASES)
@pytest.mark.parametrize("seed", [0, 7])
def test_cls_train_sample_vs_reference(tmp_path, monkeypatch, ds, num_bins,
                                       seed):
    spec = SPECS[ds](tmp_path)
    # single class, single file: batch assembly adds no extra draws
    if ds == "es":
        spec.num_classes = 1
        spec.build(classes=("n01440764",), n=1)
    elif ds == "dvs128":
        spec.num_classes = 1
        spec.build(classes=("0",), n=1)
    else:
        spec.num_classes = 1
        first = {"caltech": "accordion", "cifar": "airplane",
                 "ucf": "ApplyEyeMakeup", "nimagenet": "n01440764"}[ds]
        spec.build(classes=(first,), n=1)

    input_size = 224 if (ds == "es" and num_bins == 2) else 48
    np.random.seed(seed)
    ref_item = spec.ref_dataset(num_bins, input_size, is_train=True)[0]

    monkeypatch.setattr(clp, "augment_pack_event_batch",
                        lambda *a, **k: None)
    pipe = clp.ClsPipeline(
        spec.our_source(), spec.our_cfg(num_bins, input_size),
        batch_size=1, train=True, seed=0, num_workers=0,
    )
    np.random.seed(seed)
    pipe.rng = PipelineCoupledRng(3000)
    batch = next(iter(pipe))
    _assert_batch_matches(batch, ref_item)
