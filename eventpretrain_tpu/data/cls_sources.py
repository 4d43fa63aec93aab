"""Classification dataset sources for the remaining 6 benchmarks.

Each source yields (events_xytp float64 (N,4), label int) and plugs into
data.cls_pipeline.ClsPipeline. Format parity with the reference loaders
(verified value-for-value against the imported reference Datasets in
tests/test_cls_dataset_parity.py):

  * N-Caltech101 : root/<class>/<class>_*.npy xytp rows
                   (ft_n_caltech101_dataset.py:40-46), sensor 180x240
                   (cal_sensor_h/w defaults, main_finetune_cls.py:173-174)
  * CIFAR10-DVS  : root/<class>/*_<class>_*.npy xytp rows
                   (ft_cifar10_dvs_dataset.py:38-44), sensor 128x128;
                   the ECDP-only coordinate rescale to the input resolution
                   happens AFTER the stream augment
                   (ft_cifar10_dvs_dataset.py:69-72), so it lives in
                   ClsPipeline (rescale_to_input="ecdp"), not here
  * N-ImageNet   : root/<class>/<class>_*.npz structured ``event_data``
                   arrays with x/y/t/p fields, timestamps / 1e6 to seconds
                   (ft_n_imagenet_dataset.py:61-69); coords rescaled
                   640x480 -> input AFTER the stream augment for every
                   representation (:92-93) -> rescale_to_input="always"
  * ES-ImageNet  : npz pos/neg (x,y,t) + per-file (a,b) offsets from a label
                   txt; recentered then cropped 16..240 -> 224
                   (ft_es_imagenet_dataset.py:36-87); class dirs sliced to
                   the first num_classes (:25)
  * DVS128       : root/<label>/<file>.npz with x/y/t/p arrays; the label is
                   the integer directory NAME, not its sorted position
                   (ft_dvs128_gesture_dataset.py:51-54); sensor 128x128;
                   ECDP rescale after augment (:73-76) -> "ecdp"
  * UCF101-DVS   : root/<class>/*.mat with x/y/ts/pol columns
                   (ft_ucf101_dvs_dataset.py:40-50), sensor 180x240
                   (ucf_sensor_h/w defaults, main_finetune_cls.py:181-182);
                   ECDP rescale after augment (:75-78) -> "ecdp"
"""

from __future__ import annotations

import os
import re

import numpy as np


class _ClassDirSource:
    """root/<class>/<file> layout with per-class sorted file lists."""

    def __init__(self, root: str, num_classes: int | None = None):
        self.root = root
        self.classes = sorted(os.listdir(root))
        if num_classes is not None:
            # reference slices the sorted class list (ft_es_imagenet_dataset
            # .py:25, ft_n_imagenet_dataset.py via num_classes assert)
            self.classes = self.classes[:num_classes]
        self.files: list[tuple[str, int]] = []
        for label, cls in enumerate(self.classes):
            for name in sorted(os.listdir(os.path.join(root, cls))):
                self.files.append((os.path.join(root, cls, name), label))

    def __len__(self) -> int:
        return len(self.files)


class NCaltech101Source(_ClassDirSource):
    sensor_hw = (180, 240)

    def load(self, index: int):
        path, label = self.files[index]
        return np.load(path).astype(np.float64), label


class Cifar10DvsSource(_ClassDirSource):
    sensor_hw = (128, 128)

    def load(self, index: int):
        path, label = self.files[index]
        return np.load(path).astype(np.float64), label


class NImageNetSource(_ClassDirSource):
    sensor_hw = (480, 640)

    def __init__(self, root: str, num_classes: int | None = None):
        super().__init__(root, num_classes)

    def load(self, index: int):
        path, label = self.files[index]
        raw = np.load(path)
        arr = raw["event_data"] if "event_data" in getattr(raw, "files", []) \
            else raw
        # reference ft_n_imagenet_dataset.py:66-69: structured x/y/t/p
        # fields, microsecond timestamps scaled to seconds
        events = np.vstack(
            [arr["x"], arr["y"], arr["t"], arr["p"]]
        ).T.astype(np.float64)
        events[:, 2] = events[:, 2] / 1e6
        return events, label


class EsImageNetSource(_ClassDirSource):
    sensor_hw = (224, 224)

    def __init__(self, root: str, label_path: str,
                 num_classes: int | None = None):
        super().__init__(root, num_classes)
        self.offsets: dict[str, tuple[int, int]] = {}
        with open(label_path) as f:
            for line in f:
                parts = re.split(" ", line)
                self.offsets[parts[0]] = (int(parts[1]), int(parts[2]))

    def load(self, index: int):
        path, label = self.files[index]
        name = os.path.basename(path)
        data = np.load(path)
        pos = np.concatenate(
            [data["pos"], np.ones((len(data["pos"]), 1))], axis=-1
        )
        neg = np.concatenate(
            [data["neg"], np.zeros((len(data["neg"]), 1))], axis=-1
        )
        events = np.concatenate([pos, neg], axis=0)
        events = events[events[:, 2].argsort()]

        a, b = self.offsets[name]
        dx, dy = (254 - a) // 2, (254 - b) // 2
        # reference swaps axes: stored (row, col); y gets dx, x gets dy
        y = events[:, 0] + dx
        x = events[:, 1] + dy
        t = events[:, 2] - 1
        p = events[:, 3]
        keep = (x >= 16) & (x < 240) & (y >= 16) & (y < 240)
        return (
            np.stack([x[keep] - 16, y[keep] - 16, t[keep], p[keep]], axis=-1),
            label,
        )


class Dvs128GestureSource(_ClassDirSource):
    sensor_hw = (128, 128)

    def __init__(self, root: str):
        super().__init__(root)
        # the reference takes the label from the integer directory NAME
        # (ft_dvs128_gesture_dataset.py:51-54), which differs from the
        # sorted position once dirs reach two digits ('10' sorts before '2')
        self.files = [
            (path, int(os.path.basename(os.path.dirname(path))))
            for path, _ in self.files
        ]

    def load(self, index: int):
        path, label = self.files[index]
        data = np.load(path)
        events = np.stack(
            [data["x"], data["y"], data["t"], data["p"]], axis=-1
        ).astype(np.float64)
        return events, label


class Ucf101DvsSource(_ClassDirSource):
    # reference augments/rasters at ucf_sensor_h/w = 180x240
    # (main_finetune_cls.py:181-182), NOT the DAVIS240 native 240x320
    sensor_hw = (180, 240)

    def __init__(self, root: str, sensor_hw: tuple[int, int] | None = None):
        super().__init__(root)
        if sensor_hw is not None:
            self.sensor_hw = tuple(sensor_hw)

    def load(self, index: int):
        import scipy.io

        path, label = self.files[index]
        m = scipy.io.loadmat(path)
        events = np.concatenate(
            [m["x"], m["y"], m["ts"], m["pol"]], axis=-1
        ).astype(np.float64)
        return events, label
