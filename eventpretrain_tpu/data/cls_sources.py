"""Classification dataset sources for the remaining 6 benchmarks.

Each source yields (events_xytp float64 (N,4), label int) and plugs into
data.cls_pipeline.ClsPipeline. Format parity with the reference loaders:

  * N-Caltech101 : root/<class>/<class>_*.npy xytp rows
                   (ft_n_caltech101_dataset.py:22-50), sensor 240x180
  * CIFAR10-DVS  : files named *_<class>_*.npy, class at split index 1
                   (ft_cifar10_dvs_dataset.py:38-48), sensor 128x128,
                   coords rescaled to input size before rasterizing (:70)
  * N-ImageNet   : root/<class>/<class>_*.npz structured events; coords
                   rescaled 640x480 -> input size before voxelize
                   (ft_n_imagenet_dataset.py:61-93)
  * ES-ImageNet  : npz pos/neg (x,y,t) + per-file (a,b) offsets from a label
                   txt; recentered then cropped 16..240 -> 224
                   (ft_es_imagenet_dataset.py:36-87)
  * DVS128       : root/<label>/<file>.npz with x/y/t/p arrays
                   (ft_dvs128_gesture_dataset.py:23-54), sensor 128x128
  * UCF101-DVS   : root/<class>/*.mat with x/y/ts/pol columns
                   (ft_ucf101_dvs_dataset.py:40-50), sensor 240x320
"""

from __future__ import annotations

import os
import re

import numpy as np

from eventpretrain_tpu.data.event_transforms import rescale_coords


class _ClassDirSource:
    """root/<class>/<file> layout with per-class sorted file lists."""

    def __init__(self, root: str):
        self.root = root
        self.classes = sorted(os.listdir(root))
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

    def __init__(self, root: str, input_size: int = 224):
        super().__init__(root)
        self.input_size = input_size

    def load(self, index: int):
        path, label = self.files[index]
        events = np.load(path).astype(np.float64)
        # reference rescales CIFAR coords to the input resolution before
        # rasterizing (ft_cifar10_dvs_dataset.py:70-72)
        events = rescale_coords(
            events, self.sensor_hw[1], self.sensor_hw[0],
            self.input_size, self.input_size,
        )
        return events, label


class NImageNetSource(_ClassDirSource):
    sensor_hw = (480, 640)

    def __init__(self, root: str, input_size: int = 224,
                 num_classes: int | None = None):
        self.root = root
        self.classes = sorted(os.listdir(root))
        if num_classes:
            self.classes = self.classes[:num_classes]
        self.files = []
        for label, cls in enumerate(self.classes):
            for name in sorted(os.listdir(os.path.join(root, cls))):
                self.files.append((os.path.join(root, cls, name), label))
        self.input_size = input_size

    def load(self, index: int):
        path, label = self.files[index]
        raw = np.load(path)
        arr = raw["event_data"] if "event_data" in getattr(raw, "files", []) \
            else raw
        if hasattr(arr, "dtype") and arr.dtype.names:
            events = np.stack(
                [arr["x"], arr["y"], arr["timestamp"],
                 arr["polarity"].astype(np.int8)], axis=-1
            ).astype(np.float64)
        else:
            events = np.asarray(arr, np.float64)
        events = rescale_coords(
            events, self.sensor_hw[1], self.sensor_hw[0],
            self.input_size, self.input_size,
        )
        return events, label


class EsImageNetSource(_ClassDirSource):
    sensor_hw = (224, 224)

    def __init__(self, root: str, label_path: str):
        super().__init__(root)
        self.offsets: dict[str, tuple[int, int]] = {}
        with open(label_path) as f:
            for line in f:
                parts = line.split(" ")
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

    def load(self, index: int):
        path, label = self.files[index]
        data = np.load(path)
        events = np.stack(
            [data["x"], data["y"], data["t"], data["p"]], axis=-1
        ).astype(np.float64)
        return events, label


class Ucf101DvsSource(_ClassDirSource):
    sensor_hw = (240, 320)

    def load(self, index: int):
        import scipy.io

        path, label = self.files[index]
        m = scipy.io.loadmat(path)
        events = np.concatenate(
            [m["x"], m["y"], m["ts"], m["pol"]], axis=-1
        ).astype(np.float64)
        return events, label
