"""On-disk format tests for the classification dataset sources."""

import numpy as np
import pytest

from eventpretrain_tpu.data import cls_sources as cs


def _events(n=100, w=64, h=48, rng=None):
    rng = rng or np.random.default_rng(0)
    return np.stack(
        [rng.integers(0, w, n), rng.integers(0, h, n),
         np.sort(rng.uniform(0, 1, n)), rng.integers(0, 2, n)], axis=-1
    ).astype(np.float64)


def test_n_caltech101(tmp_path, rng):
    for cls in ("accordion", "airplanes"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(2):
            np.save(d / f"{cls}_{i}.npy", _events(rng=rng))
    src = cs.NCaltech101Source(str(tmp_path))
    assert len(src) == 4
    ev, label = src.load(3)
    assert ev.shape[1] == 4 and label == 1


def test_cifar10_dvs(tmp_path, rng):
    # coords stay at the 128x128 sensor; the ECDP-only rescale happens in
    # ClsPipeline after the stream augment (ft_cifar10_dvs_dataset.py:69-72)
    d = tmp_path / "airplane"
    d.mkdir()
    ev = _events(w=128, h=128, rng=rng)
    np.save(d / "cifar10_airplane_0.npy", ev)
    src = cs.Cifar10DvsSource(str(tmp_path))
    out, label = src.load(0)
    np.testing.assert_allclose(out, ev)
    assert src.sensor_hw == (128, 128)
    assert label == 0


def test_dvs128_gesture(tmp_path, rng):
    # label comes from the integer directory NAME, not the sorted position
    # (ft_dvs128_gesture_dataset.py:51-54): '10' sorts before '2'
    ev = _events(w=128, h=128, rng=rng)
    for name in ("10", "2", "3"):
        d = tmp_path / name
        d.mkdir()
        np.savez(d / "user01.npz", x=ev[:, 0], y=ev[:, 1], t=ev[:, 2],
                 p=ev[:, 3])
    src = cs.Dvs128GestureSource(str(tmp_path))
    out, label = src.load(0)
    np.testing.assert_allclose(out, ev)
    assert [src.load(i)[1] for i in range(3)] == [10, 2, 3]


def test_es_imagenet(tmp_path, rng):
    d = tmp_path / "root" / "n01440764"
    d.mkdir(parents=True)
    pos = np.stack([rng.integers(0, 254, 50), rng.integers(0, 254, 50),
                    np.arange(1, 51)], axis=-1)
    neg = np.stack([rng.integers(0, 254, 30), rng.integers(0, 254, 30),
                    np.arange(1, 31)], axis=-1)
    np.savez(d / "n01440764_1.npz", pos=pos, neg=neg)
    label_file = tmp_path / "labels.txt"
    label_file.write_text("n01440764_1.npz 254 254 0\n")
    src = cs.EsImageNetSource(str(tmp_path / "root"), str(label_file))
    ev, label = src.load(0)
    assert ev.shape[1] == 4
    assert ev[:, 0].max() < 224 and ev[:, 1].max() < 224
    assert ev[:, 0].min() >= 0


def test_ucf101_dvs(tmp_path, rng):
    scipy = pytest.importorskip("scipy")
    import scipy.io

    d = tmp_path / "ApplyEyeMakeup"
    d.mkdir()
    n = 40
    scipy.io.savemat(
        d / "v_1.mat",
        {"x": rng.integers(0, 320, (n, 1)), "y": rng.integers(0, 240, (n, 1)),
         "ts": np.sort(rng.uniform(0, 1, (n, 1)), 0),
         "pol": rng.integers(0, 2, (n, 1))},
    )
    src = cs.Ucf101DvsSource(str(tmp_path))
    ev, label = src.load(0)
    assert ev.shape == (40, 4)
    # reference augments/rasters at ucf_sensor 180x240
    # (main_finetune_cls.py:181-182)
    assert src.sensor_hw == (180, 240)


def test_n_imagenet_structured(tmp_path, rng):
    # reference field names are x/y/t/p with microsecond timestamps scaled
    # to seconds (ft_n_imagenet_dataset.py:66-69); coords stay at the
    # 480x640 sensor — the rescale lives in ClsPipeline ("always")
    d = tmp_path / "n01440764"
    d.mkdir()
    arr = np.zeros(
        60, dtype=[("x", "<u2"), ("y", "<u2"), ("t", "<i8"), ("p", "?")]
    )
    arr["x"] = rng.integers(0, 640, 60)
    arr["y"] = rng.integers(0, 480, 60)
    arr["t"] = np.arange(60) * 1000
    arr["p"] = rng.integers(0, 2, 60).astype(bool)
    np.savez(d / "n01440764_1.npz", event_data=arr)
    src = cs.NImageNetSource(str(tmp_path))
    ev, label = src.load(0)
    assert ev.shape == (60, 4)
    np.testing.assert_allclose(ev[:, 0], arr["x"])
    np.testing.assert_allclose(ev[:, 2], arr["t"] / 1e6)
    assert src.sensor_hw == (480, 640)
