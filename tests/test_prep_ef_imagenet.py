"""Round-trip test for the EF-ImageNet tree builder (VERDICT r2 item 7):
synthesize a raw EF-ImageNet organization (event text streams at 30 fps +
video frames, reference EForgNImageNetDataset layout,
pr_ef_imagenet_dataset.py:16-118), build the precomputed tree with
data/prep_ef_imagenet.py, and pretrain one rec epoch from it through
EFImageNetSource + the CLI — stage 1 is reproducible from raw events."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from eventpretrain_tpu.data import prep_ef_imagenet as prep


def build_org_tree(root, rng, names=("n01_0001", "n01_0002"), fps=30.0,
                   num_frames=10, hw=(48, 64), with_clean=True):
    from PIL import Image

    for name in names:
        cls = name.split("_")[0]
        base = os.path.join(root, cls, name)
        os.makedirs(os.path.join(base, "events", "noisy"))
        if with_clean:
            os.makedirs(os.path.join(base, "events", "clean"))
        os.makedirs(os.path.join(base, "frames"))
        # events spanning (num_frames + 2) video frames
        duration = (num_frames + 2.5) / fps
        n = 6000
        t = np.sort(rng.uniform(0, duration, n))
        h, w = hw
        ev = np.stack([
            t,
            rng.integers(0, w, n).astype(float),
            rng.integers(0, h, n).astype(float),
            rng.integers(0, 2, n).astype(float),
        ], axis=1)
        header = "\n".join(f"# header {i}" for i in range(6))
        for kind in ("noisy",) + (("clean",) if with_clean else ()):
            path = os.path.join(base, "events", kind,
                                f"{name}_{kind}_events.txt")
            with open(path, "w") as f:
                f.write(header + "\n")
                np.savetxt(f, ev, fmt="%.6f %d %d %d")
        for k in range(num_frames + 3):
            img = rng.integers(0, 256, (h, w), dtype=np.uint8)
            Image.fromarray(img, mode="L").save(
                os.path.join(base, "frames", f"{name}_{k:02d}.png")
            )


def test_prep_roundtrip_pretrain(tmp_path):
    org = os.path.join(str(tmp_path), "org")
    out = os.path.join(str(tmp_path), "tree")
    build_org_tree(org, np.random.default_rng(0))

    done = prep.main([
        "--org_root", org, "--out", out, "--input_size", "32",
        "--num_frames", "10",
    ])
    assert done == 2

    # tree shape matches the reference layout EFImageNetSource expects
    base = os.path.join(out, "n01", "n01_0001")
    for k in range(10):
        g = torch.load(os.path.join(
            base, "events", "noisy",
            f"n01_0001_0{k}_noisy_events_voxel_grid.pt",
        ))
        assert tuple(g.shape) == (5, 32, 32)
        c = torch.load(os.path.join(
            base, "events", "clean",
            f"n01_0001_0{k}_clean_events_voxel_grid.pt",
        ))
        assert tuple(c.shape) == (5, 32, 32)
        s = torch.load(os.path.join(
            base, "sub_frames", f"n01_0001_0{k}_sub_frame.pt",
        ))
        assert tuple(s.shape) == (1, 32, 32)

    # grids carry signal and sub-frames are genuine differences
    assert float(g.abs().sum()) > 0
    assert float(s.min()) < 0 < float(s.max())

    # round trip: one rec pretrain epoch from the built tree via the CLI
    from eventpretrain_tpu.cli import pretrain as cli_pretrain

    state = cli_pretrain.main([
        "--pr_phase", "rec", "--dataset", "ef_imagenet",
        "--data_root", out, "--input_size", "32", "--epochs", "1",
        "--batch_size", "2", "--num_workers", "0", "--no-bf16",
        "--print_freq", "1",
        "--output_dir", os.path.join(str(tmp_path), "run"),
    ])
    assert state is not None and int(state.step) == 1  # 2 imgs / bs2


def test_window_indices_match_reference():
    """frame_window_indices == the reference get_index slicing."""
    from tests._torch_ref import load_reference

    load_reference()
    from dataset.pretrain.pr_ef_imagenet_dataset import EForgNImageNetDataset

    rng = np.random.default_rng(1)
    t = np.sort(rng.uniform(0, 0.5, 4000))
    events = np.stack([t, t * 0, t * 0, t * 0], axis=1)

    ds = EForgNImageNetDataset.__new__(EForgNImageNetDataset)
    frames_num, ref_idx = ds.get_index(events)
    ours = prep.frame_window_indices(t)
    assert ours == ref_idx
    assert len(ours) == frames_num + 1
