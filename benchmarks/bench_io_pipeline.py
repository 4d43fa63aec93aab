"""Host pipeline IO throughput: sequential vs thread-pool sample loading.

Writes a disk-backed EF-ImageNet-format tree (torch-saved tensors, the
reference's on-disk layout) plus an N-Cars-style npy tree, then measures
PretrainPipeline / ClsPipeline samples/s at num_workers 0 vs N. The device
step consumes ~1400 samples/s at the stage-1 headline, so the host path
must sustain that; single-threaded file IO is the reference's reason for
DataLoader workers (main_pretrain.py:236-243).

    PYTHONPATH=. python benchmarks/bench_io_pipeline.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np


def build_ef_tree(root: str, n_images: int = 192, size: int = 224,
                  bins: int = 5) -> None:
    import torch

    rng = np.random.default_rng(0)
    for i in range(n_images):
        name = f"img{i:05d}"
        base = os.path.join(root, "cls0", name)
        os.makedirs(os.path.join(base, "events/noisy"), exist_ok=True)
        os.makedirs(os.path.join(base, "sub_frames"), exist_ok=True)
        for k in range(2):  # num_frames=2 keeps the tree small
            evg = rng.normal(size=(bins, size, size)).astype(np.float32)
            torch.save(
                torch.from_numpy(evg),
                os.path.join(base, "events/noisy",
                             f"{name}_0{k}_noisy_events_voxel_grid.pt"),
            )
            frame = rng.normal(size=(1, size, size)).astype(np.float32)
            torch.save(
                torch.from_numpy(frame),
                os.path.join(base, "sub_frames", f"{name}_0{k}_sub_frame.pt"),
            )
        clip = rng.normal(size=(197, 512)).astype(np.float32)
        import torch as _t

        _t.save(_t.from_numpy(clip), os.path.join(base, f"{name}_clip_emb.pt"))


def build_ncars_tree(root: str, n_files: int = 256,
                     n_events: int = 30000) -> None:
    rng = np.random.default_rng(0)
    for cls in ("cars", "background"):
        d = os.path.join(root, cls)
        os.makedirs(d, exist_ok=True)
        for i in range(n_files // 2):
            ev = np.stack([
                rng.integers(0, 120, n_events),
                rng.integers(0, 100, n_events),
                np.sort(rng.random(n_events)),
                rng.integers(0, 2, n_events),
            ], axis=1).astype(np.float32)
            np.save(os.path.join(d, f"ev{i:04d}.npy"), ev)


def drain(pipe, batch_size: int) -> float:
    import jax

    n = 0
    t0 = time.perf_counter()
    last = None
    for batch in pipe:
        last = batch
        n += batch_size
    jax.block_until_ready(last)
    return n / (time.perf_counter() - t0)


def main():
    from eventpretrain_tpu.data.cls_pipeline import (
        ClsDataConfig, ClsPipeline, NCarsSource,
    )
    from eventpretrain_tpu.data.pretrain_pipeline import (
        EFImageNetSource, PretrainDataConfig, PretrainPipeline,
    )

    rows = []
    tmp = tempfile.mkdtemp(prefix="evp_io_bench_")
    try:
        ef_root = os.path.join(tmp, "ef")
        build_ef_tree(ef_root)
        src = EFImageNetSource(ef_root, pr_phase="rec", num_frames=2)
        cfg = PretrainDataConfig(pr_phase="rec")
        for workers in (0, 8):
            pipe = PretrainPipeline(src, cfg, 64, train=True, seed=0,
                                    num_workers=workers)
            drain(pipe, 64)  # warm page cache + compile
            rate = max(drain(pipe, 64) for _ in range(2))
            rows.append({"pipeline": "pretrain_ef", "num_workers": workers,
                         "samples_per_sec": round(rate, 1)})
            print(rows[-1], file=sys.stderr)

        nc_root = os.path.join(tmp, "ncars")
        build_ncars_tree(nc_root)
        csrc = NCarsSource(nc_root)
        ccfg = ClsDataConfig(num_classes=2, canvas_height=100,
                             canvas_width=120, infer_sensor_size=False)
        for workers in (0, 8):
            pipe = ClsPipeline(csrc, ccfg, 64, train=True, seed=0,
                               num_workers=workers)
            drain(pipe, 64)
            rate = max(drain(pipe, 64) for _ in range(2))
            rows.append({"pipeline": "cls_ncars", "num_workers": workers,
                         "samples_per_sec": round(rate, 1)})
            print(rows[-1], file=sys.stderr)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(rows))
    return rows


if __name__ == "__main__":
    main()
