"""Raw N-ImageNet pretrain path: events+image batches, in-loop CLIP encoding.

Parity: reference dataset/pretrain/pr_n_imagenet_dataset.py:62-106 and
trainer/pretrain/pr_trainer.py:158-224 (pr_con_n_one_epoch).
"""

import numpy as np
import jax
import jax.numpy as jnp

from eventpretrain_tpu.data.pretrain_pipeline import (
    ClipEncodingPipeline,
    RawPretrainDataConfig,
    RawPretrainPipeline,
    SyntheticRawPretrainSource,
)


def _pipe(train=True, input_size=64):
    src = SyntheticRawPretrainSource(n=8, hw=(96, 96), num_events=2048)
    cfg = RawPretrainDataConfig(
        num_bins=5, input_size=input_size, fix_events_num=1024,
        canvas_height=96, canvas_width=96,
    )
    return RawPretrainPipeline(src, cfg, batch_size=4, train=train)


def test_raw_pipeline_shapes():
    batch = next(iter(_pipe()))
    assert batch["evg"].shape == (4, 64, 64, 5)
    assert batch["image"].shape == (4, 224, 224, 3)
    assert batch["image"].dtype == jnp.uint8
    assert bool(jnp.any(batch["evg"] != 0))


def test_raw_pipeline_eval_deterministic():
    a = next(iter(_pipe(train=False)))
    b = next(iter(_pipe(train=False)))
    np.testing.assert_array_equal(np.asarray(a["evg"]), np.asarray(b["evg"]))


def test_clip_encoding_pipeline():
    from eventpretrain_tpu.models.clip import CLIPVisionTransformer

    clip = CLIPVisionTransformer(width=32, layers=2, heads=2, output_dim=16)
    params = clip.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))[
        "params"
    ]
    wrapped = ClipEncodingPipeline(_pipe(), clip, params)
    assert len(wrapped) == len(_pipe())
    batch = next(iter(wrapped))
    assert "image" not in batch
    assert batch["clip_emb"].shape == (4, 197, 16)
    assert bool(jnp.all(jnp.isfinite(batch["clip_emb"])))


def test_n_imagenet_paired_source(tmp_path):
    from PIL import Image

    from eventpretrain_tpu.data.pretrain_pipeline import NImageNetPairedSource

    nroot = tmp_path / "n_imagenet"
    iroot = tmp_path / "imagenet"
    for cls in ("n01", "n02"):
        (nroot / cls).mkdir(parents=True)
        (iroot / cls).mkdir(parents=True)
        for i in range(2):
            name = f"{cls}_{i}"
            ev = np.zeros(
                16, dtype=[("x", "<u2"), ("y", "<u2"), ("t", "<i8"),
                           ("p", "i1")],
            )
            ev["x"] = np.arange(16)
            ev["t"] = np.arange(16) * 1000
            ev["p"] = 1
            np.savez(nroot / cls / f"{name}.npz", event_data=ev)
            Image.fromarray(
                np.full((260, 300, 3), 128, np.uint8)
            ).save(iroot / cls / f"{name}.JPEG")
    src = NImageNetPairedSource(str(nroot), str(iroot))
    assert len(src) == 4
    item = src.load(0)
    assert item["events"].shape == (16, 4)
    # t scaled to seconds (reference pr_n_imagenet_dataset.py:54)
    assert item["events"][-1, 2] == 15000 / 1e6
    assert item["image"].shape == (224, 224, 3)
    assert item["hw"] == (480, 640)
