"""End-to-end CLI test: finetune_cls --export_torch writes a .pth the
importer (and therefore the reference's loaders) can consume."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_pretrain_cli_exports_torch_checkpoint(tmp_path):
    """The pretrain CLI's --export_torch .pth carries backbone.* keys the
    reference's finetune checkpoint surgery (main_finetune_cls.py:326-381)
    consumes."""
    from eventpretrain_tpu.cli import pretrain

    out = tmp_path / "run"
    pth = tmp_path / "pretrained.pth"
    pretrain.main([
        "--pr_phase", "rec", "--dataset", "synthetic",
        "--epochs", "1", "--batch_size", "4", "--input_size", "32",
        "--model_size", "small",
        "--output_dir", str(out), "--export_torch", str(pth),
    ])

    assert pth.exists()
    sd = torch.load(str(pth), map_location="cpu", weights_only=False)["model"]
    assert any(k.startswith("backbone.vit_block.0.") for k in sd)
    assert any(k.startswith("backbone.patch_embed.") for k in sd)
    assert all(np.isfinite(np.asarray(v)).all() for v in sd.values())


def test_cls_cli_exports_serving_artifact(tmp_path):
    """--export_serving freezes the trained logits fn; the deserialized
    artifact reproduces the live model on arbitrary batch sizes."""
    import jax
    import jax.numpy as jnp

    from eventpretrain_tpu.cli import finetune_cls
    from eventpretrain_tpu.utils.export_infer import load_inference

    out = tmp_path / "run"
    art = tmp_path / "cls.stablehlo"
    finetune_cls.main([
        "--dataset", "synthetic", "--epochs", "1", "--batch_size", "4",
        "--input_size", "32", "--model_size", "small",
        "--num_classes", "2",
        "--output_dir", str(out), "--export_serving", str(art),
    ])
    assert art.exists()
    infer = load_inference(str(art))
    logits = infer(jnp.zeros((3, 32, 32, 5), jnp.float32))
    assert logits.shape == (3, 2)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_cls_cli_exports_torch_checkpoint(tmp_path):
    from eventpretrain_tpu.cli import finetune_cls

    out = tmp_path / "run"
    pth = tmp_path / "exported.pth"
    finetune_cls.main([
        "--dataset", "synthetic", "--epochs", "1", "--batch_size", "4",
        "--input_size", "32", "--model_size", "small",
        "--num_classes", "2",
        "--output_dir", str(out), "--export_torch", str(pth),
    ])

    assert pth.exists()
    payload = torch.load(str(pth), map_location="cpu", weights_only=False)
    sd = payload["model"]
    # native dialect: backbone.* + classify_head.*, torch (out, in) layout
    assert any(k.startswith("backbone.vit_block.0.") for k in sd)
    head = sd["classify_head.weight"]
    assert tuple(head.shape) == (2, 384)
    assert all(np.isfinite(np.asarray(v)).all() for v in sd.values())
