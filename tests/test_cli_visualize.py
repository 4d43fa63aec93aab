"""CLI --visualize smoke tests: every training entry point renders its
reference-parity diagnostic figure(s) end-to-end (VERDICT r3 item 6 —
previously only the panel functions were render-tested, not the CLI
wiring that gathers taps/attention/masks for them)."""

import os

import pytest


def _pngs_under(root: str, prefix: str = "vis_") -> list[str]:
    out = []
    for dirpath, _, files in os.walk(root):
        if prefix in os.path.basename(dirpath):
            out += [os.path.join(dirpath, f) for f in files
                    if f.endswith(".png")]
    return out


def test_pretrain_rec_con_visualize(tmp_path):
    """rec+con phase renders the combined 9x4 vis_pr_rec_and_con panel."""
    from eventpretrain_tpu.cli import pretrain

    out = tmp_path / "run"
    pretrain.main([
        "--pr_phase", "rec+con", "--dataset", "synthetic",
        "--epochs", "1", "--batch_size", "4", "--input_size", "224",
        "--model_size", "small", "--visualize",
        "--output_dir", str(out),
    ])
    assert _pngs_under(str(out))


def test_pretrain_ecdp_visualize(tmp_path):
    """ecdp phase renders the full 3x4 vis_pr_ecdp panel (masked q/k,
    CLS-attention maps, embedding tiles)."""
    from eventpretrain_tpu.cli import pretrain

    out = tmp_path / "run"
    pretrain.main([
        "--pr_phase", "ecdp", "--dataset", "synthetic",
        "--epochs", "1", "--batch_size", "4", "--input_size", "32",
        "--model_size", "small", "--visualize",
        "--output_dir", str(out),
    ])
    assert _pngs_under(str(out))


def test_semseg_visualize(tmp_path):
    """semseg CLI renders the 5x4 vis_ft_semseg layout (attention + taps)."""
    from eventpretrain_tpu.cli import finetune_semseg

    out = tmp_path / "run"
    finetune_semseg.main([
        "--dataset", "synthetic", "--epochs", "1", "--batch_size", "2",
        "--input_size", "64", "--model_size", "small",
        "--num_classes", "5", "--visualize",
        "--output_dir", str(out),
    ])
    assert _pngs_under(str(out))


def test_flow_visualize_per_split(tmp_path):
    """flow CLI renders one 6x4 vis_ft_flow panel per val split into
    vis_val-<split> (reference per-dataset val dirs)."""
    from eventpretrain_tpu.cli import finetune_flow

    out = tmp_path / "run"
    finetune_flow.main([
        "--dataset", "synthetic", "--epochs", "1", "--batch_size", "2",
        "--input_size", "64", "--model_size", "small", "--visualize",
        "--output_dir", str(out),
    ])
    pngs = _pngs_under(str(out))
    assert pngs
    assert any("vis_val-" in p for p in pngs)
