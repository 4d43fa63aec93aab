"""Program-level loss-trajectory A/B for the remaining reference entry
points (VERDICT r3 item 2): main_finetune_semseg, main_finetune_flow, and
the adj/con stages of main_pretrain.

Pattern identical to tier (c) of tests/test_e2e_parity.py: run the
reference main(args) (CPU, bs2, synthetic fixture trees in the reference's
on-disk layouts), spy the model factory for the init state dict and the
hub/trainer for per-step batches + losses, then run our CLI from the SAME
imported init over the SAME batches (--feed_batches) and assert per-step
loss agreement to ~1e-4 in f32. This composes data -> model -> loss ->
AdamW(+LRD/freeze/clip) -> LR schedule at program level — for adj/con it is
the only place queue enqueue order, projector BN batch stats, and the
frozen-except-norm backward interact exactly as in the reference
(main_pretrain.py:281-284,358-360).
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._torch_ref import install_main_shims, load_reference, nhwc
from tests.test_e2e_parity import (
    _capture_losses_from_cli,
    _sd_torch,
    build_ef_tree,
)
from tests.test_dense_dataset_parity import (
    DDD17_HW,
    MVSEC_HW,
    build_ddd17_seq,
    build_mvsec_seq,
)

load_reference()


# ---------------------------------------------------------------------------
# pretrain adj / con (frozen-except-norm + queue InfoNCE,
# main_pretrain.py:281-284,358-360)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("pr_phase,use_queue", [
    ("adj", True),    # stage 2: frozen backbone + queue InfoNCE
    ("con", True),    # stage 3: full model + queue InfoNCE
    ("con", False),   # global InfoNCE (all-gather degenerate at world 1)
])
def test_adj_con_trajectory_vs_reference_main(tmp_path, monkeypatch,
                                              pr_phase, use_queue):
    install_main_shims()
    import main_pretrain
    from model.pretrain import pr_hub_model

    data_root = os.path.join(str(tmp_path), "ef")
    build_ef_tree(
        data_root, np.random.default_rng(2),
        image_names=[f"n01_000{i}" for i in range(4)], hw=(224, 224),
    )

    args = main_pretrain.get_args_parser().parse_args([])
    for k, v in dict(
        pr_phase=pr_phase, backbone_type="vit", model_size="small",
        epochs=2, warmup_epochs=1, blr=0.05, batch_size=2, num_workers=0,
        pin_mem=False, visualize=False, test_experiment=False, seed=0,
        ef_imagenet_train_root=data_root, num_classes=1,
        output_root_path=os.path.join(str(tmp_path), "ref_out"),
        save_model_freq=100, log_freq=1, print_freq=1, input_size=224,
        num_bins=5, device="cpu", drop_path_rate=0.0, exp_name="traj",
        use_queue=use_queue, queue_length=8, T=0.07,
    ).items():
        setattr(args, k, v)

    captured = {}
    records = []
    real_factory = pr_hub_model.pretrain_hub_model_small_patch16

    def spy_factory(args, **kw):
        model = real_factory(args, **kw)
        # state dict BEFORE training: params + queue/queue_ptr buffers
        captured["sd"] = _sd_torch(model)
        return model

    real_fwd = pr_hub_model.PrHubModel.forward

    def spy_fwd(self, evg, supp, is_rec=False):
        out = real_fwd(self, evg, supp, is_rec=is_rec)
        records.append({
            "evg": nhwc(evg),
            "clip_emb": np.asarray(supp.detach().numpy(), np.float32),
            "loss": float(out[0].detach()),
        })
        return out

    monkeypatch.setattr(
        pr_hub_model, "pretrain_hub_model_small_patch16", spy_factory
    )
    monkeypatch.setattr(pr_hub_model.PrHubModel, "forward", spy_fwd)
    main_pretrain.main(args)
    assert len(records) == 4  # 4 images, bs2, 2 epochs

    feed = [{"evg": r["evg"], "clip_emb": r["clip_emb"]} for r in records]
    feed_path = os.path.join(str(tmp_path), "feed.pkl")
    with open(feed_path, "wb") as f:
        pickle.dump(feed, f)
    init_path = os.path.join(str(tmp_path), "ref_init.pth")
    torch.save({"model": captured["sd"]}, init_path)

    from eventpretrain_tpu.cli import pretrain as cli_pretrain

    losses = _capture_losses_from_cli(monkeypatch, cli_pretrain)
    cli_pretrain.main([
        "--pr_phase", pr_phase, "--dataset", "synthetic",
        "--feed_batches", feed_path, "--init_from", init_path,
        "--epochs", "2", "--warmup_epochs", "1", "--blr", "0.05",
        "--batch_size", "2", "--no-bf16", "--input_size", "224",
        "--seed", "0", "--num_workers", "0", "--print_freq", "1",
        "--save_model_freq", "100", "--temperature", "0.07",
        *( ["--use_queue", "--queue_length", "8"] if use_queue else [] ),
        "--output_dir", os.path.join(str(tmp_path), "ours_out"),
    ])
    ours = [float(l) for l in losses]
    ref = [r["loss"] for r in records]
    assert len(ours) == len(ref) == 4
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# finetune semseg (main_finetune_semseg.py:170-391, DDD17)
# ---------------------------------------------------------------------------


def _patch_dense_vit_input_size(monkeypatch):
    """The reference dense backbone factory hardcodes input_size=224
    (model/backbone/vit.py:160-164 — args.input_size is never threaded to
    the model), so main_finetune_{semseg,flow} cannot run at a small test
    resolution as-is. Re-bind the factory to pass args.input_size through;
    every other line of reference model code is untouched (PatchEmbed,
    sincos pos_embed, emb2patch_frame and the FPN/UPer decoder all derive
    their shapes from the patch grid)."""
    import functools

    import torch.nn as tnn
    import model.backbone.vit as ref_vit

    def small(args, **kw):
        return ref_vit.ViT(
            args=args, input_size=args.input_size, patch_size=16,
            embed_dim=384, depth=12, out_indices=[3, 5, 7, 11],
            num_heads=12, mlp_ratio=4,
            norm_layer=functools.partial(tnn.LayerNorm, eps=1e-6), **kw,
        )

    monkeypatch.setattr(ref_vit, "vit_small_patch16", small)
    # the reference decoder heads hardcode Dropout2d(0.1) with no flag
    # (ft_dense_decoder.py:25-34) and train with it ACTIVE — per-step loss
    # equality across frameworks is only defined with it off; our CLI takes
    # --decode_dropout 0 for the same
    import model.finetune_dense.ft_dense_decoder as ref_dec

    for fname in ("finetune_decode_head_small", "finetune_auxiliary_head_small"):
        real = getattr(ref_dec, fname)

        def nodrop(args, _real=real, **kw):
            kw.setdefault("dropout_ratio", 0)
            return _real(args, **kw)

        monkeypatch.setattr(ref_dec, fname, nodrop)


def _spy_dense_batches(monkeypatch, task: str):
    """Capture train batches + per-step loss_total from the reference's
    MetricLogger ('lr' meter marks the train logger, ft_*_trainer.py).

    Returns a ``run`` dict with mutable "batches"/"losses" lists; swap in
    fresh lists (run["batches"] = []) between reference runs — the patches
    are installed once and always append to the current lists."""
    import utils.misc as ref_misc

    run = {"batches": [], "losses": []}
    real_log_every = ref_misc.MetricLogger.log_every

    def spy_log_every(self, args, iterable, print_freq, header=None):
        is_train = "lr" in self.meters
        for tup in real_log_every(self, args, iterable, print_freq, header):
            if is_train:
                if task == "semseg":
                    evg, label, _ = tup
                    run["batches"].append({
                        "evg": nhwc(evg),
                        "label": np.asarray(label.numpy(), np.int32)[:, 0],
                    })
                else:  # flow
                    evg, _evg_org, flow, valid, _ = tup
                    run["batches"].append({
                        "evg": nhwc(evg),
                        "flow": nhwc(flow),
                        "valid": np.asarray(valid.numpy(), np.float32)[:, 0],
                    })
            yield tup

    real_update = ref_misc.MetricLogger.update

    def spy_update(self, **kwargs):
        if "lr" in self.meters and "loss_total" in kwargs:
            run["losses"].append(float(kwargs["loss_total"]))
        return real_update(self, **kwargs)

    monkeypatch.setattr(ref_misc.MetricLogger, "log_every", spy_log_every)
    monkeypatch.setattr(ref_misc.MetricLogger, "update", spy_update)
    return run


def _perturb_state_dict(sd: dict, eps: float = 1e-5, seed: int = 0) -> dict:
    """Multiplicatively perturb every float tensor by (1 + eps*N(0,1)).

    eps is CALIBRATED to the observed cross-framework noise floor, not
    guessed: in the semseg test warmup makes the step-0 lr exactly 0, so
    both frameworks hold identical params through step 1 and the measured
    step-1 loss deviation (2.6e-6) is pure forward-computation noise
    (XLA vs oneDNN op orders). An init perturbation of eps=1e-5 produces
    the same loss-level spread (~2.4e-6) in the reference's own re-run;
    1e-6 under-injects 10x and its envelope falsely flags chaos as drift.
    Override with EVENTPRETRAIN_CHAOS_EPS to re-probe."""
    eps = float(os.environ.get("EVENTPRETRAIN_CHAOS_EPS", eps))
    g = torch.Generator().manual_seed(seed)
    out = {}
    for k, v in sd.items():
        if v.is_floating_point():
            noise = torch.randn(v.shape, generator=g, dtype=torch.float32)
            out[k] = v * (1 + eps * noise.to(v.dtype))
        else:
            out[k] = v
    return out


def _chaos_envelope_assert(ours, ref, ref_perturbed, *, margin=10.0,
                           atol=1e-4):
    """Assert our per-step losses track the reference's within the
    reference's OWN sensitivity to init noise.

    Why not assert_allclose at 1e-4: the dense stacks (BN + Dice/masked-L1
    + multi-scale resizes) are stiff, and Adam's early updates are sign-like
    (update = +-lr regardless of |g|), so gradient components near zero flip
    sign under f32 noise — the RELATIVE trajectory spread is LR-invariant
    (measured: lowering blr 10x left the step-5 deviation within 5x). The
    honest bound is the reference's self-spread: re-run the reference from
    an init perturbed by 1e-6 relative (the cross-framework f32 noise
    scale) and require our deviation at each step to stay within
    margin * the running max of that self-spread. Systematic drifts (wrong
    clip/wd/schedule/loss weights) produce step-1 deviations orders above
    the envelope — the r3 harness caught the reference's dead --clip_grad
    flag (ft_semseg_trainer.py:129) exactly that way."""
    ours = np.asarray(ours, np.float64)
    ref = np.asarray(ref, np.float64)
    spread = np.abs(np.asarray(ref_perturbed, np.float64) - ref)
    envelope = np.maximum(margin * np.maximum.accumulate(spread), atol)
    dev = np.abs(ours - ref)
    print(f"[chaos-envelope] dev={dev.round(6).tolist()} "
          f"envelope={envelope.round(6).tolist()}")
    assert np.all(dev <= envelope), (
        f"deviation {dev.tolist()} exceeds reference self-noise envelope "
        f"{envelope.tolist()} (ref spread {spread.tolist()})"
    )
    # step 0 is pure forward+data parity - pinned tight unconditionally
    assert dev[0] <= atol, f"step-0 forward mismatch: {dev[0]}"


def test_semseg_trajectory_vs_reference_main(tmp_path, monkeypatch):
    """main_finetune_semseg.main(args) on a DDD17 fixture (5 train seqs +
    dir1 val, memmap layout) vs cli/finetune_semseg.py: per-step
    w_dec*(CE+Dice) + w_aux*(CE+Dice) losses from the same init over the
    same batches.

    blr: with warmup the step-0 lr is 0, so the step-1 loss diff is pure
    cross-framework f32 forward noise (~8e-7 relative, measured) — an
    irreducible seed that the trajectory then amplifies ~3-8x per step at
    blr 0.05 (dense heads: BN + Dice + multi-scale resizes are far stiffer
    than the cls head), blowing past any tolerance by step 4 with NO
    semantic drift. 0.005 keeps the 10-step amplification under tolerance
    while still making semantic drifts visible: a wrong clip/wd/schedule/
    loss-weight shifts the update by O(1) relative, i.e. ~1e-3 on these
    losses at this lr — 5x the assert threshold. (The r3 harness caught the
    reference's dead --clip_grad flag in ft_semseg_trainer.py:129 exactly
    this way.)"""
    install_main_shims()
    _patch_dense_vit_input_size(monkeypatch)
    import main_finetune_semseg
    from model.finetune_dense import ft_dense_hub_model

    root = os.path.join(str(tmp_path), "ddd17")
    os.makedirs(root)
    rng = np.random.default_rng(7)
    for seq in ("dir0", "dir3", "dir4", "dir6", "dir7", "dir1"):
        build_ddd17_seq(root, seq, rng, n_labels=2)

    args = main_finetune_semseg.get_args_parser().parse_args([])
    for k, v in dict(
        dataset_type="ddd17", backbone_type="vit", model_size="small",
        num_classes=6, num_bins=5, input_size=48, fix_events_num=3000,
        val_fix_events_num=3000, val_event_noise=False, crop_min=0.8,
        batch_size=2, epochs=2, warmup_epochs=1, blr=0.005,
        drop_path_rate=0.0, drop_rate=0.0, attn_drop_rate=0.0,
        num_workers=0, pin_mem=False, visualize=False,
        test_experiment=False, seed=0, device="cpu",
        ddd17_train_root=root, ddd17_val_root=root,
        ddd17_sensor_h=DDD17_HW[0], ddd17_sensor_w=DDD17_HW[1],
        output_root_path=os.path.join(str(tmp_path), "ref_out"),
        save_model_freq=100, log_freq=1, print_freq=1, exp_name="traj",
        use_checkpoint=False, use_evrepsl=False, ignore_label=255,
        decode_loss_weight=1.0, aux_loss_weight=0.4,
        sample_mode="bilinear",
    ).items():
        setattr(args, k, v)

    captured = {}
    real_factory = ft_dense_hub_model.finetune_dense_hub_model_small_patch16

    def spy_factory(args, **kw):
        model = real_factory(args, **kw)
        if "sd" not in captured:
            captured["sd"] = _sd_torch(model)
        else:  # run 2: same init, perturbed at the f32-noise scale
            model.load_state_dict(_perturb_state_dict(captured["sd"]))
        return model

    monkeypatch.setattr(
        ft_dense_hub_model, "finetune_dense_hub_model_small_patch16",
        spy_factory,
    )
    run = _spy_dense_batches(monkeypatch, "semseg")
    main_finetune_semseg.main(args)
    batches, losses_ref = run["batches"], run["losses"]
    # 5 seqs x 2 labels = 10 train items, bs2 drop_last -> 5 steps x 2 epochs
    assert len(batches) == len(losses_ref) == 10

    # reference self-spread run: perturbed init, same seed -> same batches
    run["batches"], run["losses"] = [], []
    args.output_root_path = os.path.join(str(tmp_path), "ref_out2")
    main_finetune_semseg.main(args)
    losses_ref2 = run["losses"]
    assert len(losses_ref2) == 10

    feed_path = os.path.join(str(tmp_path), "feed.pkl")
    with open(feed_path, "wb") as f:
        pickle.dump(batches, f)
    init_path = os.path.join(str(tmp_path), "ref_init.pth")
    torch.save({"model": captured["sd"]}, init_path)

    from eventpretrain_tpu.cli import finetune_semseg as cli_semseg

    losses = _capture_losses_from_cli(monkeypatch, cli_semseg)
    cli_semseg.main([
        "--dataset", "synthetic", "--backbone", "vit",
        "--model_size", "small", "--num_classes", "6", "--num_bins", "5",
        "--input_size", "48", "--ignore_label", "255",
        "--decode_dropout", "0",
        "--feed_batches", feed_path, "--finetune", init_path,
        "--epochs", "2", "--warmup_epochs", "1", "--blr", "0.005",
        "--batch_size", "2", "--no-bf16", "--drop_path_rate", "0",
        "--seed", "0", "--print_freq", "1",
        "--output_dir", os.path.join(str(tmp_path), "ours_out"),
    ])
    ours = [float(l) for l in losses]
    assert len(ours) == 10
    _chaos_envelope_assert(ours, losses_ref, losses_ref2)


# ---------------------------------------------------------------------------
# finetune flow (main_finetune_flow.py:151-391, MVSEC, 3 val splits)
# ---------------------------------------------------------------------------


def test_flow_trajectory_vs_reference_main(tmp_path, monkeypatch):
    """main_finetune_flow.main(args) on an MVSEC fixture (5 sequences,
    Valid_Time_Index patched to small ranges; the indoor_flying1 1% split
    stays active) vs cli/finetune_flow.py: per-step masked-L1 losses."""
    install_main_shims()
    _patch_dense_vit_input_size(monkeypatch)
    import main_finetune_flow
    from dataset.finetune_flow import ft_mvsec_dataset
    from model.finetune_dense import ft_dense_hub_model

    root = os.path.join(str(tmp_path), "mvsec")
    os.makedirs(root)
    rng = np.random.default_rng(13)
    small_index = {
        "outdoor_day1": [20, 27],
        "outdoor_day2": [20, 27],
        "indoor_flying1": [20, 121],  # 1% split -> 1 train / 99 val items
        "indoor_flying2": [20, 25],
        "indoor_flying3": [20, 25],
    }
    monkeypatch.setattr(ft_mvsec_dataset, "Valid_Time_Index", small_index)
    for seq, (lo, hi) in small_index.items():
        build_mvsec_seq(root, seq, rng, lo=lo, hi=hi, events_per_gap=2000)

    args = main_finetune_flow.get_args_parser().parse_args([])
    for k, v in dict(
        dataset_type="mvsec", backbone_type="vit", model_size="small",
        num_bins=5, input_size=48, fix_events_num=3000,
        val_fix_events_num=3000, val_event_noise=False, crop_min=0.8,
        batch_size=2, epochs=1, warmup_epochs=0, blr=0.005,
        drop_path_rate=0.0, drop_rate=0.0, attn_drop_rate=0.0,
        num_workers=0, pin_mem=False, visualize=False,
        test_experiment=False, seed=0, device="cpu",
        mvsec_root=root, skip_num=1, max_flow=400,
        mvsec_sensor_h=MVSEC_HW[0], mvsec_sensor_w=MVSEC_HW[1],
        output_root_path=os.path.join(str(tmp_path), "ref_out"),
        save_model_freq=100, log_freq=1, print_freq=1, exp_name="traj",
        use_checkpoint=False, use_evrepsl=False,
        decode_loss_weight=1.0, aux_loss_weight=0.4,
        sample_mode="bilinear",
    ).items():
        setattr(args, k, v)

    captured = {}
    real_factory = ft_dense_hub_model.finetune_dense_hub_model_small_patch16

    def spy_factory(args, **kw):
        model = real_factory(args, **kw)
        if "sd" not in captured:
            captured["sd"] = _sd_torch(model)
        else:  # run 2: same init, perturbed at the f32-noise scale
            model.load_state_dict(_perturb_state_dict(captured["sd"]))
        return model

    monkeypatch.setattr(
        ft_dense_hub_model, "finetune_dense_hub_model_small_patch16",
        spy_factory,
    )
    run = _spy_dense_batches(monkeypatch, "flow")
    main_finetune_flow.main(args)
    batches, losses_ref = run["batches"], run["losses"]
    # train items: outdoor_day1 6 + outdoor_day2 6 + flying1-split 1 = 13
    # -> bs2 drop_last = 6 steps x 1 epoch
    assert len(batches) == len(losses_ref) == 6

    # reference self-spread run: perturbed init, same seed -> same batches
    run["batches"], run["losses"] = [], []
    args.output_root_path = os.path.join(str(tmp_path), "ref_out2")
    main_finetune_flow.main(args)
    losses_ref2 = run["losses"]
    assert len(losses_ref2) == 6

    feed_path = os.path.join(str(tmp_path), "feed.pkl")
    with open(feed_path, "wb") as f:
        pickle.dump(batches, f)
    init_path = os.path.join(str(tmp_path), "ref_init.pth")
    torch.save({"model": captured["sd"]}, init_path)

    from eventpretrain_tpu.cli import finetune_flow as cli_flow

    losses = _capture_losses_from_cli(monkeypatch, cli_flow)
    cli_flow.main([
        "--dataset", "synthetic", "--backbone", "vit",
        "--model_size", "small", "--num_bins", "5", "--input_size", "48",
        "--decode_dropout", "0",
        "--feed_batches", feed_path, "--finetune", init_path,
        "--epochs", "1", "--warmup_epochs", "0", "--blr", "0.005",
        "--batch_size", "2", "--no-bf16", "--drop_path_rate", "0",
        "--max_flow", "400", "--seed", "0", "--print_freq", "1",
        "--output_dir", os.path.join(str(tmp_path), "ours_out"),
    ])
    ours = [float(l) for l in losses]
    assert len(ours) == 6
    _chaos_envelope_assert(ours, losses_ref, losses_ref2)
