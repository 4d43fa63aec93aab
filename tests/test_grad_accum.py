"""Gradient-accumulation semantics (VERDICT r3 item 5).

The reference accumulates by dividing each microbatch loss by accum_iter,
summing grads across the window, and stepping every accum_iter microsteps
with the LR set at the window's first microstep
(trainer/pretrain/pr_trainer.py:49-56 + adjust_learning_rate at
pr_trainer.py:28-30). Ours wraps the optimizer in optax.MultiSteps
(train/optim.py build_optimizer(accum_steps=...)), which applies the inner
chain to the running MEAN of the window's grads — the same tensor as the
reference's sum of loss/accum grads — and advances the inner schedule once
per UPDATE, so the CLIs build the cosine schedule over
steps_per_epoch // accum_iter updates to match the reference's
microstep-clocked LR at window starts.

Pinned here at three levels:
  1. optimizer-level: accum 2 @ bs B == accum 1 @ bs 2B exactly (LN-only
     model; BN models break this identity in ANY framework because batch
     stats are per-microbatch — documented in PARITY.md)
  2. schedule-level: the LR our schedule yields at update u equals the
     reference's adjust_learning_rate at microstep u*accum
  3. program-level: reference main_pretrain.main(accum_iter=2) vs
     cli/pretrain.py --accum_iter 2, per-microstep loss trajectory
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_ln_model():
    import flax.linen as nn

    class TinyLN(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(16)(x)
            x = nn.LayerNorm()(x)
            x = nn.gelu(x)
            return nn.Dense(4)(x)

    return TinyLN()


def test_accum2_equals_double_batch():
    """accum 2 @ bs 4 produces bit-identical params to accum 1 @ bs 8 on an
    LN-only model: MultiSteps' running mean of the two microbatch grads is
    the grad of the concatenated batch's mean loss (reference
    pr_trainer.py:50 loss/accum + summed .backward())."""
    from eventpretrain_tpu.train import build_optimizer

    model = _tiny_ln_model()
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(8, 12)), jnp.float32)
    ys = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)

    params0 = model.init(jax.random.key(0), xs[:1])["params"]

    def loss_fn(p, x, y):
        return jnp.mean((model.apply({"params": p}, x) - y) ** 2)

    def run(accum: int, micro_bs: int, n_micro: int):
        tx = build_optimizer(
            params0, learning_rate=1e-2, weight_decay=0.05,
            clip_grad=1.0, accum_steps=accum,
        )
        opt_state = tx.init(params0)
        p = params0
        for i in range(n_micro):
            lo = (i * micro_bs) % 8
            g = jax.grad(loss_fn)(p, xs[lo:lo + micro_bs],
                                  ys[lo:lo + micro_bs])
            updates, opt_state = tx.update(g, opt_state, p)
            import optax

            p = optax.apply_updates(p, updates)
        return p

    p_accum = run(accum=2, micro_bs=4, n_micro=4)   # 2 real updates
    p_big = run(accum=1, micro_bs=8, n_micro=2)     # 2 real updates
    flat_a = jax.tree_util.tree_leaves(p_accum)
    flat_b = jax.tree_util.tree_leaves(p_big)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_accum_schedule_matches_reference_clock():
    """cosine_warmup_schedule over steps_per_epoch//accum updates yields the
    reference's adjust_learning_rate value at every accum-window start
    (utils/lr_sched.py: lr(t) at t = microstep/len(dl) + epoch, set when
    microstep % accum == 0)."""
    from eventpretrain_tpu.train import cosine_warmup_schedule

    lr, min_lr = 1e-3, 1e-6
    warmup_epochs, epochs = 2, 10
    microsteps_per_epoch, accum = 12, 3
    updates_per_epoch = microsteps_per_epoch // accum

    sched = cosine_warmup_schedule(lr, min_lr, warmup_epochs, epochs,
                                   updates_per_epoch)

    def reference_lr(t):  # utils/lr_sched.py:9-18
        if t < warmup_epochs:
            return lr * t / warmup_epochs
        return min_lr + (lr - min_lr) * 0.5 * (
            1.0 + np.cos(np.pi * (t - warmup_epochs)
                         / (epochs - warmup_epochs))
        )

    for epoch in range(epochs):
        for u in range(updates_per_epoch):
            count = epoch * updates_per_epoch + u
            micro = u * accum
            t = micro / microsteps_per_epoch + epoch
            np.testing.assert_allclose(
                float(sched(count)), reference_lr(t), rtol=5e-6, atol=1e-9,
                err_msg=f"epoch {epoch} update {u} (microstep {micro})",
            )


torch = pytest.importorskip("torch")

from tests._torch_ref import install_main_shims, nhwc  # noqa: E402
from tests.test_e2e_parity import (  # noqa: E402
    _capture_losses_from_cli,
    _sd_torch,
    build_ef_tree,
)


def test_accum_rec_trajectory_vs_reference_main(tmp_path, monkeypatch):
    """Program-level: reference main_pretrain.main (rec, accum_iter=2,
    8 images, bs2 -> 4 microsteps = 2 updates per epoch x 2 epochs) vs
    cli/pretrain.py --accum_iter 2 from the same init over the same batches
    and masks: all 8 per-microstep losses agree — pins the accumulate/step
    boundary, the loss/accum scaling, AND the window-start LR clock at
    program level."""
    install_main_shims()
    import main_pretrain
    from model.pretrain import pr_hub_model

    data_root = os.path.join(str(tmp_path), "ef")
    build_ef_tree(
        data_root, np.random.default_rng(3),
        image_names=[f"n01_00{i:02d}" for i in range(8)], hw=(64, 64),
    )

    args = main_pretrain.get_args_parser().parse_args([])
    for k, v in dict(
        pr_phase="rec", backbone_type="vit", model_size="small",
        mask_ratio=0.75, masking_strategy="random", epochs=2,
        warmup_epochs=1, blr=0.05, batch_size=2, accum_iter=2,
        num_workers=0, pin_mem=False, visualize=False,
        test_experiment=False, seed=0,
        ef_imagenet_train_root=data_root, num_classes=1,
        output_root_path=os.path.join(str(tmp_path), "ref_out"),
        save_model_freq=100, log_freq=1, print_freq=1, input_size=224,
        num_bins=5, frame_chans=1, device="cpu", drop_path_rate=0.0,
        exp_name="traj",
    ).items():
        setattr(args, k, v)

    captured = {}
    records = []
    real_factory = pr_hub_model.pretrain_hub_model_small_patch16

    def spy_factory(args, **kw):
        model = real_factory(args, **kw)
        captured["sd"] = _sd_torch(model)
        return model

    real_fwd = pr_hub_model.PrHubModel.forward

    def spy_fwd(self, evg, supp, is_rec=False):
        out = real_fwd(self, evg, supp, is_rec=is_rec)
        loss, _, _, _, _, mask, ids_restore = out
        records.append({
            "evg": nhwc(evg),
            "frame": nhwc(supp),
            "mask": np.asarray(mask.detach().numpy(), np.float32),
            "ids_restore": np.asarray(
                ids_restore.detach().numpy(), np.int32
            ),
            "loss": float(loss.detach()),
        })
        return out

    monkeypatch.setattr(
        pr_hub_model, "pretrain_hub_model_small_patch16", spy_factory
    )
    monkeypatch.setattr(pr_hub_model.PrHubModel, "forward", spy_fwd)
    main_pretrain.main(args)
    assert len(records) == 8  # 8 images, bs2 -> 4 microsteps x 2 epochs

    len_keep = int(196 * (1 - 0.75))
    feed = []
    for r in records:
        ids_shuffle = np.argsort(r["ids_restore"], axis=1)
        feed.append({
            "evg": r["evg"],
            "frame": r["frame"],
            "ids_keep": ids_shuffle[:, :len_keep].astype(np.int32),
            "mask": r["mask"],
            "ids_restore": r["ids_restore"],
        })
    feed_path = os.path.join(str(tmp_path), "feed.pkl")
    with open(feed_path, "wb") as f:
        pickle.dump(feed, f)
    init_path = os.path.join(str(tmp_path), "ref_init.pth")
    torch.save({"model": captured["sd"]}, init_path)

    from eventpretrain_tpu.cli import pretrain as cli_pretrain

    losses = _capture_losses_from_cli(monkeypatch, cli_pretrain)
    cli_pretrain.main([
        "--pr_phase", "rec", "--dataset", "synthetic",
        "--feed_batches", feed_path, "--init_from", init_path,
        "--epochs", "2", "--warmup_epochs", "1", "--blr", "0.05",
        "--batch_size", "2", "--accum_iter", "2",
        "--mask_ratio", "0.75", "--no-bf16",
        "--seed", "0", "--num_workers", "0", "--print_freq", "1",
        "--save_model_freq", "100",
        "--output_dir", os.path.join(str(tmp_path), "ours_out"),
    ])
    ours = [float(l) for l in losses]
    ref = [r["loss"] for r in records]
    assert len(ours) == len(ref) == 8
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-4)
