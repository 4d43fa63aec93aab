"""Training-TRAJECTORY parity against torch.optim.AdamW + reference lr_sched.

test_torch_parity.py pins forwards and test_torch_grad_parity.py pins
gradients; this pins the optimizer semantics end to end: same init, same
batches, torch AdamW with the reference's per-iteration warmup+cosine
schedule (reference utils/lr_sched.py:3-16) and decay/no-decay param groups
(lr_decay.py:44-49) vs our ``build_optimizer`` + ``cosine_warmup_schedule``
— after several real update steps every parameter must still agree. This is
what makes the imported-checkpoint finetuning claim (north star: top-1
within 0.3%) trustworthy beyond step 0.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import flax.linen as nn

from eventpretrain_tpu.objectives.cls import cls_loss
from eventpretrain_tpu.train import TrainState, build_optimizer
from eventpretrain_tpu.train.optim import cosine_warmup_schedule

from tests._torch_ref import load_reference, nhwc
from tests.test_torch_grad_parity import (
    build_our_vit,
    build_ref_vit,
    import_strict,
)

load_reference()

LR, MIN_LR, WARMUP_EPOCHS, EPOCHS, STEPS_PER_EPOCH = 1e-3, 1e-5, 1, 3, 2
WD = 0.05


def ref_adjust_lr(optimizer, epoch_frac):
    """Reference utils/lr_sched.py:3-16 verbatim semantics."""
    if epoch_frac < WARMUP_EPOCHS:
        lr = LR * epoch_frac / WARMUP_EPOCHS
    else:
        lr = MIN_LR + (LR - MIN_LR) * 0.5 * (
            1.0 + math.cos(
                math.pi * (epoch_frac - WARMUP_EPOCHS)
                / (EPOCHS - WARMUP_EPOCHS)
            )
        )
    for group in optimizer.param_groups:
        group["lr"] = lr
    return lr


def test_adamw_trajectory_matches_torch():
    class RefClsModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = build_ref_vit("finetune_cls")
            torch.manual_seed(3)
            self.classify_head = torch.nn.Linear(64, 6)

        def forward(self, evg):
            _, _, emb_h, _ = self.backbone(evg)
            return self.classify_head(emb_h.mean(dim=1))

    ref = RefClsModel().train()
    # decay/no-decay split: weight decay only on >=2-D params
    # (reference lr_decay.py:44-49; ours train/optim.py::weight_decay_mask)
    decay = [p for p in ref.parameters() if p.ndim >= 2]
    no_decay = [p for p in ref.parameters() if p.ndim < 2]
    opt = torch.optim.AdamW(
        [{"params": decay, "weight_decay": WD},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=0.0, betas=(0.9, 0.999), eps=1e-8,
    )

    backbone = build_our_vit()

    class OurClsModel(nn.Module):
        def setup(self):
            self.backbone = backbone.clone(name="backbone")
            self.classify_head = nn.Dense(6, name="classify_head")

        def __call__(self, evg):
            _, _, emb_h, _, _ = self.backbone.encode_dense(
                evg, return_pyramid=True
            )
            return self.classify_head(emb_h.mean(axis=1))

    ours = OurClsModel()
    rng = np.random.default_rng(0)
    evg0 = rng.normal(size=(2, 5, 32, 32)).astype(np.float32)
    params = ours.init(
        jax.random.key(0), jnp.asarray(nhwc(torch.from_numpy(evg0)))
    )["params"]
    params = import_strict(
        {k: np.asarray(v.detach().numpy())
         for k, v in ref.state_dict().items()},
        params, what="params",
    )
    schedule = cosine_warmup_schedule(
        LR, MIN_LR, WARMUP_EPOCHS, EPOCHS, STEPS_PER_EPOCH
    )
    tx = build_optimizer(
        params, learning_rate=schedule, weight_decay=WD,
        betas=(0.9, 0.999),
    )
    state = TrainState.create(apply_fn=ours.apply, params=params, tx=tx)

    @jax.jit
    def step(state, evg, labels):
        def loss_fn(p):
            return cls_loss(state.apply_fn({"params": p}, evg), labels)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    n_steps = EPOCHS * STEPS_PER_EPOCH
    for i in range(n_steps):
        evg_t = torch.from_numpy(
            rng.normal(size=(2, 5, 32, 32)).astype(np.float32)
        )
        labels_np = rng.integers(0, 6, size=(2,))
        labels_t = torch.from_numpy(labels_np)

        # torch: per-iteration lr adjust at the fractional epoch, like
        # pr_trainer.py:23-24 / ft_cls_trainer.py:29-30
        ref_adjust_lr(opt, i / STEPS_PER_EPOCH)
        opt.zero_grad()
        loss_t = torch.nn.CrossEntropyLoss()(ref(evg_t), labels_t)
        loss_t.backward()
        opt.step()

        state, loss_j = step(
            state, jnp.asarray(nhwc(evg_t)),
            jnp.asarray(labels_np.astype(np.int32)),
        )
        np.testing.assert_allclose(
            float(loss_j), float(loss_t.detach()), atol=2e-5, rtol=2e-4,
            err_msg=f"loss diverged at step {i}",
        )

    # every parameter agrees after the full trajectory (warmup + cosine
    # region, decayed and non-decayed groups)
    ref_tree = import_strict(
        {k: np.asarray(v.detach().numpy())
         for k, v in ref.state_dict().items()},
        jax.tree.map(np.zeros_like, state.params), what="final params",
    )
    for path, leaf in jax.tree_util.tree_leaves_with_path(state.params):
        want = dict(jax.tree_util.tree_leaves_with_path(ref_tree))[path]
        got = np.asarray(leaf, np.float32)
        want = np.asarray(want, np.float32)
        keystr = jax.tree_util.keystr(path)
        if keystr.endswith("['qkv']['bias']"):
            # attention output is invariant to shifts of the KEY bias
            # (softmax row-shift invariance), so its true gradient is zero
            # by symmetry; AdamW normalizes that float-noise gradient into
            # an O(lr) update whose direction differs per framework. The
            # k slice therefore drifts arbitrarily (in BOTH frameworks,
            # without affecting any output) — compare q and v slices only.
            c = got.shape[0] // 3
            got = np.concatenate([got[:c], got[2 * c:]])
            want = np.concatenate([want[:c], want[2 * c:]])
        np.testing.assert_allclose(
            got, want, atol=5e-5, rtol=1e-3, err_msg=keystr
        )
