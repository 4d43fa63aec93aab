"""Train-step throughput for every phase the framework trains, one chip.

Beyond bench.py's stage-1 headline, measures (bs, samples/s):
  - con    : stage-2/3 contrastive (ViT-B dense encode + BN projector +
             global token-InfoNCE)
  - rec+con: joint stage (two forwards per step)
  - cls    : ViT-S classification finetune (224^2, 100 classes)
  - semseg : ViT-S + UPerHead/FCNHead, CE+Dice at 440x640 labels
  - flow   : ViT-S + dense heads, masked L1 at 224^2 GT

Each phase threads evolving train state, so the axon relay cannot cache
(see BASELINE.md). Best of 3 windows of 8 steps. Usage:

    PYTHONPATH=. python benchmarks/bench_all_steps.py [phase ...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from eventpretrain_tpu.train import TrainState, build_optimizer


def _run(name, step, state, batch, bsz, iters=8, windows=3, out=sys.stderr):
    key = jax.random.key(0)
    state, m = step(state, batch, key)
    float(jax.tree.leaves(m)[0])
    best = float("inf")
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = step(state, batch, jax.random.fold_in(key, w * iters + i))
        float(jax.tree.leaves(m)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:8s} bs{bsz:<4d}: {bsz / best:8.1f} samples/s "
          f"({best * 1e3:.1f} ms/step)", file=out)
    return {
        "phase": name, "batch_size": bsz,
        "samples_per_sec": round(bsz / best, 1),
        "ms_per_step": round(best * 1e3, 2),
    }


def bench_con(use_queue=False, freeze=False):
    from eventpretrain_tpu.models.pretrain_hub import pretrain_hub_base
    from eventpretrain_tpu.objectives import init_queue
    from eventpretrain_tpu.train.optim import frozen_except_norm_mask
    from eventpretrain_tpu.train.steps import make_con_step

    bsz = 128
    hub = pretrain_hub_base(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    evg = jnp.asarray(rng.normal(size=(bsz, 224, 224, 5)), jnp.float32)
    clip = jnp.asarray(rng.normal(size=(bsz, 197, 512)), jnp.float32)
    variables = jax.jit(
        lambda *a: hub.init(*a, train=True, method=hub.forward_con)
    )(jax.random.key(0), evg[:1], clip[:1])
    # adj phase: backbone frozen except norm_layer; the step then builds no
    # trunk backward (train/steps.py::partitioned_value_and_grad)
    mask = frozen_except_norm_mask(variables["params"]) if freeze else None
    tx = build_optimizer(
        variables["params"], learning_rate=1.5e-4, betas=(0.9, 0.95),
        num_layers=12, trainable_mask=mask,
    )
    queue = (
        init_queue(jax.random.key(1), hub.embed_dim, 196, 1024)
        if use_queue else None
    )
    state = TrainState.create(
        apply_fn=hub.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"), tx=tx, queue=queue,
    )
    step = make_con_step(hub, use_queue=use_queue, trainable_mask=mask)
    name = ("adj" if freeze else "con") + ("+q" if use_queue else "")
    return _run(name, step, state, {"evg": evg, "clip_emb": clip}, bsz)


def bench_rec_con():
    from eventpretrain_tpu.models.pretrain_hub import pretrain_hub_base
    from eventpretrain_tpu.train.steps import make_rec_and_con_step

    bsz = 128
    hub = pretrain_hub_base(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    evg = jnp.asarray(rng.normal(size=(bsz, 224, 224, 5)), jnp.float32)
    frame = jnp.asarray(rng.normal(size=(bsz, 224, 224, 1)), jnp.float32)
    clip = jnp.asarray(rng.normal(size=(bsz, 197, 512)), jnp.float32)
    variables = jax.jit(
        lambda *a: hub.init(*a, train=True, method=hub.forward_con)
    )(jax.random.key(0), evg[:1], clip[:1])
    rec_vars = jax.jit(
        lambda *a: hub.init(*a, method=hub.forward_rec)
    )(jax.random.key(0), evg[:1], jnp.arange(49)[None], jnp.arange(196)[None])
    # deep-merge con + rec param trees (decoder only exists in the rec
    # init; the backbone subtree differs per executed path), as the CLI does
    from eventpretrain_tpu.train.state import merge_params

    params = merge_params(variables["params"], rec_vars["params"])
    tx = build_optimizer(
        params, learning_rate=1.5e-4, betas=(0.9, 0.95), num_layers=12
    )
    state = TrainState.create(
        apply_fn=hub.apply, params=params,
        batch_stats=variables.get("batch_stats"), tx=tx,
    )
    step = make_rec_and_con_step(
        hub, patch_size=16, num_patches=196, mask_ratio=0.75
    )
    return _run("rec+con", step, state,
         {"evg": evg, "frame": frame, "clip_emb": clip}, bsz)


def bench_cls():
    from eventpretrain_tpu.models.cls_hub import cls_hub_vit_small
    from eventpretrain_tpu.train.steps import make_cls_train_step

    bsz = 256
    hub = cls_hub_vit_small(num_classes=100, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    evg = jnp.asarray(rng.normal(size=(bsz, 224, 224, 5)), jnp.float32)
    label = jnp.asarray(rng.integers(0, 100, size=(bsz,)), jnp.int32)
    variables = jax.jit(lambda k, x: hub.init(k, x))(
        jax.random.key(0), evg[:1]
    )
    tx = build_optimizer(
        variables["params"], learning_rate=1e-3, betas=(0.9, 0.999),
        num_layers=12, layer_decay=0.75,
    )
    state = TrainState.create(
        apply_fn=hub.apply, params=variables["params"], tx=tx
    )
    step = make_cls_train_step(hub, smoothing=0.1)
    return _run("cls", step, state, {"evg": evg, "label": label}, bsz)


def bench_linprob():
    from eventpretrain_tpu.models.cls_hub import cls_hub_vit_small
    from eventpretrain_tpu.train.steps import make_cls_train_step

    bsz = 256
    hub = cls_hub_vit_small(num_classes=100, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    evg = jnp.asarray(rng.normal(size=(bsz, 224, 224, 5)), jnp.float32)
    label = jnp.asarray(rng.integers(0, 100, size=(bsz,)), jnp.int32)
    variables = jax.jit(lambda k, x: hub.init(k, x))(
        jax.random.key(0), evg[:1]
    )
    mask = jax.tree_util.tree_map_with_path(
        lambda path, _: any(
            getattr(p, "key", "") == "classify_head" for p in path
        ),
        variables["params"],
    )
    tx = build_optimizer(
        variables["params"], learning_rate=1e-3, betas=(0.9, 0.999),
        num_layers=12, trainable_mask=mask,
    )
    state = TrainState.create(
        apply_fn=hub.apply, params=variables["params"], tx=tx
    )
    step = make_cls_train_step(hub, smoothing=0.1, trainable_mask=mask)
    return _run("linprob", step, state, {"evg": evg, "label": label}, bsz)


def bench_semseg():
    from eventpretrain_tpu.models.dense_hub import dense_hub_vit_small
    from eventpretrain_tpu.train.steps import make_semseg_train_step

    bsz = 16
    hub = dense_hub_vit_small(num_classes=11, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    evg = jnp.asarray(rng.normal(size=(bsz, 224, 224, 5)), jnp.float32)
    label = jnp.asarray(rng.integers(0, 11, size=(bsz, 440, 640)), jnp.int32)
    variables = jax.jit(lambda k, x: hub.init(k, x))(
        jax.random.key(0), evg[:1]
    )
    tx = build_optimizer(
        variables["params"], learning_rate=1e-3, betas=(0.9, 0.999),
        num_layers=12, layer_decay=0.75,
    )
    state = TrainState.create(
        apply_fn=hub.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"), tx=tx,
    )
    step = make_semseg_train_step(hub, num_classes=11, ignore_index=255)
    return _run("semseg", step, state, {"evg": evg, "label": label}, bsz)


def bench_flow():
    from eventpretrain_tpu.models.dense_hub import dense_hub_vit_small
    from eventpretrain_tpu.train.steps import make_flow_train_step

    bsz = 16
    hub = dense_hub_vit_small(num_classes=2, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    evg = jnp.asarray(rng.normal(size=(bsz, 224, 224, 5)), jnp.float32)
    flow = jnp.asarray(rng.normal(size=(bsz, 224, 224, 2)), jnp.float32)
    valid = jnp.asarray(rng.integers(0, 2, size=(bsz, 224, 224)), jnp.float32)
    variables = jax.jit(lambda k, x: hub.init(k, x))(
        jax.random.key(0), evg[:1]
    )
    tx = build_optimizer(
        variables["params"], learning_rate=1e-3, betas=(0.9, 0.999),
        num_layers=12, layer_decay=0.75,
    )
    state = TrainState.create(
        apply_fn=hub.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"), tx=tx,
    )
    step = make_flow_train_step(hub)
    return _run("flow", step, state,
         {"evg": evg, "flow": flow, "valid": valid}, bsz)


def bench_swin_rec():
    from eventpretrain_tpu.models.pretrain_hub import pretrain_hub_swin
    from eventpretrain_tpu.train.steps import make_swin_rec_step

    bsz = 64
    hub = pretrain_hub_swin(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    evg = jnp.asarray(rng.normal(size=(bsz, 224, 224, 5)), jnp.float32)
    frame = jnp.asarray(rng.normal(size=(bsz, 224, 224, 1)), jnp.float32)

    from eventpretrain_tpu.models.swin import plans_to_device
    from eventpretrain_tpu.models.swin_plan import build_swin_plans

    num_cells = 49
    len_keep = int(num_cells * 0.5)
    mask0 = jnp.zeros((1, num_cells)).at[:, len_keep:].set(1.0)
    plans0 = plans_to_device(
        build_swin_plans(
            np.asarray(mask0[0], bool), input_resolution=(56, 56),
            cell_grid=7,
        )
    )
    import functools

    variables = jax.jit(
        functools.partial(hub.init, method=hub.forward_rec)
    )(
        jax.random.key(0), evg[:1], jnp.arange(len_keep)[None],
        jnp.arange(num_cells)[None], mask=mask0, plans=plans0,
    )
    tx = build_optimizer(
        variables["params"], learning_rate=1.5e-4, betas=(0.9, 0.95),
        num_layers=12,
    )
    state = TrainState.create(
        apply_fn=hub.apply, params=variables["params"], tx=tx
    )
    step = make_swin_rec_step(hub, mask_ratio=0.5)
    return _run("swin_rec", step, state, {"evg": evg, "frame": frame}, bsz)


def bench_ecdp():
    import functools

    from eventpretrain_tpu.models.ecdp_hub import ecdp_model_base
    from eventpretrain_tpu.train.steps import make_ecdp_step

    bsz = 128
    model = ecdp_model_base(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    img_q = jnp.asarray(rng.normal(size=(bsz, 224, 224, 2)), jnp.float32)
    img_k = jnp.asarray(rng.normal(size=(bsz, 224, 224, 2)), jnp.float32)
    clip = jnp.asarray(rng.normal(size=(bsz, 512)), jnp.float32)
    len_keep = 49
    ids0 = jnp.tile(jnp.arange(len_keep)[None], (2, 1))
    variables = jax.jit(
        functools.partial(model.init, method=model.forward_query)
    )(jax.random.key(0), img_q[:2], ids0, clip[:2])
    params = variables["params"]
    tx = build_optimizer(
        params, learning_rate=1.5e-4, betas=(0.9, 0.95), num_layers=12
    )
    state = TrainState.create(
        apply_fn=model.apply, params=params,
        batch_stats=variables["batch_stats"], tx=tx,
        ema_params=jax.tree.map(jnp.copy, params["encoder"]),
    )
    step = make_ecdp_step(
        model, total_epochs=100.0, steps_per_epoch=100
    )
    return _run("ecdp", step, state,
         {"img_q": img_q, "img_k": img_k, "clip_emb": clip}, bsz)


ALL = {
    "con": bench_con,
    "swin_rec": bench_swin_rec,
    "ecdp": bench_ecdp,
    # keys == the row "phase" names so bench.py's carry-forward lookup
    # (run_suite prev_phases) matches rows from earlier artifacts
    "con+q": lambda: bench_con(True),
    "adj": lambda: bench_con(freeze=True),
    "rec+con": bench_rec_con,
    "cls": bench_cls,
    "linprob": bench_linprob,
    "semseg": bench_semseg,
    "flow": bench_flow,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    for n in names:
        try:
            ALL[n]()
        except Exception as e:
            print(f"{n}: FAILED {type(e).__name__}: {str(e)[:200]}")
