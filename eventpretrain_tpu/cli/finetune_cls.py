"""Classification finetune entry point.

Typed-config replacement for reference main_finetune_cls.py / _ddp.py (the
DDP split disappears: one process drives the whole mesh). Run:

  python -m eventpretrain_tpu.cli.finetune_cls --dataset synthetic \\
      --backbone vit --model_size small --epochs 2

Real datasets expect the reference's on-disk layouts (e.g. N-Cars:
root/<class>/*.npy, reference ft_n_cars_dataset.py:15-52).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from eventpretrain_tpu.data.cls_pipeline import (
    ClsDataConfig,
    ClsPipeline,
    NCarsSource,
    SyntheticClsSource,
)
from eventpretrain_tpu.models.cls_hub import (
    cls_hub_vit_small,
    cls_hub_vit_base,
    cls_hub_convvit_small,
    cls_hub_convvit_base,
    cls_hub_swin_tiny,
    cls_hub_vit_ecdp_small,
    cls_hub_vit_ecdp_base,
    cls_hub_convvit_ecdp_small,
    cls_hub_convvit_ecdp_base,
    cls_hub_vit_mem_small,
    cls_hub_vit_mem_base,
    cls_hub_swin_ecddp_tiny,
)
from eventpretrain_tpu.train import (
    build_optimizer,
    cosine_warmup_schedule,
    TrainState,
)
from eventpretrain_tpu.train.steps import (
    forward_only,
    make_cls_train_step,
    make_cls_eval_step,
)
from eventpretrain_tpu.train.loop import train_one_epoch, evaluate
from eventpretrain_tpu.utils import profiling
from eventpretrain_tpu.ckpt import (
    save_checkpoint,
    restore_checkpoint,
    wait_for_saves,
)
from eventpretrain_tpu.ckpt.torch_import import init_backbone_from
from eventpretrain_tpu.utils.logging import append_log_line, ScalarWriter


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("finetune_cls")
    p.add_argument("--dataset", default="synthetic",
                   choices=["synthetic", "n_cars", "n_caltech101",
                            "cifar10_dvs", "dvs128_gesture", "n_imagenet",
                            "es_imagenet", "ucf101_dvs"])
    p.add_argument("--es_train_label", default=None)
    p.add_argument("--es_val_label", default=None)
    p.add_argument("--val_variant_roots", nargs="*", default=[],
                   help="extra N-ImageNet robustness val roots, evaluated "
                        "separately each epoch (reference "
                        "main_finetune_cls.py:225-233)")
    p.add_argument("--train_root", default=None)
    p.add_argument("--val_root", default=None)
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--backbone", default="vit",
                   choices=["vit", "convvit", "swin", "vit_ecdp",
                            "convvit_ecdp", "vit_mem", "swin_ecddp"])
    p.add_argument("--model_size", default="small", choices=["small", "base"])
    p.add_argument("--num_bins", type=int, default=5)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--fix_events_num", type=int, default=30000)
    p.add_argument("--val_fix_events_num", type=int, default=30000)
    p.add_argument("--canvas", type=int, nargs=2, default=(128, 128),
                   metavar=("H", "W"))
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--warmup_epochs", type=float, default=5)
    p.add_argument("--blr", type=float, default=2.5e-4)
    p.add_argument("--min_lr", type=float, default=1e-6)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--layer_decay", type=float, default=0.75)
    p.add_argument("--use_layer_decay", action="store_true")
    p.add_argument("--clip_grad", type=float, default=5.0)
    p.add_argument("--smoothing", type=float, default=0.1)
    p.add_argument("--accum_iter", type=int, default=1)
    p.add_argument("--drop_path_rate", type=float, default=0.1)
    p.add_argument("--drop_rate", type=float, default=0.0)
    p.add_argument("--attn_drop_rate", type=float, default=0.0)
    p.add_argument("--resize_mode", default="bilinear",
                   choices=["nearest", "bilinear", "bicubic"],
                   help="event-grid resize interpolation (reference "
                        "main_finetune_cls.py:48)")
    p.add_argument("--lr", type=float, default=None,
                   help="absolute lr; overrides the --blr * eff_bs/256 "
                        "scaling")
    p.add_argument("--use_checkpoint", action="store_true",
                   help="jax.checkpoint (remat) each transformer block: "
                        "recompute activations in the backward to save HBM "
                        "(reference --use_checkpoint / torch "
                        "utils.checkpoint)")
    p.add_argument("--linprob", action="store_true",
                   help="freeze all but the classify head")
    p.add_argument("--finetune", default=None,
                   help="checkpoint to initialize the backbone from "
                        "(.pth torch checkpoints are converted on load)")
    p.add_argument("--feed_batches", default=None,
                   help="replay a pickled list of train batch dicts instead "
                        "of the dataset pipeline and skip validation "
                        "(deterministic debugging; the trajectory A/B in "
                        "tests/test_e2e_parity.py feeds this CLI and the "
                        "reference main identical batches)")
    p.add_argument("--lenient_import", action="store_true",
                   help="allow torch --finetune files that do not cover "
                        "every backbone param (reference strict=False)")
    p.add_argument("--export_torch", default=None,
                   help="after training, write the final params as a "
                        "reference-dialect torch .pth (ckpt/torch_export.py) "
                        "loadable by the reference's --finetune/eval scripts")
    p.add_argument("--export_serving", default=None,
                   help="after training, freeze the logits fn into a "
                        "serving artifact at this path "
                        "(utils/export_infer.py; the reference has no "
                        "serving story)")
    p.add_argument("--serving_native", action="store_true",
                   help="TPU-native serving bundle (fused Pallas kernels "
                        "kept, concrete batch buckets) instead of the "
                        "portable symbolic-batch StableHLO artifact")
    p.add_argument("--serving_batch_sizes", default="1,8,64",
                   help="comma-separated batch buckets for --serving_native")
    p.add_argument("--resume", default=None)
    p.add_argument("--auto_resume", action="store_true",
                   help="resume from the latest checkpoint in output_dir if "
                        "present (preemption-safe restarts)")
    p.add_argument("--output_dir", default="./results/finetune_cls")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--print_freq", type=int, default=20)
    p.add_argument("--num_workers", type=int, default=8,
                   help="IO threads per pipeline (reference DataLoader "
                        "num_workers; 0 = load on the pipeline thread)")
    p.add_argument("--val_event_noise", action="store_true")
    p.add_argument("--use_evrepsl", action="store_true",
                   help="EvRep input + frozen EvRepSL preprocessor "
                        "(reference main_finetune_cls.py:412-419)")
    p.add_argument("--evrepsl_checkpoint", default=None,
                   help="RepGen weights (torch .pth); random init if absent")
    p.add_argument("--tensorboard", action="store_true",
                   help="write scalars to <output_dir>/tb")
    p.add_argument("--visualize", action="store_true",
                   help="save diagnostic panels to <output_dir>/vis_val")
    p.add_argument("--forward_only", action="store_true",
                   help="dry run: compute losses without optimizer updates "
                        "(reference --backward=False, pr_trainer.py:51)")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of the first epoch "
                        "into this directory")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard batches over all local devices "
                        "(Mesh(('data',)); replaces the reference's DDP, "
                        "main_finetune_cls_ddp.py:187-196)")
    return p


# reference events_reshape placement per dataset (see ClsDataConfig
# .rescale_to_input): N-ImageNet rescales coords for every representation
# (ft_n_imagenet_dataset.py:92-93); CIFAR10-DVS/DVS128/UCF101 only for the
# ECDP image (ft_cifar10_dvs_dataset.py:69-72 and siblings)
_RESCALE_MODE = {
    "n_imagenet": "always",
    "cifar10_dvs": "ecdp",
    "dvs128_gesture": "ecdp",
    "ucf101_dvs": "ecdp",
}


def make_sources(args):
    """Returns (train, val, extra_vals: dict, sensor_hw or None, rescale)."""
    from eventpretrain_tpu.data import cls_sources as cs

    rescale = _RESCALE_MODE.get(args.dataset, "never")
    if args.dataset == "synthetic":
        train = SyntheticClsSource(args.num_classes, 64, seed=args.seed)
        val = SyntheticClsSource(args.num_classes, 16, seed=args.seed + 1000)
        return train, val, {}, None, rescale
    assert args.train_root and args.val_root, (
        f"--train_root/--val_root required for {args.dataset}"
    )
    if args.dataset == "n_cars":
        # sensor size inferred from event maxima per sample
        return (NCarsSource(args.train_root), NCarsSource(args.val_root),
                {}, None, rescale)
    factories = {
        "n_caltech101": lambda root: cs.NCaltech101Source(root),
        "cifar10_dvs": lambda root: cs.Cifar10DvsSource(root),
        "dvs128_gesture": lambda root: cs.Dvs128GestureSource(root),
        "ucf101_dvs": lambda root: cs.Ucf101DvsSource(root),
        "n_imagenet": lambda root: cs.NImageNetSource(
            root, args.num_classes),
        "es_imagenet": None,
    }
    if args.dataset == "es_imagenet":
        assert args.es_train_label and args.es_val_label
        train = cs.EsImageNetSource(args.train_root, args.es_train_label,
                                    args.num_classes)
        val = cs.EsImageNetSource(args.val_root, args.es_val_label,
                                  args.num_classes)
    else:
        make = factories[args.dataset]
        train, val = make(args.train_root), make(args.val_root)
    extra = {}
    if args.dataset == "n_imagenet":
        for root in args.val_variant_roots:
            extra[os.path.basename(root.rstrip("/"))] = factories[
                "n_imagenet"](root)
    return train, val, extra, train.sensor_hw, rescale


def main(args=None):
    args = build_parser().parse_args(args)
    if args.data_parallel:
        # must run before anything initializes the XLA backend
        from eventpretrain_tpu.parallel import maybe_initialize_distributed

        maybe_initialize_distributed()
    np.random.seed(args.seed)

    train_src, val_src, extra_vals, sensor_hw, rescale = make_sources(args)
    if args.data_parallel and jax.process_count() > 1:
        from eventpretrain_tpu.parallel import (
            HostShardedSource,
            local_batch_size,
        )

        train_src = HostShardedSource(train_src)
        val_src = HostShardedSource(val_src)
        extra_vals = {k: HostShardedSource(v)
                      for k, v in extra_vals.items()}
        local_bs = local_batch_size(args.batch_size)
    else:
        local_bs = args.batch_size
    rescale_active = rescale == "always" or (
        rescale == "ecdp" and args.num_bins == 2
    )
    if sensor_hw is not None:
        # with an active coordinate rescale the raster happens at the input
        # resolution (reference rasters at input_size after events_reshape);
        # otherwise at the dataset's fixed sensor size
        canvas = ((args.input_size, args.input_size) if rescale_active
                  else sensor_hw)
        infer = False
    else:
        canvas = tuple(args.canvas)
        infer = True
    cfg = ClsDataConfig(
        num_classes=args.num_classes,
        num_bins=args.num_bins,
        input_size=args.input_size,
        fix_events_num=args.fix_events_num,
        val_fix_events_num=args.val_fix_events_num,
        canvas_height=canvas[0],
        canvas_width=canvas[1],
        infer_sensor_size=infer,
        event_noise=args.val_event_noise,
        use_evrep=args.use_evrepsl,
        resize_mode=args.resize_mode,
        sensor_height=None if sensor_hw is None else sensor_hw[0],
        sensor_width=None if sensor_hw is None else sensor_hw[1],
        rescale_to_input=rescale,
    )

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    factory = {
        ("vit", "small"): cls_hub_vit_small,
        ("vit", "base"): cls_hub_vit_base,
        ("convvit", "small"): cls_hub_convvit_small,
        ("convvit", "base"): cls_hub_convvit_base,
        ("swin", "small"): cls_hub_swin_tiny,
        ("swin", "base"): cls_hub_swin_tiny,
        ("vit_ecdp", "small"): cls_hub_vit_ecdp_small,
        ("vit_ecdp", "base"): cls_hub_vit_ecdp_base,
        ("convvit_ecdp", "small"): cls_hub_convvit_ecdp_small,
        ("convvit_ecdp", "base"): cls_hub_convvit_ecdp_base,
        ("vit_mem", "small"): cls_hub_vit_mem_small,
        ("vit_mem", "base"): cls_hub_vit_mem_base,
        ("swin_ecddp", "small"): cls_hub_swin_ecddp_tiny,
        ("swin_ecddp", "base"): cls_hub_swin_ecddp_tiny,
    }[(args.backbone, args.model_size)]
    in_chans = {2: 2, 3: 3}.get(args.num_bins, args.num_bins)
    preprocess_fn = None
    if args.use_evrepsl:
        from eventpretrain_tpu.models.evrepsl import evrepsl_net

        rep = evrepsl_net(dtype=dtype)
        rep_vars = jax.jit(rep.init)(
            jax.random.key(7),
            jnp.zeros((1, args.input_size, args.input_size, 3)),
        )
        if args.evrepsl_checkpoint:
            from eventpretrain_tpu.ckpt.torch_import import (
                load_torch_backbone_if_needed,
            )

            rep_vars = {"params": load_torch_backbone_if_needed(
                args.evrepsl_checkpoint, rep_vars["params"])}
        else:
            print("[warn] --use_evrepsl without --evrepsl_checkpoint: "
                  "random RepGen weights")
        preprocess_fn = lambda evg: rep.apply(rep_vars, evg)
        in_chans = 5  # concat(EvRep, clean_ie, C)
    hub = factory(
        num_classes=args.num_classes,
        num_bins=in_chans,
        dtype=dtype,
        input_size=args.input_size,
        drop_path_rate=args.drop_path_rate,
        drop_rate=args.drop_rate,
        attn_drop_rate=args.attn_drop_rate,
        use_remat=args.use_checkpoint,
    )
    variables = jax.jit(hub.init)(
        jax.random.key(args.seed),
        jnp.zeros((1, args.input_size, args.input_size, in_chans)),
    )
    params = variables["params"]
    from eventpretrain_tpu.utils.logging import count_params

    print(f"model params: {count_params(params):.2f}M")
    if args.finetune:
        params = init_backbone_from(
            args.finetune, params,
            strict_backbone=not args.lenient_import,
        )

    feed = None
    if args.feed_batches:
        import pickle

        with open(args.feed_batches, "rb") as f:
            feed = pickle.load(f)

    steps_per_epoch = (
        max(len(feed) // args.epochs, 1) if feed is not None
        else max(len(train_src) // local_bs, 1)
    )
    eff_batch = args.batch_size * args.accum_iter
    lr = args.lr if args.lr is not None else args.blr * eff_batch / 256
    # optax.MultiSteps advances the schedule once per UPDATE; the reference
    # clocks LR at accum-window starts (ft_cls_trainer.py adjust when
    # i % accum == 0) — updates-per-epoch makes the conventions coincide
    # (pinned by tests/test_grad_accum.py)
    schedule = cosine_warmup_schedule(
        lr, args.min_lr, args.warmup_epochs, args.epochs,
        max(steps_per_epoch // args.accum_iter, 1),
    )
    trainable_mask = None
    if args.linprob:
        trainable_mask = jax.tree_util.tree_map_with_path(
            lambda path, _: any(
                getattr(p, "key", "") == "classify_head" for p in path
            ),
            params,
        )
    tx = build_optimizer(
        params,
        learning_rate=schedule,
        weight_decay=args.weight_decay,
        betas=(0.9, 0.999),
        layer_decay=args.layer_decay if args.use_layer_decay else 1.0,
        num_layers=13 if args.backbone.startswith("convvit") else 12,
        backbone_type=args.backbone,
        clip_grad=args.clip_grad,
        trainable_mask=trainable_mask,
        accum_steps=args.accum_iter,
    )
    state = TrainState.create(apply_fn=hub.apply, params=params, tx=tx)
    if args.auto_resume and not args.resume:
        import os as _os

        from eventpretrain_tpu.ckpt import latest_step

        if _os.path.isdir(_os.path.join(args.output_dir, "checkpoints")) \
                and latest_step(args.output_dir) is not None:
            args.resume = args.output_dir
    if args.resume:
        state = restore_checkpoint(args.resume, state)
        print(f"resumed from {args.resume} at step {int(state.step)}")

    train_step = make_cls_train_step(
        hub, smoothing=args.smoothing, preprocess_fn=preprocess_fn,
        # --linprob: head-only backward; the backbone runs forward-only
        trainable_mask=trainable_mask,
    )
    eval_step = make_cls_eval_step(hub, preprocess_fn=preprocess_fn)

    mesh = None
    if args.data_parallel:
        from eventpretrain_tpu.parallel import make_mesh, replicate

        mesh = make_mesh()
        ndev = mesh.shape["data"]
        assert args.batch_size % ndev == 0, (
            f"--batch_size must be a multiple of the {ndev}-device mesh")
        state = replicate(mesh, state)
        print(f"data-parallel over {ndev} devices")

    writer = ScalarWriter(
        f"{args.output_dir}/tb" if args.tensorboard else None
    )
    best_acc = 0.0
    key = jax.random.key(args.seed)
    start_epoch = int(state.step) // steps_per_epoch
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        if feed is not None:
            pipe = [
                {k: jnp.asarray(v) for k, v in b.items()}
                for b in feed[epoch * steps_per_epoch:
                              (epoch + 1) * steps_per_epoch]
            ]
        else:
            pipe = ClsPipeline(
                train_src, cfg, local_bs, train=True,
                seed=args.seed + epoch, num_workers=args.num_workers,
            )
        if mesh is not None:
            from eventpretrain_tpu.parallel import ShardedPipeline

            pipe = ShardedPipeline(pipe, mesh)
        run_step = (forward_only(train_step) if args.forward_only
                    else train_step)
        with profiling.trace(args.profile_dir,
                             enabled=bool(args.profile_dir)
                             and epoch == start_epoch):
            state, train_metrics = train_one_epoch(
                step=run_step, state=state, pipeline=pipe,
                rng_key=jax.random.fold_in(key, epoch), epoch=epoch,
                print_freq=args.print_freq,
            )
        if feed is not None:
            # batch replay has no val dataset: record train metrics only
            append_log_line(args.output_dir, {
                "epoch": epoch,
                **{f"train_{k}": v for k, v in train_metrics.items()},
            })
            continue
        val_pipe = ClsPipeline(
            val_src, cfg, local_bs, train=False, seed=args.seed,
            num_workers=args.num_workers,
        )
        if mesh is not None:
            from eventpretrain_tpu.parallel import ShardedPipeline

            val_pipe = ShardedPipeline(val_pipe, mesh)
        tv = time.time()
        val_metrics = evaluate(eval_step, state, val_pipe)
        # mean inference time per batch (reference ft_cls_trainer.py:190)
        val_metrics["infer_ms"] = round(
            1000 * (time.time() - tv) / max(len(val_pipe), 1), 2
        )
        for name, src in extra_vals.items():
            vm = evaluate(
                eval_step, state,
                ClsPipeline(src, cfg, local_bs, train=False,
                            seed=args.seed),
                header=f"Val[{name}]:",
            )
            print(f"  variant {name}: acc1 {vm.get('acc1', 0):.2f}")
        record = {
            "epoch": epoch,
            **{f"train_{k}": v for k, v in train_metrics.items()},
            **{f"val_{k}": v for k, v in val_metrics.items()},
            "epoch_time_s": round(time.time() - t0, 2),
        }
        append_log_line(args.output_dir, record)
        writer.write(train_metrics, epoch, "train/")
        writer.write(val_metrics, epoch, "val/")
        if args.visualize:
            import numpy as _np

            from eventpretrain_tpu.viz import save_cls_panel, save_feature_panel

            vb = next(iter(ClsPipeline(val_src, cfg, local_bs,
                                       train=False, seed=args.seed)))
            evg = vb["evg"]
            if preprocess_fn is not None:
                evg = preprocess_fn(evg)
            # only sample 0 is plotted; don't run the full batch
            _, logits, _ = hub.apply({"params": state.params}, evg[:1])
            save_cls_panel(
                f"{args.output_dir}/vis_val", f"epoch_{epoch:03d}.png",
                _np.asarray(vb["evg"][0], _np.float32),
                int(vb["label"][0]), int(logits[0].argmax()),
            )
            # per-backbone feature/attention panel (reference vis_ft_cls /
            # _ecdp / _mem / _swin, ft_cls_visualize.py:14-262): 5-tuple
            # backbones (vit/convvit/swin/swin_ecddp — swin builds its dense
            # plans internally) expose the l1/l2/h taps; the 3-tuple
            # ECDP/MEM backbones return a pooled embedding, so their panel
            # is attention-only (taps={}), matching the reference variants.
            # Only sample 0 is plotted, so run the diagnostic forward on one
            # sample — materializing attention for the whole val batch
            # costs (B, heads, L, L) HBM for nothing
            variables = {"params": state.params["backbone"]}
            out = hub.backbone.apply(
                variables, evg[:1], deterministic=True, return_attn=True,
                method=hub.backbone.encode_dense,
            )
            if len(out) == 5:
                taps = {"emb_l1": out[0][0], "emb_l2": out[1][0],
                        "emb_h": out[2][0]}
                attn = out[4]
            else:
                taps, attn = {}, out[2]
            save_feature_panel(
                f"{args.output_dir}/vis_val",
                f"epoch_{epoch:03d}_features.png",
                _np.asarray(vb["evg"][0], _np.float32), taps=taps,
                attn=None if attn is None else _np.asarray(
                    attn[0], _np.float32),
            )
        print(f"epoch {epoch}: val acc1 {val_metrics.get('acc1', 0):.2f}")
        save_checkpoint(args.output_dir, state)
        if val_metrics.get("acc1", 0) > best_acc:
            best_acc = val_metrics["acc1"]
            save_checkpoint(args.output_dir, state, name="best")
    print(f"best val acc1: {best_acc:.2f}")
    if args.export_torch and jax.process_index() == 0:
        from eventpretrain_tpu.ckpt.torch_export import save_torch_checkpoint

        print(f"exported {save_torch_checkpoint(args.export_torch, state.params, batch_stats=getattr(state, 'batch_stats', None), epoch=args.epochs)}")
    if args.export_serving and jax.process_index() == 0:
        from eventpretrain_tpu.utils.export_infer import (
            export_inference,
            export_inference_bundle,
        )

        vars_final = {"params": state.params}
        if getattr(state, "batch_stats", None):
            vars_final["batch_stats"] = state.batch_stats
        # serving consumes the pipeline's raw representation: 3-chan events
        # when EvRepSL preprocessing is baked into the artifact
        ser_chans = 3 if args.use_evrepsl else in_chans

        def _serving_logits(evg):
            x = preprocess_fn(evg) if preprocess_fn is not None else evg
            return hub.apply(vars_final, x, train=False)[1]

        example = jnp.zeros(
            (1, args.input_size, args.input_size, ser_chans), jnp.float32
        )
        if args.serving_native:
            sizes = tuple(
                int(s) for s in args.serving_batch_sizes.split(",") if s
            )
            out = export_inference_bundle(
                _serving_logits, example, args.export_serving,
                batch_sizes=sizes, native=True,
            )
        else:
            out = export_inference(_serving_logits, example,
                                   args.export_serving)
        print(f"exported serving artifact {out}")
    wait_for_saves()  # drain async checkpoint writes before returning
    return best_acc


if __name__ == "__main__":
    main()
