"""Semantic-segmentation finetune entry point (DSEC / DDD17).

Typed-config replacement for reference main_finetune_semseg.py:1-396.

  python -m eventpretrain_tpu.cli.finetune_semseg --dataset synthetic \\
      --epochs 2 --batch_size 4
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from eventpretrain_tpu.data.dense_pipeline import (
    DenseDataConfig,
    DensePipeline,
    DsecSource,
    Ddd17Source,
    SyntheticDenseSource,
)
from eventpretrain_tpu.models.dense_hub import (
    dense_hub_vit_small,
    dense_hub_vit_base,
    dense_hub_convvit_small,
    dense_hub_convvit_base,
    dense_hub_swin_tiny,
    dense_hub_vit_ecdp_small,
    dense_hub_vit_ecdp_base,
    dense_hub_convvit_ecdp_small,
    dense_hub_convvit_ecdp_base,
    dense_hub_vit_mem_small,
    dense_hub_vit_mem_base,
    dense_hub_swin_ecddp_tiny,
)
from eventpretrain_tpu.train import (
    build_optimizer,
    cosine_warmup_schedule,
    TrainState,
)
from eventpretrain_tpu.train.steps import (
    make_semseg_train_step,
    make_semseg_eval_step,
)
from eventpretrain_tpu.train.loop import train_one_epoch
from eventpretrain_tpu.eval.metrics import (
    miou_from_confusion,
    macc_from_confusion,
)
from eventpretrain_tpu.ckpt import (
    save_checkpoint,
    restore_checkpoint,
    wait_for_saves,
)
from eventpretrain_tpu.ckpt.torch_import import init_variables_from
from eventpretrain_tpu.utils.logging import MetricLogger, append_log_line, ScalarWriter

HUBS = {
    ("vit", "small"): dense_hub_vit_small,
    ("vit", "base"): dense_hub_vit_base,
    ("convvit", "small"): dense_hub_convvit_small,
    ("convvit", "base"): dense_hub_convvit_base,
    ("swin", "small"): dense_hub_swin_tiny,
    ("swin", "base"): dense_hub_swin_tiny,
    ("vit_ecdp", "small"): dense_hub_vit_ecdp_small,
    ("vit_ecdp", "base"): dense_hub_vit_ecdp_base,
    ("convvit_ecdp", "small"): dense_hub_convvit_ecdp_small,
    ("convvit_ecdp", "base"): dense_hub_convvit_ecdp_base,
    ("vit_mem", "small"): dense_hub_vit_mem_small,
    ("vit_mem", "base"): dense_hub_vit_mem_base,
    ("swin_ecddp", "small"): dense_hub_swin_ecddp_tiny,
    ("swin_ecddp", "base"): dense_hub_swin_ecddp_tiny,
}

BACKBONES = ["vit", "convvit", "swin", "vit_ecdp", "convvit_ecdp",
             "vit_mem", "swin_ecddp"]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("finetune_semseg")
    p.add_argument("--dataset", default="synthetic",
                   choices=["synthetic", "dsec", "ddd17"])
    p.add_argument("--data_root", default=None)
    p.add_argument("--num_classes", type=int, default=11)
    p.add_argument("--ignore_label", type=int, default=255)
    p.add_argument("--backbone", default="convvit", choices=BACKBONES)
    p.add_argument("--model_size", default="small", choices=["small", "base"])
    p.add_argument("--num_bins", type=int, default=5)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--fix_events_num", type=int, default=200_000)
    p.add_argument("--val_fix_events_num", type=int, default=200_000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--warmup_epochs", type=float, default=2)
    p.add_argument("--blr", type=float, default=1e-3,
                   help="reference dense-task base lr (main_finetune_semseg.py:65,\n                        main_finetune_flow.py:59)")
    p.add_argument("--min_lr", type=float, default=1e-6)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--layer_decay", type=float, default=0.75)
    p.add_argument("--use_layer_decay", action="store_true")
    # the reference exposes --clip_grad 3 (main_finetune_semseg.py:106) but
    # its semseg trainer never forwards it to the scaler
    # (ft_semseg_trainer.py:129 omits clip_grad= -> NativeScaler computes the
    # norm without clipping), so the effective reference behavior is NO clip.
    # Default matches the behavior; pass a value to actually clip.
    p.add_argument("--clip_grad", type=float, default=None)
    p.add_argument("--w_decode_loss", type=float, default=1.0)
    p.add_argument("--w_auxiliary_loss", type=float, default=0.4)
    p.add_argument("--drop_path_rate", type=float, default=0.1)
    # decoder-head Dropout2d; the reference hardcodes 0.1
    # (ft_dense_decoder.py:25-34) with no flag
    p.add_argument("--decode_dropout", type=float, default=0.1)
    p.add_argument("--drop_rate", type=float, default=0.0)
    p.add_argument("--attn_drop_rate", type=float, default=0.0)
    p.add_argument("--crop_min", type=float, default=0.8)
    p.add_argument("--sample_mode", default="bilinear",
                   choices=["nearest", "bilinear", "bicubic"],
                   help="prediction/decoder resize interpolation (reference "
                        "main_finetune_semseg.py:99)")
    p.add_argument("--lr", type=float, default=None,
                   help="absolute lr; overrides the --blr * eff_bs/256 "
                        "scaling")
    p.add_argument("--use_checkpoint", action="store_true",
                   help="jax.checkpoint (remat) each transformer block: "
                        "recompute activations in the backward to save HBM "
                        "(reference --use_checkpoint / torch "
                        "utils.checkpoint)")
    p.add_argument("--finetune", default=None)
    p.add_argument("--feed_batches", default=None,
                   help="replay a pickled list of train batch dicts instead "
                        "of the dataset pipeline and skip validation "
                        "(deterministic debugging; the trajectory A/B in "
                        "tests/test_dense_dataset_parity.py feeds this CLI "
                        "and the reference main identical batches)")
    p.add_argument("--lenient_import", action="store_true",
                   help="allow torch --finetune files that do not cover "
                        "every backbone param (reference strict=False)")
    p.add_argument("--export_torch", default=None,
                   help="after training, write the final params (incl. BN "
                        "running stats) as a reference-dialect torch .pth "
                        "(ckpt/torch_export.py)")
    p.add_argument("--export_serving", default=None,
                   help="after training, freeze the decode-logits fn into a "
                        "serving artifact at this path "
                        "(utils/export_infer.py; the reference has no "
                        "serving story)")
    p.add_argument("--serving_native", action="store_true",
                   help="TPU-native serving bundle (fused Pallas kernels "
                        "kept, concrete batch buckets) instead of the "
                        "portable symbolic-batch StableHLO artifact")
    p.add_argument("--serving_batch_sizes", default="1,8",
                   help="comma-separated batch buckets for --serving_native")
    p.add_argument("--resume", default=None)
    p.add_argument("--auto_resume", action="store_true",
                   help="resume from the latest checkpoint in output_dir if "
                        "present (preemption-safe restarts)")
    p.add_argument("--output_dir", default="./results/finetune_semseg")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--print_freq", type=int, default=20)
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--visualize", action="store_true",
                   help="save events/label/pred/aux panels per epoch "
                        "(reference ft_semseg_visualize.py)")
    p.add_argument("--forward_only", action="store_true",
                   help="dry-run: run steps without updating state "
                        "(reference --backward false)")
    p.add_argument("--profile_dir", default=None,
                   help="write a jax.profiler trace of the first epoch here")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard batches over all devices on a Mesh(('data',)) "
                        "(reference DDP-wraps this main, "
                        "main_finetune_semseg.py:311)")
    return p


def make_sources(args):
    if args.dataset == "synthetic":
        if not args.feed_batches:
            # batch replay keeps the user's head config (the synthetic
            # sources are placeholders there); plain synthetic runs get
            # the 5-class smoke labels
            args.num_classes = 5
            args.ignore_label = None
        train = SyntheticDenseSource("semseg", n=32, num_classes=5,
                                     seed=args.seed)
        val = SyntheticDenseSource("semseg", n=8, num_classes=5,
                                   seed=args.seed + 100)
        sensor_hw = train.sensor_hw
        return train, val, sensor_hw
    assert args.data_root, "--data_root required"
    if args.dataset == "dsec":
        train = DsecSource(args.data_root, DsecSource.TRAIN_SEQUENCES,
                           args.fix_events_num)
        val = DsecSource(args.data_root, DsecSource.VAL_SEQUENCES,
                         args.val_fix_events_num)
        return train, val, (440, 640)
    train = Ddd17Source(
        args.data_root, ["dir0", "dir3", "dir4", "dir6", "dir7"],
        args.fix_events_num,
    )
    # the reference windows DDD17 with train fix + 10000 in val too
    # (ft_ddd17_dataset.py:87), then trims to val_fix_events_num
    val = Ddd17Source(args.data_root, ["dir1"], args.val_fix_events_num,
                      window_events_num=args.fix_events_num + 10_000)
    return train, val, (200, 346)


def main(args=None):
    args = build_parser().parse_args(args)
    if args.data_parallel:
        from eventpretrain_tpu.parallel import maybe_initialize_distributed

        maybe_initialize_distributed()
    np.random.seed(args.seed)
    train_src, val_src, sensor_hw = make_sources(args)
    if args.data_parallel and jax.process_count() > 1:
        from eventpretrain_tpu.parallel import (
            HostShardedSource,
            local_batch_size,
        )

        train_src = HostShardedSource(train_src)
        val_src = HostShardedSource(val_src)
        local_bs = local_batch_size(args.batch_size)
    else:
        local_bs = args.batch_size

    cfg = DenseDataConfig(
        task="semseg", num_bins=args.num_bins, input_size=args.input_size,
        fix_events_num=args.fix_events_num,
        val_fix_events_num=args.val_fix_events_num,
        sensor_height=sensor_hw[0], sensor_width=sensor_hw[1],
        crop_min=args.crop_min,
        label_size=sensor_hw,
    )
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    hub = HUBS[(args.backbone, args.model_size)](
        num_classes=args.num_classes, num_bins=args.num_bins, dtype=dtype,
        input_size=args.input_size,
        drop_path_rate=args.drop_path_rate,
        drop_rate=args.drop_rate, attn_drop_rate=args.attn_drop_rate,
        use_remat=args.use_checkpoint,
    ).clone(sample_mode=args.sample_mode,
            decode_dropout=args.decode_dropout)
    variables = jax.jit(hub.init)(
        jax.random.key(args.seed),
        jnp.zeros((1, args.input_size, args.input_size, args.num_bins)),
    )
    params = variables["params"]
    from eventpretrain_tpu.utils.logging import count_params

    print(f"model params: {count_params(params):.2f}M")
    if args.finetune:
        # fills params AND batch_stats (the reference dense checkpoints
        # carry decoder-head BN running stats used in eval mode)
        variables = init_variables_from(
            args.finetune, dict(variables),
            strict_backbone=not args.lenient_import,
        )
        params = variables["params"]

    feed = None
    if args.feed_batches:
        import pickle

        with open(args.feed_batches, "rb") as f:
            feed = pickle.load(f)
    steps_per_epoch = (
        max(len(feed) // args.epochs, 1) if feed is not None
        else max(len(train_src) // local_bs, 1)
    )
    lr = (args.lr if args.lr is not None
          else args.blr * args.batch_size / 256)
    schedule = cosine_warmup_schedule(
        lr, args.min_lr, args.warmup_epochs, args.epochs, steps_per_epoch
    )
    tx = build_optimizer(
        params, learning_rate=schedule, weight_decay=args.weight_decay,
        betas=(0.9, 0.999),
        layer_decay=args.layer_decay if args.use_layer_decay else 1.0,
        num_layers=13 if args.backbone.startswith("convvit") else 12,
        backbone_type=args.backbone, clip_grad=args.clip_grad,
    )
    state = TrainState.create(
        apply_fn=hub.apply, params=params,
        batch_stats=variables.get("batch_stats", {}), tx=tx,
    )
    mesh = None
    if args.data_parallel:
        from eventpretrain_tpu.parallel import make_mesh, replicate

        mesh = make_mesh()
        ndev = mesh.shape["data"]
        assert args.batch_size % ndev == 0, (
            f"--batch_size must be a multiple of the {ndev}-device mesh")
        state = replicate(mesh, state)
        print(f"data-parallel over {ndev} devices")
    if args.auto_resume and not args.resume:
        import os as _os

        from eventpretrain_tpu.ckpt import latest_step

        if _os.path.isdir(_os.path.join(args.output_dir, "checkpoints")) \
                and latest_step(args.output_dir) is not None:
            args.resume = args.output_dir
    if args.resume:
        state = restore_checkpoint(args.resume, state)

    ignore = args.ignore_label
    train_step = make_semseg_train_step(
        hub, num_classes=args.num_classes, ignore_index=ignore,
        w_decode=args.w_decode_loss, w_aux=args.w_auxiliary_loss,
        sample_mode=args.sample_mode,
    )
    eval_step = make_semseg_eval_step(
        hub, num_classes=args.num_classes, ignore_label=ignore,
        sample_mode=args.sample_mode,
    )

    writer = ScalarWriter(
        f"{args.output_dir}/tb" if args.tensorboard else None
    )
    from eventpretrain_tpu.train.steps import forward_only
    from eventpretrain_tpu.utils import profiling

    run_step = forward_only(train_step) if args.forward_only else train_step
    best_miou = 0.0
    key = jax.random.key(args.seed)
    for epoch in range(args.epochs):
        t0 = time.time()
        if feed is not None:
            pipe = [
                {k: jnp.asarray(v) for k, v in b.items()}
                for b in feed[epoch * steps_per_epoch:
                              (epoch + 1) * steps_per_epoch]
            ]
        else:
            pipe = DensePipeline(train_src, cfg, local_bs, train=True,
                                 seed=args.seed + epoch)
        if mesh is not None:
            from eventpretrain_tpu.parallel import ShardedPipeline

            pipe = ShardedPipeline(pipe, mesh)
        with profiling.trace(args.profile_dir,
                             enabled=bool(args.profile_dir) and epoch == 0):
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
        val_pipe = DensePipeline(val_src, cfg, local_bs, train=False,
                                 seed=args.seed)
        if mesh is not None:
            from eventpretrain_tpu.parallel import ShardedPipeline

            val_pipe = ShardedPipeline(val_pipe, mesh)
        conf = 0
        n_val_batches = 0
        tv = time.time()
        for batch in val_pipe:
            conf = conf + eval_step(state, batch)
            n_val_batches += 1
        conf = jax.block_until_ready(conf)
        # mean inference time per batch (reference ft_semseg_trainer.py:269)
        infer_ms = 1000 * (time.time() - tv) / max(n_val_batches, 1)
        miou = float(miou_from_confusion(conf))
        macc = float(macc_from_confusion(conf))
        print(f"epoch {epoch}: mIoU {miou:.2f} mAcc {macc:.2f} "
              f"(inference {infer_ms:.1f} ms/batch)")
        if args.visualize:
            import numpy as _np

            from eventpretrain_tpu.ops.reshape import resize
            from eventpretrain_tpu.viz import save_semseg_panel

            vb = next(iter(DensePipeline(val_src, cfg, local_bs,
                                         train=False, seed=args.seed)))
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            _, _, decode, aux = state.apply_fn(variables, vb["evg"],
                                               train=False)
            label_hw = vb["label"].shape[1:3]
            pred = jnp.argmax(resize(decode, label_hw, "bilinear"), -1)
            aux_p = (jnp.argmax(resize(aux, label_hw, "bilinear"), -1)
                     if aux is not None else None)
            # full 5x4 layout (reference vis_ft_semseg): attention + l1/l2/h
            # taps from a one-sample diagnostic backbone forward
            out = hub.backbone.apply(
                {"params": state.params["backbone"]}, vb["evg"][:1],
                deterministic=True, return_attn=True,
                method=hub.backbone.encode_dense,
            )
            if len(out) == 5:
                taps = {"emb_l1": out[0][0], "emb_l2": out[1][0],
                        "emb_h": out[2][0]}
                attn = out[4]
            else:
                taps, attn = {}, out[2]
            save_semseg_panel(
                f"{args.output_dir}/vis_val", f"epoch_{epoch:03d}.png",
                _np.asarray(vb["evg"][0], _np.float32),
                _np.asarray(vb["label"][0]), _np.asarray(pred[0]),
                aux_pred=None if aux_p is None else _np.asarray(aux_p[0]),
                attn=None if attn is None else _np.asarray(
                    attn[0], _np.float32),
                taps={k: _np.asarray(v, _np.float32)
                      for k, v in taps.items()},
                dataset=args.dataset,
                title=f"epoch {epoch + 1}",
            )
        writer.write({**train_metrics, "miou": miou, "macc": macc}, epoch)
        append_log_line(args.output_dir, {
            "epoch": epoch, "miou": miou, "macc": macc,
            "val_infer_ms": round(infer_ms, 2),
            **{f"train_{k}": v for k, v in train_metrics.items()},
            "epoch_time_s": round(time.time() - t0, 2),
        })
        save_checkpoint(args.output_dir, state)
        if miou > best_miou:
            best_miou = miou
            save_checkpoint(args.output_dir, state, name="best")
    print(f"best mIoU: {best_miou:.2f}")
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

        def _serving_logits(evg):
            # decode-head logits at feature resolution (callers upsample to
            # label size exactly as eval does)
            return hub.apply(vars_final, evg, train=False)[2]

        example = jnp.zeros(
            (1, args.input_size, args.input_size, args.num_bins), jnp.float32
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
    return best_miou


if __name__ == "__main__":
    main()
