"""Optical-flow finetune entry point (MVSEC).

Typed-config replacement for reference main_finetune_flow.py:1-398.

  python -m eventpretrain_tpu.cli.finetune_flow --dataset synthetic \\
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
    SyntheticDenseSource,
)
from eventpretrain_tpu.cli.finetune_semseg import BACKBONES, HUBS
from eventpretrain_tpu.train import (
    build_optimizer,
    cosine_warmup_schedule,
    TrainState,
)
from eventpretrain_tpu.train.steps import (
    make_flow_train_step,
    make_flow_eval_step,
)
from eventpretrain_tpu.train.loop import train_one_epoch
from eventpretrain_tpu.ckpt import (
    save_checkpoint,
    restore_checkpoint,
    wait_for_saves,
)
from eventpretrain_tpu.ckpt.torch_import import init_variables_from
from eventpretrain_tpu.utils.logging import append_log_line, ScalarWriter


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("finetune_flow")
    p.add_argument("--dataset", default="synthetic",
                   choices=["synthetic", "mvsec"])
    p.add_argument("--data_root", default=None)
    p.add_argument("--val_splits", nargs="*",
                   default=["indoor_flying1", "indoor_flying2",
                            "indoor_flying3"])
    p.add_argument("--backbone", default="convvit", choices=BACKBONES)
    p.add_argument("--model_size", default="small", choices=["small", "base"])
    p.add_argument("--num_bins", type=int, default=5)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--fix_events_num", type=int, default=30_000)
    p.add_argument("--val_fix_events_num", type=int, default=30_000)
    p.add_argument("--max_flow", type=float, default=400.0)
    p.add_argument("--skip_num", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--warmup_epochs", type=float, default=2)
    p.add_argument("--blr", type=float, default=1e-3,
                   help="reference dense-task base lr (main_finetune_semseg.py:65,\n                        main_finetune_flow.py:59)")
    p.add_argument("--min_lr", type=float, default=1e-6)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--layer_decay", type=float, default=0.75)
    p.add_argument("--use_layer_decay", action="store_true")
    p.add_argument("--clip_grad", type=float, default=3.0,
                   help="reference dense-task clip (main_finetune_semseg.py:106)")
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
                        "main_finetune_flow.py sample_mode)")
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
    p.add_argument("--output_dir", default="./results/finetune_flow")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--print_freq", type=int, default=20)
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--visualize", action="store_true",
                   help="save events/mask/gt/pred/aux flow panels per epoch "
                        "(reference ft_flow_visualize.py)")
    p.add_argument("--forward_only", action="store_true",
                   help="dry-run: run steps without updating state "
                        "(reference --backward false)")
    p.add_argument("--profile_dir", default=None,
                   help="write a jax.profiler trace of the first epoch here")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard batches over all devices on a Mesh(('data',)) "
                        "(reference DDP-wraps this main, "
                        "main_finetune_flow.py:312)")
    return p


def make_sources(args):
    if args.dataset == "synthetic":
        train = SyntheticDenseSource("flow", n=32, seed=args.seed)
        vals = {"synthetic": SyntheticDenseSource("flow", n=8,
                                                  seed=args.seed + 100)}
        return train, vals, train.sensor_hw
    from eventpretrain_tpu.data.mvsec import MvsecSource

    assert args.data_root, "--data_root required"
    train = MvsecSource(
        args.data_root, "outdoor_day2", args.fix_events_num,
        skip_num=args.skip_num,
    )
    vals = {
        split: MvsecSource(args.data_root, split, args.val_fix_events_num,
                           skip_num=args.skip_num)
        for split in args.val_splits
    }
    return train, vals, (260, 346)


def main(args=None):
    args = build_parser().parse_args(args)
    if args.data_parallel:
        from eventpretrain_tpu.parallel import maybe_initialize_distributed

        maybe_initialize_distributed()
    np.random.seed(args.seed)
    train_src, val_srcs, sensor_hw = make_sources(args)
    if args.data_parallel and jax.process_count() > 1:
        from eventpretrain_tpu.parallel import (
            HostShardedSource,
            local_batch_size,
        )

        train_src = HostShardedSource(train_src)
        val_srcs = {k: HostShardedSource(v) for k, v in val_srcs.items()}
        local_bs = local_batch_size(args.batch_size)
    else:
        local_bs = args.batch_size

    cfg = DenseDataConfig(
        task="flow", num_bins=args.num_bins, input_size=args.input_size,
        fix_events_num=args.fix_events_num,
        val_fix_events_num=args.val_fix_events_num,
        sensor_height=sensor_hw[0], sensor_width=sensor_hw[1],
        crop_min=args.crop_min,
        label_size=sensor_hw,
    )
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    hub = HUBS[(args.backbone, args.model_size)](
        num_classes=2, num_bins=args.num_bins, dtype=dtype,
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

    train_step = make_flow_train_step(
        hub, max_flow=args.max_flow,
        w_decode=args.w_decode_loss, w_aux=args.w_auxiliary_loss,
        sample_mode=args.sample_mode,
    )
    eval_step = make_flow_eval_step(hub, sample_mode=args.sample_mode)

    writer = ScalarWriter(
        f"{args.output_dir}/tb" if args.tensorboard else None
    )
    from eventpretrain_tpu.train.steps import forward_only
    from eventpretrain_tpu.utils import profiling

    run_step = forward_only(train_step) if args.forward_only else train_step
    best_aee = {k: float("inf") for k in val_srcs}
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
        record = {"epoch": epoch,
                  **{f"train_{k}": v for k, v in train_metrics.items()}}
        if feed is not None:
            # batch replay has no val datasets: record train metrics only
            append_log_line(args.output_dir, record)
            continue
        for split, src in val_srcs.items():
            val_pipe = DensePipeline(src, cfg, local_bs, train=False,
                                     seed=args.seed)
            if mesh is not None:
                from eventpretrain_tpu.parallel import ShardedPipeline

                val_pipe = ShardedPipeline(val_pipe, mesh)
            epe_sum = out_sum = count = 0.0
            n_val_batches = 0
            tv = time.time()
            for batch in val_pipe:
                m = eval_step(state, batch)
                epe_sum += float(m["epe_sum"])
                out_sum += float(m["outlier_sum"])
                count += float(m["count"])
                n_val_batches += 1
            # mean inference time per batch (reference ft_flow_trainer.py:269)
            infer_ms = 1000 * (time.time() - tv) / max(n_val_batches, 1)
            aee = epe_sum / max(count, 1)
            outlier = 100 * out_sum / max(count, 1)
            record[f"{split}_aee"] = aee
            record[f"{split}_outlier"] = outlier
            record[f"{split}_infer_ms"] = round(infer_ms, 2)
            print(f"epoch {epoch} [{split}]: AEE {aee:.3f} "
                  f"outliers {outlier:.2f}% "
                  f"(inference {infer_ms:.1f} ms/batch)")
            if aee < best_aee[split]:
                best_aee[split] = aee
                save_checkpoint(args.output_dir, state, name=f"best_{split}")
        if args.visualize:
            import numpy as _np

            from eventpretrain_tpu.ops.reshape import resize, resize_flow
            from eventpretrain_tpu.viz import save_flow_panel

            # one full 6x4 panel per val split, saved under
            # vis_val-<split> (reference vis_ft_flow: per-dataset val dirs,
            # ft_flow_visualize.py:250-256)
            for split, src0 in val_srcs.items():
                vb = next(iter(DensePipeline(src0, cfg, 1,
                                             train=False, seed=args.seed)),
                          None)
                if vb is None:
                    continue
                variables = {"params": state.params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                _, _, decode, aux = state.apply_fn(variables, vb["evg"],
                                                   train=False)
                hw = vb["flow"].shape[1:3]
                pred = resize_flow(decode, hw, "bilinear")
                presence = (jnp.linalg.norm(vb["evg"], axis=-1) > 0
                            ).astype(jnp.float32)[..., None]
                mask = resize(presence, hw, "nearest")[..., 0]
                mask = mask * (vb["valid"] >= 0.5)
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
                save_flow_panel(
                    f"{args.output_dir}/vis_val-{split}",
                    f"epoch_{epoch:03d}.png",
                    _np.asarray(vb["evg"][0], _np.float32),
                    _np.asarray(vb["flow"][0]), _np.asarray(pred[0]),
                    sparse_mask=_np.asarray(mask[0]),
                    aux_pred=(
                        _np.asarray(resize_flow(aux, hw, "bilinear")[0])
                        if aux is not None else None),
                    valid=_np.asarray(vb["valid"][0] >= 0.5),
                    attn=None if attn is None else _np.asarray(
                        attn[0], _np.float32),
                    taps={k: _np.asarray(v, _np.float32)
                          for k, v in taps.items()},
                    title=f"epoch {epoch + 1} [{split}]",
                )
        record["epoch_time_s"] = round(time.time() - t0, 2)
        append_log_line(args.output_dir, record)
        writer.write({k: v for k, v in record.items() if k != "epoch"}, epoch)
        save_checkpoint(args.output_dir, state)
    print("best AEE per split:", best_aee)
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
    return best_aee


if __name__ == "__main__":
    main()
