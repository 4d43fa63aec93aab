"""Three-stage pretrain entry point.

Typed-config replacement for reference main_pretrain.py:32-399. Stages:

  rec     : difference-guided masked modeling (stage 1)
  adj     : backbone-fixed feature transition — backbone frozen except
            norm_layer (stage 2; reference main_pretrain.py:281-284)
  con     : focus-aimed contrastive, full model trains (stage 3)
  rec+con : joint objective

  python -m eventpretrain_tpu.cli.pretrain --pr_phase rec --dataset synthetic \\
      --epochs 2 --batch_size 8
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from eventpretrain_tpu.data.pretrain_pipeline import (
    ClipEncodingPipeline,
    NImageNetPairedSource,
    RawPretrainDataConfig,
    RawPretrainPipeline,
    SyntheticRawPretrainSource,
    PretrainDataConfig,
    PretrainPipeline,
    EFImageNetSource,
    SyntheticPretrainSource,
)
from eventpretrain_tpu.models.pretrain_hub import (
    pretrain_hub_small,
    pretrain_hub_base,
    pretrain_hub_convvit_small,
    pretrain_hub_convvit_base,
    pretrain_hub_swin,
)
from eventpretrain_tpu.objectives import init_local_queue, init_queue
from eventpretrain_tpu.train import (
    build_optimizer,
    cosine_warmup_schedule,
    frozen_except_norm_mask,
    TrainState,
)
from eventpretrain_tpu.train.state import merge_params
from eventpretrain_tpu.train.steps import (
    make_rec_step,
    make_con_step,
    make_rec_and_con_step,
    make_swin_rec_step,
    make_swin_rec_and_con_step,
)
from eventpretrain_tpu.train.loop import train_one_epoch
from eventpretrain_tpu.train.steps import forward_only
from eventpretrain_tpu.utils import profiling
from eventpretrain_tpu.ckpt import (
    save_checkpoint,
    restore_checkpoint,
    wait_for_saves,
)
from eventpretrain_tpu.ckpt.torch_import import load_torch_backbone_if_needed
from eventpretrain_tpu.utils.logging import append_log_line, ScalarWriter


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("pretrain")
    p.add_argument("--pr_phase", default="rec",
                   choices=["rec", "rec-n", "adj", "_adj", "adj-n", "con",
                            "con-n", "rec+con", "ecdp", "ecdp-ef"])
    p.add_argument("--dataset", default="synthetic",
                   choices=["synthetic", "ef_imagenet", "n_imagenet"])
    p.add_argument("--data_root", default=None)
    p.add_argument("--n_imagenet_root", default=None,
                   help="raw N-ImageNet event .npz tree (adj-n/con-n)")
    p.add_argument("--imagenet_root", default=None,
                   help="paired ImageNet JPEG tree (adj-n/con-n, raw ecdp)")
    p.add_argument("--clip_emb_root", default=None,
                   help="precomputed <class>/<name>/<name>_clip_emb.pt tree "
                        "(raw N-ImageNet ecdp; the reference's "
                        "--imagenet_clip_emb_root)")
    p.add_argument("--clip_weights", default=None,
                   help="OpenAI CLIP ViT-B/16 checkpoint for in-loop "
                        "encoding; random init with a warning if omitted")
    p.add_argument("--fix_events_num", type=int, default=30000)
    p.add_argument("--pretrain_num_classes", type=int, default=None,
                   help="limit N-ImageNet classes (reference num_classes)")
    p.add_argument("--backbone", default="vit", choices=["vit", "convvit", "swin"])
    p.add_argument("--model_size", default="small", choices=["small", "base"])
    p.add_argument("--num_bins", type=int, default=5)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--frame_chans", type=int, default=1)
    p.add_argument("--mask_ratio", type=float, default=0.75)
    p.add_argument("--masking_strategy", default="random",
                   choices=["random", "density", "anti-density"])
    p.add_argument("--norm_pix_loss", action="store_true", default=True)
    p.add_argument("--no-norm_pix_loss", dest="norm_pix_loss",
                   action="store_false")
    p.add_argument("--use_queue", action="store_true")
    p.add_argument("--queue_length", type=int, default=65536)
    p.add_argument("--queue_scope", default="auto",
                   choices=["auto", "global", "local"],
                   help="queue negatives scope under --data_parallel: "
                        "'local' = reference DDP parity (one full-length "
                        "queue per device, fed only local keys, "
                        "pr_hub_model.py:166); 'global' = one shared queue "
                        "fed by the global batch; auto = local under DP")
    p.add_argument("--bn_scope", default="auto",
                   choices=["auto", "global", "local"],
                   help="projector/predictor BatchNorm statistic scope "
                        "under --data_parallel: 'local' = per-device batch "
                        "stats, exact reference DDP semantics "
                        "(mlp_head.py:13-18 under main_pretrain.py:319 DDP); "
                        "'global' = global-batch (sync-BN) stats; auto = "
                        "local under DP, mirroring --queue_scope")
    p.add_argument("--temperature", type=float, default=0.07)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--warmup_epochs", type=float, default=40)
    p.add_argument("--blr", type=float, default=1e-3)
    p.add_argument("--min_lr", type=float, default=0.0)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--accum_iter", type=int, default=1)
    p.add_argument("--drop_path_rate", type=float, default=0.0)
    p.add_argument("--drop_rate", type=float, default=0.0)
    p.add_argument("--attn_drop_rate", type=float, default=0.0)
    p.add_argument("--use_feature_fusion", action="store_true", default=True)
    p.add_argument("--no-use_feature_fusion", dest="use_feature_fusion",
                   action="store_false",
                   help="fuse taps 1+3+final in the masked path (reference "
                        "main_pretrain.py:114-115, default on)")
    p.add_argument("--lr", type=float, default=None,
                   help="absolute lr; overrides the --blr * eff_bs/256 "
                        "scaling (reference main_pretrain.py:104,322-327)")
    p.add_argument("--use_layer_decay", action="store_true",
                   help="layer-wise lr decay (reference main_pretrain.py:45)")
    p.add_argument("--layer_decay", type=float, default=0.75)
    p.add_argument("--use_layer_grafted", action="store_true",
                   help="3-scale [0.01,0.1,1] block-third lr scaling "
                        "(reference lr_decay.py:34-37)")
    p.add_argument("--ema_m", type=float, default=0.99,
                   help="ECDP base EMA momentum (reference "
                        "main_pretrain.py:127)")
    p.add_argument("--lambda_image", type=float, default=1.0)
    p.add_argument("--lambda_event", type=float, default=1.0)
    p.add_argument("--lambda_kl", type=float, default=2.0)
    p.add_argument("--use_checkpoint", action="store_true",
                   help="jax.checkpoint (remat) each transformer block: "
                        "recompute activations in the backward to save HBM "
                        "(reference --use_checkpoint / torch "
                        "utils.checkpoint)")
    p.add_argument("--crop_min", type=float, default=0.8)
    p.add_argument("--init_from", default=None,
                   help="stage chaining: checkpoint (orbax dir or torch .pth)")
    p.add_argument("--export_torch", default=None,
                   help="after training, write the final params as a "
                        "reference-dialect torch .pth (ckpt/torch_export.py); "
                        "the reference's --finetune checkpoint surgery "
                        "(main_finetune_cls.py:326-381) picks up backbone.*")
    p.add_argument("--resume", default=None)
    p.add_argument("--auto_resume", action="store_true",
                   help="resume from the latest checkpoint in output_dir if "
                        "present (preemption-safe restarts)")
    p.add_argument("--output_dir", default="./results/pretrain")
    p.add_argument("--save_model_freq", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--print_freq", type=int, default=20)
    p.add_argument("--num_workers", type=int, default=8,
                   help="IO threads per pipeline (reference DataLoader "
                        "num_workers; 0 = load on the pipeline thread)")
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--forward_only", action="store_true",
                   help="dry run: compute losses without optimizer updates "
                        "(reference --backward=False, pr_trainer.py:51)")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of the first epoch "
                        "into this directory")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard batches over all local devices "
                        "(Mesh(('data',)); replaces the reference's DDP, "
                        "main_pretrain.py:215-243)")
    p.add_argument("--feed_batches", default=None,
                   help="replay a pickled list of batch dicts instead of a "
                        "dataset pipeline (deterministic debugging; the "
                        "trajectory A/B in tests/test_e2e_parity.py feeds "
                        "both this CLI and the reference main identical "
                        "batches). Batches split evenly over --epochs.")
    p.add_argument("--visualize", action="store_true",
                   help="save reconstruction panels (rec phases)")
    return p


PHASE_ALIASES = {
    # reference main_pretrain.py:185-215 phase matrix. adj-n/con-n run the
    # raw N-ImageNet pipeline with in-loop CLIP encoding (see below);
    # rec-n aliases to rec (the reference pairs rec-n with a dataset that
    # yields no sub-frame targets — pr_trainer.py:20-36 would not unpack it;
    # the precomputed rec path is the working equivalent).
    "rec-n": "rec", "_adj": "adj", "adj-n": "adj", "con-n": "con",
    "ecdp-ef": "ecdp",
}

CLIP_IN_LOOP_PHASES = ("adj-n", "con-n")


def main(args=None):
    args = build_parser().parse_args(args)
    if args.data_parallel:
        # must run before anything initializes the XLA backend
        from eventpretrain_tpu.parallel import maybe_initialize_distributed

        maybe_initialize_distributed()
    np.random.seed(args.seed)
    clip_in_loop = args.pr_phase in CLIP_IN_LOOP_PHASES
    if args.pr_phase in PHASE_ALIASES:
        args.pr_phase = PHASE_ALIASES[args.pr_phase]
    if args.pr_phase == "ecdp":
        return main_ecdp(args)

    raw_cfg = None
    if clip_in_loop:
        # raw events + paired images; CLIP runs in-loop on device
        # (reference pr_trainer.py:158-224 pr_con_n_one_epoch)
        if args.dataset == "synthetic":
            source = SyntheticRawPretrainSource(
                n=max(args.batch_size * 4, 32), seed=args.seed,
            )
            canvas = source.hw
        else:
            assert args.n_imagenet_root and args.imagenet_root, (
                "adj-n/con-n need --n_imagenet_root and --imagenet_root"
            )
            source = NImageNetPairedSource(
                args.n_imagenet_root, args.imagenet_root,
                num_classes=args.pretrain_num_classes,
            )
            canvas = source.SENSOR_HW
        raw_cfg = RawPretrainDataConfig(
            num_bins=args.num_bins, input_size=args.input_size,
            crop_min=args.crop_min, fix_events_num=args.fix_events_num,
            canvas_height=canvas[0], canvas_width=canvas[1],
        )
    elif args.dataset == "synthetic":
        source = SyntheticPretrainSource(
            n=max(args.batch_size * 4, 32), size=args.input_size,
            num_bins=args.num_bins, seed=args.seed,
        )
    else:
        assert args.data_root, "--data_root required for ef_imagenet"
        source = EFImageNetSource(args.data_root, pr_phase=args.pr_phase)

    if args.data_parallel and jax.process_count() > 1:
        from eventpretrain_tpu.parallel import HostShardedSource, local_batch_size

        source = HostShardedSource(source)
        local_bs = local_batch_size(args.batch_size)
    else:
        local_bs = args.batch_size

    cfg = PretrainDataConfig(
        pr_phase=args.pr_phase, num_bins=args.num_bins,
        input_size=args.input_size, crop_min=args.crop_min,
        frame_chans=args.frame_chans,
        # bf16 models cast the grids at the first conv anyway; transferring
        # bf16 halves the host->device bytes of the dominant array
        transfer_dtype="bfloat16" if args.bf16 else "float32",
    )

    clip_model = clip_params = None
    if clip_in_loop:
        from eventpretrain_tpu.models.clip import (
            clip_vit_b16, load_clip_visual_weights,
        )

        clip_model = clip_vit_b16(
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32
        )
        clip_params = jax.jit(clip_model.init)(
            jax.random.key(0), jnp.zeros((1, 224, 224, 3))
        )["params"]
        if args.clip_weights:
            clip_params = load_clip_visual_weights(
                args.clip_weights, clip_params
            )
        else:
            print("[warn] --clip_weights not given: in-loop CLIP encoder is "
                  "randomly initialized (smoke-run mode)")

    # BN scope must be fixed at model construction (GroupedBatchNorm is a
    # module attribute); mirrors --queue_scope: local under DP = reference
    # DDP per-rank statistics
    bn_scope = args.bn_scope
    if bn_scope == "auto":
        bn_scope = "local" if args.data_parallel else "global"
    bn_groups = 1
    if bn_scope == "local" and args.data_parallel:
        bn_groups = jax.device_count()
        assert args.batch_size % bn_groups == 0

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    factory = {
        ("vit", "small"): pretrain_hub_small,
        ("vit", "base"): pretrain_hub_base,
        ("convvit", "small"): pretrain_hub_convvit_small,
        ("convvit", "base"): pretrain_hub_convvit_base,
        ("swin", "small"): pretrain_hub_swin,
        ("swin", "base"): pretrain_hub_swin,
    }[(args.backbone, args.model_size)]
    need_decoder = args.pr_phase in ("rec", "rec+con")
    hub = factory(
        num_bins=args.num_bins, mask_ratio=args.mask_ratio,
        frame_chans=args.frame_chans, with_decoder=need_decoder, dtype=dtype,
        input_size=args.input_size, drop_path_rate=args.drop_path_rate,
        drop_rate=args.drop_rate, attn_drop_rate=args.attn_drop_rate,
        use_feature_fusion=args.use_feature_fusion,
        use_remat=args.use_checkpoint,
    )
    num_patches = hub.num_patches
    patch_size = 32 if args.backbone == "swin" else 16
    chans = args.num_bins if args.num_bins != 1 else 1
    evg0 = jnp.zeros((1, args.input_size, args.input_size, chans))

    params, batch_stats = {}, {}
    if need_decoder:
        len_keep = int(num_patches * (1 - args.mask_ratio))
        mask0 = jnp.zeros((1, num_patches)).at[:, len_keep:].set(1.0)
        plans0 = None
        if args.backbone == "swin":
            from eventpretrain_tpu.models.swin import plans_to_device
            from eventpretrain_tpu.models.swin_plan import build_swin_plans

            plans0 = plans_to_device(
                build_swin_plans(
                    np.asarray(mask0[0], bool),
                    input_resolution=(args.input_size // 4,) * 2,
                    cell_grid=int(num_patches ** 0.5),
                )
            )
        import functools

        init_rec = jax.jit(
            functools.partial(hub.init, method=hub.forward_rec)
        )
        v = init_rec(
            jax.random.key(args.seed), evg0,
            jnp.arange(len_keep)[None], jnp.arange(num_patches)[None],
            mask=mask0, plans=plans0,
        )
        params.update(v["params"])
    if args.pr_phase in ("adj", "con", "rec+con"):
        # token-level InfoNCE aligns event patch tokens 1:1 with CLIP
        # ViT-B/16's 14x14 token grid (reference pr_hub_model.py forward_con);
        # vit/convvit share that grid directly, swin pairs its 7x7 tokens
        # with a stride-2 conv projection of the CLIP grid (14^2 -> 7^2,
        # reference pr_hub_model.py:92-97)
        want = 49 if args.backbone == "swin" else 196
        assert num_patches == want, (
            f"pr_phase={args.pr_phase} pairs event tokens with CLIP's "
            f"tokens; --input_size must be 224 (got {args.input_size} "
            f"-> {num_patches} patches, need {want})"
        )
        clip0 = jnp.zeros((1, 197, 512))
        import functools

        init_con = jax.jit(
            functools.partial(hub.init, method=hub.forward_con)
        )
        v = init_con(jax.random.key(args.seed), evg0, clip0)
        params = merge_params(v["params"], params)
        batch_stats = v["batch_stats"]

    if args.init_from:
        if args.init_from.endswith((".pth", ".pt", ".bin")):
            from eventpretrain_tpu.ckpt.torch_import import (
                init_variables_from,
            )

            # fills params AND batch_stats (projector-BN running stats are
            # registered buffers in the reference checkpoint)
            v = init_variables_from(
                args.init_from,
                {"params": params, "batch_stats": batch_stats},
                strict_backbone=False,
            )
            params, batch_stats = v["params"], v.get("batch_stats", batch_stats)
        else:
            # orbax: restore params only (stage chaining keeps fresh optimizer)
            import orbax.checkpoint as ocp
            import os

            with ocp.StandardCheckpointer() as ckptr:
                prev = ckptr.restore(os.path.abspath(args.init_from))
            prev_params = prev.get("params", prev)
            merged = 0
            for k in list(params.keys()):
                if k in prev_params:
                    params[k] = jax.tree.map(
                        lambda new, old: jnp.asarray(old, new.dtype)
                        if new.shape == old.shape else new,
                        params[k], prev_params[k],
                    )
                    merged += 1
            print(f"init_from {args.init_from}: merged {merged} top-level trees")

    from eventpretrain_tpu.utils.logging import count_params

    print(f"model params: {count_params(params):.2f}M")

    feed = None
    if args.feed_batches:
        import pickle

        with open(args.feed_batches, "rb") as f:
            feed = pickle.load(f)

    steps_per_epoch = (
        max(len(feed) // args.epochs, 1) if feed is not None
        else max(len(source) // local_bs, 1)
    )
    eff_batch = args.batch_size * args.accum_iter
    lr = args.lr if args.lr is not None else args.blr * eff_batch / 256
    # optax.MultiSteps advances the inner schedule once per UPDATE (every
    # accum_iter microsteps), while the reference clocks LR in microsteps
    # at each accum-window start (pr_trainer.py:28-30 adjust when
    # i % accum == 0 at t = i/len(dl)); updates-per-epoch makes the two
    # conventions coincide: schedule(u) = lr(u*accum/len(dl) + epoch).
    schedule = cosine_warmup_schedule(
        lr, args.min_lr, args.warmup_epochs, args.epochs,
        max(steps_per_epoch // args.accum_iter, 1),
    )
    trainable_mask = (
        frozen_except_norm_mask(params) if args.pr_phase == "adj" else None
    )
    tx = build_optimizer(
        params, learning_rate=schedule, weight_decay=args.weight_decay,
        betas=(0.9, 0.95),
        # convvit's stage-3 block ids reach 13 (reference lr_decay.py:23-32)
        num_layers=13 if args.backbone == "convvit" else 12,
        trainable_mask=trainable_mask,
        accum_steps=args.accum_iter,
        layer_decay=args.layer_decay if args.use_layer_decay else 1.0,
        backbone_type=args.backbone,
        layer_grafted=args.use_layer_grafted,
    )
    mesh = None
    if args.data_parallel:
        from eventpretrain_tpu.parallel import make_mesh

        mesh = make_mesh()
        assert args.batch_size % mesh.shape["data"] == 0

    # queue scope: 'local' = reference DDP parity (one full-length queue per
    # device, fed only local keys — pr_hub_model.py:166); 'global' = one
    # shared queue fed by the global batch (covers fewer steps of history
    # but every device sees identical negatives). auto = local under DP.
    queue_scope = args.queue_scope
    if queue_scope == "auto":
        queue_scope = "local" if mesh is not None else "global"
    queue = None
    if args.use_queue and args.pr_phase in ("adj", "con", "rec+con"):
        if queue_scope == "local" and mesh is not None:
            ndev = mesh.shape["data"]
            local_batch = args.batch_size // ndev
            assert args.queue_length % (local_batch * args.accum_iter) == 0
            queue = init_local_queue(
                jax.random.key(args.seed + 1), ndev, hub.embed_dim,
                num_patches, args.queue_length,
            )
        else:
            queue_scope = "global"
            assert args.queue_length % (
                args.batch_size * args.accum_iter
            ) == 0
            queue = init_queue(
                jax.random.key(args.seed + 1), hub.embed_dim, num_patches,
                args.queue_length,
            )
        if args.init_from and args.init_from.endswith((".pth", ".pt",
                                                       ".bin")):
            # the reference queue is a registered buffer in the checkpoint
            # (pr_hub_model.py:85-87); seed ours from it so trajectories
            # replay exactly (shape (C, L, K) matches QueueState.buffer)
            from eventpretrain_tpu.ckpt.torch_import import (
                load_torch_state_dict,
            )

            sd = load_torch_state_dict(args.init_from)
            if "queue" in sd and queue_scope == "global":
                buf = jnp.asarray(np.asarray(sd["queue"], np.float32))
                ptr = jnp.asarray(
                    int(np.asarray(sd.get("queue_ptr", 0)).ravel()[0]),
                    jnp.int32,
                )
                assert buf.shape == queue.buffer.shape, (
                    buf.shape, queue.buffer.shape)
                queue = queue._replace(buffer=buf, ptr=ptr)
                print("queue buffer seeded from", args.init_from)
    state = TrainState.create(
        apply_fn=hub.apply, params=params, batch_stats=batch_stats,
        tx=tx, queue=queue,
    )
    if args.auto_resume and not args.resume:
        import os as _os

        from eventpretrain_tpu.ckpt import latest_step

        if _os.path.isdir(_os.path.join(args.output_dir, "checkpoints")) \
                and latest_step(args.output_dir) is not None:
            args.resume = args.output_dir
    if args.resume:
        state = restore_checkpoint(args.resume, state)
        print(f"resumed from {args.resume} at step {int(state.step)}")

    common = dict(
        patch_size=patch_size, num_patches=num_patches,
        mask_ratio=args.mask_ratio, masking_strategy=args.masking_strategy,
        norm_pix_loss=args.norm_pix_loss,
    )
    if args.pr_phase == "rec":
        if args.backbone == "swin":
            step = make_swin_rec_step(
                hub, cell_grid=int(num_patches ** 0.5),
                mask_ratio=args.mask_ratio, decoder_patch_size=patch_size,
                norm_pix_loss=args.norm_pix_loss,
                input_resolution=args.input_size // 4,
                plan_seed=args.seed,
            )
        else:
            step = make_rec_step(hub, **common)
    elif args.pr_phase in ("adj", "con"):
        step = make_con_step(
            hub, use_queue=args.use_queue, temperature=args.temperature,
            queue_mode=queue_scope, mesh=mesh,
            # adj: backbone frozen except norm_layer -> trunk backward is
            # never built (train/steps.py::partitioned_value_and_grad)
            trainable_mask=trainable_mask,
        )
    else:
        if args.backbone == "swin":
            step = make_swin_rec_and_con_step(
                hub, cell_grid=int(num_patches ** 0.5),
                mask_ratio=args.mask_ratio, decoder_patch_size=patch_size,
                norm_pix_loss=args.norm_pix_loss,
                input_resolution=args.input_size // 4,
                plan_seed=args.seed,
                use_queue=args.use_queue, temperature=args.temperature,
                queue_mode=queue_scope, mesh=mesh,
            )
        else:
            step = make_rec_and_con_step(
                hub, use_queue=args.use_queue, temperature=args.temperature,
                queue_mode=queue_scope, mesh=mesh,
                **common,
            )

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from eventpretrain_tpu.parallel import replicate

        local_queue = state.queue if queue_scope == "local" else None
        state = replicate(mesh, state)
        if local_queue is not None:
            # the per-device queue bank shards over its leading device axis
            # (init_local_queue), never replicates
            shard = NamedSharding(mesh, P("data"))
            state = state.replace(queue=jax.tree.map(
                lambda x: jax.device_put(x, shard), local_queue
            ))
        print(f"data-parallel over {mesh.shape['data']} devices, "
              f"queue scope: {queue_scope if args.use_queue else 'n/a'}")

    writer = ScalarWriter(
        f"{args.output_dir}/tb" if args.tensorboard else None
    )
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
        elif clip_in_loop:
            pipe = ClipEncodingPipeline(
                RawPretrainPipeline(
                    source, raw_cfg, local_bs, train=True,
                    seed=args.seed + epoch, num_workers=args.num_workers,
                ),
                clip_model, clip_params,
            )
        else:
            pipe = PretrainPipeline(
                source, cfg, local_bs, train=True,
                seed=args.seed + epoch, num_workers=args.num_workers,
            )
        if mesh is not None:
            from eventpretrain_tpu.parallel import ShardedPipeline

            pipe = ShardedPipeline(pipe, mesh)
        run_step = forward_only(step) if args.forward_only else step
        with profiling.trace(args.profile_dir,
                             enabled=bool(args.profile_dir)
                             and epoch == start_epoch):
            state, metrics = train_one_epoch(
                step=run_step, state=state, pipeline=pipe,
                rng_key=jax.random.fold_in(key, epoch), epoch=epoch,
                print_freq=args.print_freq,
            )
        record = {
            "epoch": epoch,
            **{f"train_{k}": v for k, v in metrics.items()},
            "epoch_time_s": round(time.time() - t0, 2),
        }
        append_log_line(args.output_dir, record)
        writer.write(metrics, epoch, "train/")
        if args.visualize and args.pr_phase in ("rec", "rec+con"):
            import numpy as _np

            from eventpretrain_tpu.ops.masking import make_mask_from_noise
            from eventpretrain_tpu.ops.reshape import emb2frame
            from eventpretrain_tpu.viz import save_reconstruction_panel

            # only sample 0 is plotted; load a batch of 1, not the global batch
            vb = next(iter(PretrainPipeline(
                source, cfg, 1, train=False, seed=args.seed,
                num_workers=args.num_workers)), None)
            # a sharded source may hold no local samples: skip the panel only
            if vb is not None:
                vevg = vb["evg"][:1]
                len_keep = int(num_patches * (1 - args.mask_ratio))
                noise = jax.random.uniform(
                    jax.random.fold_in(key, 10_000 + epoch),
                    (1, num_patches),
                )
                ids_keep, msk, ids_restore = make_mask_from_noise(
                    noise, len_keep)
                pred, emb_l1, emb_l2, emb_lh = hub.apply(
                    {"params": state.params}, vevg, ids_keep, ids_restore,
                    mask=msk, method=hub.forward_rec,
                )
                pred_frame = emb2frame(patch_size, pred, args.frame_chans)
                rec_kwargs = dict(
                    mask=_np.asarray(msk[0], _np.float32),
                    patch_size=patch_size,
                    taps={
                        "emb_l1": _np.asarray(emb_l1[0], _np.float32),
                        "emb_l2": _np.asarray(emb_l2[0], _np.float32),
                        "emb_l_h": _np.asarray(emb_lh[0], _np.float32),
                    },
                    ids_restore=_np.asarray(ids_restore[0]),
                    title=f"epoch {epoch + 1}",
                )
                if args.pr_phase == "rec+con" and "clip_emb" in vb:
                    # combined 9x4 rec+con diagnostic (reference
                    # vis_pr_rec_and_con, pr_visualize.py:413-601)
                    from eventpretrain_tpu.viz import save_rec_con_panel

                    variables = {"params": state.params}
                    if state.batch_stats:
                        variables["batch_stats"] = state.batch_stats
                    q, k, emb_h_org, clip_emb_org, attn = hub.apply(
                        variables, vevg, vb["clip_emb"][:1],
                        method=hub.forward_con,
                    )
                    save_rec_con_panel(
                        f"{args.output_dir}/vis_train",
                        f"epoch_{epoch:03d}.png",
                        _np.asarray(vb["evg"][0], _np.float32),
                        _np.asarray(vb["frame"][0], _np.float32),
                        _np.asarray(pred_frame[0], _np.float32),
                        emb_h_org=_np.asarray(emb_h_org[0], _np.float32),
                        emb_h_proj=_np.asarray(q[0], _np.float32),
                        clip_emb_org=_np.asarray(clip_emb_org[0],
                                                 _np.float32),
                        clip_emb_proj=_np.asarray(k[0], _np.float32),
                        attn=None if attn is None else _np.asarray(
                            attn[0], _np.float32),
                        **rec_kwargs,
                    )
                else:
                    save_reconstruction_panel(
                        f"{args.output_dir}/vis_train",
                        f"epoch_{epoch:03d}.png",
                        _np.asarray(vb["evg"][0], _np.float32),
                        _np.asarray(vb["frame"][0], _np.float32),
                        _np.asarray(pred_frame[0], _np.float32),
                        **rec_kwargs,
                    )
        elif args.visualize and args.pr_phase in ("adj", "con"):
            # contrastive panel (reference vis_pr_con, pr_visualize.py:320)
            import numpy as _np

            from eventpretrain_tpu.viz import save_con_panel

            # only sample 0 is plotted; load a batch of 1, not the global batch
            if clip_in_loop:
                vpipe = ClipEncodingPipeline(
                    RawPretrainPipeline(source, raw_cfg, 1,
                                        train=False, seed=args.seed),
                    clip_model, clip_params,
                )
            else:
                vpipe = PretrainPipeline(source, cfg, 1,
                                         train=False, seed=args.seed,
                                         num_workers=args.num_workers)
            vb = next(iter(vpipe), None)
            if vb is not None:
                variables = {"params": state.params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                q, k, emb_h_org, clip_emb_org, attn = hub.apply(
                    variables, vb["evg"][:1], vb["clip_emb"][:1],
                    method=hub.forward_con,
                )
                save_con_panel(
                    f"{args.output_dir}/vis_train", f"epoch_{epoch:03d}.png",
                    _np.asarray(vb["evg"][0], _np.float32),
                    _np.asarray(emb_h_org[0], _np.float32),
                    _np.asarray(q[0], _np.float32),
                    _np.asarray(clip_emb_org[0], _np.float32),
                    _np.asarray(k[0], _np.float32),
                    attn=None if attn is None else _np.asarray(
                        attn[0], _np.float32),
                )
        if (epoch + 1) % args.save_model_freq == 0 or epoch + 1 == args.epochs:
            path = save_checkpoint(args.output_dir, state)
            print(f"saved {path}")
    if args.export_torch and jax.process_index() == 0:
        from eventpretrain_tpu.ckpt.torch_export import save_torch_checkpoint

        print(f"exported {save_torch_checkpoint(args.export_torch, state.params, batch_stats=getattr(state, 'batch_stats', None), epoch=args.epochs)}")
    wait_for_saves()  # drain async checkpoint writes before returning
    return state





def main_ecdp(args):
    """ECDP baseline pretrain (reference main_pretrain.py pr_phase 'ecdp' +
    trainer/pretrain/pr_ecdp_trainer.py)."""
    import functools
    import time

    from eventpretrain_tpu.data.pretrain_pipeline import (
        EcdpPretrainPipeline,
        SyntheticPretrainSource,
        EFImageNetSource,
    )
    from eventpretrain_tpu.models.ecdp_hub import ecdp_model_small, ecdp_model_base
    from eventpretrain_tpu.objectives.ecdp import init_sample_queue
    from eventpretrain_tpu.ops import random_masking
    from eventpretrain_tpu.train.steps import make_ecdp_step
    from eventpretrain_tpu.utils.logging import append_log_line, ScalarWriter

    # ECDP runs on 2-channel count images
    args.num_bins = 2
    raw_pipeline = False
    clip_model = clip_params = None
    if args.dataset == "n_imagenet":
        # raw N-ImageNet ECDP q/k path (reference
        # pr_n_imagenet_dataset.py:125-181 + main_pretrain.py:185-192
        # pr_phase='ecdp'): raw npz -> two independent windows+augments ->
        # 2-chan count images -> per-image norm; clip embedding from a
        # precomputed tree (--clip_emb_root) or in-loop CLIP on the paired
        # JPEGs (--imagenet_root [+ --clip_weights])
        assert args.n_imagenet_root and (
            args.imagenet_root or args.clip_emb_root
        ), ("--dataset n_imagenet needs --n_imagenet_root plus one of "
            "--imagenet_root (in-loop CLIP) / --clip_emb_root")
        source = NImageNetPairedSource(
            args.n_imagenet_root,
            imagenet_root=args.imagenet_root,
            clip_emb_root=args.clip_emb_root,
            num_classes=args.pretrain_num_classes,
        )
        raw_pipeline = True
        if args.imagenet_root:
            from eventpretrain_tpu.models.clip import (
                clip_vit_b16, load_clip_visual_weights,
            )

            clip_model = clip_vit_b16(
                dtype=jnp.bfloat16 if args.bf16 else jnp.float32
            )
            clip_params = jax.jit(clip_model.init)(
                jax.random.key(0), jnp.zeros((1, 224, 224, 3))
            )["params"]
            if args.clip_weights:
                clip_params = load_clip_visual_weights(
                    args.clip_weights, clip_params
                )
            else:
                print("[warn] --clip_weights not given: in-loop CLIP "
                      "encoder is randomly initialized (smoke-run mode)")
    elif args.dataset == "synthetic":
        source = SyntheticPretrainSource(
            n=max(args.batch_size * 4, 32), size=args.input_size,
            num_bins=2, clip_tokens=1, seed=args.seed,
        )
    else:
        source = EFImageNetSource(args.data_root, pr_phase="con")
    if args.data_parallel and jax.process_count() > 1:
        from eventpretrain_tpu.parallel import HostShardedSource, local_batch_size

        source = HostShardedSource(source)
        local_bs = local_batch_size(args.batch_size)
    else:
        local_bs = args.batch_size
    cfg = PretrainDataConfig(
        pr_phase="ecdp", num_bins=2, input_size=args.input_size,
        crop_min=args.crop_min,
    )
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    from eventpretrain_tpu.models.ecdp_hub import (
        ecdp_model_convvit_small,
        ecdp_model_convvit_base,
    )

    model = {
        ("vit", "small"): ecdp_model_small,
        ("vit", "base"): ecdp_model_base,
        ("convvit", "small"): ecdp_model_convvit_small,
        ("convvit", "base"): ecdp_model_convvit_base,
    }[("convvit" if args.backbone == "convvit" else "vit", args.model_size)](
        dtype=dtype, input_size=args.input_size,
        drop_path_rate=args.drop_path_rate,
        drop_rate=args.drop_rate, attn_drop_rate=args.attn_drop_rate,
        use_remat=args.use_checkpoint,
    )

    num_patches = (args.input_size // 16) ** 2
    len_keep = int(num_patches * (1 - args.mask_ratio))
    img0 = jnp.zeros((2, args.input_size, args.input_size, 2))
    clip0 = jnp.zeros((2, 512))
    ids0 = jnp.tile(jnp.arange(len_keep)[None], (2, 1))
    variables = jax.jit(
        functools.partial(model.init, method=model.forward_query)
    )(jax.random.key(args.seed), img0, ids0, clip0)
    params = variables["params"]
    from eventpretrain_tpu.utils.logging import count_params

    print(f"model params: {count_params(params):.2f}M")

    steps_per_epoch = max(len(source) // local_bs, 1)
    lr = (args.lr if args.lr is not None
          else args.blr * args.batch_size / 256)
    schedule = cosine_warmup_schedule(
        lr, args.min_lr, args.warmup_epochs, args.epochs, steps_per_epoch
    )
    tx = build_optimizer(params, learning_rate=schedule,
                         weight_decay=args.weight_decay, betas=(0.9, 0.95),
                         num_layers=12)
    queue = None
    if args.use_queue:
        queue = (
            init_sample_queue(jax.random.key(1), 256, args.queue_length),
            init_sample_queue(jax.random.key(2), 256, args.queue_length),
        )
    # materialize a real copy: the donated train step may not see the same
    # buffer twice (params["encoder"] and ema_params)
    ema0 = jax.tree.map(jnp.copy, params["encoder"])
    state = TrainState.create(
        apply_fn=model.apply, params=params,
        batch_stats=variables["batch_stats"], tx=tx, queue=queue,
        ema_params=ema0,
    )
    if args.auto_resume and not args.resume:
        import os as _os

        from eventpretrain_tpu.ckpt import latest_step

        if _os.path.isdir(_os.path.join(args.output_dir, "checkpoints")) \
                and latest_step(args.output_dir) is not None:
            args.resume = args.output_dir
    if args.resume:
        state = restore_checkpoint(args.resume, state)

    step = make_ecdp_step(
        model, num_patches=num_patches, mask_ratio=args.mask_ratio,
        use_queue=args.use_queue, total_epochs=args.epochs,
        steps_per_epoch=steps_per_epoch,
        lambda_image=args.lambda_image, lambda_event=args.lambda_event,
        lambda_kl=args.lambda_kl, base_ema_momentum=args.ema_m,
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
    key = jax.random.key(args.seed)
    start_epoch = int(state.step) // steps_per_epoch
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        if raw_pipeline:
            from eventpretrain_tpu.data.pretrain_pipeline import (
                ClipEncodingPipeline,
                EcdpRawPretrainPipeline,
                RawPretrainDataConfig,
            )

            pipe = EcdpRawPretrainPipeline(
                source,
                RawPretrainDataConfig(
                    num_bins=2, input_size=args.input_size,
                    crop_min=args.crop_min,
                    fix_events_num=args.fix_events_num,
                ),
                local_bs, train=True, seed=args.seed + epoch,
                num_workers=args.num_workers,
            )
            if clip_model is not None:
                pipe = ClipEncodingPipeline(
                    pipe, clip_model, clip_params, cls_only=True
                )
        else:
            pipe = EcdpPretrainPipeline(source, cfg, local_bs, train=True,
                                        seed=args.seed + epoch,
                                        num_workers=args.num_workers)
        if mesh is not None:
            from eventpretrain_tpu.parallel import ShardedPipeline

            pipe = ShardedPipeline(pipe, mesh)
        state, metrics = train_one_epoch(
            step=step, state=state, pipeline=pipe,
            rng_key=jax.random.fold_in(key, epoch), epoch=epoch,
            print_freq=args.print_freq,
        )
        append_log_line(args.output_dir, {
            "epoch": epoch,
            **{f"train_{k}": v for k, v in metrics.items()},
            "epoch_time_s": round(time.time() - t0, 2),
        })
        if args.visualize:
            # q/k view pair (reference vis_pr_ecdp, pr_visualize.py:604)
            import numpy as _np

            from eventpretrain_tpu.viz import save_ecdp_panel

            if raw_pipeline:
                from eventpretrain_tpu.data.pretrain_pipeline import (
                    EcdpRawPretrainPipeline,
                    RawPretrainDataConfig,
                )

                vpipe = EcdpRawPretrainPipeline(
                    source,
                    RawPretrainDataConfig(
                        num_bins=2, input_size=args.input_size,
                        fix_events_num=args.fix_events_num,
                    ),
                    1, train=False, seed=args.seed,
                )
            else:
                vpipe = EcdpPretrainPipeline(
                    source, cfg, 1, train=False, seed=args.seed
                )
            vb = next(iter(vpipe))
            # full 3x4 diagnostic (reference vis_pr_ecdp,
            # pr_visualize.py:604-740): fresh q/k masks, query-encoder
            # attention vs EMA-key attention, clip + head projections
            from eventpretrain_tpu.ops.masking import make_mask_from_noise

            kq, kk = jax.random.split(jax.random.fold_in(key, 20_000 + epoch))
            ids_q, mask_q, ids_restore_q = make_mask_from_noise(
                jax.random.uniform(kq, (1, num_patches)), len_keep)
            ids_k, mask_k, ids_restore_k = make_mask_from_noise(
                jax.random.uniform(kk, (1, num_patches)), len_keep)
            img_q = jnp.asarray(vb["img_q"][:1])
            img_k = jnp.asarray(vb["img_k"][:1])
            clip_emb = jnp.asarray(vb["clip_emb"][:1])
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            q_event, q_image, clip_proj = state.apply_fn(
                variables, img_q, ids_q, clip_emb, train=False,
                mask=mask_q, method=model.forward_query,
            )
            backbone = model.encoder.backbone
            emb_event_q, emb_image_q, attn_q = backbone.apply(
                {"params": state.params["encoder"]["backbone"]},
                img_q, ids_q, deterministic=True, mask=mask_q,
                return_attn=True, method=backbone.encode_masked,
            )
            _, _, attn_k = backbone.apply(
                {"params": state.ema_params["backbone"]},
                img_k, ids_k, deterministic=True, mask=mask_k,
                return_attn=True, method=backbone.encode_masked,
            )
            save_ecdp_panel(
                f"{args.output_dir}/vis_train", f"epoch_{epoch:03d}.png",
                _np.asarray(vb["img_q"][0], _np.float32),
                _np.asarray(vb["img_k"][0], _np.float32),
                mask_q=_np.asarray(mask_q[0], _np.float32),
                mask_k=_np.asarray(mask_k[0], _np.float32),
                ids_restore_q=_np.asarray(ids_restore_q[0]),
                ids_restore_k=_np.asarray(ids_restore_k[0]),
                attn_q=None if attn_q is None else _np.asarray(
                    attn_q[0], _np.float32),
                attn_k=None if attn_k is None else _np.asarray(
                    attn_k[0], _np.float32),
                clip_emb_org=_np.asarray(clip_emb[0], _np.float32),
                clip_emb_proj=_np.asarray(clip_proj[0], _np.float32),
                emb_image_q_org=_np.asarray(emb_image_q[0], _np.float32),
                emb_image_q=_np.asarray(q_image[0], _np.float32),
                emb_event_q_org=_np.asarray(emb_event_q[0], _np.float32),
                emb_event_q=_np.asarray(q_event[0], _np.float32),
                title=f"epoch {epoch + 1}",
            )
        if (epoch + 1) % args.save_model_freq == 0 or epoch + 1 == args.epochs:
            print(f"saved {save_checkpoint(args.output_dir, state)}")
    if args.export_torch and jax.process_index() == 0:
        from eventpretrain_tpu.ckpt.torch_export import save_torch_checkpoint

        print(f"exported {save_torch_checkpoint(args.export_torch, state.params, batch_stats=getattr(state, 'batch_stats', None), epoch=args.epochs)}")
    wait_for_saves()  # drain async checkpoint writes before returning
    return state


if __name__ == "__main__":
    main()
