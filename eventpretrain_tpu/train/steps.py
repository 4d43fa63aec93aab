"""Jittable train-step factories for the three pretrain stages.

Equivalents of reference trainer/pretrain/pr_trainer.py:9-304's four epoch
functions, redesigned as pure step functions: the epoch loop stays on host
(see train/loop.py); each step is one jitted (grad, update, metrics) program
over the global batch. Under a data-sharded mesh the partitioner inserts
gradient all-reduces and contrastive-key all-gathers automatically.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from eventpretrain_tpu.objectives import (
    reconstruct_loss,
    token_infonce_queue,
    token_infonce_queue_local,
    global_token_infonce,
)
from eventpretrain_tpu.ops.masking import masking_noise, make_mask_from_noise
from eventpretrain_tpu.train.optim import global_grad_norm
from eventpretrain_tpu.train.state import TrainState


def _valid_row_mask(batch, n: int):
    """(n,) bool of real (non-pad) rows, or None when every row is real.

    Pipelines emit either a scalar ``num_valid`` (rows [0, num_valid) are
    real — the single-host tail-batch convention) or a per-row
    ``valid_rows`` bool vector (multi-host sharded batches, where each
    host's pads sit at the end of its own slice of the global array —
    parallel/mesh.py::shard_batch rewrites the scalar there).
    """
    if "valid_rows" in batch:
        return batch["valid_rows"]
    if "num_valid" in batch:
        return jnp.arange(n) < batch["num_valid"]
    return None


def partitioned_value_and_grad(loss_fn, trainable_mask):
    """``value_and_grad(has_aux=True)`` over only the mask-True param leaves.

    TPU-first freeze: torch's ``requires_grad=False`` (reference
    main_pretrain.py:281-284 adj-phase backbone freeze,
    main_finetune_cls.py:384-388 --linprob) means autograd never builds the
    backward through frozen-only subgraphs — when every param upstream of a
    boundary is frozen, the backward stops at that boundary. The
    optimizer-mask approach (optax.masked + set_to_zero) preserves updates
    but still COMPUTES the full backward and discards it. Partitioning the
    params and differentiating only the trainable subset lets XLA skip the
    trunk backward entirely (measured: adj con step 2.2x, linprob 3.4x).

    Frozen leaves get zero grads in the returned full tree, so downstream
    optimizer masking/metrics see the usual structure. Side effect that is
    itself reference parity: the global grad norm (and any global-norm
    clipping) then covers only trainable params — exactly torch's
    ``clip_grad_norm_``/``get_grad_norm_`` over ``p.grad is not None``
    (misc.py:303-315).
    """
    from flax import traverse_util

    def value_and_grad_fn(params, *args, **kwargs):
        flat = traverse_util.flatten_dict(params)
        mask_flat = traverse_util.flatten_dict(trainable_mask)
        frozen = {k: v for k, v in flat.items() if not mask_flat[k]}

        def on_trainable(train_flat):
            p = traverse_util.unflatten_dict({**frozen, **train_flat})
            return loss_fn(p, *args, **kwargs)

        train = {k: v for k, v in flat.items() if mask_flat[k]}
        (val, aux), g = jax.value_and_grad(on_trainable, has_aux=True)(train)
        zeros = {k: jnp.zeros_like(v) for k, v in frozen.items()}
        grads = traverse_util.unflatten_dict({**zeros, **g})
        return (val, aux), grads

    return value_and_grad_fn


def _queue_loss(q, k, queue, temperature, queue_mode, mesh):
    """Dispatch queue InfoNCE by scope.

    'global' enqueues the global batch into one shared queue (global-view
    jit default); 'local' reproduces the reference's DDP semantics — one
    full-length queue per device fed only local keys
    (pr_hub_model.py:166) — via the shard_map variant (requires a mesh and
    an init_local_queue state). See PARITY.md "Queue scope".
    """
    if queue_mode == "local":
        assert mesh is not None, "queue_mode='local' needs mesh="
        return token_infonce_queue_local(q, k, queue, mesh, temperature)
    return token_infonce_queue(q, k, queue, temperature)



def make_rec_step(
    hub,
    *,
    patch_size: int,
    num_patches: int,
    mask_ratio: float = 0.75,
    masking_strategy: str = "random",
    norm_pix_loss: bool = True,
) -> Callable:
    """Stage-1 difference-guided masked-modeling step.

    batch = {'evg': (B,H,W,bins), 'frame': (B,H,W,C)} (reference
    pr_trainer.py:9-89 pr_rec_one_epoch + pr_hub_model.py:190-206).
    """
    len_keep = int(num_patches * (1 - mask_ratio))

    def loss_fn(params, state: TrainState, batch, rng):
        rng_mask, rng_drop = jax.random.split(rng)
        evg = batch["evg"]
        if "ids_restore" in batch:
            # mask replay: batches may carry an explicit masking (parity
            # trajectory A/B vs the reference RNG, ablations, debugging);
            # jit specializes on dict keys, so the sampling branch costs
            # nothing when absent
            ids_keep = batch["ids_keep"]
            mask = batch["mask"]
            ids_restore = batch["ids_restore"]
        else:
            noise = masking_noise(rng_mask, evg, patch_size, masking_strategy)
            ids_keep, mask, ids_restore = make_mask_from_noise(noise, len_keep)
        pred, *_ = state.apply_fn(
            {"params": params},
            evg,
            ids_keep,
            ids_restore,
            deterministic=False,
            mask=mask,
            method=hub.forward_rec,
            rngs={"dropout": rng_drop},
        )
        loss = reconstruct_loss(
            pred,
            batch["frame"],
            mask,
            patch_size=patch_size,
            norm_pix_loss=norm_pix_loss,
            mask_ratio=mask_ratio,
        )
        return loss, {}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state, batch, rng
        )
        new_state = state.apply_gradients(grads)
        metrics = {"loss": loss, "grad_norm": global_grad_norm(grads)}
        return new_state, metrics

    return step


def make_con_step(
    hub,
    *,
    use_queue: bool = False,
    temperature: float = 0.07,
    queue_mode: str = "global",
    mesh=None,
    trainable_mask=None,
) -> Callable:
    """Stage-2/3 contrastive step.

    batch = {'evg': (B,H,W,bins), 'clip_emb': (B,1+L,512)}. Queue mode
    threads QueueState (reference contrastive_loss_queue); global mode uses
    in-batch negatives (reference contrastive_loss). Stage 2 freezes the
    backbone except ``norm_layer`` (reference main_pretrain.py:281-284):
    pass that ``trainable_mask`` here too so the backward is only built for
    the trainable subtree — the frozen trunk runs forward-only, like
    torch's autograd under ``requires_grad=False``.
    """

    def loss_fn(params, state: TrainState, batch, rng):
        variables = {"params": params, "batch_stats": state.batch_stats}
        (q, k, *_), updates = state.apply_fn(
            variables,
            batch["evg"],
            batch["clip_emb"],
            train=True,
            method=hub.forward_con,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        if use_queue:
            loss, new_queue = _queue_loss(
                q, k, state.queue, temperature, queue_mode, mesh
            )
        else:
            loss = global_token_infonce(q, k, temperature)
            new_queue = state.queue
        return loss, (updates["batch_stats"], new_queue)

    vag = (
        jax.value_and_grad(loss_fn, has_aux=True)
        if trainable_mask is None
        else partitioned_value_and_grad(loss_fn, trainable_mask)
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng):
        (loss, (new_stats, new_queue)), grads = vag(
            state.params, state, batch, rng
        )
        new_state = state.apply_gradients(
            grads, batch_stats=new_stats, queue=new_queue
        )
        metrics = {"loss": loss, "grad_norm": global_grad_norm(grads)}
        return new_state, metrics

    return step


def make_rec_and_con_step(
    hub,
    *,
    patch_size: int,
    num_patches: int,
    mask_ratio: float = 0.75,
    masking_strategy: str = "random",
    norm_pix_loss: bool = True,
    use_queue: bool = False,
    temperature: float = 0.07,
    queue_mode: str = "global",
    mesh=None,
) -> Callable:
    """Combined rec+con step (reference pr_rec_and_con_one_epoch,
    pr_trainer.py:225-304: two forwards, summed losses)."""
    len_keep = int(num_patches * (1 - mask_ratio))

    def loss_fn(params, state: TrainState, batch, rng):
        rng_mask, rng_drop, rng_drop2 = jax.random.split(rng, 3)
        evg = batch["evg"]
        noise = masking_noise(rng_mask, evg, patch_size, masking_strategy)
        ids_keep, mask, ids_restore = make_mask_from_noise(noise, len_keep)
        pred, *_ = state.apply_fn(
            {"params": params},
            evg,
            ids_keep,
            ids_restore,
            deterministic=False,
            mask=mask,
            method=hub.forward_rec,
            rngs={"dropout": rng_drop},
        )
        rec = reconstruct_loss(
            pred, batch["frame"], mask,
            patch_size=patch_size, norm_pix_loss=norm_pix_loss,
            mask_ratio=mask_ratio,
        )
        variables = {"params": params, "batch_stats": state.batch_stats}
        (q, k, *_), updates = state.apply_fn(
            variables,
            evg,
            batch["clip_emb"],
            train=True,
            method=hub.forward_con,
            rngs={"dropout": rng_drop2},
            mutable=["batch_stats"],
        )
        if use_queue:
            con, new_queue = _queue_loss(
                q, k, state.queue, temperature, queue_mode, mesh
            )
        else:
            con = global_token_infonce(q, k, temperature)
            new_queue = state.queue
        return rec + con, (updates["batch_stats"], new_queue, rec, con)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng):
        (loss, (new_stats, new_queue, rec, con)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state, batch, rng)
        new_state = state.apply_gradients(
            grads, batch_stats=new_stats, queue=new_queue
        )
        metrics = {
            "loss": loss,
            "rec_loss": rec,
            "con_loss": con,
            "grad_norm": global_grad_norm(grads),
        }
        return new_state, metrics

    return step


def make_cls_train_step(hub, *, smoothing: float = 0.0,
                        preprocess_fn: Callable | None = None,
                        trainable_mask=None) -> Callable:
    """Classification finetune step (reference ft_cls_trainer.py:15-109).

    batch = {'evg': (B,H,W,C), 'label': (B,)}. ``preprocess_fn`` (e.g. the
    frozen EvRepSL net, reference ft_cls_trainer.py:36-37) maps evg first.
    ``trainable_mask`` (e.g. --linprob's head-only mask, reference
    main_finetune_cls.py:384-388) makes the backward cover only the
    trainable subtree: linear probing runs the backbone forward-only.
    """
    from eventpretrain_tpu.objectives.cls import cls_loss
    from eventpretrain_tpu.eval.metrics import topk_accuracy

    def loss_fn(params, state: TrainState, batch, rng):
        evg = batch["evg"]
        if preprocess_fn is not None:
            evg = jax.lax.stop_gradient(preprocess_fn(evg))
        _, logits, _ = state.apply_fn(
            {"params": params},
            evg,
            train=True,
            rngs={"dropout": rng},
        )
        loss = cls_loss(logits, batch["label"], smoothing)
        return loss, logits

    vag = (
        jax.value_and_grad(loss_fn, has_aux=True)
        if trainable_mask is None
        else partitioned_value_and_grad(loss_fn, trainable_mask)
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng):
        (loss, logits), grads = vag(state.params, state, batch, rng)
        new_state = state.apply_gradients(grads)
        metrics = {
            "loss": loss,
            "grad_norm": global_grad_norm(grads),
            **topk_accuracy(
                logits, batch["label"],
                topk=(1,) if logits.shape[-1] < 5 else (1, 5),
            ),
        }
        return new_state, metrics

    return step


def make_cls_eval_step(hub, preprocess_fn: Callable | None = None) -> Callable:
    """Validation step (reference ft_val, ft_cls_trainer.py:111-192)."""
    import optax

    from eventpretrain_tpu.eval.metrics import topk_accuracy

    @jax.jit
    def step(state: TrainState, batch):
        evg = batch["evg"]
        if preprocess_fn is not None:
            evg = preprocess_fn(evg)
        _, logits, _ = state.apply_fn(
            {"params": state.params}, evg, train=False
        )
        # weight out wrapped tail-batch pads (the reference never pads — its
        # loader just emits a short last batch; static shapes force padding
        # here, so eval metrics weight by the true sample count instead)
        vmask = _valid_row_mask(batch, logits.shape[0])
        if vmask is not None:
            w = vmask.astype(jnp.float32)
        else:
            w = jnp.ones((logits.shape[0],), jnp.float32)
        n = w.sum()
        per_sample = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), batch["label"]
        )
        metrics = {
            "loss": (per_sample * w).sum() / jnp.maximum(n, 1.0),
            **topk_accuracy(
                logits, batch["label"],
                topk=(1,) if logits.shape[-1] < 5 else (1, 5),
                weights=w,
            ),
            "_n": n,
        }
        return metrics

    return step


# Domain tags decorrelate the two swin mask schedules from each other and
# from data pipelines seeded with the same args.seed.
_SWIN_REC_TAG = 0x5717A5
_SWIN_REC_CON_TAG = 0x5717C0


class _HostCellMasker:
    """Per-step shared swin cell mask + grouping plans, computed on host.

    The cell mask is host-side planning input (models/swin_plan.py), so its
    randomness lives on the host: deriving it from the step's jax key would
    force a device->host value fetch every step, draining the async dispatch
    queue so planning ran serially instead of overlapping device compute.
    NOTE the step's ``rng`` argument therefore does NOT drive the cell mask —
    only dropout etc.; the mask schedule is keyed by
    (plan_seed, domain tag, global step).

    Step tracking: callers may pass the loop's step index explicitly
    (authoritative). Otherwise the host counter seeds itself from
    ``state.step`` and resyncs from it whenever the device value is already
    materialized (``is_ready()`` — free to read), so out-of-lockstep calls
    (compile warm-up with discarded state, in-process restore) cannot
    silently shift the schedule for more than the interval until the next
    materialized read (e.g. a metrics fetch at print_freq).

    Plan prefetch: because the schedule is a pure function of the step
    index, a background thread precomputes the numpy planning (mask +
    knapsack grouping, ~40 ms of host work at swin-T/224) ``prefetch``
    steps ahead; the caller thread only converts the ready plan to device
    arrays. Measured on v5e at bs64: 76 -> ~64 ms/step, and the step stops
    degrading when the host is otherwise loaded (planning was the
    critical path through the axon dispatch).
    """

    def __init__(self, plan_seed, domain_tag, num_cells, len_keep, *,
                 input_resolution, window_size, cell_grid, prefetch: int = 2):
        import numpy as np

        from eventpretrain_tpu.models.swin import (
            pack_plans_np,
            unpack_plans_on_device,
        )
        from eventpretrain_tpu.models.swin_plan import build_swin_plans

        self._np = np
        self._pack_plans_np = pack_plans_np
        self._unpack_plans_on_device = unpack_plans_on_device
        self._build_swin_plans = build_swin_plans
        self.plan_seed = plan_seed
        self.domain_tag = domain_tag
        self.num_cells = num_cells
        self.len_keep = len_keep
        self.input_resolution = input_resolution
        self.window_size = window_size
        self.cell_grid = cell_grid
        self._counter = None
        self._prefetch = prefetch
        self._pool = None
        self._pending = {}
        if prefetch:
            import concurrent.futures

            self._pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="swin-plan"
            )

    def _resolve_step(self, state, step_index):
        if step_index is not None:
            self._counter = int(step_index) + 1
            return int(step_index)
        s = state.step
        if self._counter is None:
            self._counter = int(s)  # blocking fetch, first call only
        else:
            try:
                ready = (
                    not hasattr(s, "is_ready")  # concrete host value
                    or s.is_ready()
                )
                if ready:
                    self._counter = int(s)  # free resync, value on host
            except Exception:
                pass
        step = self._counter
        self._counter += 1
        return step

    def _compute_np(self, step):
        """Pure numpy planning for one step index (runs on the worker)."""
        np = self._np
        noise = np.random.default_rng(
            [self.plan_seed, self.domain_tag, step]
        ).random(self.num_cells)
        ids_shuffle = np.argsort(noise)
        ids_restore_np = np.argsort(ids_shuffle)
        ids_keep_np = ids_shuffle[:self.len_keep]
        mask_np = np.ones(self.num_cells, np.float32)
        mask_np[ids_keep_np] = 0.0
        plans_np = self._build_swin_plans(
            mask_np.astype(bool),
            input_resolution=(self.input_resolution, self.input_resolution),
            window_size=self.window_size,
            cell_grid=self.cell_grid,
        )
        # pack on the worker too: one int32 buffer -> one transfer
        flat, layout = self._pack_plans_np(
            plans_np, ids_keep_np, mask_np, ids_restore_np
        )
        return flat, layout

    def _compute_xfer(self, step):
        """Numpy planning + host->device transfer on the worker thread: the
        per-step upload (~one int32 buffer through the axon relay) overlaps
        the previous step's device compute instead of riding the caller's
        critical path. JAX dispatch is thread-safe; the single-worker pool
        keeps uploads ordered."""
        import jax.numpy as jnp

        flat, layout = self._compute_np(step)
        return jnp.asarray(flat), layout

    def flat_layout(self, state, step_index=None):
        """(flat_device_buffer, layout) for this step — the fused handoff:
        the jitted train step unpacks the buffer in-trace
        (models/swin.py::unpack_plans_traced with ``layout`` static), so
        the per-step dispatch carries ONE extra array argument instead of a
        ~30-leaf plans pytree plus a separate unpack program."""
        step = self._resolve_step(state, step_index)
        if self._pool is not None:
            for s in range(step, step + self._prefetch + 1):
                if s not in self._pending:
                    self._pending[s] = self._pool.submit(
                        self._compute_xfer, s
                    )
            fut = self._pending.pop(step)
            # drop stale schedules after a resync jump
            for s in [s for s in self._pending if s <= step]:
                self._pending.pop(s).cancel()
            return fut.result()
        flat, layout = self._compute_np(step)
        import jax.numpy as jnp

        return jnp.asarray(flat), layout

    def __call__(self, state, batch_size, step_index=None):
        flat, layout = self.flat_layout(state, step_index)
        plans, ids_keep, mask, ids_restore = self._unpack_plans_on_device(
            flat, layout, batch_size
        )
        return plans, ids_keep, mask, ids_restore


def make_swin_rec_step(
    hub,
    *,
    cell_grid: int = 7,
    mask_ratio: float = 0.5,
    decoder_patch_size: int = 32,
    norm_pix_loss: bool = True,
    input_resolution: int = 56,
    window_size: int = 7,
    plan_seed: int = 0,
) -> Callable:
    """Stage-1 masked-modeling step for the sparse Swin backbone.

    The mask is shared across the batch (reference swin.py:158) and the
    grouping/merging plans are integer work, so both are computed on host
    per step (models/swin_plan.py); the jitted inner step takes them as
    static-shape inputs. Plans are bucketed so only a handful of group-count
    variants ever compile.
    """
    from eventpretrain_tpu.models.swin import unpack_plans_traced

    num_cells = cell_grid ** 2
    len_keep = int(num_cells * (1 - mask_ratio))

    # layout is static (hashable, one value per knapsack bucket) so the
    # in-trace unpack costs nothing at dispatch time; see
    # _HostCellMasker.flat_layout for why.
    @functools.partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
    def inner(state: TrainState, batch, flat, layout, rng):
        plans, ids_keep, mask, ids_restore = unpack_plans_traced(
            flat, layout, batch["evg"].shape[0]
        )

        def loss_fn(params):
            pred, *_ = state.apply_fn(
                {"params": params},
                batch["evg"],
                ids_keep,
                ids_restore,
                deterministic=False,
                plans=plans,
                method=hub.forward_rec,
                rngs={"dropout": rng},
            )
            return reconstruct_loss(
                pred, batch["frame"], mask,
                patch_size=decoder_patch_size,
                norm_pix_loss=norm_pix_loss, mask_ratio=mask_ratio,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, {"loss": loss, "grad_norm": global_grad_norm(grads)}

    masker = _HostCellMasker(
        plan_seed, _SWIN_REC_TAG, num_cells, len_keep,
        input_resolution=input_resolution, window_size=window_size,
        cell_grid=cell_grid,
    )

    def step(state: TrainState, batch, rng, step_index=None):
        flat, layout = masker.flat_layout(state, step_index)
        return inner(state, batch, flat, layout, rng)

    return step


def make_semseg_train_step(
    hub, *, num_classes: int, ignore_index=None,
    w_decode: float = 1.0, w_aux: float = 0.4, sample_mode: str = "bilinear",
) -> Callable:
    """Semantic-segmentation finetune step (reference
    ft_semseg_trainer.py:14-118): predictions resized to label resolution,
    loss = w_decode*(CE+Dice) + w_aux*(CE+Dice).

    batch = {'evg': (B,H,W,C), 'label': (B,Hl,Wl) int}.
    """
    from eventpretrain_tpu.objectives.semseg import semseg_loss
    from eventpretrain_tpu.ops.reshape import resize

    def loss_fn(params, state: TrainState, batch, rng):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        (emb_h, _, decode, aux), updates = state.apply_fn(
            variables, batch["evg"], train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        label = batch["label"]
        size = label.shape[1:3]
        decode = resize(decode, size, sample_mode)
        aux = resize(aux, size, sample_mode)
        d_ce, d_dice = semseg_loss(decode, label, num_classes, ignore_index)
        a_ce, a_dice = semseg_loss(aux, label, num_classes, ignore_index)
        loss = w_decode * (d_ce + d_dice) + w_aux * (a_ce + a_dice)
        return loss, (updates.get("batch_stats", {}), d_ce, d_dice)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng):
        (loss, (stats, d_ce, d_dice)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state, batch, rng)
        new_state = state.apply_gradients(grads, batch_stats=stats)
        return new_state, {
            "loss": loss, "decode_ce": d_ce, "decode_dice": d_dice,
            "grad_norm": global_grad_norm(grads),
        }

    return step


def make_semseg_eval_step(hub, *, num_classes: int, ignore_label=None,
                          sample_mode: str = "bilinear") -> Callable:
    """Returns the per-batch confusion matrix (reference
    ft_semseg_trainer.py:181-233 + semseg_metric.py); accumulate on host and
    reduce with eval.metrics.miou_from_confusion."""
    from eventpretrain_tpu.eval.metrics import confusion_matrix
    from eventpretrain_tpu.ops.reshape import resize

    @jax.jit
    def step(state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        _, _, decode, _ = state.apply_fn(
            variables, batch["evg"], train=False
        )
        label = batch["label"]
        decode = resize(decode, label.shape[1:3], sample_mode)
        pred = jnp.argmax(decode, axis=-1)
        svalid = _valid_row_mask(batch, pred.shape[0])
        if svalid is not None:
            svalid = svalid[:, None, None]
        return confusion_matrix(pred, label, num_classes, ignore_label,
                                valid=svalid)

    return step


def make_flow_train_step(
    hub, *, max_flow: float = 400.0,
    w_decode: float = 1.0, w_aux: float = 0.4, sample_mode: str = "bilinear",
) -> Callable:
    """Optical-flow finetune step (reference ft_flow_trainer.py:14-118).

    batch = {'evg', 'flow': (B,Hl,Wl,2), 'valid': (B,Hl,Wl)}.
    """
    from eventpretrain_tpu.objectives.flow import flow_l1_loss
    from eventpretrain_tpu.ops.reshape import resize_flow

    def loss_fn(params, state: TrainState, batch, rng):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        (emb_h, _, decode, aux), updates = state.apply_fn(
            variables, batch["evg"], train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        size = batch["flow"].shape[1:3]
        decode = resize_flow(decode, size, sample_mode)
        aux = resize_flow(aux, size, sample_mode)
        d_l1 = flow_l1_loss(decode, batch["flow"], batch["valid"], max_flow)
        a_l1 = flow_l1_loss(aux, batch["flow"], batch["valid"], max_flow)
        loss = w_decode * d_l1 + w_aux * a_l1
        return loss, (updates.get("batch_stats", {}), d_l1)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng):
        (loss, (stats, d_l1)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state, batch, rng)
        new_state = state.apply_gradients(grads, batch_stats=stats)
        return new_state, {
            "loss": loss, "decode_l1": d_l1,
            "grad_norm": global_grad_norm(grads),
        }

    return step


def make_flow_eval_step(hub, *, sample_mode: str = "bilinear",
                        sparse_mask: bool = True) -> Callable:
    """Per-batch (sum_epe, sum_outlier_flags, count) over the sparse mask
    (reference ft_flow_trainer.py:163-271 + flow_metric.py): valid pixels
    require gt validity AND per-pixel event presence (||voxel|| > 0 per
    pixel, derived from the network input and nearest-resized to the label
    resolution; pass an explicit batch['event_mask'] to override)."""
    from eventpretrain_tpu.ops.reshape import resize, resize_flow

    @jax.jit
    def step(state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        _, _, decode, _ = state.apply_fn(
            variables, batch["evg"], train=False
        )
        target = batch["flow"]
        decode = resize_flow(decode, target.shape[1:3], sample_mode)
        valid = (batch["valid"] >= 0.5)
        if "event_mask" in batch:
            valid = valid & (batch["event_mask"] > 0)
        elif sparse_mask:
            presence = (
                jnp.linalg.norm(batch["evg"], axis=-1) > 0
            ).astype(jnp.float32)[..., None]
            presence = resize(presence, target.shape[1:3], "nearest")[..., 0]
            valid = valid & (presence > 0)
        vmask = _valid_row_mask(batch, valid.shape[0])
        if vmask is not None:
            valid = valid & vmask[:, None, None]
        w = valid.astype(jnp.float32)
        epe = jnp.sqrt(((decode - target) ** 2).sum(-1))
        mag = jnp.sqrt((target ** 2).sum(-1))
        outlier = ((epe > 3.0) & (epe / jnp.maximum(mag, 1e-12) > 0.05))
        return {
            "epe_sum": (epe * w).sum(),
            "outlier_sum": (outlier.astype(jnp.float32) * w).sum(),
            "count": w.sum(),
        }

    return step


def make_ecdp_step(
    model,
    *,
    num_patches: int = 196,
    mask_ratio: float = 0.75,
    use_queue: bool = False,
    t_image: float = 0.1,
    t_event: float = 0.2,
    lambda_image: float = 1.0,
    lambda_event: float = 1.0,
    lambda_kl: float = 2.0,
    base_ema_momentum: float = 0.99,
    total_epochs: float = 100.0,
    steps_per_epoch: int = 1,
) -> Callable:
    """ECDP baseline pretrain step (reference pr_ecdp_trainer.py:15-95 +
    pr_ecdp_hub_model.py:236-274): two independently-masked views, EMA key
    encoder, image-InfoNCE vs CLIP, event-InfoNCE (no l2, vector-projected
    onto the clip direction), sinkhorn-KL; cosine EMA momentum schedule.

    batch = {'img_q': (B,H,W,C), 'img_k': (B,H,W,C), 'clip_emb': (B,512)}.
    state.ema_params holds the encoder subtree; state.queue holds a pair of
    SampleQueueStates (image, event) when use_queue.
    """
    from eventpretrain_tpu.objectives.ecdp import (
        ema_update,
        vector_project,
        sample_infonce_queue,
        global_sample_infonce,
        ecdp_kl_loss,
    )
    from eventpretrain_tpu.ops.masking import make_mask_from_noise

    len_keep = int(num_patches * (1 - mask_ratio))

    def loss_fn(params, state: TrainState, batch, ema_params, rng):
        rng_mq, rng_mk, rng_d1, rng_d2 = jax.random.split(rng, 4)
        b = batch["img_q"].shape[0]
        ids_keep_q, mask_q, _ = make_mask_from_noise(
            jax.random.uniform(rng_mq, (b, num_patches)), len_keep
        )
        ids_keep_k, mask_k, _ = make_mask_from_noise(
            jax.random.uniform(rng_mk, (b, num_patches)), len_keep
        )
        variables = {"params": params, "batch_stats": state.batch_stats}
        (q_event, q_image, clip_proj), updates = state.apply_fn(
            variables, batch["img_q"], ids_keep_q, batch["clip_emb"],
            train=True, mask=mask_q, method=model.forward_query,
            rngs={"dropout": rng_d1}, mutable=["batch_stats"],
        )
        # EMA key path: no gradients, batch-stat mutations discarded
        k_event, _ = state.apply_fn(
            {"params": {"encoder": ema_params},
             "batch_stats": state.batch_stats},
            batch["img_k"], ids_keep_k, train=True, mask=mask_k,
            method=model.forward_key,
            rngs={"dropout": rng_d2}, mutable=["batch_stats"],
        )
        k_event = jax.lax.stop_gradient(k_event)

        q_event_p = vector_project(q_event, clip_proj)
        k_event_p = vector_project(k_event, clip_proj)

        if use_queue:
            queue_image, queue_event = state.queue
            loss_image, queue_image = sample_infonce_queue(
                q_image, clip_proj, queue_image, t_image
            )
            loss_event, queue_event = sample_infonce_queue(
                q_event_p, k_event_p, queue_event, t_event, l2_norm=False
            )
            new_queue = (queue_image, queue_event)
        else:
            loss_image = global_sample_infonce(q_image, clip_proj, t_image)
            loss_event = global_sample_infonce(
                q_event_p, k_event_p, t_event, l2_norm=False
            )
            new_queue = state.queue
        loss_kl = ecdp_kl_loss(q_image, clip_proj, t_image)
        total = (
            lambda_image * loss_image
            + lambda_event * loss_event
            + lambda_kl * loss_kl
        )
        return total, (updates["batch_stats"], new_queue,
                       loss_image, loss_event, loss_kl)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng):
        from eventpretrain_tpu.objectives.ecdp import cosine_ema_momentum

        epoch_frac = state.step.astype(jnp.float32) / steps_per_epoch
        momentum = cosine_ema_momentum(
            base_ema_momentum, epoch_frac, total_epochs
        )
        new_ema = ema_update(
            state.params["encoder"], state.ema_params, momentum
        )
        (loss, (stats, new_queue, li, le, lk)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state, batch, new_ema, rng)
        new_state = state.apply_gradients(
            grads, batch_stats=stats, queue=new_queue, ema_params=new_ema
        )
        return new_state, {
            "loss": loss, "loss_image": li, "loss_event": le, "loss_kl": lk,
            "ema_momentum": momentum,
            "grad_norm": global_grad_norm(grads),
        }

    return step


def make_swin_rec_and_con_step(
    hub,
    *,
    cell_grid: int = 7,
    mask_ratio: float = 0.5,
    decoder_patch_size: int = 32,
    norm_pix_loss: bool = True,
    input_resolution: int = 56,
    window_size: int = 7,
    use_queue: bool = False,
    temperature: float = 0.07,
    plan_seed: int = 0,
    queue_mode: str = "global",
    mesh=None,
) -> Callable:
    """Combined rec+con step for the sparse Swin backbone (reference
    pr_rec_and_con_one_epoch with swin, pr_trainer.py:225-304)."""
    from eventpretrain_tpu.models.swin import unpack_plans_traced

    num_cells = cell_grid ** 2
    len_keep = int(num_cells * (1 - mask_ratio))

    @functools.partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
    def inner(state: TrainState, batch, flat, layout, rng):
        plans, ids_keep, mask, ids_restore = unpack_plans_traced(
            flat, layout, batch["evg"].shape[0]
        )

        def loss_fn(params):
            rng_d1, rng_d2 = jax.random.split(rng)
            pred, *_ = state.apply_fn(
                {"params": params}, batch["evg"], ids_keep, ids_restore,
                deterministic=False, plans=plans, method=hub.forward_rec,
                rngs={"dropout": rng_d1},
            )
            rec = reconstruct_loss(
                pred, batch["frame"], mask,
                patch_size=decoder_patch_size,
                norm_pix_loss=norm_pix_loss, mask_ratio=mask_ratio,
            )
            variables = {"params": params, "batch_stats": state.batch_stats}
            (q, k, *_), updates = state.apply_fn(
                variables, batch["evg"], batch["clip_emb"], train=True,
                method=hub.forward_con, rngs={"dropout": rng_d2},
                mutable=["batch_stats"],
            )
            if use_queue:
                con, new_queue = _queue_loss(
                    q, k, state.queue, temperature, queue_mode, mesh
                )
            else:
                con = global_token_infonce(q, k, temperature)
                new_queue = state.queue
            return rec + con, (updates["batch_stats"], new_queue, rec, con)

        (loss, (stats, new_queue, rec, con)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(
            grads, batch_stats=stats, queue=new_queue
        )
        return new_state, {
            "loss": loss, "rec_loss": rec, "con_loss": con,
            "grad_norm": global_grad_norm(grads),
        }

    masker = _HostCellMasker(
        plan_seed, _SWIN_REC_CON_TAG, num_cells, len_keep,
        input_resolution=input_resolution, window_size=window_size,
        cell_grid=cell_grid,
    )

    def step(state: TrainState, batch, rng, step_index=None):
        flat, layout = masker.flat_layout(state, step_index)
        return inner(state, batch, flat, layout, rng)

    return step


def forward_only(step: Callable) -> Callable:
    """Wrap a train step so it computes metrics but never updates state.

    Equivalent of the reference's ``--backward`` flag set false
    (main_pretrain.py:110-111, pr_trainer.py:51-56): forward-only dry runs
    for smoke-testing a config. Gradients still trace (the step is reused
    unchanged); only the returned state is the input state.

    Train steps jit with ``donate_argnums=(0,)``, so the wrapped step is fed
    a scratch copy: donating the caller's state and then returning it would
    hand back deleted buffers, and the next iteration dies on the TPU
    backend (CPU ignores donation, which is why only real-chip runs see it).
    """

    from eventpretrain_tpu.train.loop import accepts_step_index

    pass_index = accepts_step_index(step)

    def wrapped(state: TrainState, batch, rng, step_index=None):
        scratch = jax.tree.map(jnp.copy, state)
        if pass_index:
            _, metrics = step(scratch, batch, rng, step_index=step_index)
        else:
            _, metrics = step(scratch, batch, rng)
        return state, metrics

    wrapped._accepts_step_index = pass_index
    return wrapped
