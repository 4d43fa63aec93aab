"""Round-3 parallel-semantics tests: BN scope, local-queue divergence,
loop-owned step indices.

Covers VERDICT round-2 items 3 (``--bn_scope`` per-device BatchNorm parity +
the local-queue multi-step divergence pin) and 6 (the production loop passes
the authoritative swin step index; the is_ready() heuristic never fires).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eventpretrain_tpu.models.layers import GroupedBatchNorm, ProjectorMlp
from eventpretrain_tpu.objectives.contrastive import (
    QueueState,
    init_local_queue,
    init_queue,
    token_infonce_queue,
    token_infonce_queue_local,
)


def make_mesh8():
    return Mesh(np.array(jax.devices()[:8]), ("data",))


# ---------------------------------------------------------------------------
# GroupedBatchNorm: scope semantics
# ---------------------------------------------------------------------------


def test_grouped_bn_single_group_equals_flax_bn():
    """groups=1 must reproduce the previous nn.BatchNorm behavior exactly
    (same normalization, same running-stat update rule)."""
    import flax.linen as nn

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((32, 16)).astype(np.float32))

    gbn = GroupedBatchNorm(groups=1)
    ref = nn.BatchNorm(use_running_average=False, axis=-1, momentum=0.99,
                       epsilon=1e-5, dtype=jnp.float32)

    v_g = gbn.init(jax.random.key(0), x, True)
    v_r = ref.init(jax.random.key(0), x)
    out_g, upd_g = gbn.apply(v_g, x, True, mutable=["batch_stats"])
    out_r, upd_r = ref.apply(v_r, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_r),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(upd_g["batch_stats"]["mean"]),
        np.asarray(upd_r["batch_stats"]["mean"]), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(upd_g["batch_stats"]["var"]),
        np.asarray(upd_r["batch_stats"]["var"]), atol=1e-6,
    )


def test_grouped_bn_matches_per_shard_bn():
    """groups=G: each contiguous row block is normalized with ITS OWN
    statistics — identical to running plain BN on each block separately
    (= torch DDP per-rank BatchNorm)."""
    G, rows, feat = 4, 40, 8
    rng = np.random.default_rng(1)
    # give each group a different distribution so global stats would differ
    x = np.concatenate([
        rng.standard_normal((rows // G, feat)) * (g + 1) + 3 * g
        for g in range(G)
    ]).astype(np.float32)

    gbn = GroupedBatchNorm(groups=G)
    v = gbn.init(jax.random.key(0), jnp.asarray(x), True)
    out, _ = gbn.apply(v, jnp.asarray(x), True, mutable=["batch_stats"])

    one = GroupedBatchNorm(groups=1)
    v1 = one.init(jax.random.key(0), jnp.asarray(x[: rows // G]), True)
    for g in range(G):
        blk = jnp.asarray(x[g * rows // G: (g + 1) * rows // G])
        out_g, _ = one.apply(v1, blk, True, mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(out)[g * rows // G: (g + 1) * rows // G],
            np.asarray(out_g), atol=1e-5,
            err_msg=f"group {g}",
        )
    # and global stats genuinely differ from per-group normalization
    out_global, _ = gbn.apply(
        {"params": v["params"], "batch_stats": v["batch_stats"]},
        jnp.asarray(x), True, mutable=["batch_stats"],
    )
    glob = GroupedBatchNorm(groups=1)
    out_1, _ = glob.apply(v, jnp.asarray(x), True, mutable=["batch_stats"])
    assert np.abs(np.asarray(out_global) - np.asarray(out_1)).max() > 0.1


def test_projector_bn_local_matches_reference_ddp():
    """ProjectorMlp(bn_groups=D) on the stacked global batch must equal the
    reference _build_mlp_2d run separately per rank on each local batch
    (reference mlp_head.py:4-23 under DDP: per-rank BN statistics).
    Weights are imported from the actual reference module."""
    torch = pytest.importorskip("torch")

    from tests._torch_ref import load_reference

    load_reference()
    from model.sub_module.mlp_head import _build_mlp_2d

    from eventpretrain_tpu.ckpt.torch_import import import_torch_params

    import flax.linen as nn

    D, local_b, L, C = 4, 3, 6, 16
    torch.manual_seed(0)
    ref = _build_mlp_2d(3, C, 32, C).train()

    rng = np.random.default_rng(2)
    x = rng.standard_normal((D * local_b, L, C)).astype(np.float32)

    class Wrap(nn.Module):
        # the importer's fc/bn -> Sequential-index mapping keys on the
        # projector field names used by the hub (torch_import.py)
        def setup(self):
            self.emb_h_proj = ProjectorMlp(
                num_layers=3, mlp_dim=32, out_dim=C, bn_groups=D,
                name="emb_h_proj",
            )

        def __call__(self, x, train):
            return self.emb_h_proj(x, train)

    ours = Wrap()
    v = ours.init(jax.random.key(0), jnp.asarray(x), True)
    params, missing, unused = import_torch_params(
        {"emb_h_proj." + k: np.asarray(p.detach().numpy())
         for k, p in ref.state_dict().items()},
        v["params"], verbose=False,
    )
    # params only: running stats live in batch_stats (train mode ignores
    # them) and num_batches_tracked has no flax counterpart
    assert missing == []
    assert all("num_batches_tracked" in u or "running_" in u for u in unused)

    out, _ = ours.apply(
        {"params": params, "batch_stats": v["batch_stats"]},
        jnp.asarray(x), True, mutable=["batch_stats"],
    )

    # reference DDP: each rank runs the BN dance on its LOCAL batch
    # (pr_hub_model.py:223-229 emb2patch_frame -> BatchNorm2d -> back)
    h = w = int(L ** 0.5) if int(L ** 0.5) ** 2 == L else None
    for d in range(D):
        xt = torch.from_numpy(x[d * local_b: (d + 1) * local_b])
        y = xt
        for module in ref:
            if isinstance(module, torch.nn.BatchNorm2d):
                # tokens (B, L, C) -> (B, C, L, 1) so BN2d normalizes over
                # (B, L), identical to the reference's emb2patch_frame dance
                # for any token count
                y = module(y.permute(0, 2, 1).unsqueeze(-1))
                y = y.squeeze(-1).permute(0, 2, 1)
            else:
                y = module(y)
        np.testing.assert_allclose(
            np.asarray(out)[d * local_b: (d + 1) * local_b],
            y.detach().numpy(), atol=2e-4, rtol=2e-3,
            err_msg=f"rank {d}",
        )


def test_projector_bn_scopes_diverge_multistep(devices):
    """Sanity: with per-group distributions, local vs global BN scope give
    different projector outputs on the same sharded batch — the two modes
    are genuinely different programs, not a config no-op."""
    mesh = make_mesh8()
    D, local_b, L, C = 8, 2, 4, 8
    rng = np.random.default_rng(3)
    x = np.concatenate([
        rng.standard_normal((local_b, L, C)) * (1 + 0.5 * g)
        for g in range(D)
    ]).astype(np.float32)
    xj = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P("data"))
    )

    local = ProjectorMlp(num_layers=2, mlp_dim=16, out_dim=C, bn_groups=D)
    glob = ProjectorMlp(num_layers=2, mlp_dim=16, out_dim=C, bn_groups=1)
    v = local.init(jax.random.key(0), xj, True)
    out_l, _ = local.apply(v, xj, True, mutable=["batch_stats"])
    out_g, _ = glob.apply(v, xj, True, mutable=["batch_stats"])
    assert np.abs(np.asarray(out_l) - np.asarray(out_g)).max() > 1e-3


# ---------------------------------------------------------------------------
# local queue: multi-step divergence (round-2 weak item 6)
# ---------------------------------------------------------------------------


def test_local_queue_multistep_matches_per_device_simulation(devices):
    """Run the shard_map local-queue loss for 3 steps and pin it against a
    sequential per-device simulation of the reference's DDP semantics: rank
    d runs token_infonce_queue on its own (queue_d, q_d, k_d), losses are
    averaged (DDP gradient mean). This pins the N-x-history divergence
    itself, not just the identical-buffer boundary case."""
    mesh = make_mesh8()
    D, local_b, L, C, K = 8, 2, 4, 8, 16
    rng = np.random.default_rng(4)

    queue = init_local_queue(jax.random.key(1), D, C, L, K)
    sim_queues = [
        QueueState(buffer=jnp.asarray(queue.buffer[d]),
                   ptr=jnp.asarray(queue.ptr[d]))
        for d in range(D)
    ]
    shard = NamedSharding(mesh, P("data"))
    queue = QueueState(
        buffer=jax.device_put(queue.buffer, shard),
        ptr=jax.device_put(queue.ptr, shard),
    )

    for step in range(3):
        q = rng.standard_normal((D * local_b, L, C)).astype(np.float32)
        k = rng.standard_normal((D * local_b, L, C)).astype(np.float32)
        qj = jax.device_put(jnp.asarray(q), shard)
        kj = jax.device_put(jnp.asarray(k), shard)
        loss, queue = token_infonce_queue_local(qj, kj, queue, mesh)

        sim_losses = []
        for d in range(D):
            ld, sim_queues[d] = token_infonce_queue(
                jnp.asarray(q[d * local_b: (d + 1) * local_b]),
                jnp.asarray(k[d * local_b: (d + 1) * local_b]),
                sim_queues[d],
            )
            sim_losses.append(float(ld))
        np.testing.assert_allclose(
            float(loss), np.mean(sim_losses), rtol=1e-5,
            err_msg=f"step {step}",
        )
        for d in range(D):
            np.testing.assert_allclose(
                np.asarray(queue.buffer[d]),
                np.asarray(sim_queues[d].buffer), atol=1e-6,
            )


def test_local_and_global_queue_diverge_after_first_step(devices):
    """The scopes must DIVERGE once enqueues differ: identical initial
    buffers give equal step-1 losses, but from step 2 the global queue holds
    the global batch where each local queue holds only its own keys."""
    mesh = make_mesh8()
    D, local_b, L, C, K = 8, 2, 4, 8, 16
    rng = np.random.default_rng(5)
    shard = NamedSharding(mesh, P("data"))

    base = init_queue(jax.random.key(2), C, L, K)
    local = QueueState(
        buffer=jax.device_put(
            jnp.tile(base.buffer[None], (D, 1, 1, 1)), shard
        ),
        ptr=jax.device_put(jnp.zeros((D,), jnp.int32), shard),
    )
    glob = base

    losses = {"local": [], "global": []}
    for step in range(3):
        q = rng.standard_normal((D * local_b, L, C)).astype(np.float32)
        k = rng.standard_normal((D * local_b, L, C)).astype(np.float32)
        l_loc, local = token_infonce_queue_local(
            jax.device_put(jnp.asarray(q), shard),
            jax.device_put(jnp.asarray(k), shard),
            local, mesh,
        )
        l_glob, glob = token_infonce_queue(
            jnp.asarray(q), jnp.asarray(k), glob
        )
        losses["local"].append(float(l_loc))
        losses["global"].append(float(l_glob))

    np.testing.assert_allclose(
        losses["local"][0], losses["global"][0], rtol=1e-5
    )  # step 1: same buffers -> same loss
    assert abs(losses["local"][1] - losses["global"][1]) > 1e-4
    assert abs(losses["local"][2] - losses["global"][2]) > 1e-4


# ---------------------------------------------------------------------------
# loop-owned step indices (round-2 weak item 4 / next-round item 6)
# ---------------------------------------------------------------------------


def test_train_one_epoch_passes_step_index():
    """The loop passes its own step counter to steps that accept one, offset
    by the restored state.step — the masker's resync heuristic never fires
    in loop-driven runs."""
    from eventpretrain_tpu.train.loop import train_one_epoch

    calls = []

    class _State:
        step = 5

    def step(state, batch, rng, step_index=None):
        calls.append(step_index)
        return state, {"loss": jnp.float32(0.0)}

    train_one_epoch(
        step=step, state=_State(), pipeline=[{}, {}, {}],
        rng_key=jax.random.key(0),
    )
    assert calls == [5, 6, 7]


def test_train_one_epoch_plain_step_unchanged():
    from eventpretrain_tpu.train.loop import train_one_epoch

    calls = []

    class _State:
        step = 0

    def step(state, batch, rng):
        calls.append(1)
        return state, {"loss": jnp.float32(0.0)}

    train_one_epoch(step=step, state=_State(), pipeline=[{}, {}],
                    rng_key=jax.random.key(0))
    assert calls == [1, 1]


def test_forward_only_forwards_step_index():
    from eventpretrain_tpu.train.loop import accepts_step_index
    from eventpretrain_tpu.train.steps import forward_only

    seen = []

    def step(state, batch, rng, step_index=None):
        seen.append(step_index)
        return state, {"loss": jnp.float32(0.0)}

    wrapped = forward_only(step)
    assert accepts_step_index(wrapped)
    state = {"p": jnp.zeros(())}
    out_state, _ = wrapped(state, {}, jax.random.key(0), step_index=9)
    assert seen == [9]
    assert out_state is state


def test_swin_masker_heuristic_never_fires_under_loop(monkeypatch):
    """CLI-driven swin pretraining goes through train_one_epoch, which must
    hand every step an explicit index: instrument _resolve_step and assert
    the heuristic branch (step_index=None) is never taken."""
    from eventpretrain_tpu.train import steps as steps_mod
    from eventpretrain_tpu.train.loop import train_one_epoch

    resolved = []
    real = steps_mod._HostCellMasker._resolve_step

    def spy(self, state, step_index):
        resolved.append(step_index)
        return real(self, state, step_index)

    monkeypatch.setattr(steps_mod._HostCellMasker, "_resolve_step", spy)

    masker_calls = []

    class _State:
        step = 3

    masker = steps_mod._HostCellMasker(
        0, 7, 49, 24, input_resolution=56, window_size=7, cell_grid=7,
        prefetch=0,
    )

    def step(state, batch, rng, step_index=None):
        flat, layout = masker.flat_layout(state, step_index)
        masker_calls.append((step_index, layout is not None))
        return state, {"loss": jnp.float32(0.0)}

    train_one_epoch(step=step, state=_State(), pipeline=[{}, {}],
                    rng_key=jax.random.key(0))
    assert resolved == [3, 4]
    assert all(si is not None for si, _ in masker_calls)
