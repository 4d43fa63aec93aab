"""Round-2 parallelism coverage: local-enqueue queue parity, dense batches
through ShardedPipeline, multi-host sharding arithmetic, swin mask schedule.

VERDICT round-1 items 4, 5, 9, 10.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eventpretrain_tpu.objectives.contrastive import (
    QueueState,
    init_local_queue,
    init_queue,
    token_infonce_queue,
    token_infonce_queue_local,
)
from eventpretrain_tpu.parallel import (
    HostShardedSource,
    ShardedPipeline,
    make_mesh,
    replicate,
    shard_batch,
)


class TestLocalQueue:
    """Reference DDP queue semantics (pr_hub_model.py:166): each rank keeps a
    full-length queue fed only with local keys."""

    def _qk(self, rng, n=16, l=4, c=8):
        q = jnp.asarray(rng.normal(size=(n, l, c)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(n, l, c)), jnp.float32)
        return q, k

    def test_equals_global_when_buffers_identical(self, devices, rng):
        """With every device's buffer identical to the global queue, the
        pmean of per-shard losses equals the global-batch queue loss (the
        per-shard CE mean over equal shards averages to the global mean)."""
        mesh = make_mesh(devices)
        q, k = self._qk(rng)
        gq = init_queue(jax.random.key(0), 8, 4, 32)
        bank = QueueState(
            buffer=jnp.broadcast_to(gq.buffer[None], (8,) + gq.buffer.shape),
            ptr=jnp.zeros((8,), jnp.int32),
        )
        loss_g, _ = token_infonce_queue(q, k, gq)
        loss_l, new_bank = jax.jit(
            lambda q, k, b: token_infonce_queue_local(q, k, b, mesh)
        )(q, k, bank)
        np.testing.assert_allclose(float(loss_l), float(loss_g), rtol=1e-6)
        assert new_bank.buffer.shape == (8, 8, 4, 32)

    def test_enqueues_only_local_keys(self, devices, rng):
        mesh = make_mesh(devices)
        q, k = self._qk(rng)
        bank = init_local_queue(jax.random.key(0), 8, 8, 4, 32)
        _, new_bank = jax.jit(
            lambda q, k, b: token_infonce_queue_local(q, k, b, mesh)
        )(q, k, bank)
        kn = np.asarray(k / jnp.linalg.norm(k, axis=-1, keepdims=True))
        buf = np.asarray(new_bank.buffer)
        # device d's ring buffer holds exactly its local shard (2 samples),
        # written at ptr 0..1, transposed to (C, L, B_loc)
        for d in range(8):
            local = kn[2 * d:2 * d + 2]          # (2, L, C)
            np.testing.assert_allclose(
                buf[d, :, :, 0:2], local.transpose(2, 1, 0), atol=1e-6
            )
        np.testing.assert_array_equal(np.asarray(new_bank.ptr), [2] * 8)

    def test_local_bank_differs_per_device(self):
        bank = init_local_queue(jax.random.key(0), 4, 8, 4, 16)
        b = np.asarray(bank.buffer)
        assert not np.allclose(b[0], b[1])  # per-rank init, like DDP

    def test_gradients_flow_through_local_loss(self, devices, rng):
        mesh = make_mesh(devices)
        q, k = self._qk(rng)
        bank = init_local_queue(jax.random.key(1), 8, 8, 4, 32)

        def loss_fn(q):
            loss, _ = token_infonce_queue_local(q, k, bank, mesh)
            return loss

        g = jax.jit(jax.grad(loss_fn))(q)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestShardedDenseBatches:
    """ShardedPipeline over dense batches: evg/label shard on 'data', scalar
    per-batch leaves (num_valid) replicate (VERDICT item 5)."""

    def test_dense_batch_shards_and_step_runs(self, devices, rng):
        from tests.test_dense_grid import tiny_backbone

        from eventpretrain_tpu.models.dense_hub import FtDenseHub
        from eventpretrain_tpu.train import TrainState, build_optimizer
        from eventpretrain_tpu.train.steps import (
            make_semseg_eval_step,
            make_semseg_train_step,
        )

        mesh = make_mesh(devices)
        backbone, num_bins, in_ch = tiny_backbone("vit_ecdp")
        hub = FtDenseHub(backbone=backbone, num_classes=5,
                         decode_in_channels=in_ch, decode_channels=16,
                         aux_channels=8)
        evg = jnp.asarray(rng.normal(size=(8, 32, 32, num_bins)), jnp.float32)
        label = jnp.asarray(rng.integers(0, 5, (8, 32, 32)), jnp.int32)
        variables = hub.init(jax.random.key(0), evg)
        tx = build_optimizer(variables["params"], learning_rate=1e-3,
                             num_layers=4, backbone_type="vit_ecdp")
        state = TrainState.create(
            apply_fn=hub.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}), tx=tx,
        )
        state = replicate(mesh, state)

        batch = {"evg": evg, "label": label,
                 "num_valid": jnp.asarray(6, jnp.int32)}
        pipe = ShardedPipeline([batch], mesh)
        out = next(iter(pipe))
        # evg/label sharded over 8 devices, num_valid replicated
        assert out["evg"].sharding.num_devices == 8
        assert not out["evg"].sharding.is_fully_replicated
        assert out["label"].sharding.num_devices == 8
        assert not out["label"].sharding.is_fully_replicated
        assert out["num_valid"].sharding.is_fully_replicated

        step = make_semseg_train_step(hub, num_classes=5)
        state, metrics = step(state, {"evg": out["evg"],
                                      "label": out["label"]},
                              jax.random.key(1))
        assert np.isfinite(float(metrics["loss"]))
        conf = make_semseg_eval_step(hub, num_classes=5)(
            state, {"evg": out["evg"], "label": out["label"]}
        )
        assert int(np.asarray(conf).sum()) == 8 * 32 * 32


class TestHostSharding:
    """Per-host slice arithmetic for multi-host (VERDICT item 9): host p of
    P sees items p, p+P, p+2P, ... — the DistributedSampler stride."""

    def test_strided_slices_cover_disjointly(self):
        class Src:
            def __len__(self):
                return 16

            def load(self, i):
                return i

        seen = []
        for p in range(4):
            hs = HostShardedSource(Src(), process_index=p, process_count=4)
            assert len(hs) == 4
            seen.extend(hs.load(i) for i in range(len(hs)))
        assert sorted(seen) == list(range(16))

    def test_maybe_initialize_noop_without_env(self, monkeypatch):
        from eventpretrain_tpu.parallel import maybe_initialize_distributed

        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
        assert maybe_initialize_distributed() is False

    def test_maybe_initialize_passes_env_topology(self, monkeypatch):
        """jax reads only JAX_COORDINATOR_ADDRESS from env; the helper must
        pass num_processes/process_id explicitly AND must not probe
        jax.process_count() first (that would initialize the XLA backend,
        which jax.distributed.initialize() forbids)."""
        import jax

        from eventpretrain_tpu.parallel import maybe_initialize_distributed

        calls = {}

        def fake_initialize(coordinator_address=None, num_processes=None,
                            process_id=None, **kw):
            calls.update(addr=coordinator_address, num=num_processes,
                         pid=process_id)

        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "host0:1234")
        monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
        monkeypatch.setenv("JAX_PROCESS_ID", "2")
        monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)

        def forbidden():  # the old bug: backend probe before initialize
            raise AssertionError("process_count() touched before initialize")

        monkeypatch.setattr(jax, "process_count", forbidden)
        assert maybe_initialize_distributed(verbose=False) is True
        assert calls == {"addr": "host0:1234", "num": 4, "pid": 2}

    def test_maybe_initialize_idempotent_on_repeat_call(self, monkeypatch):
        """jax 0.9's repeat-call error says 'should only be called once.'
        (not 'already ...'); the helper must treat it as success."""
        import jax

        from eventpretrain_tpu.parallel import maybe_initialize_distributed

        def raise_once(**kw):
            raise RuntimeError(
                "distributed.initialize should only be called once."
            )

        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "host0:1234")
        monkeypatch.setattr(jax.distributed, "initialize", raise_once)
        assert maybe_initialize_distributed(verbose=False) is True


class TestSwinMaskSchedule:
    """Pin the host-RNG swin mask contract (VERDICT item 10 + advisor):
    seed changes the schedule, resume reproduces it, rec and rec+con draw
    from distinct domains, and an explicit step_index overrides the
    counter."""

    def _masker(self, seed, tag=None):
        from eventpretrain_tpu.train.steps import (
            _SWIN_REC_TAG,
            _HostCellMasker,
        )

        # cells must stay >=1 patch through every 2x2 merge: 32-patch grid
        # with a 4x4 cell grid keeps cells 8x8 -> 4x4 -> 2x2 -> 1x1 aligned
        return _HostCellMasker(
            seed, _SWIN_REC_TAG if tag is None else tag, 16, 8,
            input_resolution=32, window_size=4, cell_grid=4,
        )

    class _FakeState:
        def __init__(self, step):
            self.step = step

    def test_seed_changes_schedule(self):
        m0 = self._masker(0)
        m1 = self._masker(1)
        _, k0, *_ = m0(self._FakeState(0), 2)
        _, k1, *_ = m1(self._FakeState(0), 2)
        assert not np.array_equal(np.asarray(k0), np.asarray(k1))

    def test_resume_reproduces_midrun_schedule(self):
        m = self._masker(0)
        masks = [np.asarray(m(self._FakeState(i), 2)[2]) for i in range(6)]
        # fresh masker resuming at step 3 replays the same tail
        m2 = self._masker(0)
        for i in range(3, 6):
            np.testing.assert_array_equal(
                np.asarray(m2(self._FakeState(i), 2)[2]), masks[i]
            )

    def test_explicit_step_index_overrides(self):
        m = self._masker(0)
        ref = np.asarray(m(self._FakeState(5), 2)[2])
        m2 = self._masker(0)
        got = np.asarray(m2(self._FakeState(999), 2, step_index=5)[2])
        np.testing.assert_array_equal(got, ref)

    def test_rec_and_reccon_domains_differ(self):
        from eventpretrain_tpu.train.steps import (
            _SWIN_REC_CON_TAG,
            _SWIN_REC_TAG,
        )

        a = self._masker(0, _SWIN_REC_TAG)
        b = self._masker(0, _SWIN_REC_CON_TAG)
        ka = np.asarray(a(self._FakeState(0), 2)[2])
        kb = np.asarray(b(self._FakeState(0), 2)[2])
        assert not np.array_equal(ka, kb)

    def test_out_of_lockstep_resyncs_when_ready(self):
        """A warm-up call with discarded state must not shift the schedule
        once state.step is readable again (advisor round-1 medium)."""
        m = self._masker(0)
        ref = [np.asarray(self._masker(0)(self._FakeState(i), 2)[2])
               for i in range(4)]
        m(self._FakeState(0), 2)          # warm-up, state discarded
        m(self._FakeState(0), 2)          # counter now drifted to 2
        # concrete ints are always "ready" -> masker resyncs to truth
        got = np.asarray(m(self._FakeState(1), 2)[2])
        np.testing.assert_array_equal(got, ref[1])


class TestMultiHostBatchAssembly:
    """Multi-host DP: per-host local batches must be glued with
    make_array_from_process_local_data (a plain device_put onto a
    multi-host sharding asserts cross-process equality), the scalar
    num_valid tail marker must become a per-row mask (each host's pads sit
    at the end of its own slice), and the per-host batch size must be
    global/process_count so epochs cover the whole dataset."""

    def test_local_batch_size(self, monkeypatch):
        from eventpretrain_tpu.parallel import local_batch_size

        assert local_batch_size(64) == 64  # single host: identity
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        assert local_batch_size(64) == 16
        with pytest.raises(AssertionError):
            local_batch_size(30)

    def test_shard_batch_multihost_routing(self, devices, monkeypatch):
        from eventpretrain_tpu.parallel import mesh as mesh_mod

        mesh = make_mesh(devices)
        calls = {"local": [], "put": []}

        def fake_from_local(sharding, x):
            # routing test only: a real multi-host run would glue the 2
            # hosts' 4-row slices into the global 8-row array
            calls["local"].append(np.asarray(x).shape)
            return jnp.asarray(x)

        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(
            jax, "make_array_from_process_local_data", fake_from_local
        )
        batch = {
            "evg": np.zeros((4, 8, 8, 5), np.float32),
            "label": np.zeros((4,), np.int32),
            "num_valid": jnp.asarray(3, jnp.int32),
        }
        out = shard_batch(mesh, batch)
        # num_valid rewritten to a per-row mask of the LOCAL rows
        assert "num_valid" not in out
        np.testing.assert_array_equal(
            np.asarray(out["valid_rows"]), [True, True, True, False]
        )
        # both row-leading leaves + the mask went through the local-data path
        assert sorted(calls["local"]) == [(4,), (4,), (4, 8, 8, 5)]

    def test_valid_rows_mask_equals_num_valid(self, rng):
        """Eval steps weight pads identically through either convention."""
        from eventpretrain_tpu.models.cls_hub import cls_hub_vit_small
        from eventpretrain_tpu.train import build_optimizer, TrainState
        from eventpretrain_tpu.train.steps import make_cls_eval_step

        hub = cls_hub_vit_small(
            num_classes=3, input_size=32, depth=1,
            out_indices=(0,), masked_taps=(0, 0), dense_taps=(0, 0),
        )
        evg = jnp.asarray(rng.normal(size=(4, 32, 32, 5)), jnp.float32)
        label = jnp.asarray([0, 1, 2, 0], jnp.int32)
        variables = hub.init(jax.random.key(0), evg[:1])
        tx = build_optimizer(variables["params"], learning_rate=1e-3)
        state = TrainState.create(
            apply_fn=hub.apply, params=variables["params"], tx=tx
        )
        step = make_cls_eval_step(hub)
        m_scalar = step(state, {"evg": evg, "label": label,
                                "num_valid": jnp.asarray(3, jnp.int32)})
        m_mask = step(state, {"evg": evg, "label": label,
                              "valid_rows": jnp.asarray(
                                  [True, True, True, False])})
        for k in m_scalar:
            np.testing.assert_allclose(
                float(m_scalar[k]), float(m_mask[k]), rtol=1e-6
            )
