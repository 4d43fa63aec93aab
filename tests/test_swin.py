"""Sparse Swin tests: plans, knapsack parity, dense/masked forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eventpretrain_tpu.models.swin_plan import (
    knapsack,
    group_windows,
    make_group_plan,
    merge_plan,
    visible_coords,
    build_swin_plans,
    expand_group_plan,
)
from eventpretrain_tpu.models.swin import (
    SparseSwin,
    swin_tiny_window7,
    plans_to_device,
)


class TestPlanning:
    def test_knapsack_basics(self):
        best, idx = knapsack(49, [49])
        assert best == 49 and idx == [0]
        best, idx = knapsack(49, [21, 28, 9])
        assert best == 49 and sorted(idx) == [0, 1]
        # greedy grouping covers everything exactly once
        sizes, groups = group_windows(49, [49, 21, 28, 9, 12, 16])
        flat = sorted(i for g in groups for i in g)
        assert flat == list(range(6))
        assert sum(sizes) == 49 + 21 + 28 + 9 + 12 + 16
        assert all(s <= 49 for s in sizes)

    def test_visible_coords_mask_granularity(self):
        mask = np.zeros(49, bool)
        mask[0] = True  # remove top-left 8x8 cell of the 56x56 grid
        coords = visible_coords(mask, (56, 56), 7)
        assert coords.shape == (56 * 56 - 64, 2)
        assert not ((coords[:, 0] < 8) & (coords[:, 1] < 8)).any()

    def test_group_plan_full_grid_is_canonical_windows(self):
        coords = visible_coords(None, (28, 28), 7)
        plan = make_group_plan(coords, 7, 0)
        # 4x4 windows of exactly 49 tokens, no padding
        attn_mask, _ = expand_group_plan(plan, 7)
        assert attn_mask.shape == (16, 49, 49)
        assert (attn_mask == 0).all()  # all tokens in a group share a window
        # shuffle/unshuffle are inverse
        n = coords.shape[0]
        x = np.arange(n)
        shuffled = x[plan.idx_shuffle]
        restored = shuffled.reshape(-1)[plan.idx_unshuffle]
        np.testing.assert_array_equal(restored, x)

    def test_group_plan_shifted_has_masked_pairs(self):
        coords = visible_coords(None, (28, 28), 7)
        plan = make_group_plan(coords, 7, 3)
        attn_mask, _ = expand_group_plan(plan, 7)
        assert (attn_mask == -100).any()
        x = np.arange(coords.shape[0])
        restored = x[plan.idx_shuffle][plan.idx_unshuffle]
        np.testing.assert_array_equal(restored, x)

    def test_masked_plan_roundtrip(self):
        rng = np.random.default_rng(0)
        mask = np.zeros(49, bool)
        mask[rng.choice(49, 25, replace=False)] = True
        coords = visible_coords(mask, (56, 56), 7)
        assert coords.shape[0] == 24 * 64
        plan = make_group_plan(coords, 7, 0, pad_groups_to=48)
        x = np.arange(coords.shape[0])
        restored = x[plan.idx_shuffle][plan.idx_unshuffle]
        np.testing.assert_array_equal(restored, x)

    def test_merge_plan(self):
        coords = visible_coords(None, (4, 4), 1)
        child_idx, new_coords = merge_plan(coords, (4, 4))
        assert child_idx.shape == (4, 4)
        # first block children: tl=(0,0) idx0, bl=(1,0) idx4, tr=(0,1) idx1, br=(1,1) idx5
        np.testing.assert_array_equal(child_idx[0], [0, 4, 1, 5])
        np.testing.assert_array_equal(new_coords[0], [0, 0])

    def test_build_plans_masked_vs_dense(self):
        plans = build_swin_plans(None)
        assert len(plans) == 4
        assert plans[0].coords_flat.shape == (3136,)
        assert plans[3].coords_flat.shape == (49,)
        mask = np.zeros(49, bool)
        mask[np.random.default_rng(1).choice(49, 25, replace=False)] = True
        mplans = build_swin_plans(mask)
        assert mplans[0].coords_flat.shape == (24 * 64,)
        assert mplans[3].coords_flat.shape == (24,)


def tiny_swin(**kw):
    cfg = dict(
        input_size=64, patch_size=4, embed_dims=(16, 32, 64, 128),
        depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2), window_size=4,
        decoder_num_patches=4, num_bins=5,
    )
    cfg.update(kw)
    return SparseSwin(**cfg)


class TestSparseSwinModel:
    def test_dense_forward(self):
        model = tiny_swin(with_rec_decoders=False)
        x = jnp.ones((2, 64, 64, 5))
        variables = model.init(
            jax.random.key(0), x, method=model.encode_dense,
            return_pyramid=True,
        )
        _, _, emb_h, out_embs, _ = model.apply(
            variables, x, method=model.encode_dense, return_pyramid=True
        )
        assert emb_h.shape == (2, 4, 128)  # 16/2/2/2 -> 2x2 grid at stage 4
        assert [tuple(o.shape) for o in out_embs] == [
            (2, 16, 16, 16), (2, 8, 8, 32), (2, 4, 4, 64), (2, 2, 2, 128)
        ]

    def test_masked_forward(self):
        # 2x2 cell grid over 8x8 patches: cells of 4x4 patches
        model = tiny_swin()
        mask_cells = np.array([False, True, True, False])
        plans_np = build_swin_plans(
            mask_cells, input_resolution=(16, 16), num_stages=4, window_size=4,
            cell_grid=2,
        )
        plans = plans_to_device(plans_np)
        ids_keep = jnp.asarray([[0, 3], [0, 3]], jnp.int32)
        x = jnp.ones((2, 64, 64, 5))
        variables = model.init(
            jax.random.key(0), x, ids_keep, plans, method=model.encode_masked
        )
        outs, emb_lh = model.apply(
            variables, x, ids_keep, plans, method=model.encode_masked
        )
        assert emb_lh.shape == (2, 2, 128)
        assert outs[0].shape == (2, 128, 16)  # 2 cells x 64 visible patches
        assert bool(jnp.isfinite(emb_lh).all())

    def test_full_swin_tiny_dense_compiles(self):
        model = swin_tiny_window7(with_rec_decoders=False)
        x = jnp.ones((1, 224, 224, 5))
        variables = model.init(
            jax.random.key(0), x, method=model.encode_dense
        )
        _, _, emb_h, _, _ = model.apply(
            variables, x, method=model.encode_dense
        )
        assert emb_h.shape == (1, 49, 768)


class TestSwinTraining:
    def test_swin_rec_step_loss_decreases(self):
        from eventpretrain_tpu.models.pretrain_hub import PrHub
        from eventpretrain_tpu.models.decoder import RecDecoder
        from eventpretrain_tpu.train import build_optimizer, TrainState
        from eventpretrain_tpu.train.steps import make_swin_rec_step

        backbone = tiny_swin(name="backbone")
        decoder = RecDecoder(
            patch_size=32, num_patches=4, embed_dim=32, depth=1, num_heads=4,
            frame_chans=1, name="pretrain_rec_decoder",
        )
        hub = PrHub(backbone=backbone, decoder=decoder, embed_dim=128,
                    num_patches=4, mlp_dim=32, clip_emb_dim=16)
        rng = np.random.default_rng(0)
        evg = jnp.asarray(rng.normal(size=(2, 64, 64, 5)), jnp.float32)
        frame = jnp.asarray(rng.normal(size=(2, 64, 64, 1)), jnp.float32)

        mask_cells = np.array([False, True, True, False])
        plans = plans_to_device(build_swin_plans(
            mask_cells, input_resolution=(16, 16), num_stages=4,
            window_size=4, cell_grid=2,
        ))
        ids_keep = jnp.asarray([[0, 3], [0, 3]], jnp.int32)
        ids_restore = jnp.asarray([[0, 2, 3, 1], [0, 2, 3, 1]], jnp.int32)
        variables = hub.init(
            jax.random.key(0), evg, ids_keep, ids_restore, plans=plans,
            method=hub.forward_rec,
        )
        tx = build_optimizer(variables["params"], learning_rate=1e-3,
                             num_layers=4, backbone_type="swin")
        state = TrainState.create(
            apply_fn=hub.apply, params=variables["params"], tx=tx
        )
        step = make_swin_rec_step(
            hub, cell_grid=2, mask_ratio=0.5, decoder_patch_size=32,
            input_resolution=16, window_size=4,
        )
        key = jax.random.key(1)
        first = None
        for _ in range(8):
            key, sub = jax.random.split(key)
            state, metrics = step(state, {"evg": evg, "frame": frame}, sub)
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first

    def test_swin_cls_hub(self):
        from eventpretrain_tpu.models.cls_hub import FtClsHub

        hub = FtClsHub(
            backbone=tiny_swin(with_rec_decoders=False, name="backbone"),
            num_classes=3,
        )
        x = jnp.ones((2, 64, 64, 5))
        variables = hub.init(jax.random.key(0), x)
        _, logits, _ = hub.apply(variables, x)
        assert logits.shape == (2, 3)


def test_swin_rec_and_con_step():
    from eventpretrain_tpu.models.pretrain_hub import PrHub
    from eventpretrain_tpu.models.decoder import RecDecoder
    from eventpretrain_tpu.objectives import init_queue
    from eventpretrain_tpu.train import build_optimizer, TrainState
    from eventpretrain_tpu.train.steps import make_swin_rec_and_con_step

    backbone = tiny_swin(name="backbone")
    decoder = RecDecoder(
        patch_size=32, num_patches=4, embed_dim=32, depth=1, num_heads=4,
        frame_chans=1, name="pretrain_rec_decoder",
    )
    hub = PrHub(backbone=backbone, decoder=decoder, embed_dim=128,
                num_patches=4, mlp_dim=32, clip_emb_dim=16,
                clip_proj_conv=True)
    rng = np.random.default_rng(0)
    evg = jnp.asarray(rng.normal(size=(2, 64, 64, 5)), jnp.float32)
    frame = jnp.asarray(rng.normal(size=(2, 64, 64, 1)), jnp.float32)
    clip_emb = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)

    mask_cells = np.array([False, True, True, False])
    plans = plans_to_device(build_swin_plans(
        mask_cells, input_resolution=(16, 16), num_stages=4,
        window_size=4, cell_grid=2,
    ))
    ids_keep = jnp.asarray([[0, 3], [0, 3]], jnp.int32)
    ids_restore = jnp.asarray([[0, 2, 3, 1], [0, 2, 3, 1]], jnp.int32)
    rec_vars = hub.init(jax.random.key(0), evg, ids_keep, ids_restore,
                        plans=plans, method=hub.forward_rec)
    con_vars = hub.init(jax.random.key(0), evg, clip_emb,
                        method=hub.forward_con)
    from eventpretrain_tpu.train.state import merge_params

    params = merge_params(rec_vars["params"], con_vars["params"])
    tx = build_optimizer(params, learning_rate=1e-3, num_layers=4,
                         backbone_type="swin")
    queue = init_queue(jax.random.key(1), 128, 4, 8)
    state = TrainState.create(
        apply_fn=hub.apply, params=params,
        batch_stats=con_vars["batch_stats"], tx=tx, queue=queue,
    )
    step = make_swin_rec_and_con_step(
        hub, cell_grid=2, mask_ratio=0.5, decoder_patch_size=32,
        input_resolution=16, window_size=4, use_queue=True,
    )
    batch = {"evg": evg, "frame": frame, "clip_emb": clip_emb}
    state, m = step(state, batch, jax.random.key(2))
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["rec_loss"])) and np.isfinite(float(m["con_loss"]))


def test_pack_unpack_plans_roundtrip():
    """pack_plans_np + unpack_plans_on_device (one transfer + one device
    program per step) must reproduce plans_to_device + host tiling exactly."""
    import numpy as np
    import jax.numpy as jnp
    from eventpretrain_tpu.models.swin import (
        build_swin_plans, pack_plans_np, plans_to_device,
        unpack_plans_on_device,
    )

    rng = np.random.default_rng(0)
    mask = np.zeros(4, np.float32)
    mask[rng.permutation(4)[:2]] = 1.0
    plans_np = build_swin_plans(
        mask.astype(bool), input_resolution=(16, 16), num_stages=4,
        window_size=4, cell_grid=2,
    )
    ids_keep = np.where(mask == 0)[0].astype(np.int32)
    ids_restore = np.argsort(np.concatenate(
        [np.where(mask == 0)[0], np.where(mask == 1)[0]]
    )).astype(np.int32)

    flat, layout = pack_plans_np(plans_np, ids_keep, mask, ids_restore)
    plans_d, ik, mk, ir = unpack_plans_on_device(flat, layout, batch_size=3)

    ref_plans = plans_to_device(plans_np)
    for a, b in zip(jax.tree.leaves(plans_d), jax.tree.leaves(ref_plans)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ik.shape == (3, 2) and mk.shape == (3, 4) and ir.shape == (3, 4)
    np.testing.assert_array_equal(np.asarray(ik), np.tile(ids_keep, (3, 1)))
    np.testing.assert_array_equal(np.asarray(mk), np.tile(mask, (3, 1)))
    np.testing.assert_array_equal(
        np.asarray(ir), np.tile(ids_restore, (3, 1))
    )
    assert mk.dtype == jnp.float32
