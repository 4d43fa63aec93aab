"""Shape/behavior tests for ViT backbone + MAE decoder + objectives."""

import jax
import jax.numpy as jnp
import numpy as np

from eventpretrain_tpu.models.vit import vit_small_patch16
from eventpretrain_tpu.models.decoder import rec_decoder_small_patch16
from eventpretrain_tpu.ops import random_masking
from eventpretrain_tpu.objectives import (
    reconstruct_loss,
    init_queue,
    token_infonce_queue,
    global_token_infonce,
)


def _init_vit():
    model = vit_small_patch16()
    x = jnp.zeros((2, 224, 224, 5))
    variables = model.init(jax.random.key(0), x)
    return model, variables


class TestViT:
    def test_dense_shapes(self):
        model, variables = _init_vit()
        x = jnp.ones((2, 224, 224, 5))
        emb_l1, emb_l2, emb_h, out_embs, attn = model.apply(
            variables, x, method=model.encode_dense,
            return_attn=True, return_pyramid=True,
        )
        assert emb_l1.shape == (2, 196, 384)
        assert emb_h.shape == (2, 196, 384)
        assert len(out_embs) == 4
        assert all(o.shape == (2, 14, 14, 384) for o in out_embs)
        assert attn.shape == (2, 12, 196, 196)
        np.testing.assert_allclose(
            np.asarray(attn.sum(-1)), 1.0, rtol=1e-4
        )

    def test_masked_shapes(self):
        model, variables = _init_vit()
        x = jnp.ones((2, 224, 224, 5))
        ids_keep, mask, ids_restore = random_masking(
            jax.random.key(1), 2, 196, 0.75
        )
        emb_l1, emb_l2, emb_lh = model.apply(
            variables, x, ids_keep, method=model.encode_masked
        )
        assert emb_l1.shape == (2, 49, 384)
        assert emb_lh.shape == (2, 49, 384)

    def test_gather_first_embed_matches_embed_then_gather(self):
        # encode_masked embeds only the kept patches (gather BEFORE the
        # stride=kernel patch conv); must equal the reference order of
        # embed-all-then-gather (vit.py:110-115) bit-for-bit in f32
        model, variables = _init_vit()
        x = jnp.asarray(
            np.random.default_rng(3).normal(size=(2, 224, 224, 5)),
            jnp.float32,
        )
        ids_keep, _, _ = random_masking(jax.random.key(7), 2, 196, 0.75)

        def embed_then_gather(m):
            e = m._embed(x, True)
            return jnp.take_along_axis(
                e, ids_keep[..., None].astype(jnp.int32), axis=1
            )

        def gather_first(m):
            return m._embed_gathered(x, ids_keep, True)

        ref = model.apply(variables, method=embed_then_gather)
        got = model.apply(variables, method=gather_first)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_masked_path_consistent_with_dense(self):
        # with mask_ratio 0 (keep all), masked path == fused dense activations
        model, variables = _init_vit()
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 224, 224, 5)), jnp.float32
        )
        ids_keep = jnp.arange(196)[None, :]
        _, _, emb_lh = model.apply(
            variables, x, ids_keep, method=model.encode_masked
        )
        assert bool(jnp.isfinite(emb_lh).all())


class TestDecoderAndRecLoss:
    def test_end_to_end_rec(self):
        model, variables = _init_vit()
        dec = rec_decoder_small_patch16(frame_chans=1)
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 224, 224, 5)), jnp.float32
        )
        sub_frame = jnp.asarray(
            np.random.default_rng(1).normal(size=(2, 224, 224, 1)), jnp.float32
        )
        ids_keep, mask, ids_restore = random_masking(
            jax.random.key(2), 2, 196, 0.75
        )
        _, _, emb_lh = model.apply(
            variables, x, ids_keep, method=model.encode_masked
        )
        dvars = dec.init(jax.random.key(3), emb_lh, ids_restore)
        pred = dec.apply(dvars, emb_lh, ids_restore)
        assert pred.shape == (2, 196, 256)
        loss = reconstruct_loss(
            pred, sub_frame, mask,
            patch_size=16, norm_pix_loss=True, mask_ratio=0.75,
        )
        assert loss.shape == () and bool(jnp.isfinite(loss))

    def test_rec_loss_mask_weighting(self):
        # loss must only count masked patches
        pred = jnp.zeros((1, 4, 4))
        frame = jnp.ones((1, 4, 4, 1))  # 2x2 grid of 2x2 patches
        mask = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
        loss = reconstruct_loss(
            pred, frame, mask, patch_size=2, norm_pix_loss=False, mask_ratio=0.75
        )
        np.testing.assert_allclose(float(loss), 1.0)
        loss_all = reconstruct_loss(
            pred, frame, mask, patch_size=2, norm_pix_loss=False, mask_ratio=0.0
        )
        np.testing.assert_allclose(float(loss_all), 1.0)


class TestContrastive:
    def test_queue_loss_and_update(self):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(2, 8, 16)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(2, 8, 16)), jnp.float32)
        queue = init_queue(jax.random.key(0), 16, 8, 8)
        loss, new_queue = token_infonce_queue(q, k, queue)
        assert bool(jnp.isfinite(loss))
        assert int(new_queue.ptr) == 2
        # enqueued keys are the normalized k at slots 0:2
        k_norm = np.asarray(k / jnp.linalg.norm(k, axis=-1, keepdims=True))
        np.testing.assert_allclose(
            np.asarray(new_queue.buffer[:, :, 0:2]),
            k_norm.transpose(2, 1, 0),
            rtol=1e-5,
        )
        # ptr wraps
        for _ in range(3):
            loss, queue2 = token_infonce_queue(q, k, new_queue)
            new_queue = queue2
        assert int(new_queue.ptr) == 0

    def test_queue_loss_prefers_aligned_pairs(self):
        # identical q/k should give lower loss than random pairs
        rng = np.random.default_rng(1)
        v = jnp.asarray(rng.normal(size=(2, 8, 16)), jnp.float32)
        other = jnp.asarray(rng.normal(size=(2, 8, 16)), jnp.float32)
        queue = init_queue(jax.random.key(0), 16, 8, 64)
        aligned, _ = token_infonce_queue(v, v, queue)
        random_, _ = token_infonce_queue(v, other, queue)
        assert float(aligned) < float(random_)

    def test_global_infonce_diagonal(self):
        rng = np.random.default_rng(2)
        v = jnp.asarray(rng.normal(size=(4, 8, 16)), jnp.float32)
        aligned = global_token_infonce(v, v, temperature=0.07)
        shuffled = global_token_infonce(v, v[::-1], temperature=0.07)
        assert float(aligned) < float(shuffled)

    def test_global_infonce_sharded_matches_global(self, devices):
        # shard_map path with rank-offset labels == global-view computation
        from jax.sharding import Mesh, PartitionSpec as P
        from jax import shard_map

        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.normal(size=(8, 4, 16)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(8, 4, 16)), jnp.float32)
        global_loss = global_token_infonce(q, k)

        mesh = Mesh(np.array(devices), ("data",))
        fn = shard_map(
            lambda a, b: jax.lax.pmean(
                global_token_infonce(a, b, axis_name="data"), "data"
            ),
            mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=P(),
        )
        sharded_loss = fn(q, k)
        np.testing.assert_allclose(
            float(sharded_loss), float(global_loss), rtol=1e-5
        )
