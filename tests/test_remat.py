"""use_remat (--use_checkpoint): jax.checkpoint-wrapped blocks must compute
the same outputs/losses as the plain blocks (gradients agree up to f32
recompute reassociation). TPU-native equivalent of the reference's
torch.utils.checkpoint flag (swin.py:36, swin_ecddp.py:34, threaded from
--use_checkpoint on every main)."""

import numpy as np
import jax
import jax.numpy as jnp

from eventpretrain_tpu.models.vit import ViT
from eventpretrain_tpu.models.convvit import convvit_small_patch16
from eventpretrain_tpu.models.vit_ecdp import vit_ecdp_small_patch16
from eventpretrain_tpu.models.vit_mem import vit_mem_small_patch16
from eventpretrain_tpu.models.swin import SparseSwin


def _x(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape), jnp.float32
    )


def test_vit_remat_matches_loss_and_grads():
    x = _x((2, 64, 64, 5))
    ids = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], jnp.int32)
    results = {}
    for remat in (False, True):
        vit = ViT(input_size=64, patch_size=16, embed_dim=128, depth=4,
                  num_heads=4, use_remat=remat, name="backbone")
        params = vit.init(jax.random.key(0), x, ids,
                          method=vit.encode_masked)

        def loss(p):
            outs = vit.apply(p, x, ids, method=vit.encode_masked)
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

        l, g = jax.value_and_grad(loss)(params)
        results[remat] = (float(l), g)
    np.testing.assert_allclose(results[False][0], results[True][0],
                               rtol=1e-6)
    for (_, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(results[False][1]),
        jax.tree_util.tree_leaves_with_path(results[True][1]),
    ):
        # recompute reorders f32 accumulation; value-level equality only
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


def test_vit_remat_dense_with_attn():
    x = _x((1, 64, 64, 5))
    vit = ViT(input_size=64, patch_size=16, embed_dim=128, depth=2,
              num_heads=4, out_indices=(0, 1), use_remat=True,
              name="backbone")
    params = vit.init(jax.random.key(0), x, method=vit.encode_dense)
    out = vit.apply(params, x, method=vit.encode_dense, return_attn=True,
                    return_pyramid=True)
    assert out[4].shape == (1, 4, 16, 16)


def _forward_pair(build, apply_fn):
    outs = []
    for remat in (False, True):
        model = build(remat)
        params = None
        out, params = apply_fn(model)
        outs.append(out)
    for a, b in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_convvit_remat_matches():
    x = _x((1, 64, 64, 5))

    def build(remat):
        return convvit_small_patch16(
            input_size=64, use_remat=remat, with_rec_decoders=False,
            name="backbone",
        )

    def run(m):
        params = m.init(jax.random.key(0), x, method=m.encode_dense)
        return m.apply(params, x, method=m.encode_dense)[2], params

    _forward_pair(build, run)


def test_vit_ecdp_and_mem_remat_match():
    x2 = _x((1, 64, 64, 2))
    for factory, xx, kw in (
        (vit_ecdp_small_patch16, x2, {}),
        (vit_mem_small_patch16, _x((1, 64, 64, 3)), {}),
    ):
        outs = []
        for remat in (False, True):
            m = factory(input_size=64, depth=2, out_indices=(0, 1),
                        use_remat=remat, name="backbone", **kw)
            params = m.init(jax.random.key(0), xx, method=m.encode_dense)
            out = m.apply(params, xx, method=m.encode_dense)
            outs.append(jax.tree.leaves(out))
        for a, b in zip(outs[0], outs[1]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


def test_sparse_swin_remat_matches():
    x = _x((2, 64, 64, 5))
    outs = []
    for remat in (False, True):
        m = SparseSwin(
            input_size=64, patch_size=4, embed_dims=(16, 32, 64, 128),
            depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2), window_size=4,
            decoder_num_patches=4, num_bins=5, with_rec_decoders=False,
            use_remat=remat,
        )
        params = m.init(jax.random.key(0), x, method=m.encode_dense,
                        return_pyramid=True)
        out = m.apply(params, x, method=m.encode_dense, return_pyramid=True)
        outs.append([out[2]] + list(out[3]))
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
