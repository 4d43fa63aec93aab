"""Torch parity, part 2: sparse Swin, SwinECDDP, and the MAE decoder.

The reference sparse swin hardcodes the 224/49-cell geometry in its forward
(swin.py:201-246 and the zeros((2,49)) mask at :260), so these tests run the
REAL swin-T config on CPU — a few seconds per forward, batch <= 2.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests._torch_ref import load_reference, ref_args, sd_numpy, nhwc
from tests.test_torch_parity import (
    ATOL,
    assert_close,
    import_strict,
    rand_nchw,
    torch_seed,
)

load_reference()


def build_ref_swin(phase, pr_phase="rec"):
    from model.backbone.swin import swin_tiny_window7

    torch_seed()
    args = ref_args(phase=phase, pr_phase=pr_phase, backbone_type="swin")
    m = swin_tiny_window7(args, num_bins=5, mask_ratio=0.5,
                          drop_path_rate=0.0).eval()
    return m


def build_our_swin(**kw):
    from eventpretrain_tpu.models.swin import swin_tiny_window7

    return swin_tiny_window7(num_bins=5, **kw)


def test_sparse_swin_dense_parity():
    ref = build_ref_swin("finetune_cls")
    ours = build_our_swin(with_rec_decoders=False)
    x_t = rand_nchw(2, 5, 224, 224)
    with torch.no_grad():
        emb_l1, emb_l2, emb_l3, emb_l4, emb_h, attn = ref(x_t)

    x_j = jnp.asarray(nhwc(x_t))
    params = ours.init(jax.random.key(0), x_j,
                       method=ours.encode_dense)["params"]
    params = import_strict(sd_numpy(ref), params)
    o_l1, o_l2, o_h, _, _ = ours.apply(
        {"params": params}, x_j, method=ours.encode_dense
    )
    assert_close(o_l1, emb_l1.numpy(), name="stage1 tokens")
    assert_close(o_l2, emb_l2.numpy(), name="stage2 tokens")
    assert_close(o_h, emb_h.numpy(), name="emb_h")


def test_sparse_swin_masked_parity_density():
    """Masked path: same density-derived shared mask; the knapsack grouping,
    visible-token window attention, patch merging, stage decoders and fused
    emb_lh must all agree with the reference (swin.py:181-254)."""
    from eventpretrain_tpu.models.swin import (
        build_swin_plans,
        plans_to_device,
    )
    from eventpretrain_tpu.ops.masking import (
        make_mask_from_noise,
        masking_noise,
    )

    ref = build_ref_swin("pretrain", "rec")
    ours = build_our_swin(with_rec_decoders=True)
    x_t = rand_nchw(1, 5, 224, 224)
    with torch.no_grad():
        (r_l1, r_l2, r_l3, r_l4, r_lh, *_rest) = ref(x_t, mask=True)
    r_mask = _rest[4]

    x_j = jnp.asarray(nhwc(x_t))
    noise = masking_noise(jax.random.key(0), x_j, 32, "density")
    len_keep = int(49 * (1 - 0.5))
    ids_keep, mask, _ = make_mask_from_noise(noise, len_keep)
    np.testing.assert_array_equal(np.asarray(mask), r_mask.numpy())

    plans = plans_to_device(build_swin_plans(
        np.asarray(mask[0]).astype(bool),
        input_resolution=(56, 56), window_size=7, cell_grid=7,
    ))
    params = ours.init(jax.random.key(0), x_j, ids_keep, plans,
                       method=ours.encode_masked)["params"]
    params = import_strict(sd_numpy(ref), params)
    outs, emb_lh = ours.apply(
        {"params": params}, x_j, ids_keep, plans,
        method=ours.encode_masked,
    )
    assert_close(outs[0], r_l1.numpy(), name="stage1 visible tokens")
    assert_close(outs[1], r_l2.numpy(), name="stage2 visible tokens")
    assert_close(outs[2], r_l3.numpy(), name="stage3 visible tokens")
    assert_close(outs[3], r_l4.numpy(), name="stage4 visible tokens")
    assert_close(emb_lh, r_lh.numpy(), name="emb_lh fused")


def test_swin_ecddp_parity():
    from model.backbone.swin_ecddp import swin_ecddp_tiny_window7 as ref_fac

    from eventpretrain_tpu.models.swin_ecddp import swin_ecddp_tiny_window7

    torch_seed()
    args = ref_args(phase="finetune_semseg", backbone_type="swin_ecddp")
    ref = ref_fac(args=args, num_bins=5, drop_path_rate=0.0).eval()

    ours = swin_ecddp_tiny_window7(num_bins=5, drop_path_rate=0.0)
    x_t = rand_nchw(1, 5, 224, 224)
    with torch.no_grad():
        emb_l1, emb_l2, emb_l3, emb_l4, emb_h, out_embs, attn = ref(x_t)

    x_j = jnp.asarray(nhwc(x_t))
    params = ours.init(jax.random.key(0), x_j, method=ours.encode_dense,
                       return_pyramid=True)["params"]
    params = import_strict(sd_numpy(ref), params)
    o = ours.apply({"params": params}, x_j, method=ours.encode_dense,
                   return_pyramid=True)
    o_pyr = o[3]
    # the reference pyramid is the 4 per-index-normed maps (B, C, H, W)
    assert len(out_embs) == 4 == len(o_pyr)
    for i, (mine, theirs) in enumerate(zip(o_pyr, out_embs)):
        assert_close(mine, theirs.numpy().transpose(0, 2, 3, 1),
                     name=f"pyramid[{i}]")


def test_mae_decoder_parity():
    from functools import partial

    from model.pretrain.pr_rec_decoder import PrRecDecoder

    from eventpretrain_tpu.models.decoder import RecDecoder

    torch_seed()
    ref = PrRecDecoder(
        patch_size=8, num_patches=16, encoder_embed_dim=[64],
        embed_dim=32, depth=2, num_heads=4, mlp_ratio=[4.0],
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6), frame_chans=1,
    ).eval()

    ours = RecDecoder(
        patch_size=8, num_patches=16, embed_dim=32, depth=2, num_heads=4,
        frame_chans=1,
    )
    b, keep = 2, 4
    torch_seed()
    emb = torch.randn(b, keep, 64)
    perm = torch.stack([torch.randperm(16) for _ in range(b)])
    ids_restore = torch.argsort(perm, dim=1)
    with torch.no_grad():
        pred_t = ref(emb, ids_restore)

    emb_j = jnp.asarray(emb.numpy())
    restore_j = jnp.asarray(ids_restore.numpy().astype(np.int32))
    params = ours.init(jax.random.key(0), emb_j, restore_j)["params"]
    params = import_strict(sd_numpy(ref), params)
    pred_j = ours.apply({"params": params}, emb_j, restore_j)
    assert_close(pred_j, pred_t.numpy(), name="decoder pred")
