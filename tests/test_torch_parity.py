"""Checkpoint-level numerical parity against the ACTUAL reference modules.

For every backbone family: instantiate the reference torch module
(/root/reference/model/) at a tiny config on CPU, export its state dict,
import it into the matching flax model via ckpt.torch_import, and assert
forward-output agreement at f32 (<=1e-4). This converts the "same param
surface" claim into evidence for the ±0.3% finetune north star
(BASELINE.md) without needing released weights.

Every import also asserts ZERO missing flax params and ZERO unused torch
keys (buffers aside) — the strict contract the torch importer must meet on
real released checkpoints.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from eventpretrain_tpu.ckpt.torch_import import import_torch_params

from tests._torch_ref import load_reference, ref_args, sd_numpy, nhwc

load_reference()

ATOL = 1e-4


def torch_seed():
    torch.manual_seed(0)


def import_strict(sd, params, prefix=""):
    new_params, missing, unused = import_torch_params(
        sd, params, prefix=prefix, verbose=False
    )
    assert missing == [], f"flax params without torch source: {missing}"
    assert unused == [], f"unmapped torch keys: {unused}"
    return new_params


def import_variables_strict(sd, variables):
    """Import params + batch_stats from one torch state dict; every torch
    key must land in exactly one of the two trees."""
    new_params, missing_p, unused_p = import_torch_params(
        sd, variables["params"], verbose=False
    )
    new_stats, missing_s, unused_s = import_torch_params(
        sd, variables["batch_stats"], verbose=False
    )
    assert missing_p == [] and missing_s == [], (missing_p, missing_s)
    leftover = set(unused_p) & set(unused_s)
    assert not leftover, f"unmapped torch keys: {sorted(leftover)}"
    return {"params": new_params, "batch_stats": new_stats}


def assert_close(ours, theirs, atol=ATOL, name=""):
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), np.asarray(theirs, np.float32),
        atol=atol, rtol=1e-4, err_msg=name,
    )


def rand_nchw(b, c, h, w):
    torch_seed()
    return torch.randn(b, c, h, w)


# ---------------------------------------------------------------- ViT


def build_ref_vit(phase):
    from functools import partial

    from model.backbone.vit import ViT

    torch_seed()
    args = ref_args(phase=phase, pr_phase="rec")
    m = ViT(
        args, input_size=32, patch_size=8, embed_dim=64, depth=4,
        num_heads=4, mlp_ratio=4.0, out_indices=[0, 1, 2, 3], num_bins=5,
        mask_ratio=0.75, norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
    ).eval()
    return m


def build_our_vit():
    from eventpretrain_tpu.models.vit import ViT as OurViT

    return OurViT(
        input_size=32, patch_size=8, embed_dim=64, depth=4, num_heads=4,
        mlp_ratio=4.0, out_indices=(0, 1, 2, 3), num_bins=5,
    )


def test_vit_dense_parity():
    ref = build_ref_vit("finetune_semseg")
    ours = build_our_vit()
    x_t = rand_nchw(2, 5, 32, 32)
    with torch.no_grad():
        emb_l1, emb_l2, emb_h, out_embs, attn = ref(x_t)

    x_j = jnp.asarray(nhwc(x_t))
    params = ours.init(jax.random.key(0), x_j, method=ours.encode_dense,
                       return_attn=True, return_pyramid=True)["params"]
    params = import_strict(sd_numpy(ref), params)
    o_l1, o_l2, o_h, o_pyr, o_attn = ours.apply(
        {"params": params}, x_j, method=ours.encode_dense,
        return_attn=True, return_pyramid=True,
    )
    assert_close(o_l1, emb_l1.numpy(), name="emb_l1")
    assert_close(o_l2, emb_l2.numpy(), name="emb_l2")
    assert_close(o_h, emb_h.numpy(), name="emb_h")
    assert_close(o_attn, attn.numpy(), name="attn")
    assert len(o_pyr) == len(out_embs) == 4
    for i, (o, t) in enumerate(zip(o_pyr, out_embs)):
        # reference emb2patch_frame is (B, D, h, w); ours channels-last
        assert_close(o, t.numpy().transpose(0, 2, 3, 1), name=f"out_embs[{i}]")


def test_vit_masked_parity_density():
    """Masked path with the deterministic density strategy: the mask itself
    (derived from input density, reference vit.py:80-89) and the fused
    visible-token features must both agree."""
    from eventpretrain_tpu.ops.masking import make_mask_from_noise, masking_noise

    ref = build_ref_vit("pretrain")
    ours = build_our_vit()
    x_t = rand_nchw(2, 5, 32, 32)
    with torch.no_grad():
        r_l1, r_l2, r_lh, r_mask, r_restore = ref(x_t, mask=True)

    x_j = jnp.asarray(nhwc(x_t))
    noise = masking_noise(jax.random.key(0), x_j, 8, "density")
    len_keep = int(16 * (1 - 0.75))
    ids_keep, mask, ids_restore = make_mask_from_noise(noise, len_keep)
    np.testing.assert_array_equal(np.asarray(mask), r_mask.numpy())
    np.testing.assert_array_equal(np.asarray(ids_restore),
                                  r_restore.numpy())

    params = ours.init(jax.random.key(0), x_j, ids_keep,
                       method=ours.encode_masked)["params"]
    params = import_strict(sd_numpy(ref), params)
    o_l1, o_l2, o_lh = ours.apply(
        {"params": params}, x_j, ids_keep, method=ours.encode_masked
    )
    assert_close(o_l1, r_l1.numpy(), name="emb_l1")
    assert_close(o_l2, r_l2.numpy(), name="emb_l2")
    assert_close(o_lh, r_lh.numpy(), name="emb_lh")


# ---------------------------------------------------------------- ConvViT


def build_ref_convvit(phase):
    from functools import partial

    from model.backbone.convvit import ConvViT

    torch_seed()
    args = ref_args(phase=phase, pr_phase="rec", backbone_type="convvit")
    m = ConvViT(
        args, input_size=[32, 16, 8], patch_size=[2, 2, 2],
        embed_dim=[16, 32, 64], depth=[2, 2, 3], num_heads=4,
        mlp_ratio=[4, 4, 4], num_bins=5, mask_ratio=0.75,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
    ).eval()
    return m


def build_our_convvit(**kw):
    from eventpretrain_tpu.models.convvit import ConvViT as OurConvViT

    return OurConvViT(
        input_size=32, patch_sizes=(2, 2, 2), embed_dims=(16, 32, 64),
        depths=(2, 2, 3), num_heads=4, **kw,
    )


def test_convvit_dense_parity():
    ref = build_ref_convvit("finetune_cls")
    ours = build_our_convvit(with_rec_decoders=False, with_fpn=False)
    x_t = rand_nchw(2, 5, 32, 32)
    with torch.no_grad():
        out = ref(x_t)
    emb_l1, emb_l2, emb_h, attn = out

    x_j = jnp.asarray(nhwc(x_t))
    params = ours.init(jax.random.key(0), x_j, method=ours.encode_dense,
                       return_attn=True, return_pyramid=False)["params"]
    params = import_strict(sd_numpy(ref), params)
    o = ours.apply({"params": params}, x_j, method=ours.encode_dense,
                   return_attn=True, return_pyramid=False)
    assert_close(o[2], emb_h.numpy(), name="emb_h")
    assert_close(o[4], attn.numpy(), name="attn")


# ---------------------------------------------------------------- ViT-ECDP


def build_ref_vit_ecdp(phase):
    from functools import partial

    from model.backbone.vit_ecdp import ViT_ECDP

    torch_seed()
    args = ref_args(phase=phase, pr_phase="ecdp",
                    backbone_type="vit_ecdp")
    m = ViT_ECDP(
        args, input_size=32, patch_size=8, embed_dim=64, depth=4,
        num_heads=4, mlp_ratio=4.0, out_indices=[0, 1, 2, 3], num_bins=2,
        mask_ratio=0.75, norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
    ).eval()
    return m


def build_our_vit_ecdp():
    from eventpretrain_tpu.models.vit_ecdp import ViTECDP

    return ViTECDP(
        input_size=32, patch_size=8, embed_dim=64, depth=4, num_heads=4,
        out_indices=(0, 1, 2, 3), num_bins=2,
    )


def test_vit_ecdp_dense_parity():
    ref = build_ref_vit_ecdp("finetune_semseg")
    ours = build_our_vit_ecdp()
    x_t = rand_nchw(2, 2, 32, 32)
    with torch.no_grad():
        emb, out_embs, attn = ref(x_t)

    x_j = jnp.asarray(nhwc(x_t))
    params = ours.init(jax.random.key(0), x_j, method=ours.encode_dense,
                       return_attn=True, return_pyramid=True)["params"]
    params = import_strict(sd_numpy(ref), params)
    o_emb, o_pyr, o_attn = ours.apply(
        {"params": params}, x_j, method=ours.encode_dense,
        return_attn=True, return_pyramid=True,
    )
    assert_close(o_emb, emb.numpy(), name="emb")
    assert_close(o_attn, attn.numpy(), name="attn")
    for i, (o, t) in enumerate(zip(o_pyr, out_embs)):
        assert_close(o, t.numpy().transpose(0, 2, 3, 1), name=f"out_embs[{i}]")


def test_vit_ecdp_masked_parity_density():
    from eventpretrain_tpu.ops.masking import make_mask_from_noise, masking_noise

    ref = build_ref_vit_ecdp("pretrain")
    ours = build_our_vit_ecdp()
    x_t = rand_nchw(2, 2, 32, 32)
    with torch.no_grad():
        r_event, r_image, r_mask, r_restore, r_attn = ref(x_t, mask=True)

    x_j = jnp.asarray(nhwc(x_t))
    noise = masking_noise(jax.random.key(0), x_j, 8, "density")
    ids_keep, mask, _ = make_mask_from_noise(noise, int(16 * 0.25))
    np.testing.assert_array_equal(np.asarray(mask), r_mask.numpy())

    params = ours.init(jax.random.key(0), x_j, ids_keep,
                       method=ours.encode_masked)["params"]
    params = import_strict(sd_numpy(ref), params)
    o_event, o_image, o_attn = ours.apply(
        {"params": params}, x_j, ids_keep, method=ours.encode_masked,
        return_attn=True,
    )
    assert_close(o_event, r_event.numpy(), name="emb_event")
    assert_close(o_image, r_image.numpy(), name="emb_image")
    assert_close(o_attn, r_attn.numpy(), name="attn")


# ---------------------------------------------------------------- ViT-MEM


def test_vit_mem_parity():
    from functools import partial

    from model.backbone.vit_mem import ViT_MEM

    from eventpretrain_tpu.models.vit_mem import ViTMEM

    torch_seed()
    args = ref_args(phase="finetune_semseg", backbone_type="vit_mem")
    ref = ViT_MEM(
        args, input_size=32, patch_size=8, embed_dim=64, depth=4,
        num_heads=4, mlp_ratio=4.0, out_indices=[0, 1, 2, 3], num_bins=3,
        init_values=0.1, norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
    ).eval()
    # zero-init bias tables get gradients in training; randomize so parity
    # actually exercises the rel-pos gather
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "relative_position_bias_table" in name:
                p.normal_(0, 0.02)

    ours = ViTMEM(
        input_size=32, patch_size=8, embed_dim=64, depth=4, num_heads=4,
        out_indices=(0, 1, 2, 3), num_bins=3,
    )
    x_t = rand_nchw(2, 3, 32, 32)
    with torch.no_grad():
        emb, out_embs, attn = ref(x_t)

    x_j = jnp.asarray(nhwc(x_t))
    params = ours.init(jax.random.key(0), x_j, method=ours.encode_dense,
                       return_attn=True, return_pyramid=True)["params"]
    params = import_strict(sd_numpy(ref), params)
    o_emb, o_pyr, o_attn = ours.apply(
        {"params": params}, x_j, method=ours.encode_dense,
        return_attn=True, return_pyramid=True,
    )
    assert_close(o_emb, emb.numpy(), name="emb")
    assert_close(o_attn, attn.numpy(), name="attn")
    for i, (o, t) in enumerate(zip(o_pyr, out_embs)):
        assert_close(o, t.numpy().transpose(0, 2, 3, 1), name=f"out_embs[{i}]")


# ---------------------------------------------------------------- dense heads


def test_uperhead_fcnhead_parity():
    from model.finetune_dense.ft_dense_decoder import (
        FCNHead as RefFCNHead,
        UPerHead as RefUPerHead,
    )

    from eventpretrain_tpu.models.dense_heads import FCNHead, UPerHead

    torch_seed()
    args = ref_args()
    in_ch = [8, 12, 16, 16]
    ref_dec = RefUPerHead(
        args=args, in_channels=in_ch, channels=16, out_channels=6,
        in_index=[0, 1, 2, 3], pool_scales=(1, 2, 3, 6),
    ).eval()
    ref_aux = RefFCNHead(
        args=args, in_channels=16, channels=8, out_channels=6, in_index=2,
        num_convs=1, kernel_size=3, concat_input=False,
    ).eval()
    # randomize BN running stats so the eval-mode normalization is nontrivial
    with torch.no_grad():
        for m in list(ref_dec.modules()) + list(ref_aux.modules()):
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    feats_t = [rand_nchw(2, c, 16 >> i, 16 >> i)
               for i, c in enumerate(in_ch)]
    with torch.no_grad():
        dec_t = ref_dec(feats_t)
        aux_t = ref_aux(feats_t)

    feats_j = [jnp.asarray(nhwc(f)) for f in feats_t]
    ours_dec = UPerHead(in_channels=in_ch, channels=16, num_classes=6)
    ours_aux = FCNHead(channels=8, num_classes=6, in_index=2)
    v_dec = ours_dec.init(jax.random.key(0), feats_j)
    v_aux = ours_aux.init(jax.random.key(0), feats_j)

    vars_dec = import_variables_strict(sd_numpy(ref_dec), v_dec)
    vars_aux = import_variables_strict(sd_numpy(ref_aux), v_aux)

    o_dec = ours_dec.apply(vars_dec, feats_j)
    o_aux = ours_aux.apply(vars_aux, feats_j)
    assert_close(o_dec, dec_t.numpy().transpose(0, 2, 3, 1), name="decode")
    assert_close(o_aux, aux_t.numpy().transpose(0, 2, 3, 1), name="aux")
