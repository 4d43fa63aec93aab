"""GRADIENT-level numerical parity against the actual reference modules.

test_torch_parity.py proves forward agreement; these tests prove the whole
training signal agrees: same init (imported from the reference state dict),
same input, same deterministic density mask -> same loss AND the same
gradient for every parameter. Torch gradients are mapped into the flax tree
layout by the SAME importer used for checkpoints (gradients transform under
the importer's transposes/reshapes exactly like the parameters they belong
to), so this also exercises the import mapping end to end.

Covers the two training paths of the north star: the stage-1 rec loss
(reference pr_hub_model.py:124-141,190-206) and the cls finetune CE
(reference ft_cls_hub_model.py:118-139 + ft_cls_trainer.py:61-64).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import flax.linen as nn

from eventpretrain_tpu.ckpt.torch_import import import_torch_params
from eventpretrain_tpu.models.vit import ViT as OurViT
from eventpretrain_tpu.models.decoder import RecDecoder
from eventpretrain_tpu.objectives import reconstruct_loss
from eventpretrain_tpu.objectives.cls import cls_loss
from eventpretrain_tpu.ops.masking import make_mask_from_noise, masking_noise

from tests._torch_ref import load_reference, ref_args, nhwc

load_reference()


def grads_numpy(module) -> dict:
    return {
        k: np.asarray(p.grad.detach().cpu().numpy())
        for k, p in module.named_parameters()
        if p.grad is not None
    }


def import_strict(sd, tree, what=""):
    new_tree, missing, unused = import_torch_params(
        sd, tree, verbose=False
    )
    assert missing == [], f"{what}: flax leaves without torch source: {missing}"
    assert unused == [], f"{what}: unmapped torch keys: {unused}"
    return new_tree


def assert_tree_close(ours, theirs_tree, atol=2e-4, rtol=2e-3):
    flat_a = jax.tree_util.tree_leaves_with_path(ours)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(theirs_tree))
    leaves_b = jax.tree_util.tree_leaves_with_path(theirs_tree)
    assert len(flat_a) == len(leaves_b)
    for path, leaf in flat_a:
        other = flat_b[path]
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32), np.asarray(other, np.float32),
            atol=atol, rtol=rtol,
            err_msg=jax.tree_util.keystr(path),
        )


def build_ref_vit(phase):
    from functools import partial

    from model.backbone.vit import ViT

    torch.manual_seed(0)
    args = ref_args(phase=phase, pr_phase="rec")
    return ViT(
        args, input_size=32, patch_size=8, embed_dim=64, depth=4,
        num_heads=4, mlp_ratio=4.0, out_indices=[0, 1, 2, 3], num_bins=5,
        mask_ratio=0.75, norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
    )


def build_our_vit():
    return OurViT(
        input_size=32, patch_size=8, embed_dim=64, depth=4, num_heads=4,
        mlp_ratio=4.0, out_indices=(0, 1, 2, 3), num_bins=5,
    )


def test_rec_loss_and_grad_parity():
    """Stage-1: masked encode -> MAE decoder -> patch-norm MSE; loss and
    every parameter gradient must match the reference composition."""
    from functools import partial

    from model.pretrain.pr_rec_decoder import PrRecDecoder
    from utils.reshape import frame2emb as ref_frame2emb

    class RefRecModel(torch.nn.Module):
        # reference PrHubModel's rec path (pr_hub_model.py:190-206) at a
        # tiny config its fixed factories cannot express
        def __init__(self):
            super().__init__()
            self.backbone = build_ref_vit("pretrain")
            torch.manual_seed(1)
            self.pretrain_rec_decoder = PrRecDecoder(
                patch_size=8, num_patches=16, encoder_embed_dim=[64],
                embed_dim=32, depth=2, num_heads=4, mlp_ratio=[4.0],
                norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
                frame_chans=1,
            )

        def forward(self, evg, sub_frame):
            # density masking (deterministic) happens inside backbone
            emb_l1, emb_l2, emb_lh, mask, ids_restore = self.backbone(
                evg, mask=True
            )
            pred = self.pretrain_rec_decoder(emb_lh, ids_restore)
            # reference reconstruct_loss, pr_hub_model.py:124-141
            target = ref_frame2emb(8, sub_frame)
            mean = target.float().mean(dim=-1, keepdim=True)
            var = target.float().var(dim=-1, keepdim=True)
            target = (target - mean) / (var + 1.0e-6) ** 0.5
            loss = ((pred - target) ** 2).mean(dim=-1)
            return (mask * loss).sum() / mask.sum()

    ref = RefRecModel().train()
    torch.manual_seed(2)
    evg_t = torch.randn(2, 5, 32, 32)
    frame_t = torch.randn(2, 1, 32, 32)
    loss_t = ref(evg_t, frame_t)
    loss_t.backward()

    evg_j = jnp.asarray(nhwc(evg_t))
    frame_j = jnp.asarray(nhwc(frame_t))
    backbone = build_our_vit()
    decoder = RecDecoder(
        patch_size=8, num_patches=16, embed_dim=32, depth=2, num_heads=4,
        frame_chans=1,
    )

    class OurRecModel(nn.Module):
        def setup(self):
            self.backbone = backbone.clone(name="backbone")
            self.pretrain_rec_decoder = decoder.clone(
                name="pretrain_rec_decoder"
            )

        def __call__(self, evg, ids_keep, ids_restore):
            _, _, emb_lh = self.backbone.encode_masked(evg, ids_keep)
            return self.pretrain_rec_decoder(emb_lh, ids_restore)

    ours = OurRecModel()
    noise = masking_noise(jax.random.key(0), evg_j, 8, "density")
    ids_keep, mask, ids_restore = make_mask_from_noise(noise, 4)
    params = ours.init(
        jax.random.key(0), evg_j, ids_keep, ids_restore
    )["params"]
    params = import_strict(
        {k: np.asarray(v.detach().numpy())
         for k, v in ref.state_dict().items()},
        params, what="params",
    )

    def loss_fn(params):
        pred = ours.apply({"params": params}, evg_j, ids_keep, ids_restore)
        return reconstruct_loss(
            pred, frame_j, mask, patch_size=8, norm_pix_loss=True,
            mask_ratio=0.75,
        )

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(
        float(loss_j), float(loss_t.detach()), atol=1e-5, rtol=1e-5
    )
    grads_ref = import_strict(grads_numpy(ref), grads, what="grads")
    assert_tree_close(grads, grads_ref)


def test_semseg_dense_stack_grad_parity():
    """UPerHead + FCNHead + bilinear pred-resize + (CE + Dice) x (decode,
    aux): loss and head-parameter gradients vs the reference composition
    (ft_semseg_trainer.py:77-114 + semseg_loss.py), train-mode BN."""
    from model.finetune_dense.ft_dense_decoder import (
        FCNHead as RefFCNHead,
        UPerHead as RefUPerHead,
    )
    from trainer.finetune_semseg.semseg_loss import SemsegLoss
    from utils.reshape import resize as ref_resize

    from eventpretrain_tpu.models.dense_heads import FCNHead, UPerHead
    from eventpretrain_tpu.objectives.semseg import semseg_loss
    from eventpretrain_tpu.ops.reshape import resize

    torch.manual_seed(0)
    args = ref_args(device="cpu", sample_mode="bilinear")
    in_ch = [8, 12, 16, 16]
    C = 6
    # dropout_ratio=0 so train-mode randomness cannot desync the two
    # frameworks; BN still runs in train mode (batch statistics)
    ref_dec = RefUPerHead(
        args=args, in_channels=in_ch, channels=16, out_channels=C,
        in_index=[0, 1, 2, 3], pool_scales=(1, 2, 3, 6), dropout_ratio=0,
    ).train()
    ref_aux = RefFCNHead(
        args=args, in_channels=16, channels=8, out_channels=C, in_index=2,
        num_convs=1, kernel_size=3, concat_input=False, dropout_ratio=0,
    ).train()
    loss_mod = SemsegLoss(args, num_classes=C, ignore_index=255)

    torch.manual_seed(1)
    feats_t = [torch.randn(2, c, 16 >> i, 16 >> i)
               for i, c in enumerate(in_ch)]
    labels_np = np.random.default_rng(2).integers(0, C, (2, 32, 32))
    labels_np[:, :3, :3] = 255  # exercise ignore masking
    labels_t = torch.tensor(labels_np[:, None], dtype=torch.long)

    dec_t = ref_resize(ref_dec(feats_t), size=(32, 32), mode="bilinear")
    aux_t = ref_resize(ref_aux(feats_t), size=(32, 32), mode="bilinear")
    ce_d, dice_d = loss_mod(dec_t, labels_t)
    ce_a, dice_a = loss_mod(aux_t, labels_t)
    loss_t = 1.0 * (ce_d + dice_d) + 0.4 * (ce_a + dice_a)
    loss_t.backward()

    feats_j = [jnp.asarray(nhwc(f)) for f in feats_t]
    labels_j = jnp.asarray(labels_np.astype(np.int32))
    ours_dec = UPerHead(in_channels=in_ch, channels=16, num_classes=C,
                        dropout_ratio=0)
    ours_aux = FCNHead(channels=8, num_classes=C, in_index=2,
                       dropout_ratio=0)
    v_dec = ours_dec.init(jax.random.key(0), feats_j, train=True)
    v_aux = ours_aux.init(jax.random.key(0), feats_j, train=True)

    def imp(sd, vs, what):
        params, mp, up = import_torch_params(sd, vs["params"], verbose=False)
        stats, ms, us = import_torch_params(
            sd, vs["batch_stats"], verbose=False
        )
        assert mp == [] and ms == [], (what, mp, ms)
        assert not (set(up) & set(us)), (what, sorted(set(up) & set(us)))
        return params, stats

    sd_dec, sd_aux = (
        {k: np.asarray(v.detach().numpy()) for k, v in m.state_dict().items()}
        for m in (ref_dec, ref_aux)
    )
    p_dec, s_dec = imp(sd_dec, v_dec, "dec")
    p_aux, s_aux = imp(sd_aux, v_aux, "aux")

    def loss_fn(heads_params):
        p_dec, p_aux = heads_params
        dec, _ = ours_dec.apply(
            {"params": p_dec, "batch_stats": s_dec}, feats_j, train=True,
            mutable=["batch_stats"],
        )
        aux, _ = ours_aux.apply(
            {"params": p_aux, "batch_stats": s_aux}, feats_j, train=True,
            mutable=["batch_stats"],
        )
        dec = resize(dec, (32, 32), "bilinear")
        aux = resize(aux, (32, 32), "bilinear")
        ce_d, dice_d = semseg_loss(dec, labels_j, C, ignore_index=255)
        ce_a, dice_a = semseg_loss(aux, labels_j, C, ignore_index=255)
        return 1.0 * (ce_d + dice_d) + 0.4 * (ce_a + dice_a)

    loss_j, (g_dec, g_aux) = jax.value_and_grad(loss_fn)((p_dec, p_aux))
    np.testing.assert_allclose(
        float(loss_j), float(loss_t.detach()), atol=1e-5, rtol=1e-5
    )
    for ref_mod, grads, what in ((ref_dec, g_dec, "dec"),
                                 (ref_aux, g_aux, "aux")):
        g_ref = import_strict(grads_numpy(ref_mod), grads, what=what)
        assert_tree_close(grads, g_ref, atol=5e-4, rtol=5e-3)


def test_cls_loss_and_grad_parity():
    """Finetune cls: dense encode -> mean pool -> head -> CE (reference
    ft_cls_hub_model.py:118-139 + ft_cls_trainer.py:61-64)."""

    class RefClsModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = build_ref_vit("finetune_cls")
            torch.manual_seed(3)
            self.classify_head = torch.nn.Linear(64, 6)

        def forward(self, evg):
            # phase="finetune_cls" -> (emb_l1, emb_l2, emb_h, attn)
            _, _, emb_h, _ = self.backbone(evg)
            return self.classify_head(emb_h.mean(dim=1))

    ref = RefClsModel().train()
    torch.manual_seed(4)
    evg_t = torch.randn(2, 5, 32, 32)
    labels = torch.tensor([1, 4])
    loss_t = torch.nn.CrossEntropyLoss()(ref(evg_t), labels)
    loss_t.backward()

    evg_j = jnp.asarray(nhwc(evg_t))
    labels_j = jnp.asarray(labels.numpy())
    backbone = build_our_vit()

    class OurClsModel(nn.Module):
        def setup(self):
            self.backbone = backbone.clone(name="backbone")
            self.classify_head = nn.Dense(6, name="classify_head")

        def __call__(self, evg):
            _, _, emb_h, _, _ = self.backbone.encode_dense(
                evg, return_pyramid=True,
            )
            return self.classify_head(emb_h.mean(axis=1))

    ours = OurClsModel()
    params = ours.init(jax.random.key(0), evg_j)["params"]
    params = import_strict(
        {k: np.asarray(v.detach().numpy())
         for k, v in ref.state_dict().items()},
        params, what="params",
    )

    def loss_fn(params):
        return cls_loss(ours.apply({"params": params}, evg_j), labels_j)

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(
        float(loss_j), float(loss_t.detach()), atol=1e-5, rtol=1e-5
    )
    grads_ref = import_strict(grads_numpy(ref), grads, what="grads")
    assert_tree_close(grads, grads_ref)


def test_convvit_dense_grad_parity():
    """ConvViT dense path (conv stages + stage-3 ViT blocks) + mean-pool
    head + CE: loss and all parameter gradients match (reference
    convvit.py:173-207 + ft_cls_hub_model head)."""
    from tests.test_torch_parity import build_ref_convvit, build_our_convvit

    class RefCls(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = build_ref_convvit("finetune_cls")
            torch.manual_seed(11)
            self.classify_head = torch.nn.Linear(64, 4)

        def forward(self, x):
            _, _, emb_h, _ = self.backbone(x)
            return self.classify_head(emb_h.mean(dim=1))

    ref = RefCls().train()
    torch.manual_seed(12)
    x_t = torch.randn(2, 5, 32, 32)
    labels_t = torch.tensor([0, 3])
    loss_t = torch.nn.CrossEntropyLoss()(ref(x_t), labels_t)
    loss_t.backward()

    x_j = jnp.asarray(nhwc(x_t))
    backbone = build_our_convvit(with_rec_decoders=False, with_fpn=False)

    class OurCls(nn.Module):
        def setup(self):
            self.backbone = backbone.clone(name="backbone")
            self.classify_head = nn.Dense(4, name="classify_head")

        def __call__(self, x):
            _, _, emb_h, _, _ = self.backbone.encode_dense(
                x, return_pyramid=False,
            )
            return self.classify_head(emb_h.mean(axis=1))

    ours = OurCls()
    params = ours.init(jax.random.key(0), x_j)["params"]
    params = import_strict(
        {k: np.asarray(v.detach().numpy())
         for k, v in ref.state_dict().items()},
        params, what="params",
    )

    def loss_fn(p):
        return cls_loss(ours.apply({"params": p}, x_j),
                        jnp.asarray(labels_t.numpy()))

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               atol=1e-5, rtol=1e-5)
    grads_ref = import_strict(grads_numpy(ref), grads, what="grads")
    assert_tree_close(grads, grads_ref)


def test_sparse_swin_masked_grad_parity():
    """Sparse-Swin masked path (knapsack grouping, visible-window attention,
    patch merging, stage decoders, 4-way fusion): parameter gradients of
    sum(emb_lh^2) match the reference (swin.py:181-254). Params without a
    torch gradient must also be zero-grad here."""
    from tests.test_torch_parity_swin import build_ref_swin, build_our_swin
    from eventpretrain_tpu.models.swin import build_swin_plans, plans_to_device
    from eventpretrain_tpu.ops.masking import make_mask_from_noise, masking_noise

    ref = build_ref_swin("pretrain", "rec")
    torch.manual_seed(13)
    x_t = torch.randn(1, 5, 224, 224)
    out = ref(x_t, mask=True)
    r_lh = out[4]
    loss_t = (r_lh.float() ** 2).sum()
    loss_t.backward()

    x_j = jnp.asarray(nhwc(x_t))
    noise = masking_noise(jax.random.key(0), x_j, 32, "density")
    ids_keep, mask, _ = make_mask_from_noise(noise, 24)
    plans = plans_to_device(build_swin_plans(
        np.asarray(mask[0]).astype(bool),
        input_resolution=(56, 56), window_size=7, cell_grid=7,
    ))
    ours = build_our_swin(with_rec_decoders=True)
    params = ours.init(jax.random.key(0), x_j, ids_keep, plans,
                       method=ours.encode_masked)["params"]
    params = import_strict(
        {k: np.asarray(v.detach().numpy())
         for k, v in ref.state_dict().items()},
        params, what="params",
    )

    def loss_fn(p):
        _, emb_lh = ours.apply({"params": p}, x_j, ids_keep, plans,
                               method=ours.encode_masked)
        return jnp.sum(emb_lh.astype(jnp.float32) ** 2)

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=1e-5)
    # torch leaves some params gradless (modules unused by the masked path);
    # import into a zero tree so those compare against our (also-zero) grads
    zeros = jax.tree.map(jnp.zeros_like, grads)
    from eventpretrain_tpu.ckpt.torch_import import import_torch_params

    grads_ref, _missing, unused = import_torch_params(
        grads_numpy(ref), zeros, verbose=False
    )
    assert unused == []
    # swin-T at 224 is a deep graph; f32 accumulation-order drift is larger
    assert_tree_close(grads, grads_ref, atol=5e-3, rtol=1e-2)


def test_vit_mem_grad_parity():
    """ViT-MEM (cls token, shared rel-pos-bias, layer-scale blocks) +
    mean-pool head + CE: gradients incl. the relative-position-bias table
    (its grad flows through the per-block gathers) match the reference."""
    from functools import partial

    from model.backbone.vit_mem import ViT_MEM
    from eventpretrain_tpu.models.vit_mem import ViTMEM

    class RefCls(torch.nn.Module):
        def __init__(self):
            super().__init__()
            torch.manual_seed(0)
            args = ref_args(phase="finetune_cls", backbone_type="vit_mem")
            self.backbone = ViT_MEM(
                args, input_size=32, patch_size=8, embed_dim=64, depth=4,
                num_heads=4, mlp_ratio=4.0, out_indices=[0, 1, 2, 3],
                num_bins=3, init_values=0.1,
                norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
            )
            with torch.no_grad():
                for name, p in self.backbone.named_parameters():
                    if "relative_position_bias_table" in name:
                        p.normal_(0, 0.02)
            torch.manual_seed(14)
            self.classify_head = torch.nn.Linear(64, 4)

        def forward(self, x):
            emb, _ = self.backbone(x)  # finetune_cls -> (emb, attn)
            return self.classify_head(emb)

    ref = RefCls().train()
    torch.manual_seed(15)
    x_t = torch.randn(2, 3, 32, 32)
    labels_t = torch.tensor([1, 2])
    loss_t = torch.nn.CrossEntropyLoss()(ref(x_t), labels_t)
    loss_t.backward()

    x_j = jnp.asarray(nhwc(x_t))
    backbone = ViTMEM(
        input_size=32, patch_size=8, embed_dim=64, depth=4, num_heads=4,
        out_indices=(0, 1, 2, 3), num_bins=3,
    )

    class OurCls(nn.Module):
        def setup(self):
            self.backbone = backbone.clone(name="backbone")
            self.classify_head = nn.Dense(4, name="classify_head")

        def __call__(self, x):
            emb, _, _ = self.backbone.encode_dense(x)
            return self.classify_head(emb)

    ours = OurCls()
    params = ours.init(jax.random.key(0), x_j)["params"]
    params = import_strict(
        {k: np.asarray(v.detach().numpy())
         for k, v in ref.state_dict().items()},
        params, what="params",
    )

    def loss_fn(p):
        return cls_loss(ours.apply({"params": p}, x_j),
                        jnp.asarray(labels_t.numpy()))

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               atol=1e-5, rtol=1e-5)
    grads_ref = import_strict(grads_numpy(ref), grads, what="grads")
    assert_tree_close(grads, grads_ref)


def test_swin_ecddp_grad_parity_tiny():
    """Dense ECDDP swin (unclamped stage-4 shifts, per-out-index norms) at a
    tiny config: parameter gradients of sum(pyramid^2) match the reference
    SwinTransformer (swin_ecddp.py)."""
    from model.backbone.swin_ecddp import swin_ecddp_tiny_window7 as ref_fac
    from eventpretrain_tpu.models.swin_ecddp import SwinECDDP
    from eventpretrain_tpu.ckpt.torch_import import import_torch_params

    torch.manual_seed(0)
    args = ref_args(phase="finetune_semseg", backbone_type="swin_ecddp")
    # window_size=2 keeps every stage's map >= the window: for
    # ws > map the reference pads the map up to ws while we clamp the
    # window to the map — same attention span, different shifted-window
    # grouping; production geometry (224, ws 7) never enters that regime
    ref = ref_fac(
        args=args, pretrain_img_size=64, patch_size=4, num_bins=5,
        embed_dim=16, depths=[1, 1, 1, 1], num_heads=[2, 2, 2, 2],
        window_size=2, drop_path_rate=0.0,
    )
    torch.manual_seed(16)
    x_t = torch.randn(1, 5, 64, 64)
    out = ref(x_t)
    out_embs = out[5]
    loss_t = sum((o.float() ** 2).sum() for o in out_embs)
    loss_t.backward()

    ours = SwinECDDP(
        input_size=64, patch_size=4, embed_dims=(16, 32, 64, 128),
        depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2), window_size=2,
        num_bins=5, drop_path_rate=0.0,
    )
    x_j = jnp.asarray(nhwc(x_t))
    params = ours.init(jax.random.key(0), x_j, method=ours.encode_dense,
                       return_pyramid=True)["params"]
    params = import_strict(
        {k: np.asarray(v.detach().numpy())
         for k, v in ref.state_dict().items()},
        params, what="params",
    )

    def loss_fn(p):
        o = ours.apply({"params": p}, x_j, method=ours.encode_dense,
                       return_pyramid=True)
        return sum(jnp.sum(e.astype(jnp.float32) ** 2) for e in o[3])

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=1e-5)
    zeros = jax.tree.map(jnp.zeros_like, grads)
    grads_ref, _missing, unused = import_torch_params(
        grads_numpy(ref), zeros, verbose=False
    )
    assert unused == []
    assert_tree_close(grads, grads_ref, atol=1e-3, rtol=5e-3)


def test_vit_ecdp_masked_grad_parity():
    """ViT-ECDP masked path (2 learned tokens prepended after the gather):
    gradients of a fixed linear functional of the token embeddings match the
    reference (vit_ecdp.py:107-125).

    Two numerical traps deliberately avoided here:
    - the reference zero-inits ``tokens`` (vit_ecdp.py:27); an exactly-zero
      row through pre-norm LayerNorm has var=0 and its backward is scaled by
      1/sqrt(eps) ~ 1e3, amplifying float noise past the grads themselves —
      so the tokens are perturbed to a realistic non-zero state first;
    - sum(emb**2) of a LayerNorm output is ~constant (rows have unit
      variance), making every grad eps-level noise — a fixed random linear
      readout keeps the gradient well-conditioned instead.
    """
    from tests.test_torch_parity import build_ref_vit_ecdp, build_our_vit_ecdp
    from eventpretrain_tpu.ops.masking import make_mask_from_noise, masking_noise

    ref = build_ref_vit_ecdp("pretrain")
    with torch.no_grad():
        ref.tokens.normal_(0.0, 0.02, generator=torch.Generator().manual_seed(5))
    rng = np.random.default_rng(11)
    w_e = rng.standard_normal((2, 64)).astype(np.float32)
    w_i = rng.standard_normal((2, 64)).astype(np.float32)

    torch.manual_seed(17)
    x_t = torch.randn(2, 2, 32, 32)
    r_event, r_image, _, _, _ = ref(x_t, mask=True)
    loss_t = ((r_event.float() * torch.from_numpy(w_e)).sum()
              + (r_image.float() * torch.from_numpy(w_i)).sum())
    loss_t.backward()

    x_j = jnp.asarray(nhwc(x_t))
    noise = masking_noise(jax.random.key(0), x_j, 8, "density")
    ids_keep, _, _ = make_mask_from_noise(noise, int(16 * 0.25))
    ours = build_our_vit_ecdp()
    params = ours.init(jax.random.key(0), x_j, ids_keep,
                       method=ours.encode_masked)["params"]
    params = import_strict(
        {k: np.asarray(v.detach().numpy())
         for k, v in ref.state_dict().items()},
        params, what="params",
    )

    def loss_fn(p):
        e, i, _ = ours.apply({"params": p}, x_j, ids_keep,
                             method=ours.encode_masked)
        return (jnp.sum(e.astype(jnp.float32) * w_e)
                + jnp.sum(i.astype(jnp.float32) * w_i))

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=1e-4, atol=1e-4)
    from eventpretrain_tpu.ckpt.torch_import import import_torch_params

    zeros = jax.tree.map(jnp.zeros_like, grads)
    grads_ref, _m, unused = import_torch_params(
        grads_numpy(ref), zeros, verbose=False
    )
    assert unused == []
    assert_tree_close(grads, grads_ref, atol=5e-4, rtol=5e-3)
