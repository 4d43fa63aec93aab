"""Pretrain hub: backbone + MAE decoder + contrastive projection heads.

Structural equivalent of reference model/pretrain/pr_hub_model.py:14-281, but
losses live in ``eventpretrain_tpu.objectives`` and the MoCo queue is
functional state threaded through the train step — the module only produces
features:

- ``forward_rec``: masked encode -> decoder prediction (stage 1).
- ``forward_con``: dense encode -> projector/predictor q, CLIP-embedding
  norm+projection k (stages 2/3). Stage-2's backbone freeze is an optimizer
  concern (see train/optim.py:frozen_except_norm_mask), not a model branch.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from eventpretrain_tpu.models.layers import ProjectorMlp
from eventpretrain_tpu.models.vit import ViT, vit_small_patch16, vit_base_patch16
from eventpretrain_tpu.models.decoder import (
    RecDecoder,
    rec_decoder_small_patch16,
    rec_decoder_base_patch16,
    rec_decoder_swin_tiny_patch32,
)
from eventpretrain_tpu.ops.reshape import emb2patch_frame, patch_frame2emb


class PrHub(nn.Module):
    """Composable pretrain hub (reference PrHubModel, pr_hub_model.py:14).

    attributes mirror the reference factories (pr_hub_model.py:262-281):
    vit/convvit small: embed_dim 384, 196 patches, patch 16;
    base: 768; swin: 768, 49 patches, patch 32 (conv clip projection).
    """

    backbone: nn.Module
    decoder: Optional[nn.Module] = None
    embed_dim: int = 384
    num_patches: int = 196
    mlp_dim: int = 4096
    proj_mlp_layers: int = 3
    pred_mlp_layers: int = 2
    clip_emb_dim: int = 512
    clip_proj_conv: bool = False  # swin: Conv 2x2 stride 2 (14^2 -> 7^2)
    dtype: Any = jnp.float32
    # projector/predictor BatchNorm statistic scope: 1 = global batch
    # (sync-BN), num_devices = per-device stats (reference DDP parity,
    # models/layers.py::GroupedBatchNorm); CLI --bn_scope
    bn_groups: int = 1

    def setup(self):
        self.emb_h_proj = ProjectorMlp(
            num_layers=self.proj_mlp_layers,
            mlp_dim=self.mlp_dim,
            out_dim=self.embed_dim,
            dtype=self.dtype,
            bn_groups=self.bn_groups,
            name="emb_h_proj",
        )
        self.emb_h_pred = ProjectorMlp(
            num_layers=self.pred_mlp_layers,
            mlp_dim=self.mlp_dim,
            out_dim=self.embed_dim,
            dtype=self.dtype,
            bn_groups=self.bn_groups,
            name="emb_h_pred",
        )
        # torch nn.LayerNorm default eps (reference pr_hub_model.py:92)
        self.norm_clip_emb = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, name="norm_clip_emb"
        )
        if self.clip_proj_conv:
            self.clip_emb_proj = nn.Conv(
                self.embed_dim, (2, 2), strides=(2, 2), padding="VALID",
                dtype=self.dtype, name="clip_emb_proj",
            )
        else:
            self.clip_emb_proj = nn.Dense(
                self.embed_dim, use_bias=False, dtype=self.dtype,
                name="clip_emb_proj",
            )

    def forward_rec(
        self,
        evg: jax.Array,
        ids_keep: jax.Array,
        ids_restore: jax.Array,
        deterministic: bool = True,
        mask: Optional[jax.Array] = None,
        plans: Any = None,
    ):
        """Masked encode + reconstruction prediction (stage 1).

        Returns (pred, emb_l1, emb_l2, emb_lh); the loss is
        ``objectives.reconstruct_loss`` (reference pr_hub_model.py:190-206).
        ``mask`` (full binary mask, 0=keep) is required by conv-stage
        backbones (ConvViT) and ignored by ViT. ``plans`` (host-built device
        plans) selects the sparse-Swin path.
        """
        if plans is not None:
            outs, emb_lh = self.backbone.encode_masked(
                evg, ids_keep, plans, deterministic
            )
            emb_l1, emb_l2 = outs[0], outs[1]
        else:
            emb_l1, emb_l2, emb_lh = self.backbone.encode_masked(
                evg, ids_keep, deterministic, mask
            )
        pred = self.decoder(emb_lh, ids_restore, deterministic)
        return pred, emb_l1, emb_l2, emb_lh

    def forward_con(
        self,
        evg: jax.Array,
        clip_emb: jax.Array,
        train: bool = False,
        return_attn: bool = False,
    ):
        """Dense encode + projection heads (stages 2/3).

        clip_emb: (B, 1+L_clip, clip_emb_dim) CLIP tokens (cls dropped, as
        reference pr_hub_model.py:216). Returns
        (q, k, emb_h_org, clip_emb_org, attn) where q = pred(proj(emb_h)) and
        k = proj(norm(clip_emb)); feed to objectives.contrastive.
        """
        _, _, emb_h, _, attn = self.backbone.encode_dense(
            evg,
            deterministic=not train,
            return_attn=return_attn,
            return_pyramid=False,
        )
        emb_h_org = jax.lax.stop_gradient(emb_h)

        clip_tokens = self.norm_clip_emb(clip_emb[:, 1:, :])
        clip_emb_org = jax.lax.stop_gradient(clip_tokens)
        if self.clip_proj_conv:
            k = patch_frame2emb(
                self.clip_emb_proj(emb2patch_frame(clip_tokens))
            )
        else:
            k = self.clip_emb_proj(clip_tokens)

        q = self.emb_h_proj(emb_h, train)
        q = self.emb_h_pred(q, train)
        return q, k, emb_h_org, clip_emb_org, attn

    def __call__(self, evg, clip_emb, train: bool = False):
        return self.forward_con(evg, clip_emb, train)


def pretrain_hub_small(num_bins: int = 5, mask_ratio: float = 0.75,
                       frame_chans: int = 1, with_decoder: bool = True,
                       dtype: Any = jnp.float32, **bk) -> PrHub:
    """Reference pretrain_hub_model_small_patch16 (pr_hub_model.py:262-267)."""
    bn_groups = bk.pop("bn_groups", 1)
    backbone = vit_small_patch16(num_bins=num_bins, dtype=dtype, name="backbone", **bk)
    num_patches = (bk.get("input_size", 224) // 16) ** 2
    decoder = (
        rec_decoder_small_patch16(frame_chans=frame_chans, dtype=dtype,
                                  num_patches=num_patches,
                                  name="pretrain_rec_decoder")
        if with_decoder else None
    )
    return PrHub(backbone=backbone, decoder=decoder, embed_dim=384,
                 num_patches=num_patches, dtype=dtype, bn_groups=bn_groups)


def pretrain_hub_base(num_bins: int = 5, mask_ratio: float = 0.75,
                      frame_chans: int = 1, with_decoder: bool = True,
                      dtype: Any = jnp.float32, **bk) -> PrHub:
    """Reference pretrain_hub_model_base_patch16 (pr_hub_model.py:276-281)."""
    bn_groups = bk.pop("bn_groups", 1)
    backbone = vit_base_patch16(num_bins=num_bins, dtype=dtype, name="backbone", **bk)
    num_patches = (bk.get("input_size", 224) // 16) ** 2
    decoder = (
        rec_decoder_base_patch16(frame_chans=frame_chans, dtype=dtype,
                                 num_patches=num_patches,
                                 name="pretrain_rec_decoder")
        if with_decoder else None
    )
    return PrHub(backbone=backbone, decoder=decoder, embed_dim=768,
                 num_patches=num_patches, dtype=dtype, bn_groups=bn_groups)


def pretrain_hub_convvit_small(num_bins: int = 5, mask_ratio: float = 0.75,
                               frame_chans: int = 1, with_decoder: bool = True,
                               dtype: Any = jnp.float32, **bk) -> PrHub:
    """ConvViT-small hub (reference pr_hub_model.py:45-61 + 262-267)."""
    from eventpretrain_tpu.models.convvit import convvit_small_patch16

    bn_groups = bk.pop("bn_groups", 1)
    backbone = convvit_small_patch16(
        num_bins=num_bins, with_rec_decoders=with_decoder, dtype=dtype,
        name="backbone", **bk,
    )
    num_patches = (bk.get("input_size", 224) // 16) ** 2
    decoder = (
        rec_decoder_small_patch16(frame_chans=frame_chans, dtype=dtype,
                                  num_patches=num_patches,
                                  name="pretrain_rec_decoder")
        if with_decoder else None
    )
    return PrHub(backbone=backbone, decoder=decoder, embed_dim=384,
                 num_patches=num_patches, dtype=dtype, bn_groups=bn_groups)


def pretrain_hub_convvit_base(num_bins: int = 5, mask_ratio: float = 0.75,
                              frame_chans: int = 1, with_decoder: bool = True,
                              dtype: Any = jnp.float32, **bk) -> PrHub:
    from eventpretrain_tpu.models.convvit import convvit_base_patch16

    bn_groups = bk.pop("bn_groups", 1)
    backbone = convvit_base_patch16(
        num_bins=num_bins, with_rec_decoders=with_decoder, dtype=dtype,
        name="backbone", **bk,
    )
    num_patches = (bk.get("input_size", 224) // 16) ** 2
    decoder = (
        rec_decoder_base_patch16(frame_chans=frame_chans, dtype=dtype,
                                 num_patches=num_patches,
                                 name="pretrain_rec_decoder")
        if with_decoder else None
    )
    return PrHub(backbone=backbone, decoder=decoder, embed_dim=768,
                 num_patches=num_patches, dtype=dtype, bn_groups=bn_groups)


def pretrain_hub_swin(num_bins: int = 5, mask_ratio: float = 0.5,
                      frame_chans: int = 1, with_decoder: bool = True,
                      dtype: Any = jnp.float32, **bk) -> PrHub:
    """Swin-tiny hub (reference pretrain_hub_model_swin_tiny_patch16,
    pr_hub_model.py:269-274): 49 patches of 32px, conv clip projection."""
    from eventpretrain_tpu.models.swin import swin_tiny_window7

    bn_groups = bk.pop("bn_groups", 1)
    backbone = swin_tiny_window7(
        num_bins=num_bins, with_rec_decoders=with_decoder, dtype=dtype,
        name="backbone", **bk,
    )
    num_patches = (bk.get("input_size", 224) // 32) ** 2
    decoder = (
        rec_decoder_swin_tiny_patch32(frame_chans=frame_chans, dtype=dtype,
                                      num_patches=num_patches,
                                      name="pretrain_rec_decoder")
        if with_decoder else None
    )
    return PrHub(backbone=backbone, decoder=decoder, embed_dim=768,
                 num_patches=num_patches, clip_proj_conv=True, dtype=dtype,
                 bn_groups=bn_groups)
