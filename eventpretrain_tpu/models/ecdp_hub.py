"""ECDP baseline hub: query/EMA-key encoders, dual heads, clip projection.

Structural equivalent of reference model/pretrain/pr_ecdp_hub_model.py:11-302.
The EMA ("momentum") encoder is not a second module: it is the SAME
``encoder`` submodule applied with the EMA parameter tree held in
``TrainState.ema_params`` and updated by ``objectives.ecdp.ema_update``
(the reference mutates a deep-copied module, pr_ecdp_hub_model.py:87-126).
The encoder subtree covers the backbone and both projection heads, matching
the reference's ``backbone.{event,image}_head_proj`` attachment (:91-94).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from eventpretrain_tpu.models.layers import ProjectorMlp


class EcdpEncoder(nn.Module):
    """Backbone + event/image projection heads (EMA-covered subtree)."""

    backbone: nn.Module
    proj_dim: int = 256
    mlp_dim: int = 4096
    proj_mlp_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, img: jax.Array, ids_keep: jax.Array, train: bool = False,
        project_image: bool = True, mask: Optional[jax.Array] = None,
    ):
        emb_event, emb_image, attn = self.backbone.encode_masked(
            img, ids_keep, deterministic=not train, mask=mask
        )
        ev = ProjectorMlp(
            num_layers=self.proj_mlp_layers, mlp_dim=self.mlp_dim,
            out_dim=self.proj_dim, dtype=self.dtype, name="event_head_proj",
        )(emb_event, train)
        im = None
        if project_image:
            im = ProjectorMlp(
                num_layers=self.proj_mlp_layers, mlp_dim=self.mlp_dim,
                out_dim=self.proj_dim, dtype=self.dtype,
                name="image_head_proj",
            )(emb_image, train)
        return ev, im, emb_event, emb_image, attn


class EcdpModel(nn.Module):
    """Query-side heads + clip projection around an EcdpEncoder."""

    encoder: EcdpEncoder
    proj_dim: int = 256
    mlp_dim: int = 4096
    pred_mlp_layers: int = 2
    clip_emb_dim: int = 512
    dtype: Any = jnp.float32

    def setup(self):
        self.event_head_pred = ProjectorMlp(
            num_layers=self.pred_mlp_layers, mlp_dim=self.mlp_dim,
            out_dim=self.proj_dim, dtype=self.dtype, name="event_head_pred",
        )
        self.image_head_pred = ProjectorMlp(
            num_layers=self.pred_mlp_layers, mlp_dim=self.mlp_dim,
            out_dim=self.proj_dim, dtype=self.dtype, name="image_head_pred",
        )
        self.clip_emb_proj = nn.Dense(
            self.proj_dim, use_bias=False, dtype=self.dtype,
            name="clip_emb_proj",
        )

    def forward_query(
        self, img_q: jax.Array, ids_keep: jax.Array, clip_emb: jax.Array,
        train: bool = False, mask: Optional[jax.Array] = None,
    ):
        """Returns (q_event, q_image, clip_proj) (pr_ecdp_hub_model.py:238-255)."""
        ev, im, *_ = self.encoder(img_q, ids_keep, train, mask=mask)
        q_event = self.event_head_pred(ev, train)
        q_image = self.image_head_pred(im, train)
        clip_proj = self.clip_emb_proj(clip_emb)
        return q_event, q_image, clip_proj

    def forward_key(
        self, img_k: jax.Array, ids_keep: jax.Array, train: bool = False,
        mask: Optional[jax.Array] = None,
    ):
        """EMA-key path: event projection only (pr_ecdp_hub_model.py:248-252).

        Apply with {'params': {'encoder': ema_params}}.
        """
        ev, *_ = self.encoder(img_k, ids_keep, train, project_image=False,
                              mask=mask)
        return ev

    def __call__(self, img_q, ids_keep, clip_emb, train: bool = False):
        return self.forward_query(img_q, ids_keep, clip_emb, train)


def ecdp_model_small(num_bins: int = 2, dtype: Any = jnp.float32,
                     **bk) -> EcdpModel:
    """Reference pretrain_ecdp_model_small_patch16 (pr_ecdp_hub_model.py:277-282)."""
    from eventpretrain_tpu.models.vit_ecdp import vit_ecdp_small_patch16

    backbone = vit_ecdp_small_patch16(
        num_bins=num_bins, dtype=dtype, name="backbone", **bk
    )
    encoder = EcdpEncoder(backbone=backbone, dtype=dtype, name="encoder")
    return EcdpModel(encoder=encoder, dtype=dtype)


def ecdp_model_base(num_bins: int = 2, dtype: Any = jnp.float32,
                    **bk) -> EcdpModel:
    from eventpretrain_tpu.models.vit_ecdp import vit_ecdp_base_patch16

    backbone = vit_ecdp_base_patch16(
        num_bins=num_bins, dtype=dtype, name="backbone", **bk
    )
    encoder = EcdpEncoder(backbone=backbone, dtype=dtype, name="encoder")
    return EcdpModel(encoder=encoder, dtype=dtype)


def ecdp_model_convvit_small(num_bins: int = 2, dtype: Any = jnp.float32,
                             **bk) -> EcdpModel:
    """Reference convvit_ecdp variant (pr_ecdp_hub_model.py:55-83)."""
    from eventpretrain_tpu.models.convvit_ecdp import convvit_ecdp_small_patch16

    backbone = convvit_ecdp_small_patch16(
        num_bins=num_bins, dtype=dtype, name="backbone", **bk
    )
    encoder = EcdpEncoder(backbone=backbone, dtype=dtype, name="encoder")
    return EcdpModel(encoder=encoder, dtype=dtype)


def ecdp_model_convvit_base(num_bins: int = 2, dtype: Any = jnp.float32,
                            **bk) -> EcdpModel:
    from eventpretrain_tpu.models.convvit_ecdp import convvit_ecdp_base_patch16

    backbone = convvit_ecdp_base_patch16(
        num_bins=num_bins, dtype=dtype, name="backbone", **bk
    )
    encoder = EcdpEncoder(backbone=backbone, dtype=dtype, name="encoder")
    return EcdpModel(encoder=encoder, dtype=dtype)
