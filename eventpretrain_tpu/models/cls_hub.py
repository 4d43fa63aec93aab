"""Classification hub: backbone + linear head.

Equivalent of reference model/finetune_cls/ft_cls_hub_model.py:7-152:
mean-pooled tokens -> Linear(num_classes) for vit/convvit/swin backbones;
token-pair concat for ECDP variants (when those backbones land). Backbone
construction is explicit composition, not an args-object dispatch table.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from eventpretrain_tpu.models.vit import vit_small_patch16, vit_base_patch16


class FtClsHub(nn.Module):
    backbone: nn.Module
    num_classes: int
    pool: str = "mean"  # 'mean' (vit/convvit/swin) | 'token_concat' (ecdp)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        return_attn: bool = False,
    ):
        """Returns (emb_h, logits, attn). Reference ft_cls_hub_model.py:118-139."""
        out = self.backbone.encode_dense(
            x,
            deterministic=not train,
            return_attn=return_attn,
            return_pyramid=False,
        )
        if len(out) == 3:
            # ECDP/MEM backbones return an already-pooled embedding
            # (token concat / mean pool, reference ft_cls_hub_model.py:118-125)
            emb_h, _, attn = out
            pooled = emb_h
        else:
            emb_h, attn = out[2], out[4]
            if self.pool == "mean":
                pooled = emb_h.mean(axis=1)
            elif self.pool == "token_concat":
                pooled = emb_h.reshape(emb_h.shape[0], -1)
            else:
                raise ValueError(self.pool)
        logits = nn.Dense(
            self.num_classes, dtype=self.dtype, name="classify_head"
        )(pooled)
        return emb_h, logits, attn


def cls_hub_vit_small(num_classes: int, num_bins: int = 5,
                      dtype: Any = jnp.float32, **bk) -> FtClsHub:
    backbone = vit_small_patch16(
        num_bins=num_bins, dtype=dtype, name="backbone", **bk
    )
    return FtClsHub(backbone=backbone, num_classes=num_classes, dtype=dtype)


def cls_hub_vit_base(num_classes: int, num_bins: int = 5,
                     dtype: Any = jnp.float32, **bk) -> FtClsHub:
    backbone = vit_base_patch16(
        num_bins=num_bins, dtype=dtype, name="backbone", **bk
    )
    return FtClsHub(backbone=backbone, num_classes=num_classes, dtype=dtype)


def cls_hub_convvit_small(num_classes: int, num_bins: int = 5,
                          dtype: Any = jnp.float32, **bk) -> FtClsHub:
    from eventpretrain_tpu.models.convvit import convvit_small_patch16

    backbone = convvit_small_patch16(
        num_bins=num_bins, with_rec_decoders=False, dtype=dtype,
        name="backbone", **bk,
    )
    return FtClsHub(backbone=backbone, num_classes=num_classes, dtype=dtype)


def cls_hub_convvit_base(num_classes: int, num_bins: int = 5,
                         dtype: Any = jnp.float32, **bk) -> FtClsHub:
    from eventpretrain_tpu.models.convvit import convvit_base_patch16

    backbone = convvit_base_patch16(
        num_bins=num_bins, with_rec_decoders=False, dtype=dtype,
        name="backbone", **bk,
    )
    return FtClsHub(backbone=backbone, num_classes=num_classes, dtype=dtype)


def cls_hub_swin_tiny(num_classes: int, num_bins: int = 5,
                      dtype: Any = jnp.float32, **bk) -> FtClsHub:
    from eventpretrain_tpu.models.swin import swin_tiny_window7

    backbone = swin_tiny_window7(
        num_bins=num_bins, with_rec_decoders=False, dtype=dtype,
        name="backbone", **bk,
    )
    return FtClsHub(backbone=backbone, num_classes=num_classes, dtype=dtype)


def cls_hub_vit_ecdp_small(num_classes: int, num_bins: int = 2,
                           dtype: Any = jnp.float32, **bk) -> FtClsHub:
    """ECDP cls head over concat(event, image) tokens
    (reference ft_cls_hub_model.py:101-104,118-125)."""
    from eventpretrain_tpu.models.vit_ecdp import vit_ecdp_small_patch16

    backbone = vit_ecdp_small_patch16(
        num_bins=num_bins, dtype=dtype, name="backbone", **bk
    )
    return FtClsHub(backbone=backbone, num_classes=num_classes, dtype=dtype)


def cls_hub_vit_ecdp_base(num_classes: int, num_bins: int = 2,
                          dtype: Any = jnp.float32, **bk) -> FtClsHub:
    from eventpretrain_tpu.models.vit_ecdp import vit_ecdp_base_patch16

    backbone = vit_ecdp_base_patch16(
        num_bins=num_bins, dtype=dtype, name="backbone", **bk
    )
    return FtClsHub(backbone=backbone, num_classes=num_classes, dtype=dtype)


def cls_hub_convvit_ecdp_small(num_classes: int, num_bins: int = 2,
                               dtype: Any = jnp.float32, **bk) -> FtClsHub:
    """ConvViT-ECDP cls head over concat(event, image) tokens
    (reference ft_cls_hub_model.py:143-177: Linear(2*embed_dim))."""
    from eventpretrain_tpu.models.convvit_ecdp import (
        convvit_ecdp_small_patch16,
    )

    backbone = convvit_ecdp_small_patch16(
        num_bins=num_bins, dtype=dtype, name="backbone", **bk
    )
    return FtClsHub(backbone=backbone, num_classes=num_classes, dtype=dtype)


def cls_hub_convvit_ecdp_base(num_classes: int, num_bins: int = 2,
                              dtype: Any = jnp.float32, **bk) -> FtClsHub:
    from eventpretrain_tpu.models.convvit_ecdp import (
        convvit_ecdp_base_patch16,
    )

    backbone = convvit_ecdp_base_patch16(
        num_bins=num_bins, dtype=dtype, name="backbone", **bk
    )
    return FtClsHub(backbone=backbone, num_classes=num_classes, dtype=dtype)


def cls_hub_vit_mem_small(num_classes: int, num_bins: int = 3,
                          dtype: Any = jnp.float32, **bk) -> FtClsHub:
    from eventpretrain_tpu.models.vit_mem import vit_mem_small_patch16

    backbone = vit_mem_small_patch16(
        num_bins=num_bins, dtype=dtype, name="backbone", **bk
    )
    return FtClsHub(backbone=backbone, num_classes=num_classes, dtype=dtype)


def cls_hub_vit_mem_base(num_classes: int, num_bins: int = 3,
                         dtype: Any = jnp.float32, **bk) -> FtClsHub:
    from eventpretrain_tpu.models.vit_mem import vit_mem_base_patch16

    backbone = vit_mem_base_patch16(
        num_bins=num_bins, dtype=dtype, name="backbone", **bk
    )
    return FtClsHub(backbone=backbone, num_classes=num_classes, dtype=dtype)


def cls_hub_swin_ecddp_tiny(num_classes: int, num_bins: int = 5,
                            dtype: Any = jnp.float32, **bk) -> FtClsHub:
    from eventpretrain_tpu.models.swin_ecddp import swin_ecddp_tiny_window7

    backbone = swin_ecddp_tiny_window7(
        num_bins=num_bins, dtype=dtype, name="backbone", **bk
    )
    return FtClsHub(backbone=backbone, num_classes=num_classes, dtype=dtype)
