"""Dense-task hub: backbone pyramid -> UPerHead + FCNHead.

Equivalent of reference model/finetune_dense/ft_dense_hub_model.py:8-279: the
backbone's 4-scale pyramid feeds the UPer decode head and the FCN auxiliary
head; per-backbone in_channels follow the reference factory grid
(ft_dense_decoder.py:204-258).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from eventpretrain_tpu.models.dense_heads import UPerHead, FCNHead


class FtDenseHub(nn.Module):
    backbone: nn.Module
    num_classes: int            # semseg: classes; flow: 2 (u, v)
    decode_in_channels: Sequence[int]
    decode_channels: int = 384
    aux_channels: int = 256
    aux_in_index: int = 2
    sample_mode: str = "bilinear"  # reference --sample_mode
    # reference heads hardcode Dropout2d(0.1) (ft_dense_decoder.py:25-34);
    # exposed so deterministic runs (parity tests) can turn it off
    decode_dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        """Returns (emb_h, out_embs, decode_predict, aux_predict)."""
        out = self.backbone.encode_dense(
            x, deterministic=not train, return_attn=False,
            return_pyramid=True,
        )
        if len(out) == 3:
            # ECDP/MEM backbones return (emb, out_embs, attn) — reference
            # ft_dense_hub_model.py:249-255 forward branch
            emb_h, out_embs = out[0], out[1]
        else:
            emb_h, out_embs = out[2], out[3]
        decode = UPerHead(
            in_channels=self.decode_in_channels,
            channels=self.decode_channels,
            num_classes=self.num_classes,
            sample_mode=self.sample_mode,
            dropout_ratio=self.decode_dropout,
            dtype=self.dtype,
            name="decode_head",
        )(out_embs, train)
        aux = FCNHead(
            channels=self.aux_channels,
            num_classes=self.num_classes,
            in_index=self.aux_in_index,
            dropout_ratio=self.decode_dropout,
            dtype=self.dtype,
            name="auxiliary_head",
        )(out_embs, train)
        return emb_h, out_embs, decode, aux


def dense_hub_vit_small(num_classes: int, num_bins: int = 5,
                        dtype: Any = jnp.float32, **bk) -> FtDenseHub:
    """ViT-S: 4x 14^2 maps at 384 (reference finetune_decode_head_small)."""
    from eventpretrain_tpu.models.vit import vit_small_patch16

    backbone = vit_small_patch16(num_bins=num_bins, dtype=dtype,
                                 name="backbone", **bk)
    return FtDenseHub(
        backbone=backbone, num_classes=num_classes,
        decode_in_channels=(384, 384, 384, 384), dtype=dtype,
    )


def dense_hub_vit_base(num_classes: int, num_bins: int = 5,
                       dtype: Any = jnp.float32, **bk) -> FtDenseHub:
    from eventpretrain_tpu.models.vit import vit_base_patch16

    backbone = vit_base_patch16(num_bins=num_bins, dtype=dtype,
                                name="backbone", **bk)
    return FtDenseHub(
        backbone=backbone, num_classes=num_classes,
        decode_in_channels=(768, 768, 768, 768), dtype=dtype,
    )


def dense_hub_convvit_small(num_classes: int, num_bins: int = 5,
                            dtype: Any = jnp.float32, **bk) -> FtDenseHub:
    """ConvViT-S pyramid [56^2x128, 28^2x256, 14^2x384, 6^2x384]
    (reference finetune_decode_head_extend_small)."""
    from eventpretrain_tpu.models.convvit import convvit_small_patch16

    backbone = convvit_small_patch16(
        num_bins=num_bins, with_rec_decoders=False, with_fpn=True,
        dtype=dtype, name="backbone", **bk,
    )
    return FtDenseHub(
        backbone=backbone, num_classes=num_classes,
        decode_in_channels=(128, 256, 384, 384), dtype=dtype,
    )


def dense_hub_convvit_base(num_classes: int, num_bins: int = 5,
                           dtype: Any = jnp.float32, **bk) -> FtDenseHub:
    from eventpretrain_tpu.models.convvit import convvit_base_patch16

    backbone = convvit_base_patch16(
        num_bins=num_bins, with_rec_decoders=False, with_fpn=True,
        dtype=dtype, name="backbone", **bk,
    )
    return FtDenseHub(
        backbone=backbone, num_classes=num_classes,
        decode_in_channels=(256, 384, 768, 768), dtype=dtype,
    )


def dense_hub_swin_tiny(num_classes: int, num_bins: int = 5,
                        dtype: Any = jnp.float32, **bk) -> FtDenseHub:
    """Swin-T pyramid [56^2x96, 28^2x192, 14^2x384, 7^2x768]
    (reference finetune_decode_head_extend_small_swin)."""
    from eventpretrain_tpu.models.swin import swin_tiny_window7

    backbone = swin_tiny_window7(
        num_bins=num_bins, with_rec_decoders=False, dtype=dtype,
        name="backbone", **bk,
    )
    return FtDenseHub(
        backbone=backbone, num_classes=num_classes,
        decode_in_channels=(96, 192, 384, 768), dtype=dtype,
    )


def dense_hub_vit_ecdp_small(num_classes: int, num_bins: int = 2,
                             dtype: Any = jnp.float32, **bk) -> FtDenseHub:
    """ViT-ECDP-S: 4x 14^2 token maps at 384 (reference
    ft_dense_hub_model.py:108-125 + finetune_decode_head_small)."""
    from eventpretrain_tpu.models.vit_ecdp import vit_ecdp_small_patch16

    backbone = vit_ecdp_small_patch16(num_bins=num_bins, dtype=dtype,
                                      name="backbone", **bk)
    return FtDenseHub(
        backbone=backbone, num_classes=num_classes,
        decode_in_channels=(384, 384, 384, 384), dtype=dtype,
    )


def dense_hub_vit_ecdp_base(num_classes: int, num_bins: int = 2,
                            dtype: Any = jnp.float32, **bk) -> FtDenseHub:
    """Reference ft_dense_hub_model.py:126-142 + finetune_decode_head_base."""
    from eventpretrain_tpu.models.vit_ecdp import vit_ecdp_base_patch16

    backbone = vit_ecdp_base_patch16(num_bins=num_bins, dtype=dtype,
                                     name="backbone", **bk)
    return FtDenseHub(
        backbone=backbone, num_classes=num_classes,
        decode_in_channels=(768, 768, 768, 768), dtype=dtype,
    )


def dense_hub_convvit_ecdp_small(num_classes: int, num_bins: int = 2,
                                 dtype: Any = jnp.float32, **bk) -> FtDenseHub:
    """ConvViT-ECDP-S (reference ft_dense_hub_model.py:143-160; the
    reference's own dense forward is an unpack crash — see
    models/convvit_ecdp.py out_indices note — repaired here with
    vit_ecdp-style 14^2 token taps)."""
    from eventpretrain_tpu.models.convvit_ecdp import (
        convvit_ecdp_small_patch16,
    )

    backbone = convvit_ecdp_small_patch16(num_bins=num_bins, dtype=dtype,
                                          name="backbone", **bk)
    return FtDenseHub(
        backbone=backbone, num_classes=num_classes,
        decode_in_channels=(384, 384, 384, 384), dtype=dtype,
    )


def dense_hub_convvit_ecdp_base(num_classes: int, num_bins: int = 2,
                                dtype: Any = jnp.float32, **bk) -> FtDenseHub:
    """Reference ft_dense_hub_model.py:161-177."""
    from eventpretrain_tpu.models.convvit_ecdp import (
        convvit_ecdp_base_patch16,
    )

    backbone = convvit_ecdp_base_patch16(num_bins=num_bins, dtype=dtype,
                                         name="backbone", **bk)
    return FtDenseHub(
        backbone=backbone, num_classes=num_classes,
        decode_in_channels=(768, 768, 768, 768), dtype=dtype,
    )


def dense_hub_vit_mem_small(num_classes: int, num_bins: int = 3,
                            dtype: Any = jnp.float32, **bk) -> FtDenseHub:
    """ViT-MEM-S (reference ft_dense_hub_model.py:178-195 +
    finetune_decode_head_small)."""
    from eventpretrain_tpu.models.vit_mem import vit_mem_small_patch16

    backbone = vit_mem_small_patch16(num_bins=num_bins, dtype=dtype,
                                     name="backbone", **bk)
    return FtDenseHub(
        backbone=backbone, num_classes=num_classes,
        decode_in_channels=(384, 384, 384, 384), dtype=dtype,
    )


def dense_hub_vit_mem_base(num_classes: int, num_bins: int = 3,
                           dtype: Any = jnp.float32, **bk) -> FtDenseHub:
    """Reference ft_dense_hub_model.py:196-214."""
    from eventpretrain_tpu.models.vit_mem import vit_mem_base_patch16

    backbone = vit_mem_base_patch16(num_bins=num_bins, dtype=dtype,
                                    name="backbone", **bk)
    return FtDenseHub(
        backbone=backbone, num_classes=num_classes,
        decode_in_channels=(768, 768, 768, 768), dtype=dtype,
    )


def dense_hub_swin_ecddp_tiny(num_classes: int, num_bins: int = 5,
                              dtype: Any = jnp.float32, **bk) -> FtDenseHub:
    """Swin-ECDDP-T pyramid with per-index norms (reference
    ft_dense_hub_model.py:216-232 + finetune_decode_head_extend_small_swin)."""
    from eventpretrain_tpu.models.swin_ecddp import swin_ecddp_tiny_window7

    backbone = swin_ecddp_tiny_window7(
        num_bins=num_bins, dtype=dtype, name="backbone", **bk
    )
    return FtDenseHub(
        backbone=backbone, num_classes=num_classes,
        decode_in_channels=(96, 192, 384, 768), dtype=dtype,
    )
