"""MAE-style reconstruction decoder for masked modeling.

Parity with reference model/pretrain/pr_rec_decoder.py:10-95: linear embed of
encoder features, learned mask token inserted and unshuffled by
``ids_restore``, fixed sincos pos-embed, 8 ViT blocks, linear prediction to
``patch_size**2 * frame_chans`` per token.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from eventpretrain_tpu.models.layers import ViTBlock
from eventpretrain_tpu.ops.pos_embed import get_2d_sincos_pos_embed


class RecDecoder(nn.Module):
    patch_size: int = 16
    num_patches: int = 196
    embed_dim: int = 256
    depth: int = 8
    num_heads: int = 8
    mlp_ratio: float = 4.0
    frame_chans: int = 1
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        ids_restore: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """x: (B, K, D_enc) visible tokens -> (B, L, patch_size**2 * chans)."""
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="patch_embed")(x)

        if ids_restore is not None:
            mask_token = self.param(
                "mask_token",
                nn.initializers.zeros,
                (1, 1, self.embed_dim),
            )
            b, k, d = x.shape
            num_masked = ids_restore.shape[1] - k
            mask_tokens = jnp.broadcast_to(
                mask_token.astype(x.dtype), (b, num_masked, d)
            )
            x = jnp.concatenate([x, mask_tokens], axis=1)
            x = jnp.take_along_axis(
                x, ids_restore[..., None].astype(jnp.int32), axis=1
            )

        grid = int(self.num_patches ** 0.5)
        pos = jnp.asarray(get_2d_sincos_pos_embed(self.embed_dim, grid))[None]
        x = x + pos.astype(x.dtype)

        for i in range(self.depth):
            x = ViTBlock(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=True,
                layer_norm_eps=self.layer_norm_eps,
                dtype=self.dtype,
                name=f"vit_block_{i}",
            )(x, deterministic)
        x = nn.LayerNorm(
            epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm"
        )(x)
        x = nn.Dense(
            self.patch_size ** 2 * self.frame_chans,
            dtype=self.dtype,
            name="pred",
        )(x)
        return x


def rec_decoder_small_patch16(frame_chans: int = 1, **kwargs) -> RecDecoder:
    """Reference pr_rec_decoder.py:73-79."""
    return RecDecoder(
        patch_size=16, embed_dim=256, depth=8, num_heads=8,
        frame_chans=frame_chans, **{"num_patches": 196, **kwargs},
    )


def rec_decoder_swin_tiny_patch32(frame_chans: int = 1, **kwargs) -> RecDecoder:
    """Reference pr_rec_decoder.py:81-87."""
    return RecDecoder(
        patch_size=32, embed_dim=256, depth=8, num_heads=8,
        frame_chans=frame_chans, **{"num_patches": 49, **kwargs},
    )


def rec_decoder_base_patch16(frame_chans: int = 1, **kwargs) -> RecDecoder:
    """Reference pr_rec_decoder.py:89-95."""
    return RecDecoder(
        patch_size=16, embed_dim=512, depth=8, num_heads=16,
        frame_chans=frame_chans, **{"num_patches": 196, **kwargs},
    )
