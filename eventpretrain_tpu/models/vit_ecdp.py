"""ViT-ECDP backbone: ViT with two learnable [event, image] tokens.

Parity with reference model/backbone/vit_ecdp.py:11-168: plain conv patch
embed (no LN/GELU), sincos pos-embed added to patch tokens only, the two
learned tokens prepended after masking; masked path returns the two token
embeddings separately, dense path returns their concatenation (2*dim).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from eventpretrain_tpu.models.layers import PatchEmbed, ViTBlock
from eventpretrain_tpu.ops.pos_embed import get_2d_sincos_pos_embed
from eventpretrain_tpu.ops.reshape import emb2patch_frame


class ViTECDP(nn.Module):
    input_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_indices: Sequence[int] = (3, 5, 7, 11)
    num_bins: int = 2
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    layer_norm_eps: float = 1e-6
    use_remat: bool = False  # jax.checkpoint blocks (reference --use_checkpoint)
    dtype: Any = jnp.float32

    @property
    def grid_size(self) -> int:
        return self.input_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size ** 2

    def setup(self):
        self.patch_embed = PatchEmbed(
            patch_size=self.patch_size, embed_dim=self.embed_dim,
            use_norm_act=False, dtype=self.dtype, name="patch_embed",
        )
        self.tokens = self.param(
            "tokens", nn.initializers.zeros, (1, 2, self.embed_dim)
        )
        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate, self.depth)]
        block_cls = (
            nn.remat(ViTBlock, static_argnums=(2, 3))
            if self.use_remat else ViTBlock
        )
        self.vit_block = [
            block_cls(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=True, drop=self.drop_rate,
                attn_drop=self.attn_drop_rate, drop_path_rate=dpr[i],
                layer_norm_eps=self.layer_norm_eps, dtype=self.dtype,
                name=f"vit_block_{i}",
            )
            for i in range(self.depth)
        ]
        self.norm_layer = nn.LayerNorm(
            epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm_layer"
        )
        self.pos_drop = nn.Dropout(self.drop_rate)
        self.pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(self.embed_dim, self.grid_size)
        )[None]

    def _embed(self, x, deterministic):
        x = self.patch_embed(x)
        x = x.reshape(x.shape[0], -1, x.shape[-1])
        x = x + self.pos_embed.astype(x.dtype)
        if self.drop_rate > 0:
            x = self.pos_drop(x, deterministic)
        return x

    def _prepend_tokens(self, x):
        tok = jnp.broadcast_to(
            self.tokens.astype(x.dtype), (x.shape[0], 2, x.shape[-1])
        )
        return jnp.concatenate([tok, x], axis=1)

    def encode_masked(
        self, x: jax.Array, ids_keep: jax.Array,
        deterministic: bool = True, mask: Optional[jax.Array] = None,
        return_attn: bool = False,
    ):
        """Returns (emb_event, emb_image, attn): the two token embeddings
        after the final norm (reference vit_ecdp.py:106-126)."""
        x = self._embed(x, deterministic)
        x = jnp.take_along_axis(
            x, ids_keep[..., None].astype(jnp.int32), axis=1
        )
        x = self._prepend_tokens(x)
        attn = None
        last = self.depth - 1
        for i, blk in enumerate(self.vit_block):
            if i == last and return_attn:
                x, attn = blk(x, deterministic, True)
            else:
                x = blk(x, deterministic, False)
        x = self.norm_layer(x)
        return x[:, 0], x[:, 1], attn

    def encode_dense(
        self, x: jax.Array, deterministic: bool = True,
        return_attn: bool = False, return_pyramid: bool = False,
    ):
        """Returns (emb, out_embs, attn): emb = concat(token0, token1)
        (reference vit_ecdp.py:127-151)."""
        x = self._embed(x, deterministic)
        x = self._prepend_tokens(x)
        out_embs = []
        attn = None
        last = self.depth - 1
        for i, blk in enumerate(self.vit_block):
            if i == last and return_attn:
                x, attn = blk(x, deterministic, True)
            else:
                x = blk(x, deterministic, False)
            if return_pyramid and i in self.out_indices:
                out_embs.append(emb2patch_frame(x[:, 2:, :]))
        x = self.norm_layer(x)
        emb = jnp.concatenate([x[:, 0], x[:, 1]], axis=1)
        return emb, out_embs, attn

    def __call__(self, x, deterministic: bool = True):
        return self.encode_dense(x, deterministic)


def vit_ecdp_small_patch16(**kwargs) -> ViTECDP:
    cfg = dict(input_size=224, patch_size=16, embed_dim=384, depth=12,
               num_heads=12)
    cfg.update(kwargs)
    return ViTECDP(**cfg)


def vit_ecdp_base_patch16(**kwargs) -> ViTECDP:
    cfg = dict(input_size=224, patch_size=16, embed_dim=768, depth=12,
               num_heads=12)
    cfg.update(kwargs)
    return ViTECDP(**cfg)
