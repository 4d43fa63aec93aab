"""ConvViT-ECDP backbone: ConvMAE stages + two learned tokens at stage 3.

Parity with reference model/backbone/convvit_ecdp.py:1-203: masked conv
stages gated by the upsampled patch mask, tokens prepended after the stage-3
gather; masked path returns the two token embeddings, dense path their
concatenation.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from eventpretrain_tpu.models.convvit import ConvBlock, _upsample_mask
from eventpretrain_tpu.models.layers import PatchEmbed, ViTBlock
from eventpretrain_tpu.ops.pos_embed import get_2d_sincos_pos_embed
from eventpretrain_tpu.ops.reshape import emb2patch_frame


class ConvViTECDP(nn.Module):
    input_size: int = 224
    patch_sizes: Sequence[int] = (4, 2, 2)
    embed_dims: Sequence[int] = (128, 256, 384)
    depths: Sequence[int] = (2, 2, 11)
    # Dense-task feature taps over the stage-3 blocks. The reference's
    # convvit_ecdp has NO dense path at all — its forward returns only
    # (emb, attn) (reference convvit_ecdp.py:156-184) while
    # ft_dense_hub_model.py:249-250 unpacks three values, an unpack crash
    # for every convvit_ecdp dense config. We repair it the way
    # vit_ecdp.py:135-143 works: 4 token-map taps at 14^2 feeding the
    # in_channels=[D,D,D,D] decoder grid (ft_dense_decoder.py:226-238).
    out_indices: Sequence[int] = (2, 4, 6, 10)
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_bins: int = 2
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    layer_norm_eps: float = 1e-6
    use_remat: bool = False  # jax.checkpoint blocks (reference --use_checkpoint)
    dtype: Any = jnp.float32

    @property
    def grid_size(self) -> int:
        s = self.input_size
        for p in self.patch_sizes:
            s //= p
        return s

    @property
    def num_patches(self) -> int:
        return self.grid_size ** 2

    def setup(self):
        d0, d1, d2 = self.embed_dims
        self.patch_embed1 = PatchEmbed(
            patch_size=self.patch_sizes[0], embed_dim=d0, dtype=self.dtype,
            name="patch_embed1",
        )
        self.patch_embed2 = PatchEmbed(
            patch_size=self.patch_sizes[1], embed_dim=d1, dtype=self.dtype,
            name="patch_embed2",
        )
        self.patch_embed3 = PatchEmbed(
            patch_size=self.patch_sizes[2], embed_dim=d2, dtype=self.dtype,
            name="patch_embed3",
        )
        self.patch_embed4 = nn.Dense(d2, dtype=self.dtype, name="patch_embed4")
        self.tokens = self.param(
            "tokens", nn.initializers.zeros, (1, 2, d2)
        )
        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate,
                                             sum(self.depths))]
        conv_cls = (
            nn.remat(ConvBlock, static_argnums=(3,))
            if self.use_remat else ConvBlock
        )
        vit_cls = (
            nn.remat(ViTBlock, static_argnums=(2, 3))
            if self.use_remat else ViTBlock
        )
        self.conv_block1 = [
            conv_cls(kernel_size=5, drop=self.drop_rate, drop_path_rate=dpr[i],
                     dtype=self.dtype, name=f"conv_block1_{i}")
            for i in range(self.depths[0])
        ]
        self.conv_block2 = [
            conv_cls(kernel_size=5, drop=self.drop_rate,
                     drop_path_rate=dpr[self.depths[0] + i],
                     dtype=self.dtype, name=f"conv_block2_{i}")
            for i in range(self.depths[0])
        ]
        self.vit_block = [
            vit_cls(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=True, drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path_rate=dpr[self.depths[0] + self.depths[1] + i],
                layer_norm_eps=self.layer_norm_eps, dtype=self.dtype,
                name=f"vit_block_{i}",
            )
            for i in range(self.depths[2])
        ]
        self.norm_layer = nn.LayerNorm(
            epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm_layer"
        )
        self.pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(self.embed_dims[-1], self.grid_size)
        )[None]

    def _conv_stages(self, x, vis1, vis2, deterministic):
        x = self.patch_embed1(x)
        for blk in self.conv_block1:
            x = blk(x, vis1, deterministic)
        x = self.patch_embed2(x)
        for blk in self.conv_block2:
            x = blk(x, vis2, deterministic)
        x = self.patch_embed3(x)
        x = x.reshape(x.shape[0], -1, x.shape[-1])
        x = self.patch_embed4(x)
        return x + self.pos_embed.astype(x.dtype)

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
        assert mask is not None
        grid = self.grid_size
        f1 = self.patch_sizes[1] * self.patch_sizes[2]
        f2 = self.patch_sizes[2]
        vis1 = 1.0 - _upsample_mask(mask, grid, f1)
        vis2 = 1.0 - _upsample_mask(mask, grid, f2)
        x = self._conv_stages(x, vis1, vis2, deterministic)
        x = jnp.take_along_axis(
            x, ids_keep[..., None].astype(jnp.int32), axis=1
        )
        x = self._prepend_tokens(x)
        attn = None
        last = len(self.vit_block) - 1
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
        x = self._conv_stages(x, None, None, deterministic)
        x = self._prepend_tokens(x)
        attn = None
        out_embs = []
        last = len(self.vit_block) - 1
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


def convvit_ecdp_small_patch16(**kwargs) -> ConvViTECDP:
    cfg = dict(input_size=224, patch_sizes=(4, 2, 2),
               embed_dims=(128, 256, 384), depths=(2, 2, 11), num_heads=12)
    cfg.update(kwargs)
    return ConvViTECDP(**cfg)


def convvit_ecdp_base_patch16(**kwargs) -> ConvViTECDP:
    cfg = dict(input_size=224, patch_sizes=(4, 2, 2),
               embed_dims=(256, 384, 768), depths=(2, 2, 11), num_heads=12)
    cfg.update(kwargs)
    return ConvViTECDP(**cfg)
