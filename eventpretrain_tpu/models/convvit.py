"""ConvViT (ConvMAE-style) backbone: 2 masked conv stages + ViT stage.

TPU-native redesign of reference model/backbone/convvit.py:12-224 and
model/sub_module/conv_block.py:6-51 (channels-last, separate
encode_masked/encode_dense methods, masking decided outside):

- stage 1: PatchEmbed 4x (LN+GELU conv) -> ConvBlocks @56^2, dim d0
- stage 2: PatchEmbed 2x -> ConvBlocks @28^2, dim d1
- stage 3: PatchEmbed 2x -> Linear patch_embed4 -> 11 ViT blocks @14^2, d2
- masked path: the 14^2 patch mask is upsampled 4x/2x and multiplies conv
  activations (convvit.py:129-146); stage outputs are strided-conv-decoded to
  d2 and gathered at kept ids, fused as norm(s1+s2+s3) (convvit.py:137-169)
- dense path: 4-scale pyramid [56^2 d0, 28^2 d1, 14^2 d2, 6^2 d2] with an
  extra stride-2 fpn conv (convvit.py:53-58,200-205)
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from eventpretrain_tpu.models.layers import PatchEmbed, ViTBlock, DropPath
from eventpretrain_tpu.ops.pos_embed import get_2d_sincos_pos_embed
from eventpretrain_tpu.ops.reshape import emb2patch_frame


class CMlp(nn.Module):
    """1x1-conv MLP (reference conv_block.py:6-22)."""

    hidden_dim: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_dim = x.shape[-1]
        x = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic)
        x = nn.Conv(out_dim, (1, 1), dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic)
        return x


class ConvBlock(nn.Module):
    """LN -> 1x1 conv -> (mask) -> depthwise kxk -> 1x1 conv, + CMlp.

    Parity with reference conv_block.py:25-51; the optional binary mask
    (1=visible) multiplies after conv1, before the depthwise conv.
    """

    kernel_size: int = 5
    mlp_ratio: float = 4.0
    drop: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        dim = x.shape[-1]
        # torch nn.LayerNorm default eps (reference conv_block.py:28,37)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        y = nn.Conv(dim, (1, 1), dtype=self.dtype, name="conv1")(y)
        if mask is not None:
            y = y * mask[..., None]
        y = nn.Conv(
            dim, (self.kernel_size, self.kernel_size),
            padding=self.kernel_size // 2, feature_group_count=dim,
            dtype=self.dtype, name="attn",
        )(y)
        y = nn.Conv(dim, (1, 1), dtype=self.dtype, name="conv2")(y)
        x = x + DropPath(self.drop_path_rate)(y, deterministic)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = CMlp(
            hidden_dim=int(dim * self.mlp_ratio), dropout=self.drop,
            dtype=self.dtype, name="mlp",
        )(y, deterministic)
        x = x + DropPath(self.drop_path_rate)(y, deterministic)
        return x


def _upsample_mask(mask: jax.Array, grid: int, factor: int) -> jax.Array:
    """(B, grid^2) patch mask -> (B, grid*factor, grid*factor) pixel-ish mask."""
    m = mask.reshape(-1, grid, grid)
    m = jnp.repeat(jnp.repeat(m, factor, axis=1), factor, axis=2)
    return m


class ConvViT(nn.Module):
    input_size: int = 224
    patch_sizes: Sequence[int] = (4, 2, 2)
    embed_dims: Sequence[int] = (128, 256, 384)
    depths: Sequence[int] = (2, 2, 11)
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_bins: int = 5
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    use_feature_fusion: bool = True
    with_rec_decoders: bool = True   # stage{1,2}_output_decode convs
    with_fpn: bool = False           # dense-task extra pyramid level
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

        dpr = [
            float(r) for r in np.linspace(0, self.drop_path_rate, sum(self.depths))
        ]
        conv_cls = (
            nn.remat(ConvBlock, static_argnums=(3,))
            if self.use_remat else ConvBlock
        )
        vit_cls = (
            nn.remat(ViTBlock, static_argnums=(2, 3))
            if self.use_remat else ViTBlock
        )
        self.conv_block1 = [
            conv_cls(
                kernel_size=5, mlp_ratio=4.0, drop=self.drop_rate,
                drop_path_rate=dpr[i], dtype=self.dtype,
                name=f"conv_block1_{i}",
            )
            for i in range(self.depths[0])
        ]
        # NOTE: the reference sizes conv_block2 with depth[0] (convvit.py:36-38)
        self.conv_block2 = [
            conv_cls(
                kernel_size=5, mlp_ratio=4.0, drop=self.drop_rate,
                drop_path_rate=dpr[self.depths[0] + i], dtype=self.dtype,
                name=f"conv_block2_{i}",
            )
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
        if self.with_rec_decoders:
            self.stage1_output_decode = nn.Conv(
                d2, (4, 4), strides=(4, 4), padding="VALID", dtype=self.dtype,
                name="stage1_output_decode",
            )
            self.stage2_output_decode = nn.Conv(
                d2, (2, 2), strides=(2, 2), padding="VALID", dtype=self.dtype,
                name="stage2_output_decode",
            )
        self.norm_layer = nn.LayerNorm(
            epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm_layer"
        )
        if self.with_fpn:
            self.fpn_conv = nn.Conv(
                self.embed_dims[-1], (3, 3), strides=(2, 2), padding="VALID",
                dtype=self.dtype, name="fpn_conv",
            )
            self.fpn_bn = nn.BatchNorm(dtype=jnp.float32, name="fpn_bn")
        self.pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(self.embed_dims[-1], self.grid_size)
        )[None]

    def _stages_to_tokens(self, x, deterministic):
        x = self.patch_embed3(x)
        x = x.reshape(x.shape[0], -1, x.shape[-1])
        x = self.patch_embed4(x)
        return x + self.pos_embed.astype(x.dtype)

    def encode_masked(
        self, x: jax.Array, ids_keep: jax.Array,
        deterministic: bool = True, mask: jax.Array | None = None,
    ):
        """Masked encoding (reference convvit.py:126-171).

        Needs the full binary ``mask`` (0=keep) in addition to ``ids_keep``
        to gate the conv stages. Returns (emb_l1_map, emb_l2_map, emb_lh).
        """
        assert mask is not None, "ConvViT.encode_masked requires the full mask"
        grid = self.grid_size
        f1 = self.patch_sizes[1] * self.patch_sizes[2]  # 14 -> 56 factor 4
        f2 = self.patch_sizes[2]                        # 14 -> 28 factor 2
        vis1 = 1.0 - _upsample_mask(mask, grid, f1)
        vis2 = 1.0 - _upsample_mask(mask, grid, f2)

        x = self.patch_embed1(x)
        for blk in self.conv_block1:
            x = blk(x, vis1, deterministic)
        emb_l1 = x
        s1 = self.stage1_output_decode(x)
        s1 = s1.reshape(s1.shape[0], -1, s1.shape[-1])
        s1 = jnp.take_along_axis(s1, ids_keep[..., None].astype(jnp.int32), 1)

        x = self.patch_embed2(x)
        for blk in self.conv_block2:
            x = blk(x, vis2, deterministic)
        emb_l2 = x
        s2 = self.stage2_output_decode(x)
        s2 = s2.reshape(s2.shape[0], -1, s2.shape[-1])
        s2 = jnp.take_along_axis(s2, ids_keep[..., None].astype(jnp.int32), 1)

        x = self._stages_to_tokens(x, deterministic)
        x = jnp.take_along_axis(x, ids_keep[..., None].astype(jnp.int32), 1)
        for blk in self.vit_block:
            x = blk(x, deterministic, False)
        s3 = x

        if self.use_feature_fusion:
            emb_lh = self.norm_layer(s1 + s2 + s3)
        else:
            emb_lh = self.norm_layer(s3)
        return emb_l1, emb_l2, emb_lh

    def encode_dense(
        self, x: jax.Array, deterministic: bool = True,
        return_attn: bool = False, return_pyramid: bool = False,
    ):
        """Dense encoding (reference convvit.py:173-207).

        Returns (emb_l1_map, emb_l2_map, emb_h_tokens, out_embs, attn);
        out_embs (when requested) is the 4-scale channels-last pyramid.
        """
        x = self.patch_embed1(x)
        for blk in self.conv_block1:
            x = blk(x, None, deterministic)
        emb_l1 = x

        x = self.patch_embed2(x)
        for blk in self.conv_block2:
            x = blk(x, None, deterministic)
        emb_l2 = x

        x = self._stages_to_tokens(x, deterministic)
        attn = None
        last = len(self.vit_block) - 1
        for i, blk in enumerate(self.vit_block):
            if i == last and return_attn:
                x, attn = blk(x, deterministic, True)
            else:
                x = blk(x, deterministic, False)
        emb_h = self.norm_layer(x)

        out_embs = []
        if return_pyramid:
            emb_h1 = emb2patch_frame(emb_h)
            emb_h2 = nn.gelu(
                self.fpn_bn(
                    self.fpn_conv(emb_h1),
                    use_running_average=deterministic,
                ),
                approximate=False,
            )
            out_embs = [emb_l1, emb_l2, emb_h1, emb_h2]
        return emb_l1, emb_l2, emb_h, out_embs, attn

    def __call__(self, x, deterministic: bool = True):
        return self.encode_dense(x, deterministic)


def convvit_small_patch16(**kwargs) -> ConvViT:
    """Reference convvit.py:210-216."""
    cfg = dict(
        input_size=224, patch_sizes=(4, 2, 2), embed_dims=(128, 256, 384),
        depths=(2, 2, 11), num_heads=12, mlp_ratio=4.0,
    )
    cfg.update(kwargs)
    return ConvViT(**cfg)


def convvit_base_patch16(**kwargs) -> ConvViT:
    """Reference convvit.py:218-224."""
    cfg = dict(
        input_size=224, patch_sizes=(4, 2, 2), embed_dims=(256, 384, 768),
        depths=(2, 2, 11), num_heads=12, mlp_ratio=4.0,
    )
    cfg.update(kwargs)
    return ConvViT(**cfg)
