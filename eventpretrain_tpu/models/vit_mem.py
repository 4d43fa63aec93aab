"""ViT-MEM backbone (BEiT-style) for the MEM baseline.

Parity with reference model/backbone/vit_mem.py:1-103 and
model/sub_module/vit_block.py:8-42,93-116,145-212,256-280: cls token, plain
conv patch embed, a SHARED relative-position-bias table passed to every
block plus per-block tables, decomposed qkv bias (k bias fixed at zero),
layer-scale (gamma) blocks, mean pool over patch tokens.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from eventpretrain_tpu.models.layers import Mlp, DropPath, PatchEmbed
from eventpretrain_tpu.ops.reshape import emb2patch_frame


def relative_position_index(window_size: tuple[int, int]) -> np.ndarray:
    """(Wh*Ww+1, Wh*Ww+1) index table incl. cls distances
    (reference vit_block.py:18-35)."""
    wh, ww = window_size
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    idx = np.zeros((wh * ww + 1, wh * ww + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel - 3
    idx[0:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx


class RelativePositionBias(nn.Module):
    """Shared bias table (reference vit_block.py:8-42)."""

    window_size: tuple[int, int]
    num_heads: int

    @nn.compact
    def __call__(self) -> jax.Array:
        wh, ww = self.window_size
        num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.zeros,
            (num_rel, self.num_heads),
        )
        idx = jnp.asarray(relative_position_index(self.window_size))
        bias = table[idx.reshape(-1)].reshape(
            wh * ww + 1, wh * ww + 1, self.num_heads
        )
        return bias.transpose(2, 0, 1)  # (nH, N, N)


class AttentionMEM(nn.Module):
    """Attention with decomposed qkv bias + per-block rel-pos table
    (reference vit_block.py:145-212)."""

    num_heads: int
    window_size: tuple[int, int]
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rel_pos_bias=None, deterministic=True):
        b, n, c = x.shape
        h = self.num_heads
        head_dim = c // h
        scale = head_dim ** -0.5

        qkv_w = nn.Dense(c * 3, use_bias=False, dtype=self.dtype, name="qkv")
        q_bias = self.param("q_bias", nn.initializers.zeros, (c,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (c,))
        bias = jnp.concatenate([q_bias, jnp.zeros((c,), q_bias.dtype), v_bias])
        qkv = qkv_w(x) + bias.astype(x.dtype)
        qkv = qkv.reshape(b, n, 3, h, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = q @ k.transpose(0, 1, 3, 2)

        wh, ww = self.window_size
        num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.zeros,
            (num_rel, h),
        )
        idx = jnp.asarray(relative_position_index(self.window_size))
        own_bias = table[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + own_bias[None].astype(attn.dtype)
        if rel_pos_bias is not None:
            attn = attn + rel_pos_bias[None].astype(attn.dtype)

        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(self.dtype)
        attn_w = attn
        attn = nn.Dropout(self.attn_drop)(attn, deterministic)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic)
        return out, attn_w


class ViTBlockMEM(nn.Module):
    """Pre-norm block with layer scale (reference vit_block.py:256-280)."""

    num_heads: int
    window_size: tuple[int, int]
    mlp_ratio: float = 4.0
    init_values: float = 0.1
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rel_pos_bias=None, deterministic=True,
                 return_attn=False):
        dim = x.shape[-1]
        gamma_1 = self.param(
            "gamma_1", nn.initializers.constant(self.init_values), (dim,)
        )
        gamma_2 = self.param(
            "gamma_2", nn.initializers.constant(self.init_values), (dim,)
        )
        y = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                         name="norm1")(x)
        y, attn = AttentionMEM(
            num_heads=self.num_heads, window_size=self.window_size,
            attn_drop=self.attn_drop, proj_drop=self.drop, dtype=self.dtype,
            name="attn",
        )(y, rel_pos_bias, deterministic)
        x = x + DropPath(self.drop_path_rate)(
            gamma_1.astype(y.dtype) * y, deterministic
        )
        y = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                         name="norm2")(x)
        y = Mlp(hidden_dim=int(dim * self.mlp_ratio), dropout=self.drop,
                dtype=self.dtype, name="mlp")(y, deterministic)
        x = x + DropPath(self.drop_path_rate)(
            gamma_2.astype(y.dtype) * y, deterministic
        )
        if return_attn:
            return x, attn
        return x


class ViTMEM(nn.Module):
    """Reference model/backbone/vit_mem.py:1-103."""

    input_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_indices: Sequence[int] = (3, 5, 7, 11)
    num_bins: int = 3
    init_values: float = 0.1
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
        self.cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        )
        self.rel_pos_bias = RelativePositionBias(
            window_size=(self.grid_size, self.grid_size),
            num_heads=self.num_heads,
            name="rel_pos_bias",
        )
        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate, self.depth)]
        block_cls = (
            nn.remat(ViTBlockMEM, static_argnums=(3, 4))
            if self.use_remat else ViTBlockMEM
        )
        self.vit_block = [
            block_cls(
                num_heads=self.num_heads,
                window_size=(self.grid_size, self.grid_size),
                mlp_ratio=self.mlp_ratio, init_values=self.init_values,
                drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                drop_path_rate=dpr[i], layer_norm_eps=self.layer_norm_eps,
                dtype=self.dtype, name=f"vit_block_{i}",
            )
            for i in range(self.depth)
        ]
        self.norm_layer = nn.LayerNorm(
            epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm_layer"
        )

    def encode_dense(
        self, x: jax.Array, deterministic: bool = True,
        return_attn: bool = False, return_pyramid: bool = False,
    ):
        """Returns (emb, out_embs, attn): emb = norm(mean-pooled patch
        tokens) — pool BEFORE norm, matching reference vit_mem.py:83-84;
        ``out_embs`` collects the ``out_indices`` feature maps for dense
        tasks (reference vit_mem.py:80-81)."""
        x = self.patch_embed(x)
        x = x.reshape(x.shape[0], -1, x.shape[-1])
        cls = jnp.broadcast_to(
            self.cls_token.astype(x.dtype), (x.shape[0], 1, x.shape[-1])
        )
        x = jnp.concatenate([cls, x], axis=1)
        bias = self.rel_pos_bias()
        attn = None
        out_embs = []
        last = self.depth - 1
        for i, blk in enumerate(self.vit_block):
            if i == last and return_attn:
                x, attn = blk(x, bias, deterministic, True)
            else:
                x = blk(x, bias, deterministic, False)
            if return_pyramid and i in self.out_indices:
                out_embs.append(emb2patch_frame(x[:, 1:, :]))
        emb = self.norm_layer(x[:, 1:].mean(axis=1))
        return emb, out_embs, attn

    def __call__(self, x, deterministic: bool = True):
        return self.encode_dense(x, deterministic)


def vit_mem_small_patch16(**kwargs) -> ViTMEM:
    cfg = dict(input_size=224, patch_size=16, embed_dim=384, depth=12,
               num_heads=12)
    cfg.update(kwargs)
    return ViTMEM(**cfg)


def vit_mem_base_patch16(**kwargs) -> ViTMEM:
    cfg = dict(input_size=224, patch_size=16, embed_dim=768, depth=12,
               num_heads=12)
    cfg.update(kwargs)
    return ViTMEM(**cfg)
