"""ViT backbone (no cls token, fixed sincos pos-embed, masked/dense paths).

TPU-native redesign of reference model/backbone/vit.py:11-171. Instead of one
``forward`` that branches on ``args.phase``/``mask`` in Python (reference
vit.py:107,153), each use-case is a separate method that jits with static
shapes:

- ``encode_masked(x, ids_keep)``: visible-token encoding for masked modeling;
  masking decisions (ids_keep/mask/ids_restore) are computed *outside* by
  ``ops.masking`` pure functions.
- ``encode_dense(x)``: full-token encoding; returns low/high taps, the
  4-scale feature pyramid for dense heads, and optionally the last block's
  attention (the reference always materializes attention, vit.py:144;
  here it is opt-in).

Feature taps match the reference exactly: masked path taps blocks 1 and 3
(vit.py:119-123) with fusion ``norm(emb_l1 + emb_l2 + emb_h)`` (vit.py:125-128);
dense path taps blocks 0 and 1 and collects ``out_indices`` feature maps
(vit.py:139-151).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from eventpretrain_tpu.models.layers import PatchEmbed, ViTBlock
from eventpretrain_tpu.ops.pos_embed import get_2d_sincos_pos_embed
from eventpretrain_tpu.ops.reshape import emb2patch_frame, frame2emb


class ViT(nn.Module):
    input_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_indices: Sequence[int] = (3, 5, 7, 11)
    num_bins: int = 5
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    use_feature_fusion: bool = True
    masked_taps: Sequence[int] = (1, 3)
    dense_taps: Sequence[int] = (0, 1)
    layer_norm_eps: float = 1e-6
    # jax.checkpoint each block: recompute activations in the backward to
    # trade FLOPs for HBM (reference --use_checkpoint / torch
    # utils.checkpoint; here it applies to ViT blocks too)
    use_remat: bool = False
    dtype: Any = jnp.float32

    @property
    def grid_size(self) -> int:
        return self.input_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size ** 2

    def setup(self):
        self.patch_embed = PatchEmbed(
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            dtype=self.dtype,
            name="patch_embed",
        )
        import numpy as np

        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate, self.depth)]
        # static_argnums: deterministic / return_attn drive Python branches
        block_cls = (
            nn.remat(ViTBlock, static_argnums=(2, 3))
            if self.use_remat else ViTBlock
        )
        self.vit_block = [
            block_cls(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=True,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path_rate=dpr[i],
                layer_norm_eps=self.layer_norm_eps,
                dtype=self.dtype,
                name=f"vit_block_{i}",
            )
            for i in range(self.depth)
        ]
        self.norm_layer = nn.LayerNorm(
            epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm_layer"
        )
        self.pos_drop = nn.Dropout(self.drop_rate)
        # fixed (non-learned) sincos table, recomputed rather than stored
        # (reference vit.py:43-47 freezes it as a buffer)
        self.pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(self.embed_dim, self.grid_size)
        )[None]

    def _embed(self, x: jax.Array, deterministic: bool) -> jax.Array:
        x = self.patch_embed(x)  # (B, h, w, D)
        x = x.reshape(x.shape[0], -1, x.shape[-1])  # (B, L, D)
        x = x + self.pos_embed.astype(x.dtype)
        if self.drop_rate > 0:
            x = self.pos_drop(x, deterministic)
        return x

    def _embed_gathered(
        self, x: jax.Array, ids_keep: jax.Array, deterministic: bool
    ) -> jax.Array:
        """Embed only the kept patches: gather BEFORE the patch conv.

        With a stride==kernel VALID conv, per-patch embedding + LN + GELU are
        all patch-local, so gather commutes with them exactly — this computes
        the same values as ``_embed`` followed by ``take_along_axis`` while
        doing 1/(1-mask_ratio)x fewer patch-embed FLOPs and touching K instead
        of L tokens of LN/GELU/pos activations (the backward also shrinks: no
        scatter over the L-token embedding). Reference semantics unchanged
        (vit.py:110-115 embeds all patches then gathers; values agree).
        """
        b = x.shape[0]
        k = ids_keep.shape[1]
        p = self.patch_size
        patches = frame2emb(p, x)  # (B, L, p*p*bins)
        patches = jnp.take_along_axis(
            patches, ids_keep[..., None].astype(jnp.int32), axis=1
        )
        # run the SAME PatchEmbed params on (B*K) little p x p images; the
        # stride-p conv over a p x p input is exactly the per-patch matmul
        patches = patches.reshape(b * k, p, p, x.shape[-1])
        emb = self.patch_embed(patches).reshape(b, k, self.embed_dim)
        pos = jnp.take(
            self.pos_embed[0].astype(emb.dtype), ids_keep.astype(jnp.int32),
            axis=0,
        )
        emb = emb + pos
        if self.drop_rate > 0:
            emb = self.pos_drop(emb, deterministic)
        return emb

    def encode_masked(
        self,
        x: jax.Array,
        ids_keep: jax.Array,
        deterministic: bool = True,
        mask: jax.Array | None = None,  # unused; ConvViT needs it
    ):
        """Visible-token encoding. x: (B, H, W, num_bins); ids_keep: (B, K).

        Returns (emb_l1, emb_l2, emb_lh), each (B, K, D). ``emb_lh`` is the
        fused feature ``norm(emb_l1 + emb_l2 + emb_h)`` (or ``norm(emb_h)``
        when feature fusion is off). Parity: reference vit.py:107-130.
        """
        x = self._embed_gathered(x, ids_keep, deterministic)

        taps = {}
        for i, blk in enumerate(self.vit_block):
            x = blk(x, deterministic, False)
            if i in self.masked_taps:
                taps[i] = x
        emb_l1 = taps[self.masked_taps[0]]
        emb_l2 = taps[self.masked_taps[1]]
        emb_h = x

        if self.use_feature_fusion:
            emb_lh = self.norm_layer(emb_l1 + emb_l2 + emb_h)
        else:
            emb_lh = self.norm_layer(emb_h)
        return emb_l1, emb_l2, emb_lh

    def encode_dense(
        self,
        x: jax.Array,
        deterministic: bool = True,
        return_attn: bool = False,
        return_pyramid: bool = True,
    ):
        """Full-token encoding (classification / dense / contrastive phases).

        Returns (emb_l1, emb_l2, emb_h, out_embs, attn): ``out_embs`` is the
        list of (B, h, w, D) feature maps at ``out_indices`` (empty when
        ``return_pyramid=False``); ``attn`` is the last block's attention or
        None. Parity: reference vit.py:132-156.
        """
        x = self._embed(x, deterministic)

        taps = {}
        out_embs = []
        attn = None
        last = self.depth - 1
        for i, blk in enumerate(self.vit_block):
            if i == last and return_attn:
                x, attn = blk(x, deterministic, True)
            else:
                x = blk(x, deterministic, False)
            if i in self.dense_taps:
                taps[i] = x
            if return_pyramid and i in self.out_indices:
                out_embs.append(emb2patch_frame(x))
        emb_l1 = taps[self.dense_taps[0]]
        emb_l2 = taps[self.dense_taps[1]]
        emb_h = self.norm_layer(x)
        return emb_l1, emb_l2, emb_h, out_embs, attn

    def __call__(self, x: jax.Array, deterministic: bool = True):
        """Default path = dense encoding without pyramid/attention."""
        return self.encode_dense(
            x, deterministic, return_attn=False, return_pyramid=False
        )


def vit_small_patch16(**kwargs) -> ViT:
    """Reference vit.py:159-164."""
    cfg = dict(
        input_size=224, patch_size=16, embed_dim=384, depth=12,
        num_heads=12, mlp_ratio=4.0, out_indices=(3, 5, 7, 11),
    )
    cfg.update(kwargs)
    return ViT(**cfg)


def vit_base_patch16(**kwargs) -> ViT:
    """Reference vit.py:166-171."""
    cfg = dict(
        input_size=224, patch_size=16, embed_dim=768, depth=12,
        num_heads=12, mlp_ratio=4.0, out_indices=(3, 5, 7, 11),
    )
    cfg.update(kwargs)
    return ViT(**cfg)
