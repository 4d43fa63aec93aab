"""Dense Swin backbone for the ECDDP baseline.

Equivalent of reference model/backbone/swin_ecddp.py:1-228 +
model/sub_module/swin_ecddp_block.py: canonical (dense) Swin-T. Rather than
reimplementing window partition / cyclic shift, it reuses the sparse-Swin
machinery with no-mask plans — the knapsack grouping of the shifted partial
border windows is mathematically the masked cyclic shift (same token->window
assignment, same attention masking). ECDDP additions: optional absolute
position embedding, a LayerNorm per out_index on the pyramid, optional cls
head, frozen-stage support (a trainable-mask concern, train/optim.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from eventpretrain_tpu.models.swin import SparseSwin


class SwinECDDP(nn.Module):
    num_classes: int = 0
    input_size: int = 224
    patch_size: int = 4
    embed_dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    num_bins: int = 5
    ape: bool = False
    out_indices: Sequence[int] = (0, 1, 2, 3)
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    layer_norm_eps: float = 1e-6
    use_remat: bool = False  # reference --use_checkpoint (swin_ecddp.py:34)
    dtype: Any = jnp.float32

    def setup(self):
        self.swin = SparseSwin(
            input_size=self.input_size, patch_size=self.patch_size,
            embed_dims=self.embed_dims, depths=self.depths,
            num_heads=self.num_heads, window_size=self.window_size,
            num_bins=self.num_bins, drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            with_rec_decoders=False, with_final_norm=False,
            layer_norm_eps=self.layer_norm_eps,
            use_remat=self.use_remat,
            dtype=self.dtype, name="backbone_swin",
        )
        if self.ape:
            res = self.input_size // self.patch_size
            self.absolute_pos_embed = self.param(
                "absolute_pos_embed",
                nn.initializers.truncated_normal(0.02),
                (1, res * res, self.embed_dims[0]),
            )
        self.out_norms = [
            nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                         name=f"norm{i}")
            for i in self.out_indices
        ]
        if self.num_classes:
            self.head = nn.Dense(
                self.num_classes, dtype=self.dtype, name="head"
            )

    def encode_dense(
        self, x: jax.Array, deterministic: bool = True,
        return_attn: bool = False, return_pyramid: bool = False,
    ):
        """Returns (emb_l1, emb_l2, emb_h, out_embs, attn).

        Reference parity (swin_ecddp.py:212-224): there is NO shared final
        norm — each out_index gets its own LayerNorm, ``emb_h`` IS the
        norm3-applied stage-4 tokens (``emb_h = emb_l4``), and the returned
        low-level embeddings are the norm0/norm1-applied stage tokens.
        """
        sw = self.swin
        import eventpretrain_tpu.models.swin as swin_mod

        plans = swin_mod.plans_to_device(
            swin_mod.build_swin_plans(
                None,
                input_resolution=sw.patches_resolution,
                num_stages=len(sw.depths),
                window_size=sw.window_size,
                cell_grid=sw.cell_grid,
                # mmseg-style shifted windows: stage-4 shift is NOT clamped
                # (reference swin_ecddp_block.py:187-243)
                clamp_shift=False,
            )
        )
        t = sw._embed_visible(x, plans[0].coords_flat, deterministic)
        if self.ape:
            t = t + self.absolute_pos_embed.astype(t.dtype)
        outs = sw._run_stages(t, plans, deterministic)

        normed = {
            i: self.out_norms[j](outs[i])
            for j, i in enumerate(self.out_indices)
        }
        emb_h = normed[max(self.out_indices)]
        out_embs = []
        if return_pyramid:
            res0 = sw.patches_resolution
            for i in self.out_indices:
                o = normed[i]
                h = res0[0] >> i
                out_embs.append(o.reshape(o.shape[0], h, h, o.shape[-1]))
        return (
            normed.get(0, outs[0]), normed.get(1, outs[1]), emb_h,
            out_embs, None,
        )

    def __call__(self, x, deterministic: bool = True):
        out = self.encode_dense(x, deterministic)
        if self.num_classes:
            pooled = out[2].mean(axis=1)
            return self.head(pooled)
        return out


def swin_ecddp_tiny_window7(**kwargs) -> SwinECDDP:
    """Reference swin_ecddp.py:225-228."""
    cfg = dict(
        input_size=224, patch_size=4, embed_dims=(96, 192, 384, 768),
        depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24), window_size=7,
    )
    cfg.update(kwargs)
    return SwinECDDP(**cfg)
