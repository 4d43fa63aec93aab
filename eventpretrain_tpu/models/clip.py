"""CLIP ViT-B/16 image encoder (flax) + OpenAI-checkpoint importer.

The reference runs OpenAI CLIP in the training loop for the `adj-n`/`con-n`
phases and the ECDP raw path (reference main_pretrain.py:362-363,
pr_trainer.py:175-178, pr_n_imagenet_dataset.py:66-99), consuming the FULL
projected token sequence (B, 197, 512) (the EF-ImageNet preprocessed
`clip_emb` files have that shape, pr_ef_imagenet_dataset.py:180).

This module reimplements the CLIP visual transformer exactly (quick-GELU,
pre-LN blocks, class embedding, ln_pre/ln_post, visual projection) so that
released `ViT-B-16.pt` weights plug in via ``load_clip_visual_weights``; no
CLIP weights ship in this environment, so the -n phases stay gated until a
checkpoint is provided (--clip_checkpoint).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPBlock(nn.Module):
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="in_proj")(y)
        b, n, _ = y.shape
        h = self.num_heads
        qkv = qkv.reshape(b, n, 3, h, d // h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = jax.nn.dot_product_attention(q, k, v)
        out = out.reshape(b, n, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="out_proj")(out)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        y = nn.Dense(4 * d, dtype=self.dtype, name="c_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(d, dtype=self.dtype, name="c_proj")(y)
        return x + y


class CLIPVisionTransformer(nn.Module):
    """OpenAI CLIP visual tower; returns the projected token sequence."""

    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images: (B, H, W, 3) CLIP-normalized -> (B, 1+L, output_dim)."""
        grid = self.image_size // self.patch_size
        x = nn.Conv(
            self.width, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            use_bias=False, dtype=self.dtype, name="conv1",
        )(images)
        x = x.reshape(x.shape[0], grid * grid, self.width)

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.width,)
        )
        cls = jnp.broadcast_to(
            class_embedding.astype(x.dtype), (x.shape[0], 1, self.width)
        )
        x = jnp.concatenate([cls, x], axis=1)
        positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.02),
            (grid * grid + 1, self.width),
        )
        x = x + positional_embedding.astype(x.dtype)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        for i in range(self.layers):
            x = CLIPBlock(num_heads=self.heads, dtype=self.dtype,
                          name=f"resblock_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x)

        proj = self.param(
            "proj", nn.initializers.normal(0.02),
            (self.width, self.output_dim),
        )
        return x @ proj.astype(x.dtype)


def preprocess_images(images: jax.Array) -> jax.Array:
    """(B, H, W, 3) uint8/float [0,1] -> CLIP-normalized (B, 224, 224, 3)."""
    from eventpretrain_tpu.ops.reshape import resize

    x = images.astype(jnp.float32)
    if x.shape[1:3] != (224, 224):
        x = resize(x, (224, 224), "bicubic")
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    return (x - mean) / std


def load_clip_visual_weights(path: str, params) -> Any:
    """Import the visual tower from an OpenAI CLIP checkpoint (.pt).

    Handles both jit-archived and plain state-dict formats.
    """
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    sd = {k: v for k, v in sd.items() if k.startswith("visual.")}

    def np_(k):
        return np.asarray(sd[k].float().numpy())

    out = dict(params)
    out["conv1"] = {"kernel": np_("visual.conv1.weight").transpose(2, 3, 1, 0)}
    out["class_embedding"] = np_("visual.class_embedding")
    out["positional_embedding"] = np_("visual.positional_embedding")
    out["proj"] = np_("visual.proj")
    for ln_flax, ln_torch in (("ln_pre", "visual.ln_pre"),
                              ("ln_post", "visual.ln_post")):
        out[ln_flax] = {
            "scale": np_(f"{ln_torch}.weight"),
            "bias": np_(f"{ln_torch}.bias"),
        }
    i = 0
    while f"visual.transformer.resblocks.{i}.ln_1.weight" in sd:
        pre = f"visual.transformer.resblocks.{i}"
        out[f"resblock_{i}"] = {
            "ln_1": {"scale": np_(f"{pre}.ln_1.weight"),
                     "bias": np_(f"{pre}.ln_1.bias")},
            "ln_2": {"scale": np_(f"{pre}.ln_2.weight"),
                     "bias": np_(f"{pre}.ln_2.bias")},
            "in_proj": {
                "kernel": np_(f"{pre}.attn.in_proj_weight").T,
                "bias": np_(f"{pre}.attn.in_proj_bias"),
            },
            "out_proj": {
                "kernel": np_(f"{pre}.attn.out_proj.weight").T,
                "bias": np_(f"{pre}.attn.out_proj.bias"),
            },
            "c_fc": {"kernel": np_(f"{pre}.mlp.c_fc.weight").T,
                     "bias": np_(f"{pre}.mlp.c_fc.bias")},
            "c_proj": {"kernel": np_(f"{pre}.mlp.c_proj.weight").T,
                       "bias": np_(f"{pre}.mlp.c_proj.bias")},
        }
        i += 1
    return jax.tree.map(jnp.asarray, out)


def clip_vit_b16(dtype: Any = jnp.float32) -> CLIPVisionTransformer:
    return CLIPVisionTransformer(
        image_size=224, patch_size=16, width=768, layers=12, heads=12,
        output_dim=512, dtype=dtype,
    )
