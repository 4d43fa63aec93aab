"""Patch masking strategies for masked modeling (random / density / anti-density).

Functional equivalents of reference model/backbone/vit.py:66-105
(ViT.random_masking): masking decisions are *pure functions* of a PRNG key or
the input grid, computed outside the model so each encode path jits with
static shapes. ``len_keep`` is static (mask_ratio is a config constant).

Returns the reference triple:
  * ``ids_keep``   (B, len_keep) int32 — indices of visible patches
  * ``mask``       (B, L) float32      — 0 = keep, 1 = removed
  * ``ids_restore``(B, L) int32        — inverse shuffle permutation
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_mask_from_noise(
    noise: jax.Array, len_keep: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Build (ids_keep, mask, ids_restore) from per-patch noise (B, L).

    Ascending argsort: smallest noise is kept (reference vit.py:92-103).
    """
    batch, num_patches = noise.shape
    ids_shuffle = jnp.argsort(noise, axis=1).astype(jnp.int32)
    ids_restore = jnp.argsort(ids_shuffle, axis=1).astype(jnp.int32)
    ids_keep = ids_shuffle[:, :len_keep]
    mask = jnp.ones((batch, num_patches), jnp.float32)
    mask = mask.at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return ids_keep, mask, ids_restore


def random_masking(
    key: jax.Array, batch: int, num_patches: int, mask_ratio: float
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Uniform random masking (reference vit.py:77-78)."""
    len_keep = int(num_patches * (1 - mask_ratio))
    noise = jax.random.uniform(key, (batch, num_patches))
    return make_mask_from_noise(noise, len_keep)


def density_noise(x: jax.Array, patch_size: int) -> jax.Array:
    """Per-patch event density of a voxel grid ``(B, H, W, C)`` -> ``(B, L)``.

    Reference vit.py:80-89: density = AvgPool(patch) of |sum over bins|.
    'density' masking uses the density directly as noise (keeps the *least*
    dense patches); 'anti-density' negates it.
    """
    sum_events = jnp.abs(jnp.sum(x, axis=-1))  # (B, H, W)
    b, h, w = sum_events.shape
    gh, gw = h // patch_size, w // patch_size
    pooled = sum_events.reshape(b, gh, patch_size, gw, patch_size)
    pooled = pooled.mean(axis=(2, 4))
    return pooled.reshape(b, gh * gw)


def masking_noise(
    key: jax.Array,
    x: jax.Array,
    patch_size: int,
    strategy: str,
) -> jax.Array:
    """Noise tensor for the given strategy ('random'|'density'|'anti-density')."""
    batch = x.shape[0]
    gh = x.shape[1] // patch_size
    gw = x.shape[2] // patch_size
    if strategy == "random":
        return jax.random.uniform(key, (batch, gh * gw))
    density = density_noise(x, patch_size)
    if strategy == "density":
        return density
    if strategy == "anti-density":
        return -density
    raise ValueError(f"unknown masking strategy: {strategy}")
