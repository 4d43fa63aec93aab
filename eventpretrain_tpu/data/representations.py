"""Batched on-device event-representation builder (+post-augment normalization).

Encapsulates the representation switch the reference performs per-sample in
each dataset's ``__getitem__`` (exemplar: dataset/finetune_cls/
ft_n_cars_dataset.py:72-95):

  num_bins == 2 -> ECDP pos/neg count image; after view augment, per-channel
                   ``x / (amax + 1)`` then ``(x - 0.5) * 2``;
  num_bins == 3 -> MEM [pos, 0, neg]/255 with hot-pixel removal; after view
                   augment, count channels scaled so their max is 1;
  else         -> temporal-bilinear voxel grid (no normalization).

TPU-first: events are rasterized onto a fixed canvas (the dataset's max
sensor size) so the whole batch is one static-shape program; the subsequent
crop/resize reads only each sample's true sensor region.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from eventpretrain_tpu.ops.events import remove_hot_pixels


def num_channels(num_bins: int) -> int:
    return {2: 2, 3: 3}.get(num_bins, num_bins)


def build_representation(
    events: jax.Array,
    counts: jax.Array,
    *,
    num_bins: int,
    height: int,
    width: int,
    sensor_hw: Optional[jax.Array] = None,
    use_evrep: bool = False,
    tile_table: Optional[jax.Array] = None,
    t_range: Optional[jax.Array] = None,
    chunk_trange: Optional[jax.Array] = None,
) -> jax.Array:
    """(B, E, 4) padded events -> (B, height, width, C) representation.

    Cross-backend reproducibility note: on TPU the MXU splat kernel carries
    f32 weights as a bf16 hi+lo split, so representations differ from the
    exact f32 scatter built on CPU/GPU by ~1e-3 relative — immaterial for
    training inputs, but for bit-exact comparisons force the scatter path
    (ops/events.py ``*_batch(..., use_mxu=False)``).
    """

    # The *_batch entry points dispatch to the MXU splat kernel on TPU
    # (ops/pallas_voxel.py; 12.5-24x the vmapped scatter at sensor grids)
    # and fall back to the vmapped scatter formulas elsewhere.
    from eventpretrain_tpu.ops.events import (
        events_to_image_ecdp_batch,
        events_to_image_mem_batch,
        events_to_voxel_grid_batch,
    )

    if use_evrep:
        from eventpretrain_tpu.ops.events import events_to_evrep

        assert tile_table is None, "EvRep has no tiled splat path"
        fn = functools.partial(events_to_evrep, height=height, width=width)
        return jax.vmap(fn)(events, counts)
    if tile_table is not None:
        # tile-bucketed layout (native/bucket_pack_event_batch) -> the
        # large-grid tiled MXU splat; validity is coordinate-based and the
        # time window explicit (bucketing destroyed prefix/time order)
        from eventpretrain_tpu.ops.events import polarity_weights_coordvalid
        from eventpretrain_tpu.ops.pallas_voxel import (
            splat_mxu_tiled,
            voxelize_batch_mxu_tiled,
        )

        if num_bins in (2, 3):
            img = splat_mxu_tiled(
                events[..., 1].astype(jnp.int32),
                events[..., 0].astype(jnp.int32),
                polarity_weights_coordvalid(events, height, width),
                tile_table, height=height, width=width,
            )
            if num_bins == 2:
                return img
            zeros = jnp.zeros_like(img[..., :1])
            img = jnp.concatenate(
                [img[..., :1], zeros, img[..., 1:]], axis=-1
            ) / 255.0
            if sensor_hw is None:
                return jax.vmap(remove_hot_pixels)(img)
            return jax.vmap(remove_hot_pixels, in_axes=(0, None, 0))(
                img, 10.0, sensor_hw
            )
        return voxelize_batch_mxu_tiled(
            events, tile_table, t_range, chunk_trange, num_bins=num_bins,
            height=height, width=width,
        )
    if num_bins == 2:
        return events_to_image_ecdp_batch(
            events, counts, height=height, width=width
        )
    if num_bins == 3:
        img = events_to_image_mem_batch(
            events, counts, height=height, width=width
        ) / 255.0
        if sensor_hw is None:
            return jax.vmap(remove_hot_pixels)(img)
        return jax.vmap(remove_hot_pixels, in_axes=(0, None, 0))(
            img, 10.0, sensor_hw
        )
    return events_to_voxel_grid_batch(
        events, counts, num_bins=num_bins, height=height, width=width
    )


def normalize_representation(evg: jax.Array, num_bins: int) -> jax.Array:
    """Post-augment per-sample normalization (ft_n_cars_dataset.py:89-95)."""
    if num_bins == 2:
        amax = evg.max(axis=(1, 2), keepdims=True)
        evg = evg / (amax + 1.0)
        return (evg - 0.5) * 2.0
    if num_bins == 3:
        counts_max = evg[..., 0::2].max(axis=(1, 2, 3), keepdims=True)
        factor = jnp.where(counts_max > 0, 1.0 / jnp.maximum(counts_max, 1e-12), 1.0)
        scale = jnp.concatenate(
            [factor, jnp.ones_like(factor), factor], axis=-1
        )
        return evg * scale
    return evg
