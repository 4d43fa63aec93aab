"""Pallas voxelizer (reference implementation; interpret-mode only).

The obvious Pallas route for event rasterization — per-sample voxel grid in
VMEM, event chunks streamed in, indices/bilinear weights vectorized on the
VPU, then per-event scatter accumulation — CANNOT currently lower to TPU:
Mosaic (jax 0.9) rejects scalar stores to VMEM ("Cannot store scalars to
VMEM"), and the TPU has no vector-scatter unit, so every formulation ends in
either an unsupported scalar store or O(rows x events) one-hot vector work.

Measurement settles the design (benchmarks/bench_events.py, v5e):
XLA's native scatter-add lowers to a sort-based batched implementation
sustaining 538-679 GB/s of event throughput across N-Cars/ImageNet/DSEC
shapes — at or above HBM copy speed for this access pattern. The production
path (ops.events.events_to_voxel_grid*) therefore deliberately uses XLA
scatter; this kernel is kept as the executable Pallas specification
(exercised in interpret mode by tests/test_pallas_voxel.py) and as the
starting point if Mosaic grows scatter support.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _voxel_kernel(count_ref, events_ref, out_ref, idx_scratch, val_scratch,
                  *, num_bins, height, width, chunk):
    """Grid: one program per batch sample.

    events_ref: (E, 4) VMEM block for this sample; out_ref: (H*W*bins,) VMEM.
    """
    out_ref[...] = jnp.zeros_like(out_ref)
    n = count_ref[pl.program_id(0)]
    num_events = events_ref.shape[1]

    t0 = events_ref[0, 0, 2]
    last = jnp.maximum(n - 1, 0)
    t1 = events_ref[0, last, 2]
    delta_t = t1 - t0
    delta_t = jnp.where(delta_t == 0, 1.0, delta_t)

    num_cells = height * width * num_bins

    def chunk_body(ci, _):
        base_i = ci * chunk
        ev = events_ref[0, pl.ds(base_i, chunk), :]
        x = ev[:, 0].astype(jnp.int32)
        y = ev[:, 1].astype(jnp.int32)
        t = ev[:, 2]
        p = jnp.where(ev[:, 3] == 0, -1.0, ev[:, 3])
        idx_in = base_i + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)[:, 0]
        valid = idx_in < n
        in_frame = (x >= 0) & (x < width) & (y >= 0) & (y < height)

        ts = (num_bins - 1) * (t - t0) / delta_t
        tis = jnp.floor(ts)
        dts = ts - tis
        tis_i = tis.astype(jnp.int32)
        base = (y * width + x) * num_bins

        left_ok = valid & in_frame & (tis >= 0) & (tis < num_bins)
        right_ok = valid & in_frame & (tis >= 0) & (tis + 1 < num_bins)
        idx_l = jnp.where(left_ok, base + tis_i, num_cells - 1)
        idx_r = jnp.where(right_ok, base + tis_i + 1, num_cells - 1)
        val_l = jnp.where(left_ok, p * (1.0 - dts), 0.0)
        val_r = jnp.where(right_ok, p * dts, 0.0)

        # stage vectors into scratch; Mosaic supports dynamic scalar reads
        # from refs but not from traced arrays
        idx_scratch[0, :] = idx_l // 128
        idx_scratch[1, :] = idx_l % 128
        idx_scratch[2, :] = idx_r // 128
        idx_scratch[3, :] = idx_r % 128
        val_scratch[0, :] = val_l
        val_scratch[1, :] = val_r

        def acc_body(j, _):
            out_ref[0, idx_scratch[0, j], idx_scratch[1, j]] += val_scratch[0, j]
            out_ref[0, idx_scratch[2, j], idx_scratch[3, j]] += val_scratch[1, j]
            return 0

        jax.lax.fori_loop(0, chunk, acc_body, 0)
        return 0

    jax.lax.fori_loop(0, pl.cdiv(num_events, chunk), chunk_body, 0)


@functools.partial(
    jax.jit, static_argnames=("num_bins", "height", "width", "chunk")
)
def voxelize_batch_pallas(
    events: jax.Array,
    counts: jax.Array,
    *,
    num_bins: int,
    height: int,
    width: int,
    chunk: int = 512,
) -> jax.Array:
    """(B, E, 4), (B,) -> (B, H, W, num_bins); Pallas variant."""
    b, e, _ = events.shape
    num_cells = height * width * num_bins
    assert num_cells % 128 == 0, "grid cells must tile into 128 lanes"
    rows = num_cells // 128
    kernel = functools.partial(
        _voxel_kernel, num_bins=num_bins, height=height, width=width,
        chunk=chunk,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # counts (B,) land in SMEM
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, e, 4), lambda i, counts: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, 128), lambda i, counts: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, chunk), jnp.int32),
            pltpu.VMEM((8, chunk), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, rows, 128), jnp.float32),
    )(counts.astype(jnp.int32), events)
    return out.reshape(b, height, width, num_bins)
