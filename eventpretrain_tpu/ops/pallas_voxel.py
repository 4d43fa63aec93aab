"""Pallas voxelizers: the scatter spec kernel and the MXU production kernel.

Two generations live here:

1. ``voxelize_batch_pallas`` — the per-event scatter formulation
   (interpret-mode only): Mosaic (jax 0.9) rejects scalar stores to VMEM
   and the TPU has no vector-scatter unit, so this remains the executable
   specification, exercised by tests.
2. ``voxelize_batch_mxu`` — the production kernel (second section below):
   rasterization recast as one-hot MATMULS on the MXU, 12.5-24x the XLA
   scatter path at sensor-sized grids. This is what
   ``ops.events.events_to_voxel_grid_batch`` dispatches to on TPU.

History note: this module originally concluded that XLA's scatter-add
sustained 538-679 GB/s and kept scatter as the production path. That
measurement was an axon-relay result-cache artifact (identical inputs were
never re-executed); honest re-measurement (benchmarks/bench_voxel_dense.py)
shows ~10M events/s — data-dependent scatters serialize on TPU — which is
what motivated the MXU kernel.
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


# ---------------------------------------------------------------------------
# MXU voxelizer — the Mosaic-compilable production kernel.
#
# Measurement (2026-08-17, v5e, 64x30k events @224^2x5, see
# benchmarks/bench_voxel_dense.py) overturned this module's original
# conclusion: XLA's scatter-add actually sustains only ~10M events/s (the
# earlier 538-679 GB/s record was an axon-relay result-cache artifact), i.e.
# 219 ms per batch — data-dependent scatters serialize on TPU. The dense
# reformulation runs the splat as MATMULS instead:
#
#     out[h, w, b] = sum_e Yoh[e, h] * Xoh[e, w] * Wb[e, b]
#
# with per-chunk one-hot row/column indicators built in VMEM by 2D-iota
# compares (building them from (H, 1)-iota broadcasts lowers
# catastrophically — 76 ms vs 31 ms per batch; use full-shape
# broadcasted_iota) and contracted on the MXU per bin. The f32 bilinear
# weights ride in exactly as an hi+lo bf16 split (one-hots are exact in
# bf16), giving ~1e-5 agreement with the f32 scatter reference. Everything
# is lane-major (·, K): all broadcasts run along sublanes, no relayouts.
#
# Measured warm (best window, v5e): 17.5 ms/batch at 64x30k@224^2
# (3658 samples/s, 110M events/s, ~110 TFLOP/s = MXU roofline; 12.5x the
# scatter path) and 9.1 ms at 128^2 (~24x — scatter is O(E)-bound at
# ~10M events/s regardless of grid). For LARGE grids (DSEC 440x640) the
# all-pairs E*H*W work loses to O(E) scatter, so the dispatcher in
# ops/events.py gates this kernel to height*width <= MAX_MXU_CELLS.
# ---------------------------------------------------------------------------

MXU_CHUNK = 1024
MAX_MXU_CELLS = 256 * 256


def supports_mxu_voxelizer(height: int, width: int) -> bool:
    return height * width <= MAX_MXU_CELLS


def _mxu_voxel_kernel(yt_ref, xt_ref, hi_ref, lo_ref, out_ref, *,
                      num_bins: int, height: int, width: int):
    @pl.when(pl.program_id(1) == 0)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    yt = yt_ref[0]   # (1, K) i32 row index, -1 pads
    xt = xt_ref[0]   # (1, K) i32 col index
    k = yt.shape[-1]
    yohT = (
        jax.lax.broadcasted_iota(jnp.int32, (height, k), 0) == yt
    ).astype(jnp.bfloat16)                                   # (H, K)
    xohT = (
        jax.lax.broadcasted_iota(jnp.int32, (width, k), 0) == xt
    ).astype(jnp.bfloat16)                                   # (W, K)
    hi = hi_ref[0]   # (NB, K) bf16
    lo = lo_ref[0]
    for b in range(num_bins):
        acc = jax.lax.dot_general(
            yohT, xohT * hi[b:b + 1, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            yohT, xohT * lo[b:b + 1, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, b] += acc


def splat_mxu(
    y: jax.Array,
    x: jax.Array,
    weights: jax.Array,
    *,
    height: int,
    width: int,
    chunk: int = MXU_CHUNK,
    interpret: bool | None = None,
) -> jax.Array:
    """Generic per-event splat on the MXU: ``(B, C, E)`` weights scattered
    at integer coords ``y, x (B, E)`` into ``(B, H, W, C)`` images.

    The shared engine behind the voxel grid (C = num_bins bilinear
    weights), the ECDP count image (C = 2 polarity indicators), and the
    MEM image. Out-of-frame or padded events simply match no one-hot
    column and contribute nothing; weights must already be zeroed for
    invalid (beyond-count) events.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, e = y.shape
    c = weights.shape[1]
    # hi/lo bf16 split via mantissa truncation. NOT the usual
    # hi = cast(w, bf16); lo = w - cast(hi, f32): the terminal sets
    # --xla_allow_excess_precision, under which XLA treats the f32->bf16
    # ->f32 round-trip as identity and folds lo to ZERO (measured: error
    # jumped from 1e-5 to 5e-3). Masking the low mantissa bits through an
    # integer bitcast is opaque to that rewrite and truncation is exactly
    # representable in bf16.
    hi_f32 = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(weights, jnp.uint32)
        & jnp.uint32(0xFFFF0000),
        jnp.float32,
    )
    hi = hi_f32.astype(jnp.bfloat16)
    lo = (weights - hi_f32).astype(jnp.bfloat16)

    pad = (-e) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-1)
        y = jnp.pad(y, ((0, 0), (0, pad)), constant_values=-1)
        hi = jnp.pad(hi, ((0, 0), (0, 0), (0, pad)))
        lo = jnp.pad(lo, ((0, 0), (0, 0), (0, pad)))
    e_pad = e + pad

    out = pl.pallas_call(
        functools.partial(
            _mxu_voxel_kernel, num_bins=c, height=height, width=width
        ),
        grid=(b, e_pad // chunk),
        in_specs=[
            pl.BlockSpec((1, 1, chunk), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 1, chunk), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, c, chunk), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, c, chunk), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec(
            (1, c, height, width), lambda i, j: (i, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, height, width), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(y[:, None, :], x[:, None, :], hi, lo)
    return jnp.transpose(out, (0, 2, 3, 1))  # (B, H, W, C)


def voxelize_batch_mxu(
    events: jax.Array,
    counts: jax.Array,
    *,
    num_bins: int,
    height: int,
    width: int,
    chunk: int = MXU_CHUNK,
    interpret: bool | None = None,
) -> jax.Array:
    """(B, E, 4) xytp, (B,) -> (B, H, W, num_bins) voxel grids on the MXU.

    Value parity with ops.events.events_to_voxel_grid_batch (the scatter
    reference) to ~1e-5: same window normalization, temporal bilinear
    splat, polarity 0 -> -1, and padding/out-of-frame masking (an index
    that matches no one-hot column simply contributes nothing).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x = events[..., 0].astype(jnp.int32)
    y = events[..., 1].astype(jnp.int32)
    from eventpretrain_tpu.ops.events import bilinear_bin_weights

    wb = bilinear_bin_weights(events, counts, num_bins)  # (B, E, NB) f32
    wb = jnp.transpose(wb, (0, 2, 1))  # (B, NB, E): lane-major events
    return splat_mxu(
        y, x, wb, height=height, width=width, chunk=chunk,
        interpret=interpret,
    )
