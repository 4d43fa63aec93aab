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

# Tiled-splat layout constants are owned by the host bucketer's module
# (native/__init__.py — no-jax import surface); the tiled kernels below
# default from them so the two sides cannot silently disagree on geometry.
from eventpretrain_tpu.native import TILE_H, TILE_W, TILE_CHUNK

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


def _hi_lo_bf16(weights: jax.Array) -> tuple[jax.Array, jax.Array]:
    """f32 -> (hi, lo) bf16 split via mantissa truncation. NOT the usual
    hi = cast(w, bf16); lo = w - cast(hi, f32): the terminal sets
    --xla_allow_excess_precision, under which XLA treats the f32->bf16
    ->f32 round-trip as identity and folds lo to ZERO (measured: error
    jumped from 1e-5 to 5e-3). Masking the low mantissa bits through an
    integer bitcast is opaque to that rewrite and truncation is exactly
    representable in bf16."""
    hi_f32 = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(weights, jnp.uint32)
        & jnp.uint32(0xFFFF0000),
        jnp.float32,
    )
    hi = hi_f32.astype(jnp.bfloat16)
    lo = (weights - hi_f32).astype(jnp.bfloat16)
    return hi, lo


@functools.partial(
    jax.jit, static_argnames=("height", "width", "chunk", "interpret")
)
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

    Jitted at this boundary (like the tiled variants below): the BlockSpec
    lambdas are fresh objects per Python call, so unjitted calls would
    recompile every invocation.

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
    hi, lo = _hi_lo_bf16(weights)

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


@functools.partial(
    jax.jit,
    static_argnames=("num_bins", "height", "width", "chunk", "interpret"),
)
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


# ---------------------------------------------------------------------------
# Tile-bucketed MXU splat — the LARGE-grid production kernel.
#
# The dense formulation above costs 2*H*W*chunk FLOPs per chunk regardless
# of where the events land, so at DSEC scale (440x640) it loses to the O(E)
# XLA scatter (BASELINE.md: 41.7 ms vs ~9 projected seconds per batch). The
# tiled variant restores MXU viability by exploiting spatial sparsity the
# only way a systolic array can: ROUTE events to (tile_h x tile_w) spatial
# tiles on the host (native/bucket_pack_event_batch — a counting sort, one
# O(E) pass), then splat each chunk into only its own tile's (TH, TW) block.
# Per-event FLOPs drop from 2*H*W*2*NB to 2*TH*TW*2*NB — 17x at 128x128
# tiles on 448x640. Measured on v5e (2026-08-21, jitted, 8x200k @ 440x640,
# benchmarks/bench_events.py): 6.2 ms/batch = 257M events/s — 6.7x the XLA
# scatter's 41.8 ms. (A round-4 reading of 1169 ms was a measurement
# artifact: unjitted calls re-created the BlockSpec lambdas and recompiled
# the kernel every invocation — see splat_mxu_tiled's docstring.)
#
# Contract with the host bucketer:
#   * events arrive grouped by tile id (row-major tile raster order), each
#     tile's segment padded to a multiple of `chunk` and spanning at least
#     one full chunk (so every output tile is visited and zero-initialized
#     even when empty);
#   * `tile_table` (B, n_chunks) i32 gives each chunk's tile id,
#     NONDECREASING along chunks — consecutive grid steps that share a tile
#     revisit the same output block in VMEM, which is what makes `+=`
#     accumulation legal in Pallas;
#   * pad slots carry out-of-frame coordinates (x >= width) so their
#     one-hot columns match nothing, and their weights are already zero.
# ---------------------------------------------------------------------------


def _mxu_tiled_kernel(table_ref, bins_ref, y_ref, x_ref, hi_ref, lo_ref,
                      out_ref, *, num_bins: int, tile_h: int, tile_w: int,
                      tiles_x: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    t = table_ref[i, j]
    prev = table_ref[i, jnp.maximum(j - 1, 0)]

    @pl.when((j == 0) | (t != prev))
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    yt = y_ref[0] - (t // tiles_x) * tile_h   # (1, K) local row, <0 or >=TH
    xt = x_ref[0] - (t % tiles_x) * tile_w    # for foreign/pad slots
    k = yt.shape[-1]
    yohT = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_h, k), 0) == yt
    ).astype(jnp.bfloat16)                                    # (TH, K)
    xohT = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_w, k), 0) == xt
    ).astype(jnp.bfloat16)                                    # (TW, K)
    hi = hi_ref[0]   # (NB, K) bf16
    lo = lo_ref[0]
    # bmin/bmax ride packed in one i32 (bmin | bmax << 16): a trailing
    # length-2 dim would be lane-padded 2 -> 128 in SMEM (64x blowup —
    # 1.75 MB at bs16/DSEC, over the 1 MB SMEM budget; compile failure)
    bounds = bins_ref[i, j]
    bmin = bounds & 0xFFFF
    bmax = bounds >> 16
    for b in range(num_bins):
        # chunks span narrow time slices (time order survives bucketing
        # within a tile), so most of the num_bins matmul pairs are all-zero
        # weights — predicate them off the per-chunk bin range
        @pl.when((b >= bmin) & (b <= bmax))
        def _accum(b=b):
            acc = jax.lax.dot_general(
                yohT, xohT * hi[b:b + 1, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                yohT, xohT * lo[b:b + 1, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[0, b] += acc


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "tile_w", "chunk",
                     "interpret"),
)
def splat_mxu_tiled(
    y: jax.Array,
    x: jax.Array,
    weights: jax.Array,
    tile_table: jax.Array,
    bin_range: jax.Array | None = None,
    *,
    height: int,
    width: int,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    chunk: int = TILE_CHUNK,
    interpret: bool | None = None,
) -> jax.Array:
    """Tile-bucketed splat: ``(B, C, E)`` weights at global integer coords
    ``y, x (B, E)`` -> ``(B, H, W, C)``, with events pre-grouped by spatial
    tile and ``tile_table (B, E // chunk)`` naming each chunk's tile.

    ``E`` must be a multiple of ``chunk`` (the host bucketer pads each
    tile's segment to chunk alignment). Invalid slots must carry zero
    weights; coordinates outside the chunk's tile contribute nothing.
    ``bin_range (B, E // chunk, 2)`` i32 optionally bounds the channels a
    chunk's weights can occupy (inclusive); channels outside it are
    skipped, not just zero — the bounds must be conservative.

    Jitted at this boundary: the BlockSpec index-map lambdas below are
    fresh objects every Python call, so an unjitted call can never hit
    pallas_call's executable cache — each call would RE-COMPILE (~1.4 s
    measured on v5e, the source of a retracted 28x-slower-than-scatter
    reading of this kernel; 2026-08-21). Under jit the cache keys on
    shapes and the kernel costs what the hardware costs (6.2 ms at DSEC
    shape — 6.7x the XLA scatter).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, e = y.shape
    c = weights.shape[1]
    assert e % chunk == 0, "bucketed layout must be chunk-aligned"
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)
    n_chunks = e // chunk
    assert tile_table.shape == (b, n_chunks), tile_table.shape
    if bin_range is None:
        bounds = jnp.full((b, n_chunks), (c - 1) << 16, jnp.int32)
    else:
        br = bin_range.astype(jnp.int32)
        bounds = br[..., 0] | (br[..., 1] << 16)
    hi, lo = _hi_lo_bf16(weights)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # tile_table + bin_range land in SMEM
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, chunk), lambda i, j, tab, br: (i, 0, j)),
            pl.BlockSpec((1, 1, chunk), lambda i, j, tab, br: (i, 0, j)),
            pl.BlockSpec((1, c, chunk), lambda i, j, tab, br: (i, 0, j)),
            pl.BlockSpec((1, c, chunk), lambda i, j, tab, br: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec(
            (1, c, tile_h, tile_w),
            lambda i, j, tab, br: (
                i, 0, tab[i, j] // tiles_x, tab[i, j] % tiles_x
            ),
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _mxu_tiled_kernel, num_bins=c, tile_h=tile_h, tile_w=tile_w,
            tiles_x=tiles_x,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, c, tiles_y * tile_h, tiles_x * tile_w), jnp.float32
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(
        tile_table.astype(jnp.int32), bounds,
        y[:, None, :], x[:, None, :], hi, lo,
    )
    out = jnp.transpose(out, (0, 2, 3, 1))  # (B, Hpad, Wpad, C)
    return out[:, :height, :width, :]


@functools.partial(
    jax.jit,
    static_argnames=("num_bins", "height", "width", "tile_h", "tile_w",
                     "chunk", "interpret"),
)
def voxelize_batch_mxu_tiled(
    events: jax.Array,
    tile_table: jax.Array,
    t_range: jax.Array,
    chunk_trange: jax.Array | None = None,
    *,
    num_bins: int,
    height: int,
    width: int,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    chunk: int = TILE_CHUNK,
    interpret: bool | None = None,
) -> jax.Array:
    """Voxelize tile-bucketed events: ``(B, E, 4)`` xytp (grouped by tile,
    chunk-aligned — see native/bucket_pack_event_batch), ``tile_table
    (B, E//chunk)`` i32, ``t_range (B, 2)`` f32 pre-permutation time window
    -> ``(B, H, W, num_bins)``.

    Validity is coordinate-based (pad slots carry x >= width / y >= height
    sentinels — the u32/u16 codecs preserve them), and the time window is
    explicit because after bucketing neither "valid entries leading" nor
    "first/last slot = window bounds" holds.

    ``chunk_trange (B, E//chunk, 2)`` (the bucketer's 4th output) bounds
    each chunk's temporal bin span so the kernel skips bins no event in
    the chunk can touch. The bounds are computed from the ORIGINAL f32
    timestamps but the kernel sees codec-decoded ones, so the slack must
    cover the u32 codec's t quantization (+-0.5/1023 of the window, i.e.
    (num_bins-1)/2046 bins) plus f32 evaluation noise — it scales with
    num_bins rather than assuming num_bins <= 21.
    """
    from eventpretrain_tpu.ops.events import bilinear_bin_weights_windowed

    x = events[..., 0].astype(jnp.int32)
    y = events[..., 1].astype(jnp.int32)
    valid = (x >= 0) & (x < width) & (y >= 0) & (y < height)
    wb = bilinear_bin_weights_windowed(
        events, valid, t_range[:, 0], t_range[:, 1], num_bins
    )  # (B, E, NB) f32
    wb = jnp.transpose(wb, (0, 2, 1))  # (B, NB, E)
    bin_range = None
    if chunk_trange is not None:
        t0 = t_range[:, 0:1, None]
        dt = t_range[:, 1:2, None] - t0
        dt = jnp.where(dt == 0, 1.0, dt)
        ts = (num_bins - 1) * (chunk_trange - t0) / dt  # (B, NC, 2)
        slack = 0.01 + (num_bins - 1) / 2046.0
        bmin = jnp.clip(
            jnp.floor(ts[..., 0] - slack), 0, num_bins - 1
        ).astype(jnp.int32)
        bmax = jnp.clip(
            jnp.floor(ts[..., 1] + slack) + 1, 0, num_bins - 1
        ).astype(jnp.int32)
        bin_range = jnp.stack([bmin, bmax], axis=-1)
    return splat_mxu_tiled(
        y, x, wb, tile_table, bin_range, height=height, width=width,
        tile_h=tile_h, tile_w=tile_w, chunk=chunk, interpret=interpret,
    )
