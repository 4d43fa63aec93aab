"""Tile-bucketed large-grid MXU splat (VERDICT r3 item 3, option b).

The dense MXU splat is gated to grids <= 256^2 cells (all-pairs E*H*W work);
DSEC's 440x640 fell back to the O(E) XLA scatter at 41.7 ms/batch. The
tiled path routes events to 128x128 spatial tiles on the host
(native/bucket_pack_event_batch — a stable counting sort, C++ with a
bit-exact numpy fallback) and splats each chunk into only its own tile's
block (ops/pallas_voxel.py::voxelize_batch_mxu_tiled).

Pinned here:
  * bucketer layout invariants (nondecreasing chunk table, chunk-aligned
    >= 1-chunk segments, every valid event placed exactly once, sentinel
    pads, pre-permutation time window)
  * C++ bucketer bit-exact vs the numpy fallback
  * tiled kernel (interpret mode) == the f32 scatter reference voxelizer
    at ragged-tile grid sizes, incl. empty samples, single-tile clusters,
    degenerate time windows, and out-of-frame strays
  * u32 codec round-trip of a bucketed layout (sentinel preservation +
    explicit-window encode)
  * DensePipeline(tiled_raster="on") == DensePipeline("off") end to end
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

import eventpretrain_tpu.native as native
from eventpretrain_tpu.native import bucket_pack_event_batch
from eventpretrain_tpu.ops.events import events_to_voxel_grid_batch
from eventpretrain_tpu.ops.pallas_voxel import voxelize_batch_mxu_tiled

H, W, NB = 200, 300, 5  # ragged tiles: 2x3 of 128x128 over 200x300
CHUNK = 256


def _make_batch(counts, cap, rng, h=H, w=W):
    b = len(counts)
    ev = np.zeros((b, cap, 4), np.float32)
    for i, n in enumerate(counts):
        ev[i, :n, 0] = rng.integers(0, w, n)
        ev[i, :n, 1] = rng.integers(0, h, n)
        ev[i, :n, 2] = np.sort(rng.random(n).astype(np.float32) * 1e6)
        ev[i, :n, 3] = rng.integers(0, 2, n)
    return ev, np.asarray(counts, np.int32)


def _numpy_bucket(*args, **kw):
    lib, backend = native._LIB, native.BACKEND
    native._LIB, native.BACKEND = None, "numpy-forced"
    try:
        return bucket_pack_event_batch(*args, **kw)
    finally:
        native._LIB, native.BACKEND = lib, backend


def test_bucket_layout_invariants():
    rng = np.random.default_rng(0)
    ev, counts = _make_batch([4000, 0, 700], 4000, rng)
    out, table, t_range, _ = _numpy_bucket(
        ev, counts, height=H, width=W, chunk=CHUNK
    )
    b, epad, _ = out.shape
    t_total = 2 * 3
    assert epad % CHUNK == 0 and table.shape == (b, epad // CHUNK)
    assert np.all(np.diff(table, axis=1) >= 0)
    for i in range(b):
        # every tile owns at least one chunk
        assert set(table[i].tolist()) == set(range(t_total))
        # every valid event appears exactly once, in its own tile's chunks
        real = out[i][out[i][:, 0] < W]
        src = ev[i, : counts[i]]
        assert real.shape[0] == counts[i]
        key = lambda a: np.lexsort((a[:, 3], a[:, 2], a[:, 1], a[:, 0]))
        np.testing.assert_array_equal(real[key(real)], src[key(src)])
        tid_of_slot = np.repeat(table[i], CHUNK)
        valid_slots = out[i][:, 0] < W
        expect = (
            np.minimum(out[i][:, 1].astype(np.int64) // 128, 1) * 3
            + np.minimum(out[i][:, 0].astype(np.int64) // 128, 2)
        )
        np.testing.assert_array_equal(
            tid_of_slot[valid_slots], expect[valid_slots]
        )
        # pads carry the codec sentinel + t0
        pads = out[i][~valid_slots]
        assert np.all(pads[:, 0] == 2047.0) and np.all(pads[:, 1] == 1023.0)
        if counts[i]:
            assert np.all(pads[:, 2] == ev[i, 0, 2])
            np.testing.assert_array_equal(
                t_range[i], [ev[i, 0, 2], ev[i, counts[i] - 1, 2]]
            )


def test_cpp_bucketer_bit_exact():
    if native._get_lib() is None or not hasattr(
        native._get_lib(), "bucket_pack_batch"
    ):
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(1)
    ev, counts = _make_batch([9000, 0, 7, 3111], 9000, rng, h=440, w=640)
    # out-of-frame strays exercise the clamp path in both implementations
    ev[0, :50, 0] = rng.integers(-3, 700, 50)
    ev[0, :50, 1] = rng.integers(-3, 500, 50)
    a = bucket_pack_event_batch(ev, counts, height=440, width=640)
    b = _numpy_bucket(ev, counts, height=440, width=640)
    for got, want in zip(a, b):
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("cluster", [False, True])
def test_tiled_splat_matches_scatter(cluster):
    rng = np.random.default_rng(2)
    ev, counts = _make_batch([5000, 0, 1700], 5000, rng)
    if cluster:  # all of sample 2 in one tile
        ev[2, :1700, 0] = rng.integers(0, 64, 1700)
        ev[2, :1700, 1] = rng.integers(0, 64, 1700)
    ref = events_to_voxel_grid_batch(
        jnp.asarray(ev), jnp.asarray(counts), num_bins=NB, height=H,
        width=W, use_mxu=False,
    )
    bucketed, table, t_range, chunk_tr = _numpy_bucket(
        ev, counts, height=H, width=W, chunk=CHUNK
    )
    # with the per-chunk bin-range skip and without (full-range default)
    out = voxelize_batch_mxu_tiled(
        jnp.asarray(bucketed), jnp.asarray(table), jnp.asarray(t_range),
        jnp.asarray(chunk_tr),
        num_bins=NB, height=H, width=W, chunk=CHUNK, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-4
    )
    out_full = voxelize_batch_mxu_tiled(
        jnp.asarray(bucketed), jnp.asarray(table), jnp.asarray(t_range),
        num_bins=NB, height=H, width=W, chunk=CHUNK, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_full), np.asarray(ref), atol=5e-4
    )


def test_tiled_splat_degenerate_time_and_strays():
    rng = np.random.default_rng(3)
    ev, counts = _make_batch([800, 500], 800, rng)
    ev[0, :800, 2] = 123.0           # degenerate window (delta_t == 0)
    ev[1, :40, 0] = rng.integers(-5, W + 20, 40)   # out-of-frame strays
    ev[1, :40, 1] = rng.integers(-5, H + 20, 40)
    ref = events_to_voxel_grid_batch(
        jnp.asarray(ev), jnp.asarray(counts), num_bins=NB, height=H,
        width=W, use_mxu=False,
    )
    bucketed, table, t_range, chunk_tr = _numpy_bucket(
        ev, counts, height=H, width=W, chunk=CHUNK
    )
    out = voxelize_batch_mxu_tiled(
        jnp.asarray(bucketed), jnp.asarray(table), jnp.asarray(t_range),
        jnp.asarray(chunk_tr),
        num_bins=NB, height=H, width=W, chunk=CHUNK, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)


def test_bucketed_u32_codec_round_trip():
    from eventpretrain_tpu.data.codec import (
        decode_events_u32,
        encode_events_u32_full,
    )

    rng = np.random.default_rng(4)
    ev, counts = _make_batch([3000, 100], 3000, rng)
    bucketed, table, t_range, chunk_tr = _numpy_bucket(
        ev, counts, height=H, width=W, chunk=CHUNK
    )
    enc = encode_events_u32_full(bucketed, t_range)
    dec = np.asarray(decode_events_u32(jnp.asarray(enc), jnp.asarray(t_range)))
    # sentinels survive (pads stay out of frame)
    pads = bucketed[..., 0] >= W
    assert np.all(dec[pads][:, 0] == 2047.0)
    real = ~pads
    np.testing.assert_array_equal(dec[real][:, 0], bucketed[real][:, 0])
    np.testing.assert_array_equal(dec[real][:, 1], bucketed[real][:, 1])
    # t within codec quantization of the window
    span = float(t_range[0, 1] - t_range[0, 0])
    assert np.abs(dec[0][real[0]][:, 2] - bucketed[0][real[0]][:, 2]).max() \
        <= span / 1023.0


def test_fused_u32_bucketer_matches_composed():
    """bucket_pack_event_batch_u32 (one fused C++ pass) must be word-
    identical to encode_events_u32_full(bucket_pack_event_batch(...)) —
    the composed path it replaces on the DensePipeline hot path."""
    from eventpretrain_tpu.data.codec import encode_events_u32_full
    from eventpretrain_tpu.native import bucket_pack_event_batch_u32

    rng = np.random.default_rng(5)
    ev, counts = _make_batch([9000, 0, 7, 3111], 9000, rng, h=440, w=640)
    ev[0, :50, 0] = rng.integers(-3, 700, 50)   # strays hit the clamp path
    ev[0, :50, 1] = rng.integers(-3, 500, 50)
    ev[3, :3111, 2] = 7.5                        # degenerate window
    bucketed, table, t_range, chunk_tr = bucket_pack_event_batch(
        ev, counts, height=440, width=640
    )
    want = encode_events_u32_full(bucketed, t_range)
    enc, table2, t_range2, chunk_tr2 = bucket_pack_event_batch_u32(
        ev, counts, height=440, width=640
    )
    np.testing.assert_array_equal(enc, want)
    np.testing.assert_array_equal(table2, table)
    np.testing.assert_array_equal(t_range2, t_range)
    np.testing.assert_array_equal(chunk_tr2, chunk_tr)


@pytest.mark.parametrize("task,bins", [
    ("semseg", NB),   # voxel grid
    ("semseg", 2),    # ECDP count image
    ("semseg", 3),    # MEM image (+ hot-pixel removal)
])
def test_dense_pipeline_tiled_parity(task, bins):
    from eventpretrain_tpu.data.dense_pipeline import (
        DenseDataConfig,
        DensePipeline,
        SyntheticDenseSource,
    )

    src = SyntheticDenseSource(
        task=task, n=4, num_classes=5, sensor_hw=(H, W), num_events=3000,
        cache=True,
    )
    kw = dict(
        task=task, num_bins=bins, input_size=64, fix_events_num=3000,
        val_fix_events_num=3000, sensor_height=H, sensor_width=W,
        label_size=(H, W),
    )
    batches = {}
    for mode in ("off", "on"):
        cfg = DenseDataConfig(tiled_raster=mode, **kw)
        pipe = DensePipeline(src, cfg, batch_size=2, train=True, seed=7)
        batches[mode] = [
            {k: np.asarray(v) for k, v in b.items()} for b in pipe
        ]
    for off, on in zip(batches["off"], batches["on"]):
        assert off.keys() == on.keys()
        np.testing.assert_array_equal(off["label"], on["label"])
        np.testing.assert_allclose(
            on["evg"], off["evg"], atol=5e-3
        )
