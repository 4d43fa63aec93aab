"""Compact event transfer codec: f32 xytp -> uint16 quads (2x fewer bytes).

Host->device bandwidth is the end-to-end bottleneck for event pipelines
(measured ~55 MB/s through this environment's relay; 30 MB of f32 events per
batch-64). Events tolerate aggressive quantization for rasterization:

  x, y : fixed-point with 4 fractional bits (1/16 px; rasterizers floor to
         integer pixels, so only events within 1/16 px of a pixel boundary
         can move by one pixel)
  t    : per-sample normalized to [0, 65535] over the window — the voxelizer
         itself normalizes timestamps over the window (ops/events.py), so
         this loses at most (num_bins-1)/65536 of a bin in bilinear weights;
         count images ignore t entirely
  p    : {-1, 0, 1} -> {0, 1, 2}

NOT used for EvRep (its temporal channel needs absolute-time deltas) — the
pipelines fall back to f32 transfer there.

The u32 codec below halves the bytes again (4 B/event) by exploiting that
every device rasterizer floors x/y to integer pixels (ops/events.py) and
only uses t through the window-normalized bin position: x 11 bits
(sentinel 2047 = out of frame), y 10 bits (sentinel 1023), t 10 bits over
the window (bilinear bin-weight error <= (num_bins-1)/1024 of a bin), sign
of p 1 bit. Valid for every supported sensor (max 1280x800 < sentinels).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

COORD_SCALE = 16.0
T_SCALE = 65535.0


def encode_events_u16(
    packed: np.ndarray,
    counts: np.ndarray,
    out: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(B, E, 4) f32 xytp + (B,) counts -> ((B, E, 4) uint16, (B, 2) f32 t-range).

    Out-of-range coordinates (negative or beyond the 4095-px fixed-point
    range) encode to the sentinel 65535 so they decode to 4095.94 px — out of
    frame for every supported sensor — preserving the rasterizers'
    "out-of-range events are dropped" contract. Pass ``out`` to reuse a
    buffer (page-fault avoidance on the host hot path).
    """
    b, e, _ = packed.shape
    if out is None or out.shape != (b, e, 4) or out.dtype != np.uint16:
        out = np.empty((b, e, 4), np.uint16)
    t_range = np.empty((b, 2), np.float32)
    for i in range(b):
        n = int(counts[i])
        ev = packed[i, :n]
        xq = ev[:, 0] * COORD_SCALE + 0.5
        yq = ev[:, 1] * COORD_SCALE + 0.5
        out[i, :n, 0] = np.where((xq < 0) | (xq > 65534), 65535, xq)
        out[i, :n, 1] = np.where((yq < 0) | (yq > 65534), 65535, yq)
        if n > 0:
            t0, t1 = float(ev[0, 2]), float(ev[n - 1, 2])
        else:
            t0 = t1 = 0.0
        dt = (t1 - t0) or 1.0
        out[i, :n, 2] = np.clip(
            (ev[:, 2] - t0) / dt * T_SCALE + 0.5, 0, 65535
        )
        out[i, :n, 3] = (ev[:, 3] + 1).astype(np.uint16)
        out[i, n:] = 0
        t_range[i] = (t0, t1)
    return out, t_range


def decode_events_u16(encoded: jax.Array, t_range: jax.Array) -> jax.Array:
    """Device-side inverse -> (B, E, 4) f32 xytp (t mapped back to its window)."""
    enc = encoded.astype(jnp.float32)
    x = enc[..., 0] / COORD_SCALE
    y = enc[..., 1] / COORD_SCALE
    t0 = t_range[:, 0:1]
    t1 = t_range[:, 1:2]
    t = t0 + enc[..., 2] / T_SCALE * (t1 - t0)
    p = enc[..., 3] - 1.0
    return jnp.stack([x, y, t, p], axis=-1)


def encode_for_transfer(
    packed: np.ndarray,
    counts: np.ndarray,
    enabled: bool,
    out: np.ndarray | None = None,
    codec: str = "u16",
):
    """Shared pipeline helper: returns (device_events, device_t_range, out).

    ``out`` threads the reusable encode buffer back to the caller.
    ``codec``: "u16" (8 B/event, 1/16-px coords) or "u32" (4 B/event,
    integer-pixel coords — exact for every device rasterizer, which floors).
    """
    if enabled:
        enc_fn = encode_events_u32 if codec == "u32" else encode_events_u16
        enc, t_range = enc_fn(packed, counts, out=out)
        return jnp.asarray(enc), jnp.asarray(t_range), enc
    zeros = jnp.zeros((len(counts), 2), jnp.float32)
    return jnp.asarray(packed), zeros, out


X_SENTINEL = 0x7FF
Y_SENTINEL = 0x3FF
T32_SCALE = 1023.0


def encode_events_u32(
    packed: np.ndarray,
    counts: np.ndarray,
    out: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(B, E, 4) f32 xytp + (B,) counts -> ((B, E) uint32, (B, 2) f32 t-range).

    Layout per word: x[0:11] | y[11:21] | t[21:31] | sign(p)[31].

    Dispatches to the native encoder when available (~8x on a 1-core
    host; word-identical, pinned by tests/test_native_pack.py) and keeps
    this numpy loop as the executable specification and fallback.
    """
    from eventpretrain_tpu.native import encode_events_u32_native

    native = encode_events_u32_native(packed, counts, out=out)
    if native is not None:
        return native
    b, e, _ = packed.shape
    if out is None or out.shape != (b, e) or out.dtype != np.uint32:
        out = np.empty((b, e), np.uint32)
    t_range = np.empty((b, 2), np.float32)
    for i in range(b):
        n = int(counts[i])
        ev = packed[i, :n]
        x = ev[:, 0].astype(np.int64)
        y = ev[:, 1].astype(np.int64)
        x = np.where((x < 0) | (x >= X_SENTINEL), X_SENTINEL, x)
        y = np.where((y < 0) | (y >= Y_SENTINEL), Y_SENTINEL, y)
        if n > 0:
            t0, t1 = float(ev[0, 2]), float(ev[n - 1, 2])
        else:
            t0 = t1 = 0.0
        dt = (t1 - t0) or 1.0
        t = np.clip((ev[:, 2] - t0) / dt * T32_SCALE + 0.5, 0,
                    T32_SCALE).astype(np.int64)
        pos = (ev[:, 3] > 0).astype(np.int64)
        out[i, :n] = (x | (y << 11) | (t << 21) | (pos << 31)).astype(
            np.uint32
        )
        out[i, n:] = 0
        t_range[i] = (t0, t1)
    return out, t_range


def encode_events_u32_full(
    packed: np.ndarray,
    t_range: np.ndarray,
    out: np.ndarray | None = None,
) -> np.ndarray:
    """u32-encode EVERY slot of an already-bucketed batch against an
    explicit per-sample time window -> ``(B, E)`` uint32.

    The prefix-based ``encode_events_u32`` assumes valid entries leading
    and reads the window off slots 0 / n-1; after tile bucketing
    (native/bucket_pack_event_batch) neither holds — validity is carried
    by the out-of-frame coordinate sentinels (which this encoding
    preserves: x=2047 stays 2047) and the window comes from the bucketer.
    Decoded by the same ``decode_events_u32``.
    """
    b, e, _ = packed.shape
    if out is None or out.shape != (b, e) or out.dtype != np.uint32:
        out = np.empty((b, e), np.uint32)
    x = packed[..., 0].astype(np.int64)
    y = packed[..., 1].astype(np.int64)
    x = np.where((x < 0) | (x >= X_SENTINEL), X_SENTINEL, x)
    y = np.where((y < 0) | (y >= Y_SENTINEL), Y_SENTINEL, y)
    t0 = t_range[:, 0:1].astype(np.float32)
    t1 = t_range[:, 1:2].astype(np.float32)
    dt = np.where(t1 - t0 == 0, 1.0, t1 - t0)
    t = np.clip(
        (packed[..., 2] - t0) / dt * T32_SCALE + 0.5, 0, T32_SCALE
    ).astype(np.int64)
    pos = (packed[..., 3] > 0).astype(np.int64)
    np.copyto(out, (x | (y << 11) | (t << 21) | (pos << 31)).astype(np.uint32))
    return out


def decode_events_u32(encoded: jax.Array, t_range: jax.Array) -> jax.Array:
    """Device-side inverse -> (B, E, 4) f32 xytp (p in {-1, +1})."""
    w = encoded.astype(jnp.uint32)
    x = (w & X_SENTINEL).astype(jnp.float32)
    y = ((w >> 11) & Y_SENTINEL).astype(jnp.float32)
    tq = ((w >> 21) & 0x3FF).astype(jnp.float32)
    t0 = t_range[:, 0:1]
    t1 = t_range[:, 1:2]
    t = t0 + tq / T32_SCALE * (t1 - t0)
    p = (w >> 31).astype(jnp.float32) * 2.0 - 1.0
    return jnp.stack([x, y, t, p], axis=-1)
