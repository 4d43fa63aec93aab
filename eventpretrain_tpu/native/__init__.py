"""Native (C++) host-pipeline components, built on demand via g++ + ctypes.

``pack_event_batch(streams, capacity, rng=None, train=False)`` packs a list
of variable-length (N, 4) float32 event streams into a padded (B, capacity,
4) batch + (B,) int32 counts with one multithreaded native call (window
selection follows reference events_augment.py:5-20: random start when
training and the stream is longer than the capacity; full stream otherwise).

Falls back to pure numpy when no compiler is available, so the package works
everywhere; ``BACKEND`` records which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional, Sequence

import numpy as np

_LIB = None
BACKEND = "numpy"


def _build_library() -> Optional[ctypes.CDLL]:
    src = os.path.join(os.path.dirname(__file__), "event_pack.cpp")
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "eventpretrain_tpu",
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, "libeventpack.so")
    if not os.path.exists(lib_path) or (
        os.path.getmtime(lib_path) < os.path.getmtime(src)
    ):
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            # no FMA contraction: the u32 codec paths are pinned
            # bit-identical to numpy, which evaluates mul and add as
            # separate correctly-rounded f32 ops
            "-ffp-contract=off",
            "-pthread", src, "-o", lib_path + ".tmp",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(lib_path + ".tmp", lib_path)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None
    lib.pack_event_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.pack_event_batch.restype = None
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, BACKEND
    if _LIB is None and BACKEND != "numpy-forced":
        _LIB = _build_library()
        BACKEND = "native" if _LIB is not None else "numpy"
    return _LIB


def pack_event_batch(
    streams: Sequence[np.ndarray],
    capacity: int,
    rng: Optional[np.random.Generator] = None,
    train: bool = False,
    out: Optional[np.ndarray] = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Pack variable-length float32 (N, 4) streams -> ((B, cap, 4), (B,)).

    Pass a preallocated ``out`` to avoid first-touch page faults on fresh
    allocations (dominant cost on small hosts).
    """
    batch = len(streams)
    starts = np.zeros(batch, np.int64)
    lengths = np.zeros(batch, np.int64)
    contig = []
    for i, s in enumerate(streams):
        s = np.ascontiguousarray(s, np.float32)
        contig.append(s)
        n = s.shape[0]
        if n > capacity:
            if train and rng is not None:
                starts[i] = int(rng.integers(0, n - capacity))
            else:
                starts[i] = 0
            lengths[i] = capacity
        else:
            lengths[i] = n

    lib = _get_lib()
    if out is None or out.shape != (batch, capacity, 4):
        out = np.empty((batch, capacity, 4), np.float32)
    counts = np.empty(batch, np.int32)
    if lib is None:
        out.fill(0.0)
        for i, s in enumerate(contig):
            n = int(lengths[i])
            out[i, :n] = s[starts[i] : starts[i] + n]
            counts[i] = n
        return out, counts

    ptrs = (ctypes.c_void_p * batch)(
        *[s.ctypes.data_as(ctypes.c_void_p).value for s in contig]
    )
    lib.pack_event_batch(
        ptrs,
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        batch,
        capacity,
        out.ctypes.data_as(ctypes.c_void_p),
        counts.ctypes.data_as(ctypes.c_void_p),
    )
    return out, counts


def _bind_augment(lib):
    if getattr(lib, "_augment_bound", False):
        return
    lib.augment_and_pack_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.augment_and_pack_batch.restype = None
    lib._augment_bound = True


def augment_pack_event_batch(
    streams: Sequence[np.ndarray],
    windows: Sequence[tuple[int, int]],
    sensor_hws: Sequence[tuple[float, float]],
    capacity: int,
    seeds: Sequence[int],
    out: Optional[np.ndarray] = None,
) -> Optional[tuple[np.ndarray, np.ndarray]]:
    """Fused erase_and_add augmentation + packing (native only).

    streams: raw float32 (N, 4) xytp arrays; windows: (start, end) row ranges
    to augment; sensor_hws: per-sample (h, w); seeds: per-sample RNG seeds.
    Returns None when the native library is unavailable (caller falls back to
    the numpy path).
    """
    lib = _get_lib()
    if lib is None or not hasattr(lib, "augment_and_pack_batch"):
        return None
    _bind_augment(lib)

    batch = len(streams)
    starts = np.asarray([w[0] for w in windows], np.int64)
    lengths = np.asarray(
        [w[1] - w[0] for w in windows], np.int64
    )
    hs = np.asarray([s[0] for s in sensor_hws], np.float32)
    ws = np.asarray([s[1] for s in sensor_hws], np.float32)
    seed_arr = np.asarray(seeds, np.uint64)
    contig = [np.ascontiguousarray(s, np.float32) for s in streams]
    if out is None or out.shape != (batch, capacity, 4):
        out = np.empty((batch, capacity, 4), np.float32)
    counts = np.empty(batch, np.int32)
    ptrs = (ctypes.c_void_p * batch)(
        *[s.ctypes.data_as(ctypes.c_void_p).value for s in contig]
    )
    lib.augment_and_pack_batch(
        ptrs,
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        hs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ws.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        seed_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        batch,
        capacity,
        out.ctypes.data_as(ctypes.c_void_p),
        counts.ctypes.data_as(ctypes.c_void_p),
    )
    return out, counts


BUCKET_X_SENTINEL = 2047.0  # == data/codec.py X_SENTINEL: survives the u32
BUCKET_Y_SENTINEL = 1023.0  # codec and decodes out-of-frame on device

# Shared tiled-splat layout. The host bucketer and the Pallas tiled kernel
# (ops/pallas_voxel.py::splat_mxu_tiled, which defaults from these names)
# must agree on tile geometry: a chunk mismatch trips shape asserts, but a
# tile_h/tile_w mismatch would silently misroute events (the one-hot rows
# match nothing and the events vanish from the representation). Defined
# here, on the host side, so ``native`` keeps its no-jax import surface.
TILE_H = 128
TILE_W = 128
TILE_CHUNK = 1024


def _bucket_layout(cap, height, width, tile_h, tile_w, chunk):
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    t = tiles_y * tiles_x
    epad = -(-cap // chunk) * chunk + t * chunk
    return tiles_y, tiles_x, t, epad, epad // chunk


def _bind_bucket(lib):
    if getattr(lib, "_bucket_bound", False):
        return
    lib.bucket_pack_batch.argtypes = [
        ctypes.c_void_p,                        # packed (B, cap, 4) f32
        ctypes.POINTER(ctypes.c_int32),         # counts (B,)
        ctypes.c_int64, ctypes.c_int64,         # batch, cap
        ctypes.c_int64, ctypes.c_int64,         # tile_h, tile_w
        ctypes.c_int64, ctypes.c_int64,         # tiles_x, tiles_y
        ctypes.c_int64, ctypes.c_int64,         # chunk, epad
        ctypes.c_void_p,                        # out (B, epad, 4) f32
        ctypes.c_void_p,                        # table (B, nchunks) i32
        ctypes.c_void_p,                        # t_range (B, 2) f32
        ctypes.c_void_p,                        # chunk_trange (B, nchunks, 2)
    ]
    lib.bucket_pack_batch.restype = None
    lib._bucket_bound = True


def bucket_pack_event_batch(
    packed: np.ndarray,
    counts: np.ndarray,
    *,
    height: int,
    width: int,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    chunk: int = TILE_CHUNK,
    out: Optional[np.ndarray] = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Group a packed event batch by spatial tile for the tiled MXU splat
    (ops/pallas_voxel.py::voxelize_batch_mxu_tiled) — a stable counting
    sort, one O(E) pass per sample.

    ``(B, cap, 4)`` f32 xytp + ``(B,)`` counts ->
      * ``bucketed (B, EPAD, 4)`` f32: each tile's events contiguous in
        row-major tile order, every segment padded to a multiple of
        ``chunk`` and at least one chunk long (so every output tile is
        visited); pad slots carry the codec-surviving out-of-frame
        sentinel ``(2047, 1023, t0, 0)``;
      * ``tile_table (B, EPAD // chunk)`` i32: each chunk's tile id,
        nondecreasing (trailing filler chunks belong to the last tile);
      * ``t_range (B, 2)`` f32: the pre-permutation time window
        (first/last valid timestamps), which the device voxelizer needs
        because bucketing destroys time order;
      * ``chunk_trange (B, EPAD // chunk, 2)`` f32: min/max timestamp of
        each chunk's real events ((t0, t0) when all-pad) — placement
        preserves time order within a tile, so chunks span narrow time
        slices and the kernel can skip temporal bins they cannot touch.

    The reference rasterizes DSEC-scale grids per-sample on CPU workers
    (dataset/finetune_semseg/ft_dsec_dataset.py:152-226); here routing is
    the only host step and the splat itself stays on the MXU.
    """
    batch, cap, _ = packed.shape
    tiles_y, tiles_x, t_total, epad, n_chunks = _bucket_layout(
        cap, height, width, tile_h, tile_w, chunk
    )
    counts = np.asarray(counts, np.int32)
    if out is None or out.shape != (batch, epad, 4):
        out = np.empty((batch, epad, 4), np.float32)
    table = np.empty((batch, n_chunks), np.int32)
    t_range = np.empty((batch, 2), np.float32)
    chunk_trange = np.empty((batch, n_chunks, 2), np.float32)

    lib = _get_lib()
    if lib is not None and hasattr(lib, "bucket_pack_batch"):
        _bind_bucket(lib)
        packed_c = np.ascontiguousarray(packed, np.float32)
        lib.bucket_pack_batch(
            packed_c.ctypes.data_as(ctypes.c_void_p),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            batch, cap, tile_h, tile_w, tiles_x, tiles_y, chunk, epad,
            out.ctypes.data_as(ctypes.c_void_p),
            table.ctypes.data_as(ctypes.c_void_p),
            t_range.ctypes.data_as(ctypes.c_void_p),
            chunk_trange.ctypes.data_as(ctypes.c_void_p),
        )
        return out, table, t_range, chunk_trange

    for i in range(batch):
        n = int(counts[i])
        ev = packed[i, :n]
        t0 = float(ev[0, 2]) if n else 0.0
        t1 = float(ev[n - 1, 2]) if n else 0.0
        t_range[i] = (t0, t1)
        chunk_trange[i] = t0
        xi = ev[:, 0].astype(np.int64)
        yi = ev[:, 1].astype(np.int64)
        tid = np.clip(yi // tile_h, 0, tiles_y - 1) * tiles_x + np.clip(
            xi // tile_w, 0, tiles_x - 1
        )
        cnts = np.bincount(tid, minlength=t_total).astype(np.int64)
        region = np.maximum(-(-cnts // chunk) * chunk, chunk)
        starts = np.concatenate([[0], np.cumsum(region)])
        order = np.argsort(tid, kind="stable")
        csum = np.concatenate([[0], np.cumsum(cnts)])
        sorted_tid = tid[order]
        dest = starts[sorted_tid] + (np.arange(n) - csum[sorted_tid])
        out[i] = (BUCKET_X_SENTINEL, BUCKET_Y_SENTINEL, t0, 0.0)
        out[i, dest] = ev[order]
        if n:
            # dest is strictly increasing over the sorted order, so chunk
            # boundaries are where dest // chunk changes; time order holds
            # within each tile (stable sort), hence within each chunk
            c_of = dest // chunk
            t_sorted = ev[order][:, 2]
            first = np.r_[True, c_of[1:] != c_of[:-1]]
            last = np.r_[c_of[1:] != c_of[:-1], True]
            chunk_trange[i, c_of[first], 0] = t_sorted[first]
            chunk_trange[i, c_of[last], 1] = t_sorted[last]
        used = int(starts[t_total]) // chunk
        table[i, :used] = np.repeat(
            np.arange(t_total, dtype=np.int32), region // chunk
        )
        table[i, used:] = t_total - 1
    return out, table, t_range, chunk_trange


def _bind_encode_u32(lib):
    if getattr(lib, "_encode_u32_bound", False):
        return
    lib.encode_u32_prefix.argtypes = [
        ctypes.c_void_p,                        # packed (B, cap, 4) f32
        ctypes.POINTER(ctypes.c_int32),         # counts (B,)
        ctypes.c_int64, ctypes.c_int64,         # batch, cap
        ctypes.c_void_p,                        # out (B, cap) u32
        ctypes.c_void_p,                        # t_range (B, 2) f32
    ]
    lib.encode_u32_prefix.restype = None
    lib._encode_u32_bound = True


def encode_events_u32_native(
    packed: np.ndarray,
    counts: np.ndarray,
    out: Optional[np.ndarray] = None,
) -> Optional[tuple[np.ndarray, np.ndarray]]:
    """Native prefix-layout u32 transfer encoder (word-identical to
    data/codec.py::encode_events_u32's numpy loop — see that function,
    which calls this first). Returns None when the library is unavailable.
    """
    lib = _get_lib()
    if lib is None or not hasattr(lib, "encode_u32_prefix"):
        return None
    _bind_encode_u32(lib)
    batch, cap, _ = packed.shape
    counts = np.asarray(counts, np.int32)
    if out is None or out.shape != (batch, cap) or out.dtype != np.uint32:
        out = np.empty((batch, cap), np.uint32)
    t_range = np.empty((batch, 2), np.float32)
    packed_c = np.ascontiguousarray(packed, np.float32)
    lib.encode_u32_prefix(
        packed_c.ctypes.data_as(ctypes.c_void_p),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        batch, cap,
        out.ctypes.data_as(ctypes.c_void_p),
        t_range.ctypes.data_as(ctypes.c_void_p),
    )
    return out, t_range


def _bind_bucket_u32(lib):
    if getattr(lib, "_bucket_u32_bound", False):
        return
    lib.bucket_pack_batch_u32.argtypes = [
        ctypes.c_void_p,                        # packed (B, cap, 4) f32
        ctypes.POINTER(ctypes.c_int32),         # counts (B,)
        ctypes.c_int64, ctypes.c_int64,         # batch, cap
        ctypes.c_int64, ctypes.c_int64,         # tile_h, tile_w
        ctypes.c_int64, ctypes.c_int64,         # tiles_x, tiles_y
        ctypes.c_int64, ctypes.c_int64,         # chunk, epad
        ctypes.c_void_p,                        # out (B, epad) u32
        ctypes.c_void_p,                        # table (B, nchunks) i32
        ctypes.c_void_p,                        # t_range (B, 2) f32
        ctypes.c_void_p,                        # chunk_trange (B, nchunks, 2)
    ]
    lib.bucket_pack_batch_u32.restype = None
    lib._bucket_u32_bound = True


def bucket_pack_event_batch_u32(
    packed: np.ndarray,
    counts: np.ndarray,
    *,
    height: int,
    width: int,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    chunk: int = TILE_CHUNK,
    out: Optional[np.ndarray] = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Fused tile bucketing + u32 transfer encoding: one C++ pass placing
    each event directly as its codec word -> ``(enc (B, EPAD) u32,
    tile_table, t_range, chunk_trange)``, word-identical to
    ``encode_events_u32_full(bucket_pack_event_batch(...))`` but writing
    4 B/slot once instead of 16 B/slot plus a vectorized-numpy re-encode
    (~13x less per-batch host time on a 1-core host; the tiled-raster
    pipeline's entire host cost is this call)."""
    batch, cap, _ = packed.shape
    tiles_y, tiles_x, t_total, epad, n_chunks = _bucket_layout(
        cap, height, width, tile_h, tile_w, chunk
    )
    counts = np.asarray(counts, np.int32)
    lib = _get_lib()
    if lib is None or not hasattr(lib, "bucket_pack_batch_u32"):
        from eventpretrain_tpu.data.codec import encode_events_u32_full

        bucketed, table, t_range, chunk_trange = bucket_pack_event_batch(
            packed, counts, height=height, width=width, tile_h=tile_h,
            tile_w=tile_w, chunk=chunk,
        )
        enc = encode_events_u32_full(bucketed, t_range, out=out)
        return enc, table, t_range, chunk_trange

    _bind_bucket_u32(lib)
    if out is None or out.shape != (batch, epad) or out.dtype != np.uint32:
        out = np.empty((batch, epad), np.uint32)
    table = np.empty((batch, n_chunks), np.int32)
    t_range = np.empty((batch, 2), np.float32)
    chunk_trange = np.empty((batch, n_chunks, 2), np.float32)
    packed_c = np.ascontiguousarray(packed, np.float32)
    lib.bucket_pack_batch_u32(
        packed_c.ctypes.data_as(ctypes.c_void_p),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        batch, cap, tile_h, tile_w, tiles_x, tiles_y, chunk, epad,
        out.ctypes.data_as(ctypes.c_void_p),
        table.ctypes.data_as(ctypes.c_void_p),
        t_range.ctypes.data_as(ctypes.c_void_p),
        chunk_trange.ctypes.data_as(ctypes.c_void_p),
    )
    return out, table, t_range, chunk_trange


def _bind_group_windows(lib):
    if getattr(lib, "_group_windows_bound", False):
        return
    lib.group_windows_native.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.group_windows_native.restype = None
    lib._group_windows_bound = True


def group_windows_native(
    capacity: int, weights: Sequence[int]
) -> Optional[tuple[np.ndarray, int]]:
    """Greedy knapsack window grouping (sparse-Swin planner hot loop).

    Returns (group_of (n,) int32, num_groups), or None when the native
    library is unavailable (caller falls back to the numpy DP). Selection
    and tie-breaking match models/swin_plan.py::group_windows exactly.
    """
    lib = _get_lib()
    if lib is None or not hasattr(lib, "group_windows_native"):
        return None
    _bind_group_windows(lib)
    w = np.ascontiguousarray(weights, np.int32)
    n = w.shape[0]
    group_of = np.empty(n, np.int32)
    num_groups = ctypes.c_int32(0)
    lib.group_windows_native(
        capacity,
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        group_of.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(num_groups),
    )
    return group_of, int(num_groups.value)
