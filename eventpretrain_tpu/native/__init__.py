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
