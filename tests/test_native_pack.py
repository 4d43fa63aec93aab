"""Native event-pack extension: correctness vs numpy + both backends."""

import numpy as np

import eventpretrain_tpu.native as native


def _streams(rng, batch=8, max_n=5000):
    return [
        np.stack(
            [rng.integers(0, 64, n), rng.integers(0, 48, n),
             np.sort(rng.uniform(0, 1, n)), rng.integers(0, 2, n)], 1
        ).astype(np.float32)
        for n in rng.integers(10, max_n, batch)
    ]


def test_native_backend_builds():
    native._get_lib()
    assert native.BACKEND in ("native", "numpy")
    # the environment ships g++, so the native path should be live
    assert native.BACKEND == "native"


def test_pack_matches_numpy_fallback(rng):
    streams = _streams(rng)
    cap = 2048
    out_native, counts_native = native.pack_event_batch(streams, cap)

    # force numpy fallback
    lib, backend = native._LIB, native.BACKEND
    native._LIB, native.BACKEND = None, "numpy-forced"
    try:
        out_np, counts_np = native.pack_event_batch(streams, cap)
    finally:
        native._LIB, native.BACKEND = lib, backend

    np.testing.assert_array_equal(counts_native, counts_np)
    np.testing.assert_array_equal(out_native, out_np)


def test_backward_window_when_longer(rng):
    streams = [_streams(rng, batch=1, max_n=5000)[0]]
    streams[0] = np.concatenate([streams[0]] * 3)  # > cap
    cap = 1000
    out, counts = native.pack_event_batch(streams, cap)
    assert counts[0] == cap
    np.testing.assert_array_equal(out[0], streams[0][:cap])
    # train mode picks a random window
    rng2 = np.random.default_rng(0)
    out2, _ = native.pack_event_batch(streams, cap, rng=rng2, train=True)
    assert out2.shape == (1, cap, 4)


def test_padding_zeroed(rng):
    streams = [np.ones((10, 4), np.float32)]
    out, counts = native.pack_event_batch(streams, 64)
    assert counts[0] == 10
    assert (out[0, 10:] == 0).all()
    assert (out[0, :10] == 1).all()


def test_augment_pack_batch(rng):
    streams = _streams(rng, batch=6, max_n=20000)
    windows = [(0, s.shape[0]) for s in streams]
    hws = [(48.0, 64.0)] * 6
    out = native.augment_pack_event_batch(
        streams, windows, hws, 16000, seeds=list(range(6))
    )
    assert out is not None, "native augment path unavailable"
    packed, counts = out
    for i, s in enumerate(streams):
        n = s.shape[0]
        c = int(counts[i])
        if n // 100 > 0:
            # length changed within [n - 0.01n, n + 0.01n] (or capped)
            assert abs(c - min(n, 16000)) <= max(n // 100 + 1, 1)
        ts = packed[i, :c, 2]
        assert (np.diff(ts) >= 0).all(), f"sample {i} not time-sorted"
        assert packed[i, :c, 0].min() >= 0
        assert packed[i, :c, 0].max() <= 63
        assert (packed[i, c:] == 0).all()
    # deterministic per seed
    out2 = native.augment_pack_event_batch(
        streams, windows, hws, 16000, seeds=list(range(6))
    )
    np.testing.assert_array_equal(packed, out2[0])
    # different seeds differ
    out3 = native.augment_pack_event_batch(
        streams, windows, hws, 16000, seeds=[99] * 6
    )
    assert not np.array_equal(packed, out3[0])


def test_group_windows_native_matches_numpy_dp(rng):
    """The C++ knapsack grouping (swin planner hot loop) must reproduce the
    Python DP exactly — selection AND tie-breaking (the backtrack prefers
    not taking an item when the value is already attained)."""
    from eventpretrain_tpu.models.swin_plan import _group_windows_numpy

    if native.group_windows_native(49, [1, 2, 3]) is None:
        import pytest

        pytest.skip("native library unavailable")
    for _ in range(100):
        cap = int(rng.integers(1, 60))
        n = int(rng.integers(1, 90))
        wt = rng.integers(1, cap + 1, size=n).tolist()
        expect = _group_windows_numpy(cap, wt)
        group_of, ng = native.group_windows_native(cap, wt)
        grouped_idx = [
            np.flatnonzero(group_of == g).tolist() for g in range(ng)
        ]
        occ = np.asarray(wt)
        num_ele = [int(occ[i].sum()) for i in grouped_idx]
        assert (num_ele, grouped_idx) == expect


def test_encode_u32_native_matches_numpy(rng):
    """The native prefix-layout u32 encoder must be word-identical to the
    numpy specification loop in data/codec.py (f32 NEP-50 arithmetic,
    sentinel clamps, degenerate windows, zeroed pads)."""
    from eventpretrain_tpu.data import codec

    streams = _streams(rng, batch=6, max_n=4000)
    # strays exercise the sentinel clamp; one degenerate window
    streams[0][:20, 0] = rng.integers(-5, 3000, 20)
    streams[0][:20, 1] = rng.integers(-5, 1500, 20)
    streams[1][:, 2] = 42.0
    packed, counts = native.pack_event_batch(streams, 4100)
    counts[2] = 0  # empty-sample row

    got = codec.encode_events_u32(packed, counts)

    lib, backend = native._LIB, native.BACKEND
    native._LIB, native.BACKEND = None, "numpy-forced"
    try:
        want = codec.encode_events_u32(packed, counts)
    finally:
        native._LIB, native.BACKEND = lib, backend

    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])
