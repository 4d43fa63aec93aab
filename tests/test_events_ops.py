"""Golden-value tests for event->tensor kernels against the reference formulas.

The expected values are computed by independent numpy implementations of the
documented algorithms (reference dataset/dataset_utils/events_to_voxel_grid.py
and events_to_image.py), not by importing the reference code.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eventpretrain_tpu.ops import (
    events_to_voxel_grid,
    events_to_image_ecdp,
    events_to_image_mem,
    events_to_evrep,
    remove_hot_pixels,
)
from eventpretrain_tpu.ops.events import events_to_voxel_grid_batch


def synth_events(rng, n, width, height, t0=0.0, t1=1.0, pol_choices=(0, 1)):
    x = rng.integers(0, width, n).astype(np.float32)
    y = rng.integers(0, height, n).astype(np.float32)
    t = np.sort(rng.uniform(t0, t1, n)).astype(np.float32)
    p = rng.choice(pol_choices, n).astype(np.float32)
    return np.stack([x, y, t, p], axis=1)


def np_voxel_grid(events, num_bins, height, width):
    """Independent numpy implementation of the reference voxelizer formula."""
    grid = np.zeros(num_bins * height * width, np.float64)
    xs = events[:, 0].astype(np.int64)
    ys = events[:, 1].astype(np.int64)
    t = events[:, 2].astype(np.float64)
    ps = events[:, 3].astype(np.float64).copy()
    ps[ps == 0] = -1
    dt = t[-1] - t[0]
    if dt == 0:
        dt = 1.0
    ts = (num_bins - 1) * (t - t[0]) / dt
    tis = np.floor(ts)
    dts = ts - tis
    left = (tis < num_bins) & (tis >= 0)
    right = ((tis + 1) < num_bins) & (tis >= 0)
    np.add.at(
        grid,
        xs[left] + ys[left] * width + tis[left].astype(np.int64) * width * height,
        ps[left] * (1 - dts[left]),
    )
    np.add.at(
        grid,
        xs[right] + ys[right] * width + (tis[right].astype(np.int64) + 1) * width * height,
        ps[right] * dts[right],
    )
    return grid.reshape(num_bins, height, width)


class TestVoxelGrid:
    def test_golden_vs_numpy(self, rng):
        h, w, bins = 24, 32, 5
        ev = synth_events(rng, 500, w, h)
        got = events_to_voxel_grid(
            jnp.asarray(ev), jnp.int32(len(ev)), num_bins=bins, height=h, width=w
        )
        want = np_voxel_grid(ev, bins, h, w)  # (bins, h, w)
        np.testing.assert_allclose(
            np.asarray(got), want.transpose(1, 2, 0), rtol=1e-4, atol=1e-5
        )

    def test_padding_is_ignored(self, rng):
        h, w, bins = 16, 16, 5
        ev = synth_events(rng, 100, w, h)
        padded = np.concatenate([ev, np.full((40, 4), 7.0, np.float32)])
        a = events_to_voxel_grid(
            jnp.asarray(ev), jnp.int32(100), num_bins=bins, height=h, width=w
        )
        b = events_to_voxel_grid(
            jnp.asarray(padded), jnp.int32(100), num_bins=bins, height=h, width=w
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_single_timestamp(self, rng):
        # deltaT == 0 path: all events land in bin 0 with weight p.
        h, w, bins = 8, 8, 5
        ev = synth_events(rng, 50, w, h, t0=0.5, t1=0.5)
        ev[:, 2] = 0.5
        got = np.asarray(
            events_to_voxel_grid(
                jnp.asarray(ev), jnp.int32(50), num_bins=bins, height=h, width=w
            )
        )
        want = np_voxel_grid(ev, bins, h, w).transpose(1, 2, 0)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_polarity_zero_maps_to_minus_one(self):
        ev = np.array([[1, 1, 0.0, 0], [2, 2, 1.0, 1]], np.float32)
        got = np.asarray(
            events_to_voxel_grid(
                jnp.asarray(ev), jnp.int32(2), num_bins=2, height=4, width=4
            )
        )
        assert got[1, 1, 0] == -1.0
        assert got[2, 2, 1] == 1.0

    def test_batch(self, rng):
        h, w, bins = 16, 16, 5
        evs = np.stack([synth_events(rng, 80, w, h) for _ in range(4)])
        counts = jnp.full((4,), 80, jnp.int32)
        got = events_to_voxel_grid_batch(
            jnp.asarray(evs), counts, num_bins=bins, height=h, width=w
        )
        assert got.shape == (4, h, w, bins)
        # on CPU (the test backend) the batch entry is the exact f32
        # scatter; on TPU it dispatches to the bf16-hi/lo MXU kernel, so
        # the tolerance must cover that path when the suite runs on-chip
        tol = (
            dict(rtol=1e-4, atol=1e-5)
            if jax.default_backend() != "tpu"
            else dict(rtol=1e-3, atol=2e-3)
        )
        for i in range(4):
            want = np_voxel_grid(evs[i], bins, h, w).transpose(1, 2, 0)
            np.testing.assert_allclose(np.asarray(got[i]), want, **tol)


class TestEventImages:
    def test_ecdp_counts(self, rng):
        h, w = 20, 30
        ev = synth_events(rng, 400, w, h)
        got = np.asarray(
            events_to_image_ecdp(jnp.asarray(ev), jnp.int32(400), height=h, width=w)
        )
        pos = np.zeros((h, w))
        neg = np.zeros((h, w))
        for x, y, t, p in ev:
            if p == 1:
                pos[int(y), int(x)] += 1
            else:
                neg[int(y), int(x)] += 1
        np.testing.assert_allclose(got[..., 0], pos)
        np.testing.assert_allclose(got[..., 1], neg)

    def test_mem_three_channels(self, rng):
        h, w = 12, 12
        ev = synth_events(rng, 100, w, h, pol_choices=(-1, 1))
        got = np.asarray(
            events_to_image_mem(jnp.asarray(ev), jnp.int32(100), height=h, width=w)
        )
        assert got.shape == (h, w, 3)
        assert (got[..., 1] == 0).all()
        assert got[..., 0].sum() == (ev[:, 3] == 1).sum()
        assert got[..., 2].sum() == (ev[:, 3] == -1).sum()

    def test_remove_hot_pixels(self):
        h, w = 16, 16
        hist = np.ones((h, w, 3), np.float32)
        hist[..., 1] = 0
        hist[3, 4, 0] = 500.0  # hot pixel in pos channel
        out = np.asarray(remove_hot_pixels(jnp.asarray(hist)))
        assert out[3, 4, 0] == 0
        assert out[3, 4, 2] == 0  # both count channels zeroed
        assert out[0, 0, 0] == 1


class TestEvRep:
    def test_matches_numpy_reference_formula(self, rng):
        h, w = 10, 14
        n = 300
        ev = synth_events(rng, n, w, h)
        got = np.asarray(
            events_to_evrep(jnp.asarray(ev), jnp.int32(n), height=h, width=w)
        )

        # independent numpy implementation of the documented algorithm
        xs = ev[:, 0].astype(np.int64)
        ys = ev[:, 1].astype(np.int64)
        ts = ev[:, 2].astype(np.float64)
        ps = np.where(ev[:, 3] == 0, -1, ev[:, 3]).astype(np.float64)
        e_c = np.zeros((h, w))
        e_i = np.zeros((h, w))
        np.add.at(e_c, (ys, xs), 1)
        np.add.at(e_i, (ys, xs), ps)
        order = np.lexsort((ts, ys, xs))
        sx, sy, st = xs[order], ys[order], ts[order]
        delta = np.diff(st, prepend=st[0])
        dsum = np.zeros((h, w))
        dsq = np.zeros((h, w))
        np.add.at(dsum, (sy, sx), delta)
        np.add.at(dsq, (sy, sx), delta ** 2)
        cnt = np.clip(e_c, 1, None)
        mean = dsum / cnt
        e_t = np.sqrt(np.maximum(dsq / cnt - mean ** 2, 0)).clip(max=1000)

        np.testing.assert_allclose(got[..., 0], e_c, atol=1e-4)
        np.testing.assert_allclose(got[..., 1], e_i, atol=1e-4)
        np.testing.assert_allclose(got[..., 2], e_t, rtol=1e-3, atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestU32Codec:
    def test_roundtrip_matches_rasterizer(self):
        """u32-decoded events voxelize identically to f32 events (integer
        pixels + <=1/1023-window t quantization, which the golden grids
        absorb at 1e-2)."""
        import jax.numpy as jnp

        from eventpretrain_tpu.data.codec import (
            decode_events_u32, encode_events_u32,
        )
        from eventpretrain_tpu.ops.events import events_to_voxel_grid

        rng = np.random.default_rng(0)
        n, cap = 500, 512
        ev = np.zeros((1, cap, 4), np.float32)
        ev[0, :n, 0] = rng.uniform(0, 63, n)
        ev[0, :n, 1] = rng.uniform(0, 47, n)
        ev[0, :n, 2] = np.sort(rng.uniform(10.0, 10.5, n))
        ev[0, :n, 3] = rng.choice([-1.0, 1.0], n)
        counts = np.asarray([n], np.int32)
        enc, t_range = encode_events_u32(ev, counts)
        assert enc.dtype == np.uint32 and enc.shape == (1, cap)
        dec = decode_events_u32(jnp.asarray(enc), jnp.asarray(t_range))
        ref = events_to_voxel_grid(
            jnp.asarray(np.floor(ev[0]) * [1, 1, 0, 1]
                        + ev[0] * [0, 0, 1, 0]),
            jnp.asarray(n), num_bins=5, height=48, width=64,
        )
        got = events_to_voxel_grid(
            dec[0], jnp.asarray(n), num_bins=5, height=48, width=64,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-2)
        # hard equality on the count image (t-free)
        from eventpretrain_tpu.ops.events import events_to_image_ecdp

        ref_img = events_to_image_ecdp(
            jnp.asarray(ev[0]), jnp.asarray(n), height=48, width=64)
        got_img = events_to_image_ecdp(
            dec[0], jnp.asarray(n), height=48, width=64)
        np.testing.assert_array_equal(np.asarray(got_img),
                                      np.asarray(ref_img))

    def test_out_of_range_sentinel(self):
        import jax.numpy as jnp

        from eventpretrain_tpu.data.codec import (
            decode_events_u32, encode_events_u32,
        )

        ev = np.zeros((1, 4, 4), np.float32)
        ev[0, 0] = (-3.0, 5.0, 0.0, 1.0)     # negative x
        ev[0, 1] = (5000.0, 5.0, 0.5, 1.0)   # huge x
        ev[0, 2] = (5.0, -1.0, 0.8, -1.0)    # negative y
        ev[0, 3] = (5.0, 2000.0, 1.0, -1.0)  # huge y
        enc, t_range = encode_events_u32(ev, np.asarray([4], np.int32))
        dec = np.asarray(decode_events_u32(jnp.asarray(enc),
                                           jnp.asarray(t_range)))
        assert dec[0, 0, 0] == 2047 and dec[0, 1, 0] == 2047
        assert dec[0, 2, 1] == 1023 and dec[0, 3, 1] == 1023
