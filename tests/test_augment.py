"""Property tests for augmentations (reference dataset/augmentation parity)."""

import numpy as np
import jax.numpy as jnp

from eventpretrain_tpu.data import (
    random_window,
    rescale_coords,
    erase_and_add_events,
    add_noise_events,
    pad_events,
)
from eventpretrain_tpu.ops.view_augment import (
    ViewParams,
    sample_view_params,
    identity_view_params,
    apply_view_augment,
    apply_frame_augment,
    apply_semseg_label_augment,
    apply_flow_label_augment,
)


def make_events(rng, n=1000, w=64, h=48):
    x = rng.integers(0, w, n).astype(np.float64)
    y = rng.integers(0, h, n).astype(np.float64)
    t = np.sort(rng.uniform(0, 1, n))
    p = rng.integers(0, 2, n).astype(np.float64)
    return np.stack([x, y, t, p], 1)


class TestEventTransforms:
    def test_random_window(self, rng):
        s, e = random_window(rng, 10_000, 3000)
        assert e - s == 3000 and 0 <= s <= 7000
        s, e = random_window(rng, 100, 3000)
        assert (s, e) == (0, 100)

    def test_rescale_coords(self, rng):
        ev = make_events(rng, 100, 640, 480)
        out = rescale_coords(ev.copy(), 640, 480, 224, 224)
        assert out[:, 0].max() < 224 and out[:, 1].max() < 224

    def test_erase_and_add(self, rng):
        ev = make_events(rng, 5000)
        out = erase_and_add_events(rng, ev.copy(), (48, 64))
        # length changed within +-1% and still time sorted, coords clipped
        assert abs(out.shape[0] - 5000) < 100
        assert (np.diff(out[:, 2]) >= 0).all()
        assert out[:, 0].min() >= 0 and out[:, 0].max() <= 63
        # tiny streams are untouched
        small = make_events(rng, 50)
        assert erase_and_add_events(rng, small.copy(), (48, 64)).shape[0] == 50

    def test_add_noise(self, rng):
        ev = make_events(rng, 2000)
        out = add_noise_events(rng, ev.copy(), (48, 64))
        assert 2000 + 200 <= out.shape[0] <= 2000 + 1000
        assert (np.diff(out[:, 2]) >= 0).all()

    def test_pad_events(self, rng):
        ev = make_events(rng, 100).astype(np.float32)
        arr, count = pad_events(ev, 128)
        assert arr.shape == (128, 4) and count == 100
        assert (arr[100:] == 0).all()
        arr2, count2 = pad_events(ev, 64)
        assert count2 == 64 and arr2.shape == (64, 4)


class TestViewAugment:
    def test_identity_resize_only(self, rng):
        views = jnp.asarray(rng.normal(size=(2, 32, 32, 5)).astype(np.float32))
        params = identity_view_params(2, 32, 32)
        out = apply_view_augment(views, params, (32, 32), "nearest")
        np.testing.assert_allclose(np.asarray(out), np.asarray(views))

    def test_crop_resize_shapes(self, rng):
        views = jnp.asarray(rng.normal(size=(4, 48, 64, 5)).astype(np.float32))
        params = sample_view_params(rng, 4, 48, 64)
        for mode in ("nearest", "bilinear"):
            out = apply_view_augment(views, params, (32, 32), mode)
            assert out.shape == (4, 32, 32, 5)

    def test_hflip(self, rng):
        views = jnp.asarray(rng.normal(size=(1, 16, 16, 5)).astype(np.float32))
        params = ViewParams(
            crop_y=jnp.zeros(1, jnp.int32), crop_x=jnp.zeros(1, jnp.int32),
            crop_h=jnp.full((1,), 16, jnp.int32), crop_w=jnp.full((1,), 16, jnp.int32),
            hflip=jnp.ones(1, bool), tflip=jnp.zeros(1, bool),
        )
        out = apply_view_augment(views, params, (16, 16), "nearest")
        np.testing.assert_allclose(np.asarray(out), np.asarray(views[:, :, ::-1, :]))

    def test_time_flip_negates_voxel(self, rng):
        views = jnp.asarray(rng.normal(size=(1, 16, 16, 5)).astype(np.float32))
        params = ViewParams(
            crop_y=jnp.zeros(1, jnp.int32), crop_x=jnp.zeros(1, jnp.int32),
            crop_h=jnp.full((1,), 16, jnp.int32), crop_w=jnp.full((1,), 16, jnp.int32),
            hflip=jnp.zeros(1, bool), tflip=jnp.ones(1, bool),
        )
        out = apply_view_augment(views, params, (16, 16), "nearest")
        np.testing.assert_allclose(
            np.asarray(out), -np.asarray(views[..., ::-1])
        )
        # time-flip twice = identity
        out2 = apply_view_augment(out, params, (16, 16), "nearest")
        np.testing.assert_allclose(np.asarray(out2), np.asarray(views), atol=1e-6)
        # count representations flip order but keep sign
        out3 = apply_view_augment(
            views, params, (16, 16), "nearest", negate_on_tflip=False
        )
        np.testing.assert_allclose(np.asarray(out3), np.asarray(views[..., ::-1]))

    def test_frame_sign_flips_with_tflip(self, rng):
        frames = jnp.asarray(rng.normal(size=(1, 16, 16, 1)).astype(np.float32))
        params = ViewParams(
            crop_y=jnp.zeros(1, jnp.int32), crop_x=jnp.zeros(1, jnp.int32),
            crop_h=jnp.full((1,), 16, jnp.int32), crop_w=jnp.full((1,), 16, jnp.int32),
            hflip=jnp.zeros(1, bool), tflip=jnp.ones(1, bool),
        )
        out = apply_frame_augment(frames, params, (16, 16), "bicubic")
        np.testing.assert_allclose(np.asarray(out), -np.asarray(frames), atol=1e-5)

    def test_semseg_label_nearest_preserves_classes(self, rng):
        labels = jnp.asarray(rng.integers(0, 11, size=(2, 48, 64)).astype(np.int32))
        params = sample_view_params(rng, 2, 48, 64)
        out = apply_semseg_label_augment(labels, params, (32, 32))
        vals = set(np.unique(np.asarray(out)).tolist())
        assert vals <= set(range(11))

    def test_flow_hflip_negates_u(self, rng):
        flows = jnp.asarray(rng.normal(size=(1, 16, 16, 2)).astype(np.float32))
        params = ViewParams(
            crop_y=jnp.zeros(1, jnp.int32), crop_x=jnp.zeros(1, jnp.int32),
            crop_h=jnp.full((1,), 16, jnp.int32), crop_w=jnp.full((1,), 16, jnp.int32),
            hflip=jnp.ones(1, bool), tflip=jnp.zeros(1, bool),
        )
        out = apply_flow_label_augment(flows, params, (16, 16))
        np.testing.assert_allclose(
            np.asarray(out[..., 0]), -np.asarray(flows[:, :, ::-1, 0]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out[..., 1]), np.asarray(flows[:, :, ::-1, 1]), atol=1e-6
        )

    def test_flow_resize_rescales_vectors(self):
        flows = jnp.ones((1, 8, 8, 2), jnp.float32)
        params = identity_view_params(1, 8, 8)
        out = apply_flow_label_augment(flows, params, (16, 24))
        np.testing.assert_allclose(np.asarray(out[..., 0]), 3.0)
        np.testing.assert_allclose(np.asarray(out[..., 1]), 2.0)

    def test_coupled_views_share_params(self, rng):
        # the seed-replay coupling of the reference becomes shared params:
        # an event grid and its label crop identically.
        evg = jnp.asarray(rng.normal(size=(1, 48, 64, 5)).astype(np.float32))
        label = jnp.asarray(evg[..., 0])
        params = sample_view_params(rng, 1, 48, 64, tflip_prob=0.0)
        a = apply_view_augment(evg, params, (32, 32), "nearest")
        b = apply_semseg_label_augment(label, params, (32, 32))
        np.testing.assert_allclose(np.asarray(a[..., 0]), np.asarray(b), atol=1e-6)


class TestCodec:
    def test_roundtrip_precision(self, rng):
        from eventpretrain_tpu.data.codec import (
            encode_events_u16, decode_events_u16,
        )
        import jax.numpy as jnp

        n = 5000
        ev = np.stack([
            rng.uniform(0, 640, n), rng.uniform(0, 480, n),
            np.sort(rng.uniform(1e6, 2e6, n)), rng.integers(0, 2, n),
        ], 1).astype(np.float32)
        packed = ev[None]
        counts = np.asarray([n], np.int32)
        enc, t_range = encode_events_u16(packed, counts)
        dec = np.asarray(decode_events_u16(jnp.asarray(enc),
                                           jnp.asarray(t_range)))
        np.testing.assert_allclose(dec[0, :, 0], ev[:, 0], atol=1 / 16)
        np.testing.assert_allclose(dec[0, :, 1], ev[:, 1], atol=1 / 16)
        # t error bounded by window/65535
        np.testing.assert_allclose(
            dec[0, :, 2], ev[:, 2], atol=(1e6 / 65535) * 1.01
        )
        np.testing.assert_array_equal(dec[0, :, 3], ev[:, 3])

    def test_voxel_grid_equivalence(self, rng):
        from eventpretrain_tpu.data.codec import (
            encode_events_u16, decode_events_u16,
        )
        from eventpretrain_tpu.ops.events import events_to_voxel_grid
        import jax.numpy as jnp

        n, h, w = 2000, 48, 64
        ev = np.stack([
            rng.integers(0, w, n), rng.integers(0, h, n),
            np.sort(rng.uniform(0, 1, n)), rng.integers(0, 2, n),
        ], 1).astype(np.float32)
        enc, t_range = encode_events_u16(ev[None], np.asarray([n], np.int32))
        dec = decode_events_u16(jnp.asarray(enc), jnp.asarray(t_range))[0]
        a = events_to_voxel_grid(jnp.asarray(ev), jnp.int32(n),
                                 num_bins=5, height=h, width=w)
        b = events_to_voxel_grid(dec, jnp.int32(n),
                                 num_bins=5, height=h, width=w)
        # bilinear weights differ by <= 4*(num_bins-1)/65536 per event
        assert float(jnp.abs(a - b).max()) < 0.01

    def test_encode_drops_out_of_range(self, rng):
        from eventpretrain_tpu.data.codec import (
            encode_events_u16, decode_events_u16,
        )
        from eventpretrain_tpu.ops.events import events_to_voxel_grid
        import jax.numpy as jnp

        ev = np.array([
            [-3.0, 5.0, 0.0, 1],    # negative x -> dropped
            [5.0, 5.0, 0.5, 1],
            [9000.0, 5.0, 1.0, 0],  # beyond range -> dropped
        ], np.float32)
        enc, tr = encode_events_u16(ev[None], np.asarray([3], np.int32))
        dec = decode_events_u16(jnp.asarray(enc), jnp.asarray(tr))[0]
        grid = events_to_voxel_grid(dec, jnp.int32(3), num_bins=2,
                                    height=16, width=16)
        # only the valid event contributes; edge pixels untouched
        assert float(jnp.abs(grid).sum()) == 1.0
        assert float(jnp.abs(grid[:, 0]).sum()) == 0.0
