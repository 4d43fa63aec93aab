"""Pallas voxelizer parity vs the XLA scatter path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental import pallas as pl

import eventpretrain_tpu.ops.pallas_voxel as pv
from eventpretrain_tpu.ops.events import events_to_voxel_grid_batch


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pv.pl, "pallas_call", patched)


def test_matches_xla_scatter(rng):
    b, e, h, w, bins = 2, 1024, 24, 32, 5
    ev = np.stack([
        np.stack([rng.integers(0, w, e), rng.integers(0, h, e),
                  np.sort(rng.uniform(0, 1, e)), rng.integers(0, 2, e)],
                 1).astype(np.float32)
        for _ in range(b)
    ])
    counts = jnp.asarray([e, 700], jnp.int32)
    # explicit scatter reference: the dispatching batch entry routes to
    # the MXU kernel on TPU, which this test is not comparing against
    import functools

    from eventpretrain_tpu.ops.events import events_to_voxel_grid

    want = jax.vmap(functools.partial(
        events_to_voxel_grid, num_bins=bins, height=h, width=w
    ))(jnp.asarray(ev), counts)
    got = pv.voxelize_batch_pallas.__wrapped__(
        jnp.asarray(ev), counts, num_bins=bins, height=h, width=w, chunk=256
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestMxuVoxelizer:
    """MXU matmul voxelizer vs the scatter reference (interpret mode)."""

    def _events(self, rng, b, e, h, w):
        ev = np.stack([
            np.floor(rng.uniform(-2, w + 2, (b, e))),   # incl. out-of-frame
            np.floor(rng.uniform(-2, h + 2, (b, e))),
            np.sort(rng.uniform(0, 1, (b, e)), axis=1),
            rng.integers(0, 2, (b, e)).astype(np.float64),
        ], axis=-1).astype(np.float32)
        return jnp.asarray(ev)

    def test_matches_scatter_reference(self, rng):
        from eventpretrain_tpu.ops.events import events_to_voxel_grid
        from eventpretrain_tpu.ops.pallas_voxel import voxelize_batch_mxu

        b, e, h, w, nb = 3, 700, 24, 32, 5
        ev = self._events(rng, b, e, h, w)
        counts = jnp.asarray([700, 350, 1], jnp.int32)  # incl. padding tails
        got = voxelize_batch_mxu(
            ev, counts, num_bins=nb, height=h, width=w, chunk=256,
        )
        for i in range(b):
            want = events_to_voxel_grid(
                ev[i], counts[i], num_bins=nb, height=h, width=w
            )
            np.testing.assert_allclose(
                np.asarray(got[i]), np.asarray(want), atol=2e-3, rtol=1e-3
            )

    def test_zero_count_sample(self, rng):
        from eventpretrain_tpu.ops.pallas_voxel import voxelize_batch_mxu

        ev = self._events(rng, 1, 64, 16, 16)
        out = voxelize_batch_mxu(
            ev, jnp.zeros((1,), jnp.int32), num_bins=5, height=16, width=16,
            chunk=64,
        )
        assert float(jnp.abs(out).max()) == 0.0

    def test_supports_gate(self):
        from eventpretrain_tpu.ops.pallas_voxel import supports_mxu_voxelizer

        assert supports_mxu_voxelizer(224, 224)
        assert supports_mxu_voxelizer(128, 128)
        assert not supports_mxu_voxelizer(440, 640)  # DSEC stays scatter

    def test_splat_matches_count_images(self, rng):
        """splat_mxu reproduces the ECDP/MEM scatter count images."""
        from eventpretrain_tpu.ops.events import (
            _batch,
            _polarity_weights,
            events_to_image_ecdp,
            events_to_image_mem,
        )
        from eventpretrain_tpu.ops.pallas_voxel import splat_mxu

        b, e, h, w = 2, 300, 16, 24
        ev = self._events(rng, b, e, h, w)
        counts = jnp.asarray([300, 120], jnp.int32)
        got = splat_mxu(
            ev[..., 1].astype(jnp.int32), ev[..., 0].astype(jnp.int32),
            _polarity_weights(ev, counts), height=h, width=w, chunk=128,
        )
        want = _batch(events_to_image_ecdp, height=h, width=w)(ev, counts)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4
        )
