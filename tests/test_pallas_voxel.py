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
    want = events_to_voxel_grid_batch(
        jnp.asarray(ev), counts, num_bins=bins, height=h, width=w
    )
    got = pv.voxelize_batch_pallas.__wrapped__(
        jnp.asarray(ev), counts, num_bins=bins, height=h, width=w, chunk=256
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
