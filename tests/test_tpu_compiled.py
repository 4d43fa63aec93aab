"""Real-TPU compiled-kernel checks (opt-in tier).

The rest of the suite runs the Pallas kernels in interpret mode on a
virtual CPU mesh (tests/conftest.py); Mosaic-compiled behavior on the
actual chip — layouts, the bf16 hi+lo weight split, SMEM scalar-prefetch
budgets — is only exercised by benchmarks otherwise. This file pins it as
tests. Run with:

    EVENTPRETRAIN_TEST_TPU=1 python -m pytest tests/test_tpu_compiled.py -q

Skipped automatically when the backend is not a TPU. Every check compares
the compiled kernel against the pure-XLA f32 scatter reference on the same
inputs (value tolerances are the documented bf16-split bounds,
data/representations.py::build_representation docstring).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled-kernel tier: needs a real TPU "
    "(EVENTPRETRAIN_TEST_TPU=1)",
)


def _synth(b, e, h, w, seed):
    rng = np.random.default_rng(seed)
    ev = np.stack(
        [
            np.stack(
                [rng.integers(0, w, e), rng.integers(0, h, e),
                 np.sort(rng.uniform(0, 1, e)), rng.integers(0, 2, e)], 1
            ).astype(np.float32)
            for _ in range(b)
        ]
    )
    return ev, np.full((b,), e, np.int32)


def test_mxu_voxelizer_compiled_matches_scatter():
    from eventpretrain_tpu.ops.events import events_to_voxel_grid_batch
    from eventpretrain_tpu.ops.pallas_voxel import voxelize_batch_mxu

    ev, c = _synth(4, 20_000, 128, 128, seed=0)
    got = voxelize_batch_mxu(
        jnp.asarray(ev), jnp.asarray(c), num_bins=5, height=128, width=128
    )
    ref = events_to_voxel_grid_batch(
        jnp.asarray(ev), jnp.asarray(c), num_bins=5, height=128, width=128,
        use_mxu=False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_tiled_voxelizer_compiled_matches_scatter_dsec_shape():
    """DSEC geometry (ragged 4x5 tiling of 440x640) through the host
    bucketer + the compiled tiled kernel, f32 (codec-free) transfer so
    the comparison isolates the kernel itself."""
    from eventpretrain_tpu.native import bucket_pack_event_batch
    from eventpretrain_tpu.ops.events import events_to_voxel_grid_batch
    from eventpretrain_tpu.ops.pallas_voxel import voxelize_batch_mxu_tiled

    ev, c = _synth(4, 50_000, 440, 640, seed=1)
    bk, tb, tr, ct = bucket_pack_event_batch(ev, c, height=440, width=640)
    got = voxelize_batch_mxu_tiled(
        jnp.asarray(bk), jnp.asarray(tb), jnp.asarray(tr), jnp.asarray(ct),
        num_bins=5, height=440, width=640,
    )
    ref = events_to_voxel_grid_batch(
        jnp.asarray(ev), jnp.asarray(c), num_bins=5, height=440, width=640,
        use_mxu=False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_dense_pipeline_tiled_production_batch_compiles():
    """bs16 at the full DSEC shape — the SMEM scalar-prefetch budget case
    that the packed bin-bounds layout exists for (a trailing length-2 dim
    lane-pads 64x and blew the 1 MB SMEM budget at exactly this size)."""
    from eventpretrain_tpu.data.dense_pipeline import (
        DenseDataConfig,
        DensePipeline,
        SyntheticDenseSource,
    )

    src = SyntheticDenseSource(
        "semseg", n=16, num_classes=5, sensor_hw=(440, 640),
        num_events=30_000, cache=True,
    )
    cfg = DenseDataConfig(
        task="semseg", num_bins=5, input_size=224, fix_events_num=200_000,
        val_fix_events_num=200_000, sensor_height=440, sensor_width=640,
        label_size=(440, 640),
    )
    pipe = DensePipeline(src, cfg, batch_size=16, train=True, seed=0)
    assert pipe._tiled, "DSEC shape must route tiled on TPU"
    batch = next(iter(pipe))
    assert batch["evg"].shape == (16, 224, 224, 5)
    assert bool(jnp.isfinite(batch["evg"]).all())
    assert float(jnp.abs(batch["evg"]).sum()) > 0
