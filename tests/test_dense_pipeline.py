"""Dense pipeline tests: synthetic semseg/flow batches + MVSEC propagation."""

import numpy as np
import jax.numpy as jnp

from eventpretrain_tpu.data.dense_pipeline import (
    DenseDataConfig,
    DensePipeline,
    SyntheticDenseSource,
)
from eventpretrain_tpu.data.mvsec import gen_correspond_gt_flow, _remap_nearest


def test_semseg_batches():
    src = SyntheticDenseSource("semseg", n=8, num_classes=5)
    cfg = DenseDataConfig(
        task="semseg", input_size=64, fix_events_num=4096,
        val_fix_events_num=4096, sensor_height=64, sensor_width=64,
        label_size=(64, 64),
    )
    pipe = DensePipeline(src, cfg, batch_size=4, train=True, seed=0)
    batch = next(iter(pipe))
    assert batch["evg"].shape == (4, 64, 64, 5)
    assert batch["label"].shape == (4, 64, 64)
    assert batch["label"].dtype == jnp.int32
    assert set(np.unique(np.asarray(batch["label"]))) <= set(range(5))


def test_flow_batches_coupled_augment():
    src = SyntheticDenseSource("flow", n=8)
    cfg = DenseDataConfig(
        task="flow", input_size=64, fix_events_num=4096,
        val_fix_events_num=4096, sensor_height=64, sensor_width=64,
        label_size=(64, 64),
    )
    batch = next(iter(DensePipeline(src, cfg, batch_size=4, train=True)))
    assert batch["flow"].shape == (4, 64, 64, 2)
    assert batch["valid"].shape == (4, 64, 64)
    # val path: labels untouched (identity params)
    vbatch = next(iter(DensePipeline(src, cfg, batch_size=4, train=False)))
    item = src.load(0)
    np.testing.assert_allclose(
        np.asarray(vbatch["flow"][0]), item["flow"], atol=1e-5
    )


class TestMvsecFlowPropagation:
    def test_remap_nearest_identity(self):
        src = np.arange(12, dtype=np.float32).reshape(3, 4)
        x, y = np.meshgrid(np.arange(4, dtype=np.float32),
                           np.arange(3, dtype=np.float32))
        np.testing.assert_array_equal(_remap_nearest(src, x, y), src)
        # out of bounds -> zero border
        out = _remap_nearest(src, x + 10, y)
        assert (out == 0).all()

    def test_single_interval_scaling(self):
        # start/end inside one gt interval: flow scaled by dt ratio
        flow = np.ones((1, 2, 4, 4), np.float32) * 2.0
        ts = np.array([0.0, 1.0])
        out = gen_correspond_gt_flow(flow.copy(), ts, 0.25, 0.75)
        np.testing.assert_allclose(out, 1.0)  # 2.0 * 0.5

    def test_multi_interval_propagation(self):
        # crossing a gt boundary triggers the warping path
        flows = np.ones((2, 2, 4, 4), np.float32)
        ts = np.array([0.0, 1.0, 2.0])
        out = gen_correspond_gt_flow(flows, ts, 0.0, 1.5)
        assert out.shape == (2, 4, 4)
        assert np.isfinite(out).all()
