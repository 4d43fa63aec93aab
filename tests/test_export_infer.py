"""Serving-export roundtrip: StableHLO artifact == live model."""

import jax
import jax.numpy as jnp
import numpy as np

from eventpretrain_tpu.models.cls_hub import cls_hub_vit_small
from eventpretrain_tpu.utils.export_infer import (
    export_cls_inference,
    export_inference,
    export_inference_bundle,
    load_inference,
    load_inference_bundle,
)


def test_roundtrip_matches_live_model(tmp_path):
    hub = cls_hub_vit_small(num_classes=10, input_size=64)
    rng = np.random.default_rng(0)
    evg = jnp.asarray(rng.normal(size=(3, 64, 64, 5)), jnp.float32)
    variables = hub.init(jax.random.key(0), evg[:1])

    path = export_cls_inference(
        hub, variables, input_size=64,
        path=str(tmp_path / "cls.stablehlo"),
    )
    infer = load_inference(path)

    got = infer(evg)
    _, want, _ = hub.apply(variables, evg, train=False)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # symbolic batch: a different batch size runs through the same artifact
    got5 = infer(jnp.concatenate([evg, evg[:2]]))
    assert got5.shape == (5, 10)


def test_bytes_roundtrip_no_file():
    f = lambda x: jnp.sin(x) @ jnp.ones((8, 4))
    blob = export_inference(f, jnp.zeros((2, 8)), path=None)
    assert isinstance(blob, bytes)
    infer = load_inference(blob)
    x = jnp.arange(16, dtype=jnp.float32).reshape(2, 8)
    np.testing.assert_allclose(infer(x), f(x), atol=1e-6)


def test_bundle_pad_and_chunk_dispatch(tmp_path):
    """Bucketed bundle: every request size routes through pad/chunk and
    matches the live fn exactly (padding never leaks into outputs)."""
    f = lambda x: jnp.cumsum(jnp.sin(x), axis=-1) @ jnp.ones((8, 4)) + 1.0
    # native=False keeps the buckets executable on the CPU test backend;
    # the container + dispatcher logic is identical either way.
    path = export_inference_bundle(
        f, jnp.zeros((1, 8)), str(tmp_path / "b.eptb"),
        batch_sizes=(2, 4), native=False,
    )
    infer = load_inference_bundle(path)
    rng = np.random.default_rng(0)
    # below smallest bucket, exact bucket, between buckets, above largest
    # (chunking: 11 = 4 + 4 + 3-padded-to-4)
    for n in (1, 2, 3, 4, 11):
        x = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
        got = infer(x)
        assert got.shape == (n, 4)
        np.testing.assert_allclose(got, f(x), atol=1e-5, rtol=1e-5)


def test_bundle_multi_arg_and_bad_magic(tmp_path):
    f = lambda x, y: x @ jnp.ones((8, 4)) + jnp.sum(y, axis=-1, keepdims=True)
    blob = export_inference_bundle(
        f, (jnp.zeros((1, 8)), jnp.zeros((1, 3))),
        batch_sizes=(2,), native=False,
    )
    infer = load_inference_bundle(blob)
    x = jnp.arange(24, dtype=jnp.float32).reshape(3, 8)
    y = jnp.ones((3, 3), jnp.float32)
    np.testing.assert_allclose(infer(x, y), f(x, y), atol=1e-5)
    import pytest

    with pytest.raises(ValueError, match="bundle"):
        load_inference_bundle(b"not-a-bundle-at-all")


def test_native_tpu_export_serializes_from_cpu_host():
    """TPU-native artifacts (fused kernels kept, tpu_custom_call safety
    check acknowledged) cross-lower from the CPU test backend; execution
    parity with live jit is measured on hardware by benchmarks/
    bench_serving.py (8.31 vs 8.30 ms, ViT-S cls bs64)."""
    hub = cls_hub_vit_small(num_classes=10, input_size=64)
    evg = jnp.zeros((2, 64, 64, 5), jnp.float32)
    variables = hub.init(jax.random.key(0), evg[:1])
    blob = export_cls_inference(
        hub, variables, input_size=64, native=True, batch_sizes=(2,),
    )
    assert isinstance(blob, bytes) and len(blob) > 1000
