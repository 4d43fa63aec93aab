"""Serving-export roundtrip: StableHLO artifact == live model."""

import jax
import jax.numpy as jnp
import numpy as np

from eventpretrain_tpu.models.cls_hub import cls_hub_vit_small
from eventpretrain_tpu.utils.export_infer import (
    export_cls_inference,
    export_inference,
    load_inference,
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
