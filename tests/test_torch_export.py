"""Flax -> torch checkpoint export: round trip + reference-module loading.

Two invariants:
1. ``import_torch_params(export_torch_state_dict(params)) == params`` with
   zero missing / zero unused keys, for a model covering linear, conv,
   norm, BatchNorm-stats, and projector-Sequential name spaces.
2. A state dict exported here loads into the ACTUAL reference torch module
   (zero missing/unexpected among mapped keys) and the torch forward then
   matches the flax forward — the mirror image of test_torch_parity.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import flax.linen as nn

from eventpretrain_tpu.ckpt.torch_export import (
    export_torch_state_dict,
    save_torch_checkpoint,
)
from eventpretrain_tpu.ckpt.torch_import import (
    import_torch_params,
    load_torch_state_dict,
)

from tests._torch_ref import load_reference, nhwc
from tests.test_torch_grad_parity import build_our_vit, build_ref_vit

load_reference()


def test_roundtrip_identity():
    """export -> import reproduces every leaf exactly (vit backbone + head)."""
    backbone = build_our_vit()

    class Hub(nn.Module):
        def setup(self):
            self.backbone = backbone.clone(name="backbone")
            self.classify_head = nn.Dense(6, name="classify_head")

        def __call__(self, evg):
            _, _, emb_h, _, _ = self.backbone.encode_dense(evg)
            return self.classify_head(emb_h.mean(axis=1))

    hub = Hub()
    rng = np.random.default_rng(0)
    evg = jnp.asarray(rng.normal(size=(1, 5, 32, 32)).transpose(0, 2, 3, 1),
                      jnp.float32)
    params = hub.init(jax.random.key(0), evg)["params"]

    sd = export_torch_state_dict(params)
    zeros = jax.tree.map(np.zeros_like, params)
    restored, missing, unused = import_torch_params(sd, zeros, verbose=False)
    assert missing == [] and unused == []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        got = dict(jax.tree_util.tree_leaves_with_path(restored))[path]
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(got),
            err_msg=jax.tree_util.keystr(path),
        )


def test_exported_checkpoint_drives_reference_module(tmp_path):
    """Our params, saved as .pth, load into the reference torch ViT and
    produce the same forward output."""

    class RefClsModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = build_ref_vit("finetune_cls")
            self.classify_head = torch.nn.Linear(64, 6)

        def forward(self, evg):
            _, _, emb_h, _ = self.backbone(evg)
            return self.classify_head(emb_h.mean(dim=1))

    backbone = build_our_vit()

    class OurClsModel(nn.Module):
        def setup(self):
            self.backbone = backbone.clone(name="backbone")
            self.classify_head = nn.Dense(6, name="classify_head")

        def __call__(self, evg):
            _, _, emb_h, _, _ = self.backbone.encode_dense(
                evg, return_pyramid=True
            )
            return self.classify_head(emb_h.mean(axis=1))

    ours = OurClsModel()
    rng = np.random.default_rng(5)
    evg_t = torch.from_numpy(rng.normal(size=(2, 5, 32, 32)).astype(np.float32))
    evg_j = jnp.asarray(nhwc(evg_t))
    params = ours.init(jax.random.key(1), evg_j)["params"]

    path = str(tmp_path / "exported.pth")
    save_torch_checkpoint(path, params, epoch=3)

    ref = RefClsModel().eval()
    sd = load_torch_state_dict(path)
    msg = ref.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=False,
    )
    # only the recomputed buffers may be absent from the export
    assert all(
        any(s in k for s in ("pos_embed",)) for k in msg.missing_keys
    ), msg.missing_keys
    assert msg.unexpected_keys == [], msg.unexpected_keys

    out_t = ref(evg_t).detach().numpy()
    out_j = np.asarray(ours.apply({"params": params}, evg_j))
    np.testing.assert_allclose(out_j, out_t, atol=1e-4, rtol=1e-4)
