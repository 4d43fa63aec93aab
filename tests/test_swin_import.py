"""Swin checkpoint key mapping: full coverage of a tiny sparse Swin."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from eventpretrain_tpu.models.swin import SparseSwin  # noqa: E402
from eventpretrain_tpu.ckpt.torch_import import (  # noqa: E402
    import_torch_params,
)


def test_swin_key_coverage():
    model = SparseSwin(
        input_size=64, patch_size=4, embed_dims=(16, 32, 64, 128),
        depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2), window_size=4,
        decoder_num_patches=4, num_bins=5, with_rec_decoders=True,
        name="backbone",
    )
    ids_keep = jnp.asarray([[0, 3]], jnp.int32)
    from eventpretrain_tpu.models.swin import plans_to_device
    from eventpretrain_tpu.models.swin_plan import build_swin_plans

    plans = plans_to_device(build_swin_plans(
        np.array([False, True, True, False]), input_resolution=(16, 16),
        num_stages=4, window_size=4, cell_grid=2,
    ))
    x = jnp.zeros((1, 64, 64, 5))
    variables = model.init(
        jax.random.key(0), x, ids_keep, plans, method=model.encode_masked
    )

    # build a torch-style state dict with the reference's key space and the
    # shapes the importer should expect, from the flax tree itself
    from eventpretrain_tpu.ckpt.torch_import import _flax_path_to_torch_key

    sd = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(
        {"backbone": variables["params"]}
    ):
        names = [getattr(p, "key", str(p)) for p in path]
        key, kind = _flax_path_to_torch_key(names)
        arr = np.asarray(leaf)
        if kind == "linear" and arr.ndim == 2:
            arr = arr.T
        elif kind == "linear" and arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)
        sd[key] = torch.from_numpy(np.ascontiguousarray(arr) * 0 + 1.0)

    # expected reference-style names appear
    assert "backbone.swin_block.0.blocks.0.attn.qkv.weight" in sd
    assert "backbone.swin_block.0.downsample.reduction.weight" in sd
    assert "backbone.patch_embed.proj.weight" in sd
    assert (
        "backbone.swin_block.1.blocks.0.attn.relative_position_bias_table"
        in sd
    )

    state_dict = {k: v.numpy() for k, v in sd.items()}
    new_params, missing, unused = import_torch_params(
        state_dict, {"backbone": variables["params"]}, verbose=False
    )
    assert not missing, missing[:5]
    assert not unused, unused[:5]
    # every imported leaf is the constant 1.0 tensor
    leaf = new_params["backbone"]["swin_block_0_0"]["attn"]["qkv"]["kernel"]
    np.testing.assert_allclose(np.asarray(leaf), 1.0)


def test_ecddp_key_space_and_relpos_resize():
    from eventpretrain_tpu.ckpt.torch_import import (
        _flax_path_to_torch_key,
        _resize_rel_pos_table,
    )

    class K:
        def __init__(self, key):
            self.key = key

        def __hash__(self):
            return hash(self.key)

        def __eq__(self, other):
            return getattr(other, "key", other) == self.key

    # ECDDP dialect: backbone_swin wrapper vanished, layers.N key space
    path = ["backbone", "backbone_swin", "swin_block_1_0", "attn", "qkv",
            "kernel"]
    key, kind = _flax_path_to_torch_key(path)
    assert key == "backbone.layers.1.blocks.0.attn.qkv.weight"
    path = ["backbone", "backbone_swin", "patch_merging_0", "reduction",
            "kernel"]
    key, _ = _flax_path_to_torch_key(path)
    assert key == "backbone.layers.0.downsample.reduction.weight"

    # rel-pos table resize (2*7-1)^2 -> (2*4-1)^2
    table = np.random.default_rng(0).normal(size=(169, 3)).astype(np.float32)
    out = _resize_rel_pos_table(table, (49, 3))
    assert out.shape == (49, 3)
    assert np.isfinite(out).all()


def test_window_attention_forward_parity():
    """One full 7x7 window: our planned WindowAttention == explicit torch
    computation with the same relative-position-bias gather
    (reference swin_block.py:74-158)."""
    import torch
    import torch.nn as tnn

    from eventpretrain_tpu.models.swin import WindowAttention
    from eventpretrain_tpu.models.swin_plan import make_group_plan, visible_coords

    dim, heads, ws = 24, 3, 7
    n = ws * ws
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 1, n, dim)).astype(np.float32)

    attn = WindowAttention(num_heads=heads, window_size=ws)
    coords = visible_coords(None, (ws, ws), 1)
    plan = make_group_plan(coords, ws, 0)
    from eventpretrain_tpu.models.swin_plan import expand_group_plan

    attn_mask, rel_pos_idx = expand_group_plan(plan, ws)
    variables = attn.init(
        jax.random.key(0), jnp.asarray(x), jnp.asarray(attn_mask),
        jnp.asarray(rel_pos_idx),
    )
    # give the zero-init-prone params real values
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape) * 0.05, p.dtype),
        variables["params"],
    )
    got = attn.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(attn_mask),
        jnp.asarray(rel_pos_idx),
    )

    # torch explicit computation with identical weights
    qkv_w = torch.from_numpy(np.asarray(params["qkv"]["kernel"]).T.copy())
    qkv_b = torch.from_numpy(np.asarray(params["qkv"]["bias"]).copy())
    proj_w = torch.from_numpy(np.asarray(params["proj"]["kernel"]).T.copy())
    proj_b = torch.from_numpy(np.asarray(params["proj"]["bias"]).copy())
    table = torch.from_numpy(
        np.asarray(params["relative_position_bias_table"]).copy()
    )
    xt = torch.from_numpy(x[0])  # (1, n, dim)
    qkv = torch.nn.functional.linear(xt, qkv_w, qkv_b)
    qkv = qkv.reshape(1, n, 3, heads, dim // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = q * (dim // heads) ** -0.5
    a = q @ k.transpose(-2, -1)
    idx = torch.from_numpy(np.asarray(rel_pos_idx[0]))
    bias = table[idx.reshape(-1)].reshape(n, n, heads).permute(2, 0, 1)
    a = a + bias[None]
    a = a.softmax(dim=-1)
    out = (a @ v).transpose(1, 2).reshape(1, n, dim)
    want = torch.nn.functional.linear(out, proj_w, proj_b).numpy()

    np.testing.assert_allclose(
        np.asarray(got)[0, 0], want[0], rtol=2e-4, atol=2e-5
    )
