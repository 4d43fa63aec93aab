"""CLIP visual tower: torch forward parity with the flax implementation."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from eventpretrain_tpu.models.clip import (  # noqa: E402
    CLIPVisionTransformer,
    load_clip_visual_weights,
    preprocess_images,
    quick_gelu,
)


def torch_clip_forward(sd, x, width=32, heads=2, layers=2, patch=16):
    """Explicit torch computation of the CLIP visual tower (OpenAI order)."""
    import torch.nn.functional as F

    conv_w = sd["visual.conv1.weight"]
    b = x.shape[0]
    t = F.conv2d(x, conv_w, stride=patch)  # (B, width, g, g)
    t = t.reshape(b, width, -1).permute(0, 2, 1)
    cls = sd["visual.class_embedding"].reshape(1, 1, width).expand(b, -1, -1)
    t = torch.cat([cls, t], dim=1)
    t = t + sd["visual.positional_embedding"]
    t = F.layer_norm(t, (width,), sd["visual.ln_pre.weight"],
                     sd["visual.ln_pre.bias"], eps=1e-5)
    for i in range(layers):
        pre = f"visual.transformer.resblocks.{i}"
        y = F.layer_norm(t, (width,), sd[f"{pre}.ln_1.weight"],
                         sd[f"{pre}.ln_1.bias"], eps=1e-5)
        qkv = F.linear(y, sd[f"{pre}.attn.in_proj_weight"],
                       sd[f"{pre}.attn.in_proj_bias"])
        n = y.shape[1]
        qkv = qkv.reshape(b, n, 3, heads, width // heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q @ k.transpose(-2, -1)) * (width // heads) ** -0.5
        a = a.softmax(dim=-1)
        o = (a @ v).transpose(1, 2).reshape(b, n, width)
        t = t + F.linear(o, sd[f"{pre}.attn.out_proj.weight"],
                         sd[f"{pre}.attn.out_proj.bias"])
        y = F.layer_norm(t, (width,), sd[f"{pre}.ln_2.weight"],
                         sd[f"{pre}.ln_2.bias"], eps=1e-5)
        y = F.linear(y, sd[f"{pre}.mlp.c_fc.weight"], sd[f"{pre}.mlp.c_fc.bias"])
        y = y * torch.sigmoid(1.702 * y)
        t = t + F.linear(y, sd[f"{pre}.mlp.c_proj.weight"],
                         sd[f"{pre}.mlp.c_proj.bias"])
    t = F.layer_norm(t, (width,), sd["visual.ln_post.weight"],
                     sd["visual.ln_post.bias"], eps=1e-5)
    return t @ sd["visual.proj"]


def test_clip_forward_parity(tmp_path):
    torch.manual_seed(0)
    width, heads, layers, patch, out_dim, img = 32, 2, 2, 16, 16, 32
    grid = img // patch
    sd = {
        "visual.conv1.weight": torch.randn(width, 3, patch, patch) * 0.05,
        "visual.class_embedding": torch.randn(width) * 0.05,
        "visual.positional_embedding": torch.randn(grid * grid + 1, width) * 0.05,
        "visual.proj": torch.randn(width, out_dim) * 0.05,
        "visual.ln_pre.weight": torch.ones(width),
        "visual.ln_pre.bias": torch.zeros(width),
        "visual.ln_post.weight": torch.ones(width),
        "visual.ln_post.bias": torch.zeros(width),
    }
    for i in range(layers):
        pre = f"visual.transformer.resblocks.{i}"
        sd.update({
            f"{pre}.ln_1.weight": torch.ones(width),
            f"{pre}.ln_1.bias": torch.zeros(width),
            f"{pre}.ln_2.weight": torch.ones(width),
            f"{pre}.ln_2.bias": torch.zeros(width),
            f"{pre}.attn.in_proj_weight": torch.randn(3 * width, width) * 0.05,
            f"{pre}.attn.in_proj_bias": torch.randn(3 * width) * 0.01,
            f"{pre}.attn.out_proj.weight": torch.randn(width, width) * 0.05,
            f"{pre}.attn.out_proj.bias": torch.randn(width) * 0.01,
            f"{pre}.mlp.c_fc.weight": torch.randn(4 * width, width) * 0.05,
            f"{pre}.mlp.c_fc.bias": torch.randn(4 * width) * 0.01,
            f"{pre}.mlp.c_proj.weight": torch.randn(width, 4 * width) * 0.05,
            f"{pre}.mlp.c_proj.bias": torch.randn(width) * 0.01,
        })
    path = tmp_path / "clip.pt"
    torch.save(sd, path)

    x = np.random.default_rng(0).normal(size=(2, 3, img, img)).astype(np.float32)
    with torch.no_grad():
        want = torch_clip_forward(sd, torch.from_numpy(x), width, heads,
                                  layers, patch).numpy()

    model = CLIPVisionTransformer(
        image_size=img, patch_size=patch, width=width, layers=layers,
        heads=heads, output_dim=out_dim,
    )
    variables = model.init(jax.random.key(0), jnp.zeros((1, img, img, 3)))
    params = load_clip_visual_weights(str(path), variables["params"])
    got = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert got.shape == (2, grid * grid + 1, out_dim)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_preprocess_shapes():
    x = jnp.ones((2, 64, 64, 3))
    out = preprocess_images(x)
    assert out.shape == (2, 224, 224, 3)
    assert bool(jnp.isfinite(out).all())


def test_quick_gelu():
    x = jnp.asarray([-1.0, 0.0, 2.0])
    out = quick_gelu(x)
    assert float(out[1]) == 0.0
