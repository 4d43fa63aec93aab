"""Token <-> frame reshape helpers and resize ops (channels-last).

TPU-native equivalents of reference utils/reshape.py:5-54; all image tensors
are channels-last ``(B, H, W, C)`` and token tensors ``(B, L, D)``. The patch
flattening order inside a token is ``(p, q, c)`` — identical to the
reference's ``bchpwq->bhwpqc`` einsum — so reconstruction targets and
predictions are bit-compatible with the reference layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def frame2emb(patch_size: int, frame: jax.Array) -> jax.Array:
    """``(B, H, W, C)`` -> ``(B, L, patch_size**2 * C)``.

    Parity with reference utils/reshape.py:15-22 (frame2emb).
    """
    b, h, w, c = frame.shape
    gh, gw = h // patch_size, w // patch_size
    x = frame.reshape(b, gh, patch_size, gw, patch_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, gh, gw, p, q, c)
    return x.reshape(b, gh * gw, patch_size * patch_size * c)


def emb2frame(patch_size: int, emb: jax.Array, chans: int) -> jax.Array:
    """``(B, L, patch_size**2 * C)`` -> ``(B, H, W, C)``.

    Parity with reference utils/reshape.py:5-13 (emb2frame).
    """
    b, num_tokens, _ = emb.shape
    grid = int(num_tokens ** 0.5)
    assert grid * grid == num_tokens
    x = emb.reshape(b, grid, grid, patch_size, patch_size, chans)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, gh, p, gw, q, c)
    return x.reshape(b, grid * patch_size, grid * patch_size, chans)


def emb2patch_frame(emb: jax.Array) -> jax.Array:
    """``(B, L, C)`` -> ``(B, h, w, C)`` (channels-last patch frame).

    Reference utils/reshape.py:24-31 returns NCHW; we keep channels-last.
    """
    b, num_tokens, c = emb.shape
    grid = int(num_tokens ** 0.5)
    assert grid * grid == num_tokens
    return emb.reshape(b, grid, grid, c)


def patch_frame2emb(patch_frame: jax.Array) -> jax.Array:
    """``(B, h, w, C)`` -> ``(B, L, C)``. Reference utils/reshape.py:33-38."""
    b, h, w, c = patch_frame.shape
    return patch_frame.reshape(b, h * w, c)


_METHODS = {
    "nearest": "nearest",
    "bilinear": "linear",
    "linear": "linear",
    "bicubic": "cubic",
    "cubic": "cubic",
}


def resize(x: jax.Array, size: tuple[int, int], mode: str = "bilinear") -> jax.Array:
    """Resize ``(..., H, W, C)`` to ``(..., size[0], size[1], C)``.

    Equivalent of reference utils/reshape.py:40-43 (F.interpolate with
    align_corners=None): jax.image.resize uses half-pixel centers, matching
    torch's align_corners=False for linear/cubic. antialias=False because
    F.interpolate does not antialias when downscaling either (verified by
    tests/test_torch_parity.py::test_uperhead_fcnhead_parity, where the PPM
    branch downsamples 6x6 pooled maps back to the top resolution).
    """
    method = _METHODS[mode]
    out_shape = x.shape[:-3] + (size[0], size[1]) + x.shape[-1:]
    return jax.image.resize(x, out_shape, method=method, antialias=False)


def resize_flow(
    x: jax.Array, size: tuple[int, int], mode: str = "bilinear"
) -> jax.Array:
    """Resize a flow field ``(..., H, W, 2)`` and rescale the (u, v) vectors.

    Parity with reference utils/reshape.py:45-54: after spatial resize, u is
    scaled by new_w/org_w and v by new_h/org_h.
    """
    org_h, org_w = x.shape[-3], x.shape[-2]
    out = resize(x, size, mode)
    scale = jnp.array([size[1] / org_w, size[0] / org_h], dtype=x.dtype)
    return out * scale
