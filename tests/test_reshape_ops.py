"""Tests for reshape/resize helpers (reference utils/reshape.py parity)."""

import numpy as np
import jax.numpy as jnp

from eventpretrain_tpu.ops import (
    frame2emb,
    emb2frame,
    emb2patch_frame,
    patch_frame2emb,
    resize,
    resize_flow,
)
from eventpretrain_tpu.ops.pos_embed import get_2d_sincos_pos_embed


def test_frame2emb_roundtrip(rng):
    frame = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    emb = frame2emb(16, frame)
    assert emb.shape == (2, 4, 16 * 16 * 3)
    back = emb2frame(16, emb, 3)
    np.testing.assert_allclose(np.asarray(back), np.asarray(frame))


def test_frame2emb_patch_order(rng):
    # token ordering must be (p, q, c): frame[0, p, q, c] == emb[0, 0, (p*P+q)*C+c]
    frame = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    emb = frame2emb(2, frame)
    # first token covers rows 0:2, cols 0:2
    assert emb[0, 0, 0] == frame[0, 0, 0, 0]
    assert emb[0, 0, 1] == frame[0, 0, 0, 1]
    assert emb[0, 0, 2] == frame[0, 0, 1, 0]  # q advances before c wraps p
    assert emb[0, 0, 4] == frame[0, 1, 0, 0]  # p advances


def test_patch_frame_roundtrip(rng):
    emb = jnp.asarray(rng.normal(size=(2, 49, 8)).astype(np.float32))
    pf = emb2patch_frame(emb)
    assert pf.shape == (2, 7, 7, 8)
    np.testing.assert_allclose(np.asarray(patch_frame2emb(pf)), np.asarray(emb))


def test_resize_modes(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float32))
    for mode in ("nearest", "bilinear", "bicubic"):
        out = resize(x, (16, 16), mode)
        assert out.shape == (1, 16, 16, 2)


def test_resize_flow_scales_vectors():
    flow = jnp.ones((1, 8, 8, 2), jnp.float32)
    out = resize_flow(flow, (16, 24), "nearest")
    np.testing.assert_allclose(np.asarray(out[..., 0]), 3.0)  # u * new_w/org_w
    np.testing.assert_allclose(np.asarray(out[..., 1]), 2.0)  # v * new_h/org_h


def test_sincos_pos_embed_shape_and_values():
    pe = get_2d_sincos_pos_embed(64, 4)
    assert pe.shape == (16, 64)
    # first half encodes grid[0] (the w coordinate per the reference meshgrid);
    # position 0 has sin(0)=0, cos(0)=1
    np.testing.assert_allclose(pe[0, :16], 0.0, atol=1e-7)
    np.testing.assert_allclose(pe[0, 16:32], 1.0, atol=1e-7)
    pe_cls = get_2d_sincos_pos_embed(64, 4, cls_token=True)
    assert pe_cls.shape == (17, 64)
    np.testing.assert_allclose(pe_cls[0], 0.0)
