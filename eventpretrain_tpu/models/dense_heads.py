"""Dense prediction heads: UPerHead (PSP+FPN) and FCNHead (channels-last).

Parity with reference model/finetune_dense/ft_dense_decoder.py:7-258:
ConvModule = conv + BN + ReLU; PPM pools the top feature at (1,2,3,6) scales
(torch AdaptiveAvgPool2d bin semantics); UPerHead fuses laterals top-down and
concatenates all levels at the finest resolution; FCNHead is the auxiliary
head on the third pyramid level.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from eventpretrain_tpu.ops.reshape import resize


def adaptive_avg_pool(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """torch.nn.AdaptiveAvgPool2d on (B, H, W, C) with variable-size bins."""
    b, h, w, c = x.shape
    oh, ow = out_hw

    def pool_axis(arr, size, out, axis):
        chunks = []
        for i in range(out):
            start = (i * size) // out
            end = -(-((i + 1) * size) // out)
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(start, end)
            chunks.append(arr[tuple(sl)].mean(axis=axis, keepdims=True))
        return jnp.concatenate(chunks, axis=axis)

    x = pool_axis(x, h, oh, 1)
    x = pool_axis(x, w, ow, 2)
    return x


class ConvModule(nn.Module):
    """conv -> BN -> ReLU (reference ft_dense_decoder.py:7-20)."""

    out_channels: int
    kernel_size: int
    padding: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_channels, (self.kernel_size, self.kernel_size),
            padding=self.padding, dtype=self.dtype, name="conv_layer",
        )(x)
        # statistics in f32: bf16 variance collapses and its backward
        # rsqrt explodes (1e19-scale grads)
        x = nn.BatchNorm(
            use_running_average=not train, dtype=jnp.float32,
            name="norm_layer",
        )(x).astype(self.dtype)
        return nn.relu(x)


class UPerHead(nn.Module):
    """PSP + FPN decode head (reference ft_dense_decoder.py:86-153)."""

    in_channels: Sequence[int]
    channels: int
    num_classes: int
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dropout_ratio: float = 0.1
    sample_mode: str = "bilinear"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array], train: bool = False):
        # inputs: channels-last pyramid, finest first
        top = inputs[-1]
        psp_outs = [top]
        for i, scale in enumerate(self.pool_scales):
            p = adaptive_avg_pool(top, (scale, scale))
            p = ConvModule(self.channels, 1, dtype=self.dtype,
                           name=f"psp_{i}")(p, train)
            psp_outs.append(resize(p, top.shape[1:3], self.sample_mode))
        psp = ConvModule(self.channels, 3, padding=1, dtype=self.dtype,
                         name="psp_bottleneck")(
            jnp.concatenate(psp_outs, axis=-1), train
        )

        laterals = [
            ConvModule(self.channels, 1, dtype=self.dtype,
                       name=f"lateral_{i}")(inputs[i], train)
            for i in range(len(self.in_channels) - 1)
        ]
        laterals.append(psp)

        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize(
                laterals[i], laterals[i - 1].shape[1:3], self.sample_mode
            )

        fpn_outs = [
            ConvModule(self.channels, 3, padding=1, dtype=self.dtype,
                       name=f"fpn_{i}")(laterals[i], train)
            for i in range(len(laterals) - 1)
        ]
        fpn_outs.append(laterals[-1])
        for i in range(len(fpn_outs) - 1, 0, -1):
            fpn_outs[i] = resize(
                fpn_outs[i], fpn_outs[0].shape[1:3], self.sample_mode
            )
        feats = ConvModule(self.channels, 3, padding=1, dtype=self.dtype,
                           name="fpn_bottleneck")(
            jnp.concatenate(fpn_outs, axis=-1), train
        )

        if self.dropout_ratio > 0:
            feats = nn.Dropout(
                self.dropout_ratio, broadcast_dims=(1, 2)
            )(feats, deterministic=not train)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="conv_dense")(feats)


class FCNHead(nn.Module):
    """Auxiliary FCN head (reference ft_dense_decoder.py:157-201)."""

    channels: int
    num_classes: int
    in_index: int = 2
    num_convs: int = 1
    kernel_size: int = 3
    concat_input: bool = False
    dropout_ratio: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array], train: bool = False):
        x = inputs[self.in_index]
        feats = x
        for i in range(self.num_convs):
            feats = ConvModule(
                self.channels, self.kernel_size,
                padding=self.kernel_size // 2, dtype=self.dtype,
                name=f"convs_{i}",
            )(feats, train)
        if self.concat_input:
            feats = ConvModule(
                self.channels, self.kernel_size,
                padding=self.kernel_size // 2, dtype=self.dtype,
                name="conv_cat",
            )(jnp.concatenate([x, feats], axis=-1), train)
        if self.dropout_ratio > 0:
            feats = nn.Dropout(
                self.dropout_ratio, broadcast_dims=(1, 2)
            )(feats, deterministic=not train)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="conv_dense")(feats)
