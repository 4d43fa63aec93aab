"""EvRepSL representation-quality network (EffWNet), channels-last flax.

Parity with reference model/sub_module/evrepsl_net.py:33-514: an
EfficientNet-style W-Net over the 3-channel EvRep image producing
``concat(x, clean_ie, C)`` — a 5-channel enhanced representation — applied
frozen as an input preprocessor before classification backbones
(reference main_finetune_cls.py:412-419, ft_cls_trainer.py:36-37).
Factory config: ch1=12, n_lyr=4, bilinear upsampling, matrix C.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def _gn(x, name_scope, dtype):
    return nn.GroupNorm(num_groups=1, dtype=dtype, name=name_scope)(x)


class DoubleConv(nn.Module):
    out_channels: int
    mid_channels: int | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.mid_channels or self.out_channels
        x = nn.Conv(mid, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.GroupNorm(num_groups=1, dtype=self.dtype, name="gn1")(x)
        x = nn.silu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(x)
        x = nn.GroupNorm(num_groups=1, dtype=self.dtype, name="gn2")(x)
        return nn.silu(x)


class ConvNormAct(nn.Module):
    out_channels: int
    kernel_size: int = 3
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_channels, (self.kernel_size, self.kernel_size),
            padding=self.kernel_size // 2, feature_group_count=self.groups,
            dtype=self.dtype, name="conv",
        )(x)
        x = nn.GroupNorm(num_groups=1, dtype=self.dtype, name="gn")(x)
        return nn.silu(x) if self.act else x


class SEBlock(nn.Module):
    reduction: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = x.mean(axis=(1, 2))
        y = nn.Dense(max(c // self.reduction, 1), use_bias=False,
                     dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class MBConv(nn.Module):
    out_channels: int
    mbc_type: str = "depthwise"
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        expanded = x.shape[-1] * self.expansion
        y = x
        if self.mbc_type == "depthwise":
            y = ConvNormAct(expanded, 1, dtype=self.dtype, name="pw")(y)
            y = ConvNormAct(expanded, 3, groups=expanded, dtype=self.dtype,
                            name="dw")(y)
            y = SEBlock(dtype=self.dtype, name="se")(y)
            y = ConvNormAct(self.out_channels, 1, act=False,
                            dtype=self.dtype, name="out")(y)
        else:  # fused
            y = ConvNormAct(expanded, 3, dtype=self.dtype, name="fused")(y)
            y = SEBlock(dtype=self.dtype, name="se")(y)
            y = ConvNormAct(self.out_channels, 1, act=False,
                            dtype=self.dtype, name="out")(y)
        return x + y if x.shape == y.shape else y


class DownMB(nn.Module):
    out_channels: int
    mbc_type: str
    expansion: int
    n_repeats: int = 2
    pool_size: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.pool_size
        x = nn.max_pool(x, (p, p), strides=(p, p))
        for i in range(self.n_repeats):
            x = MBConv(self.out_channels, self.mbc_type, self.expansion,
                       dtype=self.dtype, name=f"mbconv_{i}")(x)
        return x


class UpMB(nn.Module):
    in_channels: int
    out_channels: int
    mbc_type: str
    expansion: int
    n_repeats: int = 2
    scale_factor: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        b, h, w, c = x1.shape
        # bilinear upsample (align_corners=True semantics approximated by
        # jax resize 'linear'; boundary differences are sub-pixel)
        x1 = jax.image.resize(
            x1, (b, h * self.scale_factor, w * self.scale_factor, c),
            method="linear",
        )
        dy = x2.shape[1] - x1.shape[1]
        dx = x2.shape[2] - x1.shape[2]
        x1 = jnp.pad(
            x1,
            ((0, 0), (dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2), (0, 0)),
        )
        x = jnp.concatenate([x2, x1], axis=-1)
        for i in range(self.n_repeats):
            out = self.out_channels if i == self.n_repeats - 1 \
                else self.in_channels
            x = MBConv(out, self.mbc_type, self.expansion,
                       dtype=self.dtype, name=f"mbconv_{i}")(x)
        return x


class OutIE(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = x.shape[-1]
        x = nn.Conv(mid, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.GroupNorm(num_groups=1, dtype=self.dtype, name="gn1")(x)
        x = nn.silu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, name="conv2")(x)
        return x


class OutMatrixC(nn.Module):
    mid_channels: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvNormAct(self.mid_channels, 1, dtype=self.dtype, name="c1")(x)
        x = ConvNormAct(self.out_channels, 1, act=False, dtype=self.dtype,
                        name="c2")(x)
        return nn.relu(x)


class EffWNet(nn.Module):
    """Reference evrepsl_net.py:374-508 (bilinear, matrix C config)."""

    n_channels: int = 3
    out_depth: int = 1
    n_lyr: int = 4
    ch1: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n_chs = [self.ch1 * (2 ** p) for p in range(self.n_lyr + 1)]
        n_rep_dn = [2, 2, 4, 4, 6]
        lyr_ts = ["fused", "fused", "depthwise", "depthwise", "depthwise"]
        n_rep_up = [6, 4, 4, 2, 2]
        expans = [1, 2, 4, 4, 6]
        pool_szs = [3, 3, 2, 2, 5]
        factor = 2  # bilinear

        xs = [DoubleConv(n_chs[0], dtype=self.dtype, name="inc")(x)]
        for i in range(self.n_lyr):
            out = n_chs[i + 1] // factor if i == self.n_lyr - 1 \
                else n_chs[i + 1]
            xs.append(
                DownMB(out, lyr_ts[i], expans[i], n_rep_dn[i], pool_szs[i],
                       dtype=self.dtype, name=f"down_{i}")(xs[-1])
            )

        def run_ups(prefix, start):
            h = start
            for i in range(self.n_lyr):
                rev = self.n_lyr - i - 1
                out = n_chs[rev] if i == self.n_lyr - 1 \
                    else n_chs[rev] // factor
                h = UpMB(h.shape[-1] + xs[rev].shape[-1], out, lyr_ts[rev],
                         expans[rev], n_rep_up[i], pool_szs[rev],
                         dtype=self.dtype, name=f"{prefix}_{i}")(h, xs[rev])
            return h

        x_ie = run_ups("up", xs[-1])
        clean_ie = OutIE(self.out_depth, dtype=self.dtype,
                         name="out_clean_ie")(x_ie)
        x_c = run_ups("c_up", xs[-1])
        c = OutMatrixC(n_chs[0] // 2, self.out_depth, dtype=self.dtype,
                       name="c_out")(x_c)
        return jnp.concatenate([x, clean_ie, c], axis=-1)


def evrepsl_net(dtype: Any = jnp.float32) -> EffWNet:
    """Reference evrepsl_net.py:512-514."""
    return EffWNet(n_channels=3, out_depth=1, n_lyr=4, ch1=12, dtype=dtype)
