"""Transformer building blocks (flax.linen, channels-last, bf16-friendly).

TPU-native equivalents of reference model/sub_module/vit_block.py: the same
parameter surface (qkv fused Dense, LN+GELU patch embed, pre-norm blocks) so
released PyTorch checkpoints map 1:1, but attention uses a fused
scaled-dot-product path by default and only materializes the (B, H, N, N)
attention matrix when ``return_attn=True`` (the reference always returns it,
reference vit_block.py:131-143, which would waste HBM bandwidth on TPU).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from eventpretrain_tpu.ops.pallas_attention import fused_mha, supports_fused_mha
from eventpretrain_tpu.ops.fused_attn_layer import (
    fused_attn_layer,
    fused_ln_attn_layer,
    supports_fused_attn_layer,
)
from eventpretrain_tpu.ops.fused_mlp import (
    fused_ln_mlp,
    fused_mlp,
    supports_fused_ln_mlp,
    supports_fused_mlp,
)

def _fused_auto_default() -> bool:
    """Auto-enable fused Pallas kernels: TPU backend only, unless
    utils/export_infer.py overrides — force_xla() while tracing a portable
    serving artifact, force_fused() while tracing a TPU-native one."""
    from eventpretrain_tpu.ops.pallas_common import fused_forced, xla_forced

    if fused_forced():
        return True
    return jax.default_backend() == "tpu" and not xla_forced()


Dtype = Any


class DenseParams(nn.Module):
    """Declares nn.Dense's exact param surface without running the matmul.

    Lets the fused attention-layer kernel consume ``qkv``/``proj`` weights
    directly while keeping the parameter tree byte-identical to nn.Dense
    (checkpoint compatibility with the unfused path and torch imports).
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class LayerNormParams(nn.Module):
    """nn.LayerNorm's exact param surface (scale, bias) without the math.

    Lets ViTBlock hand the pre-norm parameters to the LN-fused sub-block
    kernels (fused_ln_attn_layer / fused_ln_mlp) while keeping the tree
    identical to the unfused nn.LayerNorm path.
    """

    @nn.compact
    def __call__(self, dim: int):
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        return scale, bias


def drop_path(
    key: jax.Array, x: jax.Array, rate: float
) -> jax.Array:
    """Stochastic depth: drop the whole residual branch per sample."""
    if rate == 0.0:
        return x
    keep_prob = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    keep = jax.random.bernoulli(key, keep_prob, shape)
    return jnp.where(keep, x / keep_prob, 0.0)


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        return drop_path(self.make_rng("dropout"), x, self.rate)


class Mlp(nn.Module):
    """MLP with GELU (reference vit_block.py:215-231).

    ``use_fused=True`` opts into the fused fc1+GELU+fc2 Pallas kernel
    (ops/fused_mlp.py; same param tree, the (B, L, 4C) hidden never leaves
    VMEM). Measured at decoder shapes (B=192 L=196 C=512, v5e): forward
    wins 10.8 vs 14.5 ms per 8-layer stack, but fwd+bwd is a wash (32.7 vs
    31.3) — the backward's dW accumulators push VMEM to ~15 MB and stall
    the pipeline. Default (None): auto-enable on the tpu backend for
    ``deterministic=True`` calls only — the eval/inference path (train
    steps all pass deterministic=False). Differentiating through a
    deterministic apply stays correct (the custom VJP is exact), just not
    faster.
    """

    hidden_dim: int
    out_dim: Optional[int] = None
    dropout: float = 0.0
    use_fused: Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        deterministic: bool = True,
        ln_residual: Optional[tuple] = None,
    ) -> jax.Array:
        out_dim = self.out_dim or x.shape[-1]
        if ln_residual is not None:
            # ViTBlock's LN-fused sub-block path: y = x + MLP(LN(x)) in one
            # kernel. The caller has verified eligibility (no dropout,
            # supported shapes) and owns the norm params.
            g, b, eps = ln_residual
            w1, b1 = DenseParams(self.hidden_dim, name="fc1")(x.shape[-1])
            w2, b2 = DenseParams(out_dim, name="fc2")(self.hidden_dim)
            return fused_ln_mlp(
                x.astype(self.dtype),
                g.astype(jnp.float32),
                b.astype(jnp.float32),
                w1.astype(self.dtype),
                b1.astype(self.dtype),
                w2.astype(self.dtype),
                b2.astype(self.dtype),
                eps=eps,
            )
        use_fused = (
            self.use_fused
            if self.use_fused is not None
            else (deterministic and _fused_auto_default())
        )
        if (
            use_fused
            and x.ndim == 3
            and out_dim == x.shape[-1]
            and (self.dropout == 0.0 or deterministic)
            and supports_fused_mlp(x.shape[1], x.shape[-1], self.hidden_dim,
                                   self.dtype)
        ):
            w1, b1 = DenseParams(self.hidden_dim, name="fc1")(x.shape[-1])
            w2, b2 = DenseParams(out_dim, name="fc2")(self.hidden_dim)
            return fused_mlp(
                x.astype(self.dtype),
                w1.astype(self.dtype),
                b1.astype(self.dtype),
                w2.astype(self.dtype),
                b2.astype(self.dtype),
            )
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic)
        x = nn.Dense(out_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic)
        return x


class Attention(nn.Module):
    """Multi-head self-attention with fused qkv (reference vit_block.py:118-143).

    ``return_attn=False`` uses the fused dot-product-attention path (no NxN
    materialization); ``True`` returns post-softmax weights for visualization.
    """

    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    # opt-in fused Pallas MHA kernel (ops/pallas_attention.py): measured
    # faster than XLA standalone at MAE-decoder shapes (9.2 vs 10.8 ms
    # fwd+bwd) but slower in-context (153.7 vs 140.8 ms full rec step on
    # v5e) because it blocks XLA's fusion with the surrounding qkv/proj
    # ops — so the default stays on dot_product_attention
    use_fused_kernel: bool = False
    # fused attention-LAYER Pallas kernel (ops/fused_attn_layer.py): qkv
    # proj + MHA + out proj in one kernel, weights VMEM-resident, gridded
    # over batch — 2.5x the XLA composition at decoder shapes (3.7 vs
    # 9.3 ms fwd+bwd, B=128 L=196 C=512 H=16 on v5e) because there is no
    # fusion boundary left to lose. None = auto (on for TPU backend when
    # shapes are supported and no attn bias/weights are needed).
    use_fused_layer: Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        deterministic: bool = True,
        return_attn: bool = False,
        attn_bias: Optional[jax.Array] = None,
        ln_residual: Optional[tuple] = None,
    ):
        b, n, c = x.shape
        head_dim = c // self.num_heads
        scale = self.qk_scale or head_dim ** -0.5

        if ln_residual is not None:
            # ViTBlock's LN-fused sub-block path: y = x + AttnLayer(LN(x))
            # in one kernel. Caller verified eligibility and owns the norm
            # params.
            g, bb, eps = ln_residual
            wqkv, bqkv = DenseParams(
                c * 3, use_bias=self.qkv_bias, name="qkv"
            )(c)
            wo, bo = DenseParams(c, name="proj")(c)
            x = x.astype(self.dtype)
            out = fused_ln_attn_layer(
                x,
                g.astype(jnp.float32),
                bb.astype(jnp.float32),
                wqkv.astype(self.dtype),
                (wqkv[0] * 0 if bqkv is None else bqkv).astype(self.dtype),
                wo.astype(self.dtype),
                bo.astype(self.dtype),
                num_heads=self.num_heads,
                scale=scale,
                eps=eps,
            )
            return out, None

        use_fused_layer = (
            self.use_fused_layer
            if self.use_fused_layer is not None
            else _fused_auto_default()
        )
        if (
            use_fused_layer
            and not return_attn
            and attn_bias is None
            and self.attn_drop == 0.0
            and supports_fused_attn_layer(n, c, self.num_heads, self.dtype)
        ):
            wqkv, bqkv = DenseParams(
                c * 3, use_bias=self.qkv_bias, name="qkv"
            )(c)
            wo, bo = DenseParams(c, name="proj")(c)
            x = x.astype(self.dtype)
            out = fused_attn_layer(
                x,
                wqkv.astype(self.dtype),
                (wqkv[0] * 0 if bqkv is None else bqkv).astype(self.dtype),
                wo.astype(self.dtype),
                bo.astype(self.dtype),
                num_heads=self.num_heads,
                scale=scale,
            )
            out = nn.Dropout(self.proj_drop)(out, deterministic)
            return out, None

        qkv = nn.Dense(
            c * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv"
        )(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, h, d)

        attn_weights = None
        if return_attn or attn_bias is not None or self.attn_drop > 0.0:
            q = q.transpose(0, 2, 1, 3)  # (b, h, n, d)
            k = k.transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)
            attn = (q @ k.transpose(0, 1, 3, 2)) * scale
            if attn_bias is not None:
                attn = attn + attn_bias
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
                self.dtype
            )
            attn_weights = attn
            attn = nn.Dropout(self.attn_drop)(attn, deterministic)
            out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, c)
        else:
            if self.use_fused_kernel and supports_fused_mha(n, head_dim):
                out = fused_mha(q, k, v, scale=scale)
            else:
                out = jax.nn.dot_product_attention(q, k, v, scale=scale)
            out = out.reshape(b, n, c)

        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic)
        return out, attn_weights


class ViTBlock(nn.Module):
    """Pre-norm transformer block (reference vit_block.py:233-254)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    layer_norm_eps: float = 1e-6
    use_fused_layer: Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        deterministic: bool = True,
        return_attn: bool = False,
    ):
        dim = x.shape[-1]
        hidden_dim = int(dim * self.mlp_ratio)
        use_fused_layer = (
            self.use_fused_layer
            if self.use_fused_layer is not None
            else _fused_auto_default()
        )
        # LN-fused sub-block path: both residual sub-blocks collapse to one
        # Pallas kernel each (y = x + AttnLayer(LN(x)), y = x + MLP(LN(x))),
        # keeping the (B, L, C) token stream out of HBM between LN, the
        # matmuls, and the residual adds. Eligible whenever the stochastic
        # regularizers are inactive (rates 0 or deterministic).
        fuse_block = (
            use_fused_layer
            and not return_attn
            and self.attn_drop == 0.0
            and (self.drop == 0.0 or deterministic)
            and (self.drop_path_rate == 0.0 or deterministic)
            and supports_fused_attn_layer(x.shape[1], dim, self.num_heads,
                                          self.dtype)
        )
        attn_mod = Attention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            use_fused_layer=self.use_fused_layer,
            dtype=self.dtype,
            name="attn",
        )
        mlp_mod = Mlp(
            hidden_dim=hidden_dim,
            dropout=self.drop,
            dtype=self.dtype,
            name="mlp",
        )

        if fuse_block:
            g1, b1 = LayerNormParams(name="norm1")(dim)
            x, attn = attn_mod(
                x, deterministic,
                ln_residual=(g1, b1, self.layer_norm_eps),
            )
            if supports_fused_ln_mlp(x.shape[1], dim, hidden_dim, self.dtype):
                g2, b2 = LayerNormParams(name="norm2")(dim)
                return mlp_mod(
                    x, deterministic,
                    ln_residual=(g2, b2, self.layer_norm_eps),
                )
            y = nn.LayerNorm(
                epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm2"
            )(x)
            return x + mlp_mod(y, deterministic)

        y = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm1")(x)
        y, attn = attn_mod(y, deterministic, return_attn)
        x = x + DropPath(self.drop_path_rate)(y, deterministic)

        y = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm2")(x)
        y = mlp_mod(y, deterministic)
        x = x + DropPath(self.drop_path_rate)(y, deterministic)

        if return_attn:
            return x, attn
        return x


class PatchEmbed(nn.Module):
    """Conv patch embedding with LayerNorm + GELU.

    Parity with reference vit_block.py:44-68 (the non-standard LN+GELU after
    the strided conv); set ``use_norm_act=False`` for the plain ECDP/MEM
    variants (vit_block.py:70-116).
    """

    patch_size: int
    embed_dim: int
    use_norm_act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, H, W, C) -> (B, H/p, W/p, embed_dim)
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(x)
        if self.use_norm_act:
            # eps=1e-5 matches torch nn.LayerNorm's default (reference
            # vit_block.py:57 uses the default); on all-zero event patches
            # the LN backward scales by 1/sqrt(eps), so eps matters.
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
            x = nn.gelu(x, approximate=False)
        return x


def sincos_pos_embed_init(grid_size: int, embed_dim: int, cls_token: bool = False):
    """Initializer closure producing the fixed 2-D sincos table."""
    from eventpretrain_tpu.ops.pos_embed import get_2d_sincos_pos_embed

    def init(key, shape, dtype=jnp.float32):
        del key
        table = get_2d_sincos_pos_embed(embed_dim, grid_size, cls_token)
        return jnp.asarray(table, dtype).reshape(shape)

    return init


class GroupedBatchNorm(nn.Module):
    """BatchNorm whose batch statistics are computed per contiguous row
    group — the global-view-jit expression of per-DEVICE BatchNorm.

    Reference-DDP parity: torch BatchNorm under DDP normalizes each rank's
    LOCAL batch with its own statistics (model/sub_module/mlp_head.py:13-18
    wrapped by DDP at main_pretrain.py:319 — no SyncBN). Under our single
    jitted global-view step the BN input is the logically-global batch; with
    ``groups = num_devices`` and the batch sharded contiguously over the
    data axis (parallel/mesh.py), rows [g*B/G, (g+1)*B/G) are exactly device
    g's local batch, so per-group statistics reproduce per-rank BN without
    any shard_map or cross-device traffic (each group's reduction stays on
    its own shard). ``groups=1`` is global-batch (sync-BN) statistics.

    Variable layout matches flax ``nn.BatchNorm`` (params ``scale``/``bias``,
    batch_stats ``mean``/``var``), so checkpoints and the torch
    import/export mapping are identical for both scopes. Running stats
    update with the group-averaged batch statistics (torch DDP keeps
    per-rank buffers and saves rank 0's; they are never consumed during
    pretraining — finetuning drops the projector heads — so the average is
    an equally-valid summary, documented in PARITY.md).
    """

    groups: int = 1
    use_scale: bool = True
    use_bias: bool = True
    momentum: float = 0.99  # keep the flax default used by the global path
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: (N, C) rows; N divisible by groups (batch*tokens, batch sharded
        # contiguously so row blocks = device-local batches)
        feat = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        if train:
            g = self.groups
            xg = x.astype(jnp.float32).reshape(g, -1, feat)
            mean = xg.mean(axis=1, keepdims=True)          # (G, 1, C)
            var = ((xg - mean) ** 2).mean(axis=1, keepdims=True)
            xn = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
            xn = xn.reshape(x.shape)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean.mean(
                    axis=(0, 1)
                )
                ra_var.value = m * ra_var.value + (1 - m) * var.mean(
                    axis=(0, 1)
                )
        else:
            xn = (x.astype(jnp.float32) - ra_mean.value) * jax.lax.rsqrt(
                ra_var.value + self.epsilon
            )
        if self.use_scale:
            xn = xn * self.param("scale", nn.initializers.ones, (feat,))
        if self.use_bias:
            xn = xn + self.param("bias", nn.initializers.zeros, (feat,))
        return xn


class ProjectorMlp(nn.Module):
    """SimCLR/MoCo-v3 style projector/predictor over tokens.

    Parity with reference model/sub_module/mlp_head.py:4-23 (_build_mlp_2d):
    bias-free Linears with BatchNorm+ReLU between layers and an affine-free
    BatchNorm at the end. The reference's BatchNorm2d over (B, h, w) per
    channel is exactly BatchNorm over (B, L) of token tensors, so no reshape
    dance (reference pr_hub_model.py:223-238) is needed.

    BN scope under data parallelism (``bn_groups``): 1 = global-batch
    statistics (sync-BN; less noisy than the reference); ``num_devices`` =
    per-device statistics, exactly the reference's DDP BatchNorm semantics
    (see GroupedBatchNorm). CLI: ``--bn_scope {auto,global,local}``.
    """

    num_layers: int
    mlp_dim: int
    out_dim: int
    last_bn: bool = True
    dtype: Dtype = jnp.float32
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: (B, L, C); BN normalizes over (B, L) per feature — per row
        # group when bn_groups > 1 (per-device stats, reference DDP parity)
        for layer in range(self.num_layers):
            dim2 = self.out_dim if layer == self.num_layers - 1 else self.mlp_dim
            x = nn.Dense(dim2, use_bias=False, dtype=self.dtype, name=f"fc{layer}")(x)
            if layer < self.num_layers - 1:
                x = GroupedBatchNorm(
                    groups=self.bn_groups, name=f"bn{layer}",
                )(x.reshape(-1, x.shape[-1]), train).reshape(x.shape).astype(
                    self.dtype
                )
                x = nn.relu(x)
            elif self.last_bn:
                x = GroupedBatchNorm(
                    groups=self.bn_groups, use_scale=False, use_bias=False,
                    name=f"bn{layer}",
                )(x.reshape(-1, x.shape[-1]), train).reshape(x.shape).astype(
                    self.dtype
                )
        return x
