"""Sparse Swin backbone (GreenMIM-style) operating on visible tokens only.

TPU-native redesign of reference model/backbone/swin.py:13-302 and
model/sub_module/swin_block.py: all integer planning (window grouping,
knapsack packing, merge gathers) moves to the host (models/swin_plan.py) as
static-shape index plans; the device program is pure gather / windowed
attention / scatter with no data-dependent shapes. One mask is shared across
the batch (reference swin.py:158), so plans are per-step scalars of work.

The reference's hardcoded batch-2 zero mask in the dense path (swin.py:260)
is NOT replicated — dense plans are simply the no-mask plans (SURVEY §7
"bugs to knowingly not replicate").
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from eventpretrain_tpu.models.layers import Mlp, DropPath
from eventpretrain_tpu.models.swin_plan import StagePlan, build_swin_plans


class DeviceGroupPlan(NamedTuple):
    idx_shuffle: jax.Array    # (nG*GS,)
    idx_unshuffle: jax.Array  # (N_vis,)
    gid: jax.Array            # (nG, GS) int32, -1 = pad
    coords_g: jax.Array       # (nG, GS, 2) int32


class DeviceStagePlan(NamedTuple):
    plan_even: DeviceGroupPlan
    plan_odd: DeviceGroupPlan
    coords_flat: jax.Array                 # (N_vis,)
    merge_child_idx: Optional[jax.Array]   # (N//4, 4) | None


def plans_to_device(plans: Sequence[StagePlan]) -> tuple[DeviceStagePlan, ...]:
    def g(p):
        return DeviceGroupPlan(
            idx_shuffle=jnp.asarray(p.idx_shuffle),
            idx_unshuffle=jnp.asarray(p.idx_unshuffle),
            gid=jnp.asarray(p.gid),
            coords_g=jnp.asarray(p.coords_g),
        )

    return tuple(
        DeviceStagePlan(
            plan_even=g(sp.plan_even),
            plan_odd=g(sp.plan_odd),
            coords_flat=jnp.asarray(sp.coords_flat),
            merge_child_idx=(
                jnp.asarray(sp.merge_child_idx)
                if sp.merge_child_idx is not None else None
            ),
        )
        for sp in plans
    )


def pack_plans_np(plans, ids_keep, mask, ids_restore):
    """Flatten a host plan set + per-step mask arrays into ONE int32 buffer.

    Through the axon relay every ``jnp.asarray`` is a host->device RPC;
    ``plans_to_device`` issues ~30 of them per training step (4 stages x
    2 parities x 4 arrays + coords/merge + the 3 tiled mask arrays). This
    pack + ``unpack_plans_on_device`` replaces them with one transfer and
    one cached device-side slicing program. The layout tuple is hashable
    and static per knapsack bucket variant, so only a handful of unpack
    programs ever compile.
    """
    import numpy as np

    arrs: list[np.ndarray] = []
    shapes: list = []

    def push(a):
        a = np.asarray(a, np.int32)
        shapes.append(tuple(a.shape))
        arrs.append(a.ravel())

    for sp in plans:
        for p in (sp.plan_even, sp.plan_odd):
            push(p.idx_shuffle)
            push(p.idx_unshuffle)
            push(p.gid)
            push(p.coords_g)
        push(sp.coords_flat)
        if sp.merge_child_idx is not None:
            push(sp.merge_child_idx)
        else:
            shapes.append(None)
    push(ids_keep)
    push(mask.astype(np.int32))
    push(ids_restore)
    flat = np.concatenate(arrs)
    return flat, (len(plans), tuple(shapes))


def unpack_plans_traced(flat, layout, batch_size: int):
    """Traceable inverse of :func:`pack_plans_np`.

    Pure slicing/reshape/tile on ``flat``; callable inside a jitted train
    step (``layout`` static) so the per-step plan handoff is a single
    array argument instead of a ~30-leaf pytree dispatch."""
    num_stages, shapes = layout
    out = []
    off = 0
    views = []
    for shp in shapes:
        if shp is None:
            views.append(None)
            continue
        n = int(np.prod(shp)) if shp else 1
        views.append(flat[off:off + n].reshape(shp))
        off += n
    i = 0
    for _ in range(num_stages):
        groups = []
        for _ in range(2):
            groups.append(DeviceGroupPlan(
                idx_shuffle=views[i], idx_unshuffle=views[i + 1],
                gid=views[i + 2], coords_g=views[i + 3],
            ))
            i += 4
        coords_flat = views[i]; i += 1
        merge = views[i]; i += 1
        out.append(DeviceStagePlan(
            plan_even=groups[0], plan_odd=groups[1],
            coords_flat=coords_flat, merge_child_idx=merge,
        ))
    tile = lambda a: jnp.tile(a[None], (batch_size, 1))
    ids_keep = tile(views[i]); i += 1
    mask = tile(views[i]).astype(jnp.float32); i += 1
    ids_restore = tile(views[i])
    return tuple(out), ids_keep, mask, ids_restore


@functools.lru_cache(maxsize=32)
def _unpack_program(layout, batch_size: int):
    return jax.jit(
        lambda flat: unpack_plans_traced(flat, layout, batch_size)
    )


def unpack_plans_on_device(flat_np, layout, batch_size: int):
    """One transfer + one cached device program -> (plans, ids_keep (B,N),
    mask (B,N) f32, ids_restore (B,N)). See :func:`pack_plans_np`."""
    return _unpack_program(layout, batch_size)(jnp.asarray(flat_np))


def expand_plan(plan: "DeviceGroupPlan", window_size: int):
    """Derive (attn_mask, rel_pos_idx) from a compact plan, on device.

    Same formulas as the reference's GroupingModule (swin_block.py:372-387)
    and the host-side swin_plan.expand_group_plan; runs inside the jitted
    step so only ~60 KB of gid+coords crosses the host->device boundary per
    training step instead of ~2 MB of precomputed (nG, GS, GS) tensors.
    """
    gid = plan.gid
    pad = gid == -1
    masked = (gid[:, :, None] != gid[:, None, :]) | (
        pad[:, :, None] & pad[:, None, :]
    )
    attn_mask = jnp.where(masked, -100.0, 0.0).astype(jnp.float32)
    rel = plan.coords_g[:, :, None, :] - plan.coords_g[:, None, :, :]
    rel = rel + (window_size - 1)
    idx = rel[..., 0] * (2 * window_size - 1) + rel[..., 1]
    rel_pos_idx = jnp.where(masked, 0, idx).astype(jnp.int32)
    return attn_mask, rel_pos_idx


class WindowAttention(nn.Module):
    """W-MSA over grouped tokens with masked relative-position bias.

    Parity with reference swin_block.py:74-158: bias gathered per group from
    the (2ws-1)^2 table by planned indices, zeroed where the attention mask
    forbids, then the additive group mask is applied.
    """

    num_heads: int
    window_size: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask, rel_pos_idx, deterministic=True):
        # x: (B, nG, GS, C)
        b, ng, gs, c = x.shape
        h = self.num_heads
        head_dim = c // h
        scale = head_dim ** -0.5

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, h),
        )

        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(b, ng, gs, 3, h, head_dim)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        q = q.transpose(0, 1, 3, 2, 4) * scale       # (B, nG, h, GS, d)
        k = k.transpose(0, 1, 3, 2, 4)
        v = v.transpose(0, 1, 3, 2, 4)
        attn = q @ k.transpose(0, 1, 2, 4, 3)        # (B, nG, h, GS, GS)

        allowed = (attn_mask == 0).astype(table.dtype)     # (nG, GS, GS)
        bias = table[rel_pos_idx]                          # (nG, GS, GS, h)
        bias = bias * allowed[..., None]
        attn = attn + bias.transpose(0, 3, 1, 2)[None].astype(attn.dtype)
        attn = attn + attn_mask[None, :, None].astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(self.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic)

        out = (attn @ v).transpose(0, 1, 3, 2, 4).reshape(b, ng, gs, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic)
        return out


class SparseSwinBlock(nn.Module):
    """One Swin block on visible tokens (reference swin_block.py:217-273).

    Grouping is a gather by the plan's shuffle indices; padded slots carry a
    masked row through attention and are dropped by the unshuffle gather.
    """

    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, plan: DeviceGroupPlan, deterministic=True):
        b, n, c = x.shape
        gs = plan.gid.shape[-1]
        attn_mask, rel_pos_idx = expand_plan(plan, self.window_size)
        y = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                         name="norm1")(x)
        y = jnp.take(y, plan.idx_shuffle, axis=1)
        y = y.reshape(b, -1, gs, c)
        y = WindowAttention(
            num_heads=self.num_heads, window_size=self.window_size,
            qkv_bias=self.qkv_bias, attn_drop=self.attn_drop,
            proj_drop=self.drop, dtype=self.dtype, name="attn",
        )(y, attn_mask, rel_pos_idx, deterministic)
        y = y.reshape(b, -1, c)
        y = jnp.take(y, plan.idx_unshuffle, axis=1)
        x = x + DropPath(self.drop_path_rate)(y, deterministic)

        y = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                         name="norm2")(x)
        y = Mlp(hidden_dim=int(c * self.mlp_ratio), dropout=self.drop,
                dtype=self.dtype, name="mlp")(y, deterministic)
        x = x + DropPath(self.drop_path_rate)(y, deterministic)
        return x


class PatchMerging(nn.Module):
    """Merge 2x2 visible children (reference swin_block.py:164-211)."""

    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, child_idx):
        b, n, c = x.shape
        gathered = jnp.take(x, child_idx.reshape(-1), axis=1)
        gathered = gathered.reshape(b, -1, 4 * c)  # [tl, bl, tr, br] order
        y = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                         name="norm")(gathered)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                        name="reduction")(y)


class SparseSwin(nn.Module):
    """Swin-T backbone over visible tokens (reference swin.py:13-302)."""

    input_size: int = 224
    patch_size: int = 4
    embed_dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    num_bins: int = 5
    decoder_num_patches: int = 49  # mask-cell grid (7x7 cells of 32x32 px)
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    use_feature_fusion: bool = True
    with_rec_decoders: bool = True
    with_fpn: bool = False
    # SwinECDDP reuses this trunk but the reference ECDDP model has NO final
    # norm_layer (per-out-index norms instead, swin_ecddp.py:96-99); setting
    # False keeps the param tree import-strict against its checkpoints
    with_final_norm: bool = True
    layer_norm_eps: float = 1e-6
    # jax.checkpoint each block (reference --use_checkpoint,
    # swin_block.py:484-489 torch utils.checkpoint)
    use_remat: bool = False
    dtype: Any = jnp.float32

    @property
    def patches_resolution(self) -> tuple[int, int]:
        r = self.input_size // self.patch_size
        return (r, r)

    @property
    def num_patches(self) -> int:
        return self.decoder_num_patches

    @property
    def cell_grid(self) -> int:
        return int(self.decoder_num_patches ** 0.5)

    def setup(self):
        self.proj = nn.Conv(
            self.embed_dims[0], (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embed_proj",
        )
        self.patch_norm = nn.LayerNorm(
            epsilon=self.layer_norm_eps, dtype=self.dtype, name="patch_embed_norm"
        )
        self.pos_drop = nn.Dropout(self.drop_rate)
        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate,
                                             sum(self.depths))]
        blocks = []
        merges = []
        res = min(self.patches_resolution)
        block_cls = (
            nn.remat(SparseSwinBlock, static_argnums=(3,))
            if self.use_remat else SparseSwinBlock
        )
        for i, depth in enumerate(self.depths):
            stage_res = res >> i
            ws = min(self.window_size, stage_res)
            stage_blocks = [
                block_cls(
                    num_heads=self.num_heads[i],
                    window_size=ws,
                    mlp_ratio=self.mlp_ratio,
                    drop=self.drop_rate,
                    attn_drop=self.attn_drop_rate,
                    drop_path_rate=dpr[sum(self.depths[:i]) + j],
                    layer_norm_eps=self.layer_norm_eps,
                    dtype=self.dtype,
                    name=f"swin_block_{i}_{j}",
                )
                for j in range(depth)
            ]
            blocks.append(stage_blocks)
            if i < len(self.depths) - 1:
                merges.append(
                    PatchMerging(
                        layer_norm_eps=self.layer_norm_eps, dtype=self.dtype,
                        name=f"patch_merging_{i}",
                    )
                )
        self.stages = blocks
        self.merges = merges
        if self.with_final_norm:
            self.norm_layer = nn.LayerNorm(
                epsilon=self.layer_norm_eps, dtype=self.dtype,
                name="norm_layer",
            )
        if self.with_rec_decoders:
            # kernel per stage: stage res -> mask-cell grid (8/4/2 for the
            # tiny config, reference swin.py:92-94)
            d = self.embed_dims[-1]
            res0 = min(self.patches_resolution)
            ks = [max((res0 >> i) // self.cell_grid, 1) for i in range(3)]
            self.stage1_output_decode = nn.Conv(
                d, (ks[0], ks[0]), strides=(ks[0], ks[0]), padding="VALID",
                dtype=self.dtype, name="stage1_output_decode",
            )
            self.stage2_output_decode = nn.Conv(
                d, (ks[1], ks[1]), strides=(ks[1], ks[1]), padding="VALID",
                dtype=self.dtype, name="stage2_output_decode",
            )
            self.stage3_output_decode = nn.Conv(
                d, (ks[2], ks[2]), strides=(ks[2], ks[2]), padding="VALID",
                dtype=self.dtype, name="stage3_output_decode",
            )
        if self.with_fpn:
            self.fpn_conv = nn.Conv(
                self.embed_dims[-1], (3, 3), strides=(2, 2), padding="VALID",
                dtype=self.dtype, name="fpn_conv",
            )
            self.fpn_bn = nn.BatchNorm(dtype=jnp.float32, name="fpn_bn")

    def _embed_visible(self, x, coords_flat, deterministic):
        x = self.proj(x)                                # (B, H/4, W/4, d0)
        x = x.reshape(x.shape[0], -1, x.shape[-1])
        x = self.patch_norm(x)
        if self.drop_rate > 0:
            x = self.pos_drop(x, deterministic)
        return jnp.take(x, coords_flat, axis=1)

    def _run_stages(self, x, plans, deterministic):
        """Returns per-stage pre-merge token tensors."""
        outs = []
        for i, stage_blocks in enumerate(self.stages):
            sp = plans[i]
            for j, blk in enumerate(stage_blocks):
                plan = sp.plan_even if j % 2 == 0 else sp.plan_odd
                x = blk(x, plan, deterministic)
            outs.append(x)
            if i < len(self.stages) - 1:
                x = self.merges[i](x, sp.merge_child_idx)
        return outs

    def _scatter_to_canvas(self, x, coords_flat, resolution):
        b, n, c = x.shape
        h, w = resolution
        canvas = jnp.zeros((b, h * w, c), x.dtype)
        canvas = canvas.at[:, coords_flat].set(x)
        return canvas.reshape(b, h, w, c)

    def encode_masked(
        self, x, ids_keep, plans, deterministic: bool = True,
    ):
        """Masked encoding (reference swin.py:181-254).

        ids_keep: (B, K) kept mask-cell ids (shared mask => rows identical);
        plans: device plans from build_swin_plans(mask_cells).
        Returns (stage token tuples, emb_lh) where emb_lh is the fused
        (B, K, d3) feature for the decoder.
        """
        res0 = self.patches_resolution
        x = self._embed_visible(x, plans[0].coords_flat, deterministic)
        outs = self._run_stages(x, plans, deterministic)

        stage_embs = []
        decoders = [
            self.stage1_output_decode,
            self.stage2_output_decode,
            self.stage3_output_decode,
        ]
        # NOTE (reference parity): stages 1-3 are gathered in ids_keep order
        # while stage-4 tokens stay in row-major visible-cell order, exactly
        # as the reference fuses them (swin.py:216-252) — the orders differ,
        # but released checkpoints were trained with this behavior.
        for i in range(3):
            h = res0[0] >> i
            canvas = self._scatter_to_canvas(
                outs[i], plans[i].coords_flat, (h, h),
            )
            dec = decoders[i](canvas)                   # (B, 7, 7, d3)
            dec = dec.reshape(dec.shape[0], -1, dec.shape[-1])
            dec = jnp.take_along_axis(
                dec, ids_keep[..., None].astype(jnp.int32), axis=1
            )
            stage_embs.append(dec)
        stage_embs.append(outs[3])  # stage-4 tokens are already the kept cells

        if self.use_feature_fusion:
            emb_lh = self.norm_layer(sum(stage_embs))
        else:
            emb_lh = self.norm_layer(stage_embs[3])
        return outs, emb_lh

    def encode_dense(
        self, x, plans=None, deterministic: bool = True,
        return_attn: bool = False, return_pyramid: bool = False,
    ):
        """Dense encoding (reference swin.py:256-292): no-mask plans.

        Returns (emb_l1, emb_l2, emb_h, out_embs, attn) with emb_h the
        normalized stage-4 tokens (B, 49, d3); out_embs the channels-last
        4-scale pyramid (+fpn level when with_fpn).
        """
        if plans is None:
            plans = plans_to_device(
                build_swin_plans(
                    None,
                    input_resolution=self.patches_resolution,
                    num_stages=len(self.depths),
                    window_size=self.window_size,
                    cell_grid=self.cell_grid,
                )
            )
        res0 = self.patches_resolution
        x = self._embed_visible(x, plans[0].coords_flat, deterministic)
        outs = self._run_stages(x, plans, deterministic)
        emb_h = (
            self.norm_layer(outs[-1]) if self.with_final_norm else outs[-1]
        )

        out_embs = []
        if return_pyramid:
            for i, o in enumerate(outs):
                h = res0[0] >> i
                out_embs.append(o.reshape(o.shape[0], h, h, o.shape[-1]))
            if self.with_fpn:
                out_embs.append(
                    nn.gelu(
                        self.fpn_bn(
                            self.fpn_conv(out_embs[-1]),
                            use_running_average=deterministic,
                        ),
                        approximate=False,
                    )
                )
        return outs[0], outs[1], emb_h, out_embs, None

    def __call__(self, x, deterministic: bool = True):
        return self.encode_dense(x, deterministic=deterministic)


def swin_tiny_window7(**kwargs) -> SparseSwin:
    """Reference swin.py:295-302."""
    cfg = dict(
        input_size=224, patch_size=4, embed_dims=(96, 192, 384, 768),
        depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24), window_size=7,
        decoder_num_patches=49,
    )
    cfg.update(kwargs)
    return SparseSwin(**cfg)
