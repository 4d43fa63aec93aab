"""PyTorch -> flax checkpoint importer for released EventPretrain weights.

Covers the reference's checkpoint-surgery dialects (main_finetune_cls.py:
326-381, main_pretrain.py:264-279):

  * 'native' : EventPretrain's own keys (also maps finetune_encoder./
               pretrain_encoder. prefixes to backbone.)
  * 'ecdp'   : ['checkpoint'], drop encoder_k.*, encoder_q.* -> backbone.*,
               blocks -> vit_block, norm -> norm_layer
  * 'mem'    : ['model'], prefix backbone., blocks -> vit_block,
               norm -> norm_layer, shared rel_pos_bias table replicated into
               every block (main_finetune_cls.py:358-361)
  * 'ecddp'  : ['model'], strip student. prefix

Tensor layout conversion torch -> flax:
  Linear weight (O, I)        -> kernel (I, O)
  Conv2d weight (O, I, kh, kw)-> kernel (kh, kw, I, O)
  LayerNorm/BatchNorm weight  -> scale
The fixed sincos pos_embed buffers are skipped (recomputed at build time).
"""

from __future__ import annotations

import re
from typing import Any, Optional

import numpy as np
import jax.numpy as jnp


def load_torch_state_dict(path: str, dialect: str = "auto") -> dict:
    """Load a torch checkpoint file into a {torch_key: np.ndarray} dict."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if dialect == "auto":
        if isinstance(raw, dict) and "checkpoint" in raw:
            dialect = "ecdp"
        elif isinstance(raw, dict) and "model" in raw:
            sd = raw["model"]
            if any(k.startswith("student.") for k in sd):
                dialect = "ecddp"
            elif any(k.startswith("rel_pos_bias.") for k in sd) or any(
                "rel_pos_bias" in k for k in sd
            ):
                dialect = "mem"
            else:
                dialect = "native"
        else:
            dialect = "native"

    if dialect == "ecdp":
        sd = dict(raw["checkpoint"])
        sd = {k: v for k, v in sd.items() if not k.startswith("encoder_k.")}
        sd = {
            ("backbone." + k[len("encoder_q."):] if k.startswith("encoder_q.") else k): v
            for k, v in sd.items()
        }
    elif dialect in ("mem", "ecddp", "native"):
        sd = dict(raw.get("model", raw))
        if dialect == "mem":
            sd = {"backbone." + k: v for k, v in sd.items()}
        if dialect == "ecddp":
            sd = {
                (k[len("student."):] if k.startswith("student.") else k): v
                for k, v in sd.items()
            }
    else:
        raise ValueError(dialect)

    # common renames (main_finetune_cls.py:336-343,349-356,371-378)
    renamed = {}
    for k, v in sd.items():
        k = re.sub(r"^finetune_encoder\.", "backbone.", k)
        k = re.sub(r"^pretrain_encoder\.", "backbone.", k)
        k = re.sub(r"^backbone\.blocks\.", "backbone.vit_block.", k)
        k = re.sub(r"^backbone\.norm\.", "backbone.norm_layer.", k)
        renamed[k] = v


    return {
        k: np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
        for k, v in renamed.items()
    }


_PROJECTOR_SEQ = {  # flax layer name -> torch nn.Sequential index offset
    "fc": lambda i: 3 * i,
    "bn": lambda i: 3 * i + 1,
}


def path_names_set(path) -> set:
    return set(path)


def _flax_path_to_torch_key(path: list[str]) -> tuple[str, str]:
    """(torch key, kind) for a flax param path; kind in {linear, conv, norm,
    plain}."""
    parts = []
    kind = "plain"
    leaf = path[-1]
    # SwinECDDP reuses the sparse-swin modules under a "backbone_swin"
    # submodule; its torch key space is "layers.N.blocks.M" / "layers.N.
    # downsample" (reference swin_ecddp.py:74-90) instead of "swin_block.*".
    ecddp = "backbone_swin" in path_names_set(path)
    stage_prefix = "layers" if ecddp else "swin_block"
    for name in path[:-1]:
        if name == "backbone_swin":
            continue  # transparent wrapper module
        if name == "decoder" and not parts:
            # PrHub's MAE decoder field; reference PrHubModel names it
            # pretrain_rec_decoder (pr_hub_model.py:72-78)
            parts.append("pretrain_rec_decoder")
            continue
        m = re.fullmatch(r"(vit_block|conv_block1|conv_block2)_(\d+)", name)
        if m:
            parts.append(f"{m.group(1)}.{m.group(2)}")
            continue
        # sparse swin: swin_block_{stage}_{block} -> <stage_prefix>.S.blocks.B
        m = re.fullmatch(r"swin_block_(\d+)_(\d+)", name)
        if m:
            parts.append(f"{stage_prefix}.{m.group(1)}.blocks.{m.group(2)}")
            continue
        # patch_merging_{stage} -> <stage_prefix>.S.downsample
        m = re.fullmatch(r"patch_merging_(\d+)", name)
        if m:
            parts.append(f"{stage_prefix}.{m.group(1)}.downsample")
            continue
        if name == "patch_embed_proj":
            parts.extend(["patch_embed", "proj"])
            continue
        if name == "patch_embed_norm":
            parts.extend(["patch_embed", "norm"])
            continue
        m = re.fullmatch(r"(fc|bn)(\d+)", name)
        if m and parts and parts[-1] in ("emb_h_proj", "emb_h_pred"):
            parts.append(str(_PROJECTOR_SEQ[m.group(1)](int(m.group(2)))))
            continue
        if name == "fpn_conv":  # torch nn.Sequential fpn.{0:conv,1:bn}
            parts.extend(["fpn", "0"])
            continue
        if name == "fpn_bn":
            parts.extend(["fpn", "1"])
            continue
        # dense heads (reference ft_dense_decoder.py:86-201): UPerHead's
        # PPM entries are Sequential(AdaptiveAvgPool2d, ConvModule) so the
        # ConvModule sits at index 1; FCNHead's convs is a plain Sequential
        m = re.fullmatch(r"psp_(\d+)", name)
        if m:
            parts.extend(["psp_modules", m.group(1), "1"])
            continue
        m = re.fullmatch(r"lateral_(\d+)", name)
        if m:
            parts.extend(["lateral_convs", m.group(1)])
            continue
        m = re.fullmatch(r"fpn_(\d+)", name)
        if m:
            parts.extend(["fpn_convs", m.group(1)])
            continue
        m = re.fullmatch(r"convs_(\d+)", name)
        if m:
            parts.extend(["convs", m.group(1)])
            continue
        parts.append(name)

    if leaf == "kernel":
        kind = "linear"  # conv detected by ndim at conversion time
        torch_leaf = "weight"
    elif leaf == "scale":
        kind = "norm"
        torch_leaf = "weight"
    elif leaf in ("mean", "var"):  # flax BatchNorm batch_stats
        torch_leaf = {"mean": "running_mean", "var": "running_var"}[leaf]
    else:
        torch_leaf = leaf
    return ".".join(parts + [torch_leaf]), kind


def _resize_rel_pos_table(value: np.ndarray, target_shape: tuple) -> np.ndarray:
    """Bicubic-resize a ((2w-1)^2, nH) relative-position-bias table to a new
    window size (reference swin_ecddp.py:113-133 / main_finetune_cls adapter)."""
    import jax
    import jax.numpy as _jnp

    l1, nh = value.shape
    l2 = target_shape[0]
    s1, s2 = int(l1 ** 0.5), int(l2 ** 0.5)
    grid = value.T.reshape(nh, s1, s1)
    resized = jax.image.resize(
        _jnp.asarray(grid), (nh, s2, s2), method="cubic"
    )
    return np.asarray(resized).reshape(nh, l2).T


def _convert(value: np.ndarray, target_shape: tuple, kind: str,
             torch_key: str = "") -> np.ndarray:
    if kind == "linear" and value.ndim == 2:
        value = value.T
    elif kind == "linear" and value.ndim == 4:
        value = value.transpose(2, 3, 1, 0)
    if (
        value.shape != tuple(target_shape)
        and "relative_position_bias_table" in torch_key
        and value.ndim == 2
        and value.shape[1] == target_shape[1]
    ):
        value = _resize_rel_pos_table(value, tuple(target_shape))
    if value.shape != tuple(target_shape):
        raise ValueError(
            f"shape mismatch: torch {value.shape} vs flax {tuple(target_shape)}"
        )
    return value


_SKIP_SUBSTRINGS = (
    "pos_embed",
    "relative_position_index",
    "num_batches_tracked",  # torch BatchNorm counter, no flax equivalent
    "attn_mask",            # swin SW-MSA masks are recomputed buffers
)


def import_torch_params(
    state_dict: dict,
    params: Any,
    *,
    prefix: str = "",
    strict: bool = False,
    strict_subtrees: tuple = (),
    verbose: bool = True,
) -> tuple[Any, list[str], list[str]]:
    """Fill a flax param pytree from a torch state dict.

    Returns (new_params, missing_keys, unused_torch_keys). Like the
    reference's ``load_state_dict(strict=False)`` (main_finetune_cls.py:380),
    params without a torch counterpart keep their init (e.g. a fresh
    classify head).

    ``strict_subtrees`` names top-level param subtrees (e.g. ``backbone``)
    that MUST be fully covered by the state dict: a missing key under one of
    them raises instead of silently keeping random init. This is the loud
    failure mode for the checkpoint-parity goal — fresh heads outside the
    listed subtrees still load leniently.
    """
    import jax

    used = set()
    missing: list[str] = []
    strict_missing: list[str] = []

    def fill(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        torch_key, kind = _flax_path_to_torch_key(names)
        torch_key = prefix + torch_key
        if any(s in torch_key for s in _SKIP_SUBSTRINGS):
            return leaf
        if torch_key in state_dict:
            used.add(torch_key)
            return jnp.asarray(
                _convert(state_dict[torch_key], leaf.shape, kind, torch_key),
                dtype=leaf.dtype,
            )
        # MEM: per-block relative-position tables initialize from the shared
        # table for EVERY block depth (main_finetune_cls.py:358-361 hardcodes
        # 12; deriving from the target tree covers any depth)
        if torch_key.endswith("attn.relative_position_bias_table"):
            shared_key = prefix + "rel_pos_bias.relative_position_bias_table"
            if shared_key in state_dict:
                used.add(shared_key)
                return jnp.asarray(
                    _convert(state_dict[shared_key], leaf.shape, kind,
                             torch_key),
                    dtype=leaf.dtype,
                )
        missing.append(torch_key)
        if names and names[0] in strict_subtrees:
            strict_missing.append(torch_key)
        return leaf

    new_params = jax.tree_util.tree_map_with_path(fill, params)
    if strict_missing:
        raise KeyError(
            f"{len(strict_missing)} params under strict subtrees "
            f"{strict_subtrees} have no torch counterpart (e.g. "
            f"{strict_missing[:4]}). The checkpoint does not cover the "
            "backbone — wrong dialect/file, or pass --lenient_import to "
            "keep random init for the unmapped params."
        )
    unused = [
        k for k in state_dict
        if k not in used and not any(s in k for s in _SKIP_SUBSTRINGS)
    ]
    if verbose:
        if missing:
            print(f"[torch_import] {len(missing)} params kept their init "
                  f"(e.g. {missing[:4]})")
        if unused:
            print(f"[torch_import] {len(unused)} torch keys unused "
                  f"(e.g. {unused[:4]})")
    if strict and (missing or unused):
        raise KeyError(f"missing={missing}, unused={unused}")
    return new_params, missing, unused


def load_torch_backbone_if_needed(path: str, params: Any) -> Any:
    """CLI convenience: .pth/.pt files go through the importer; anything else
    is assumed to be an Orbax checkpoint handled elsewhere."""
    if path.endswith((".pth", ".pt", ".bin")):
        sd = load_torch_state_dict(path)
        new_params, _, _ = import_torch_params(sd, params)
        return new_params
    return params


def init_variables_from(path: str, variables: dict, *,
                        strict_backbone: bool = True) -> dict:
    """``init_backbone_from`` over a full flax variables dict: fills
    ``params`` AND ``batch_stats`` (BatchNorm running_mean/running_var —
    the reference checkpoints carry them for the dense decoder heads'
    ConvModule BNs, ft_dense_decoder.py:86-201, and the projector BNs;
    dropping them would leave eval-mode normalization at init stats)."""
    params = variables["params"]
    stats = variables.get("batch_stats") or {}
    if path.endswith((".pth", ".pt", ".bin")):
        sd = load_torch_state_dict(path)
        subtrees = ()
        if strict_backbone and isinstance(params, dict):
            subtrees = tuple(k for k in ("backbone",) if k in params)
        new_params, _, unused_p = import_torch_params(
            sd, params, strict_subtrees=subtrees, verbose=False
        )
        out = dict(variables, params=new_params)
        unused = unused_p
        if stats:
            new_stats, _, unused_s = import_torch_params(
                sd, stats, verbose=False
            )
            out["batch_stats"] = new_stats
            unused = sorted(set(unused_p) & set(unused_s))
        if unused:
            print(f"[torch_import] {len(unused)} torch keys unused "
                  f"(e.g. {unused[:4]})")
        return out
    prev = _restore_orbax_tree(path)
    out = dict(variables, params=_graft_tree(params, prev.get("params", prev)))
    if stats and isinstance(prev, dict) and prev.get("batch_stats"):
        out["batch_stats"] = _graft_tree(stats, prev["batch_stats"])
    return out


def init_backbone_from(path: str, params, *, strict_backbone: bool = True):
    """Initialize params from a prior checkpoint for stage chaining/finetune.

    Handles both released torch checkpoints (.pth/.pt/.bin via the importer)
    and this framework's own Orbax checkpoints (a directory): matching
    subtrees with identical shapes are copied; everything else (fresh heads)
    keeps its init — the equivalent of the reference's
    ``load_state_dict(strict=False)`` after surgery (main_finetune_cls.py:380).

    Unlike the reference's silent ``strict=False``, a torch file that fails
    to cover the ``backbone`` subtree raises by default (the checkpoint-
    parity goal needs every backbone weight imported, not random); pass
    ``strict_backbone=False`` (CLI: ``--lenient_import``) to restore the
    reference's lenient behavior.
    """
    if path.endswith((".pth", ".pt", ".bin")):
        sd = load_torch_state_dict(path)
        subtrees = ()
        if strict_backbone and isinstance(params, dict):
            subtrees = tuple(k for k in ("backbone",) if k in params)
        new_params, _, _ = import_torch_params(
            sd, params, strict_subtrees=subtrees
        )
        return new_params

    prev = _restore_orbax_tree(path)
    return _graft_tree(params, prev.get("params", prev), label=path)


def _restore_orbax_tree(path: str):
    import os

    import orbax.checkpoint as ocp

    target = os.path.abspath(path)
    if os.path.isdir(os.path.join(target, "checkpoints")):
        steps = [d for d in os.listdir(os.path.join(target, "checkpoints"))]
        num = sorted((int(d) for d in steps if d.isdigit()), reverse=True)
        name = str(num[0]) if num else steps[0]
        target = os.path.join(target, "checkpoints", name)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(target)


def _graft_tree(new_tree, old_tree, label: str = ""):
    """Copy matching-shape leaves from old into new; fresh heads keep init."""
    copied = [0]

    def graft(new, old):
        if isinstance(new, dict) and isinstance(old, dict):
            return {
                k: graft(new[k], old[k]) if k in old else new[k]
                for k in new
            }
        if getattr(new, "shape", None) == getattr(old, "shape", None):
            copied[0] += 1
            return jnp.asarray(old, new.dtype)
        return new

    out = graft(new_tree, old_tree)
    if label:
        print(f"[init_backbone_from] {label}: copied {copied[0]} "
              "matching leaves")
    return out
