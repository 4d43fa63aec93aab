"""Export flax params as a reference-dialect PyTorch state dict.

The inverse of ``ckpt/torch_import.py``: walk the flax param tree, map each
path through the SAME name translation (``_flax_path_to_torch_key``), and
apply the inverse weight transposes, producing the key space the reference
modules save natively (reference utils/misc.py:318-364 writes
``{"model": state_dict, "epoch": ...}``). Lets a model trained here be
loaded by the reference's ``--finetune``/eval scripts, and closes the
round-trip invariant ``import(export(params)) == params``
(tests/test_torch_export.py).

Buffers the importer recomputes are also recomputable by the reference at
load time and are therefore omitted: fixed sincos ``pos_embed`` tables,
``relative_position_index``, swin ``attn_mask``, and BatchNorm
``num_batches_tracked`` — the reference loads checkpoints with
``strict=False`` everywhere (main_finetune_cls.py:380).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from eventpretrain_tpu.ckpt.torch_import import (
    _SKIP_SUBSTRINGS,
    _flax_path_to_torch_key,
)


def _deconvert(value: np.ndarray, kind: str) -> np.ndarray:
    """Inverse of torch_import._convert's layout mapping."""
    if kind == "linear" and value.ndim == 2:
        return value.T                     # flax (in, out) -> torch (out, in)
    if kind == "linear" and value.ndim == 4:
        return value.transpose(3, 2, 0, 1)  # HWIO -> OIHW
    return value


def export_torch_state_dict(
    params: Any,
    batch_stats: Optional[Any] = None,
    *,
    prefix: str = "",
) -> dict:
    """Flax param (+ BatchNorm stats) pytree -> {torch key: np.float32}."""
    import jax

    out: dict[str, np.ndarray] = {}

    def put(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        torch_key, kind = _flax_path_to_torch_key(names)
        torch_key = prefix + torch_key
        if any(s in torch_key for s in _SKIP_SUBSTRINGS):
            return leaf
        out[torch_key] = _deconvert(
            np.asarray(leaf, np.float32), kind
        )
        return leaf

    jax.tree_util.tree_map_with_path(put, params)
    if batch_stats:
        jax.tree_util.tree_map_with_path(put, batch_stats)
    return out


def save_torch_checkpoint(
    path: str,
    params: Any,
    batch_stats: Optional[Any] = None,
    *,
    epoch: int = 0,
    prefix: str = "",
) -> str:
    """Write a reference-format ``.pth`` ({"model": ..., "epoch": ...})."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v).copy())
        for k, v in export_torch_state_dict(
            params, batch_stats, prefix=prefix
        ).items()
    }
    torch.save({"model": sd, "epoch": epoch}, path)
    return path
