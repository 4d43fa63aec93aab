"""Serving export: serialize jitted inference to portable StableHLO.

The reference has no serving story (inference = running `ft_val` inside the
training script, ft_cls_trainer.py:111-192). For production deployment this
module freezes a hub + params into a `jax.export` artifact: a
self-contained, version-stable StableHLO program that a serving process can
deserialize and call without the model code, Python-side config, or
checkpoint surgery — only jax and the artifact bytes.

Artifacts are exported for the platform given (default: the current
backend) and can target "tpu" from a CPU host (cross-platform lowering),
so CI can produce TPU serving artifacts. Exports always trace the
portable XLA graph — the fused Pallas training kernels are excluded
(symbolic batch grids are unsupported by pallas_call, and the artifact
must not depend on the export host's backend).

Usage::

    from eventpretrain_tpu.utils.export_infer import (
        export_inference, load_inference,
    )

    path = export_inference(
        lambda evg: hub.apply({"params": params}, evg)[1],  # logits
        example=jnp.zeros((1, 224, 224, 5)),
        path="serving/ncars_vits.stablehlo",
    )
    infer = load_inference(path)
    logits = infer(evg_batch)          # batch dim is symbolic
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_inference(
    fn: Callable,
    example: jax.Array | Sequence[jax.Array],
    path: Optional[str] = None,
    *,
    platforms: Optional[Sequence[str]] = None,
    symbolic_batch: bool = True,
) -> bytes | str:
    """Serialize ``jit(fn)`` applied to ``example``-shaped inputs.

    ``symbolic_batch=True`` exports with a symbolic leading dimension so one
    artifact serves any batch size. Returns the serialized bytes, or writes
    them to ``path`` and returns the path.
    """
    # a single array (jax OR numpy — anything with .shape) is one argument;
    # only genuine sequences are multiple arguments
    if hasattr(example, "shape"):
        args = (example,)
    else:
        args = tuple(example)
    if symbolic_batch:
        scope = jax_export.SymbolicScope()
        (b,) = jax_export.symbolic_shape("b", scope=scope)
        specs = tuple(
            jax.ShapeDtypeStruct((b,) + a.shape[1:], a.dtype) for a in args
        )
    else:
        specs = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args)

    # Serving artifacts always trace the portable XLA path: pallas_call
    # cannot stage a symbolic batch grid, and the host backend at export
    # time (often CPU CI) need not match the serving platform, so the fused
    # Pallas kernels — a training-time optimization — are never baked in.
    from eventpretrain_tpu.ops.pallas_common import force_xla

    with force_xla():
        exp = jax_export.export(
            jax.jit(fn),
            platforms=list(platforms) if platforms else None,
        )(*specs)
    blob = bytes(exp.serialize())
    if path is None:
        return blob
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_inference(path_or_bytes: str | bytes) -> Callable:
    """Deserialize an exported artifact into a callable.

    The callable runs the frozen program (weights baked in as constants)
    under jit on the current backend.
    """
    if isinstance(path_or_bytes, (str, os.PathLike)):
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    else:
        blob = bytes(path_or_bytes)
    exp = jax_export.deserialize(blob)
    return jax.jit(exp.call)


def export_cls_inference(
    hub,
    variables,
    *,
    input_size: int = 224,
    num_bins: int = 5,
    path: Optional[str] = None,
    platforms: Optional[Sequence[str]] = None,
) -> bytes | str:
    """Freeze a classification hub's logits fn (mean-pool head path).

    Uses the deterministic eval forward on the portable XLA path (see
    module docstring: fused Pallas kernels are never baked into artifacts).
    """

    def logits_fn(evg):
        _, logits, _ = hub.apply(variables, evg, train=False)
        return logits

    example = jnp.zeros((1, input_size, input_size, num_bins), jnp.float32)
    return export_inference(
        logits_fn, example, path, platforms=platforms
    )
