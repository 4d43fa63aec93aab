"""Serving export: serialize jitted inference to a StableHLO artifact.

The reference has no serving story (inference = running `ft_val` inside the
training script, ft_cls_trainer.py:111-192). For production deployment this
module freezes a hub + params into a `jax.export` artifact: a
self-contained, version-stable StableHLO program that a serving process can
deserialize and call without the model code, Python-side config, or
checkpoint surgery — only jax and the artifact bytes.

Two artifact flavors, one tradeoff:

- **Portable** (``native=False``, default): symbolic leading batch dim, no
  Pallas kernels (``force_xla`` — pallas_call cannot stage a symbolic
  batch grid, and the artifact must not depend on the export host's
  backend). One artifact serves any batch size on any platform, at the
  cost of the fused-kernel speedup (ViT-S cls bs64: 12.9 ms vs 8.3 ms
  live jit on v5e — BENCH serving rows).
- **TPU-native** (``native=True``): concrete batch size, ``platforms=
  ['tpu']``, fused Pallas kernels kept (serialized as ``tpu_custom_call``;
  the portability safety check is explicitly acknowledged via
  ``DisabledSafetyCheck``). Measured at parity with live jit (8.31 vs
  8.30 ms, ViT-S cls bs64 on v5e). Mosaic cross-lowers from CPU hosts,
  so CI can produce kernel-full TPU artifacts. Because the batch dim is
  baked, production serving uses an ``export_inference_bundle`` over
  batch-size buckets; the bundle loader pads each request to the nearest
  bucket (and chunks past the largest).

Usage::

    from eventpretrain_tpu.utils.export_infer import (
        export_inference, load_inference,
        export_inference_bundle, load_inference_bundle,
    )

    path = export_inference(
        lambda evg: hub.apply({"params": params}, evg)[1],  # logits
        example=jnp.zeros((1, 224, 224, 5)),
        path="serving/ncars_vits.stablehlo",
    )
    infer = load_inference(path)
    logits = infer(evg_batch)          # batch dim is symbolic

    path = export_inference_bundle(    # TPU-native, bucketed
        logits_fn, example, path="serving/ncars_vits.eptb",
        batch_sizes=(1, 8, 64),
    )
    infer = load_inference_bundle(path)
    logits = infer(evg_batch)          # any batch: pad/chunk to buckets
"""

from __future__ import annotations

import io
import json
import os
import struct
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export


def _example_args(example) -> tuple:
    # a single array (jax OR numpy — anything with .shape) is one argument;
    # only genuine sequences are multiple arguments
    if hasattr(example, "shape"):
        return (example,)
    return tuple(example)


def export_inference(
    fn: Callable,
    example: jax.Array | Sequence[jax.Array],
    path: Optional[str] = None,
    *,
    platforms: Optional[Sequence[str]] = None,
    symbolic_batch: bool = True,
    native: bool = False,
) -> bytes | str:
    """Serialize ``jit(fn)`` applied to ``example``-shaped inputs.

    ``symbolic_batch=True`` exports with a symbolic leading dimension so one
    artifact serves any batch size. ``native=True`` exports a TPU-only
    artifact that keeps the fused Pallas kernels (concrete batch only — the
    example's own batch size is baked in; see module docstring). Returns
    the serialized bytes, or writes them to ``path`` and returns the path.
    """
    from eventpretrain_tpu.ops.pallas_common import force_fused, force_xla

    args = _example_args(example)
    if native and symbolic_batch:
        # pallas_call cannot stage a symbolic batch grid
        symbolic_batch = False
    if symbolic_batch:
        scope = jax_export.SymbolicScope()
        (b,) = jax_export.symbolic_shape("b", scope=scope)
        specs = tuple(
            jax.ShapeDtypeStruct((b,) + a.shape[1:], a.dtype) for a in args
        )
    else:
        specs = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args)

    if native:
        ctx = force_fused()
        platforms = list(platforms) if platforms else ["tpu"]
        disabled = [jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call")]
    else:
        # Portable artifacts always trace the XLA path: the fused Pallas
        # kernels — a training-time optimization — are never baked in.
        ctx = force_xla()
        platforms = list(platforms) if platforms else None
        disabled = []

    with ctx:
        exp = jax_export.export(
            jax.jit(fn), platforms=platforms, disabled_checks=disabled
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


# ---------------------------------------------------------------------------
# Bucketed bundles: N concrete-batch artifacts in one file + a pad/chunk
# dispatcher. The container is MAGIC + u32 json-header-length + json header
# {"batch_sizes": [...], "lengths": [...]} + the artifact blobs back to back.

_BUNDLE_MAGIC = b"EPTBNDL1"


def export_inference_bundle(
    fn: Callable,
    example: jax.Array | Sequence[jax.Array],
    path: Optional[str] = None,
    *,
    batch_sizes: Sequence[int] = (1, 8, 64),
    platforms: Optional[Sequence[str]] = None,
    native: bool = True,
) -> bytes | str:
    """Export one concrete-batch artifact per bucket into a single bundle.

    ``example`` provides the per-sample shapes (its own batch dim is
    ignored). Default ``native=True``: TPU-only artifacts with the fused
    Pallas kernels kept — the whole point of baking concrete batch sizes.
    """
    args = _example_args(example)
    sizes = sorted(set(int(b) for b in batch_sizes))
    if not sizes or sizes[0] < 1:
        raise ValueError(f"batch_sizes must be positive, got {batch_sizes}")

    blobs = []
    for bs in sizes:
        ex = tuple(
            jnp.zeros((bs,) + a.shape[1:], a.dtype) for a in args
        )
        blobs.append(
            export_inference(
                fn,
                ex if len(ex) > 1 else ex[0],
                platforms=platforms,
                symbolic_batch=False,
                native=native,
            )
        )

    header = json.dumps(
        {"batch_sizes": sizes, "lengths": [len(b) for b in blobs]}
    ).encode()
    out = io.BytesIO()
    out.write(_BUNDLE_MAGIC)
    out.write(struct.pack("<I", len(header)))
    out.write(header)
    for b in blobs:
        out.write(b)
    data = out.getvalue()
    if path is None:
        return data
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_inference_bundle(path_or_bytes: str | bytes) -> Callable:
    """Deserialize a bundle into one callable over any batch size.

    Requests are padded (with zeros) up to the smallest bucket that fits;
    requests larger than the biggest bucket are served in largest-bucket
    chunks with the remainder padded. Outputs are sliced back to the true
    batch and concatenated, so callers never see the padding.
    """
    if isinstance(path_or_bytes, (str, os.PathLike)):
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    else:
        data = bytes(path_or_bytes)
    if data[: len(_BUNDLE_MAGIC)] != _BUNDLE_MAGIC:
        raise ValueError("not an export_inference_bundle artifact")
    off = len(_BUNDLE_MAGIC)
    (hlen,) = struct.unpack_from("<I", data, off)
    off += 4
    header = json.loads(data[off : off + hlen].decode())
    off += hlen
    sizes = header["batch_sizes"]
    fns = {}
    for bs, ln in zip(sizes, header["lengths"]):
        fns[bs] = jax.jit(jax_export.deserialize(data[off : off + ln]).call)
        off += ln
    largest = sizes[-1]

    def _run_padded(args: tuple, n: int):
        """One call on the smallest bucket >= n; returns outputs sliced to n."""
        bucket = next((b for b in sizes if b >= n), largest)
        if n < bucket:
            args = tuple(
                jnp.concatenate(
                    [a, jnp.zeros((bucket - n,) + a.shape[1:], a.dtype)]
                )
                for a in args
            )
        out = fns[bucket](*args)
        return jax.tree.map(lambda o: o[:n], out)

    def infer(*args):
        n = args[0].shape[0]
        if n <= largest:
            return _run_padded(args, n)
        outs = []
        for start in range(0, n, largest):
            stop = min(start + largest, n)
            outs.append(
                _run_padded(tuple(a[start:stop] for a in args), stop - start)
            )
        return jax.tree.map(lambda *os: jnp.concatenate(os), *outs)

    return infer


def export_cls_inference(
    hub,
    variables,
    *,
    input_size: int = 224,
    num_bins: int = 5,
    path: Optional[str] = None,
    platforms: Optional[Sequence[str]] = None,
    native: bool = False,
    batch_sizes: Optional[Sequence[int]] = None,
) -> bytes | str:
    """Freeze a classification hub's logits fn (mean-pool head path).

    Default: one portable symbolic-batch artifact on the XLA path.
    ``native=True``: a TPU-native bundle over ``batch_sizes`` (default
    (1, 8, 64)) with the fused Pallas kernels kept.
    """

    def logits_fn(evg):
        _, logits, _ = hub.apply(variables, evg, train=False)
        return logits

    example = jnp.zeros((1, input_size, input_size, num_bins), jnp.float32)
    if native:
        return export_inference_bundle(
            logits_fn,
            example,
            path,
            batch_sizes=tuple(batch_sizes or (1, 8, 64)),
            platforms=platforms,
            native=True,
        )
    return export_inference(
        logits_fn, example, path, platforms=platforms
    )
