"""Serving latency: exported StableHLO artifact vs live jit on real TPU.

Measures the production inference path (utils/export_infer.py: deserialize
the artifact, call it) for ViT-S classification @224 at several batch
sizes. The reference has no serving story at all (SURVEY.md §2); this
quantifies ours. Callable standalone or from bench.py's suite.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def bench_fn(fn, x, iters=30):
    y = fn(x + 0.0)
    float(jnp.sum(y))  # value fetch: reliable sync through the axon relay
    t0 = time.perf_counter()
    for i in range(iters):
        # vary inputs so the relay's (executable, inputs) cache cannot hit
        y = fn(x + (i + 1) * 1e-6)
    float(jnp.sum(y))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from eventpretrain_tpu.models.cls_hub import cls_hub_vit_small
    from eventpretrain_tpu.utils.export_infer import (
        export_inference,
        load_inference,
    )

    hub = cls_hub_vit_small(num_classes=100, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(1, 224, 224, 5)), jnp.float32)
    variables = jax.jit(hub.init)(jax.random.key(0), x0)

    def logits_fn(evg):
        return hub.apply(variables, evg)[1]  # (emb_h, logits, attn)

    blob = export_inference(logits_fn, example=x0, symbolic_batch=True)
    infer = load_inference(blob)
    live = jax.jit(logits_fn)

    rows = []
    for bs in (1, 8, 64):
        x = jnp.asarray(rng.normal(size=(bs, 224, 224, 5)), jnp.float32)
        ms_art = bench_fn(infer, x)
        ms_live = bench_fn(live, x)
        row = {
            "batch_size": bs,
            "artifact_ms": round(ms_art, 3),
            "live_jit_ms": round(ms_live, 3),
            "artifact_samples_per_sec": round(bs / ms_art * 1e3, 1),
        }
        rows.append(row)
        print(f"serving bs{bs:3d}: artifact {ms_art:7.2f} ms "
              f"({bs / ms_art * 1e3:8.1f} samples/s) | live jit "
              f"{ms_live:7.2f} ms", file=sys.stderr)
    return rows


if __name__ == "__main__":
    main()
