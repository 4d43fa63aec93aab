"""Serving latency: exported artifacts vs live jit on real TPU.

Measures the production inference path (utils/export_infer.py: deserialize
the artifact, call it) for three serving tasks:

- cls: ViT-S classification @224, portable symbolic-batch artifact AND the
  TPU-native bucketed bundle (fused Pallas kernels kept), bs 1/8/64.
- semseg: ViT-S + UPerHead/FCN dense hub @224 (decode logits), native bs 8.
- flow: same hub with 2 output channels, native bs 8.

The reference has no serving story at all (SURVEY.md §2; inference =
ft_val inside the training script); this quantifies ours. Callable
standalone or from bench.py's suite.
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


def _bench_task(name, logits_fn, example, batch_sizes, rows,
                native_bundle=True, deadline=None):
    if deadline is not None and time.time() > deadline:
        print(f"[{name}] skipped_for_budget", file=sys.stderr)
        rows.append({"task": name, "skipped_for_budget": True})
        return
    if deadline is not None and native_bundle:
        # a native bucketed export costs ~10-35s; keep the portable row and
        # drop the bundle when the remaining budget cannot absorb it
        native_bundle = time.time() + 45 < deadline
    from eventpretrain_tpu.utils.export_infer import (
        export_inference,
        export_inference_bundle,
        load_inference,
        load_inference_bundle,
    )

    rng = np.random.default_rng(0)
    live = jax.jit(logits_fn)

    t0 = time.time()
    portable = load_inference(
        export_inference(logits_fn, example=example, symbolic_batch=True)
    )
    t_port = time.time() - t0
    native = None
    t_nat = 0.0
    if native_bundle:
        t0 = time.time()
        native = load_inference_bundle(
            export_inference_bundle(
                logits_fn, example, batch_sizes=batch_sizes, native=True
            )
        )
        t_nat = time.time() - t0
    print(f"[{name}] export: portable {t_port:.0f}s, native {t_nat:.0f}s",
          file=sys.stderr)

    for bs in batch_sizes:
        x = jnp.asarray(
            rng.normal(size=(bs,) + example.shape[1:]), example.dtype
        )
        ms_port = bench_fn(portable, x)
        ms_live = bench_fn(live, x)
        row = {
            "task": name,
            "batch_size": bs,
            "portable_ms": round(ms_port, 3),
            "live_jit_ms": round(ms_live, 3),
        }
        if native is not None:
            ms_nat = bench_fn(native, x)
            row["native_ms"] = round(ms_nat, 3)
            row["native_samples_per_sec"] = round(bs / ms_nat * 1e3, 1)
            row["native_vs_live"] = round(ms_nat / ms_live, 3)
        rows.append(row)
        nat_txt = f" | native {row['native_ms']:7.2f} ms" if native else ""
        print(f"[{name}] bs{bs:3d}: portable {ms_port:7.2f} ms"
              f"{nat_txt} | live jit {ms_live:7.2f} ms", file=sys.stderr)


def main(deadline=None):
    from eventpretrain_tpu.models.cls_hub import cls_hub_vit_small
    from eventpretrain_tpu.models.dense_hub import dense_hub_vit_small

    rng = np.random.default_rng(0)
    rows = []

    # --- cls: ViT-S @224, 100 classes -------------------------------------
    hub = cls_hub_vit_small(num_classes=100, dtype=jnp.bfloat16)
    x0 = jnp.asarray(rng.normal(size=(1, 224, 224, 5)), jnp.float32)
    variables = jax.jit(hub.init)(jax.random.key(0), x0)

    def cls_logits(evg):
        return hub.apply(variables, evg)[1]  # (emb_h, logits, attn)

    _bench_task("cls", cls_logits, x0, (1, 8, 64), rows, deadline=deadline)

    # --- semseg: ViT-S dense hub @224, 13 classes (DSEC grid) -------------
    seg = dense_hub_vit_small(num_classes=13, dtype=jnp.bfloat16)
    seg_vars = jax.jit(seg.init)(jax.random.key(1), x0)

    def seg_logits(evg):
        return seg.apply(seg_vars, evg, train=False)[2]  # decode logits

    _bench_task("semseg", seg_logits, x0, (8,), rows, deadline=deadline)

    # --- flow: same hub, 2 output channels @224 ---------------------------
    flow = dense_hub_vit_small(num_classes=2, dtype=jnp.bfloat16)
    flow_vars = jax.jit(flow.init)(jax.random.key(2), x0)

    def flow_out(evg):
        return flow.apply(flow_vars, evg, train=False)[2]

    _bench_task("flow", flow_out, x0, (8,), rows, deadline=deadline)
    return rows


if __name__ == "__main__":
    main()
