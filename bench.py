"""Headline benchmark: stage-1 pretrain throughput, ViT-B, one chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

then (unless EVENTPRETRAIN_BENCH_SUITE=0) runs the per-phase step suite
(benchmarks/bench_all_steps.py: con, rec+con, cls, semseg, flow, swin_rec,
ecdp) plus the MXU event-rasterizer and writes every number to
``bench_suite.json`` so round-over-round regressions in any phase are
machine-checkable, not prose (suite progress goes to stderr).

The reference repo publishes no numbers (SURVEY.md §6); BASELINE.md sets the
bar as the de-facto PyTorch MAE-style ViT-B pretrain throughput of the
reference's stack (timm-era MAE ViT-B @224, bs64-per-GPU, AMP) on one
A100-80GB: ~250 samples/s/GPU (provenance pinned in BASELINE.md "Measured
baselines": the widely reproduced MAE-ViT-B figure, not a same-machine
measurement — the reference itself cannot run here without CUDA).
vs_baseline = measured samples/s/chip / 250.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

REF_SAMPLES_PER_SEC_PER_GPU = 250.0  # see BASELINE.md "Measured baselines"


def run_suite(headline: dict) -> None:
    """Per-phase suite -> bench_suite.json (VERDICT r1 item 6)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchmarks import bench_all_steps as bas

    phases = []
    for name, fn in bas.ALL.items():
        try:
            row = fn()
            phases.append(row)
        except Exception as e:  # one phase failing must not hide the rest
            print(f"[suite] {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr)
            phases.append({"phase": name, "error": str(e)[:200]})
    try:
        from benchmarks.bench_events import main as events_main

        events = events_main()
    except Exception as e:
        print(f"[suite] events: FAILED {e}", file=sys.stderr)
        events = None
    try:
        from benchmarks.bench_serving import main as serving_main

        serving = serving_main()
    except Exception as e:
        print(f"[suite] serving: FAILED {e}", file=sys.stderr)
        serving = None
    out = {
        "backend": jax.default_backend(),
        "headline": headline,
        "phases": phases,
        "events_rasterizer": events,
        "serving_latency": serving,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_suite.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("[suite] wrote bench_suite.json", file=sys.stderr)


def main():
    from eventpretrain_tpu.models.pretrain_hub import pretrain_hub_base
    from eventpretrain_tpu.train import build_optimizer, TrainState
    from eventpretrain_tpu.train.steps import make_rec_step

    # bs sweep with the LN-fused sub-block kernels (ops/fused_attn_layer.py
    # fused_ln_attn_layer + ops/fused_mlp.py fused_ln_mlp): 192 -> 1348,
    # 256 -> 1361, 384 -> 1384, 512 -> 1372 samples/s on v5e
    # (pre-LN-fusion: 128 -> 1282, 192 -> 1353, 256 -> 1348)
    batch = 384
    hub = pretrain_hub_base(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    evg = jnp.asarray(rng.normal(size=(batch, 224, 224, 5)), jnp.float32)
    frame = jnp.asarray(rng.normal(size=(batch, 224, 224, 1)), jnp.float32)
    variables = jax.jit(
        lambda *a, **k: hub.init(*a, **k, method=hub.forward_rec)
    )(
        jax.random.key(0),
        evg[:1],
        jnp.arange(49)[None],
        jnp.arange(196)[None],
    )
    tx = build_optimizer(
        variables["params"], learning_rate=1.5e-4, betas=(0.9, 0.95),
        num_layers=12,
    )
    state = TrainState.create(
        apply_fn=hub.apply, params=variables["params"], tx=tx
    )
    step = make_rec_step(hub, patch_size=16, num_patches=196, mask_ratio=0.75)
    data = {"evg": evg, "frame": frame}

    key = jax.random.key(0)
    state, metrics = step(state, data, key)  # compile
    float(metrics["loss"])  # value fetch: the only reliable sync on axon

    # best of 3 windows: the shared/tunneled chip shows high run variance
    iters = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            key, sub = jax.random.split(key)
            state, metrics = step(state, data, sub)
        # terminal value fetch; the train-state chain forces every step
        float(metrics["loss"])
        best = min(best, (time.perf_counter() - t0) / iters)
    dt = best

    samples_per_sec = batch / dt
    headline = {
        "metric": "pretrain_vitb_stage1_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(
            samples_per_sec / REF_SAMPLES_PER_SEC_PER_GPU, 3
        ),
    }
    print(json.dumps(headline), flush=True)
    return headline


if __name__ == "__main__":
    h = main()
    if os.environ.get("EVENTPRETRAIN_BENCH_SUITE", "1") != "0":
        run_suite(h)
