"""End-to-end training throughput: host pipeline + device step + prefetch.

Measures what a user actually gets — samples/s through the full input
pipeline (native augment+pack, device rasterize+augment) feeding the jitted
train step, with the background prefetcher overlapping host and device work
— for the three delivered training paths:

- cls    : ClsPipeline -> ViT-S classification step @224, 30k events
- semseg : DensePipeline at the DSEC shape (440x640 sensor, 200k-event
           windows, 440x640 labels) -> ViT-S + UPerHead/FCN step
- flow   : DensePipeline at the MVSEC shape (260x346, 30k events) ->
           dense hub flow step

VERDICT r3 items 3+8: the per-phase step-only rates in bench_all_steps.py
overstate delivered throughput when the rasterizer or host IO dominates;
these rows pin the real number per round.

    python benchmarks/bench_e2e.py [cls|semseg|flow ...]
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def bench_cls():
    from eventpretrain_tpu.data.cls_pipeline import (
        ClsDataConfig, ClsPipeline, SyntheticClsSource,
    )
    from eventpretrain_tpu.models.cls_hub import cls_hub_vit_small
    from eventpretrain_tpu.train import build_optimizer, TrainState
    from eventpretrain_tpu.train.steps import make_cls_train_step
    from eventpretrain_tpu.train.loop import train_one_epoch

    batch = 64
    src = SyntheticClsSource(num_classes=2, samples_per_class=96,
                             num_events=30000, sensor_hw=(224, 224),
                             cache=True)  # measure the framework, not synth
    cfg = ClsDataConfig(
        num_classes=2, num_bins=5, input_size=224, fix_events_num=30000,
        val_fix_events_num=30000, canvas_height=224, canvas_width=224,
        infer_sensor_size=False,
    )
    hub = cls_hub_vit_small(num_classes=2, dtype=jnp.bfloat16)
    variables = jax.jit(hub.init)(
        jax.random.key(0), jnp.zeros((1, 224, 224, 5))
    )
    tx = build_optimizer(variables["params"], learning_rate=1e-4,
                         num_layers=12, clip_grad=5.0)
    state = TrainState.create(apply_fn=hub.apply, params=variables["params"],
                              tx=tx)
    step = make_cls_train_step(hub)

    # warmup epoch compiles everything
    state, _ = train_one_epoch(
        step=step, state=state,
        pipeline=ClsPipeline(src, cfg, batch, train=True, seed=0),
        rng_key=jax.random.key(1), print_freq=10_000,
    )
    n = len(src) // batch * batch
    t0 = time.perf_counter()
    state, metrics = train_one_epoch(
        step=step, state=state,
        pipeline=ClsPipeline(src, cfg, batch, train=True, seed=1),
        rng_key=jax.random.key(2), print_freq=10_000,
    )
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    row = {
        "metric": "e2e_cls_vits_train_samples_per_sec",
        "value": round(n / dt, 1),
        "unit": "samples/s (host pipeline + device step)",
        "events_per_sec_m": round(n * 30000 / dt / 1e6, 1),
    }
    print(json.dumps(row), file=sys.stderr)
    return row


def bench_dense(task: str):
    """semseg at the DSEC shape; flow at the MVSEC shape. Synthetic sources
    at the real sensor geometries and event counts, cached so host synth
    cost is excluded — the pipeline (stream augment, pack, codec transfer,
    device rasterize + view augment) and the train step are what's timed."""
    from eventpretrain_tpu.data.dense_pipeline import (
        DenseDataConfig, DensePipeline, SyntheticDenseSource,
    )
    from eventpretrain_tpu.models.dense_hub import dense_hub_vit_small
    from eventpretrain_tpu.train import build_optimizer, TrainState
    from eventpretrain_tpu.train.loop import train_one_epoch
    from eventpretrain_tpu.train.steps import (
        make_flow_train_step,
        make_semseg_train_step,
    )

    if task == "semseg":
        hw, events, batch, n_samples = (440, 640), 200_000, 16, 64
        num_classes = 11
    else:
        hw, events, batch, n_samples = (260, 346), 30_000, 16, 64
        num_classes = 2
    src = SyntheticDenseSource(
        task=task, n=n_samples, num_classes=min(num_classes, 5),
        sensor_hw=hw, num_events=events, cache=True,
    )
    cfg = DenseDataConfig(
        task=task, num_bins=5, input_size=224, fix_events_num=events,
        val_fix_events_num=events, sensor_height=hw[0], sensor_width=hw[1],
        label_size=hw if task == "semseg" else (224, 224),
    )
    hub = dense_hub_vit_small(num_classes=num_classes, dtype=jnp.bfloat16)
    variables = jax.jit(hub.init)(
        jax.random.key(0), jnp.zeros((1, 224, 224, 5))
    )
    tx = build_optimizer(variables["params"], learning_rate=1e-4,
                         num_layers=12, clip_grad=5.0)
    state = TrainState.create(
        apply_fn=hub.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"), tx=tx,
    )
    if task == "semseg":
        step = make_semseg_train_step(
            hub, num_classes=num_classes, ignore_index=255
        )
    else:
        step = make_flow_train_step(hub)

    state, _ = train_one_epoch(  # warmup epoch compiles everything
        step=step, state=state,
        pipeline=DensePipeline(src, cfg, batch, train=True, seed=0),
        rng_key=jax.random.key(1), print_freq=10_000,
    )
    n = len(src) // batch * batch
    t0 = time.perf_counter()
    state, metrics = train_one_epoch(
        step=step, state=state,
        pipeline=DensePipeline(src, cfg, batch, train=True, seed=1),
        rng_key=jax.random.key(2), print_freq=10_000,
    )
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    row = {
        "metric": f"e2e_{task}_vits_train_samples_per_sec",
        "value": round(n / dt, 1),
        "unit": "samples/s (host pipeline + device step)",
        "events_per_sec_m": round(n * events / dt / 1e6, 1),
        "sensor_hw": list(hw),
        "events_per_sample": events,
    }
    print(json.dumps(row), file=sys.stderr)
    return row


ALL = {
    "cls": bench_cls,
    "semseg": lambda: bench_dense("semseg"),
    "flow": lambda: bench_dense("flow"),
}


def main(tasks=None):
    rows = []
    for name in tasks or list(ALL):
        try:
            rows.append(ALL[name]())
        except Exception as e:
            print(f"[e2e] {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
            rows.append({"metric": f"e2e_{name}", "error": str(e)[:200]})
    return rows


if __name__ == "__main__":
    main(sys.argv[1:] or None)
