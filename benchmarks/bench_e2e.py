"""End-to-end training throughput: host pipeline + device step + prefetch.

Measures what a user actually gets: samples/s through ClsPipeline (native
augment+pack, device rasterize+augment) feeding the jitted train step, with
the background prefetcher overlapping host and device work.

    python benchmarks/bench_e2e.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
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
    print(json.dumps({
        "metric": "e2e_cls_vits_train_samples_per_sec",
        "value": round(n / dt, 1),
        "unit": "samples/s (host pipeline + device step)",
        "events_per_sec_m": round(n * 30000 / dt / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
