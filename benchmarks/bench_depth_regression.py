"""In-context per-block cost via depth regression on the real chip.

Microbenchmarks of single sub-blocks carry axon-relay dispatch overhead, so
per-layer times cannot be trusted absolutely. This bench instead times the
FULL production rec step (make_rec_step, donated state, evolving PRNG —
identical harness to bench.py) at several (encoder_depth, decoder_depth)
configs and regresses: the slope is the true in-context fwd+bwd+optimizer
cost per block, the intercept is everything else (patch embed, masking,
mask-token insert/unshuffle, loss, optimizer tail).

Feeds the roofline argument in BASELINE.md (VERDICT r1 item 3).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from eventpretrain_tpu.models.vit import ViT
from eventpretrain_tpu.models.decoder import RecDecoder
from eventpretrain_tpu.models.pretrain_hub import PrHub
from eventpretrain_tpu.train import build_optimizer, TrainState
from eventpretrain_tpu.train.steps import make_rec_step

B = 384


def time_step(enc_depth: int, dec_depth: int) -> float:
    backbone = ViT(
        input_size=224, patch_size=16, embed_dim=768, depth=enc_depth,
        num_heads=12, dtype=jnp.bfloat16, name="backbone",
    )
    decoder = RecDecoder(
        patch_size=16, embed_dim=512, depth=dec_depth, num_heads=16,
        frame_chans=1, num_patches=196, dtype=jnp.bfloat16,
        name="pretrain_rec_decoder",
    )
    hub = PrHub(backbone=backbone, decoder=decoder, embed_dim=768,
                num_patches=196, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    evg = jnp.asarray(rng.normal(size=(B, 224, 224, 5)), jnp.float32)
    frame = jnp.asarray(rng.normal(size=(B, 224, 224, 1)), jnp.float32)
    variables = jax.jit(
        lambda *a, **k: hub.init(*a, **k, method=hub.forward_rec)
    )(jax.random.key(0), evg[:1], jnp.arange(49)[None], jnp.arange(196)[None])
    tx = build_optimizer(variables["params"], learning_rate=1.5e-4,
                         betas=(0.9, 0.95), num_layers=enc_depth)
    state = TrainState.create(apply_fn=hub.apply, params=variables["params"],
                              tx=tx)
    step = make_rec_step(hub, patch_size=16, num_patches=196, mask_ratio=0.75)
    data = {"evg": evg, "frame": frame}
    key = jax.random.key(0)
    state, metrics = step(state, data, key)
    float(metrics["loss"])
    iters = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            key, sub = jax.random.split(key)
            state, metrics = step(state, data, sub)
        float(metrics["loss"])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    configs = [(12, 8), (12, 4), (6, 8), (12, 0)]
    times = {}
    for e, d in configs:
        try:
            t = time_step(e, d)
        except Exception as ex:
            print(f"enc={e} dec={d}: FAILED {type(ex).__name__}: {ex}")
            continue
        times[(e, d)] = t
        print(f"enc={e} dec={d}: {t:7.2f} ms/step  ({B / t * 1e3:.0f} samples/s)")
    if (12, 8) in times and (12, 4) in times:
        per_dec = (times[(12, 8)] - times[(12, 4)]) / 4
        print(f"decoder block (in-context fwd+bwd+opt): {per_dec:6.2f} ms")
    if (12, 8) in times and (6, 8) in times:
        per_enc = (times[(12, 8)] - times[(6, 8)]) / 6
        print(f"encoder block (in-context fwd+bwd+opt): {per_enc:6.2f} ms")
    if (12, 0) in times and (12, 8) in times:
        print(f"decoder total incl. embed/insert/pred: "
              f"{times[(12, 8)] - times[(12, 0)]:6.2f} ms")


if __name__ == "__main__":
    main()
