"""Stage-2/3 con step breakdown: dense encoder vs heads+loss vs optimizer.

The con step measured 174 ms at bs128 (bench_all_steps.py) — ~22 TFLOP/s
naive encoder accounting, well under the rec encoder's efficiency. This
splits the step to find where the time goes.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from eventpretrain_tpu.models.pretrain_hub import pretrain_hub_base
from eventpretrain_tpu.objectives import global_token_infonce
from eventpretrain_tpu.train import TrainState, build_optimizer
from eventpretrain_tpu.train.steps import make_con_step

B = 128


def timeit(fn, args, iters=12):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    t0 = time.perf_counter()
    last = None
    for i in range(iters):
        last = fn(args[0], jnp.roll(args[1], i + 1, axis=0), *args[2:])
    float(jnp.sum(jax.tree.leaves(last)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    hub = pretrain_hub_base(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    evg = jnp.asarray(rng.normal(size=(B, 224, 224, 5)), jnp.float32)
    clip = jnp.asarray(rng.normal(size=(B, 197, 512)), jnp.float32)
    variables = jax.jit(
        lambda *a: hub.init(*a, train=True, method=hub.forward_con)
    )(jax.random.key(0), evg[:1], clip[:1])
    params, stats = variables["params"], variables.get("batch_stats")

    # dense encoder only, fwd+bwd
    def enc_loss(params, evg):
        emb_h = hub.apply(
            {"params": params}, evg,
            method=lambda m, e: m.backbone.encode_dense(
                e, deterministic=False, return_attn=False,
                return_pyramid=False,
            ),
            rngs={"dropout": jax.random.key(0)},
        )[2]
        return jnp.sum(emb_h.astype(jnp.float32) ** 2)

    print(f"encoder fwd      : {timeit(jax.jit(enc_loss), (params, evg)):7.2f} ms")
    print(f"encoder fwd+bwd  : {timeit(jax.jit(jax.grad(enc_loss)), (params, evg)):7.2f} ms")

    # full forward_con + InfoNCE, fwd+bwd (no optimizer)
    def con_loss(params, evg, clip):
        (q, k, *_), _ = hub.apply(
            {"params": params, "batch_stats": stats}, evg, clip, train=True,
            method=hub.forward_con, rngs={"dropout": jax.random.key(0)},
            mutable=["batch_stats"],
        )
        return global_token_infonce(q, k)

    print(f"con loss fwd+bwd : {timeit(jax.jit(jax.grad(con_loss)), (params, evg, clip)):7.2f} ms")

    # full step
    tx = build_optimizer(
        params, learning_rate=1.5e-4, betas=(0.9, 0.95), num_layers=12
    )
    state = TrainState.create(
        apply_fn=hub.apply, params=params, batch_stats=stats, tx=tx
    )
    step = make_con_step(hub)
    batch = {"evg": evg, "clip_emb": clip}
    key = jax.random.key(0)
    state, m = step(state, batch, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(12):
        state, m = step(state, batch, jax.random.fold_in(key, i))
    float(m["loss"])
    full = (time.perf_counter() - t0) / 12 * 1e3
    print(f"full con step    : {full:7.2f} ms ({B / (full / 1e3):.0f} samples/s)")


if __name__ == "__main__":
    main()
