"""Stage-2/3 con step breakdown: dense encoder vs heads+loss vs optimizer.

Splits the 174 ms bs128 con step (bench_all_steps.py) into encoder,
projector/predictor heads, InfoNCE, and optimizer windows, and prints the
achieved TFLOP/s of each against its nominal fwd+bwd FLOPs — the measured
basis for the con roofline argument in BASELINE.md.
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
L, C, MLP = 196, 768, 4096


def flops_con(b=B):
    """Nominal fwd FLOPs (2*MACs) of each con-step part at bs ``b``."""
    enc_blk = 24 * L * C * C + 4 * L * L * C          # qkv+proj+mlp + scores
    enc = 12 * enc_blk * b
    tok = b * L
    proj = 2 * tok * (C * MLP + MLP * MLP + MLP * C)  # 3-layer projector
    pred = 2 * tok * (C * MLP + MLP * C)              # 2-layer predictor
    clip = 2 * b * L * 512 * C                        # clip_emb_proj
    nce = 2 * b * b * L * C                           # nlc,mlc->nlm einsum
    return enc, proj + pred + clip, nce


def timeit(fn, args, iters=12):
    # pre-materialize the varied inputs: building them lazily inside the
    # timing loop (e.g. jnp.roll with a per-iteration static shift) would
    # compile one tiny program per iteration through the axon relay and
    # swamp the measurement; inputs must still vary so the relay's
    # (executable, inputs) cache cannot hit
    variants = [
        jnp.roll(args[1], i + 1, axis=0).block_until_ready()
        for i in range(iters)
    ]
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    t0 = time.perf_counter()
    last = None
    for v in variants:
        last = fn(args[0], v, *args[2:])
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

    f_enc, f_heads, f_nce = flops_con()
    ms_enc_f = timeit(jax.jit(enc_loss), (params, evg))
    ms_enc = timeit(jax.jit(jax.grad(enc_loss)), (params, evg))
    print(f"encoder fwd      : {ms_enc_f:7.2f} ms "
          f"({f_enc / ms_enc_f / 1e9:5.0f} TFLOP/s)")
    print(f"encoder fwd+bwd  : {ms_enc:7.2f} ms "
          f"({3 * f_enc / ms_enc / 1e9:5.0f} TFLOP/s nominal-3x)")

    # heads only: fixed emb_h -> q, plus k path, fwd+bwd over head params
    emb_h = jax.jit(
        lambda p, e: hub.apply(
            {"params": p}, e,
            method=lambda m, ee: m.backbone.encode_dense(
                ee, deterministic=True, return_attn=False,
                return_pyramid=False)[2],
        )
    )(params, evg)

    def heads_loss(params, emb_h, clip):
        (q, k, *_), _ = hub.apply(
            {"params": params, "batch_stats": stats},
            emb_h, clip, train=True,
            method=lambda m, e, c, train: (
                (m.emb_h_pred(m.emb_h_proj(e, train), train),
                 m.clip_emb_proj(m.norm_clip_emb(c[:, 1:, :])),
                 None, None, None),
            )[0],
            mutable=["batch_stats"],
        )
        return global_token_infonce(q, k)

    ms_heads = timeit(jax.jit(jax.grad(heads_loss)), (params, emb_h, clip))
    print(f"heads+nce fwd+bwd: {ms_heads:7.2f} ms "
          f"({(3 * f_heads + f_nce) / ms_heads / 1e9:5.0f} TFLOP/s nominal-3x)")

    # full forward_con + InfoNCE, fwd+bwd (no optimizer)
    def con_loss(params, evg, clip):
        (q, k, *_), _ = hub.apply(
            {"params": params, "batch_stats": stats}, evg, clip, train=True,
            method=hub.forward_con, rngs={"dropout": jax.random.key(0)},
            mutable=["batch_stats"],
        )
        return global_token_infonce(q, k)

    ms_con = timeit(jax.jit(jax.grad(con_loss)), (params, evg, clip))
    print(f"con loss fwd+bwd : {ms_con:7.2f} ms "
          f"({(3 * (f_enc + f_heads) + f_nce) / ms_con / 1e9:5.0f} TFLOP/s nominal-3x)")

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
    # pre-materialize per-step keys (fold_in with a static int would compile
    # a new program per iteration through the relay — see timeit)
    keys = [jax.random.fold_in(key, i).block_until_ready() for i in range(12)]
    state, m = step(state, batch, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for k in keys:
        state, m = step(state, batch, k)
    float(m["loss"])
    full = (time.perf_counter() - t0) / 12 * 1e3
    print(f"full con step    : {full:7.2f} ms ({B / (full / 1e3):.0f} samples/s)")


if __name__ == "__main__":
    main()
