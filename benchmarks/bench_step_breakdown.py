"""Break the stage-1 rec step into parts and time each on the real chip.

Parts (bs384, ViT-B, mask 0.75): encoder fwd+bwd, decoder fwd+bwd, full
loss_fn fwd+bwd, optimizer update, patch-embed alone. Guides where the
next kernel effort should go (see BASELINE.md "MFU analysis").
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from eventpretrain_tpu.models.pretrain_hub import pretrain_hub_base
from eventpretrain_tpu.objectives import reconstruct_loss
from eventpretrain_tpu.ops.masking import make_mask_from_noise
from eventpretrain_tpu.train import build_optimizer, TrainState
from eventpretrain_tpu.train.steps import make_rec_step

B = 384


def timeit(fn, args, iters=20):
    """Times fn with a fresh evg slice per call (roll by iteration) so the
    axon relay's (executable, inputs) result cache cannot short-circuit."""
    out = fn(*args)
    jax.tree.map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, out)
    params, evg = args[0], args[1]
    rest = args[2:]
    t0 = time.perf_counter()
    last = None
    for i in range(iters):
        last = fn(params, jnp.roll(evg, i + 1, axis=0), *rest)
    leaf = jax.tree.leaves(last)[0]
    float(jnp.sum(leaf))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    hub = pretrain_hub_base(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    evg = jnp.asarray(rng.normal(size=(B, 224, 224, 5)), jnp.float32)
    frame = jnp.asarray(rng.normal(size=(B, 224, 224, 1)), jnp.float32)
    variables = jax.jit(
        lambda *a, **k: hub.init(*a, **k, method=hub.forward_rec)
    )(jax.random.key(0), evg[:1], jnp.arange(49)[None], jnp.arange(196)[None])
    params = variables["params"]
    noise = jax.random.uniform(jax.random.key(1), (B, 196))
    ids_keep, mask, ids_restore = jax.jit(
        lambda n: make_mask_from_noise(n, 49))(noise)

    # full loss fwd / fwd+bwd
    def loss(params, evg, frame):
        pred, *_ = hub.apply(
            {"params": params}, evg, ids_keep, ids_restore,
            method=hub.forward_rec,
        )
        return reconstruct_loss(
            pred, frame, mask, patch_size=16, norm_pix_loss=True,
            mask_ratio=0.75,
        )

    lf = jax.jit(loss)
    lg = jax.jit(jax.grad(loss))
    print(f"loss fwd        : {timeit(lf, (params, evg, frame)):7.2f} ms")
    print(f"loss fwd+bwd    : {timeit(lg, (params, evg, frame)):7.2f} ms")

    # encoder-only fwd+bwd — BEFORE the full step, whose donate_argnums
    # frees the param buffers
    def enc_loss(params, evg):
        emb = hub.apply(
            {"params": params}, evg, ids_keep,
            method=lambda m, e, i: m.backbone.encode_masked(e, i),
        )[2]
        return jnp.sum(emb.astype(jnp.float32) ** 2)

    try:
        eg = jax.jit(jax.grad(enc_loss))
        print(f"encoder fwd+bwd : {timeit(eg, (params, evg)):7.2f} ms")
    except Exception as e:
        print("encoder-only: skipped", type(e).__name__, str(e)[:120])

    # full step (incl. optimizer + metrics)
    tx = build_optimizer(
        params, learning_rate=1.5e-4, betas=(0.9, 0.95), num_layers=12
    )
    state = TrainState.create(apply_fn=hub.apply, params=params, tx=tx)
    step = make_rec_step(hub, patch_size=16, num_patches=196, mask_ratio=0.75)
    data = {"evg": evg, "frame": frame}
    key = jax.random.key(0)
    state, m = step(state, data, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(20):
        state, m = step(state, data, jax.random.fold_in(key, i))
    float(m["loss"])
    full = (time.perf_counter() - t0) / 20 * 1e3
    print(f"full step       : {full:7.2f} ms  ({B / (full / 1e3):.0f} samples/s)")

if __name__ == "__main__":
    main()
