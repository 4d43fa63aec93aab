"""Stage-1 rec-step throughput at one batch size (argv[1]).

Batch sweep companion to bench.py: run once per size to map the throughput
curve (results recorded in BASELINE.md). Usage:

    PYTHONPATH=. python benchmarks/bench_batch_sweep.py 384
"""

import time, sys
import numpy as np
import jax, jax.numpy as jnp
from eventpretrain_tpu.models.pretrain_hub import pretrain_hub_base
from eventpretrain_tpu.train import build_optimizer, TrainState
from eventpretrain_tpu.train.steps import make_rec_step

batch = int(sys.argv[1])
hub = pretrain_hub_base(dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
evg = jnp.asarray(rng.normal(size=(batch, 224, 224, 5)), jnp.float32)
frame = jnp.asarray(rng.normal(size=(batch, 224, 224, 1)), jnp.float32)
variables = jax.jit(lambda *a, **k: hub.init(*a, **k, method=hub.forward_rec))(
    jax.random.key(0), evg[:1], jnp.arange(49)[None], jnp.arange(196)[None])
tx = build_optimizer(variables["params"], learning_rate=1.5e-4, betas=(0.9, 0.95), num_layers=12)
state = TrainState.create(apply_fn=hub.apply, params=variables["params"], tx=tx)
step = make_rec_step(hub, patch_size=16, num_patches=196, mask_ratio=0.75)
data = {"evg": evg, "frame": frame}
key = jax.random.key(0)
t0 = time.perf_counter()
state, metrics = step(state, data, key)
float(metrics["loss"])
print(f"compile+1step: {time.perf_counter()-t0:.1f}s", flush=True)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    for i in range(8):
        state, metrics = step(state, data, jax.random.fold_in(key, i))
    float(metrics["loss"])
    best = min(best, (time.perf_counter() - t0) / 8)
print(f"bs{batch}: {batch/best:.1f} samples/s")
