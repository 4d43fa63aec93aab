"""Event->tensor rasterization benchmark: XLA scatter vs Pallas kernel.

Measures the north-star event-throughput metric (BASELINE.md): GB/s of raw
event data consumed by the batched voxelizer, across sensor sizes and event
counts. Run on the TPU:

    python benchmarks/bench_events.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def synth(b, e, h, w, seed=0):
    rng = np.random.default_rng(seed)
    ev = np.stack(
        [
            np.stack(
                [rng.integers(0, w, e), rng.integers(0, h, e),
                 np.sort(rng.uniform(0, 1, e)), rng.integers(0, 2, e)], 1
            ).astype(np.float32)
            for _ in range(b)
        ]
    )
    return jnp.asarray(ev), jnp.full((b,), e, jnp.int32)


def timeit(fn, *args, iters=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from eventpretrain_tpu.ops.events import voxelize_batch_jit

    configs = [
        # (B, E, H, W, bins) — N-Cars-like, ImageNet-like, DSEC-like
        (64, 30_000, 128, 128, 5),
        (32, 30_000, 224, 224, 5),
        (8, 200_000, 440, 640, 5),
    ]
    results = []
    for b, e, h, w, bins in configs:
        ev, counts = synth(b, e, h, w)
        gb = ev.nbytes / 1e9
        dt_xla = timeit(
            voxelize_batch_jit, ev, counts, num_bins=bins, height=h, width=w
        )
        row = {
            "config": f"B{b}xE{e} {h}x{w}x{bins}",
            "xla_gbps": round(gb / dt_xla, 1),
            "xla_ms": round(dt_xla * 1e3, 3),
            "xla_events_per_sec": round(b * e / dt_xla / 1e9, 2),
        }
        row["pallas"] = ("interpret-only: Mosaic lacks scalar VMEM "
                         "stores (see ops/pallas_voxel.py)")
        results.append(row)
        print(json.dumps(row))
    return results


if __name__ == "__main__":
    main()
