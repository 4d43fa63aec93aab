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


def timeit(fn, arg_sets, **kw):
    """Each distinct input set is used exactly once (the axon relay caches
    results for identical (executable, inputs) pairs), and the sync is a
    VALUE FETCH: block_until_ready under-synchronizes through the relay —
    it produced the retracted 150-400 GB/s scatter figures."""
    import jax.numpy as jnp

    out = fn(*arg_sets[0], **kw)  # compile warmup (set 0 excluded below)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    acc = 0.0
    for args in arg_sets[1:]:
        acc = acc + jnp.sum(fn(*args, **kw))
    float(acc)
    return (time.perf_counter() - t0) / (len(arg_sets) - 1)


def main():
    from eventpretrain_tpu.ops.events import voxelize_batch_jit

    configs = [
        # (B, E, H, W, bins) — N-Cars-like, ImageNet-like, DSEC-like
        (64, 30_000, 128, 128, 5),
        (32, 30_000, 224, 224, 5),
        (8, 200_000, 440, 640, 5),
    ]
    results = []
    warmed = False
    for b, e, h, w, bins in configs:
        arg_sets = [synth(b, e, h, w, seed=s_) for s_ in range(9)]
        gb = arg_sets[0][0].nbytes / 1e9
        if not warmed:
            # the first timed executable in a process measures wildly slow
            # through the relay; absorb that into a throwaway round. The
            # warmup MUST use seeds disjoint from the timed sets — reusing
            # them would turn the first timed iterations into relay cache
            # hits (the artifact class this file exists to avoid).
            warm_sets = [synth(b, e, h, w, seed=100 + s_) for s_ in range(4)]
            timeit(voxelize_batch_jit, warm_sets, num_bins=bins,
                   height=h, width=w)
            warmed = True
        dt_xla = timeit(
            voxelize_batch_jit, arg_sets, num_bins=bins, height=h, width=w
        )
        row = {
            "config": f"B{b}xE{e} {h}x{w}x{bins}",
            "gbps": round(gb / dt_xla, 1),
            "ms": round(dt_xla * 1e3, 3),
            "m_events_per_sec": round(b * e / dt_xla / 1e6, 1),
        }
        # note: voxelize_batch_jit now dispatches to the MXU matmul
        # kernel for grids <= 256^2 (ops/pallas_voxel.py::voxelize_batch_mxu)
        # and to XLA scatter for larger grids (DSEC row below)
        results.append(row)
        import sys
        print(json.dumps(row), file=sys.stderr)

    # DSEC shape again through the tiled MXU path: host tile bucketing
    # (native C++ counting sort, overlappable with device compute in the
    # pipeline) + the tiled splat kernel (pallas_voxel.py::
    # voxelize_batch_mxu_tiled). Reported separately so the device kernel
    # and the host routing cost are both visible.
    from eventpretrain_tpu.native import bucket_pack_event_batch
    from eventpretrain_tpu.ops.pallas_voxel import voxelize_batch_mxu_tiled

    b, e, h, w, bins = configs[-1]
    # materialize on host BEFORE the timer: synth returns jnp arrays, and a
    # device->host fetch inside the timed loop would inflate host_bucket_ms
    raw_sets = [
        tuple(np.asarray(a) for a in synth(b, e, h, w, seed=200 + s_))
        for s_ in range(9)
    ]
    # warm call: absorbs the one-time g++ build of the native library and
    # the first-touch faults of the output buffer, which the pipeline
    # amortizes by rotating preallocated buffers (data/dense_pipeline.py)
    out_buf = bucket_pack_event_batch(
        raw_sets[0][0], raw_sets[0][1], height=h, width=w
    )[0]
    t0 = time.perf_counter()
    for ev, counts in raw_sets:
        bucket_pack_event_batch(ev, counts, height=h, width=w, out=out_buf)
    host_ms = (time.perf_counter() - t0) / len(raw_sets) * 1e3
    # production host path: bucketing fused with the u32 transfer codec
    # (what DensePipeline actually runs — native/bucket_pack_event_batch_u32)
    from eventpretrain_tpu.native import bucket_pack_event_batch_u32

    enc_buf = bucket_pack_event_batch_u32(
        raw_sets[0][0], raw_sets[0][1], height=h, width=w
    )[0]
    t0 = time.perf_counter()
    for ev, counts in raw_sets:
        bucket_pack_event_batch_u32(
            ev, counts, height=h, width=w, out=enc_buf
        )
    host_u32_ms = (time.perf_counter() - t0) / len(raw_sets) * 1e3
    # untimed re-run to materialize per-set results for the device timing
    # (bucketing is deterministic, so these equal the timed pass's outputs)
    bucketed_sets = [
        bucket_pack_event_batch(ev, counts, height=h, width=w)
        for ev, counts in raw_sets
    ]
    arg_sets = [
        (jnp.asarray(ev), jnp.asarray(tab), jnp.asarray(tr),
         jnp.asarray(ctr))
        for ev, tab, tr, ctr in bucketed_sets
    ]
    dt_tiled = timeit(
        voxelize_batch_mxu_tiled, arg_sets, num_bins=bins, height=h, width=w
    )
    row = {
        "config": f"B{b}xE{e} {h}x{w}x{bins} tiled",
        "ms": round(dt_tiled * 1e3, 3),
        "m_events_per_sec": round(b * e / dt_tiled / 1e6, 1),
        "host_bucket_ms": round(host_ms, 3),
        "host_bucket_u32_fused_ms": round(host_u32_ms, 3),
        # device-kernel speedup over the XLA scatter row at the same shape
        "vs_scatter": round(results[-1]["ms"] / (dt_tiled * 1e3), 2),
    }
    results.append(row)
    print(json.dumps(row), file=sys.stderr)
    return results


if __name__ == "__main__":
    main()
