"""Dense (one-hot matmul) voxelizer vs XLA scatter, on the real chip.

The scatter voxelizer measures 190 ms for 64x30k@224^2 (serialized
data-dependent scatter; the earlier 150-400 GB/s record was a relay-cache
artifact). The dense formulation builds per-event one-hot row/col
indicators and contracts them on the MXU:

    out[h, w, b] = sum_e Y[e,h] * X[e,w] * Wb[e,b]
                 = (Y^T @ (X (x) Wb))[h, (w,b)]

which is pure matmul work: ~15 GFLOP/sample at E=30k, 224^2, 5 bins.
"""

import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

from eventpretrain_tpu.ops.events import events_to_voxel_grid

B, E, H, W, NB = 64, 30000, 224, 224, 5


def make(seed):
    r = np.random.default_rng(seed)
    ev = np.stack([
        np.floor(r.uniform(0, W, (B, E))),
        np.floor(r.uniform(0, H, (B, E))),
        np.sort(r.uniform(0, 1, (B, E)), axis=1),
        r.integers(0, 2, (B, E)).astype(np.float64),
    ], axis=-1).astype(np.float32)
    return jnp.asarray(ev)


def _event_weights(events, count, num_bins):
    e = events.shape[0]
    valid = jnp.arange(e) < count
    t = events[:, 2]
    p = jnp.where(events[:, 3] == 0, -1.0, events[:, 3])
    first = t[0]
    last = t[jnp.maximum(count - 1, 0)]
    delta_t = jnp.where(last - first == 0, 1.0, last - first)
    ts = (num_bins - 1) * (t - first) / delta_t
    tis = jnp.floor(ts)
    dts = ts - tis
    tis_i = tis.astype(jnp.int32)
    left_ok = valid & (tis >= 0) & (tis < num_bins)
    right_ok = valid & (tis >= 0) & (tis + 1 < num_bins)
    w_left = jnp.where(left_ok, p * (1.0 - dts), 0.0)
    w_right = jnp.where(right_ok, p * dts, 0.0)
    bins = jnp.arange(num_bins)
    wb = (
        w_left[:, None] * (tis_i[:, None] == bins)
        + w_right[:, None] * (tis_i[:, None] + 1 == bins)
    )
    return wb  # (E, NB) f32


def dense_voxel_a(events, count, num_bins, height, width):
    """Per-bin matmuls: out_b = (Y * wb_b)^T @ X."""
    x = events[:, 0].astype(jnp.int32)
    y = events[:, 1].astype(jnp.int32)
    wb = _event_weights(events, count, num_bins)
    yoh = (y[:, None] == jnp.arange(height)).astype(jnp.float32)
    xoh = (x[:, None] == jnp.arange(width)).astype(jnp.float32)
    outs = []
    for b in range(num_bins):
        outs.append(jax.lax.dot_general(
            yoh * wb[:, b:b + 1], xoh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    return jnp.stack(outs, axis=-1)  # (H, W, NB)


def dense_voxel_b(events, count, num_bins, height, width):
    """One matmul: Y^T @ (X (x) Wb)."""
    x = events[:, 0].astype(jnp.int32)
    y = events[:, 1].astype(jnp.int32)
    wb = _event_weights(events, count, num_bins)
    yoh = (y[:, None] == jnp.arange(height)).astype(jnp.float32)
    xoh = (x[:, None] == jnp.arange(width)).astype(jnp.float32)
    xw = (xoh[:, :, None] * wb[:, None, :]).reshape(events.shape[0], -1)
    out = jax.lax.dot_general(
        yoh, xw, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(height, width, num_bins)


def batched(fn, chunk):
    single = functools.partial(fn, num_bins=NB, height=H, width=W)

    @jax.jit
    def run(ev, counts):
        evc = ev.reshape(B // chunk, chunk, E, 4)
        cc = counts.reshape(B // chunk, chunk)
        return jax.lax.map(
            lambda args: jax.vmap(single)(args[0], args[1]), (evc, cc)
        ).reshape(B, H, W, NB)

    return run


def bench(fn, tag, counts):
    # value-fetch sync: block_until_ready under-synchronizes on the relay
    float(jnp.sum(fn(make(0), counts)))
    inputs = [make(i) for i in range(1, 7)]
    t0 = time.perf_counter()
    acc = 0.0
    for ev in inputs:
        acc = acc + jnp.sum(fn(ev, counts))
    float(acc)
    dt = (time.perf_counter() - t0) / len(inputs)
    print(f"{tag}: {dt*1e3:7.2f} ms/batch ({B/dt:7.0f} samples/s, "
          f"{B*E*16/1e9/dt:6.1f} GB/s events)")


if __name__ == "__main__":
    counts = jnp.full((B,), E, jnp.int32)
    ev0 = make(0)
    # the EXPLICIT scatter formulation: the dispatching batch entry point
    # now routes to the MXU kernel on TPU, which would make this baseline
    # compare the MXU kernel against itself
    ref = jax.jit(jax.vmap(functools.partial(
        events_to_voxel_grid, num_bins=NB, height=H, width=W)))
    want = ref(ev0, counts)
    for chunk in (4, 8):
        got = batched(dense_voxel_a, chunk)(ev0, counts)
        err = float(jnp.abs(got - want).max())
        print(f"dense A chunk{chunk} max err vs scatter: {err:.2e}")
    got = batched(dense_voxel_b, 4)(ev0, counts)
    print(f"dense B chunk4 max err vs scatter: "
          f"{float(jnp.abs(got - want).max()):.2e}")

    bench(ref, "scatter         ", counts)
    for chunk in (4, 8, 16):
        bench(batched(dense_voxel_a, chunk), f"dense A chunk{chunk:<3d}", counts)
    for chunk in (2, 4):
        bench(batched(dense_voxel_b, chunk), f"dense B chunk{chunk:<3d}", counts)


# --------------------------------------------------------------------------
# Pallas MXU voxelizer: one-hot tiles built in VMEM, per-bin matmuls.
# --------------------------------------------------------------------------

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 512


def _mxu_kernel(y_ref, x_ref, hi_ref, lo_ref, out_ref, *, num_bins,
                height, width):
    @pl.when(pl.program_id(1) == 0)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    y = y_ref[0]            # (CHUNK, 1) i32
    x = x_ref[0]            # (CHUNK, 1) i32
    yoh = (y == jax.lax.broadcasted_iota(jnp.int32, (1, height), 1)
           ).astype(jnp.bfloat16)                      # (CHUNK, H)
    xoh = (x == jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
           ).astype(jnp.bfloat16)                      # (CHUNK, W)
    hi = hi_ref[0]          # (CHUNK, NB) bf16
    lo = lo_ref[0]
    for b in range(num_bins):
        xw_hi = xoh * hi[:, b:b + 1]
        xw_lo = xoh * lo[:, b:b + 1]
        acc = jax.lax.dot_general(
            yoh, xw_hi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            yoh, xw_lo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, b] += acc


def voxelize_batch_mxu(events, counts, *, num_bins, height, width):
    b, e = events.shape[:2]
    x = events[..., 0].astype(jnp.int32)
    y = events[..., 1].astype(jnp.int32)
    t = events[..., 2]
    p = jnp.where(events[..., 3] == 0, -1.0, events[..., 3])

    valid = jnp.arange(e)[None] < counts[:, None]
    first = t[:, 0]
    last = jnp.take_along_axis(
        t, jnp.maximum(counts - 1, 0)[:, None], axis=1
    )[:, 0]
    delta_t = jnp.where(last - first == 0, 1.0, last - first)
    ts = (num_bins - 1) * (t - first[:, None]) / delta_t[:, None]
    tis = jnp.floor(ts)
    dts = ts - tis
    tis_i = tis.astype(jnp.int32)
    left_ok = valid & (tis >= 0) & (tis < num_bins)
    right_ok = valid & (tis >= 0) & (tis + 1 < num_bins)
    w_left = jnp.where(left_ok, p * (1.0 - dts), 0.0)
    w_right = jnp.where(right_ok, p * dts, 0.0)
    bins = jnp.arange(num_bins)
    wb = (
        w_left[..., None] * (tis_i[..., None] == bins)
        + w_right[..., None] * (tis_i[..., None] + 1 == bins)
    )  # (B, E, NB) f32
    hi = wb.astype(jnp.bfloat16)
    lo = (wb - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    pad = (-e) % CHUNK
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-1)
        y = jnp.pad(y, ((0, 0), (0, pad)), constant_values=-1)
        hi = jnp.pad(hi, ((0, 0), (0, pad), (0, 0)))
        lo = jnp.pad(lo, ((0, 0), (0, pad), (0, 0)))
    e_pad = e + pad

    out = pl.pallas_call(
        functools.partial(
            _mxu_kernel, num_bins=num_bins, height=height, width=width
        ),
        grid=(b, e_pad // CHUNK),
        in_specs=[
            pl.BlockSpec((1, CHUNK, 1), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, CHUNK, 1), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, CHUNK, num_bins), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, CHUNK, num_bins), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, num_bins, height, width), lambda i, j: (i, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, num_bins, height, width), jnp.float32
        ),
        interpret=jax.default_backend() != "tpu",
        compiler_params=None if jax.default_backend() != "tpu"
        else pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
    )(y[..., None], x[..., None], hi, lo)
    return jnp.transpose(out, (0, 2, 3, 1))  # (B, H, W, NB)


def _bench_mxu():
    counts = jnp.full((B,), E, jnp.int32)
    f = jax.jit(lambda ev, c: voxelize_batch_mxu(
        ev, c, num_bins=NB, height=H, width=W))
    # the EXPLICIT scatter formulation: the dispatching batch entry point
    # now routes to the MXU kernel on TPU, which would make this baseline
    # compare the MXU kernel against itself
    ref = jax.jit(jax.vmap(functools.partial(
        events_to_voxel_grid, num_bins=NB, height=H, width=W)))
    ev0 = make(0)
    got = f(ev0, counts)
    want = ref(ev0, counts)
    print(f"pallas MXU max err vs scatter: "
          f"{float(jnp.abs(got - want).max()):.2e}")
    bench(f, "pallas MXU      ", counts)


if __name__ == "__main__" and "mxu" in sys.argv:
    _bench_mxu()


# v2: transposed row one-hot (H, CHUNK) so every matmul is a standard
# (M, K) @ (K, N) with no in-kernel transposes; bigger K chunk.

def _mxu_kernel_v2(yt_ref, x_ref, hi_ref, lo_ref, out_ref, *, num_bins,
                   height, width, chunk):
    @pl.when(pl.program_id(1) == 0)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    yt = yt_ref[0]          # (1, CHUNK) i32
    x = x_ref[0]            # (CHUNK, 1) i32
    yohT = (jax.lax.broadcasted_iota(jnp.int32, (height, 1), 0) == yt
            ).astype(jnp.bfloat16)                     # (H, CHUNK)
    xoh = (x == jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
           ).astype(jnp.bfloat16)                      # (CHUNK, W)
    hi = hi_ref[0]
    lo = lo_ref[0]
    for b in range(num_bins):
        xw_hi = xoh * hi[:, b:b + 1]
        xw_lo = xoh * lo[:, b:b + 1]
        acc = jax.lax.dot_general(
            yohT, xw_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            yohT, xw_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, b] += acc


def voxelize_batch_mxu_v2(events, counts, *, num_bins, height, width,
                          chunk=1024):
    b, e = events.shape[:2]
    x = events[..., 0].astype(jnp.int32)
    y = events[..., 1].astype(jnp.int32)
    t = events[..., 2]
    p = jnp.where(events[..., 3] == 0, -1.0, events[..., 3])

    valid = jnp.arange(e)[None] < counts[:, None]
    first = t[:, 0]
    last = jnp.take_along_axis(
        t, jnp.maximum(counts - 1, 0)[:, None], axis=1
    )[:, 0]
    delta_t = jnp.where(last - first == 0, 1.0, last - first)
    ts = (num_bins - 1) * (t - first[:, None]) / delta_t[:, None]
    tis = jnp.floor(ts)
    dts = ts - tis
    tis_i = tis.astype(jnp.int32)
    left_ok = valid & (tis >= 0) & (tis < num_bins)
    right_ok = valid & (tis >= 0) & (tis + 1 < num_bins)
    w_left = jnp.where(left_ok, p * (1.0 - dts), 0.0)
    w_right = jnp.where(right_ok, p * dts, 0.0)
    bins = jnp.arange(num_bins)
    wb = (
        w_left[..., None] * (tis_i[..., None] == bins)
        + w_right[..., None] * (tis_i[..., None] + 1 == bins)
    )
    hi = wb.astype(jnp.bfloat16)
    lo = (wb - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    pad = (-e) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-1)
        y = jnp.pad(y, ((0, 0), (0, pad)), constant_values=-1)
        hi = jnp.pad(hi, ((0, 0), (0, pad), (0, 0)))
        lo = jnp.pad(lo, ((0, 0), (0, pad), (0, 0)))
    e_pad = e + pad

    out = pl.pallas_call(
        functools.partial(
            _mxu_kernel_v2, num_bins=num_bins, height=height, width=width,
            chunk=chunk,
        ),
        grid=(b, e_pad // chunk),
        in_specs=[
            pl.BlockSpec((1, 1, chunk), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, chunk, 1), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, chunk, num_bins), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, chunk, num_bins), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, num_bins, height, width), lambda i, j: (i, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, num_bins, height, width), jnp.float32
        ),
        interpret=jax.default_backend() != "tpu",
        compiler_params=None if jax.default_backend() != "tpu"
        else pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(y[:, None, :], x[..., None], hi, lo)
    return jnp.transpose(out, (0, 2, 3, 1))


def _bench_mxu_v2():
    counts = jnp.full((B,), E, jnp.int32)
    # the EXPLICIT scatter formulation: the dispatching batch entry point
    # now routes to the MXU kernel on TPU, which would make this baseline
    # compare the MXU kernel against itself
    ref = jax.jit(jax.vmap(functools.partial(
        events_to_voxel_grid, num_bins=NB, height=H, width=W)))
    want = ref(make(0), counts)
    for chunk in (512, 1024, 2048):
        f = jax.jit(functools.partial(
            voxelize_batch_mxu_v2, num_bins=NB, height=H, width=W,
            chunk=chunk))
        got = f(make(0), counts)
        err = float(jnp.abs(got - want).max())
        bench(f, f"pallas v2 K{chunk:<5d}", counts)
        print(f"  (err {err:.2e})")


if __name__ == "__main__" and "mxu2" in sys.argv:
    _bench_mxu_v2()
