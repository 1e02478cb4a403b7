"""Microbenchmarks for SpMM gather strategy selection on the attached TPU.

Measures, with delta timing (tools run: python tools/microbench_gather.py):
  1. streaming HBM bandwidth (sequential copy) — the roofline anchor
  2. XLA row-gather rate vs table size (jnp.take, d=128 f32)
  3. Pallas VMEM-resident-tier gather loop (dynamic slice per row)
  4. Pallas VMEM gather via jnp.take inside the kernel (vector gather)
  5. Pallas per-row HBM DMA gather (the current spmm.py strategy)

Each prints Mrows/s and effective GB/s for d=128 fp32 rows (512 B/row).
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 128
ROW_BYTES = D * 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _force(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        _force(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _force(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def delta_time(make, *args, k1=1, k2=9, **kw):
    t1 = timeit(make(k1), *args, **kw)
    t2 = timeit(make(k2), *args, **kw)
    return max(t2 - t1, 1e-9) / (k2 - k1)


# 1. streaming copy bandwidth ------------------------------------------------

def bench_stream():
    n = 16 * 1024 * 1024  # 64 MB f32
    x = jnp.arange(n, dtype=jnp.float32)

    def make(k):
        @jax.jit
        def f(x):
            def body(i, v):
                return v * 1.000001 + 1.0
            return jax.lax.fori_loop(0, k, body, x)
        return f

    t = delta_time(make, x)
    gb = 2 * n * 4 / t / 1e9  # read + write
    log(f"[stream] {gb:.0f} GB/s (read+write of 256MB)")
    return gb


# 2. XLA take vs table size ---------------------------------------------------

def bench_xla_take(table_rows, n_idx=1024 * 1024, sort=False):
    rng = np.random.default_rng(0)
    idx = rng.integers(0, table_rows - 2, n_idx).astype(np.int32)
    if sort:
        idx = np.sort(idx)
    table = jnp.asarray(rng.random((table_rows, D), np.float32))
    idxd = jnp.asarray(idx)

    def make(k):
        @jax.jit
        def f(table, idx):
            # indices depend on the loop counter so XLA cannot hoist the
            # gather out of the loop (LICM would void the measurement)
            def body(i, acc):
                g = jnp.take(table, idx + (i & 1), axis=0)
                return acc + g[0, :]
            return jax.lax.fori_loop(0, k, body, jnp.zeros((D,), jnp.float32))
        return f

    t = delta_time(make, table, idxd)
    mrows = n_idx / t / 1e6
    log(f"[xla take] table={table_rows:>9,} sorted={sort} : "
        f"{mrows:6.0f} Mrows/s = {mrows * ROW_BYTES / 1e3:5.0f} GB/s")
    return mrows


# 3. Pallas VMEM-tier gather loop ---------------------------------------------

def bench_vmem_gather_loop(C=8192, T=4 * 1024 * 1024, unroll=8):
    """Tier (C, D) lives in VMEM; gather T rows with a dynamic-slice loop,
    multiply by vals, accumulate into 8 sublane accumulators."""
    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.integers(0, C - 2, T).astype(np.int32).reshape(8, T // 8))
    vals = jnp.asarray(rng.random((8, T // 8), np.float32))
    tier = jnp.asarray(rng.random((C, D), np.float32))

    def kernel(cols_ref, vals_ref, tier_ref, out_ref):
        K = cols_ref.shape[1]

        def body(k, acc):
            rows = [tier_ref[cols_ref[r, k], :] * vals_ref[r, k] for r in range(8)]
            return acc + jnp.stack(rows)

        out_ref[:] = jax.lax.fori_loop(0, K, body, jnp.zeros((8, D), jnp.float32))

    f = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, D), jnp.float32),
    )

    def make(k):
        @jax.jit
        def g(cols, vals, tier):
            def body(i, acc):
                return acc + f(cols + (i & 1), vals, tier)[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return g

    t = delta_time(make, cols, vals, tier, k2=4)
    mrows = T / t / 1e6
    log(f"[pallas vmem loop] C={C} : {mrows:6.0f} Mrows/s "
        f"= {mrows * ROW_BYTES / 1e3:5.0f} GB/s (VMEM-side)")
    return mrows


# 4. Pallas VMEM vector gather via take ---------------------------------------

def bench_vmem_take(C=8192, T=4 * 1024 * 1024):
    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.integers(0, C - 2, T).astype(np.int32).reshape(-1, 128))
    tier = jnp.asarray(rng.random((C, D), np.float32))
    R = cols.shape[0]
    TILE = 512

    def kernel(cols_ref, tier_ref, out_ref):
        idx = cols_ref[:]  # (TILE, 128)
        g = jnp.take(tier_ref[:], idx.reshape(-1), axis=0)
        out_ref[:] = g.reshape(TILE, 128, D).sum(axis=1)

    f = pl.pallas_call(
        kernel,
        grid=(R // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, D), jnp.float32),
    )

    def make(k):
        @jax.jit
        def g(cols, tier):
            def body(i, acc):
                return acc + f(cols + (i & 1), tier)[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return g

    try:
        t = delta_time(make, cols, tier, k2=4)
    except Exception as e:  # noqa: BLE001
        log(f"[pallas vmem take] FAILED: {type(e).__name__}: {str(e)[:300]}")
        return 0.0
    mrows = T / t / 1e6
    log(f"[pallas vmem take] C={C} : {mrows:6.0f} Mrows/s "
        f"= {mrows * ROW_BYTES / 1e3:5.0f} GB/s (VMEM-side)")
    return mrows


# 5. Pallas one-hot MXU gather -------------------------------------------------

def bench_onehot_mxu(C=512, T=4 * 1024 * 1024, TILE=2048):
    """Gather+reduce via MXU: onehot(cols) @ tier. Cost C*D MAC per row."""
    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.integers(0, C - 2, T).astype(np.int32).reshape(-1, 128))
    R = cols.shape[0]  # rows of 128 indices
    G = TILE // 128  # index rows consumed per grid step
    tier = jnp.asarray(rng.random((C, D), np.float32))

    def kernel(cols_ref, tier_ref, out_ref):
        idx = cols_ref[:].reshape(TILE, 1)  # (TILE, 1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, C), 1)
        onehot = (iota == idx).astype(jnp.float32)
        out_ref[:] = jnp.dot(onehot, tier_ref[:], preferred_element_type=jnp.float32)

    f = pl.pallas_call(
        kernel,
        grid=(R // G,),
        in_specs=[
            pl.BlockSpec((G, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R // G * TILE, D), jnp.float32),
    )

    def make(k):
        @jax.jit
        def g(cols, tier):
            def body(i, acc):
                return acc + f(cols + (i & 1), tier)[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return g

    try:
        t = delta_time(make, cols, tier, k2=4)
    except Exception as e:  # noqa: BLE001
        log(f"[pallas onehot mxu] FAILED: {type(e).__name__}: {str(e)[:300]}")
        return 0.0
    mrows = T / t / 1e6
    log(f"[pallas onehot mxu] C={C} : {mrows:6.0f} Mrows/s "
        f"= {mrows * ROW_BYTES / 1e3:5.0f} GB/s (virtual)")
    return mrows


def bench_onehot_mxu_bf16(C=512, T=4 * 1024 * 1024, TILE=2048):
    """Same one-hot MXU gather with a bf16 one-hot (exact: one-hot entries
    are 0/1 and vals multiply AFTER) against a bf16 tier -> fp32 acc."""
    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.integers(0, C - 2, T).astype(np.int32).reshape(-1, 128))
    R = cols.shape[0]
    G = TILE // 128
    tier = jnp.asarray(rng.random((C, D), np.float32).astype(jnp.bfloat16))

    def kernel(cols_ref, tier_ref, out_ref):
        idx = cols_ref[:].reshape(TILE, 1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, C), 1)
        onehot = (iota == idx).astype(jnp.bfloat16)
        out_ref[:] = jnp.dot(onehot, tier_ref[:], preferred_element_type=jnp.float32)

    f = pl.pallas_call(
        kernel,
        grid=(R // G,),
        in_specs=[
            pl.BlockSpec((G, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R // G * TILE, D), jnp.float32),
    )

    def make(k):
        @jax.jit
        def g(cols, tier):
            def body(i, acc):
                return acc + f(cols + (i & 1), tier)[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return g

    try:
        t = delta_time(make, cols, tier, k2=4)
    except Exception as e:  # noqa: BLE001
        log(f"[pallas onehot bf16] FAILED: {type(e).__name__}: {str(e)[:300]}")
        return 0.0
    mrows = T / t / 1e6
    log(f"[pallas onehot bf16] C={C} : {mrows:6.0f} Mrows/s "
        f"= {mrows * ROW_BYTES / 1e3:5.0f} GB/s (virtual)")
    return mrows


# 6. Pallas per-row HBM DMA (current kernel's strategy) ------------------------

def bench_row_dma(table_rows=2 * 1024 * 1024, T=1024 * 1024, W=16):
    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.integers(0, table_rows - 2, T).astype(np.int32).reshape(-1, 128))
    R = cols.shape[0]
    table = jnp.asarray(rng.random((table_rows, D), np.float32))

    def kernel(cols_ref, x_ref, out_ref, gath_ref, sem_ref):
        Tt = 128

        def dma(g):
            c = cols_ref[0, g]
            return pltpu.make_async_copy(x_ref.at[c], gath_ref.at[g], sem_ref)

        def issue(w, _):
            for j in range(W):
                dma(w * W + j).start()
            return 0

        def wait(w, _):
            for j in range(W):
                dma(w * W + j).wait()
            return 0

        jax.lax.fori_loop(0, Tt // W, issue, 0)
        jax.lax.fori_loop(0, Tt // W, wait, 0)
        out_ref[:] = gath_ref[:].reshape(8, 16, D).sum(axis=1)

    f = pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, 128), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R * 8, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((128, D), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    def make(k):
        @jax.jit
        def g(cols, table):
            def body(i, acc):
                return acc + f(cols + (i & 1), table)[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return g

    t = delta_time(make, cols, table, k2=4)
    mrows = T / t / 1e6
    log(f"[pallas row dma] table={table_rows:,} W={W} : {mrows:6.0f} Mrows/s "
        f"= {mrows * ROW_BYTES / 1e3:5.0f} GB/s (HBM random)")
    return mrows


if __name__ == "__main__":
    which = sys.argv[1:] or ["stream", "xla", "vmem", "take", "onehot", "dma"]
    if "stream" in which:
        bench_stream()
    if "xla" in which:
        for rows in (8192, 32768, 131072, 524288, 2 * 1024 * 1024):
            bench_xla_take(rows)
        bench_xla_take(2 * 1024 * 1024, sort=True)
    if "vmem" in which:
        bench_vmem_gather_loop(C=8192)
    if "take" in which:
        bench_vmem_take(C=8192)
    if "onehot" in which:
        bench_onehot_mxu(C=512)
        bench_onehot_mxu(C=2048)
        bench_onehot_mxu_bf16(C=512)
        bench_onehot_mxu_bf16(C=2048)
    if "dma" in which:
        bench_row_dma()
    log("done")
