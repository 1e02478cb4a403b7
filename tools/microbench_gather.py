"""Microbenchmarks for SpMM gather strategy selection on the attached TPU.

Measures, with delta timing (tools run: python tools/microbench_gather.py):
  1. streaming HBM bandwidth (sequential copy) — the roofline anchor
  2. XLA row-gather rate vs table size (jnp.take, d=128 f32)
  3. Pallas VMEM-resident-tier gather (dynamic-slice loop per row)
  4. Pallas VMEM gather via jnp.take inside the kernel (vector gather)
  5. Pallas one-hot MXU gather (fp32 and bf16)
  6. Pallas unaligned (8,128) dynamic block slice rate
  7. Pallas per-row HBM DMA gather

Each prints Mrows/s and effective GB/s for d=128 fp32 rows (512 B/row).
"""

from __future__ import annotations

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


def _loop_make(f, *static):
    """make(k) closure: run f k times inside one jit, defeat LICM."""

    def make(k):
        @jax.jit
        def g(*args):
            def body(i, acc):
                return acc + f(*((args[0] + (i & 1),) + args[1:]))[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return g

    return make


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
    log(f"[stream] {gb:.0f} GB/s (read+write of 64MB)")
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
        def f(idx, table):
            def body(i, acc):
                g = jnp.take(table, idx + (i & 1), axis=0)
                return acc + g[0, :]
            return jax.lax.fori_loop(0, k, body, jnp.zeros((D,), jnp.float32))
        return f

    t = delta_time(make, idxd, table)
    mrows = n_idx / t / 1e6
    log(f"[xla take] table={table_rows:>9,} sorted={sort} : "
        f"{mrows:6.0f} Mrows/s = {mrows * ROW_BYTES / 1e3:5.1f} GB/s")
    return mrows


# 3. Pallas VMEM-tier dynamic-slice gather loop --------------------------------

def bench_vmem_loop(C=8192, T=1024 * 1024, K=128):
    """Tier (C, D) in VMEM; grid step owns an (8, K) SMEM index tile; gathers
    8*K rows with per-row dynamic slices, scalar-scales, accumulates."""
    rng = np.random.default_rng(0)
    R = T // (8 * K)  # grid steps
    cols = jnp.asarray(rng.integers(0, C - 2, (R * 8, K)).astype(np.int32))
    vals = jnp.asarray(rng.random((R * 8, K), np.float32))
    tier = jnp.asarray(rng.random((C, D), np.float32))

    def kernel(cols_ref, vals_ref, tier_ref, out_ref):
        def body(k, acc):
            rows = [
                tier_ref[cols_ref[r, k], :] * vals_ref[r, k] for r in range(8)
            ]
            return acc + jnp.stack(rows)

        out_ref[:] = jax.lax.fori_loop(
            0, K, body, jnp.zeros((8, D), jnp.float32)
        )

    f = pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((8, K), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, K), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R * 8, D), jnp.float32),
    )

    try:
        t = delta_time(_loop_make(f), cols, vals, tier, k2=4)
    except Exception as e:  # noqa: BLE001
        log(f"[pallas vmem loop] FAILED: {type(e).__name__}: {str(e)[:200]}")
        return 0.0
    mrows = T / t / 1e6
    log(f"[pallas vmem loop] C={C} K={K} : {mrows:6.0f} Mrows/s "
        f"= {mrows * ROW_BYTES / 1e3:5.1f} GB/s (VMEM-side)")
    return mrows


# 4. Pallas VMEM vector gather via take ---------------------------------------

def bench_vmem_take(C=8192, T=1024 * 1024, TILE=1024):
    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.integers(0, C - 2, T).astype(np.int32).reshape(-1, 128))
    tier = jnp.asarray(rng.random((C, D), np.float32))
    R = cols.shape[0]
    G = TILE // 128

    def kernel(cols_ref, tier_ref, out_ref):
        idx = cols_ref[:].reshape(-1)  # (TILE,)
        g = jnp.take(tier_ref[:], idx, axis=0)
        out_ref[:] = g

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

    try:
        t = delta_time(_loop_make(f), cols, tier, k2=4)
    except Exception as e:  # noqa: BLE001
        log(f"[pallas vmem take] FAILED: {type(e).__name__}: {str(e)[:200]}")
        return 0.0
    mrows = T / t / 1e6
    log(f"[pallas vmem take] C={C} : {mrows:6.0f} Mrows/s "
        f"= {mrows * ROW_BYTES / 1e3:5.1f} GB/s (VMEM-side)")
    return mrows


# 5. Pallas one-hot MXU gather -------------------------------------------------

def bench_onehot_mxu(C=512, T=1024 * 1024, TILE=1024, dtype=jnp.float32):
    """Gather via MXU: onehot(cols) @ tier. Cost C*D MAC per row."""
    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.integers(0, C - 2, T).astype(np.int32).reshape(-1, 128))
    R = cols.shape[0]
    G = TILE // 128
    tier = jnp.asarray(rng.random((C, D), np.float32).astype(dtype))

    def kernel(cols_ref, tier_ref, out_ref):
        # transposed one-hot: (C, TILE) with idx along lanes (no cross-lane
        # reshape), contracted on dim 0 against the tier (C, D)
        idx = cols_ref[:].reshape(1, TILE)
        iota = jax.lax.broadcasted_iota(jnp.int32, (C, TILE), 0)
        onehot = (iota == idx).astype(dtype)
        out_ref[:] = jax.lax.dot_general(
            onehot, tier_ref[:].astype(dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

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

    try:
        t = delta_time(_loop_make(f), cols, tier, k2=4)
    except Exception as e:  # noqa: BLE001
        log(f"[pallas onehot {dtype.__name__}] FAILED: {type(e).__name__}: {str(e)[:200]}")
        return 0.0
    mrows = T / t / 1e6
    log(f"[pallas onehot {dtype.__name__}] C={C} : {mrows:6.0f} Mrows/s "
        f"= {mrows * ROW_BYTES / 1e3:5.1f} GB/s (virtual)")
    return mrows


# 6. Pallas unaligned (8,128) dynamic block slice ------------------------------

def bench_block_slice(C=8192, T=1024 * 1024, K=128):
    """Gather (8, D) blocks at arbitrary (non-multiple-of-8) row offsets.
    Rate limit for block-gather designs: T/8 block loads."""
    rng = np.random.default_rng(0)
    NB = T // 8
    R = NB // (8 * K)  # grid steps, 8*K blocks each
    starts = jnp.asarray(rng.integers(0, C - 9, (R * 8, K)).astype(np.int32))
    tier = jnp.asarray(rng.random((C, D), np.float32))

    def kernel(st_ref, tier_ref, out_ref):
        def body(k, acc):
            for r in range(8):
                s = st_ref[r, k]
                acc = acc + tier_ref[pl.ds(s, 8), :]
            return acc

        out_ref[:] = jax.lax.fori_loop(
            0, K, body, jnp.zeros((8, D), jnp.float32)
        )

    f = pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((8, K), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R * 8, D), jnp.float32),
    )

    try:
        t = delta_time(_loop_make(f), starts, tier, k2=4)
    except Exception as e:  # noqa: BLE001
        log(f"[pallas block slice] FAILED: {type(e).__name__}: {str(e)[:200]}")
        return 0.0
    mrows = T / t / 1e6
    log(f"[pallas block slice] C={C} : {mrows:6.0f} Mrows(virt)/s "
        f"({mrows/8:6.0f} Mblocks/s) = {mrows * ROW_BYTES / 1e3:5.1f} GB/s")
    return mrows


# 7. Pallas per-row HBM DMA (current kernel's strategy) ------------------------

def bench_row_dma(table_rows=2 * 1024 * 1024, T=256 * 1024, W=16):
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

    try:
        t = delta_time(_loop_make(f), cols, table, k2=4)
    except Exception as e:  # noqa: BLE001
        log(f"[pallas row dma] FAILED: {type(e).__name__}: {str(e)[:200]}")
        return 0.0
    mrows = T / t / 1e6
    log(f"[pallas row dma] table={table_rows:,} W={W} : {mrows:6.0f} Mrows/s "
        f"= {mrows * ROW_BYTES / 1e3:5.1f} GB/s (HBM random)")
    return mrows


if __name__ == "__main__":
    which = sys.argv[1:] or ["stream", "xla", "vmem", "take", "onehot", "block", "dma"]
    if "stream" in which:
        bench_stream()
    if "xla" in which:
        for rows in (8192, 32768, 131072, 524288, 2 * 1024 * 1024):
            bench_xla_take(rows)
        bench_xla_take(2 * 1024 * 1024, sort=True)
    if "vmem" in which:
        for C in (8192, 16384):
            bench_vmem_loop(C=C)
    if "take" in which:
        for C in (2048, 8192, 16384):
            bench_vmem_take(C=C)
    if "onehot" in which:
        for C in (512, 1024, 2048):
            bench_onehot_mxu(C=C, dtype=jnp.float32)
            bench_onehot_mxu(C=C, dtype=jnp.bfloat16)
    if "block" in which:
        bench_block_slice()
    if "dma" in which:
        bench_row_dma()
    log("done")
