"""Second-round gather microbenchmarks: kernel-design decision data.

Run: python tools/microbench_gather2.py [names...]
Names: vtake, onehot_small, onehot_pair, take_fused, dma_deep, xla_fused

Measures (all Mrows/s of d=128 fp32-equivalent rows):
  vtake        in-kernel jnp.take from VMEM tables of 2k..32k rows
  onehot_small one-hot MXU gather at C=128/256 (theory: rate ~ 1/C)
  onehot_pair  hi/lo bf16 pair: ONE one-hot, TWO matmuls (fp32-parity gather)
  take_fused   in-kernel take + val-multiply + width-K reduce (ELL inner loop)
  dma_deep     per-row HBM DMA with deeper outstanding windows (W=32/64)
  xla_fused    XLA-level take+mul+sum per ELL bucket (current impl's pattern)
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microbench_gather import (  # noqa: E402
    D,
    ROW_BYTES,
    _loop_make,
    bench_vmem_take,
    delta_time,
    log,
)


def bench_onehot_pair(C=128, T=1024 * 1024, TILE=1024):
    """fp32-parity gather: table split to (hi, lo) bf16 halves; ONE one-hot
    feeds TWO MXU matmuls; outputs summed in f32."""
    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.integers(0, C - 2, T).astype(np.int32).reshape(-1, 128))
    R = cols.shape[0]
    G = TILE // 128
    x = rng.random((C, D), np.float32).astype(np.float32)
    hi = x.astype(jnp.bfloat16)
    lo = (x - np.asarray(hi).astype(np.float32)).astype(jnp.bfloat16)

    def kernel(cols_ref, hi_ref, lo_ref, out_ref):
        idx = cols_ref[:].reshape(1, TILE)
        iota = jax.lax.broadcasted_iota(jnp.int32, (C, TILE), 0)
        onehot = (iota == idx).astype(jnp.bfloat16)
        dn = (((0,), (0,)), ((), ()))
        g_hi = jax.lax.dot_general(onehot, hi_ref[:], dn,
                                   preferred_element_type=jnp.float32)
        g_lo = jax.lax.dot_general(onehot, lo_ref[:], dn,
                                   preferred_element_type=jnp.float32)
        out_ref[:] = g_hi + g_lo

    f = pl.pallas_call(
        kernel,
        grid=(R // G,),
        in_specs=[
            pl.BlockSpec((G, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R // G * TILE, D), jnp.float32),
    )
    try:
        t = delta_time(_loop_make(f), cols, jnp.asarray(hi), jnp.asarray(lo), k2=4)
    except Exception as e:  # noqa: BLE001
        log(f"[onehot pair] C={C} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return 0.0
    mrows = T / t / 1e6
    log(f"[onehot pair] C={C} TILE={TILE}: {mrows:6.0f} Mrows/s "
        f"= {mrows * ROW_BYTES / 1e3:5.1f} GB/s (fp32-parity)")
    return mrows


def bench_take_fused(C=16384, T=1024 * 1024, K=8, TILE_ROWS=512):
    """ELL inner loop: take (TILE_ROWS*K rows) from VMEM table, multiply by
    vals, reduce width K. The full VMEM phase of a staged-expansion SpMM."""
    rng = np.random.default_rng(0)
    n_rows = T // K
    cols = jnp.asarray(rng.integers(0, C - 2, (n_rows, K)).astype(np.int32))
    vals = jnp.asarray(rng.random((n_rows, K), np.float32))
    tier = jnp.asarray(rng.random((C, D), np.float32))
    R = n_rows // TILE_ROWS

    def kernel(cols_ref, vals_ref, tier_ref, out_ref):
        idx = cols_ref[:].reshape(-1)  # (TILE_ROWS*K,)
        g = jnp.take(tier_ref[:], idx, axis=0)  # (TILE_ROWS*K, D)
        g = g.reshape(TILE_ROWS, K, D) * vals_ref[:][:, :, None]
        out_ref[:] = g.sum(axis=1)

    f = pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((TILE_ROWS, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_ROWS, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, D), jnp.float32),
    )
    try:
        t = delta_time(_loop_make(f), cols, vals, tier, k2=4)
    except Exception as e:  # noqa: BLE001
        log(f"[take fused] C={C} K={K} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return 0.0
    mrows = T / t / 1e6
    log(f"[take fused] C={C} K={K}: {mrows:6.0f} Mrows/s "
        f"= {mrows * ROW_BYTES / 1e3:5.1f} GB/s (VMEM take+mul+reduce)")
    return mrows


def bench_dma_deep(table_rows=2 * 1024 * 1024, T=256 * 1024, W=32, NSEM=4):
    """Per-row HBM DMA, software-pipelined: issue wave w+1 while waiting
    wave w (the original bench issued ALL then waited ALL — queue thrash
    at deep W). 128 rows per grid step as in the production kernel."""
    rng = np.random.default_rng(0)
    TILE = 1024
    cols = jnp.asarray(
        rng.integers(0, table_rows - 2, T).astype(np.int32).reshape(-1, 128))
    table = jnp.asarray(rng.random((table_rows, D), np.float32))
    NW = TILE // W

    def kernel(cols_ref, x_ref, out_ref, gath_ref, sem_ref):
        def dma_real(g):
            c = cols_ref[g // 128, g % 128]
            return pltpu.make_async_copy(
                x_ref.at[c], gath_ref.at[g], sem_ref.at[(g // W) % NSEM])

        def issue_wave(w):
            for j in range(W):
                dma_real(w * W + j).start()

        def wait_wave(w):
            for j in range(W):
                dma_real(w * W + j).wait()

        issue_wave(0)
        for w in range(NW):  # static unroll: pipelined issue/wait
            if w + 1 < NW:
                issue_wave(w + 1)
            wait_wave(w)
        out_ref[:] = gath_ref[:].reshape(8, TILE // 8, D).sum(axis=1)

    f = pl.pallas_call(
        kernel,
        grid=(T // TILE,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T // TILE * 8, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TILE, D), jnp.float32),
            pltpu.SemaphoreType.DMA((NSEM,)),
        ],
    )
    try:
        t = delta_time(_loop_make(f), cols, table, k2=4)
    except Exception as e:  # noqa: BLE001
        log(f"[dma deep] W={W} NSEM={NSEM} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return 0.0
    mrows = T / t / 1e6
    log(f"[dma deep] table={table_rows:,} W={W} NSEM={NSEM}: {mrows:6.0f} Mrows/s "
        f"= {mrows * ROW_BYTES / 1e3:5.1f} GB/s (HBM random)")
    return mrows


def bench_window_pair(TILE=512, CW=128, T=1024 * 1024, U=16384, dedup=4):
    """Windowed fp32-parity one-hot gather with DYNAMIC per-step base:
    sorted staged indices, base = step's min (SMEM scalar), table slice at
    pl.ds(base). The realistic inner loop of the staged-expansion SpMM."""
    rng = np.random.default_rng(0)
    # synthetic sorted indices with the target dedup factor
    reps = rng.poisson(dedup, U) + 1
    idx = np.repeat(np.arange(U, dtype=np.int32), reps)[:T]
    if idx.shape[0] < T:
        idx = np.pad(idx, (0, T - idx.shape[0]), constant_values=U - 1)
    nsteps = T // TILE
    bases = (idx.reshape(nsteps, TILE).min(axis=1) // 16 * 16).astype(np.int32)
    spill = (idx.reshape(nsteps, TILE) - bases[:, None] >= CW)
    if spill.mean() > 0.001:
        log(f"[window pair] TILE={TILE} CW={CW}: note {spill.mean():.1%} "
            "synthetic spill clamped (rate unaffected)")
    lidx = np.minimum(idx.reshape(nsteps, TILE) - bases[:, None], CW - 1)
    lidx = jnp.asarray(lidx.astype(np.int32))
    bases = jnp.asarray(bases.reshape(-1, 1))
    x = rng.random((U + CW, D), np.float32).astype(np.float32)
    hi = x.astype(jnp.bfloat16)
    lo = (x - np.asarray(hi).astype(np.float32)).astype(jnp.bfloat16)
    G = TILE // 128

    def kernel(base_ref, lidx_ref, hi_ref, lo_ref, out_ref):
        b = pl.multiple_of(base_ref[pl.program_id(0), 0], 16)
        iot = jax.lax.broadcasted_iota(jnp.int32, (CW, TILE), 0)
        onehot = (iot == lidx_ref[:].reshape(1, TILE)).astype(jnp.bfloat16)
        dn = (((0,), (0,)), ((), ()))
        g_hi = jax.lax.dot_general(onehot, hi_ref[pl.ds(b, CW), :], dn,
                                   preferred_element_type=jnp.float32)
        g_lo = jax.lax.dot_general(onehot, lo_ref[pl.ds(b, CW), :], dn,
                                   preferred_element_type=jnp.float32)
        out_ref[:] = g_hi + g_lo

    f = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (nsteps,1) array
            pl.BlockSpec((G, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, D), jnp.float32),
    )

    def make(k):
        @jax.jit
        def g(bases, lidx, hi, lo):
            def body(i, acc):
                return acc + f(bases, lidx + (i & 1) * 0, hi, lo)[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return g

    try:
        t = delta_time(make, bases, jnp.asarray(lidx.reshape(-1, 128)), hi, lo, k2=4)
    except Exception as e:  # noqa: BLE001
        log(f"[window pair] TILE={TILE} CW={CW} FAILED: "
            f"{type(e).__name__}: {str(e)[:250]}")
        return 0.0
    mrows = T / t / 1e6
    log(f"[window pair] TILE={TILE} CW={CW}: {mrows:6.0f} Mrows/s "
        f"= {mrows * ROW_BYTES / 1e3:5.1f} GB/s (fp32-parity, dyn base)")
    return mrows


def bench_twosided(TILE=512, CW=128, R=256, T=1024 * 1024, dedup=4):
    """Full VMEM inner pipeline: windowed pair gather + val-multiply +
    hi/lo one-hot SCATTER-reduce into an (R, D) accumulator. End-to-end
    Mrows/s of the staged-expansion SpMM's compute phase."""
    rng = np.random.default_rng(0)
    U = int(T // dedup) + CW
    reps = rng.poisson(dedup, U) + 1
    idx = np.repeat(np.arange(U, dtype=np.int32), reps)[:T]
    nsteps = T // TILE
    bases = (idx.reshape(nsteps, TILE).min(axis=1) // 16 * 16).astype(np.int32)
    lidx = np.minimum(idx.reshape(nsteps, TILE) - bases[:, None], CW - 1)
    rows = rng.integers(0, R, (nsteps, TILE)).astype(np.int32)
    vals = rng.random((nsteps, TILE), np.float32).astype(np.float32)
    x = rng.random((U + CW, D), np.float32).astype(np.float32)
    hi = x.astype(jnp.bfloat16)
    lo = (x - np.asarray(hi).astype(np.float32)).astype(jnp.bfloat16)
    G = TILE // 128

    def kernel(base_ref, lidx_ref, rows_ref, vals_ref, hi_ref, lo_ref,
               out_ref, acc_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        b = pl.multiple_of(base_ref[step, 0], 16)
        iot = jax.lax.broadcasted_iota(jnp.int32, (CW, TILE), 0)
        onehot = (iot == lidx_ref[:].reshape(1, TILE)).astype(jnp.bfloat16)
        dn = (((0,), (0,)), ((), ()))
        g_hi = jax.lax.dot_general(onehot, hi_ref[pl.ds(b, CW), :], dn,
                                   preferred_element_type=jnp.float32)
        g_lo = jax.lax.dot_general(onehot, lo_ref[pl.ds(b, CW), :], dn,
                                   preferred_element_type=jnp.float32)
        contrib = (g_hi + g_lo) * vals_ref[:].reshape(TILE, 1)  # (TILE, D)
        c_hi = contrib.astype(jnp.bfloat16)
        c_lo = (contrib - c_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        riot = jax.lax.broadcasted_iota(jnp.int32, (R, TILE), 0)
        rowoh = (riot == rows_ref[:].reshape(1, TILE)).astype(jnp.bfloat16)
        dn2 = (((1,), (0,)), ((), ()))
        s_hi = jax.lax.dot_general(rowoh, c_hi, dn2,
                                   preferred_element_type=jnp.float32)
        s_lo = jax.lax.dot_general(rowoh, c_lo, dn2,
                                   preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] + s_hi + s_lo

        @pl.when(step == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc_ref[:]

    f = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (nsteps,1) array
            pl.BlockSpec((G, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, D), jnp.float32)],
    )

    def make(k):
        @jax.jit
        def g(bases, lidx, rows, vals, hi, lo):
            def body(i, acc):
                return acc + f(bases, lidx, rows, vals + i * 0.0, hi, lo)[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return g

    try:
        t = delta_time(
            make, jnp.asarray(bases.reshape(-1, 1)),
            jnp.asarray(lidx.reshape(-1, 128)),
            jnp.asarray(rows.reshape(-1, 128)),
            jnp.asarray(vals.reshape(-1, 128)), hi, lo, k2=4)
    except Exception as e:  # noqa: BLE001
        log(f"[twosided] TILE={TILE} CW={CW} R={R} FAILED: "
            f"{type(e).__name__}: {str(e)[:250]}")
        return 0.0
    mrows = T / t / 1e6
    log(f"[twosided] TILE={TILE} CW={CW} R={R}: {mrows:6.0f} Mrows/s "
        f"= {mrows * ROW_BYTES / 1e3:5.1f} GB/s (gather+scale+scatter)")
    return mrows


def bench_xla_fused(C=32768, T=4 * 1024 * 1024, K=8):
    """XLA-level ELL bucket contrib: take + mul + reduce (no pallas)."""
    import time

    rng = np.random.default_rng(0)
    n_rows = T // K
    cols = jnp.asarray(rng.integers(0, C - 2, (n_rows, K)).astype(np.int32))
    vals = jnp.asarray(rng.random((n_rows, K), np.float32))
    tier = jnp.asarray(rng.random((C, D), np.float32))

    def make(k):
        @jax.jit
        def f(cols, vals, tier):
            def body(i, acc):
                g = jnp.take(tier, (cols + (i & 1)).reshape(-1), axis=0)
                y = (g.reshape(n_rows, K, D) * vals[:, :, None]).sum(axis=1)
                return acc + y[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return f

    t = delta_time(make, cols, vals, tier, k2=4)
    mrows = T / t / 1e6
    log(f"[xla fused] C={C:,} K={K}: {mrows:6.0f} Mrows/s "
        f"= {mrows * ROW_BYTES / 1e3:5.1f} GB/s (take+mul+sum)")
    return mrows


if __name__ == "__main__":
    which = sys.argv[1:] or [
        "vtake", "onehot_small", "onehot_pair", "take_fused", "dma_deep",
        "xla_fused",
    ]
    if "vtake" in which:
        for C in (2048, 8192, 16384, 32768):
            bench_vmem_take(C=C)
    if "onehot_small" in which:
        from microbench_gather import bench_onehot_mxu
        for C in (128, 256):
            bench_onehot_mxu(C=C, dtype=jnp.bfloat16)
    if "onehot_pair" in which:
        for C in (128, 256):
            bench_onehot_pair(C=C)
    if "take_fused" in which:
        for C in (8192, 16384, 32768):
            bench_take_fused(C=C)
    if "dma_deep" in which:
        for w, ns in ((16, 1), (32, 4), (64, 8), (128, 16)):
            bench_dma_deep(W=w, NSEM=ns)
    if "window" in which:
        for tile, cw in ((1024, 128), (1024, 256), (2048, 256), (2048, 512)):
            bench_window_pair(TILE=tile, CW=cw)
    if "twosided" in which:
        for tile, cw, r in ((1024, 256, 256), (1024, 256, 512),
                            (1024, 256, 1024), (2048, 512, 512)):
            bench_twosided(TILE=tile, CW=cw, R=r)
    if "xla_fused" in which:
        for C in (8192, 32768, 131072):
            bench_xla_fused(C=C)
    log("done")
