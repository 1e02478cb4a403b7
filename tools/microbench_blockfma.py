"""Microbench: block-covering SpMM inner loop variants.

Design: per nnz, load the unaligned (8,128) VMEM block starting at the
plan-chosen offset s (covering the needed X row), fma with a per-slot
(8,1) weight vector (val at the row's sublane, 0 elsewhere), accumulate
in 8-sublane space; sublane-reduce once per output row.

Variants:
  A. w as (8,1) static lane slices from a VMEM (8,K) tile
  B. w synthesized: scalar val from SMEM + (c&7) sublane mask
  C. pure block+add (upper bound, = microbench_gather block)
"""
from __future__ import annotations
import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 128

def log(*a): print(*a, file=sys.stderr, flush=True)

def _force(x): np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))

def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup): _force(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); _force(fn(*args)); ts.append(time.perf_counter() - t0)
    ts.sort(); return ts[len(ts)//2]

def delta_time(make, *args, k1=1, k2=4):
    return max(timeit(make(k2), *args) - timeit(make(k1), *args), 1e-9) / (k2 - k1)

def _loop_make(f):
    def make(k):
        @jax.jit
        def g(*args):
            def body(i, acc):
                return acc + f(*((args[0] + (i & 1),) + args[1:]))[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return g
    return make

def bench_A(C=8192, T=1024*1024, K=256):
    """T block-slots; grid step = 1 output row of K block slots."""
    rng = np.random.default_rng(0)
    R = T // K
    starts = jnp.asarray(rng.integers(0, C-9, (R*8, K//8)).astype(np.int32))  # (8,K/8) SMEM tile per step
    w = jnp.asarray(rng.random((R*8, K), np.float32))  # (8,K) VMEM tile per step

    def kernel(st_ref, w_ref, tier_ref, out_ref):
        acc = jnp.zeros((8, D), jnp.float32)
        for k in range(K):  # static unroll
            s = st_ref[k % 8, k // 8]
            B = tier_ref[pl.ds(s, 8), :]
            wk = w_ref[:, k][:, None]
            acc = acc + wk * B
        out_ref[:] = acc

    f = pl.pallas_call(
        kernel, grid=(R,),
        in_specs=[
            pl.BlockSpec((8, K//8), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R*8, D), jnp.float32),
    )
    tier = jnp.asarray(rng.random((C, D), np.float32))
    try:
        t = delta_time(_loop_make(f), starts, w, tier)
    except Exception as e:
        log(f"[blockfma A] FAILED: {type(e).__name__}: {str(e)[:200]}"); return 0.0
    m = T/t/1e6
    log(f"[blockfma A] C={C} K={K}: {m:6.0f} Mblocks/s")
    return m

def bench_B(C=8192, T=1024*1024, K=256):
    """val scalar from SMEM + sublane mask from (c&7)."""
    rng = np.random.default_rng(0)
    R = T // K
    starts = jnp.asarray(rng.integers(0, C-2, (R*8, K//8)).astype(np.int32))
    vals = jnp.asarray(rng.random((R*8, K//8), np.float32))

    def kernel(st_ref, v_ref, tier_ref, out_ref):
        acc = jnp.zeros((8, D), jnp.float32)
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, D), 0)
        for k in range(K):
            c = st_ref[k % 8, k // 8]
            s = c - (c % 8)  # hmm: want row c in block at s, sublane c-s
            B = tier_ref[pl.ds(s, 8), :]
            v = v_ref[k % 8, k // 8]
            acc = acc + jnp.where(sub == (c % 8), v, 0.0) * B
        out_ref[:] = acc

    f = pl.pallas_call(
        kernel, grid=(R,),
        in_specs=[
            pl.BlockSpec((8, K//8), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, K//8), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R*8, D), jnp.float32),
    )
    tier = jnp.asarray(rng.random((C, D), np.float32))
    try:
        t = delta_time(_loop_make(f), starts, vals, tier)
    except Exception as e:
        log(f"[blockfma B] FAILED: {type(e).__name__}: {str(e)[:200]}"); return 0.0
    m = T/t/1e6
    log(f"[blockfma B] C={C} K={K}: {m:6.0f} Mblocks/s")
    return m

if __name__ == "__main__":
    which = sys.argv[1:] or ["A", "B"]
    if "A" in which: bench_A()
    if "B" in which: bench_B()
    log("done")
