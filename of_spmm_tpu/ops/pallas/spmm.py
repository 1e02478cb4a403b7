"""Pallas TPU kernel: row-binned, load-balanced CSR/ELL SpMM.

Computes Y = A @ X for A in the BinnedEll layout (see
of_spmm_tpu/sparse/binned.py) and dense X (n_cols, d). Per bucket of width
K, a grid step owns an 8-row ELL tile; the kernel

1. reads the tile's column indices from SMEM,
2. gathers the referenced rows of X (HBM-resident) into a VMEM staging
   buffer with waves of asynchronous row DMAs, software-pipelined two waves
   deep so DMA issue overlaps DMA completion,
3. contracts the (8, K, d) gathered block against the tile's values on the
   VPU with fp32 accumulation, writing an (8, d) partial-result tile.

Partial results are scatter-added into output rows outside the kernel
(split rows from power-law binning can map several ELL rows to one output
row). The gather-then-reduce structure is the TPU-native replacement for
the reference's per-edge atomicAdd scatter
(oneflow/user/kernels/unsorted_segment_sum_kernel_util.cu:52-71) — TPUs
have no atomics, so reduction locality is created at plan time by binning
instead of at run time by hardware.

Roofline: traffic is dominated by the nnz row gathers (nnz * d * 4 bytes),
so efficiency == sustained fraction of HBM bandwidth on ~d*4-byte random
reads. The per-row DMA wave structure mirrors the reference's ragged
id-shuffle gather precedent (oneflow/user/kernels/data_shuffle_kernel.cu).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from of_spmm_tpu.sparse.binned import BinnedEll, EllBucket
from of_spmm_tpu.utils.config import FLAGS, pallas_interpret_default

TILE_ROWS = 8  # f32 sublane count; ELL row tiles per grid step
_LANES = 128


def _bucket_kernel(cols_ref, vals_ref, x_ref, out_ref, gath_ref, sem_ref, *,
                   TR, K, D, W, NSEM):
    """One grid step: gather TR*K rows of X, contract, emit a (TR, D) tile.

    Row DMAs run in waves of W, software-pipelined: wave w+1 is issued
    before wave w is waited, keeping 2 waves (2W copies) in flight — on the
    attached v5 chip this sustains ~346 Mrows/s where issue-all-then-wait-
    all measured 73 (queue thrash) [tools/microbench_gather2.py dma_deep].
    Waves cycle NSEM semaphores; a semaphore is reused only after its
    previous wave fully drained (wait happens one wave behind issue).
    """
    T = TR * K  # row-gathers this tile

    def dma(g, sem_slot):
        c = cols_ref[g // K, g % K]
        return pltpu.make_async_copy(x_ref.at[c], gath_ref.at[g],
                                     sem_ref.at[sem_slot])

    def wave_bounds(w):
        return w * W, min((w + 1) * W, T)

    NW = pl.cdiv(T, W)

    def issue(w):
        lo, hi = wave_bounds(w)
        for g in range(lo, hi):  # static unroll
            dma(g, w % NSEM).start()

    def wait(w):
        lo, hi = wave_bounds(w)
        for g in range(lo, hi):
            dma(g, w % NSEM).wait()

    issue(0)
    for w in range(NW):  # static pipelined unroll
        if w + 1 < NW:
            issue(w + 1)
        wait(w)

    gath = gath_ref[:].reshape(TR, K, D)
    out_ref[:] = jnp.sum(vals_ref[:][:, :, None] * gath, axis=1)


def _pad_features(x: jnp.ndarray):
    d = x.shape[1]
    pad = -d % _LANES
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x, d


def _tile_rows(K: int, target_slots: int = 1024) -> int:
    """ELL rows per grid step: ~target_slots row-gathers, multiple of 8."""
    return max(8, (target_slots // K) // 8 * 8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bucket_contrib(bucket: EllBucket, x: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """Partial results (R, d) for one bucket (padded feature dim)."""
    R, K = bucket.cols.shape
    D = x.shape[1]
    # interpret mode: tiny tiles/waves (the static DMA unroll would blow up
    # trace size; CPU interpret is for correctness, not throughput)
    TR = _tile_rows(K, target_slots=64 if interpret else 1024)
    T = TR * K
    W = min(8 if interpret else int(FLAGS.get("OFS_DMA_WAVE")), T)
    NSEM = min(int(FLAGS.get("OFS_DMA_NSEM")), pl.cdiv(T, W))

    kernel = functools.partial(_bucket_kernel, TR=TR, K=K, D=D, W=W, NSEM=NSEM)
    pad = -R % TR
    cols = bucket.cols
    vals = bucket.vals.astype(jnp.float32)
    if pad:
        cols = jnp.pad(cols, ((0, pad), (0, 0)))
        vals = jnp.pad(vals, ((0, pad), (0, 0)))
    grid = ((R + pad) // TR,)

    contrib = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR, K), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TR, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TR, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R + pad, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((T, D), jnp.float32),
            pltpu.SemaphoreType.DMA((NSEM,)),
        ],
        interpret=interpret,
    )(cols, vals, x.astype(jnp.float32))
    return contrib[:R] if pad else contrib


_GATHER_TILE = 1024  # rows per grid step; (TILE/128, 128) SMEM index block
# must keep TILE/128 a multiple of 8 (Mosaic sublane divisibility)


def _gather_kernel(idx_ref, tab_ref, out_ref, sem_ref, *, T, W, NSEM):
    """DMA out_ref[g] <- tab[idx[g]] for g in [0, T); pipelined waves of W
    (issue wave w+1 before waiting wave w — see _bucket_kernel)."""
    NW = pl.cdiv(T, W)

    def dma(g, sem_slot):
        c = idx_ref[g // _LANES, g % _LANES]
        return pltpu.make_async_copy(tab_ref.at[c], out_ref.at[g],
                                     sem_ref.at[sem_slot])

    def issue(w):
        for g in range(w * W, min((w + 1) * W, T)):
            dma(g, w % NSEM).start()

    def wait(w):
        for g in range(w * W, min((w + 1) * W, T)):
            dma(g, w % NSEM).wait()

    issue(0)
    for w in range(NW):
        if w + 1 < NW:
            issue(w + 1)
        wait(w)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_rows(table: jnp.ndarray, idx: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    T = 128 if interpret else _GATHER_TILE  # small trace under interpret
    M = idx.shape[0]
    pad = -M % T
    idxp = jnp.pad(idx, (0, pad)).reshape(-1, _LANES)
    grid = ((M + pad) // T,)
    D = table.shape[1]
    W = min(8 if interpret else int(FLAGS.get("OFS_DMA_WAVE")), T)
    NSEM = min(int(FLAGS.get("OFS_DMA_NSEM")), pl.cdiv(T, W))
    kernel = functools.partial(_gather_kernel, T=T, W=W, NSEM=NSEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T // _LANES, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((T, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M + pad, D), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
        interpret=interpret,
    )(idxp, table)
    return out[:M]


def gather_rows_pallas(
    table: jnp.ndarray, idx: jnp.ndarray, interpret: Optional[bool] = None
) -> jnp.ndarray:
    """out[i] = table[idx[i]] via per-row async DMA (row gather).

    Table-size independent (~340 Mrows/s on v5e at d=128) where XLA's
    take collapses to ~63 Mrows/s beyond ~131072-row tables — used for
    the tiered-spmm finish permutation and cold buckets, whose gathers
    read multi-megarow concatenations. Semantics match the reference
    gather minus the bounds-check zero-fill (plan-time indices are
    always in range; reference: oneflow/user/kernels/gather_kernel_util.cu).
    """
    if interpret is None:
        interpret = pallas_interpret_default()
    xp, d = _pad_features(table)
    return _gather_rows(xp, idx.astype(jnp.int32), interpret)[:, :d]


def spmm_pallas(
    binned: BinnedEll,
    x: jnp.ndarray,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Y = A @ X with the row-binned Pallas kernel.

    Matches the XLA oracle (of_spmm_tpu/ops/reference.py:spmm) within the
    reference tolerance rtol=1e-4 / atol=1e-5. Output dtype follows X;
    accumulation is fp32 (mirrors the reference's fp16->fp32 tmp-buffer
    accumulation, oneflow/user/kernels/unsorted_segment_sum_kernel.cpp:144-217).
    """
    from of_spmm_tpu.ops.reference import combine_contribs

    if interpret is None:
        interpret = pallas_interpret_default()
    xp, d = _pad_features(x)
    if not binned.buckets:
        return jnp.zeros((binned.n_rows, d), x.dtype)
    contribs = [_bucket_contrib(b, xp, interpret) for b in binned.buckets]
    out = combine_contribs(binned, contribs, jnp.float32)
    return out[:, :d].astype(x.dtype)
