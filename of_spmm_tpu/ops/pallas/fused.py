"""Fused SpMM kernel: in-kernel DMA staging + one-hot MXU compute.

Executes a sparse/fused.py FusedPlan, one pallas_call per segment. Per
grid step the kernel interprets the plan's control word:

1. DMA engines: issue this step's staging row copies (the NEXT tile's
   unique cold columns, X rows pulled straight from HBM into the
   double-buffered f32 staging scratch) and wait the previous step's —
   one step behind, on a parity-split semaphore ring, so every copy is
   waited before the grid ends and waits can only consume their own
   step's completions. Rows are f32 (single-row bf16 DMAs crash Mosaic);
2. first step of a tile: zero the output tile and split the staged f32
   rows into the packed [hi|lo] bf16 window buffer whose head holds the
   VMEM-resident hot table (copied once at segment start);
3. every compute step: G one-hot gathers (128 lanes selecting rows of one
   128-row window — exact selections, hi and lo side-by-side in one
   (128,256) matmul) fill the lane buffer; one packed scatter one-hot
   (R, T) @ (T, 256) accumulates into the tile. General (non-rank-1)
   values fold into the scatter one-hot (vh*(ghi+glo) + vl*ghi, the
   expansion-engine numerics); rank-1 values are folded into X and the
   output scale outside the kernel.

The DMA issue runs on the scalar core interleaved with MXU compute, so
staging (measured ~346 Mrows/s, tools/microbench_gather2.py) overlaps the
one-hot matmuls instead of round-tripping a staged table through HBM like
round 1's expansion engine.

Reference semantics: gather x segment-sum (oneflow/user/ops/
gather_op.cpp:51-82, unsorted_segment_sum_kernel_util.cu:52-151).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from of_spmm_tpu.sparse.fused import _L, FusedPlan, FusedSegment

_DN = (((1,), (0,)), ((), ()))
_W = 64      # DMA wave width
_NSEM = 16   # semaphore ring (split by step parity)


def _kernel(tile_of_ref, ctrl_ref, scols_ref, blk_ref, lidx_ref, lrow_ref,
            *rest, R, T, G, S_buf, H_blocks, DMAX, rank1, multihot,
            chunks, window, CQ, interpret):
    if rank1:
        vh_ref = vl_ref = None
        rest2 = rest
    else:
        vh_ref, vl_ref = rest[0], rest[1]
        rest2 = rest[2:]
    if chunks:
        hot_ref, table_ref, o_ref, hilo, sem = rest2
        stage = None
    else:
        hot_ref, xs_ref, o_ref, stage, hilo, sem = rest2

    i = pl.program_id(0)
    tile = ctrl_ref[0, 0, 0]
    first = ctrl_ref[0, 0, 1]
    base = ctrl_ref[0, 0, 2]       # parity-folded dst base (2-D stage)
    cnt = ctrl_ref[0, 0, 3]
    split_base = ctrl_ref[0, 0, 5]
    prev_cnt = ctrl_ref[0, 0, 6]
    prev_base = ctrl_ref[0, 0, 7]
    split_rows = ctrl_ref[0, 0, 8]
    zero_out = ctrl_ref[0, 0, 9]
    do_comp = tile >= 0
    HALF = _NSEM // 2
    CW = DMAX // 8  # scols row width

    # ---- hot table: copy into the window head once per segment.
    # Staged lists are 128-padded by the plan, so one-hot windows never
    # read unwritten scratch rows (garbage/NaN x 0 is NaN on the MXU). ----
    if H_blocks:
        @pl.when(i == 0)
        def _():
            hilo[0:H_blocks * _L, :] = hot_ref[:]

    # ---- staging DMAs ----------------------------------------------------
    # The scalar core pays per DMA op, so all per-DMA math is minimized:
    # dst base carries the buffer parity (host-folded, one add per DMA),
    # semaphore slots are STATIC (step parity chosen by duplicating the
    # block under i%2 branches), and predication is per 64-wave (counts
    # are wave multiples by plan invariant).
    if chunks:
        # 128-row BLOCK copies from the tier-major staged table into the
        # double-buffered staged region of the window buffer — ~100x
        # fewer scalar DMA ops than per-row staging
        def chunk_block(slot_issue, slot_wait):
            # ALL waits for the previous step run BEFORE any new start:
            # semaphore slots are shared (k % HALF), and a counting
            # semaphore cannot tell whose completion it saw — with waits
            # first, the only pending copies on a slot are the previous
            # step's, so a returned wait guarantees the region compute is
            # about to read has landed.
            for k in range(DMAX):
                @pl.when(jnp.logical_and(i > 0, k < prev_cnt))
                def _(k=k):
                    # wait: shape-identical reconstruction; prev dst from
                    # the PREVIOUS step's chunk list is not readable here,
                    # so waits use a dst-shape proxy at block 0 of the
                    # other parity region — byte counts match (CQ, 256).
                    pltpu.make_async_copy(
                        table_ref.at[pl.ds(0, CQ), :],
                        hilo.at[pl.ds(H_blocks * _L, CQ), :],
                        sem.at[(k % HALF) + slot_wait]).wait()
            for k in range(DMAX):
                @pl.when(k < cnt)
                def _(k=k):
                    src = pl.multiple_of(scols_ref[0, 0, k] * CQ, CQ)
                    dst = pl.multiple_of(
                        H_blocks * _L + scols_ref[0, 1, k] * CQ, CQ)
                    pltpu.make_async_copy(
                        table_ref.at[pl.ds(src, CQ), :],
                        hilo.at[pl.ds(dst, CQ), :],
                        sem.at[(k % HALF) + slot_issue]).start()

        @pl.when(i % 2 == 0)
        def _():
            chunk_block(0, HALF)

        @pl.when(i % 2 == 1)
        def _():
            chunk_block(HALF, 0)
    else:
        def mkdma(g, pos_base, slot_off):
            c = scols_ref[0, g // CW, g % CW]
            return pltpu.make_async_copy(
                xs_ref.at[c], stage.at[pos_base + g],
                sem.at[(g % HALF) + slot_off])

        NW = DMAX // _W

        def dma_block(slot_issue, slot_wait):
            # waits first (see chunk_block): shared slots mean a wait can
            # only be trusted when no same-step start is pending on it
            for w in range(NW):
                @pl.when(jnp.logical_and(i > 0, w * _W < prev_cnt))
                def _(w=w):
                    # wait reconstructs a shape-identical copy (src
                    # identity is irrelevant; prev dst base is plan-given)
                    for j in range(_W):
                        mkdma(w * _W + j, prev_base, slot_wait).wait()
            for w in range(NW):
                @pl.when(w * _W < cnt)
                def _(w=w):
                    for j in range(_W):
                        mkdma(w * _W + j, base, slot_issue).start()

        @pl.when(i % 2 == 0)
        def _():
            dma_block(0, HALF)

        @pl.when(i % 2 == 1)
        def _():
            dma_block(HALF, 0)

    # ---- first step of a tile: zero output + split staged rows (in 2048-
    # row chunks gated on the tile's actual staged extent — small tiles
    # must not pay for the hub-sized buffer) ------------------------------
    @pl.when(jnp.logical_and(do_comp, zero_out == 1))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    if not chunks:
        SPLIT_CHUNK = min(2048, S_buf)

        @pl.when(jnp.logical_and(do_comp, first == 1))
        def _():
            for c0 in range(0, S_buf, SPLIT_CHUNK):
                @pl.when(c0 < split_rows)
                def _(c0=c0):
                    wbuf = stage[pl.ds(split_base + c0, SPLIT_CHUNK), :]
                    hi = wbuf.astype(jnp.bfloat16)
                    lo = (wbuf - hi.astype(jnp.float32)
                          ).astype(jnp.bfloat16)
                    hilo[pl.ds(H_blocks * _L + c0, SPLIT_CHUNK),
                         0:_L] = hi
                    hilo[pl.ds(H_blocks * _L + c0, SPLIT_CHUNK),
                         _L:2 * _L] = lo

    # ---- one-hot gather + scatter ----------------------------------------
    # Per-group FUSED chain: gather_g's (128, 256) panel feeds its own
    # scatter matmul immediately (no T-wide gbuf barrier), so group g+1's
    # gather overlaps group g's scatter on the MXU; the per-group partial
    # sums accumulate as one expression.
    @pl.when(do_comp)
    def _():
        # window mode: every lane in this step lands in ONE 128-row dst
        # window (ctrl[10]); the scatter one-hot shrinks (R, T) -> (128,
        # T) — a 4x MAC cut at R=512 — and the partial sum accumulates
        # into the window's slice of the tile output.
        RS = _L if window else R
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (RS, _L), 0)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (_L, _L), 1)

        def group_gather(g):
            """One lane group's gathered (128, 256) hi|lo panel."""
            blk = blk_ref[0, 0, g]
            if chunks:
                # cold windows live in the double-buffered staged region:
                # add the read-parity row offset (ctrl[5]); hot windows
                # (blk < H_blocks) stay at the head
                woff = pl.multiple_of(
                    blk * _L + jnp.where(blk >= H_blocks, split_base, 0),
                    _L)
                win = hilo[pl.ds(woff, _L), :]
            else:
                win = hilo[pl.ds(blk * _L, _L), :]
            if multihot:
                # (4 words, 128 lanes) bitmask -> ohT (128 window rows,
                # 128 lanes): row 32w+j selected for lane l iff bit j of
                # word w. The matmul is an exact selection-SUM (multiple
                # rows of one block folding into one lane).
                mw = lidx_ref[pl.ds(g, 1)].reshape(4, _L)  # (4, 128) int32
                # one repeat + shift + and on whole (128,128) tiles
                # (measured equal to the 4x(broadcast,shift,and)+concat
                # form on v5e — Mosaic fuses either — but simpler)
                rep = jnp.repeat(mw, 32, axis=0)
                sh = jax.lax.broadcasted_iota(
                    jnp.int32, (_L, _L), 0) % 32
                ohT = jnp.right_shift(rep, sh) & 1     # (128, 128)
                graw = jax.lax.dot_general(
                    ohT.astype(jnp.bfloat16), win,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                # selection-SUMS are not bf16-exact: recombine the hi/lo
                # halves in f32 and split again for the scatter matmul
                g_tot = graw[:, 0:_L] + graw[:, _L:2 * _L]
                g_hi = g_tot.astype(jnp.bfloat16)
                g_lo = (g_tot - g_hi.astype(jnp.float32)
                        ).astype(jnp.bfloat16)
                gath = jnp.concatenate([g_hi, g_lo], axis=1)
            else:
                lanes = lidx_ref[pl.ds(g, 1), :].reshape(_L, 1)
                oh = (lanes == col_iota).astype(jnp.bfloat16)
                gath = jax.lax.dot_general(
                    oh, win, _DN, preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16)
            return gath

        def group_scatter(g, gath):
            """Scatter one panel into the (RS, 256) partial sum."""
            roh = (
                row_iota == lrow_ref[pl.ds(g, 1), :].reshape(1, _L)
            ).astype(jnp.bfloat16)
            if rank1:
                s = jax.lax.dot_general(roh, gath, _DN,
                                        preferred_element_type=jnp.float32)
            else:
                rvh = roh * vh_ref[pl.ds(g, 1), :].reshape(1, _L)
                rvl = roh * vl_ref[pl.ds(g, 1), :].reshape(1, _L)
                s = jax.lax.dot_general(rvh, gath, _DN,
                                        preferred_element_type=jnp.float32)
                s2 = jax.lax.dot_general(rvl, gath[:, 0:_L], _DN,
                                         preferred_element_type=jnp.float32)
                # vl*ghi lands in the hi half; halves are summed below
                s = s + jnp.pad(s2, ((0, 0), (0, _L)))
            return s

        # PHASED schedule (measured -11% on the ranges engine): all G
        # gathers, then all G scatters — each group's gather->scatter is
        # a dependent small-matmul chain; phasing hands the scheduler G
        # independent matmuls back-to-back per phase. Even/odd
        # accumulator chains keep the VPU adds off the critical path.
        if G <= 16:
            gaths = [group_gather(g) for g in range(G)]
            acc0 = acc1 = None
            for g in range(G):
                s = group_scatter(g, gaths[g])
                if g % 2 == 0:
                    acc0 = s if acc0 is None else acc0 + s
                else:
                    acc1 = s if acc1 is None else acc1 + s
            acc = acc0 if acc1 is None else acc0 + acc1
        else:
            # big T: Mosaic compile time explodes on a G-wide unroll.
            # Roll the group loop with a 4-group phased body.
            GU = 4
            z = jnp.zeros((RS, 2 * _L), jnp.float32)

            def gbody(j, carry):
                a0, a1 = carry
                gaths = [group_gather(j * GU + u) for u in range(GU)]
                for u in range(GU):
                    s = group_scatter(j * GU + u, gaths[u])
                    if u % 2 == 0:
                        a0 = a0 + s
                    else:
                        a1 = a1 + s
                return a0, a1

            acc0, acc1 = jax.lax.fori_loop(0, G // GU, gbody, (z, z))
            acc = acc0 + acc1
        if window:
            off = pl.multiple_of(ctrl_ref[0, 0, 10] * _L, _L)
            o_ref[pl.ds(off, _L), :] = (
                o_ref[pl.ds(off, _L), :] + acc[:, :_L] + acc[:, _L:])
        else:
            o_ref[:] = o_ref[:] + acc[:, :_L] + acc[:, _L:]


def _stage_table(seg: FusedSegment, plan: FusedPlan,
                 xs: jnp.ndarray) -> jnp.ndarray:
    """Chunks-mode XLA staging phase: per-tier takes (the measured v5e
    fast path needs tables <= 32K rows) into the tier-major packed
    [hi|lo] bf16 table the kernel block-copies from.

    Segment serialization (so only ~one multi-GB staged table is ever
    live) happens in the caller via ``lax.optimization_barrier`` — the
    round-2 zero-valued-dep trick (``take + dep*0``) was algebraically
    simplified away by XLA, which then scheduled every segment's table
    concurrently and OOMed at ogbn-products scale (BENCH_r02 tail).
    The reference plans memory explicitly at compile time
    (oneflow/core/job/compiler.cpp:107 IntraJobMemSharingUtil); here the
    plan builder bounds per-segment table bytes (sparse/fused.py
    plan_memory_report) and the barrier pins the liveness order."""
    ptr = seg.stage_tier_ptr
    TS = plan.stage_tier
    take = seg.stage_take
    outs = []
    for t in range(len(ptr) - 1):
        if ptr[t + 1] == ptr[t]:
            continue
        idx = jax.lax.slice_in_dim(take, ptr[t], ptr[t + 1])
        lo_r = min(t * TS, xs.shape[0] - 1)
        hi_r = min((t + 1) * TS, xs.shape[0])
        xt = jax.lax.slice_in_dim(xs, lo_r, hi_r, axis=0)
        outs.append(jnp.take(xt, idx, axis=0, mode="clip"))
    if not outs:
        return jnp.zeros((_L, 256), jnp.bfloat16)
    g = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    # bitcast split: XLA folds the naive x - f32(bf16(x)) residual to
    # ZERO under --xla_allow_excess_precision (ops/pallas/expansion.py)
    from of_spmm_tpu.ops.pallas.expansion import split_hilo

    hi, lo = split_hilo(g)
    return jnp.concatenate([hi, lo], axis=1)


def _segment_call(seg: FusedSegment, plan: FusedPlan, hot_hilo, xs,
                  interpret: bool) -> jnp.ndarray:
    R, T = plan.R, plan.T
    G = T // _L
    H_blocks = plan.n_hot // _L
    DMAX = plan.DMAX
    rank1 = seg.val_hi is None
    chunks = plan.staging == "chunks"

    kernel = functools.partial(
        _kernel, R=R, T=T, G=G, S_buf=plan.S_buf, H_blocks=H_blocks,
        DMAX=DMAX, rank1=rank1, multihot=plan.multihot, chunks=chunks,
        window=plan.window, CQ=plan.cq, interpret=interpret)

    def smem(shape):
        return pl.BlockSpec(shape, lambda i, t: (i, 0, 0),
                            memory_space=pltpu.SMEM)

    def lanes():
        return pl.BlockSpec((G, _L), lambda i, t: (i, 0),
                            memory_space=pltpu.VMEM)

    lidx_spec = (
        pl.BlockSpec((G, 4, _L), lambda i, t: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        if plan.multihot else lanes()
    )
    in_specs = [
        smem((1, 1, 16)),                    # ctrl
        smem((1, 2, DMAX)) if chunks         # chunk (src, dst) block pairs
        else smem((1, 8, DMAX // 8)),        # scols (X rows to stage)
        smem((1, 1, G)),                     # blk
        lidx_spec,                           # lidx / multi-hot masks
        lanes(),                             # lrow
    ]
    args = [seg.ctrl, seg.scols, seg.blk, seg.lidx, seg.lrow]
    if not rank1:
        in_specs += [lanes(), lanes()]
        args += [seg.val_hi, seg.val_lo]
    in_specs += [
        pl.BlockSpec((max(H_blocks * _L, _L), 256), lambda i, t: (0, 0),
                     memory_space=pltpu.VMEM),   # hot table (packed hi|lo)
        pl.BlockSpec(memory_space=pl.ANY),        # staged table / xs (HBM)
    ]
    if chunks:
        args += [hot_hilo, _stage_table(seg, plan, xs)]
    else:
        args += [hot_hilo, xs]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,   # tile_of
        grid=(seg.n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, _L), lambda i, t: (t[i], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=(
            [pltpu.VMEM((H_blocks * _L + 2 * plan.S_buf, 256),
                        jnp.bfloat16),
             pltpu.SemaphoreType.DMA((_NSEM,))]
            if chunks else
            [pltpu.VMEM((2 * plan.S_buf, _L), jnp.float32),
             pltpu.VMEM((H_blocks * _L + plan.S_buf, 256), jnp.bfloat16),
             pltpu.SemaphoreType.DMA((_NSEM,))]
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((seg.n_tiles * R, _L), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=110 * 1024 * 1024),
    )(seg.tile_of, *args)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spmm_fused_jit(plan: FusedPlan, x: jnp.ndarray,
                    interpret: bool) -> jnp.ndarray:
    xs = x.astype(jnp.float32)
    if plan.col_scale is not None:
        xs = xs * plan.col_scale[:, None]
    H = plan.n_hot
    if H:
        from of_spmm_tpu.ops.pallas.expansion import split_hilo

        hot = jnp.take(xs, plan.hot_ids, axis=0)
        hi, lo = split_hilo(hot)
        hot_hilo = jnp.concatenate([hi, lo], axis=1)
    else:
        hot_hilo = jnp.zeros((_L, 256), jnp.bfloat16)
    outs = []
    for seg in plan.segments:
        out = _segment_call(seg, plan, hot_hilo, xs, interpret)
        outs.append(out)
        if plan.staging == "chunks" and len(plan.segments) > 1:
            # serialize segments: the NEXT segment's staged-table takes
            # read the barriered xs, so XLA cannot build table k+1 before
            # kernel k finishes — peak live staged bytes stays at ~one
            # segment (an opaque barrier, unlike the r2 dep*0 trick which
            # XLA folded away and then OOMed; see _stage_table docstring)
            xs, _ = jax.lax.optimization_barrier((xs, out[0, 0]))
    out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    out = out[: plan.shape[0]]
    if plan.row_scale is not None:
        out = out * plan.row_scale[:, None]
    return out


def spmm_fused(plan: FusedPlan, x: jnp.ndarray,
               interpret: Optional[bool] = None) -> jnp.ndarray:
    """Y = A @ X with the fused staging+compute engine.

    X columns beyond 128 run as additional 128-wide slabs (same plan,
    sliced X) — the plan is feature-width-independent.
    """
    from of_spmm_tpu.ops.pallas.spmm import _pad_features
    from of_spmm_tpu.utils.config import pallas_interpret_default

    if interpret is None:
        interpret = pallas_interpret_default()
    xp, d = _pad_features(x.astype(jnp.float32))
    slabs = []
    for s0 in range(0, xp.shape[1], _L):
        slabs.append(_spmm_fused_jit(plan, xp[:, s0:s0 + _L], interpret))
    out = jnp.concatenate(slabs, axis=1) if len(slabs) > 1 else slabs[0]
    return out[:, :d].astype(x.dtype)
