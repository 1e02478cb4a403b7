"""Range-staging SpMM kernel: block-DMA X ranges + multi-hot MXU compute.

Executes a sparse/ranges.py RangesPlan, one pallas_call per segment. Per
grid step the kernel interprets the plan's control word:

1. scattered staging: cq-row BLOCK DMAs copy this step's scattered
   chunks from the per-segment tier-major packed [hi|lo] take table
   (built by a small XLA phase over the scattered volume only) straight
   into the window's scattered region, one step behind on parity-split
   semaphore slots — the fused engine's chunks transport
   (ops/pallas/fused.py), ~10x the per-row DMA rate;
2. range staging: RQ-row BLOCK DMAs copy the NEXT range's contiguous X
   rows into the f32 range scratch (parity ping-pong across ranges) —
   the locality transport that replaces the round-2 staged-table gather
   for the clustered bulk of the matrix;
3. first step of a range: split the f32 range rows into the packed
   [hi|lo] bf16 window region (chunked);
4. first step of a tile's first piece: zero the output block;
5. every compute step: G multi-hot gathers over the unified window space
   [hot | range(parity) | scattered(parity)] + the packed scatter
   one-hot, exactly the fused engine's compute path.

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

from of_spmm_tpu.sparse.ranges import RangesPlan, RangesSegment, _L

_DN = (((1,), (0,)), ((), ()))
_NSEM = 16
_SC_HALF = 6   # scattered chunk semaphore slots per parity (0-5 / 6-11)
_RG_BASE = 12  # range copy slots (12-13 / 14-15)
_RG_HALF = 2


def _kernel(tile_of_ref, ctrl_ref, scols_ref, rcopy_ref, blk_ref,
            lidx_ref, lrow_ref, *rest, R, T, G, S_buf, RC, H_blocks,
            DMAX, RMAX, RQ, CQ, rank1, multihot, interpret):
    if rank1:
        vh_ref = vl_ref = None
        rest2 = rest
    else:
        vh_ref, vl_ref = rest[0], rest[1]
        rest2 = rest[2:]
    hot_ref, xs_ref, table_ref, o_ref, hilo, range_f32, sem = rest2

    i = pl.program_id(0)
    tile = ctrl_ref[0, 0, 0]
    s_cnt = ctrl_ref[0, 0, 3]
    r_cnt = ctrl_ref[0, 0, 4]
    s_read = ctrl_ref[0, 0, 5]     # scattered parity base (rows)
    prev_s_cnt = ctrl_ref[0, 0, 6]
    zero_out = ctrl_ref[0, 0, 9]
    r_first = ctrl_ref[0, 0, 10]
    r_read = ctrl_ref[0, 0, 11]    # range parity base (rows, = parity*RC)
    prev_r_cnt = ctrl_ref[0, 0, 12]
    do_comp = tile >= 0
    RCB = RC // _L
    SCAT0 = H_blocks * _L + 2 * RC   # window row of the scat region

    # ---- hot table: copy into the window head once per segment ----------
    if H_blocks:
        @pl.when(i == 0)
        def _():
            hilo[0:H_blocks * _L, :] = hot_ref[:]

    # ---- scattered chunk copies (take table -> window, fused chunks) ----
    def scat_block(slot_issue, slot_wait):
        # ALL waits for the previous step run BEFORE any new start:
        # shared counting-semaphore slots are only trustable when no
        # same-step start is pending on them (ops/pallas/fused.py)
        for k in range(DMAX):
            @pl.when(jnp.logical_and(i > 0, k < prev_s_cnt))
            def _(k=k):
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(0, CQ), :],
                    hilo.at[pl.ds(SCAT0, CQ), :],
                    sem.at[(k % _SC_HALF) + slot_wait]).wait()
        for k in range(DMAX):
            @pl.when(k < s_cnt)
            def _(k=k):
                src = pl.multiple_of(scols_ref[0, 0, k] * CQ, CQ)
                dst = pl.multiple_of(
                    SCAT0 + scols_ref[0, 1, k] * CQ, CQ)
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(src, CQ), :],
                    hilo.at[pl.ds(dst, CQ), :],
                    sem.at[(k % _SC_HALF) + slot_issue]).start()

    @pl.when(i % 2 == 0)
    def _():
        scat_block(0, _SC_HALF)

    @pl.when(i % 2 == 1)
    def _():
        scat_block(_SC_HALF, 0)

    # ---- range block copies (RQ-row chunks from X) ----------------------
    def rng_block(slot_issue, slot_wait):
        for k in range(RMAX):
            @pl.when(jnp.logical_and(i > 0, k < prev_r_cnt))
            def _(k=k):
                # wait: shape-identical proxy (src identity irrelevant to
                # a counting semaphore; byte counts match (RQ, 128) f32)
                pltpu.make_async_copy(
                    xs_ref.at[pl.ds(0, RQ), :],
                    range_f32.at[pl.ds(0, RQ), :],
                    sem.at[_RG_BASE + (k % _RG_HALF) + slot_wait]).wait()
        for k in range(RMAX):
            @pl.when(k < r_cnt)
            def _(k=k):
                src = rcopy_ref[0, 0, k]
                dst = pl.multiple_of(rcopy_ref[0, 1, k], RQ)
                pltpu.make_async_copy(
                    xs_ref.at[pl.ds(src, RQ), :],
                    range_f32.at[pl.ds(dst, RQ), :],
                    sem.at[_RG_BASE + (k % _RG_HALF) + slot_issue]).start()

    @pl.when(i % 2 == 0)
    def _():
        rng_block(0, _RG_HALF)

    @pl.when(i % 2 == 1)
    def _():
        rng_block(_RG_HALF, 0)

    # ---- zero output on the first step of a tile's first piece ----------
    @pl.when(jnp.logical_and(do_comp, zero_out == 1))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # ---- first step of a RANGE: split f32 range rows -> window ----------
    @pl.when(jnp.logical_and(do_comp, r_first == 1))
    def _():
        for c0 in range(0, RC, 2048):
            cn = min(2048, RC - c0)  # exact tail: RC need not be a 2048
            #                          multiple — a full-chunk tail would
            #                          clobber the scattered region
            roff = pl.multiple_of(r_read + c0, _L)
            rbuf = range_f32[pl.ds(roff, cn), :]
            hi = rbuf.astype(jnp.bfloat16)
            lo = (rbuf - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            woff = pl.multiple_of(H_blocks * _L + r_read + c0, _L)
            hilo[pl.ds(woff, cn), 0:_L] = hi
            hilo[pl.ds(woff, cn), _L:2 * _L] = lo

    # ---- multi-hot gather + scatter (fused engine compute path) ---------
    @pl.when(do_comp)
    def _():
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (R, _L), 0)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (_L, _L), 1)

        def group_gather(g):
            blk = blk_ref[0, 0, g]
            # unified window space: hot head | range (+parity) |
            # scattered (+parity)
            woff = pl.multiple_of(
                blk * _L + jnp.where(
                    blk >= H_blocks + RCB, RC + s_read,
                    jnp.where(blk >= H_blocks, r_read, 0)), _L)
            win = hilo[pl.ds(woff, _L), :]
            if multihot:
                # bitmask -> one-hot decode in 3 whole-(128,128) VPU ops
                # (repeat, shift, and) instead of 4x(broadcast,shift,and)
                # + concat — the decode is ~40% of per-group time
                # (PROFILE_r03 back-solve)
                mw = lidx_ref[pl.ds(g, 1)].reshape(4, _L)
                rep = jnp.repeat(mw, 32, axis=0)          # (128, 128)
                sh = jax.lax.broadcasted_iota(
                    jnp.int32, (_L, _L), 0) % 32
                ohT = jnp.right_shift(rep, sh) & 1
                graw = jax.lax.dot_general(
                    ohT.astype(jnp.bfloat16), win,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
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
                s = s + jnp.pad(s2, ((0, 0), (0, _L)))
            return s

        # PHASED schedule: all G gathers first, then all G scatters — a
        # group's gather->scatter pair is a dependent small-matmul chain
        # (~2 MXU pipeline latencies); phasing gives the scheduler G
        # independent matmuls back-to-back in each phase instead of
        # relying on cross-group interleaving of dependent chains.
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
            GU = 4
            z = jnp.zeros((R, 2 * _L), jnp.float32)

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
        o_ref[:] = o_ref[:] + acc[:, :_L] + acc[:, _L:]


def _segment_call(seg: RangesSegment, plan: RangesPlan, hot_hilo, xs,
                  interpret: bool) -> jnp.ndarray:
    from of_spmm_tpu.ops.pallas.fused import _stage_table

    R, T = plan.R, plan.T
    G = T // _L
    H_blocks = plan.n_hot // _L
    rank1 = seg.val_hi is None

    kernel = functools.partial(
        _kernel, R=R, T=T, G=G, S_buf=plan.S_buf, RC=plan.RC,
        H_blocks=H_blocks, DMAX=plan.DMAX, RMAX=plan.RMAX, RQ=plan.RQ,
        CQ=plan.cq, rank1=rank1, multihot=plan.multihot,
        interpret=interpret)

    def smem(shape):
        return pl.BlockSpec(shape, lambda i, t: (i,) + (0,) * (len(shape) - 1),
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
        smem((1, 2, plan.DMAX)),             # scols (chunk src/dst blocks)
        smem((1, 2, plan.RMAX)),             # rcopy
        smem((1, 1, G)),                     # blk
        lidx_spec,
        lanes(),                             # lrow
    ]
    args = [seg.ctrl, seg.scols, seg.rcopy, seg.blk, seg.lidx, seg.lrow]
    if not rank1:
        in_specs += [lanes(), lanes()]
        args += [seg.val_hi, seg.val_lo]
    in_specs += [
        pl.BlockSpec((max(H_blocks * _L, _L), 256), lambda i, t: (0, 0),
                     memory_space=pltpu.VMEM),   # hot table (hi|lo)
        pl.BlockSpec(memory_space=pl.ANY),        # X (HBM, f32)
        pl.BlockSpec(memory_space=pl.ANY),        # scattered take table
    ]
    args += [hot_hilo, xs, _stage_table(seg, plan, xs)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(seg.n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, _L), lambda i, t: (t[i], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(
                (H_blocks * _L + 2 * plan.RC + 2 * plan.S_buf, 256),
                jnp.bfloat16),
            pltpu.VMEM((2 * plan.RC, _L), jnp.float32),
            pltpu.SemaphoreType.DMA((_NSEM,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((seg.n_tiles * R, _L), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=120 * 1024 * 1024),
    )(seg.tile_of, *args)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spmm_ranges_jit(plan: RangesPlan, x: jnp.ndarray,
                     interpret: bool) -> jnp.ndarray:
    xs = x.astype(jnp.float32)
    if plan.col_scale is not None:
        xs = xs * plan.col_scale[:, None]
    # pad X rows so range copies ([lo, lo+RC) with RQ-row chunks) stay in
    # bounds on graphs smaller than the range window; zero pads are valid
    # data for the MXU (never NaN)
    m = xs.shape[0]
    target = max(-(-m // _L) * _L, plan.RC)
    if target > m:
        xs = jnp.pad(xs, ((0, target - m), (0, 0)))
    H = plan.n_hot
    if H:
        # bitcast split (ops/pallas/expansion.py): the naive
        # x - f32(bf16(x)) residual is constant-folded to ZERO by XLA
        # under --xla_allow_excess_precision on the attached chip,
        # silently degrading the pair to single-bf16
        from of_spmm_tpu.ops.pallas.expansion import split_hilo

        hot = jnp.take(xs, plan.hot_ids, axis=0)
        hi, lo = split_hilo(hot)
        hot_hilo = jnp.concatenate([hi, lo], axis=1)
    else:
        hot_hilo = jnp.zeros((_L, 256), jnp.bfloat16)
    outs = []
    for seg in plan.segments:
        outs.append(_segment_call(seg, plan, hot_hilo, xs, interpret))
        if len(plan.segments) > 1:
            # serialize segments so only ~one scattered take table is
            # live at a time (same barrier rationale as the fused
            # engine's staged tables; see ops/pallas/fused.py)
            xs, _ = jax.lax.optimization_barrier((xs, outs[-1][0, 0]))
    out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    out = out[: plan.shape[0]]
    if plan.row_scale is not None:
        out = out * plan.row_scale[:, None]
    return out


def spmm_ranges(plan: RangesPlan, x: jnp.ndarray,
                interpret: Optional[bool] = None) -> jnp.ndarray:
    """Y = A @ X with the range-staging engine (128-wide feature slabs)."""
    from of_spmm_tpu.ops.pallas.spmm import _pad_features
    from of_spmm_tpu.utils.config import pallas_interpret_default

    if interpret is None:
        interpret = pallas_interpret_default()
    xp, d = _pad_features(x.astype(jnp.float32))
    slabs = []
    for s0 in range(0, xp.shape[1], _L):
        slabs.append(_spmm_ranges_jit(plan, xp[:, s0:s0 + _L], interpret))
    out = jnp.concatenate(slabs, axis=1) if len(slabs) > 1 else slabs[0]
    return out[:, :d].astype(x.dtype)
