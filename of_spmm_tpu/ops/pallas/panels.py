"""Panel-engine SpMM kernel: dense adjacency-mask MXU groups.

Executes a sparse/panels.py PanelPlan, one pallas_call per segment. Per
grid step the kernel interprets the plan's control word:

1. scattered staging: a few LARGE contiguous block DMAs (SCQ=1024-row
   bigs + TQ=128-row tails) copy this step's slice of the per-segment
   LINEAR f32 take table (built by one XLA gather in exactly window
   order) into the f32 scattered scratch, one step behind on
   parity-split semaphore slots — replacing the r3 tier-major table's
   ~2M 32-row chunk copies per SpMM (the measured r3 staging wall);
2. range staging: RQ-row block DMAs copy the NEXT range's contiguous X
   rows into the f32 range scratch (parity ping-pong across ranges);
3. first step of a range / of a tile: split the f32 rows into the
   packed [hi|lo] bf16 window region (chunked VPU casts, ~0.1 ns/row);
4. every compute step: G dense-mask groups — decode the (4,128) int32
   bitmask to a (window-row x output-row) 0/1 matrix and run ONE
   128x128x256 matmul against the window block; the result IS the tile
   contribution. No scatter one-hot, no hi/lo recombine, no lane
   stream: r3's per-group machinery is gone (PROFILE_r04.md).

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

from of_spmm_tpu.sparse.panels import (
    _L, BMAX, DMAX, SCQ, TMAX, TQ, PanelPlan, PanelSegment)

# semaphore slots: bigs, 128-row tails, ranges, then the direct-row
# copies (DMAX x 2 halves)
_SB = 0
_ST = 2 * BMAX
_SR = _ST + 2 * TMAX
_SD = _SR + 4
_NSEM = _SD + 2 * DMAX
_RG_HALF = 2


def _kernel(tile_of_ref, sc_ref, *rest, R, G, S_buf, RC,
            H_blocks, RMAX, RQ, has_direct, interpret):
    # ONE packed per-step SMEM stream [ctrl | rcopy src | rcopy dst |
    # dsrc? | blk]: each separate per-step operand costs its own
    # pipeline DMA + semaphore round per grid step (~0.2-0.3 us), which
    # D_gridonly measured as the DOMINANT phase on small graphs (arxiv
    # 2.5 ms of 5.3 at ~0.95 us/step, r5). Offsets are static.
    (masks_ref, hot_ref, xs_ref, table_ref, o_ref, hilo,
     range_f32, scat_f32, sem) = rest
    _RB = 24                       # rcopy src base
    _DB = _RB + 2 * RMAX           # dsrc base (when has_direct)
    _GB = _DB + (DMAX if has_direct else 0)  # blk base

    def rcopy_src(k):
        return sc_ref[0, 0, _RB + k]

    def rcopy_dst(k):
        return sc_ref[0, 0, _RB + RMAX + k]

    def dsrc_at(k):
        return sc_ref[0, 0, _DB + k]

    def blk_at(g):
        return sc_ref[0, 0, _GB + g]

    i = pl.program_id(0)
    tile = sc_ref[0, 0, 0]
    g_cnt = sc_ref[0, 0, 1]
    s_src = sc_ref[0, 0, 2]
    s_big = sc_ref[0, 0, 3]
    r_cnt = sc_ref[0, 0, 4]
    s_dst = sc_ref[0, 0, 5]
    prev_big = sc_ref[0, 0, 6]
    s_tail = sc_ref[0, 0, 7]
    prev_tail = sc_ref[0, 0, 8]
    zero_out = sc_ref[0, 0, 9]
    r_first = sc_ref[0, 0, 10]
    r_read = sc_ref[0, 0, 11]
    prev_r_cnt = sc_ref[0, 0, 12]
    s_read = sc_ref[0, 0, 13]
    s_ext = sc_ref[0, 0, 14]
    t_first = sc_ref[0, 0, 15]
    d_cnt = sc_ref[0, 0, 16]
    prev_d = sc_ref[0, 0, 17]
    d_dst = sc_ref[0, 0, 18]
    do_comp = tile >= 0
    RCB = RC // _L

    # ---- hot table: copy into the window head once per segment ----------
    if H_blocks:
        @pl.when(i == 0)
        def _():
            hilo[0:H_blocks * _L, :] = hot_ref[:]

    # ---- zero the scattered scratch + window region once ----------------
    # Direct rows make staged extents non-TQ-aligned, so a 128-row
    # window block can span both used positions and never-staged rows;
    # uninitialized VMEM there would poison the masked matmul
    # (0 x NaN = NaN). One-time zeros keep every row the split ever
    # copies finite (later steps only overwrite with staged X data).
    @pl.when(i == 0)
    def _():
        scat_f32[:, :] = jnp.zeros_like(scat_f32)
        hilo[pl.ds(H_blocks * _L + 2 * RC, 2 * S_buf), :] = jnp.zeros(
            (2 * S_buf, 2 * _L), jnp.bfloat16)

    # ---- scattered staging: linear table -> f32 scratch -----------------
    # big chunks only exist when a tile can stage >= SCQ rows (static)
    use_big = plan_S_buf_ge_scq = S_buf >= SCQ

    def scat_block(half_issue, half_wait):
        # ALL waits for the previous step run BEFORE any new start
        for k in range(BMAX if use_big else 0):
            @pl.when(jnp.logical_and(i > 0, k < prev_big))
            def _(k=k):
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(0, SCQ), :],
                    scat_f32.at[pl.ds(0, SCQ), :],
                    sem.at[_SB + k + half_wait * BMAX]).wait()
        for k in range(TMAX):
            @pl.when(jnp.logical_and(i > 0, k < prev_tail))
            def _(k=k):
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(0, TQ), :],
                    scat_f32.at[pl.ds(0, TQ), :],
                    sem.at[_ST + k + half_wait * TMAX]).wait()
        for k in range(BMAX if use_big else 0):
            @pl.when(k < s_big)
            def _(k=k):
                src = pl.multiple_of(s_src + k * SCQ, TQ)
                dst = pl.multiple_of(s_dst + k * SCQ, TQ)
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(src, SCQ), :],
                    scat_f32.at[pl.ds(dst, SCQ), :],
                    sem.at[_SB + k + half_issue * BMAX]).start()
        for k in range(TMAX):
            @pl.when(k < s_tail)
            def _(k=k):
                src = pl.multiple_of(s_src + s_big * SCQ + k * TQ, TQ)
                dst = pl.multiple_of(s_dst + s_big * SCQ + k * TQ, TQ)
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(src, TQ), :],
                    scat_f32.at[pl.ds(dst, TQ), :],
                    sem.at[_ST + k + half_issue * TMAX]).start()

    # dynamic parity (r5): ONE instantiation of each staging block with
    # the semaphore half selected by a traced scalar — the previous
    # i%2-branch pair doubled the per-step predicated-block count, and
    # per-step scalar work IS the measured grid overhead (~0.95 us/step)
    half = i % 2
    scat_block(half, 1 - half)

    # ---- range block copies (RQ-row chunks from X) ----------------------
    def rng_block(slot_issue, slot_wait):
        for k in range(RMAX):
            @pl.when(jnp.logical_and(i > 0, k < prev_r_cnt))
            def _(k=k):
                pltpu.make_async_copy(
                    xs_ref.at[pl.ds(0, RQ), :],
                    range_f32.at[pl.ds(0, RQ), :],
                    sem.at[_SR + (k % _RG_HALF) + slot_wait]).wait()
        for k in range(RMAX):
            @pl.when(k < r_cnt)
            def _(k=k):
                src = rcopy_src(k)
                dst = pl.multiple_of(rcopy_dst(k), RQ)
                pltpu.make_async_copy(
                    xs_ref.at[pl.ds(src, RQ), :],
                    range_f32.at[pl.ds(dst, RQ), :],
                    sem.at[_SR + (k % _RG_HALF) + slot_issue]).start()

    rng_block(half * _RG_HALF, (1 - half) * _RG_HALF)

    # ---- direct rows: single X rows fetched by the kernel itself --------
    # Issue cost is ADDITIVE on the scalar instruction stream (measured
    # ~18 ns/row exposed — see DEFAULT_DIRECT_QUOTA); compiled out
    # entirely unless the plan staged direct rows.
    def dir_block(half_issue, half_wait):
        @pl.when(jnp.logical_and(i > 0, prev_d > 0))
        def _():
            for k in range(DMAX):
                @pl.when(k < prev_d)
                def _(k=k):
                    pltpu.make_async_copy(
                        xs_ref.at[pl.ds(0, 1), :],
                        scat_f32.at[pl.ds(0, 1), :],
                        sem.at[_SD + k + half_wait * DMAX]).wait()

        @pl.when(d_cnt > 0)
        def _():
            for k in range(DMAX):
                @pl.when(k < d_cnt)
                def _(k=k):
                    src = dsrc_at(k)
                    pltpu.make_async_copy(
                        xs_ref.at[pl.ds(src, 1), :],
                        scat_f32.at[pl.ds(d_dst + k, 1), :],
                        sem.at[_SD + k + half_issue * DMAX]).start()

    if has_direct:
        dir_block(half, 1 - half)

    # ---- zero output on the first step of a tile's first piece ----------
    @pl.when(jnp.logical_and(do_comp, zero_out == 1))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    SPLIT = 2048

    def _split(buf):
        # bitcast hi/lo (ops/pallas/expansion.py split_hilo): the naive
        # ``x - f32(bf16(x))`` residual is constant-folded to ZERO by
        # XLA under excess precision — observed on the attached chip for
        # jit-side splits (r4) AND, r5, by XLA:CPU for the interpreted
        # kernel tier (every scattered/range contribution silently
        # degraded to single-bf16 in interpret-mode tests). The masked
        # hi_f32 cannot be pattern-matched away.
        u = jax.lax.bitcast_convert_type(buf, jnp.uint32)
        hi_f32 = jax.lax.bitcast_convert_type(
            u & jnp.uint32(0xFFFF0000), jnp.float32)
        return hi_f32.astype(jnp.bfloat16), (buf - hi_f32).astype(
            jnp.bfloat16)

    # ---- first step of a RANGE: split f32 range rows -> window ----------
    @pl.when(jnp.logical_and(do_comp, r_first == 1))
    def _():
        for c0 in range(0, RC, SPLIT):
            cn = min(SPLIT, RC - c0)   # exact tail: RC need not be a
            #                            SPLIT multiple (small graphs) —
            #                            a full-chunk tail would clobber
            #                            the scattered window region
            roff = pl.multiple_of(r_read + c0, _L)
            hi, lo = _split(range_f32[pl.ds(roff, cn), :])
            woff = pl.multiple_of(H_blocks * _L + r_read + c0, _L)
            hilo[pl.ds(woff, cn), 0:_L] = hi
            hilo[pl.ds(woff, cn), _L:2 * _L] = lo

    # ---- first step of a TILE: split f32 scattered rows -> window -------
    SC = min(SPLIT, S_buf)

    @pl.when(jnp.logical_and(do_comp,
                             jnp.logical_and(t_first == 1, s_ext > 0)))
    def _():
        for c0 in range(0, S_buf, SC):
            @pl.when(c0 < s_ext)
            def _(c0=c0):
                soff = pl.multiple_of(s_read + c0, _L)
                hi, lo = _split(scat_f32[pl.ds(soff, SC), :])
                woff = pl.multiple_of(
                    H_blocks * _L + 2 * RC + s_read + c0, _L)
                hilo[pl.ds(woff, SC), 0:_L] = hi
                hilo[pl.ds(woff, SC), _L:2 * _L] = lo

    # ---- dense-mask groups: decode + one matmul each --------------------
    # Steps with NO real groups (staging-forced steps) skip the whole
    # block via g_cnt (= real groups + 1; 0 = legacy plan, run all).
    # Finer-grained predication was measured and REJECTED: lax.cond /
    # pl.when around 4-group sub-blocks nearly doubles compute on this
    # toolchain (6.4 -> 10-11 ms on products-small) — Mosaic branch
    # entry costs far exceed the padded matmuls they skip.
    @pl.when(jnp.logical_and(do_comp, g_cnt != 1))
    def _():
        def group(g):
            blk = blk_at(g)
            woff = pl.multiple_of(
                blk * _L + jnp.where(
                    blk >= H_blocks + RCB, RC + s_read,
                    jnp.where(blk >= H_blocks, r_read, 0)), _L)
            win = hilo[pl.ds(woff, _L), :]
            mw = masks_ref[pl.ds(g, 1)].reshape(4, _L)
            rep = jnp.repeat(mw, 32, axis=0)                 # (128, 128)
            sh = jax.lax.broadcasted_iota(jnp.int32, (_L, _L), 0) % 32
            ohT = jnp.right_shift(rep, sh) & 1               # (w, r)
            return jax.lax.dot_general(
                ohT.astype(jnp.bfloat16), win,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (r, 256)

        acc0 = acc1 = None
        for g in range(G):
            s = group(g)
            if g % 2 == 0:
                acc0 = s if acc0 is None else acc0 + s
            else:
                acc1 = s if acc1 is None else acc1 + s
        acc = acc0 if acc1 is None else acc0 + acc1
        o_ref[:] = o_ref[:] + acc[:, :_L] + acc[:, _L:]


def _segment_call(seg: PanelSegment, plan: PanelPlan, hot_hilo, xs,
                  interpret: bool) -> jnp.ndarray:
    R = plan.R
    G = plan.T // _L
    H_blocks = plan.n_hot // _L

    has_direct = bool(plan.n_direct)
    kernel = functools.partial(
        _kernel, R=R, G=G, S_buf=plan.S_buf, RC=plan.RC,
        H_blocks=H_blocks, RMAX=plan.RMAX, RQ=plan.RQ,
        has_direct=has_direct, interpret=interpret)

    def smem(shape):
        return pl.BlockSpec(shape,
                            lambda i, t: (i,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.SMEM)

    W = 24 + 2 * plan.RMAX + (DMAX if has_direct else 0) + G
    in_specs = [
        smem((1, 1, W)),                     # packed per-step scalars
        pl.BlockSpec((G, 4, _L), lambda i, t: (i, 0, 0),
                     memory_space=pltpu.VMEM),   # masks
        pl.BlockSpec((max(H_blocks * _L, _L), 256), lambda i, t: (0, 0),
                     memory_space=pltpu.VMEM),   # hot (hi|lo)
        pl.BlockSpec(memory_space=pl.ANY),       # X (HBM, f32)
        pl.BlockSpec(memory_space=pl.ANY),       # linear take table (f32)
    ]
    take_idx = jnp.asarray(seg.stage_take)
    # 2-D index batching (r5): reshaping the flat index vector to
    # (rows/k, k) keeps the produced table bit-identical (row-major)
    # but nudges the XLA TPU gather emitter onto its batched path.
    # In situ it is a consistent ~5% take-phase win (146.4 -> 139.3 ms
    # on full products, 14.0 -> 12.7 ms products-small); the ~20x gap
    # in the synthetic microbench (tools/exp_take_width.py) does not
    # transfer — the in-situ flat take already ran near the same rate.
    from of_spmm_tpu.utils.config import FLAGS

    k = max(int(FLAGS.get("OFS_TAKE_ARITY")), 1)
    if k > 1 and take_idx.shape[0] % k == 0:
        table = jnp.take(xs, take_idx.reshape(-1, k), axis=0,
                         mode="clip").reshape(-1, xs.shape[1])
    else:
        table = jnp.take(xs, take_idx, axis=0, mode="clip")
    if seg.stage_scale is not None:
        # general-valued (per-edge) plan: each staged row pre-scaled by
        # its edge value in the same bandwidth-bound table pass
        table = table * jnp.asarray(seg.stage_scale)[:, None]
    n_steps = seg.n_steps
    packed = jnp.concatenate(
        [jnp.asarray(seg.ctrl),
         jnp.asarray(seg.rcopy).reshape(n_steps, 1, 2 * plan.RMAX),
         *([jnp.asarray(seg.dsrc)] if has_direct else []),
         jnp.asarray(seg.blk)], axis=2)
    args = [packed, seg.masks, hot_hilo, xs, table]

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
            pltpu.VMEM((2 * plan.S_buf, _L), jnp.float32),
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
            vmem_limit_bytes=128 * 1024 * 1024),
    )(seg.tile_of, *args)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spmm_panels_jit(plan: PanelPlan, x: jnp.ndarray,
                     interpret: bool) -> jnp.ndarray:
    xs = x.astype(jnp.float32) * plan.col_scale[:, None]
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
            # serialize segments so only ~one take table is live at a
            # time (HBM liveness model, sparse/panels.py)
            xs, _ = jax.lax.optimization_barrier((xs, outs[-1][0, 0]))
    out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    out = out[: plan.shape[0]]
    return out * plan.row_scale[:, None]


def spmm_panels(plan: PanelPlan, x: jnp.ndarray,
                interpret: Optional[bool] = None) -> jnp.ndarray:
    """Y = A @ X with the panel engine (128-wide feature slabs)."""
    from of_spmm_tpu.ops.pallas.spmm import _pad_features
    from of_spmm_tpu.utils.config import pallas_interpret_default

    if interpret is None:
        interpret = pallas_interpret_default()
    if any(seg.masks is None for seg in plan.segments):
        # unplaced plan (tests / one-shot use): expand compact masks
        # host-side; placed plans arrive pre-expanded (place_operator)
        from of_spmm_tpu.sparse.panels import ensure_masks

        plan = ensure_masks(plan)
    xp, d = _pad_features(x.astype(jnp.float32))
    slabs = []
    for s0 in range(0, xp.shape[1], _L):
        slabs.append(_spmm_panels_jit(plan, xp[:, s0:s0 + _L], interpret))
    out = jnp.concatenate(slabs, axis=1) if len(slabs) > 1 else slabs[0]
    return out[:, :d].astype(x.dtype)
