"""MXU one-hot expansion SpMM kernel v2 (see sparse/expansion2.py).

Per grid step (G lane groups of 128 lanes, one R-row output tile):

1. per group g: its single scalar-prefetched 128-row staging block feeds
   a (128, 128) one-hot gather — pure 0/1 rows with a single 1, so the
   matmul IS an exact row selection (no accumulation error, hi/lo window
   pairs recombine to the exact f32 staged row);
2. the G gathered (128, D) panels fill a (G*128, D) f32 contribution
   buffer at static offsets;
3. one scatter per step: an (R, G*128) row one-hot accumulates the
   contributions into the tile's (R, D) output block (revisited across
   the tile's steps, written once). fp32 parity: contributions split
   hi/lo by exact mantissa truncation -> 2 matmuls. General (non-rank-1)
   values fold into the scatter one-hot (roh * v_hi / v_lo) -> 3 matmuls.

Cost per lane (parity, rank-1): 2*128*D gather + 2*R*D scatter MACs —
CW/128 = 4x less gather work than v1 and zero value-fold VPU traffic.

Numerics: rank-1 mode stages c_j * x_j (f32 multiply at staging, then
exact hi/lo split) and scales the finished rows by r_i; general mode
computes vh*(ghi+glo) + vl*ghi like v1, dropping only the vl*glo term.
Both land well inside the reference parity bar (rtol 1e-4,
torch_flow_dual_object.py:1044).

Reference semantics: gather x segment-sum (oneflow/user/ops/
gather_op.cpp, unsorted_segment_sum_op.cpp:21-131).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from of_spmm_tpu.ops.pallas.expansion import split_hilo
from of_spmm_tpu.sparse.expansion2 import _L, Expansion2Group, Expansion2Plan

_DN = (((0,), (0,)), ((), ()))   # contract dim0 x dim0
_DN2 = (((1,), (0,)), ((), ()))  # contract dim1 x dim0


def _kernel(blk_ref, tile_ref, lidx_ref, lrow_ref, *rest,
            R, G, D, parity, rank1):
    if rank1:
        vh_ref = vl_ref = None
    else:
        vh_ref, vl_ref = rest[0], rest[1]
        rest = rest[2:]
    n_win = G * (2 if parity else 1)
    win_refs = rest[:n_win]
    o_ref = rest[n_win]
    gbuf = rest[n_win + 1]

    step = pl.program_id(0)
    is_first = jnp.where(
        step == 0, True, tile_ref[step] != tile_ref[jnp.maximum(step - 1, 0)]
    )

    @pl.when(is_first)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # gather: per group, a (128,128) one-hot selects rows of its block
    for g in range(G):
        lanes = lidx_ref[g, :].reshape(1, _L)
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (_L, _L), 0) == lanes
        ).astype(jnp.bfloat16)
        hi = win_refs[g][:]
        acc = jax.lax.dot_general(oh, hi, _DN,
                                  preferred_element_type=jnp.float32)
        if parity:
            lo = win_refs[G + g][:]
            acc = acc + jax.lax.dot_general(
                oh, lo, _DN, preferred_element_type=jnp.float32)
        gbuf[g * _L:(g + 1) * _L, :] = acc

    # scatter: one (R, G*128) row one-hot per step
    T = G * _L
    roh = (
        jax.lax.broadcasted_iota(jnp.int32, (R, T), 0)
        == lrow_ref[:].reshape(1, T)
    ).astype(jnp.bfloat16)
    g_all = gbuf[:]
    if rank1:
        if parity:
            c_hi, c_lo = split_hilo(g_all)
            s = jax.lax.dot_general(roh, c_hi, _DN2,
                                    preferred_element_type=jnp.float32)
            s = s + jax.lax.dot_general(roh, c_lo, _DN2,
                                        preferred_element_type=jnp.float32)
        else:
            s = jax.lax.dot_general(roh, g_all.astype(jnp.bfloat16), _DN2,
                                    preferred_element_type=jnp.float32)
    else:
        vh = vh_ref[:].reshape(1, T)
        rvh = roh * vh
        if parity:
            vl = vl_ref[:].reshape(1, T)
            rvl = roh * vl
            c_hi, c_lo = split_hilo(g_all)
            s = jax.lax.dot_general(rvh, c_hi, _DN2,
                                    preferred_element_type=jnp.float32)
            s = s + jax.lax.dot_general(rvh, c_lo, _DN2,
                                        preferred_element_type=jnp.float32)
            s = s + jax.lax.dot_general(rvl, c_hi, _DN2,
                                        preferred_element_type=jnp.float32)
        else:
            s = jax.lax.dot_general(rvh, g_all.astype(jnp.bfloat16), _DN2,
                                    preferred_element_type=jnp.float32)
    o_ref[:] = o_ref[:] + s


def _stage(group: Expansion2Group, stage_tier: int, x: jnp.ndarray,
           parity: bool):
    """Tier-major staging (one fast-path take per tier), optional rank-1
    column scaling, exact hi/lo split."""
    his, los = [], []
    ptr = group.stage_tier_ptr
    off = 0
    for t in range(len(ptr) - 1):
        if ptr[t + 1] == ptr[t]:
            continue
        seg = jax.lax.slice_in_dim(group.stage_idx, ptr[t], ptr[t + 1])
        lo_r = min(t * stage_tier, x.shape[0] - 1)
        hi_r = min((t + 1) * stage_tier, x.shape[0])
        xt = jax.lax.slice_in_dim(x, lo_r, hi_r, axis=0)
        g = jnp.take(xt, seg, axis=0, mode="clip")
        if group.stage_scale is not None:
            sc = jax.lax.slice_in_dim(group.stage_scale, ptr[t], ptr[t + 1])
            g = g * sc[:, None]
        if parity:
            hi, lo = split_hilo(g)
            los.append(lo)
        else:
            hi = g.astype(jnp.bfloat16)
        his.append(hi)
        off += ptr[t + 1] - ptr[t]
    stage_hi = jnp.concatenate(his, axis=0) if len(his) > 1 else his[0]
    if not parity:
        return stage_hi, None
    stage_lo = jnp.concatenate(los, axis=0) if len(los) > 1 else los[0]
    return stage_hi, stage_lo


def _group_call(group: Expansion2Group, stage_tier: int, R: int, G: int,
                x: jnp.ndarray, interpret: bool, parity: bool,
                rank1: bool) -> jnp.ndarray:
    D = x.shape[1]
    stage_hi, stage_lo = _stage(group, stage_tier, x, parity)

    def lane_spec():
        return pl.BlockSpec(
            (G, _L), lambda i, bb, tl: (i, 0), memory_space=pltpu.VMEM)

    def win_spec(g):
        return pl.BlockSpec(
            (_L, D), lambda i, bb, tl, g=g: (bb[i * G + g], 0),
            memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, R=R, G=G, D=D, parity=parity,
                               rank1=rank1)
    lane_specs = [lane_spec(), lane_spec()]  # lidx, lrow
    lane_args = [group.lidx, group.lrow]
    if not rank1:
        lane_specs += [lane_spec(), lane_spec()]
        lane_args += [group.val_hi, group.val_lo]
    win_specs = [win_spec(g) for g in range(G)]
    win_args = [stage_hi] * G
    if parity:
        win_specs += [win_spec(g) for g in range(G)]
        win_args += [stage_lo] * G
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # blk_of, tile_of
        grid=(group.n_steps,),
        in_specs=lane_specs + win_specs,
        out_specs=pl.BlockSpec(
            (R, D), lambda i, bb, tl: (tl[i], 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((G * _L, D), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((group.n_tiles * R, D), jnp.float32),
        interpret=interpret,
    )(group.blk_of, group.tile_of, *lane_args, *win_args)


@functools.partial(jax.jit, static_argnames=("interpret", "parity"))
def _spmm_expansion2_jit(plan: Expansion2Plan, x: jnp.ndarray,
                         interpret: bool, parity: bool) -> jnp.ndarray:
    outs = [
        _group_call(g, plan.stage_tier, plan.R, plan.G, x, interpret,
                    parity, plan.rank1)
        for g in plan.groups
    ]
    out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    if plan.row_scale is not None:
        out = out[:plan.n_rows] * plan.row_scale[:, None]
    return out


def spmm_expansion2(plan: Expansion2Plan, x: jnp.ndarray,
                    interpret=None) -> jnp.ndarray:
    """Y = A @ X with the v2 one-hot expansion engine.

    fp32 (or wider) inputs run fp32-parity mode; bf16 inputs run the
    single-bf16 fast mode (AMP sparse path), as in v1.
    """
    from of_spmm_tpu.ops.pallas.spmm import _pad_features
    from of_spmm_tpu.utils.config import pallas_interpret_default

    if interpret is None:
        interpret = pallas_interpret_default()
    parity = x.dtype != jnp.bfloat16
    xp, d = _pad_features(x.astype(jnp.float32) if parity else x)
    out = _spmm_expansion2_jit(plan, xp, interpret, parity)
    return out[:plan.n_rows, :d].astype(x.dtype)
