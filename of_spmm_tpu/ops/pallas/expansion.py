"""MXU one-hot expansion SpMM kernel (see sparse/expansion.py).

Per grid step (TILE lanes, all within one CW-row window of the group's
staging table and one R-row output tile):

1. build the window one-hot from the lanes' window-local staged indices:
   a (CW, TILE) 0/1 comparison, cast to bf16 — with the adjacency VALUES
   multiplied in along lanes (hi/lo bf16 split for fp32 parity; the 0/1
   pattern keeps the products exact);
2. gather+scale on the MXU: contributions (TILE, d) accumulate the
   window-block matmuls of value-folded one-hots against the staged
   feature blocks (themselves hi/lo bf16 pairs of the f32 features);
3. scatter-reduce on the MXU: a (R, TILE) row one-hot (hi/lo split of the
   f32 contributions) accumulates into the tile's (R, d) output block,
   which Pallas revisits across the tile's steps and writes once.

Groups execute sequentially; each group's staged tables are consumed only
by its own kernel call, so XLA's liveness keeps peak HBM at one group's
staging (plan-time budget, sparse/expansion.py).

Staging feeds in via PrefetchScalarGridSpec: the per-step window blocks
are selected by index_map from the scalar-prefetched base-block array, so
the Pallas pipeline double-buffers them (measured 4.6x faster than
in-kernel dynamic slicing of a VMEM-resident table).

Numerics: x and v split by exact mantissa truncation (split_hilo — robust
to --xla_allow_excess_precision, which elides the naive round-trip
residual); the kernel computes vh*(hi+lo) + vl*hi, dropping only the
vl*lo term, and splits the f32 contributions the same way before the
scatter matmuls — ~1.5e-5 relative error end-to-end vs the f32 oracle,
inside the reference parity bar (rtol 1e-4,
torch_flow_dual_object.py:1044).

Reference semantics: gather x segment-sum (oneflow/user/ops/gather_op.cpp,
unsorted_segment_sum_op.cpp:21-131) — the one-hot scatter matmul IS the
segment-sum, with reduction locality created at plan time instead of CUDA
atomics at run time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from of_spmm_tpu.sparse.expansion import _BLK, ExpansionGroup, ExpansionPlan

_DN = (((0,), (0,)), ((), ()))   # contract dim0 x dim0
_DN2 = (((1,), (0,)), ((), ()))  # contract dim1 x dim0


def split_hilo(x: jnp.ndarray):
    """Exact f32 -> (hi, lo) bf16 pair by mantissa truncation.

    hi keeps x's top 16 bits (bitwise — the bf16 cast of the truncated
    value is value-exact), lo = bf16(x - hi). Bit operations cannot be
    constant-folded away under --xla_allow_excess_precision (which DOES
    elide the naive ``x - f32(bf16(x))`` residual, silently degrading the
    pair to single-bf16 — observed on the attached chip's compile env).
    """
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(
        u & jnp.uint32(0xFFFF0000), jnp.float32)
    hi = hi_f32.astype(jnp.bfloat16)
    lo = (x - hi_f32).astype(jnp.bfloat16)
    return hi, lo


def _expansion_kernel(base_ref, tile_ref, lidx_ref, lrow_ref, vh_ref,
                      vl_ref, *window_and_out, R, TILE, CW, D, parity):
    """``parity=True``: fp32-parity hi/lo pairs (5 matmuls per window
    block-set + 2 scatter). ``parity=False``: bf16 fast mode — features
    and contributions stay single-bf16 (2 matmuls total per block-set),
    the AMP-mode sparse path (GraphConfig.amp semantics)."""
    nblk = CW // _BLK
    hi_refs = window_and_out[:nblk]
    lo_refs = window_and_out[nblk:2 * nblk] if parity else ()
    o_ref = window_and_out[2 * nblk if parity else nblk]

    step = pl.program_id(0)
    is_first = jnp.where(
        step == 0, True, tile_ref[step] != tile_ref[jnp.maximum(step - 1, 0)]
    )

    @pl.when(is_first)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    lanes = lidx_ref[:].reshape(1, TILE)
    vh = vh_ref[:].reshape(1, TILE)
    vl = vl_ref[:].reshape(1, TILE) if parity else None

    g = jnp.zeros((TILE, D), jnp.float32)
    for b in range(nblk):
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (_BLK, TILE), 0)
            == lanes - b * _BLK
        ).astype(jnp.bfloat16)
        ohvh = oh * vh
        g = g + jax.lax.dot_general(
            ohvh, hi_refs[b][:], _DN, preferred_element_type=jnp.float32)
        if parity:
            ohvl = oh * vl
            g = g + jax.lax.dot_general(
                ohvh, lo_refs[b][:], _DN, preferred_element_type=jnp.float32)
            g = g + jax.lax.dot_general(
                ohvl, hi_refs[b][:], _DN, preferred_element_type=jnp.float32)

    roh = (
        jax.lax.broadcasted_iota(jnp.int32, (R, TILE), 0)
        == lrow_ref[:].reshape(1, TILE)
    ).astype(jnp.bfloat16)
    if parity:
        c_hi, c_lo = split_hilo(g)
        s = jax.lax.dot_general(roh, c_hi, _DN2,
                                preferred_element_type=jnp.float32)
        s = s + jax.lax.dot_general(roh, c_lo, _DN2,
                                    preferred_element_type=jnp.float32)
    else:
        s = jax.lax.dot_general(roh, g.astype(jnp.bfloat16), _DN2,
                                preferred_element_type=jnp.float32)
    o_ref[:] = o_ref[:] + s


def _stage_hilo(group: ExpansionGroup, stage_tier: int, x: jnp.ndarray,
                parity: bool):
    """Tier-major staging: one fast-path take per 32768-column tier."""
    his, los = [], []
    ptr = group.stage_tier_ptr
    for t in range(len(ptr) - 1):
        if ptr[t + 1] == ptr[t]:
            continue
        seg = jax.lax.slice_in_dim(group.stage_idx, ptr[t], ptr[t + 1])
        lo_r = min(t * stage_tier, x.shape[0] - 1)
        hi_r = min((t + 1) * stage_tier, x.shape[0])
        xt = jax.lax.slice_in_dim(x, lo_r, hi_r, axis=0)
        g = jnp.take(xt, seg, axis=0, mode="clip")
        if parity:
            hi, lo = split_hilo(g)
            los.append(lo)
        else:
            hi = g.astype(jnp.bfloat16)
        his.append(hi)
    stage_hi = jnp.concatenate(his, axis=0) if len(his) > 1 else his[0]
    if not parity:
        return stage_hi, None
    stage_lo = jnp.concatenate(los, axis=0) if len(los) > 1 else los[0]
    return stage_hi, stage_lo


def _group_call(group: ExpansionGroup, stage_tier: int, R: int, TILE: int,
                CW: int, x: jnp.ndarray, interpret: bool,
                parity: bool) -> jnp.ndarray:
    D = x.shape[1]
    nblk = CW // _BLK
    G = TILE // 128
    stage_hi, stage_lo = _stage_hilo(group, stage_tier, x, parity)

    def lane_spec():
        return pl.BlockSpec(
            (G, 128), lambda i, bb, tl: (i, 0), memory_space=pltpu.VMEM)

    def win_spec(b):
        return pl.BlockSpec(
            (_BLK, D), lambda i, bb, tl, b=b: (bb[i * nblk + b], 0),
            memory_space=pltpu.VMEM)

    kernel = functools.partial(_expansion_kernel, R=R, TILE=TILE, CW=CW,
                               D=D, parity=parity)
    win_specs = [win_spec(b) for b in range(nblk)]  # hi window blocks
    win_args = [stage_hi] * nblk
    if parity:
        win_specs += [win_spec(b) for b in range(nblk)]  # lo window blocks
        win_args += [stage_lo] * nblk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # base_blk, tile_of
        grid=(group.n_steps,),
        in_specs=([lane_spec() for _ in range(4)] + win_specs),
        out_specs=pl.BlockSpec(
            (R, D), lambda i, bb, tl: (tl[i], 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((group.n_tiles * R, D), jnp.float32),
        interpret=interpret,
    )(
        group.base_blk, group.tile_of,
        group.win_lidx, group.lrow, group.val_hi, group.val_lo,
        *win_args,
    )


@functools.partial(jax.jit, static_argnames=("interpret", "parity"))
def _spmm_expansion_jit(plan: ExpansionPlan, x: jnp.ndarray,
                        interpret: bool, parity: bool) -> jnp.ndarray:
    outs = [
        _group_call(g, plan.stage_tier, plan.R, plan.TILE, plan.CW, x,
                    interpret, parity)
        for g in plan.groups
    ]
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def spmm_expansion(plan: ExpansionPlan, x: jnp.ndarray,
                   interpret=None) -> jnp.ndarray:
    """Y = A @ X with the one-hot expansion engine.

    fp32 (or wider) inputs run the fp32-parity mode; bf16 inputs take the
    fast single-bf16 mode (2 matmuls per window block-set instead of 5) —
    the AMP-mode sparse path, consistent with GraphConfig.amp casting
    activations to bf16 (reference analog: AMP white-listing the matmul,
    oneflow/core/job_rewriter/auto_mixed_precision.cpp).
    """
    from of_spmm_tpu.ops.pallas.spmm import _pad_features
    from of_spmm_tpu.utils.config import pallas_interpret_default

    if interpret is None:
        interpret = pallas_interpret_default()
    parity = x.dtype != jnp.bfloat16
    xp, d = _pad_features(x.astype(jnp.float32) if parity else x)
    out = _spmm_expansion_jit(plan, xp, interpret, parity)
    return out[:plan.n_rows, :d].astype(x.dtype)
