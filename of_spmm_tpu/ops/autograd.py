"""Autograd wiring: the gather <-> segment_sum pairing, operator objects.

The reference couples gather and unsorted_segment_sum through its autograd
engine: gather's backward *is* UnsortedSegmentSumLike
(oneflow/core/autograd/gradient_funcs/gather.cpp:62-73), and segment-sum's
backward is a gather. Here the same pairing is expressed with jax.custom_vjp:

- ``gather`` / ``segment_sum`` primitives differentiate into each other;
- ``spmm(op, x)`` differentiates into ``spmm(op^T, g)`` using a transpose
  operator precomputed at plan time (TPUs have no scatter atomics, so the
  backward is the *same* forward kernel on the transposed binned layout —
  no runtime transposition, no atomics).

``SpmmOperator`` is the plan object: the binned forward layout, the binned
transpose layout, and the COO pattern (for vals-gradients via sddmm).
"""

from __future__ import annotations

import dataclasses
import functools
import numpy as np
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from of_spmm_tpu.ops import reference as ref
from of_spmm_tpu.ops.pallas.spmm import spmm_pallas
from of_spmm_tpu.sparse.binned import (
    DEFAULT_LADDER,
    BinnedEll,
    bin_rows,
    bin_rows_relabeled,
)
from of_spmm_tpu.sparse.formats import COO, CSR
from of_spmm_tpu.utils.config import FLAGS, on_tpu


# ---------------------------------------------------------------------------
# Differentiable gather / segment_sum pair.
# ---------------------------------------------------------------------------


@jax.custom_vjp
def gather(params: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Differentiable row gather (axis 0); bwd is segment_sum_like."""
    return ref.gather(params, indices)


def _gather_fwd(params, indices):
    return ref.gather(params, indices), (indices, params.shape[0])


def _gather_bwd(res, g):
    indices, n = res
    # segment ids are the gather indices; ids marked non-differentiable
    # (reference: arg modifier requires_grad=false, gather_op.cpp:44-50)
    return ref.segment_sum(g, indices, n), None


gather.defvjp(_gather_fwd, _gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int):
    """Differentiable unsorted segment sum; bwd is gather."""
    return ref.segment_sum(data, segment_ids, num_segments)


def _segsum_fwd(data, segment_ids, num_segments):
    return ref.segment_sum(data, segment_ids, num_segments), segment_ids


def _segsum_bwd(num_segments, segment_ids, g):
    return ref.gather(g, segment_ids), None


segment_sum.defvjp(_segsum_fwd, _segsum_bwd)


# ---------------------------------------------------------------------------
# SpmmOperator — plan object bundling forward + transpose layouts.
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SpmmOperator:
    """A sparse matrix prepared for repeated (differentiable) SpMM.

    Holds the row-binned forward layout and the transpose layout built once
    at plan time. ``op @ x`` computes A @ x; under jax.grad the cotangent
    flows through A^T @ g using the same kernel on ``binned_t``.
    """

    binned: BinnedEll
    binned_t: BinnedEll
    coo_rows: jnp.ndarray  # (nnz,) original pattern (CSR order, node space)
    coo_cols: jnp.ndarray  # (nnz,)
    coo_vals: jnp.ndarray  # (nnz,) — vector path + sddmm vals-grads
    shape: Tuple[int, int]
    # relabeling (square matrices only): binned layouts live in an internal
    # row order chosen for a slice-concat finish; None = identity.
    old_from_new: Optional[jnp.ndarray] = None  # x_int = x[old_from_new]
    new_from_old: Optional[jnp.ndarray] = None  # y = y_int[new_from_old]

    def tree_flatten(self):
        children = (self.binned, self.binned_t, self.coo_rows, self.coo_cols,
                    self.coo_vals, self.old_from_new, self.new_from_old)
        return children, (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (binned, binned_t, coo_rows, coo_cols, coo_vals,
         old_from_new, new_from_old) = children
        (shape,) = aux
        return cls(binned=binned, binned_t=binned_t, coo_rows=coo_rows,
                   coo_cols=coo_cols, coo_vals=coo_vals, shape=shape,
                   old_from_new=old_from_new, new_from_old=new_from_old)

    @property
    def relabeled(self) -> bool:
        return self.old_from_new is not None

    @property
    def transpose_aliased(self) -> bool:
        """True when the backward plan shares the forward plan's arrays
        (symmetric matrices) — identity survives placement/pickling at the
        leaf level even when the containers were rebuilt."""
        if self.binned_t is self.binned:
            return True
        a = jax.tree_util.tree_leaves(self.binned)
        b = jax.tree_util.tree_leaves(self.binned_t)
        return bool(a) and len(a) == len(b) and a[0] is b[0]

    def to_internal(self, a: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
        """Map node-space data into the operator's internal row order."""
        if self.old_from_new is None:
            return a
        return jnp.take(a, self.old_from_new, axis=axis)

    def from_internal(self, a: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
        """Map internal-order results back to node space."""
        if self.new_from_old is None:
            return a
        return jnp.take(a, self.new_from_old, axis=axis)

    @property
    def T(self) -> "SpmmOperator":
        return SpmmOperator(
            binned=self.binned_t, binned_t=self.binned,
            coo_rows=self.coo_cols, coo_cols=self.coo_rows,
            coo_vals=self.coo_vals,
            shape=(self.shape[1], self.shape[0]),
            old_from_new=self.old_from_new, new_from_old=self.new_from_old,
        )

    def __matmul__(self, x: jnp.ndarray) -> jnp.ndarray:
        return spmm(self, x)


def _is_symmetric(csr: CSR) -> bool:
    """Exact pattern+value symmetry check (host-side, plan time)."""
    import numpy as np

    t = csr.transpose()
    if t.nnz != csr.nnz:
        return False
    return (
        np.array_equal(np.asarray(t.indptr), np.asarray(csr.indptr))
        and np.array_equal(np.asarray(t.cols), np.asarray(csr.cols))
        and np.allclose(np.asarray(t.vals), np.asarray(csr.vals), rtol=0, atol=0)
    )


def make_operator(
    a: CSR | COO,
    ladder="auto",
    relabel: Optional[bool] = None,
    place: bool = True,
    layout: str = "auto",
    tier_size: Optional[int] = None,
    keep_coo: bool = True,
    reorder: Optional[str] = None,
) -> SpmmOperator:
    """Build the plan: bin A and A^T (host-side, once per graph).

    ``layout``: "binned" (row-binned ELL, degree-relabeled slice finish —
    best for graphs whose X fits the fast gather path), "tiered"
    (column-tiered ELL, sparse/tiled.py — best when n_cols exceeds the
    device's fast-gather table size, measured 6x on v5e at 2.4M cols), or
    "auto" (tiered iff n_cols > tier_size).

    With ``place`` (default) the finished plan is moved to device in one
    jax.device_put; place=False keeps numpy arrays (for disk caching —
    see data/cache.py — or CPU-only use).

    ``relabel`` (default: auto — on for square matrices) renumbers rows so
    the forward finish is a fused slice-concat instead of a permutation
    gather (~2.3x faster on v5e; see bin_rows_relabeled). The public
    ``spmm`` still takes/returns node-space arrays — conversion happens at
    the operator boundary; models convert once and use spmm_internal.
    For symmetric matrices (e.g. GCN's normalized adjacency) the transpose
    plan aliases the forward plan, so backward enjoys the same finish.
    """
    import numpy as np

    csr = CSR.from_coo(a) if isinstance(a, COO) else a
    coo = csr.to_coo()
    if not keep_coo:
        # drop the COO pattern (1.5GB HBM at 10^8 nnz) when the edge-list
        # paths (spmv / sddmm / spmm_coo) are not needed — spmm-only use.
        import numpy as _np

        coo = type(coo).from_arrays(
            _np.zeros(0, _np.int32), _np.zeros(0, _np.int32),
            _np.zeros(0, _np.float32), csr.shape,
        )

    def _place(op):
        return place_operator(op) if place else op

    if layout not in ("auto", "binned", "tiered", "expansion", "fused",
                      "ranges", "panels"):
        raise ValueError(
            "layout must be auto|binned|tiered|expansion|fused|ranges|"
            f"panels, got {layout!r}")
    from of_spmm_tpu.sparse.tiled import DEFAULT_TIER_SIZE, bin_rows_tiered

    ts = tier_size or DEFAULT_TIER_SIZE
    if layout == "auto":
        layout = "tiered" if csr.shape[1] > ts else "binned"
    if layout in ("fused", "ranges", "panels"):
        if layout == "panels":
            from of_spmm_tpu.sparse.panels import build_panels_plan as _bp
        elif layout == "ranges":
            from of_spmm_tpu.sparse.ranges import build_ranges_plan as _bp
        else:
            from of_spmm_tpu.sparse.fused import build_fused_plan as _bp

        ofn = nfo = None
        pcsr = csr
        if reorder:
            # locality relabeling (sparse/reorder.py): the plan layouts
            # live in cluster-contiguous internal ids; the operator maps
            # node-space tensors at its boundary like the binned relabel
            from of_spmm_tpu.sparse.reorder import reorder_locality

            pcsr, ofn, nfo = reorder_locality(csr, method=reorder)

        def _build(c):
            if layout != "panels":
                return _bp(c)
            try:
                return _bp(c)
            except ValueError:
                # non-rank-1 values: the general per-edge panel mode
                # (every edge staged pre-scaled; sparse/panels.py)
                return _bp(c, per_edge=True)

        plan = _build(pcsr)
        if pcsr.shape[0] == pcsr.shape[1] and _is_symmetric(pcsr):
            plan_t = plan
        else:
            plan_t = _build(pcsr.transpose())
        return _place(SpmmOperator(
            binned=plan,
            binned_t=plan_t,
            coo_rows=coo.rows,
            coo_cols=coo.cols,
            coo_vals=coo.vals,
            shape=csr.shape,
            old_from_new=ofn, new_from_old=nfo,
        ))
    if layout == "expansion":
        from of_spmm_tpu.sparse.expansion import build_expansion_plan

        plan = build_expansion_plan(csr)
        if csr.shape[0] == csr.shape[1] and _is_symmetric(csr):
            plan_t = plan
        else:
            plan_t = build_expansion_plan(csr.transpose())
        return _place(SpmmOperator(
            binned=plan,
            binned_t=plan_t,
            coo_rows=coo.rows,
            coo_cols=coo.cols,
            coo_vals=coo.vals,
            shape=csr.shape,
        ))
    if layout == "tiered":
        tiled = bin_rows_tiered(csr, tier_size=ts, ladder=ladder)
        if csr.shape[0] == csr.shape[1] and _is_symmetric(csr):
            tiled_t = tiled
        else:
            tiled_t = bin_rows_tiered(csr.transpose(), tier_size=ts, ladder=ladder)
        return _place(SpmmOperator(
            binned=tiled,
            binned_t=tiled_t,
            coo_rows=coo.rows,
            coo_cols=coo.cols,
            coo_vals=coo.vals,
            shape=csr.shape,
        ))

    if relabel is None:
        relabel = csr.shape[0] == csr.shape[1]
    if relabel and csr.shape[0] != csr.shape[1]:
        raise ValueError("relabel=True requires a square matrix")
    if relabel:
        binned, old_from_new, new_from_old = bin_rows_relabeled(csr, ladder=ladder)
        if _is_symmetric(csr):
            binned_t = binned
        else:
            # transpose of the RELABELED matrix so spaces line up
            ofn = np.asarray(old_from_new)
            nfo = np.asarray(new_from_old)
            indptr = np.asarray(csr.indptr)
            cols = np.asarray(csr.cols)
            vals = np.asarray(csr.vals)
            degs = np.diff(indptr)
            rows = np.repeat(np.arange(csr.shape[0]), degs)
            from of_spmm_tpu.sparse.formats import COO as _COO

            relabeled_t = CSR.from_coo(
                _COO.from_arrays(nfo[cols], nfo[rows], vals, csr.shape)
            )
            binned_t = bin_rows(relabeled_t, ladder=ladder)
        return _place(SpmmOperator(
            binned=binned,
            binned_t=binned_t,
            coo_rows=coo.rows,
            coo_cols=coo.cols,
            coo_vals=coo.vals,
            shape=csr.shape,
            old_from_new=old_from_new,
            new_from_old=new_from_old,
        ))
    return _place(SpmmOperator(
        binned=bin_rows(csr, ladder=ladder),
        binned_t=bin_rows(csr.transpose(), ladder=ladder),
        coo_rows=coo.rows,
        coo_cols=coo.cols,
        coo_vals=coo.vals,
        shape=csr.shape,
    ))


def place_operator(op: SpmmOperator, device=None) -> SpmmOperator:
    """Move a (possibly cached, numpy-leafed) operator to device in one pass,
    PRESERVING leaf sharing: symmetric plans alias binned_t's arrays to
    binned's (directly or through a pickle round-trip), and a naive
    tree-wide device_put would materialize two HBM copies. Leaves are
    dedup'd by object identity before transfer.

    Panel plans ship compact per-edge masks and expand them ON DEVICE
    here (one scatter-add jit): ~13x less transfer than the dense
    bitmasks — the r3 placement took 367 s on the tunneled chip."""
    from of_spmm_tpu.sparse.panels import PanelPlan, ensure_masks

    if hasattr(op, "binned") and isinstance(op.binned, PanelPlan):
        on_dev = jax.devices()[0].platform != "cpu" if device is None \
            else getattr(device, "platform", "cpu") != "cpu"
        b = ensure_masks(op.binned, device=on_dev)
        bt = b if op.binned_t is op.binned else ensure_masks(
            op.binned_t, device=on_dev)
        op = dataclasses.replace(op, binned=b, binned_t=bt)
    leaves, treedef = jax.tree_util.tree_flatten(op)
    uniq = {}
    for leaf in leaves:
        uniq.setdefault(id(leaf), leaf)
    # ONE batched device_put for all unique leaves: per-leaf puts pay a
    # tunnel round-trip each (~70 transfers on a products panel plan)
    keys = list(uniq.keys())
    moved = jax.device_put([uniq[k] for k in keys], device)
    memo = dict(zip(keys, moved))
    placed = [memo[id(leaf)] for leaf in leaves]
    return jax.tree_util.tree_unflatten(treedef, placed)


def _select_impl(impl: str) -> str:
    if impl == "auto":
        impl = FLAGS.get("OFS_DEFAULT_IMPL")
    if impl == "auto":
        impl = "pallas" if on_tpu() else "xla"
    return impl


def _pallas_cold_bucket(bucket, x_full: jnp.ndarray) -> jnp.ndarray:
    """Cold-bucket engine for tiered plans: per-row DMA gather (Pallas).

    Table-size independent (~340 Mrows/s on v5e) vs XLA's ~63 Mrows/s
    multi-megarow gather slow path — cold chunks gather from the FULL
    feature table, so they are exactly the slow case.
    """
    from of_spmm_tpu.ops.pallas.spmm import _bucket_contrib, _pad_features
    from of_spmm_tpu.utils.config import pallas_interpret_default

    xp, d = _pad_features(x_full)
    return _bucket_contrib(bucket, xp, pallas_interpret_default())[:, :d]


def _spmm_impl(binned, x: jnp.ndarray, impl: str) -> jnp.ndarray:
    from of_spmm_tpu.sparse.expansion import ExpansionPlan
    from of_spmm_tpu.sparse.fused import FusedPlan
    from of_spmm_tpu.sparse.tiled import TieredEll

    from of_spmm_tpu.sparse.panels import PanelPlan
    from of_spmm_tpu.sparse.ranges import RangesPlan

    if isinstance(binned, PanelPlan):
        # dense-mask panel engine — the layout IS the implementation
        from of_spmm_tpu.ops.pallas.panels import spmm_panels

        return spmm_panels(binned, x)
    if isinstance(binned, RangesPlan):
        # range-staging engine — the layout IS the implementation
        from of_spmm_tpu.ops.pallas.ranges import spmm_ranges

        return spmm_ranges(binned, x)
    if isinstance(binned, FusedPlan):
        # fused staging+compute engine — the layout IS the implementation
        from of_spmm_tpu.ops.pallas.fused import spmm_fused

        return spmm_fused(binned, x)
    if isinstance(binned, ExpansionPlan):
        # MXU one-hot engine — the layout IS the implementation (built for
        # the Pallas kernel; no XLA variant of this layout exists).
        from of_spmm_tpu.ops.pallas.expansion import spmm_expansion

        return spmm_expansion(binned, x)
    if isinstance(binned, TieredEll):
        # tiered layout: one tiling strategy, two cold-bucket engines —
        # "xla" is the pure-XLA oracle; "pallas" swaps the cold (full-
        # table) buckets onto the per-row-DMA kernel.
        if impl == "pallas":
            from of_spmm_tpu.ops.pallas.spmm import gather_rows_pallas

            return ref.spmm_tiered_xla(
                binned, x, cold_bucket_fn=_pallas_cold_bucket,
                gather_fn=gather_rows_pallas,
            )
        return ref.spmm_tiered_xla(binned, x)
    if impl == "pallas":
        return spmm_pallas(binned, x)
    if impl == "xla":
        return ref.spmm_binned_xla(binned, x)
    raise ValueError(f"unknown spmm impl {impl!r} (want auto|xla|pallas)")


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _spmm_vjp(op: SpmmOperator, x: jnp.ndarray, impl: str) -> jnp.ndarray:
    return _spmm_impl(op.binned, x, impl)


def _spmm_fwd(op, x, impl):
    return _spmm_impl(op.binned, x, impl), op


def _spmm_bwd(impl, op, g):
    dx = _spmm_impl(op.binned_t, g, impl)
    # The operator's arrays (structure + padded vals) are treated as
    # non-differentiable plan data: zero cotangents. Edge-weight training
    # differentiates through ops.sddmm on the COO pattern instead.
    d_op = jax.tree_util.tree_map(lambda a: jnp.zeros_like(a), op)
    return d_op, dx


_spmm_vjp.defvjp(_spmm_fwd, _spmm_bwd)


def spmm_internal(op: SpmmOperator, x: jnp.ndarray, impl: str = "auto") -> jnp.ndarray:
    """Y = A @ X in the operator's INTERNAL row order (no conversions).

    For relabeled operators the caller must supply x = op.to_internal(x0)
    and map results back with op.from_internal; models do this once per
    forward instead of once per spmm.
    """
    return _spmm_vjp(op, x, _select_impl(impl))


def spmm(op: SpmmOperator, x: jnp.ndarray, impl: str = "auto") -> jnp.ndarray:
    """Differentiable Y = A @ X in node space.

    bwd(dX) = A^T @ dY via the transpose plan (the gather<->segment_sum
    pairing of the reference, gradient_funcs/gather.cpp:62-73).
    """
    if op.relabeled:
        return op.from_internal(spmm_internal(op, op.to_internal(x), impl))
    return spmm_internal(op, x, impl)


def _require_coo(op: SpmmOperator, what: str) -> None:
    if op.coo_rows.shape[0] == 0 and op.binned.nnz_padded > 0:
        raise ValueError(
            f"{what} needs the COO pattern, but this operator was built "
            "with keep_coo=False (spmm-only)"
        )


def spmv(op: SpmmOperator, x: jnp.ndarray) -> jnp.ndarray:
    """Differentiable y = A @ x for a vector x (edge-list path).

    Differentiates through the gather/segment_sum pair above, so the
    backward is segment-sum of cotangents — exactly the reference pairing.
    """
    _require_coo(op, "spmv")
    contrib = op.coo_vals * gather(x, op.coo_cols)
    return segment_sum(contrib, op.coo_rows, op.shape[0])


def sddmm(op: SpmmOperator, lhs: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Pattern-restricted (lhs @ rhs^T): out[e] = lhs[rows[e]] . rhs[cols[e]].

    Differentiable in lhs/rhs via the gather pair — this is the vals-grad
    path for edge-weight training (GAT-style models).
    """
    _require_coo(op, "sddmm")
    le = gather(lhs, op.coo_rows)
    re = gather(rhs, op.coo_cols)
    return jnp.sum(le * re, axis=-1)


def spmm_coo(
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    vals: jnp.ndarray,
    x: jnp.ndarray,
    n_rows: int,
) -> jnp.ndarray:
    """Y = A @ X for a runtime-valued COO pattern (edge-list path).

    Unlike ``spmm`` (whose values are baked into the plan), the values here
    are a traced array — differentiable in BOTH vals and x. This is the
    aggregation used when per-edge weights are computed inside the model
    (GAT attention); it is exactly the reference's gather + scale +
    unsorted_segment_sum composition.
    """
    contrib = vals[:, None] * gather(x, cols)
    return segment_sum(contrib, rows, n_rows)


def segment_softmax(
    scores: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    """Softmax over each segment (per destination row of an edge list).

    Numerically stabilized with a per-segment max; the building block of
    attention-weighted aggregation (GAT). Differentiable end-to-end via the
    gather / segment_sum pairing.
    """
    seg_max = jax.ops.segment_max(
        jax.lax.stop_gradient(scores), segment_ids, num_segments=num_segments
    )
    # empty segments produce -inf max; neutralize before the gather
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    ex = jnp.exp(scores - ref.gather(seg_max, segment_ids))
    denom = segment_sum(ex, segment_ids, num_segments)
    return ex / (ref.gather(denom, segment_ids) + 1e-16)


# ---------------------------------------------------------------------------
# SpGEMM — host symbolic phase + DEVICE numeric phase (two-phase, the
# reference's tmp-buffer shape pattern: sizes fixed before compute,
# oneflow/user/kernels/unsorted_segment_sum_kernel.cpp:199-202).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SpgemmPlan:
    """Symbolic phase of C = A @ B: the output pattern plus, per scalar
    product a_ik * b_kj, the positions of its operands and its output slot.

    Built host-side (output nnz is unknown at trace time — SURVEY §7 hard
    part 4); the numeric phase then runs on device as gather x multiply x
    segment-sum, the same primitive pairing as the SpMM path."""

    a_pos: jnp.ndarray     # (P,) int32 index into A.vals
    b_pos: jnp.ndarray     # (P,) int32 index into B.vals
    out_slot: jnp.ndarray  # (P,) int32 index into C.vals (sorted)
    indptr: np.ndarray     # (n+1,) C row pointers
    cols: np.ndarray       # (out_nnz,) C column indices
    shape: Tuple[int, int]
    out_nnz: int


def spgemm_symbolic(a: CSR, b: CSR) -> SpgemmPlan:
    """Expand the product structure and fix C's pattern (host, numpy)."""
    if a.shape[1] != b.shape[0]:
        raise ValueError(f"spgemm shape mismatch: {a.shape} @ {b.shape}")
    a_indptr = np.asarray(a.indptr).astype(np.int64)
    a_cols = np.asarray(a.cols).astype(np.int64)
    b_indptr = np.asarray(b.indptr).astype(np.int64)
    b_cols = np.asarray(b.cols).astype(np.int64)

    a_rows = np.repeat(np.arange(a.shape[0], dtype=np.int64),
                       np.diff(a_indptr))
    exp_counts = (b_indptr[a_cols + 1] - b_indptr[a_cols]).astype(np.int64)
    total = int(exp_counts.sum())
    if total == 0:
        return SpgemmPlan(
            a_pos=jnp.zeros(0, jnp.int32), b_pos=jnp.zeros(0, jnp.int32),
            out_slot=jnp.zeros(0, jnp.int32),
            indptr=np.zeros(a.shape[0] + 1, np.int64),
            cols=np.zeros(0, np.int32), shape=(a.shape[0], b.shape[1]),
            out_nnz=0)
    e_ids = np.repeat(np.arange(a_cols.shape[0], dtype=np.int64), exp_counts)
    cum = np.zeros(a_cols.shape[0] + 1, dtype=np.int64)
    np.cumsum(exp_counts, out=cum[1:])
    intra = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], exp_counts)
    b_pos = b_indptr[a_cols[e_ids]] + intra
    out_rows = a_rows[e_ids]
    out_cols = b_cols[b_pos]

    key = out_rows * b.shape[1] + out_cols
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    boundary = np.empty(total, dtype=bool)
    boundary[0] = True
    boundary[1:] = key_s[1:] != key_s[:-1]
    slot_sorted = np.cumsum(boundary) - 1
    out_nnz = int(slot_sorted[-1]) + 1
    out_slot = np.empty(total, np.int64)
    out_slot[order] = slot_sorted

    red_rows = out_rows[order][boundary]
    red_cols = out_cols[order][boundary]
    counts = np.bincount(red_rows, minlength=a.shape[0])
    indptr = np.zeros(a.shape[0] + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return SpgemmPlan(
        a_pos=jnp.asarray(e_ids.astype(np.int32)),
        b_pos=jnp.asarray(b_pos.astype(np.int32)),
        out_slot=jnp.asarray(out_slot.astype(np.int32)),
        indptr=indptr, cols=red_cols.astype(np.int32),
        shape=(a.shape[0], b.shape[1]), out_nnz=out_nnz)


@functools.partial(jax.jit, static_argnames=("out_nnz",))
def spgemm_numeric(plan_a_pos, plan_b_pos, plan_out_slot, a_vals, b_vals,
                   out_nnz: int) -> jnp.ndarray:
    """Device numeric phase: gather both operand values, multiply, and
    segment-sum into the fixed output slots (MXU/VPU path; differentiable
    in both value arrays through the gather/segment-sum pairing)."""
    prod = jnp.take(a_vals, plan_a_pos) * jnp.take(b_vals, plan_b_pos)
    return jax.ops.segment_sum(prod, plan_out_slot, num_segments=out_nnz)


@dataclasses.dataclass(frozen=True)
class PaddedSpgemmPlan:
    """Bucket-padded numeric plan (VERDICT r3 item 5): contributions are
    laid out host-side as per-width-bucket (n_b, w) index matrices, so
    the device phase is gathers from the SMALL value tables + one
    reshape-sum — no runtime scatter (jax.ops.segment_sum on TPU is a
    serial scatter-add at ~0.07 GF/s, the r3 measured wall).

    The output pattern is COO in bucket-major order (rows/cols below);
    callers needing row-major CSR sort host-side — the device values
    never need the permutation."""

    buckets: Tuple  # ((w, pa (n_b,w) int32, pb (n_b,w) int32), ...)
    rows: np.ndarray       # (out_nnz,) bucket-major COO rows
    cols: np.ndarray       # (out_nnz,) bucket-major COO cols
    shape: Tuple[int, int]
    out_nnz: int
    n_products: int


def spgemm_symbolic_padded(a: CSR, b: CSR,
                           max_width: int = 512) -> PaddedSpgemmPlan:
    """Bucket-padded symbolic phase built on spgemm_symbolic's expansion.

    Slots are bucketed by next-pow2 contribution count; slots wider than
    ``max_width`` are split into max_width-wide partial rows, summed in
    a second tiny pass (kept as extra bucket rows whose (row, col)
    repeat — downstream consumers coalesce by construction since the
    padded pads multiply against an appended zero)."""
    if max_width < 1 or max_width & (max_width - 1):
        # the doubling bucket ladder ends at the largest power of two
        # <= max_width; a non-power-of-two cap would leave slots with
        # counts in (2^k, max_width] in no bucket and silently drop
        # their products (advisor finding, round 4)
        raise ValueError(f"max_width must be a power of two, "
                         f"got {max_width}")
    base = spgemm_symbolic(a, b)
    P = int(np.asarray(base.a_pos).shape[0])
    slot = np.asarray(base.out_slot, np.int64)
    order = np.argsort(slot, kind="stable")
    pa_s = np.asarray(base.a_pos, np.int64)[order]
    pb_s = np.asarray(base.b_pos, np.int64)[order]
    slot_s = slot[order]
    counts = np.bincount(slot_s, minlength=base.out_nnz)
    starts = np.zeros(base.out_nnz + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    rows_of_slot = np.repeat(
        np.arange(base.shape[0], dtype=np.int64), np.diff(base.indptr))
    pad_a = int(np.asarray(a.vals).shape[0])   # appended-zero position
    pad_b = int(np.asarray(b.vals).shape[0])
    buckets = []
    all_rows = []
    all_cols = []
    w = 1
    while w <= max_width:
        sel = np.nonzero((counts <= w) & (counts > w // 2))[0]
        if sel.shape[0]:
            idx = starts[sel][:, None] + np.arange(w)[None, :]
            valid = np.arange(w)[None, :] < counts[sel][:, None]
            pa = np.where(valid, pa_s[np.minimum(idx, P - 1)], pad_a)
            pb = np.where(valid, pb_s[np.minimum(idx, P - 1)], pad_b)
            buckets.append((w, pa.astype(np.int32), pb.astype(np.int32)))
            all_rows.append(rows_of_slot[sel])
            all_cols.append(np.asarray(base.cols, np.int64)[sel])
        w *= 2
    # giant slots (> max_width): split into max_width-wide partial rows
    big = np.nonzero(counts > max_width)[0]
    if big.shape[0]:
        pa_rows, pb_rows, r_rows, c_rows = [], [], [], []
        for s in big:
            cnt = int(counts[s])
            n_part = -(-cnt // max_width)
            idx = (starts[s] + np.arange(n_part * max_width)
                   ).reshape(n_part, max_width)
            valid = idx < starts[s] + cnt
            pa_rows.append(np.where(valid,
                                    pa_s[np.minimum(idx, P - 1)], pad_a))
            pb_rows.append(np.where(valid,
                                    pb_s[np.minimum(idx, P - 1)], pad_b))
            r_rows.append(np.full(n_part, rows_of_slot[s]))
            c_rows.append(np.full(n_part, base.cols[s]))
        buckets.append((max_width,
                        np.concatenate(pa_rows).astype(np.int32),
                        np.concatenate(pb_rows).astype(np.int32)))
        all_rows.append(np.concatenate(r_rows))
        all_cols.append(np.concatenate(c_rows))
    rows = (np.concatenate(all_rows) if all_rows
            else np.zeros(0, np.int64)).astype(np.int32)
    cols = (np.concatenate(all_cols) if all_cols
            else np.zeros(0, np.int64)).astype(np.int32)
    return PaddedSpgemmPlan(
        buckets=tuple(buckets), rows=rows, cols=cols, shape=base.shape,
        out_nnz=int(rows.shape[0]), n_products=P)


@jax.jit
def spgemm_numeric_padded(buckets, a_vals, b_vals) -> jnp.ndarray:
    """Device numeric phase over a PaddedSpgemmPlan: per bucket, gather
    both operands from the (small, appended-zero) value tables, multiply
    elementwise, and reduce along the padded width — no scatter.
    Differentiable in both value arrays (gather+sum transpose cleanly)."""
    av = jnp.concatenate([a_vals, jnp.zeros(1, a_vals.dtype)])
    bv = jnp.concatenate([b_vals, jnp.zeros(1, b_vals.dtype)])
    parts = []
    for (_w, pa, pb) in buckets:
        prod = jnp.take(av, pa, axis=0) * jnp.take(bv, pb, axis=0)
        parts.append(prod.sum(axis=1))
    if not parts:  # A @ B with zero products
        return jnp.zeros(0, a_vals.dtype)
    return (jnp.concatenate(parts) if len(parts) > 1 else parts[0])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ProductSpgemmPlan:
    """Product-form SpGEMM numeric plan (r5, VERDICT r4 item 5).

    The slot-merged padded-bucket layout is gather-bound: every product
    issues TWO single-element takes (~2.8 ns each, 140M takes on the
    arxiv 2-hop config -> 0.53 GF/s). This plan instead emits C in
    PRODUCT order as COO-with-duplicates — the representation the
    framework's own sparse consumers accept (the panel/binned engines
    carry duplicate edges; coalesce_duplicates merges when a caller
    needs strict CSR):

      per B-width bucket c:  prod_c = a_stream_c[:, None] * b_ell[rows_c]

    so the A side is ONE nnz_A-element permutation gather (stream
    order) + contiguous slices, and the B side is nnz_A ROW gathers
    from the ELL-padded value table — no per-product takes. Padding
    products are explicit zeros whose (row, col) point at slot 0.
    """

    a_perm: jnp.ndarray            # (nnz_A,) int32: edge -> stream order
    ell_idx: jnp.ndarray           # (ell_rows,) int32 into b_vals (+pad)
    ell_ptr: Tuple[int, ...]       # bucket row offsets into the ell table
    buckets: Tuple                 # ((W, e_lo, e_hi, brow_ids), ...)
    rows: np.ndarray               # (n_out,) int32 COO rows (with dups)
    cols: np.ndarray               # (n_out,) int32 COO cols (with dups)
    shape: Tuple[int, int]
    n_products: int                # true (unpadded) product count
    n_out: int                     # emitted entries incl. padding zeros

    def tree_flatten(self):
        children = (self.a_perm, self.ell_idx,
                    tuple(br for (_, _, _, br) in self.buckets))
        aux = (self.ell_ptr,
               tuple((W, lo, hi) for (W, lo, hi, _) in self.buckets),
               self.shape, self.n_products, self.n_out)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        a_perm, ell_idx, brows = children
        ell_ptr, descs, shape, n_products, n_out = aux
        buckets = tuple((W, lo, hi, br)
                        for (W, lo, hi), br in zip(descs, brows))
        # rows/cols are host-side coordinate arrays, not traced leaves
        return cls(a_perm=a_perm, ell_idx=ell_idx, ell_ptr=ell_ptr,
                   buckets=buckets, rows=None, cols=None, shape=shape,
                   n_products=n_products, n_out=n_out)


def spgemm_symbolic_products(a: CSR, b: CSR,
                             ladder=(1, 2, 4, 8, 16, 32, 64, 128, 256,
                                     512)) -> ProductSpgemmPlan:
    """Host symbolic phase for the product-form numeric (see
    ProductSpgemmPlan). B rows are bucketed by next-ladder width; each
    A edge (i, k) joins the bucket of B row k."""
    if a.shape[1] != b.shape[0]:
        raise ValueError(f"spgemm shape mismatch: {a.shape} @ {b.shape}")
    a_indptr = np.asarray(a.indptr, np.int64)
    a_cols = np.asarray(a.cols, np.int64)
    b_indptr = np.asarray(b.indptr, np.int64)
    b_cols = np.asarray(b.cols, np.int64)
    nnz_a = a_cols.shape[0]
    nnz_b = b_cols.shape[0]
    m = b.shape[0]
    a_rows = np.repeat(np.arange(a.shape[0], dtype=np.int64),
                       np.diff(a_indptr))
    b_deg = np.diff(b_indptr)
    ladder = tuple(sorted(set(int(w) for w in ladder)))
    wmax = ladder[-1]
    # width class per B row (rows with degree 0 never join: their
    # products do not exist); rows wider than wmax get class len(ladder)
    # and are split into ceil(deg/wmax) wmax-wide partial slab rows, the
    # referencing A edge repeated once per part (power-law B: arxiv has
    # degree-1363 rows vs the 512 cap)
    wclass = np.searchsorted(ladder, np.minimum(np.maximum(b_deg, 1),
                                                wmax))
    wclass[b_deg > wmax] = len(ladder)
    a_perm_parts, bucket_descs = [], []
    ell_parts, ell_ptr = [], [0]
    rows_parts, cols_parts = [], []
    e_lo = 0
    n_products = 0
    for c, W in enumerate(ladder):
        rows_c = np.nonzero((wclass == c) & (b_deg > 0))[0]
        edges_c = np.nonzero((wclass[a_cols] == c)
                             & (b_deg[a_cols] > 0))[0]
        if rows_c.shape[0] == 0 or edges_c.shape[0] == 0:
            continue  # rows without referencing edges need no table
        # ELL slab for this bucket: (len(rows_c), W) positions into
        # b_vals, padded with nnz_b (the appended-zero slot)
        base = b_indptr[rows_c][:, None] + np.arange(W)[None, :]
        valid = np.arange(W)[None, :] < b_deg[rows_c][:, None]
        ell = np.where(valid, np.minimum(base, nnz_b - 1), nnz_b)
        ell_parts.append(ell.astype(np.int32).ravel())
        # rank of each B row within the bucket's slab
        rank = np.full(m, -1, np.int64)
        rank[rows_c] = np.arange(rows_c.shape[0])
        a_perm_parts.append(edges_c.astype(np.int32))
        brow_ids = rank[a_cols[edges_c]].astype(np.int32)
        e_hi = e_lo + edges_c.shape[0]
        bucket_descs.append((W, e_lo, e_hi, brow_ids))
        # output coordinates, product order; pads -> (row of the edge,
        # an arbitrary valid col) with an explicit zero value
        pos = ell[brow_ids].reshape(-1)
        oc = b_cols[np.minimum(pos, max(nnz_b - 1, 0))]
        orow = np.repeat(a_rows[edges_c], W)
        rows_parts.append(orow.astype(np.int32))
        cols_parts.append(oc.astype(np.int32))
        n_products += int(b_deg[a_cols[edges_c]].sum())
        e_lo = e_hi
        ell_ptr.append(ell_ptr[-1] + rows_c.shape[0] * W)  # flat elems
    # big class: B rows wider than wmax, split into wmax-wide parts
    big_rows = np.nonzero(b_deg > wmax)[0]
    edges_big = np.nonzero(b_deg[a_cols] > wmax)[0]
    if big_rows.shape[0] and edges_big.shape[0]:
        W = wmax
        n_part = (-(-b_deg[big_rows] // W)).astype(np.int64)
        tot_parts = int(n_part.sum())
        part_owner = np.repeat(big_rows, n_part)          # (tot_parts,)
        part_first = np.cumsum(n_part) - n_part
        within = (np.arange(tot_parts, dtype=np.int64)
                  - np.repeat(part_first, n_part))        # part index
        off = within[:, None] * W + np.arange(W)[None, :]
        base = b_indptr[part_owner][:, None] + off
        valid = off < b_deg[part_owner][:, None]
        ell = np.where(valid, np.minimum(base, nnz_b - 1), nnz_b)
        ell_parts.append(ell.astype(np.int32).ravel())
        part_base = np.full(m, -1, np.int64)
        part_base[big_rows] = part_first
        n_part_of = np.zeros(m, np.int64)
        n_part_of[big_rows] = n_part
        rep = n_part_of[a_cols[edges_big]]                # parts/edge
        a_perm_big = np.repeat(edges_big, rep)
        e_first = np.cumsum(rep) - rep
        within_e = (np.arange(int(rep.sum()), dtype=np.int64)
                    - np.repeat(e_first, rep))
        brow_ids = (np.repeat(part_base[a_cols[edges_big]], rep)
                    + within_e).astype(np.int32)
        a_perm_parts.append(a_perm_big.astype(np.int32))
        e_hi = e_lo + a_perm_big.shape[0]
        bucket_descs.append((W, e_lo, e_hi, brow_ids))
        pos = ell[brow_ids].reshape(-1)
        oc = b_cols[np.minimum(pos, max(nnz_b - 1, 0))]
        orow = np.repeat(a_rows[a_perm_big], W)
        rows_parts.append(orow.astype(np.int32))
        cols_parts.append(oc.astype(np.int32))
        n_products += int(b_deg[a_cols[edges_big]].sum())
        e_lo = e_hi
        ell_ptr.append(ell_ptr[-1] + tot_parts * W)
    a_perm = (np.concatenate(a_perm_parts) if a_perm_parts
              else np.zeros(0, np.int32))
    return ProductSpgemmPlan(
        a_perm=jnp.asarray(a_perm),
        ell_idx=jnp.asarray(np.concatenate(ell_parts) if ell_parts
                            else np.zeros(0, np.int32)),
        ell_ptr=tuple(ell_ptr),
        buckets=tuple((W, lo, hi, jnp.asarray(br))
                      for (W, lo, hi, br) in bucket_descs),
        rows=(np.concatenate(rows_parts) if rows_parts
              else np.zeros(0, np.int32)),
        cols=(np.concatenate(cols_parts) if cols_parts
              else np.zeros(0, np.int32)),
        shape=(a.shape[0], b.shape[1]),
        n_products=int(n_products),
        n_out=int(sum((hi - lo) * W
                      for (W, lo, hi, _)in bucket_descs)),
    )


@functools.partial(jax.jit,
                   static_argnames=("ell_ptr", "widths", "e_bounds"))
def _spgemm_products_jit(a_perm, ell_idx, brows, a_vals,
                         b_vals, *, ell_ptr, widths, e_bounds):
    bv = jnp.concatenate([b_vals, jnp.zeros(1, b_vals.dtype)])
    b_ell_flat = jnp.take(bv, ell_idx, axis=0)
    a_stream = jnp.take(a_vals, a_perm, axis=0)
    outs = []
    for c, W in enumerate(widths):
        lo, hi = e_bounds[c]
        slab = jax.lax.dynamic_slice_in_dim(
            b_ell_flat, ell_ptr[c],
            ell_ptr[c + 1] - ell_ptr[c]).reshape(-1, W)
        a_c = jax.lax.slice_in_dim(a_stream, lo, hi)
        prod = a_c[:, None] * jnp.take(slab, brows[c], axis=0)
        outs.append(prod.reshape(-1))
    return (jnp.concatenate(outs) if len(outs) > 1
            else outs[0] if outs else jnp.zeros(0, a_vals.dtype))


def spgemm_numeric_products(plan: ProductSpgemmPlan, a_vals,
                            b_vals) -> jnp.ndarray:
    """Device numeric phase in product order (COO-with-dups values
    aligned with plan.rows/plan.cols; pads are exact zeros)."""
    widths = tuple(W for (W, _, _, _) in plan.buckets)
    brows = tuple(br for (_, _, _, br) in plan.buckets)
    e_bounds = tuple((lo, hi) for (_, lo, hi, _) in plan.buckets)
    return _spgemm_products_jit(
        plan.a_perm, plan.ell_idx, brows, a_vals, b_vals,
        ell_ptr=plan.ell_ptr, widths=widths, e_bounds=e_bounds)


def spgemm_device(a: CSR, b: CSR,
                  plan: Optional[SpgemmPlan] = None) -> Tuple[CSR, SpgemmPlan]:
    """C = A @ B with the numeric multiply-accumulate on device.

    Returns (C, plan); pass the plan back in to recompute values for new
    A/B values on the same patterns (the training-loop case)."""
    if plan is None:
        plan = spgemm_symbolic(a, b)
    vals = spgemm_numeric(plan.a_pos, plan.b_pos, plan.out_slot,
                          jnp.asarray(a.vals, jnp.float32),
                          jnp.asarray(b.vals, jnp.float32),
                          out_nnz=plan.out_nnz)
    c = CSR.from_arrays(plan.indptr.astype(np.int64), plan.cols,
                        vals, plan.shape)
    return c, plan
