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
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from of_spmm_tpu.ops import reference as ref
from of_spmm_tpu.ops.pallas.spmm import spmm_pallas
from of_spmm_tpu.sparse.binned import DEFAULT_LADDER, BinnedEll, bin_rows
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
    coo_rows: jnp.ndarray  # (nnz,) original pattern (CSR order)
    coo_cols: jnp.ndarray  # (nnz,)
    coo_vals: jnp.ndarray  # (nnz,) — vector path + sddmm vals-grads
    shape: Tuple[int, int]

    def tree_flatten(self):
        children = (self.binned, self.binned_t, self.coo_rows, self.coo_cols,
                    self.coo_vals)
        return children, (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        binned, binned_t, coo_rows, coo_cols, coo_vals = children
        (shape,) = aux
        return cls(binned=binned, binned_t=binned_t, coo_rows=coo_rows,
                   coo_cols=coo_cols, coo_vals=coo_vals, shape=shape)

    @property
    def T(self) -> "SpmmOperator":
        return SpmmOperator(
            binned=self.binned_t, binned_t=self.binned,
            coo_rows=self.coo_cols, coo_cols=self.coo_rows,
            coo_vals=self.coo_vals,
            shape=(self.shape[1], self.shape[0]),
        )

    def __matmul__(self, x: jnp.ndarray) -> jnp.ndarray:
        return spmm(self, x)


def make_operator(
    a: CSR | COO,
    ladder: Sequence[int] = DEFAULT_LADDER,
) -> SpmmOperator:
    """Build the plan: bin A and A^T (host-side, once per graph)."""
    csr = CSR.from_coo(a) if isinstance(a, COO) else a
    coo = csr.to_coo()
    return SpmmOperator(
        binned=bin_rows(csr, ladder=ladder),
        binned_t=bin_rows(csr.transpose(), ladder=ladder),
        coo_rows=coo.rows,
        coo_cols=coo.cols,
        coo_vals=coo.vals,
        shape=csr.shape,
    )


def _select_impl(impl: str) -> str:
    if impl == "auto":
        impl = FLAGS.get("OFS_DEFAULT_IMPL")
    if impl == "auto":
        impl = "pallas" if on_tpu() else "xla"
    return impl


def _spmm_impl(binned: BinnedEll, x: jnp.ndarray, impl: str) -> jnp.ndarray:
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


def spmm(op: SpmmOperator, x: jnp.ndarray, impl: str = "auto") -> jnp.ndarray:
    """Differentiable Y = A @ X. bwd(dX) = A^T @ dY via the transpose plan."""
    return _spmm_vjp(op, x, _select_impl(impl))


def spmv(op: SpmmOperator, x: jnp.ndarray) -> jnp.ndarray:
    """Differentiable y = A @ x for a vector x (edge-list path).

    Differentiates through the gather/segment_sum pair above, so the
    backward is segment-sum of cotangents — exactly the reference pairing.
    """
    contrib = op.coo_vals * gather(x, op.coo_cols)
    return segment_sum(contrib, op.coo_rows, op.shape[0])


def sddmm(op: SpmmOperator, lhs: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Pattern-restricted (lhs @ rhs^T): out[e] = lhs[rows[e]] . rhs[cols[e]].

    Differentiable in lhs/rhs via the gather pair — this is the vals-grad
    path for edge-weight training (GAT-style models).
    """
    le = gather(lhs, op.coo_rows)
    re = gather(rhs, op.coo_cols)
    return jnp.sum(le * re, axis=-1)
