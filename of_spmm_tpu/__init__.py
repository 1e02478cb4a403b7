"""of_spmm_tpu — a TPU-native sparse linear-algebra framework.

A from-scratch JAX/XLA/Pallas re-expression of the capabilities of the
reference OneFlow fork ``yuang-chen/of-spmm`` (see SURVEY.md): CSR/COO sparse
formats and the SpMV/SpMM/SDDMM/SpGEMM operations that back GNN sparse
aggregation (neighbor-feature gather + segment-sum reduction), with

- row-binned load-balanced Pallas kernels (rows binned by nnz into padded
  ELL tiles sized for the 8x128 VPU lane shape),
- a small op registry carrying per-op {reference impl, pallas impl, sharding
  rule} — the analog of the reference's OpRegistry/OpKernelRegistry + GetSbp
  (reference: oneflow/core/framework/user_op_registry.h:62-147),
- gather <-> segment_sum autograd pairing via jax.custom_vjp (reference:
  oneflow/core/autograd/gradient_funcs/gather.cpp:62-73),
- 1-D row partition over a jax.sharding.Mesh with a precomputed halo-exchange
  plan executed inside shard_map (reference precedent: SBP slice views
  oneflow/core/job/nd_sbp_util.cpp:98-106 + NCCL boxing).

Public API (stable):
    from of_spmm_tpu import COO, CSR, BinnedEll
    from of_spmm_tpu.ops import spmv, spmm, sddmm, spgemm, gather, segment_sum
    from of_spmm_tpu.parallel import RowPartition, dist_spmm
    from of_spmm_tpu.models import GCN, GraphSAGE, Embedding
"""

from of_spmm_tpu.sparse.formats import COO, CSR
from of_spmm_tpu.sparse.binned import BinnedEll, EllBucket, bin_rows
from of_spmm_tpu import ops
from of_spmm_tpu import sparse
from of_spmm_tpu import utils

__version__ = "0.1.0"

__all__ = [
    "COO",
    "CSR",
    "BinnedEll",
    "EllBucket",
    "bin_rows",
    "ops",
    "sparse",
    "utils",
    "__version__",
]
