from of_spmm_tpu.parallel.partition import RowPartitionPlan, StackedBucket, partition_rows
from of_spmm_tpu.parallel.dist_spmm import default_mesh, dist_spmm, dist_spmm_allgather

__all__ = [
    "RowPartitionPlan",
    "StackedBucket",
    "partition_rows",
    "default_mesh",
    "dist_spmm",
    "dist_spmm_allgather",
]
