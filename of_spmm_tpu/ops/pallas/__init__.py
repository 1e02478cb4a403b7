from of_spmm_tpu.ops.pallas.spmm import spmm_pallas

__all__ = ["spmm_pallas"]
