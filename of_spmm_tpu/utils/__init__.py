from of_spmm_tpu.utils.config import FLAGS, on_tpu, pallas_interpret_default
from of_spmm_tpu.utils.roofline import (
    PEAK_HBM_BYTES_PER_S,
    SpmmTraffic,
    detect_peak_bw,
    spmm_report,
    time_fn,
)
from of_spmm_tpu.utils.checkpoint import (
    load_checkpoint,
    load_sharded,
    save_checkpoint,
    save_sharded,
)
from of_spmm_tpu.utils import profiler
from of_spmm_tpu.utils.summary import SummaryWriter, read_events

__all__ = [
    "FLAGS",
    "on_tpu",
    "pallas_interpret_default",
    "PEAK_HBM_BYTES_PER_S",
    "SpmmTraffic",
    "detect_peak_bw",
    "spmm_report",
    "time_fn",
    "load_checkpoint",
    "load_sharded",
    "save_sharded",
    "profiler",
    "SummaryWriter",
    "read_events",
    "save_checkpoint",
]
