from of_spmm_tpu.data.graphs import (
    NAMED_CONFIGS,
    GraphConfig,
    load_graph,
    random_features,
    synthetic_edges,
)

__all__ = [
    "NAMED_CONFIGS",
    "GraphConfig",
    "load_graph",
    "random_features",
    "synthetic_edges",
]
