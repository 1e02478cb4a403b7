from of_spmm_tpu.data.cache import cache_path, cache_root, cached
from of_spmm_tpu.data.dataset import (
    DataLoader,
    Dataset,
    ShardedDataset,
    TensorDataset,
    TokenDataset,
    shard_dataset,
)
from of_spmm_tpu.data.graphs import (
    NAMED_CONFIGS,
    GraphConfig,
    load_graph,
    random_features,
    synthetic_edges,
)

__all__ = [
    "DataLoader",
    "Dataset",
    "TensorDataset",
    "TokenDataset",
    "ShardedDataset",
    "shard_dataset",
    "cached",
    "cache_root",
    "cache_path",
    "NAMED_CONFIGS",
    "GraphConfig",
    "load_graph",
    "random_features",
    "synthetic_edges",
]
