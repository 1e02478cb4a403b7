from of_spmm_tpu.models.gcn import GCN, normalized_adjacency
from of_spmm_tpu.models.sage import GraphSAGE, mean_adjacency
from of_spmm_tpu.models.embedding import Embedding
from of_spmm_tpu.models.gat import GAT
from of_spmm_tpu.models.sharded_embedding import ShardedEmbedding

__all__ = [
    "GCN",
    "normalized_adjacency",
    "GraphSAGE",
    "mean_adjacency",
    "Embedding",
    "GAT",
    "ShardedEmbedding",
]
