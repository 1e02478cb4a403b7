"""nn — module library (the reference's python/oneflow/nn surface)."""

from of_spmm_tpu.nn import losses
from of_spmm_tpu.nn.gnn import GATConv, GCNConv, GINConv, SAGEConv
from of_spmm_tpu.nn.layers import (
    BatchNorm,
    Dropout,
    Embedding,
    LayerNorm,
    Linear,
    elu,
    gelu,
    leaky_relu,
    log_softmax,
    relu,
    sigmoid,
    silu,
    softmax,
    tanh,
)
from of_spmm_tpu.nn.module import Sequential, is_stateful, param_bytes, param_count

__all__ = [
    "losses",
    "Linear",
    "Dropout",
    "LayerNorm",
    "BatchNorm",
    "Embedding",
    "Sequential",
    "param_count",
    "param_bytes",
    "is_stateful",
    "GCNConv",
    "SAGEConv",
    "GATConv",
    "GINConv",
    "relu",
    "gelu",
    "silu",
    "sigmoid",
    "tanh",
    "softmax",
    "log_softmax",
    "leaky_relu",
    "elu",
]
