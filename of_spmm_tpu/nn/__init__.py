"""nn — module library (the reference's python/oneflow/nn surface)."""

from of_spmm_tpu.nn import losses
from of_spmm_tpu.nn.attention import MultiheadAttention, scaled_dot_product_attention
from of_spmm_tpu.nn.conv import (
    ConvTranspose2d,
    AdaptiveAvgPool2d,
    AvgPool2d,
    Conv1d,
    Conv2d,
    MaxPool2d,
)
from of_spmm_tpu.nn.rnn import GRU, LSTM, RNN
from of_spmm_tpu.nn.gnn import GATConv, GCNConv, GINConv, SAGEConv
from of_spmm_tpu.nn.layers import (
    GroupNorm,
    InstanceNorm2d,
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
    "Conv1d",
    "Conv2d",
    "MaxPool2d",
    "AvgPool2d",
    "AdaptiveAvgPool2d",
    "LSTM",
    "GRU",
    "RNN",
    "MultiheadAttention",
    "scaled_dot_product_attention",
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
