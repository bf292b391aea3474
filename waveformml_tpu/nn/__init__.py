from waveformml_tpu.nn import functional
from waveformml_tpu.nn.layers import (
    Linear, Conv1d, Conv2d, ReLU, LeakyReLU, SELU, GELU, Tanh, Sigmoid,
    Softmax, LogSoftmax, Identity, Dropout, Flatten, BatchNorm1d, BatchNorm2d,
    LayerNorm, MaxPool1d, AvgPool1d, MaxPool2d, AvgPool2d, Sequential,
    RNNLayer, GRULayer, LSTMLayer,
)

__all__ = [
    "functional", "Linear", "Conv1d", "Conv2d", "ReLU", "LeakyReLU", "SELU",
    "GELU", "Tanh", "Sigmoid", "Softmax", "LogSoftmax", "Identity", "Dropout",
    "Flatten", "BatchNorm1d", "BatchNorm2d", "LayerNorm", "MaxPool1d",
    "AvgPool1d", "MaxPool2d", "AvgPool2d", "Sequential", "RNNLayer",
    "GRULayer", "LSTMLayer",
]
