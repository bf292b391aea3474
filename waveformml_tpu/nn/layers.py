"""Flax layer wrappers with torch-style constructor signatures.

These back the config ``algorithm`` DSL (alternating class-name strings and
positional-arg lists — ref: src/utils/util.py:109-137 create_class_instances,
src/models/SCNet.py:23-49 algorithm parsing). The names registered here are
the ones reference configs use ("nn.Conv1d", "nn.Linear", "nn.ReLU", ...).

Layout convention (TPU-native): channels-LAST everywhere —
  1D data: [B, L, C]   2D data: [B, H, W, C]
(torch is channels-first; only shape bookkeeping differs, and
ModelValidation handles the torch-side arithmetic for config checking).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from waveformml_tpu.nn.bn import get_bn_axis
from waveformml_tpu.registry import registry


def _pair(v: Union[int, Sequence[int]]) -> Tuple[int, int]:
    if isinstance(v, (list, tuple)):
        return tuple(v)  # type: ignore
    return (v, v)


@registry.register("Linear", aliases=("nn.Linear",))
class Linear(nn.Module):
    """torch nn.Linear(in_features, out_features, bias=True) equivalent."""

    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Dense(self.out_features, use_bias=self.use_bias,
                        dtype=x.dtype, name="dense")(x)


@registry.register("Conv1d", aliases=("nn.Conv1d",))
class Conv1d(nn.Module):
    """torch nn.Conv1d(nin, nout, k, stride, padding, dilation) on [B, L, C]."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Conv(
            self.out_channels, (self.kernel_size,), strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            kernel_dilation=(self.dilation,), feature_group_count=self.groups,
            use_bias=self.use_bias, dtype=x.dtype, name="conv")(x)


@registry.register("Conv2d", aliases=("nn.Conv2d",))
class Conv2d(nn.Module):
    """torch nn.Conv2d on [B, H, W, C]."""

    in_channels: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]]
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    dilation: Union[int, Sequence[int]] = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s, p, d = (_pair(self.kernel_size), _pair(self.stride),
                      _pair(self.padding), _pair(self.dilation))
        return nn.Conv(
            self.out_channels, k, strides=s,
            padding=[(p[0], p[0]), (p[1], p[1])],
            kernel_dilation=d, feature_group_count=self.groups,
            use_bias=self.use_bias, dtype=x.dtype, name="conv")(x)


# -- activations -------------------------------------------------------------------

def _act_module(name: str, aliases: Tuple[str, ...], fn: Callable):
    @registry.register(name, aliases=aliases)
    class _Act(nn.Module):
        __doc__ = f"torch nn.{name} equivalent."

        def __call__(self, x, train: bool = False):
            return fn(x)

    _Act.__name__ = name
    return _Act


ReLU = _act_module("ReLU", ("nn.ReLU",), jax.nn.relu)
SELU = _act_module("SELU", ("nn.SELU",), jax.nn.selu)
GELU = _act_module("GELU", ("nn.GELU",), jax.nn.gelu)
Tanh = _act_module("Tanh", ("nn.Tanh",), jnp.tanh)
Sigmoid = _act_module("Sigmoid", ("nn.Sigmoid",), jax.nn.sigmoid)
Identity = _act_module("Identity", ("nn.Identity",), lambda x: x)


@registry.register("LeakyReLU", aliases=("nn.LeakyReLU",))
class LeakyReLU(nn.Module):
    negative_slope: float = 0.01

    def __call__(self, x, train: bool = False):
        return jax.nn.leaky_relu(x, self.negative_slope)


def _torch_dim_to_axis(dim: int, ndim: int) -> int:
    """Map a torch-convention `dim` (channels-first [B, C, *S]) onto the
    channels-last layout these layers run on ([B, *S, C]). Identity for
    2-D inputs, where both layouts agree."""
    if ndim <= 2:
        return dim
    d = dim if dim >= 0 else dim + ndim
    if d == 0:
        return 0
    if d == 1:           # torch channel axis -> last
        return ndim - 1
    return d - 1         # torch spatial axes shift left by one


@registry.register("Softmax", aliases=("nn.Softmax",))
class Softmax(nn.Module):
    dim: int = -1

    def __call__(self, x, train: bool = False):
        return jax.nn.softmax(x, axis=_torch_dim_to_axis(self.dim, x.ndim))


@registry.register("LogSoftmax", aliases=("nn.LogSoftmax",))
class LogSoftmax(nn.Module):
    dim: int = -1

    def __call__(self, x, train: bool = False):
        return jax.nn.log_softmax(x, axis=_torch_dim_to_axis(self.dim, x.ndim))


@registry.register("Dropout", aliases=("nn.Dropout",))
class Dropout(nn.Module):
    rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Dropout(self.rate, deterministic=not train)(x)


@registry.register("Flatten", aliases=("nn.Flatten",))
class Flatten(nn.Module):
    start_dim: int = 1

    def __call__(self, x, train: bool = False):
        return x.reshape(x.shape[: self.start_dim] + (-1,))


# -- norms -------------------------------------------------------------------------

@registry.register("BatchNorm1d", aliases=("nn.BatchNorm1d",))
class BatchNorm1d(nn.Module):
    """torch nn.BatchNorm1d(num_features) on channels-last input."""

    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=1 - self.momentum,
                            epsilon=self.eps, dtype=x.dtype,
                            axis_name=get_bn_axis() if train else None,
                            name="bn")(x)


@registry.register("BatchNorm2d", aliases=("nn.BatchNorm2d",))
class BatchNorm2d(BatchNorm1d):
    pass


@registry.register("LayerNorm", aliases=("nn.LayerNorm",))
class LayerNorm(nn.Module):
    """torch nn.LayerNorm(normalized_shape): normalizes (and carries affine
    params) over the trailing len(normalized_shape) axes, not only the last."""

    normalized_shape: Any = None
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        shape = self.normalized_shape
        k = 1 if shape is None or isinstance(shape, int) \
            else max(1, len(tuple(shape)))
        # torch's normalized_shape names the trailing k axes of the
        # CHANNELS-FIRST activation [B, C, *S]; these layers run
        # channels-last [B, *S, C], so translate:
        #   k == ndim-1 → every non-batch axis (C and all spatial)
        #   k <  ndim-1 → the last k SPATIAL axes, i.e. skip the trailing
        #                 channel axis (e.g. LayerNorm(L) after Conv1d
        #                 normalizes samples, not channels)
        if k >= x.ndim - 1:
            axes = tuple(range(-(x.ndim - 1), 0))
        else:
            axes = tuple(range(-1 - k, -1))
        return nn.LayerNorm(epsilon=self.eps, dtype=x.dtype,
                            reduction_axes=axes, feature_axes=axes)(x)


# -- pooling -----------------------------------------------------------------------

@registry.register("MaxPool1d", aliases=("nn.MaxPool1d",))
class MaxPool1d(nn.Module):
    kernel_size: int
    stride: Optional[int] = None

    def __call__(self, x, train: bool = False):
        s = self.stride or self.kernel_size
        return nn.max_pool(x, (self.kernel_size,), strides=(s,))


@registry.register("AvgPool1d", aliases=("nn.AvgPool1d",))
class AvgPool1d(nn.Module):
    kernel_size: int
    stride: Optional[int] = None

    def __call__(self, x, train: bool = False):
        s = self.stride or self.kernel_size
        return nn.avg_pool(x, (self.kernel_size,), strides=(s,))


@registry.register("MaxPool2d", aliases=("nn.MaxPool2d",))
class MaxPool2d(nn.Module):
    kernel_size: Union[int, Sequence[int]]
    stride: Optional[Union[int, Sequence[int]]] = None

    def __call__(self, x, train: bool = False):
        k = _pair(self.kernel_size)
        s = _pair(self.stride) if self.stride else k
        return nn.max_pool(x, k, strides=s)


@registry.register("AvgPool2d", aliases=("nn.AvgPool2d",))
class AvgPool2d(nn.Module):
    kernel_size: Union[int, Sequence[int]]
    stride: Optional[Union[int, Sequence[int]]] = None

    def __call__(self, x, train: bool = False):
        k = _pair(self.kernel_size)
        s = _pair(self.stride) if self.stride else k
        return nn.avg_pool(x, k, strides=s)


# -- recurrent ---------------------------------------------------------------------

@registry.register("RNNLayer", aliases=("nn.RNN",))
class RNNLayer(nn.Module):
    """torch nn.RNN(input_size, hidden_size, num_layers, batch_first=True)
    equivalent on [B, L, C] via lax.scan cells (ref: src/models/RecurrentBlocks.py)."""

    input_size: int
    hidden_size: int
    num_layers: int = 1
    nonlinearity: str = "tanh"

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = jnp.tanh if self.nonlinearity == "tanh" else jax.nn.relu
        h = x
        for layer in range(self.num_layers):
            cell = nn.SimpleCell(features=self.hidden_size,
                                 activation_fn=act, name=f"cell_{layer}")
            rnn = nn.RNN(cell, name=f"rnn_{layer}")
            h = rnn(h)
        return h


@registry.register("GRULayer", aliases=("nn.GRU",))
class GRULayer(nn.Module):
    input_size: int
    hidden_size: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        for layer in range(self.num_layers):
            h = nn.RNN(nn.GRUCell(features=self.hidden_size, name=f"cell_{layer}"),
                       name=f"rnn_{layer}")(h)
        return h


@registry.register("LSTMLayer", aliases=("nn.LSTM",))
class LSTMLayer(nn.Module):
    input_size: int
    hidden_size: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        for layer in range(self.num_layers):
            h = nn.RNN(nn.LSTMCell(features=self.hidden_size, name=f"cell_{layer}"),
                       name=f"rnn_{layer}")(h)
        return h


# -- composition -------------------------------------------------------------------

class Sequential(nn.Module):
    """Sequential container passing the ``train`` flag through
    (equivalent of the reference's nn.Sequential algorithm stacks)."""

    layers: Sequence[Any]

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, layer in enumerate(self.layers):
            x = layer(x, train=train)
        return x
