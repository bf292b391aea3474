"""Per-waveform networks (ref: src/models/WaveformModels.py).

Input is [N, S] single waveforms (or [N, S(+3)] with detector-number coords
appended by the LitWaveform task). Internally channels-last [N, L, C]. Flatten
order follows torch's (C, L) so linear sizes match the reference arithmetic.
"""
from __future__ import annotations

from math import floor
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from waveformml_tpu.config import to_dict
from waveformml_tpu.models.blocks import (
    Conv1DNet, LinearBlock, LinearPlanes, TemporalConvNet)
from waveformml_tpu.models.recurrent_blocks import RecurrentNet
from waveformml_tpu.registry import registry


@registry.register("TemporalWaveformNet", aliases=("WaveformModels.TemporalWaveformNet",))
class TemporalWaveformNet(nn.Module):
    """TCN + linear head (ref: WaveformModels.py:7-39)."""

    config: Any

    def setup(self):
        hp = self.config.net_config.hparams
        self.nsamples = self.config.system_config.n_samples
        self.output_size = getattr(hp, "out_size", 1)
        expand_factor = float(hp.expansion_factor / hp.n_expand)
        planes = [int(round(expand_factor * (i + 1))) for i in range(hp.n_expand)]
        contract_factor = float((hp.expansion_factor - hp.out_planes) / hp.n_contract)
        planes += [int(round(contract_factor * (hp.n_contract - i - 1)))
                   for i in range(hp.n_contract)]
        planes[-1] = hp.out_planes
        if min(planes) < 1:
            # the reference's formula (WaveformModels.py:19-25) can yield
            # 0-channel levels for small expansion factors; torch would error
            # at Conv1d construction, flax would silently build a dead trunk —
            # clamp to 1 channel instead
            import logging
            logging.getLogger(__name__).warning(
                "TCN plane schedule %s contains empty levels; clamping to 1",
                planes)
            planes = [max(1, p) for p in planes]
        self.model = TemporalConvNet(1, planes, **to_dict(hp.conv_params))
        self.n_lin = hp.n_lin
        if hp.n_lin > 0:
            self.linear = LinearBlock(self.nsamples * planes[-1],
                                      self.output_size, hp.n_lin)

    def __call__(self, x, train: bool = False):
        # x: [N, S] → [N, S, 1]
        h = x[..., None] if x.ndim == 2 else x
        h = self.model(h, train=train)
        if self.n_lin > 0:
            h = jnp.transpose(h, (0, 2, 1)).reshape(h.shape[0], -1)  # (C, L) order
            h = self.linear(h, train=train)
        return h


@registry.register("LinearWaveformNet", aliases=("WaveformModels.LinearWaveformNet",))
class LinearWaveformNet(nn.Module):
    """MLP over raw samples (ref: WaveformModels.py:42-85)."""

    config: Any

    def setup(self):
        hp = self.config.net_config.hparams
        nsamples = self.config.system_config.n_samples
        out_size = getattr(hp, "out_size", 1)
        planes = [nsamples]
        if getattr(hp, "n_expand", 0) > 0:
            if not hasattr(hp, "expansion_factor"):
                raise IOError("hparams.expansion_factor must be set if n_expand > 0")
            expand = float((planes[0] * hp.expansion_factor - planes[0]) / hp.n_expand)
            planes += [int(round(planes[0] + expand * (i + 1))) for i in range(hp.n_expand)]
            n_contract = getattr(hp, "n_contract", None)
            if n_contract is None:
                if hasattr(hp, "n_lin"):
                    n_contract = hp.n_lin - hp.n_expand
                else:
                    raise IOError("if n_expand is set, must either set n_contract or n_lin")
            contract = float((planes[-1] - out_size) / n_contract)
            start_n = planes[-1]
            planes += [int(round(start_n - contract * (i + 1))) for i in range(n_contract)]
            planes[-1] = out_size
        if len(planes) == 1:
            if not hasattr(hp, "n_lin"):
                raise IOError("hparams.n_lin must be >= 1 if n_expand/n_contract unset")
            self.net = LinearBlock(nsamples, out_size, hp.n_lin)
        else:
            self.net = LinearPlanes(planes, activation=jax.nn.relu)

    def __call__(self, x, train: bool = False):
        return self.net(x, train=train)


@registry.register("RecurrentWaveformNet", aliases=("WaveformModels.RecurrentWaveformNet",))
class RecurrentWaveformNet(nn.Module):
    """RNN over samples (ref: WaveformModels.py:88-105)."""

    config: Any

    def setup(self):
        hp = self.config.net_config.hparams
        nsamples = self.config.system_config.n_samples
        if self.config.net_config.net_type != "RNN":
            raise IOError(f"{self.config.net_config.net_type} not supported net type")
        self.model = RecurrentNet(nsamples, 1, hp.n_hidden, hp.n_layers,
                                  hp.n_lin, hp.out_size, **to_dict(hp.rnn_params))

    def __call__(self, x, train: bool = False):
        h = x[..., None] if x.ndim == 2 else x  # [N, S, 1]
        return self.model(h, train=train)


@registry.register("ConvWaveformNet", aliases=("WaveformModels.ConvWaveformNet",))
class ConvWaveformNet(nn.Module):
    """1D CNN, optionally with a detector-number side channel concatenated
    after the convolution (ref: WaveformModels.py:108-146)."""

    config: Any

    def setup(self):
        hp = self.config.net_config.hparams
        nc = self.config.net_config
        self.nsamples = self.config.system_config.n_samples
        self.use_detector_number = bool(getattr(nc, "use_detector_number", False))
        num_inputs = self.nsamples - 3 if self.use_detector_number else self.nsamples
        if nc.net_type != "CNN":
            raise IOError(f"{nc.net_type} not supported net type")
        self.model = Conv1DNet(num_inputs, **to_dict(hp.cnn_params))
        self.has_lin = hasattr(hp, "n_lin")
        if self.has_lin:
            out_len, out_ch = self.model.out_shape()
            out = out_len * out_ch
            if self.use_detector_number:
                out += 3
            lin_planes = [int(floor(out - i * ((out - hp.out_size) / hp.n_lin)))
                          for i in range(hp.n_lin + 1)]
            self.linear = LinearPlanes(lin_planes, activation=jax.nn.relu)

    def __call__(self, x, train: bool = False):
        # x: [N, S] (last 3 entries are normalized det coords when enabled)
        det = None
        if self.use_detector_number:
            det = x[:, self.nsamples - 3:]
            h = x[:, : self.nsamples - 3][..., None]
        else:
            h = x[..., None]
        h = self.model(h, train=train)
        if self.has_lin:
            h = jnp.transpose(h, (0, 2, 1)).reshape(h.shape[0], -1)
            if det is not None:
                h = jnp.concatenate([h, det], axis=1)
            h = self.linear(h, train=train)
        return h
