"""Recurrent blocks (ref: src/models/RecurrentBlocks.py)."""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from waveformml_tpu.models.blocks import LinearBlock


class RecurrentBlock(nn.Module):
    """nn.RNN(input_size, hidden, n_layers, batch_first=True) equivalent on
    [B, L, C] (ref: RecurrentBlocks.py:6-22)."""

    input_size: int
    hidden_size: int
    n_layers: int
    nonlinearity: str = "relu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = jax.nn.relu if self.nonlinearity == "relu" else jnp.tanh
        h = x
        for layer in range(self.n_layers):
            cell = nn.SimpleCell(features=self.hidden_size, activation_fn=act,
                                 name=f"cell_{layer}")
            h = nn.RNN(cell, name=f"rnn_{layer}")(h)
            if self.dropout and layer < self.n_layers - 1:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h


class RecurrentNet(nn.Module):
    """RNN → flatten → LinearBlock (ref: RecurrentBlocks.py:25-47)."""

    seq_len: int
    input_size: int
    hidden_size: int
    n_layers: int
    n_lin: int
    out_size: int
    nonlinearity: str = "relu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = RecurrentBlock(self.input_size, self.hidden_size, self.n_layers,
                             self.nonlinearity, self.dropout,
                             name="rnn_block")(x, train=train)
        flat = out.reshape(out.shape[0], -1)
        if self.n_lin > 0:
            return LinearBlock(self.hidden_size * self.seq_len, self.out_size,
                               self.n_lin, name="linear")(flat, train=train)
        if self.out_size == 1:
            return out[:, -1]
        raise IOError("must have n_lin > 0 if out_size is > 1")
