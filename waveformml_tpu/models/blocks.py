"""Dense building blocks (Flax) mirroring the reference's generator semantics.

Channel schedules, kernel/stride/pad/dilation decay formulas reproduce
src/models/ConvBlocks.py exactly (DilationBlock :10-46, LinearPlanes :49-62,
PointwiseReducer :65-77, LinearBlock :82-102, Chomp/TemporalBlock/
TemporalConvNet :105-173, Conv1DNet :176-217, Conv2DBlock :220-289) so that
configs produce identical layer shapes. Layout is channels-last ([B, L, C] /
[B, H, W, C]); the TCN uses weight-normalized causal convolutions like the
reference (weight_norm + chomp ≡ left-pad causal conv).
"""
from __future__ import annotations

from math import ceil, floor, pow as fpow
from typing import Any, Callable, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from waveformml_tpu.nn.bn import get_bn_axis

from waveformml_tpu.models.schedules import (
    get_frame_contraction, get_frame_expansion)


class MaskedArrayBatchNorm(nn.Module):
    """BatchNorm over channels-last arrays whose leading-dim entries may be
    padding. Statistics are computed over real entries only (mask [B] or [N]),
    synced across the data mesh when a BN axis is set — so padded static-shape
    batches reproduce the reference's unpadded single-GPU BN numerics exactly
    (SURVEY §7.3: padding must not change numerics)."""

    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1  # torch semantics: ra = (1-m)*ra + m*batch

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        if mask is None:
            mask = jnp.ones(x.shape[0], dtype=bool)
        m = mask.reshape((x.shape[0],) + (1,) * (x.ndim - 1)).astype(x.dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.num_features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.num_features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (self.num_features,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,))
        red_axes = tuple(range(x.ndim - 1))
        if train:
            axis = get_bn_axis()
            # batch statistics accumulate in f32 (torch BatchNorm1d / flax
            # BatchNorm parity): a bf16 count is exact only up to 256 masked
            # rows, and bf16 sums would bias mean/var and the running stats
            xf = x.astype(jnp.float32)
            mf = m.astype(jnp.float32)
            # per-channel count of real elements
            count = jnp.sum(jnp.broadcast_to(mf, x[..., :1].shape))
            xsum = jnp.sum(xf * mf, axis=red_axes)
            if axis is not None:
                count = jax.lax.psum(count, axis)
                xsum = jax.lax.psum(xsum, axis)
            count = jnp.maximum(count, 1.0)
            mean = xsum / count
            vsum = jnp.sum(((xf - mean) ** 2) * mf, axis=red_axes)
            if axis is not None:
                vsum = jax.lax.psum(vsum, axis)
            var = vsum / count
            if not self.is_initializing():
                mom = self.momentum
                # torch updates running_var with the UNBIASED batch variance
                # (Bessel), while normalizing with the biased one
                var_unbiased = vsum / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (1 - mom) * ra_mean.value + mom * mean
                ra_var.value = (1 - mom) * ra_var.value + mom * var_unbiased
            mean = mean.astype(x.dtype)
            var = var.astype(x.dtype)
        else:
            mean = ra_mean.value.astype(x.dtype)
            var = ra_var.value.astype(x.dtype)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class LinearPlanes(nn.Module):
    """MLP through an explicit plane list (ref: ConvBlocks.py:49-62)."""

    planes: Sequence[int]
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(len(self.planes) - 1):
            x = nn.Dense(int(round(self.planes[i + 1])), dtype=x.dtype,
                         name=f"dense_{i}")(x)
            if self.activation is not None:
                x = self.activation(x)
        return x


class LinearBlock(nn.Module):
    """Geometric interpolation from nin to nout over n layers
    (ref: ConvBlocks.py:82-102): plane i = round(nin * (nout/nin)^(i/n))."""

    nin: int
    nout: int
    n: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.n > 0 and self.nin > 0
        factor = fpow(float(self.nout) / self.nin, 1.0 / self.n)
        for i in range(self.n):
            x = nn.Dense(int(round(self.nin * fpow(factor, i + 1))),
                         dtype=x.dtype, name=f"dense_{i}")(x)
        return x


class FoldedSiteLinear(nn.Module):
    """First linear layer over a flattened dense grid, computed sparsely.

    ``Linear(flatten([B, C, NX, NY]))`` with zeros at inactive sites, without
    materializing the [B, C·NX·NY] activation gradient-free. Weight layout
    matches torch (C, H, W) flatten order: column index = c·(NX·NY) + x·NY + y,
    so the parameters are interchangeable with an ``nn.Dense(features)`` over
    the flattened dense grid.

    Two mathematically identical execution paths, selected by estimated HBM
    traffic (``mode='auto'``):

    - **gather**: per-row contraction against the weight columns of each
      row's site + segment-sum over events. Fwd gathers [C, N, F] from the
      kernel; bwd re-reads it for d_rows and scatter-adds d_kernel. Total
      traffic ~3·N·C·F — wins when C·F is small.
    - **dense**: scatter-add rows into [B·S, C] once (S = NX·NY), then ONE
      MXU GEMM ``[B, S·C] × [C·S→F]`` (einsum reshapes, no transpose copy).
      Bwd is a GEMM for d_kernel and a cheap gather for d_rows. Traffic
      ~3·B·S·C + GEMM operands — wins at wide channels, where the gather
      path's [C, N, F] weight-gather (1.8 GB at C=256) dominates the step
      (measured: full train step 43.7 ms gather vs ~20 ms dense at C=256,
      B=4096; see docs/PERF_NOTES.md MFU study).
    - **bysite**: site-grouped GEMM over a host-prefetched ``[S, MAX]`` slot
      layout (ops/site_head.py — the MoE grouped-GEMM pattern with detector
      sites as the experts). ~50× less arithmetic than dense (no work on the
      ~98%-zero grid) and no [B·S, C] operand in fwd OR bwd; used whenever
      the layout was shipped with the batch (``batch.plans``), which
      ``LitBase.add_row_plans`` does once the model has been traced.
    """

    cin: int
    features: int
    mode: str = "auto"
    # dense-operand size above which the backward rematerializes it
    # (jax.checkpoint) instead of saving the [B·S, C] residual
    remat_bytes: int = 512 << 20

    @nn.compact
    def __call__(self, rows, batch) -> jax.Array:
        from waveformml_tpu.detector import NX, NY

        S = NX * NY
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.cin * S, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        mode = self.mode
        plans = batch.plans or {}
        if mode in ("auto", "bysite"):
            # record the layout requirement while tracing (flax init) so the
            # task's prepare_block host-builds it for every later batch —
            # same mechanism as the row-conv neighbor plans
            from waveformml_tpu.ops.row_conv import _record_requirement
            _record_requirement("site", 0, None)
            if "site_take" in plans:
                mode = "bysite"
            elif mode == "bysite":
                raise ValueError(
                    "FoldedSiteLinear(mode='bysite') needs the host site "
                    "layout in batch.plans (site_take/site_ev/site_s); run "
                    "through LitBase.prepare_block or pass mode='auto'")
            # else: stay 'auto' — the width heuristic below picks dense/gather
        if mode == "bysite":
            from waveformml_tpu.ops.site_head import site_grouped_matmul

            k3 = kernel.astype(rows.dtype).reshape(self.cin, S, self.features)
            out = site_grouped_matmul(
                rows, k3, plans["site_take"], plans["site_ev"],
                plans["site_s"], batch.n_events)
            return out.astype(rows.dtype) + bias.astype(rows.dtype)
        if mode == "auto":
            # gather-path traffic / dense-path traffic = N·F / (B·S) ≈ 3F/S
            # (multiplicity ~3) — batch-independent, so the switch is a
            # width-only threshold. Measured on TPU (B=4096..65536): ratio
            # 2.7 (C=64) → gather ties or wins; 3.9 (C=128) and 5.5 (C=256)
            # → dense wins 1.5–2.2× (docs/PERF_NOTES.md MFU study).
            n_rows = rows.shape[0]
            gather_bytes = n_rows * self.cin * self.features
            dense_bytes = batch.n_events * S * self.cin
            mode = "dense" if gather_bytes > 3 * dense_bytes else "gather"
        rows = jnp.where(batch.mask[:, None], rows, 0)
        if mode == "dense":
            flat_site = batch.flat_site()

            def dense_head(rows_in, kernel_in, bias_in):
                k3 = kernel_in.astype(rows_in.dtype).reshape(
                    self.cin, S, self.features)
                flat = jnp.zeros((batch.n_events * S, self.cin),
                                 rows_in.dtype)
                flat = flat.at[flat_site].add(rows_in, mode="drop")
                dense = flat.reshape(batch.n_events, S, self.cin)
                out = jnp.einsum("bsc,csf->bf", dense, k3,
                                 preferred_element_type=jnp.float32)
                return out.astype(rows_in.dtype) + bias_in.astype(
                    rows_in.dtype)

            # the [B·S, C] dense operand is the step's largest activation
            # (2.6 GB at B=16k, C=512); past ~512 MB rematerialize it in the
            # backward pass instead of saving it — the rebuild is one cheap
            # scatter vs an HBM-budget blowout (measured RESOURCE_EXHAUSTED
            # at 16384×512 without remat)
            dense_bytes = batch.n_events * S * self.cin * rows.dtype.itemsize
            if dense_bytes > self.remat_bytes:
                dense_head = jax.checkpoint(dense_head)
            return dense_head(rows, kernel, bias)
        k = kernel.astype(rows.dtype).reshape(self.cin, S, self.features)
        site = (batch.x * NY + batch.y).astype(jnp.int32)
        kg = k[:, site, :]                                   # [C, N, F] gather
        rowlog = jnp.einsum("nc,cnf->nf", rows, kg)
        ev = jnp.where(batch.mask, batch.event, batch.n_events)
        out = jnp.zeros((batch.n_events + 1, self.features), rows.dtype)
        out = out.at[ev].add(rowlog, mode="drop")[: batch.n_events]
        return out + bias.astype(rows.dtype)


class PointwiseReducer(nn.Module):
    """1×1-conv plane reduction with ReLU (ref: ConvBlocks.py:65-77)."""

    planes: Sequence[int]

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(len(self.planes) - 1):
            x = nn.Dense(int(round(self.planes[i + 1])), use_bias=False,
                         dtype=x.dtype, name=f"pw_{i}")(x)
            x = jax.nn.relu(x)
        return x


class DilationBlock(nn.Module):
    """Dilated Conv1d stack with linear channel interpolation
    (ref: ConvBlocks.py:10-46). Input [B, L, C]."""

    nin: int
    nout: int
    n: int
    length: int
    size_factor: int = 3
    pad_factor: float = 0
    stride_factor: int = 1
    dil_factor: float = 2.0

    @staticmethod
    def schedule(nin, nout, n, size_factor=3, pad_factor=0, stride_factor=1,
                 dil_factor=2.0) -> List[Tuple[int, int, int, int, int, int]]:
        if nin != nout:
            diff = float(nin - nout) / n
            nframes = [int(floor(nin - diff * i)) for i in range(n + 1)]
        else:
            nframes = [nin] * (n + 1)
        out = []
        for i in range(n):
            fs = max(3, int(floor(size_factor / (i + 1.0))))
            st = max(1, stride_factor - int(floor((stride_factor - 1) / (i + 1.0))))
            dil = int(round(dil_factor ** i))
            pd = int(floor(pad_factor * (fs - 1) * dil_factor))
            out.append((nframes[i], nframes[i + 1], fs, st, pd, dil))
        return out

    def out_length(self) -> int:
        length = self.length
        for (_, _, fs, st, pd, dil) in self.schedule(
                self.nin, self.nout, self.n, self.size_factor, self.pad_factor,
                self.stride_factor, self.dil_factor):
            length = (length + 2 * pd - fs - (fs - 1) * (dil - 1)) // st + 1
        return int(length)

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        for i, (cin, cout, fs, st, pd, dil) in enumerate(self.schedule(
                self.nin, self.nout, self.n, self.size_factor, self.pad_factor,
                self.stride_factor, self.dil_factor)):
            x = nn.Conv(cout, (fs,), strides=(st,), padding=[(pd, pd)],
                        kernel_dilation=(dil,), dtype=x.dtype, name=f"conv_{i}")(x)
            x = MaskedArrayBatchNorm(cout, name=f"bn_{i}")(x, mask=mask, train=train)
            x = jax.nn.relu(x)
        return x


class TemporalBlock(nn.Module):
    """TCN residual block: two weight-normed causal dilated convs + residual
    (ref: ConvBlocks.py:114-151). The torch version right-pads then chomps;
    causal left-padding is numerically identical."""

    n_inputs: int
    n_outputs: int
    kernel_size: int
    dilation: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) * self.dilation

        def causal_conv(h, name):
            conv = nn.WeightNorm(nn.Conv(
                self.n_outputs, (self.kernel_size,), strides=(1,),
                padding=[(pad, 0)], kernel_dilation=(self.dilation,),
                kernel_init=nn.initializers.normal(0.01), dtype=h.dtype,
                name=name))
            return conv(h)

        out = causal_conv(x, "conv1")
        out = jax.nn.relu(out)
        if self.dropout:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out = causal_conv(out, "conv2")
        out = jax.nn.relu(out)
        if self.dropout:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        if self.n_inputs != self.n_outputs:
            res = nn.Conv(self.n_outputs, (1,),
                          kernel_init=nn.initializers.normal(0.01),
                          dtype=x.dtype, name="downsample")(x)
        else:
            res = x
        return jax.nn.relu(out + res)


class TemporalConvNet(nn.Module):
    """Dilated TCN stack, dilation 2^i per level (ref: ConvBlocks.py:154-173).
    Input [B, L, C]."""

    num_inputs: int
    num_channels: Sequence[int]
    kernel_size: int = 3
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, ch in enumerate(self.num_channels):
            nin = self.num_inputs if i == 0 else self.num_channels[i - 1]
            x = TemporalBlock(nin, ch, self.kernel_size, dilation=2 ** i,
                              dropout=self.dropout, name=f"tblock_{i}")(x, train=train)
        return x


class Conv1DNet(nn.Module):
    """Expand/contract 1D CNN (ref: ConvBlocks.py:176-217). Input [B, L, C]."""

    length: int
    num_channels: int
    out_size: int
    num_expand: int
    num_contract: int
    expand_factor: float
    size_factor: int = 3
    pad_factor: float = 1
    stride_factor: float = 0
    min_kernel: int = 2

    @staticmethod
    def schedule(length, num_channels, out_size, num_expand, num_contract,
                 expand_factor, size_factor=3, pad_factor=1, stride_factor=0,
                 min_kernel=2):
        planes = [num_channels]
        if num_expand > 0:
            expand = float((planes[0] * expand_factor - planes[0]) / num_expand)
            planes += [int(round(planes[0] + expand * (i + 1))) for i in range(num_expand)]
        contract_factor = float((planes[-1] - out_size) / num_contract)
        start_n = planes[-1]
        planes += [int(round(start_n - contract_factor * (i + 1))) for i in range(num_contract)]
        planes[-1] = out_size
        n = num_expand + num_contract
        layers, out_len = [], length
        for i in range(n):
            if n > 1:
                decay = 1.0 - i / (n - 1)
                st = int(round(stride_factor * i / (n - 1)))
            else:
                decay, st = 1.0, int(stride_factor)
            st = max(1, st)
            fs = max(min_kernel, int(ceil(size_factor * decay)))
            pd = int(round(pad_factor * ((fs - 1) / 2.0) * decay))
            layers.append((planes[i], planes[i + 1], fs, st, pd))
            out_len = int((out_len + 2 * pd - fs) / st + 1)
        return layers, out_len

    def out_shape(self) -> Tuple[int, int]:
        layers, out_len = self.schedule(
            self.length, self.num_channels, self.out_size, self.num_expand,
            self.num_contract, self.expand_factor, self.size_factor,
            self.pad_factor, self.stride_factor, self.min_kernel)
        return out_len, layers[-1][1]

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        layers, _ = self.schedule(
            self.length, self.num_channels, self.out_size, self.num_expand,
            self.num_contract, self.expand_factor, self.size_factor,
            self.pad_factor, self.stride_factor, self.min_kernel)
        for i, (cin, cout, fs, st, pd) in enumerate(layers):
            x = nn.Conv(cout, (fs,), strides=(st,), padding=[(pd, pd)],
                        dtype=x.dtype, name=f"conv_{i}")(x)
            x = MaskedArrayBatchNorm(cout, name=f"bn_{i}")(x, mask=mask, train=train)
            x = jax.nn.relu(x)
        return x


class Conv2DBlock(nn.Module):
    """Dense 2D conv stack — the dense analog of SparseConv2DBlock
    (ref: ConvBlocks.py:220-289). Input [B, H, W, C]."""

    nin: int
    nout: int
    n: int
    size: Sequence[int]
    size_factor: int = 3
    pad_factor: float = 0.0
    stride_factor: float = 1.0
    dil_factor: float = 1.0
    expansion_factor: float = 1.0
    n_expansion: int = 0
    pointwise_factor: float = 0.0
    dropout: Optional[float] = None

    @staticmethod
    def schedule(nin, nout, n, size_factor=3, pad_factor=0.0, stride_factor=1.0,
                 dil_factor=1.0, expansion_factor=1.0, n_expansion=0,
                 pointwise_factor=0.0):
        if pointwise_factor > 0:
            n_contraction = n - 1 - n_expansion
            if n_contraction < 1:
                raise ValueError("n_contraction too large, must be < n - 1")
        else:
            n_contraction = n - n_expansion
            if n_contraction < 1:
                raise ValueError("n_contraction too large, must be < n")
        nframes = [nin]
        if pointwise_factor > 0:
            nframes.append(nin - int(floor((nin - nout) * pointwise_factor)))
        if n_expansion > 0:
            nframes += get_frame_expansion(nframes[-1], expansion_factor, n_expansion)
        if n_contraction > 0:
            nframes += get_frame_contraction(nframes[-1], nout, n_contraction)
        layers = []
        for i in range(n):
            if pointwise_factor > 0:
                decay = 1.0 - (i - 1) / (n - 1) if n > 1 else 1.0
            else:
                decay = 1.0 - i / (n - 1) if n > 1 else 1.0
            fs = max(2, int(ceil(size_factor * decay)))
            st = max(1, int(round(stride_factor * i / (n - 1))) if n > 1 else 1)
            dil = int(round(dil_factor ** i))
            pd = int(round(pad_factor * ((fs - 1) / 2.0) * dil_factor * decay))
            if i == 0 and pointwise_factor > 0:
                pd, fs, dil, st = 0, 1, 1, 1
            layers.append((nframes[i], nframes[i + 1], fs, st, pd, dil))
        return layers

    def out_size(self) -> List[int]:
        size = list(self.size)
        for (cin, cout, fs, st, pd, dil) in self.schedule(
                self.nin, self.nout, self.n, self.size_factor, self.pad_factor,
                self.stride_factor, self.dil_factor, self.expansion_factor,
                self.n_expansion, self.pointwise_factor):
            size = [int((size[0] + 2 * pd - fs - (fs - 1) * (dil - 1)) / st + 1),
                    int((size[1] + 2 * pd - fs - (fs - 1) * (dil - 1)) / st + 1),
                    cout]
        return size

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        for i, (cin, cout, fs, st, pd, dil) in enumerate(self.schedule(
                self.nin, self.nout, self.n, self.size_factor, self.pad_factor,
                self.stride_factor, self.dil_factor, self.expansion_factor,
                self.n_expansion, self.pointwise_factor)):
            x = nn.Conv(cout, (fs, fs), strides=(st, st),
                        padding=[(pd, pd), (pd, pd)], kernel_dilation=(dil, dil),
                        dtype=x.dtype, name=f"conv_{i}")(x)
            x = MaskedArrayBatchNorm(cout, name=f"bn_{i}")(x, mask=mask, train=train)
            x = jax.nn.relu(x)
            if self.dropout:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x
