"""Sparse detector-grid networks.

TPU-native equivalents of the reference model classes: SCNet
(src/models/SCNet.py), SPConvNet / SPConvPreserveNet (src/models/SPConvNet.py),
DenseConvNet (src/models/DenseConvNet.py), SingleEndedZConv / SingleEndedEZConv
(src/models/SingleEnded{Z,EZ}Conv.py), ExtractedFeatureConvNet
(src/models/ExtractedFeatureConvNet.py).

All take a :class:`SparseBatch` and build a dense-grid SparseGrid via XLA
scatter (replacing spconv.SparseConvTensor / scn.InputLayer). Event-level
heads flatten the ToDense output in torch [B, C, H, W] order so linear layer
sizes match the reference's shape arithmetic.
"""
from __future__ import annotations

import logging
from copy import copy
from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from waveformml_tpu.config import to_dict
from waveformml_tpu.detector import NX, NY
from waveformml_tpu.models.algorithm import build_sparse_instances, split_algorithm
from waveformml_tpu.models.blocks import Conv2DBlock, LinearBlock, MaskedArrayBatchNorm, TemporalConvNet
from waveformml_tpu.models.sparse_blocks import (
    ExtractedFeatureConv, Pointwise2DForZ, SparseConv2DBlock, SparseConv2DForEZ,
    SparseConv2DForZ, SparseConv2DPreserve)
from waveformml_tpu.ops.sparse import (SparseBatch, occupancy_mask,
    scatter_to_dense)
from waveformml_tpu.ops.sparse_conv import SparseGrid, SparseSequential
from waveformml_tpu.registry import registry

log = logging.getLogger(__name__)


def batch_to_grid(batch: SparseBatch, feats=None) -> SparseGrid:
    """SparseBatch → SparseGrid (the spconv.SparseConvTensor equivalent)."""
    dense = scatter_to_dense(batch, feats)
    occ = occupancy_mask(batch)
    return SparseGrid(dense, occ)


def batch_to_grid_3d(batch: SparseBatch, n_t: int, feats=None) -> SparseGrid:
    """4-column SparseBatch → [B, NX, NY, T, C] SparseGrid for 3DConvolution
    nets (ref: SCNet.py:58-60 spatial_size [14, 11, nsamples])."""
    from waveformml_tpu.ops.sparse import occupancy_mask_3d, scatter_to_dense_3d

    dense = scatter_to_dense_3d(batch, n_t, feats)
    occ = occupancy_mask_3d(batch, n_t)
    return SparseGrid(dense, occ)


# padded-row-aware substitutions for the waveform DSL section: a plain
# BatchNorm1d would fold the bucket's zero padding rows into its training
# statistics (numerics would change with bucket size — SURVEY §7.3)
_WAVEFORM_TRANSLATIONS = {
    "nn.BatchNorm1d": lambda c, *a, **k: MaskedArrayBatchNorm(c),
    "BatchNorm1d": lambda c, *a, **k: MaskedArrayBatchNorm(c),
}


def _apply_waveform_layer(layers: Sequence[Any], feats, n_samples: int,
                          train: bool, mask=None):
    """Run the leading nn.Conv1d stack per waveform pair: [N, 2S] is reshaped
    to [N, S, 2] (2 channels of S samples — ref: SCNet.py:69-72 reshapes to
    (N, 2, nsamples)), processed, and flattened back. ``mask`` [N] marks the
    real (non-padding) rows for the masked BatchNorm layers."""
    n = feats.shape[0]
    x = feats.reshape(n, 2, n_samples).transpose(0, 2, 1)  # [N, S, 2]
    for layer in layers:
        if isinstance(layer, MaskedArrayBatchNorm):
            x = layer(x, mask=mask, train=train)
        else:
            x = layer(x, train=train)
    # back to torch (N, C, L) flatten order
    return x.transpose(0, 2, 1).reshape(n, -1)


@registry.register("BasicNetwork", aliases=("BasicNetwork.BasicNetwork",))
class BasicNetwork(nn.Module):
    """Trivial config-holding base model (ref: BasicNetwork.py:1-15) — kept so
    configs/imports naming it resolve; forwards features unchanged."""

    config: Any

    @nn.compact
    def __call__(self, batch, train: bool = False):
        return batch.feats if isinstance(batch, SparseBatch) else batch


@registry.register("SPConvNet", aliases=("SPConvNet.SPConvNet",))
class SPConvNet(nn.Module):
    """Sparse-conv event classifier (ref: SPConvNet.py:28-157): optional TCN
    waveform layer → sparse middle → flatten → linear head."""

    config: Any

    def setup(self):
        net_config = self.config.net_config
        system_config = self.config.system_config
        self.nsamples = system_config.n_samples
        self.ntype = system_config.n_type
        self._has_wf = False

        if not hasattr(net_config, "algorithm"):
            if not hasattr(net_config, "hparams"):
                raise IOError("net_config must contain one of 'algorithm' or 'hparams'")
            self._create_from_hparams(net_config.hparams, self.ntype)
        else:
            wf, sparse, linear = split_algorithm(net_config.algorithm)
            if wf:
                # dense per-row stack on [N, S, 2] arrays — the sparse
                # translations (SparseReLU etc.) only apply to the grid middle
                self.waveform_layers = registry.create_class_instances(
                    list(wf), translations=_WAVEFORM_TRANSLATIONS)
                self._has_wf = True
            self.sparse_model = SparseSequential(build_sparse_instances(sparse))
            self.linear_layers = registry.create_class_instances(list(linear))
            self.n_linear = linear[1][0]

    def _create_from_hparams(self, hparams, n_classes):
        """hparams generator path (ref: SPConvNet.py:71-109)."""
        size = [NX, NY, int(self.nsamples * 2)]
        for rq in ("n_dil", "n_conv", "n_lin", "out_planes"):
            if not hasattr(hparams, rq):
                raise IOError(rq + " is required to create the sparse conv algorithm.")
        wf_params = to_dict(getattr(hparams, "wf_params", None) or {})
        conv_params = to_dict(getattr(hparams, "conv_params", None) or {})
        if hparams.n_dil > 0:
            self.waveform_layers = [TemporalConvNet(1, [1] * hparams.n_dil, **wf_params)]
            self._has_wf = True
        block = SparseConv2DBlock(size[2], hparams.out_planes, hparams.n_conv,
                                  tuple(size), True, **conv_params)
        self.sparse_model = block
        out_size = SparseConv2DBlock.out_size(
            SparseConv2DBlock.schedule(size[2], hparams.out_planes, hparams.n_conv,
                                       True, **conv_params), size)
        flat = 1
        for s in out_size:
            flat *= s
        self.n_linear = copy(flat)
        log.debug("Flattened size of the sparse network output is %s", flat)
        self.linear_layers = [LinearBlock(flat, n_classes, hparams.n_lin)]

    def _waveform(self, feats, train, mask=None):
        n = feats.shape[0]
        if self.waveform_layers and isinstance(self.waveform_layers[0], TemporalConvNet):
            # reference: unsqueeze(1) → 1 input channel of 2*nsamples (SPConvNet.py:54-61)
            x = feats[..., None]  # [N, 2S, 1]
            for layer in self.waveform_layers:
                x = layer(x, train=train)
            return x.reshape(n, -1)
        return _apply_waveform_layer(self.waveform_layers, feats,
                                     self.nsamples, train, mask=mask)

    def __call__(self, batch: SparseBatch, train: bool = False):
        feats = batch.feats
        if self._has_wf:
            feats = self._waveform(feats, train, mask=batch.mask)
        g = batch_to_grid(batch, feats)
        x = self.sparse_model(g, train=train)
        x = x.reshape(batch.n_events, -1)  # ToDense gives [B, C, H, W]
        for layer in self.linear_layers:
            x = layer(x, train=train)
        return x


@registry.register("SPConvPreserveNet", aliases=("SPConvNet.SPConvPreserveNet",))
class SPConvPreserveNet(nn.Module):
    """Site-preserving sparse net returning per-site features [N, ntype]
    (ref: SPConvNet.py:8-25)."""

    config: Any

    @nn.compact
    def __call__(self, batch: SparseBatch, train: bool = False):
        sc = self.config.system_config
        hp = self.config.net_config.hparams
        params = to_dict(hp.conv_params)
        model = SparseConv2DPreserve(sc.n_samples * 2, sc.n_type, hp.n_conv, **params)
        out = model(batch, train=train)
        # return active-site feature rows, like spconv .features
        from waveformml_tpu.ops.sparse import gather_from_dense
        return gather_from_dense(out.features, batch)


@registry.register("SCNet", aliases=("SCNet.SCNet",))
class SCNet(nn.Module):
    """SparseConvNet-style model from the algorithm DSL (ref: SCNet.py:9-77)."""

    config: Any

    def setup(self):
        net_config = self.config.net_config
        self.nsamples = self.config.system_config.n_samples
        net_type = getattr(net_config, "net_type", "2DConvolution")
        if net_type == "3DConvolution":
            self._ndim = 3
        else:
            if net_type != "2DConvolution":
                log.warning("unknown net_type in net_config: %s", net_type)
            self._ndim = 2
        wf, sparse, linear = split_algorithm(net_config.algorithm)
        self._has_wf = bool(wf)
        if wf:
            # dense per-row stack (see SPConvNet.setup): [N, S, 2] arrays,
            # not SparseGrids — don't run the sparse translation table
            self.waveform_layers = registry.create_class_instances(
                list(wf), translations=_WAVEFORM_TRANSLATIONS)
        # pure-SubM 2D DSL stacks run the row-space gather-GEMM fast path.
        # 3D stays on the dense grid: measured on v5e, K³=27 gathers over the
        # small early channel counts (8-64 B/row) are vector-lane-starved and
        # ~4× slower than XLA's dense conv even at 0.6% occupancy (the 3D row
        # machinery remains available via sparse_blocks.DSLSpecNet(n_t=...)).
        from waveformml_tpu.models.algorithm import dsl_to_row_specs
        from waveformml_tpu.models.sparse_blocks import DSLSpecNet

        row_specs = dsl_to_row_specs(sparse) if self._ndim == 2 else None
        if row_specs is not None:
            self.sparse_model = DSLSpecNet(tuple(row_specs))
        else:
            self.sparse_model = SparseSequential(build_sparse_instances(sparse))
        self._row_path = row_specs is not None
        self.linear_layers = registry.create_class_instances(list(linear))
        self.n_linear = linear[1][0]

    def __call__(self, batch: SparseBatch, train: bool = False):
        feats = batch.feats
        if self._has_wf:
            feats = _apply_waveform_layer(self.waveform_layers, feats,
                                          self.nsamples, train,
                                          mask=batch.mask)
        if self._row_path:
            g = batch if feats is batch.feats else \
                SparseBatch(batch.coords, feats, batch.mask, batch.n_events,
                            plans=batch.plans)
        elif self._ndim == 3:
            # grid [B, 14, 11, T, C] with T = n_samples (ref SCNet.py:58-60)
            g = batch_to_grid_3d(batch, self.nsamples, feats)
        else:
            g = batch_to_grid(batch, feats)
        x = self.sparse_model(g, train=train)
        if isinstance(x, SparseGrid):
            m = x.masked()
            # torch channels-first flatten order, any rank
            x = jnp.transpose(m, (0, m.ndim - 1) + tuple(range(1, m.ndim - 1)))
        x = x.reshape(batch.n_events, -1)
        for layer in self.linear_layers:
            x = layer(x, train=train)
        return x


@registry.register("DenseConvNet", aliases=("DenseConvNet.DenseConvNet",))
class DenseConvNet(nn.Module):
    """Dense baseline: scatter to dense grid + Conv2DBlock + linear head
    (ref: DenseConvNet.py:11-73)."""

    config: Any

    def setup(self):
        sc = self.config.system_config
        hp = self.config.net_config.hparams
        self.nsamples = sc.n_samples
        size = [NX, NY, int(self.nsamples * 2)]
        for rq in ("n_conv", "n_lin", "out_planes"):
            if not hasattr(hp, rq):
                raise IOError(rq + " is required to create the conv algorithm.")
        conv_params = to_dict(getattr(hp, "conv_params", None) or {})
        self.conv = Conv2DBlock(size[2], hp.out_planes, hp.n_conv, tuple(size),
                                **conv_params)
        out_size = self.conv.out_size()
        flat = out_size[0] * out_size[1] * out_size[2]
        self.n_linear = flat
        self.linear = LinearBlock(flat, sc.n_type, hp.n_lin)

    def __call__(self, batch: SparseBatch, train: bool = False):
        dense = scatter_to_dense(batch)  # [B, NX, NY, 2S]
        # padded event slots carry no occupancy; exclude them from BN stats
        ev_mask = occupancy_mask(batch).any(axis=(1, 2))
        x = self.conv(dense, train=train, mask=ev_mask)
        # flatten in torch (C, H, W) order to match reference shape math
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(batch.n_events, -1)
        return self.linear(x, train=train)


@registry.register("SingleEndedZConv", aliases=("SingleEndedZConv.SingleEndedZConv",))
class SingleEndedZConv(nn.Module):
    """Per-segment Z regressor (ref: SingleEndedZConv.py:11-45). Returns the
    dense [B, 1, NX, NY] prediction map."""

    config: Any

    @nn.compact
    def __call__(self, batch: SparseBatch, train: bool = False):
        net_config = self.config.net_config
        nsamples = self.config.system_config.n_samples
        algorithm = getattr(net_config, "algorithm", "conv")
        version = getattr(net_config, "version", 0)
        n_in = nsamples if algorithm == "features" else nsamples * 2
        if algorithm in ("conv", "features"):
            if version == 0:
                model = SparseConv2DForZ(n_in, **to_dict(net_config.hparams.conv))
            else:
                model = SparseConv2DForEZ(n_in, out_planes=1,
                                          **to_dict(net_config.hparams))
        elif algorithm == "point":
            model = Pointwise2DForZ(n_in, **to_dict(net_config.hparams.point))
        else:
            raise IOError(f"unknown algorithm {algorithm}")
        # spec nets take the SparseBatch directly: pure-SubM stacks run the
        # row-space gather-GEMM fast path, others densify internally
        return model(batch, train=train)


@registry.register("SingleEndedEZConv", aliases=("SingleEndedEZConv.SingleEndedEZConv",))
class SingleEndedEZConv(nn.Module):
    """(E,Z) head; optionally composes a frozen pretrained Z model whose output
    is concatenated channel-wise (ref: SingleEndedEZConv.py:14-64).

    The frozen Z model's parameters are supplied at construction via
    ``z_apply`` (a closure over restored parameters), keeping this module
    functional.
    """

    config: Any
    z_apply: Optional[Any] = None  # callable(batch) -> [B, 1, NX, NY]

    @nn.compact
    def __call__(self, batch: SparseBatch, train: bool = False):
        net_config = self.config.net_config
        nsamples = self.config.system_config.n_samples
        algorithm = getattr(net_config, "algorithm", "conv")
        n_in = nsamples if algorithm == "features" else nsamples * 2
        use_z = self.z_apply is not None
        out_planes = 1 if use_z else 2
        model = SparseConv2DForEZ(n_in, out_planes=out_planes,
                                  **to_dict(net_config.hparams))
        x = model(batch, train=train)  # [B, out_planes, NX, NY]
        if use_z:
            z = jax.lax.stop_gradient(self.z_apply(batch))
            x = jnp.concatenate([x, z], axis=1)
        return x


@registry.register("ExtractedFeatureConvNet",
                   aliases=("ExtractedFeatureConvNet.ExtractedFeatureConvNet",))
class ExtractedFeatureConvNet(nn.Module):
    """Sparse conv over per-segment extracted features + linear classifier
    (ref: ExtractedFeatureConvNet.py:14-43)."""

    config: Any

    def setup(self):
        sc = self.config.system_config
        hp = self.config.net_config.hparams
        nfeatures = sc.n_features
        self.model = ExtractedFeatureConv(
            nfeatures, hp.out_planes, hp.n_conv, (NX, NY, nfeatures),
            **to_dict(hp.conv))
        specs = ExtractedFeatureConv.schedule(nfeatures, hp.out_planes, hp.n_conv,
                                              **to_dict(hp.conv))
        out_size = SparseConv2DBlock.out_size(specs, (NX, NY, nfeatures))
        flat = out_size[0] * out_size[1] * out_size[2]
        self.n_linear = flat
        self.linear = LinearBlock(flat, sc.n_type, hp.n_lin)

    def __call__(self, batch: SparseBatch, train: bool = False):
        x = self.model(batch, train=train)
        x = x.reshape(batch.n_events, -1)
        return self.linear(x, train=train)


@registry.register("SubMPSDNet", aliases=("SPConvNet.SubMPSDNet",))
class SubMPSDNet(nn.Module):
    """Event classifier over a pure-SubM sparse stack — runs the row-space
    gather-GEMM fast path end to end (dense materialization only of the final
    few channels). Semantics: SparseConv2DForEZ version-2 stack (SubM convs
    with shared indice keys, ref: SPConvBlocks.py:143-199) + flatten + linear
    head, the SubM analog of SPConvNet's hparams generator."""

    config: Any

    def setup(self):
        from math import pow as fpow

        from waveformml_tpu.models.blocks import FoldedSiteLinear

        sc = self.config.system_config
        hp = self.config.net_config.hparams
        n_in = sc.n_samples * 2
        out_planes = getattr(hp, "out_planes", 8)
        self._out_planes = out_planes
        params = to_dict(getattr(hp, "conv_params", None) or {})
        params.setdefault("version", 2)
        self.stack = SparseConv2DForEZ(n_in, out_planes=out_planes, **params)
        flat = out_planes * NX * NY
        self.n_linear = flat
        n_lin = getattr(hp, "n_lin", 2)
        # the first linear layer over flatten([B, C, NX, NY]) is folded into
        # row space (no dense scatter); plane schedule mirrors LinearBlock
        factor = fpow(float(sc.n_type) / flat, 1.0 / n_lin)
        planes = [int(round(flat * fpow(factor, i + 1))) for i in range(n_lin)]
        self.head0 = FoldedSiteLinear(out_planes, planes[0])
        self.linear = (LinearBlock(planes[0], sc.n_type, n_lin - 1)
                       if n_lin > 1 else None)

    def __call__(self, batch: SparseBatch, train: bool = False):
        rows = self.stack(batch, train=train, return_rows=True)   # [N, C]
        x = self.head0(rows, batch)                                # [B, h1]
        if self.linear is not None:
            x = self.linear(x, train=train)
        return x
