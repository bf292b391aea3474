"""Parametric sparse-conv stack generators.

Reproduces the channel schedules, kernel decay formulas, indice-key layouts
and "version" variants of src/models/SPConvBlocks.py (948 LoC):
SparseConv2DForEZ versions 0-3 (:9-258), SparseConv2DForZ (:261-313),
Pointwise2DForZ (:316-343), ExtractedFeatureConv (:346-386),
SparseConv2DBlock versions 0-3 (:411-727), SparseConv2DPreserve versions 0-2
(:730-948). Layer schedules are computed by pure staticmethods (testable
against the reference formulas); the flax modules instantiate
waveformml_tpu.ops.sparse_conv layers from them.
"""
from __future__ import annotations

from math import ceil, floor
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from waveformml_tpu.models.schedules import (
    get_frame_contraction, get_frame_expansion)
from waveformml_tpu.ops.sparse_conv import (
    MaskedBatchNorm, SparseConv2d, SparseDropout, SparseGrid,
    SparseInverseConv2d, SparseReLU, SparseSequential, SubMConv2d, ToDense)


# layer-spec ops: ("conv", cin, cout, k, s, p, d) / ("subm", cin, cout, k, p, key)
# / ("inv", cin, cout, k, key) / ("bn", c) / ("relu",) / ("dropout", rate) / ("todense",)


def _build(specs: Sequence[Tuple], name_prefix: str = "") -> List[Any]:
    layers: List[Any] = []
    for i, spec in enumerate(specs):
        op = spec[0]
        nm = f"{name_prefix}l{i}"
        if op == "conv":
            _, cin, cout, k, s, p, d = spec
            layers.append(SparseConv2d(cin, cout, k, s, p, d, name=nm))
        elif op == "subm":
            _, cin, cout, k, p, key = spec
            layers.append(SubMConv2d(cin, cout, k, 1, p, indice_key=key, name=nm))
        elif op == "inv":
            _, cin, cout, k, key = spec
            layers.append(SparseInverseConv2d(cin, cout, k, indice_key=key, name=nm))
        elif op == "bn":
            layers.append(MaskedBatchNorm(spec[1], name=nm))
        elif op == "relu":
            layers.append(SparseReLU(name=nm))
        elif op == "dropout":
            layers.append(SparseDropout(spec[1], name=nm))
        elif op == "todense":
            layers.append(ToDense(name=nm))
        else:
            raise ValueError(f"unknown spec op {op}")
    return layers


class RowSubMConv2d(nn.Module):
    """Row-space SubM conv (gather-GEMM fast path; see ops.row_conv).
    Same kernel/bias shapes as the dense SubMConv2d's inner nn.Conv.
    ``ndim=3`` gives the K³-window 3D variant (plan from
    build_neighbor_plan_3d)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    use_bias: bool = True
    ndim: int = 2

    @nn.compact
    def __call__(self, feats, plan, mask):
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k ** self.ndim, self.in_channels, self.out_channels))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_channels,)) if self.use_bias else None
        from waveformml_tpu.ops.row_conv import subm_conv_rows

        return subm_conv_rows(feats, plan, kernel, bias, mask)


def _row_compatible(specs: Sequence[Tuple]) -> bool:
    """True when every layer has a row-space equivalent (pure SubM stacks)."""
    return all(s[0] in ("subm", "bn", "relu", "dropout", "todense")
               for s in specs)


class _SpecNet(nn.Module):
    """Base: subclasses provide specs(); forward runs the built stack.

    Accepts a SparseGrid (dense-grid execution) or a SparseBatch: pure-SubM
    stacks then run the row-space gather-GEMM fast path (ops.row_conv) —
    identical numerics, ~20× less HBM traffic at large batch; stacks with
    regular/strided convs densify first."""

    def specs(self) -> List[Tuple]:
        raise NotImplementedError

    @nn.compact
    def __call__(self, g, train: bool = False, return_rows: bool = False):
        """return_rows=True yields the active-site feature rows [N, C] instead
        of the dense [B, C, NX, NY] tail — callers that fold the first linear
        layer over sites (SubMPSDNet) skip the dense scatter entirely."""
        from waveformml_tpu.ops.sparse import SparseBatch, gather_from_dense

        specs = self.specs()
        if isinstance(g, SparseBatch):
            if _row_compatible(specs):
                return self._row_forward(g, specs, train,
                                         return_rows=return_rows)
            from waveformml_tpu.models.nets import batch_to_grid

            if return_rows:
                batch = g
                out = batch_to_grid(g)
                for layer in _build(specs):
                    out = layer(out, train=train)
                if isinstance(out, SparseGrid):
                    return gather_from_dense(out.masked(), batch)
                # a ToDense tail already produced [B, C, H, W]
                return gather_from_dense(jnp.transpose(out, (0, 2, 3, 1)),
                                         batch)
            g = batch_to_grid(g)
        out = g
        for layer in _build(specs):
            out = layer(out, train=train)
        return out

    def _row_forward(self, batch, specs, train: bool, return_rows: bool = False):
        from waveformml_tpu.models.blocks import MaskedArrayBatchNorm
        from waveformml_tpu.ops.row_conv import (
            _record_requirement, build_neighbor_plan, build_neighbor_plan_3d,
            build_site_lookup, build_site_lookup_3d, rows_to_dense,
            rows_to_dense_3d)

        n_t = getattr(self, "n_t", None)
        is3d = batch.coords.shape[1] == 4
        if is3d:
            assert n_t, "3D row forward needs the time-grid size (n_t)"
        # host-prefetched plans (SparseBatch.plans) skip the in-step site-LUT
        # scatter + K^n gathers; the lazy in-trace build below is the
        # fallback (and records what prepare_block should prefetch next time)
        plans = dict(batch.plans) if batch.plans else {}
        lut = None
        x = batch.feats
        mask = batch.mask
        to_dense = False
        for i, spec in enumerate(specs):
            nm = f"l{i}"
            if spec[0] == "subm":
                _, cin, cout, k, p, key = spec
                if f"k{k}" not in plans:
                    _record_requirement(k, 3 if is3d else 2,
                                        n_t if is3d else None)
                    if lut is None:
                        lut = (build_site_lookup_3d(batch, n_t) if is3d
                               else build_site_lookup(batch))
                    plans[f"k{k}"] = (
                        build_neighbor_plan_3d(batch, k, n_t, lut)
                        if is3d else build_neighbor_plan(batch, k, lut))
                x = RowSubMConv2d(cin, cout, k, ndim=3 if is3d else 2,
                                  name=nm)(x, plans[f"k{k}"], mask)
            elif spec[0] == "bn":
                x = MaskedArrayBatchNorm(spec[1], name=nm)(x, mask=mask, train=train)
                x = jnp.where(mask[:, None], x, 0)
            elif spec[0] == "relu":
                x = jax.nn.relu(x)
            elif spec[0] == "dropout":
                x = nn.Dropout(spec[1], deterministic=not train,
                               name=nm)(x)
            elif spec[0] == "todense":
                to_dense = True
        if return_rows:
            return jnp.where(mask[:, None], x, 0)
        if to_dense:
            return (rows_to_dense_3d(x, batch, n_t) if is3d
                    else rows_to_dense(x, batch))
        from waveformml_tpu.ops.sparse import (occupancy_mask,
                                               occupancy_mask_3d)

        # site-preserving stacks return a SparseGrid equivalent
        if is3d:
            return SparseGrid(
                jnp.transpose(rows_to_dense_3d(x, batch, n_t), (0, 2, 3, 4, 1)),
                occupancy_mask_3d(batch, n_t))
        return SparseGrid(
            jnp.transpose(rows_to_dense(x, batch), (0, 2, 3, 1)),
            occupancy_mask(batch))


class SparseConv2DForEZ(_SpecNet):
    """(E,Z) per-segment head (ref: SPConvBlocks.py:9-258, 4 versions)."""

    in_planes: int
    out_planes: int = 2
    kernel_size: int = 3
    n_conv: int = 1
    n_point: int = 3
    conv_position: int = 3
    pointwise_factor: float = 0.8
    batchnorm: bool = True
    version: int = 0
    n_expand: int = 0

    @staticmethod
    def schedule(in_planes, out_planes=2, kernel_size=3, n_conv=1, n_point=3,
                 conv_position=3, pointwise_factor=0.8, batchnorm=True,
                 version=0, n_expand=0) -> List[Tuple]:
        n_layers = n_conv + n_point
        if n_conv > 0 and conv_position < 1:
            raise ValueError("conv position must be >= 1 if n_conv > 0")
        if n_point > 0 and n_layers == 1:
            raise ValueError("n_layers must be > 1 if using pointwise convolution")
        if kernel_size % 2 != 1:
            raise ValueError("Kernel size must be an odd integer")
        if n_layers < 1:
            raise ValueError("n_layers must be integer >= 1")
        conv_positions = list(range(conv_position - 1, conv_position - 1 + n_conv)) \
            if n_conv > 0 else []
        specs: List[Tuple] = []

        if version == 3:
            # expansion/contraction channel path (ref :201-258)
            n_contraction = n_layers - n_expand
            if n_contraction < 1:
                raise ValueError("n expand must be <= (n_point + n_conv - 1)")
            nframes = [in_planes]
            if n_expand > 0:
                nframes += get_frame_expansion(nframes[-1], 2.0, n_expand, True)
            if n_contraction > 0:
                nframes += get_frame_contraction(nframes[-1], out_planes, n_contraction, True)
            nframes[-1] = out_planes
            for i in range(n_layers):
                if i not in conv_positions:
                    fs, pd = 1, 1
                else:
                    decay = 1.0 - conv_positions.index(i) / (n_conv - 1) if n_conv > 1 else 1.0
                    fs = int(ceil(kernel_size * decay))
                    if fs % 2 == 0:
                        fs -= 1
                    fs = max(3, fs)
                    pd = (fs - 1) // 2
                key = "subm0" if fs < 4 else f"subm{fs}"
                specs.append(("subm", nframes[i], nframes[i + 1], fs, pd, key))
                if i != n_layers - 1 and batchnorm:
                    specs.append(("bn", nframes[i + 1]))
                specs.append(("relu",))
            specs.append(("todense",))
            return specs

        # versions 0-2: decrement channel path (ref :31-199)
        if n_point > 0:
            increment = int(round(int(round(in_planes * pointwise_factor - out_planes))
                                  / float(n_layers - 1)))
        else:
            increment = int(round(float(in_planes - out_planes) / float(n_layers)))
        out = in_planes
        inp = in_planes
        for i in range(n_layers):
            if i == n_layers - 1:
                out = out_planes
            else:
                out -= increment
                if i == 0 and n_point > 0 and pointwise_factor > 0:
                    out = int(round(pointwise_factor * in_planes))
            if i not in conv_positions:
                curr_kernel = 1
            elif version == 2:
                curr_kernel = max(3, kernel_size)
            else:
                curr_kernel = max(3, kernel_size - int((i + 1 - conv_position) * 2))
            if curr_kernel % 2 == 0:
                raise ValueError("error: kernel size is even")
            pd = (curr_kernel - 1) // 2
            if out <= 0:
                out = 1
            if version == 0:
                specs.append(("conv", inp, out, curr_kernel, 1, pd, 1))
            else:  # versions 1, 2 use SubM with shared indice keys
                key = "subm0" if curr_kernel < 4 else f"subm{curr_kernel}"
                specs.append(("subm", inp, out, curr_kernel, pd, key))
            if i != n_layers - 1 and batchnorm:
                specs.append(("bn", out))
            specs.append(("relu",))
            inp = out
        specs.append(("todense",))
        return specs

    def specs(self):
        return self.schedule(self.in_planes, self.out_planes, self.kernel_size,
                             self.n_conv, self.n_point, self.conv_position,
                             self.pointwise_factor, self.batchnorm, self.version,
                             self.n_expand)


class SparseConv2DForZ(_SpecNet):
    """Per-segment Z head (ref: SPConvBlocks.py:261-313)."""

    in_planes: int
    kernel_size: int = 3
    n_layers: int = 2
    pointwise_layers: int = 0
    pointwise_factor: float = 0.8
    todense: bool = True

    @staticmethod
    def schedule(in_planes, kernel_size=3, n_layers=2, pointwise_layers=0,
                 pointwise_factor=0.8, todense=True) -> List[Tuple]:
        if pointwise_layers > 0:
            if n_layers == 1:
                raise ValueError("n_layers must be > 1 if using pointwise convolution")
            increment = int(round(int(round(in_planes * pointwise_factor))
                                  / float(n_layers - 1)))
        else:
            increment = int(round(float(in_planes) / float(n_layers)))
        if kernel_size % 2 != 1:
            raise ValueError("Kernel size must be an odd integer")
        if n_layers < 1:
            raise ValueError("n_layers must be integer >= 1")
        specs: List[Tuple] = []
        out, inp = in_planes, in_planes
        reset_kernel, orig_kernel, pw = False, kernel_size, pointwise_layers
        k = kernel_size
        for i in range(n_layers):
            if i == n_layers - 1:
                out = 1
            else:
                out -= increment
                if i == 0 and pw > 0 and pointwise_factor > 0:
                    out = int(round(pointwise_factor * in_planes))
            pd = (k - 1) // 2
            if pw > 0:
                pd, k = 0, 1
                pw -= 1
                if pw == 0:
                    reset_kernel = True
            specs.append(("conv", inp, out, k, 1, pd, 1))
            if reset_kernel:
                k, reset_kernel = orig_kernel, False
            if i != n_layers - 1:
                specs.append(("bn", out))
            specs.append(("relu",))
            inp = out
            if k > 1:
                k -= 2
        if todense:
            specs.append(("todense",))
        return specs

    def specs(self):
        return self.schedule(self.in_planes, self.kernel_size, self.n_layers,
                             self.pointwise_layers, self.pointwise_factor,
                             self.todense)


class Pointwise2DForZ(_SpecNet):
    """1×1-conv-only per-segment Z head (ref: SPConvBlocks.py:316-343)."""

    in_planes: int
    pointwise_layers: int = 2

    @staticmethod
    def schedule(in_planes, pointwise_layers=2) -> List[Tuple]:
        n_layers = pointwise_layers
        if n_layers < 2:
            raise ValueError("n_layers must be integer >= 2")
        increment = int(round(float(in_planes) / float(n_layers - 1)))
        specs: List[Tuple] = []
        out, inp = in_planes, in_planes
        for i in range(n_layers):
            if i == n_layers - 1:
                out = 1
            elif i == 0:
                out = in_planes
            else:
                out -= increment
            specs.append(("conv", inp, out, 1, 1, 0, 1))
            specs.append(("bn", out))
            specs.append(("relu",))
            inp = out
        specs.append(("todense",))
        return specs

    def specs(self):
        return self.schedule(self.in_planes, self.pointwise_layers)


class ExtractedFeatureConv(_SpecNet):
    """Sparse conv over extracted feature vectors (ref: SPConvBlocks.py:346-386)."""

    nin: int
    nout: int
    n: int
    size: Sequence[int] = (14, 11)
    expansion_factor: float = 10.0
    size_factor: int = 3
    pad_factor: float = 0.0
    stride_factor: float = 1
    dil_factor: float = 1
    dropout: float = 0

    @staticmethod
    def schedule(nin, nout, n, expansion_factor=10.0, size_factor=3,
                 pad_factor=0.0, stride_factor=1, dil_factor=1, dropout=0) -> List[Tuple]:
        assert n > 1
        nframes = [nin, int(round(nin * expansion_factor))]
        diff = float(nframes[1] - nout) / (n - 1)
        nframes += [int(floor(nframes[1] - diff * i)) for i in range(n - 1)]
        specs: List[Tuple] = []
        for i in range(n):
            decay = 1.0 - (i - 1) / (n - 1)
            fs = max(2, int(floor(size_factor / (i + 1.0))))
            st = max(1, int(round(stride_factor * i / (n - 1))))
            dil = int(round(dil_factor ** i))
            pd = int(round(pad_factor * (fs - 1) * dil_factor * decay))
            specs.append(("conv", nframes[i], nframes[i + 1], fs, st, pd, dil))
            specs.append(("bn", nframes[i + 1]))
            specs.append(("relu",))
            if dropout:
                specs.append(("dropout", float(dropout)))
        specs.append(("todense",))
        return specs

    def specs(self):
        return self.schedule(self.nin, self.nout, self.n, self.expansion_factor,
                             self.size_factor, self.pad_factor, self.stride_factor,
                             self.dil_factor, self.dropout)


def _block_frames(nin, nout, n, pointwise_factor, depth_factor) -> List[int]:
    """Version-0/1 channel schedule (ref: SPConvBlocks.py:459-482)."""
    if nin == nout:
        return [nin] * (n + 1)
    if pointwise_factor > 0:
        nframes = [nin, nin - int(floor((nin - nout) * pointwise_factor))]
        if n > 1:
            diff = float(nin - nout) / n
            for _ in range(n - 1):
                val = int(floor(nframes[-1] - diff))
                nframes.append(val if val > nout else nout)
        return nframes
    if depth_factor > 0:
        nframes = [nin, int(nin * depth_factor)]
        if n > 1:
            diff = float(nframes[-1] - nout) / (n - 1)
            for _ in range(n - 1):
                val = int(floor(nframes[-1] - diff))
                nframes.append(val if val > nout else nout)
        return nframes
    diff = float(nin - nout) / n
    return [int(floor(nin - diff * i)) for i in range(n + 1)]


class SparseConv2DBlock(_SpecNet):
    """General sparse conv stack, 4 versions with different kernel-decay /
    channel-path rules (ref: SPConvBlocks.py:411-727)."""

    nin: int
    nout: int
    n: int
    size: Sequence[int] = (14, 11, 0)
    to_dense: bool = True
    size_factor: int = 3
    pad_factor: float = 0.0
    stride_factor: float = 1
    dil_factor: float = 1
    pointwise_factor: float = 0
    depth_factor: float = 0
    dropout: float = 0
    version: int = 0
    expansion_factor: float = 0
    n_expansion: int = 0

    @staticmethod
    def schedule(nin, nout, n, to_dense=True, size_factor=3, pad_factor=0.0,
                 stride_factor=1, dil_factor=1, pointwise_factor=0,
                 depth_factor=0, dropout=0, version=0, expansion_factor=0,
                 n_expansion=0) -> List[Tuple]:
        assert n > 0
        if version in (0, 1):
            nframes = _block_frames(nin, nout, n, pointwise_factor, depth_factor)
        else:  # versions 2, 3: expansion/contraction path (ref :596-618, :667-690)
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
        specs: List[Tuple] = []
        for i in range(n):
            if pointwise_factor > 0:
                decay = 1.0 - (i - 1) / (n - 1) if n > 1 else 1.0
            else:
                decay = 1.0 - i / (n - 1) if n > 1 else 1.0
            if version == 3:
                fs = max(2, int(ceil(size_factor * decay)))
            else:
                fs = max(2 if version in (1, 2) else 3,
                         int(floor(size_factor / (i + 1.0))))
            if version == 0:
                fs = max(3, int(floor(size_factor / (i + 1.0))))
                st = max(1, stride_factor - int(floor((stride_factor - 1) / (i + 1.0))))
                dil = int(round(dil_factor ** i))
                pd = int(round(pad_factor * (fs - 1) * dil_factor) * (i / (n + 1)))
                pd = int(pd)
            else:
                st = max(1, int(round(stride_factor * i / (n - 1))) if n > 1 else 1)
                dil = int(round(dil_factor ** i))
                pd = int(round(pad_factor * ((fs - 1) / 2.0) * dil_factor * decay))
            if i == 0 and pointwise_factor > 0:
                pd, fs, dil, st = 0, 1, 1, 1
            specs.append(("conv", nframes[i], nframes[i + 1], fs, st, pd, dil))
            specs.append(("bn", nframes[i + 1]))
            specs.append(("relu",))
            if dropout:
                specs.append(("dropout", float(dropout)))
        if to_dense:
            specs.append(("todense",))
        return specs

    @staticmethod
    def out_size(specs: Sequence[Tuple], size: Sequence[int]) -> List[int]:
        """Propagate spatial size through the conv specs (o = ⌊(i+2p−k−(k−1)(d−1))/s⌋+1)."""
        w, h = int(size[0]), int(size[1])
        c = int(size[2]) if len(size) > 2 else 0
        for spec in specs:
            if spec[0] == "conv":
                _, cin, cout, k, s, p, d = spec
                w = (w + 2 * p - k - (k - 1) * (d - 1)) // s + 1
                h = (h + 2 * p - k - (k - 1) * (d - 1)) // s + 1
                c = cout
            elif spec[0] == "subm":
                c = spec[2]
        return [w, h, c]

    def specs(self):
        return self.schedule(self.nin, self.nout, self.n, self.to_dense,
                             self.size_factor, self.pad_factor, self.stride_factor,
                             self.dil_factor, self.pointwise_factor,
                             self.depth_factor, self.dropout, self.version,
                             self.expansion_factor, self.n_expansion)


class SparseConv2DPreserve(_SpecNet):
    """Spatial-size-preserving sparse stack returning per-site features
    (ref: SPConvBlocks.py:730-948, 3 versions). v0 pairs SparseConv with
    SparseInverseConv via indice keys; v1/v2 use SubM chains."""

    nin: int
    nout: int
    n: int = 1
    size_factor: int = 3
    pad_factor: float = 0.0
    stride_factor: float = 1
    dil_factor: float = 1
    pointwise_factor: float = 0
    dropout: float = 0
    expansion_factor: float = 0
    n_expansion: int = 0
    version: int = 0
    n_contraction: int = 1
    filter_multiplier: float = 1.0

    @staticmethod
    def schedule(nin, nout, n=1, size_factor=3, pad_factor=0.0, stride_factor=1,
                 dil_factor=1, pointwise_factor=0, dropout=0,
                 expansion_factor=0, n_expansion=0, version=0,
                 n_contraction=1, filter_multiplier=1.0) -> List[Tuple]:
        specs: List[Tuple] = []
        if version == 0:
            if pointwise_factor > 0:
                n_contr = n - 1 - n_expansion
                if n_contr < 1:
                    raise ValueError("n_contraction too large, must be < n - 1")
            else:
                n_contr = n - n_expansion
                if n_contr < 1:
                    raise ValueError("n_contraction too large, must be < n")
            nframes = [nin]
            if pointwise_factor > 0:
                nframes.append(nin - int(floor((nin - nout) * pointwise_factor)))
            if n_expansion > 0:
                nframes += get_frame_expansion(nframes[-1], expansion_factor, n_expansion)
            if n_contr > 0:
                nframes += get_frame_contraction(nframes[-1], nout, n_contr)
            nframes[-1] = nout
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
                key = f"ind_{i}"
                specs.append(("conv_keyed", nframes[i], nframes[i + 1], fs, st, pd, dil, key))
                specs.append(("inv", nframes[i + 1], nframes[i + 1], fs, key))
                specs.append(("bn", nframes[i + 1]))
                specs.append(("relu",))
                if dropout:
                    specs.append(("dropout", float(dropout)))
            return specs

        # versions 1, 2: SubM chains (ref :835-948)
        ntot = n_contraction + n_expansion
        n_exp = n_expansion - 1 if pointwise_factor > 0 else n_expansion
        if ntot < 1:
            raise ValueError("n_contraction + n_expansion must be >=1")
        if size_factor % 2 != 1:
            raise ValueError("size factor must be odd if version >= 1")
        nframes = [nin]
        if pointwise_factor > 0:
            nframes.append(int(nin * pointwise_factor))
        if n_exp > 0:
            nframes += get_frame_expansion(nframes[-1], expansion_factor, n_exp)
        if n_contraction > 0:
            nframes += get_frame_contraction(nframes[-1], nout, n_contraction)
        nframes[-1] = nout
        for i in range(ntot):
            if version == 1:
                if pointwise_factor > 0:
                    decay = 1.0 - (i - 1) / (ntot - 1) if ntot > 1 else 1.0
                else:
                    decay = 1.0 - i / (ntot - 1) if ntot > 1 else 1.0
                fs = int(ceil(size_factor * decay))
            else:  # version 2: multiplicative filter growth, round to odd
                new_filter = size_factor * (filter_multiplier ** i)
                r = int(round(new_filter))
                if r % 2 == 0:
                    fs = int(ceil(new_filter)) if r - new_filter > 0 else int(floor(new_filter))
                else:
                    fs = int(floor(new_filter)) if r - new_filter > 0 else int(ceil(new_filter))
            if fs % 2 != 1:
                fs -= 1
            fs = max(3, fs)
            pd = (fs - 1) // 2
            if i == 0 and pointwise_factor > 0:
                pd, fs = 0, 1
                key = "ind_0" if version == 1 else "subm0"
            else:
                if version == 1:
                    key = f"ind_{fs}" if fs > 3 else "ind_0"
                else:
                    key = "subm0" if fs < 4 else f"subm{fs}"
            specs.append(("subm", nframes[i], nframes[i + 1], fs, pd, key))
            specs.append(("bn", nframes[i + 1]))
            specs.append(("relu",))
            if dropout:
                specs.append(("dropout", float(dropout)))
        return specs

    @nn.compact
    def __call__(self, g, train: bool = False):
        from waveformml_tpu.ops.sparse import SparseBatch

        specs = self.specs()
        if isinstance(g, SparseBatch):
            if _row_compatible(specs):  # v1/v2 SubM chains
                return self._row_forward(g, specs, train)
            from waveformml_tpu.models.nets import batch_to_grid

            g = batch_to_grid(g)
        out = g
        for i, spec in enumerate(specs):
            nm = f"l{i}"
            if spec[0] == "conv_keyed":
                _, cin, cout, k, s, p, d, key = spec
                layer = SparseConv2d(cin, cout, k, s, p, d, indice_key=key, name=nm)
            elif spec[0] == "inv":
                _, cin, cout, k, key = spec
                layer = SparseInverseConv2d(cin, cout, k, indice_key=key, name=nm)
            elif spec[0] == "subm":
                _, cin, cout, k, p, key = spec
                layer = SubMConv2d(cin, cout, k, 1, p, indice_key=key, name=nm)
            elif spec[0] == "bn":
                layer = MaskedBatchNorm(spec[1], name=nm)
            elif spec[0] == "relu":
                layer = SparseReLU(name=nm)
            elif spec[0] == "dropout":
                layer = SparseDropout(spec[1], name=nm)
            else:
                raise ValueError(spec)
            out = layer(out, train=train)
        return out

    def specs(self):
        return self.schedule(self.nin, self.nout, self.n, self.size_factor,
                             self.pad_factor, self.stride_factor, self.dil_factor,
                             self.pointwise_factor, self.dropout,
                             self.expansion_factor, self.n_expansion, self.version,
                             self.n_contraction, self.filter_multiplier)


class DSLSpecNet(_SpecNet):
    """_SpecNet over spec tuples translated from the config ``algorithm`` DSL
    (see models.algorithm.dsl_to_row_specs) — lets pure-SubM SCNet stacks run
    the row-space fast path in both 2D and 3D."""

    spec_list: Tuple[Tuple, ...]
    n_t: Optional[int] = None

    def specs(self) -> List[Tuple]:
        return list(self.spec_list)
