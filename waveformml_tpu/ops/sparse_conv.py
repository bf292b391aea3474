"""TPU-native sparse convolution with exact spconv occupancy semantics.

The reference leans on the spconv / SparseConvNet C++/CUDA libraries
(ref: src/models/SPConvNet.py:49-69, src/models/SPConvBlocks.py throughout,
src/models/SCNet.py:62-77). Their gather-GEMM-scatter machinery exists because
GPU sparse tensors over large grids can't afford densification. The PROSPECT
grid is 14×11 = 154 sites — a dense [B, NX, NY, C] block is tiny, maps
straight onto the MXU through XLA's convolution, and the sparse semantics
reduce to *occupancy-mask algebra*:

  * SubMConv2d: output sites = input sites. With zeros at inactive sites, the
    dense conv sum over the window equals the sparse gather-sum, so
    ``out = (conv(x) + bias) * occ`` is EXACT.
  * SparseConv2d: output sites = sites whose window touches ≥1 active input
    (occupancy dilation). ``new_occ = conv_geometry(occ) > 0`` via a
    ones-kernel conv with the same stride/pad/dilation.
  * SparseInverseConv2d: transposed conv restoring the occupancy recorded
    earlier under the same ``indice_key`` (ref spconv indice_key reuse).
  * ToDense: drop the mask (zeros at inactive sites already).

Masked BatchNorm reproduces spconv's BatchNorm1d over active feature rows
only (SURVEY §7.3: padding must not pollute the statistics).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from waveformml_tpu.registry import registry


def _ntuple(v, n: int) -> Tuple[int, ...]:
    if isinstance(v, (list, tuple)):
        assert len(v) == n, f"expected {n}-tuple, got {v}"
        return tuple(int(x) for x in v)
    return (int(v),) * n


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SparseGrid:
    """Dense-layout sparse tensor: features [B, *spatial, C] (zeros off-mask,
    2 or 3 spatial dims), occupancy [B, *spatial] bool, and saved occupancies
    per indice_key. The conv layers below derive their rank from the input,
    so the same classes serve 2DConvolution and 3DConvolution nets."""

    features: jax.Array
    occupancy: jax.Array
    indice_occ: Dict[str, jax.Array] = dataclasses.field(default_factory=dict)
    # static per-indice_key record of the paired forward conv's geometry
    # ((key, (kernel, stride, padding, dilation)), ...) — spconv infers the
    # inverse conv's upsampling geometry from the indice_key pairing, so the
    # grid must carry it (hashable tuple: it is jit-static metadata)
    indice_geom: Tuple[Tuple[str, Tuple[Tuple[int, ...], ...]], ...] = \
        dataclasses.field(default=(), metadata=dict(static=True))

    @property
    def batch_size(self) -> int:
        return self.features.shape[0]

    @property
    def spatial_shape(self) -> Tuple[int, ...]:
        return self.features.shape[1:-1]

    @property
    def ndim_spatial(self) -> int:
        return self.features.ndim - 2

    @property
    def n_features(self) -> int:
        return self.features.shape[-1]

    def with_features(self, f: jax.Array, occ: Optional[jax.Array] = None,
                      save_key: Optional[str] = None,
                      save_geom: Optional[Tuple[Tuple[int, ...], ...]] = None,
                      ) -> "SparseGrid":
        new_occ = self.occupancy if occ is None else occ
        keys = dict(self.indice_occ)
        geoms = self.indice_geom
        if save_key is not None:
            keys[save_key] = self.occupancy
            if save_geom is not None:
                geoms = tuple(t for t in geoms if t[0] != save_key) \
                    + ((save_key, save_geom),)
        return SparseGrid(f, new_occ, keys, geoms)

    def geom_for(self, key: str) -> Optional[Tuple[Tuple[int, ...], ...]]:
        for k, rec in self.indice_geom:
            if k == key:
                return rec
        return None

    def masked(self) -> jax.Array:
        """Features with the mask enforced (zeros at inactive sites)."""
        return self.features * self.occupancy[..., None].astype(self.features.dtype)


def _conv_dims(nd: int):
    """(lhs, rhs, out) dimension-number strings for nd spatial dims."""
    sp = "DHW"[-nd:] if nd <= 3 else None
    assert sp, f"unsupported conv rank {nd}"
    return (f"N{sp}C", f"{sp}IO", f"N{sp}C")


def dilate_occupancy(occ: jax.Array, kernel_size, stride, padding, dilation) -> jax.Array:
    """Occupancy evolution of a regular sparse conv: output site active iff its
    receptive window contains ≥1 active input site. Rank comes from occ."""
    nd = occ.ndim - 1
    k, s, p, d = (_ntuple(kernel_size, nd), _ntuple(stride, nd),
                  _ntuple(padding, nd), _ntuple(dilation, nd))
    x = occ[..., None].astype(jnp.float32)
    ones = jnp.ones(k + (1, 1), jnp.float32)
    y = jax.lax.conv_general_dilated(
        x, ones, window_strides=s,
        padding=[(pi, pi) for pi in p], rhs_dilation=d,
        dimension_numbers=_conv_dims(nd))
    return y[..., 0] > 0.5


class SubMConv2d(nn.Module):
    """Submanifold sparse conv: stride must be 1, occupancy preserved
    (ref: spconv.SubMConv2d usage in SPConvBlocks.py)."""

    in_channels: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    dilation: Union[int, Sequence[int]] = 1
    use_bias: bool = True
    indice_key: Optional[str] = None

    @nn.compact
    def __call__(self, g: SparseGrid, train: bool = False) -> SparseGrid:
        nd = g.ndim_spatial
        k, d = _ntuple(self.kernel_size, nd), _ntuple(self.dilation, nd)
        # SubM keeps spatial size: pad to same (spconv pads (k-1)//2 implicitly)
        p = tuple(((ki - 1) * di) // 2 for ki, di in zip(k, d))
        y = nn.Conv(self.out_channels, k, strides=(1,) * nd,
                    padding=[(pi, pi) for pi in p], kernel_dilation=d,
                    use_bias=self.use_bias, dtype=g.features.dtype,
                    name="conv")(g.masked())
        y = y * g.occupancy[..., None].astype(y.dtype)
        return g.with_features(y, save_key=self.indice_key,
                               save_geom=(k, (1,) * nd, p, d))


class SparseConv2d(nn.Module):
    """Regular sparse conv: occupancy dilates (and may stride down)."""

    in_channels: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    dilation: Union[int, Sequence[int]] = 1
    use_bias: bool = True
    indice_key: Optional[str] = None

    @nn.compact
    def __call__(self, g: SparseGrid, train: bool = False) -> SparseGrid:
        nd = g.ndim_spatial
        k, s, p, d = (_ntuple(self.kernel_size, nd), _ntuple(self.stride, nd),
                      _ntuple(self.padding, nd), _ntuple(self.dilation, nd))
        y = nn.Conv(self.out_channels, k, strides=s,
                    padding=[(pi, pi) for pi in p], kernel_dilation=d,
                    use_bias=self.use_bias, dtype=g.features.dtype,
                    name="conv")(g.masked())
        new_occ = dilate_occupancy(g.occupancy, k, s, p, d)
        y = y * new_occ[..., None].astype(y.dtype)
        keys = dict(g.indice_occ)
        geoms = g.indice_geom
        if self.indice_key is not None:
            keys[self.indice_key] = g.occupancy
            geoms = tuple(t for t in geoms if t[0] != self.indice_key) \
                + ((self.indice_key, (k, s, p, d)),)
        return SparseGrid(y, new_occ, keys, geoms)


class SparseInverseConv2d(nn.Module):
    """Inverse sparse conv: the exact transposed convolution of the paired
    forward conv, restoring the occupancy (and spatial shape) saved under
    ``indice_key``.

    spconv infers the inverse geometry (stride/padding/dilation) from the
    indice_key pairing (ref: SPConvBlocks.py:806-811 passes only the kernel
    size and the key); the grid carries that geometry in ``indice_geom``.
    out[i] = Σ_{j, t : i = j·s + t·d − p} w[t] x[j] — i.e. a fractionally
    strided conv (lhs_dilation=s) with the spatially flipped kernel; the
    floor-cut tail of a strided pairing (torch's output_padding) falls out of
    the end-padding computed against the saved occupancy's shape.
    """

    in_channels: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]] = 3
    indice_key: str = ""
    use_bias: bool = True

    @nn.compact
    def __call__(self, g: SparseGrid, train: bool = False) -> SparseGrid:
        if self.indice_key not in g.indice_occ:
            raise ValueError(f"indice_key '{self.indice_key}' not found; "
                             f"have {list(g.indice_occ)}")
        prev_occ = g.indice_occ[self.indice_key]
        nd = g.ndim_spatial
        k = _ntuple(self.kernel_size, nd)
        geom = g.geom_for(self.indice_key)
        if geom is None:
            # no recorded pair (e.g. key saved by with_features directly):
            # assume a stride-1 "same" pairing like SubM
            s_f, p_f, d_f = (1,) * nd, tuple((ki - 1) // 2 for ki in k), (1,) * nd
        else:
            k_f, s_f, p_f, d_f = geom
            if tuple(k_f) != k:
                raise ValueError(
                    f"kernel_size {k} != paired conv kernel {tuple(k_f)} for "
                    f"indice_key '{self.indice_key}' (spconv requires them equal)")
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            k + (self.in_channels, self.out_channels), jnp.float32)
        w = jnp.flip(kernel.astype(g.features.dtype), axis=tuple(range(nd)))
        x = g.masked()
        o, target = x.shape[1:-1], prev_occ.shape[1:]
        pads = []
        for i in range(nd):
            lo = d_f[i] * (k[i] - 1) - p_f[i]
            min_out = (o[i] - 1) * s_f[i] + d_f[i] * (k[i] - 1) - 2 * p_f[i] + 1
            pads.append((lo, lo + (target[i] - min_out)))
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,) * nd, padding=pads,
            lhs_dilation=s_f, rhs_dilation=d_f,
            dimension_numbers=_conv_dims(nd))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.out_channels,), jnp.float32)
            y = y + bias.astype(y.dtype)
        y = y * prev_occ[..., None].astype(y.dtype)
        return SparseGrid(y, prev_occ, dict(g.indice_occ), g.indice_geom)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over active sites only — equivalent of spconv applying
    nn.BatchNorm1d to the active feature rows."""

    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, g: SparseGrid, train: bool = False) -> SparseGrid:
        x = g.features
        mask = g.occupancy[..., None].astype(x.dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.num_features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.num_features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (self.num_features,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,))
        if train:
            from waveformml_tpu.nn.bn import get_bn_axis

            axis = get_bn_axis()
            red_axes = tuple(range(x.ndim - 1))
            # batch statistics always accumulate in f32 (torch BatchNorm1d /
            # flax BatchNorm do the same): under the bf16 half-precision path
            # a bf16 count is exact only up to 256 active sites, and bf16
            # xsum/vsum would bias the mean/var fed into the running stats
            xf = x.astype(jnp.float32)
            maskf = mask.astype(jnp.float32)
            count = jnp.sum(maskf)
            xsum = jnp.sum(xf * maskf, axis=red_axes)
            if axis is not None:
                # sync statistics across data-parallel shards (single-GPU
                # reference parity: BN sees the whole global batch)
                count = jax.lax.psum(count, axis)
                xsum = jax.lax.psum(xsum, axis)
            count = jnp.maximum(count, 1.0)
            mean = xsum / count
            vsum = jnp.sum(((xf - mean) ** 2) * maskf, axis=red_axes)
            if axis is not None:
                vsum = jax.lax.psum(vsum, axis)
            var = vsum / count
            if not self.is_initializing():
                m = self.momentum
                # torch updates running_var with the UNBIASED batch variance
                # (Bessel), while normalizing with the biased one
                var_unbiased = vsum / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * var_unbiased
            mean, var = mean.astype(x.dtype), var.astype(x.dtype)
        else:
            mean, var = ra_mean.value.astype(x.dtype), ra_var.value.astype(x.dtype)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        y = y * mask
        return g.with_features(y)


class SparseReLU(nn.Module):
    def __call__(self, g: SparseGrid, train: bool = False) -> SparseGrid:
        return g.with_features(jax.nn.relu(g.features))


class SparseDropout(nn.Module):
    """nn.Dropout over grid features (ref: SPConvBlocks.py nn.Dropout after
    each bn+relu). Zeroing/rescaling preserves padding-site zeros, so no
    re-mask is needed."""

    rate: float

    @nn.compact
    def __call__(self, g: SparseGrid, train: bool = False) -> SparseGrid:
        return g.with_features(
            nn.Dropout(self.rate, deterministic=not train)(g.features))


class SparseActivation(nn.Module):
    """Wrap any elementwise activation over a SparseGrid, re-masking after
    (activations with f(0) != 0 must not activate padding sites)."""

    fn: Any

    def __call__(self, g: SparseGrid, train: bool = False) -> SparseGrid:
        y = self.fn(g.features) * g.occupancy[..., None].astype(g.features.dtype)
        return g.with_features(y)


class ToDense(nn.Module):
    """spconv.ToDense equivalent: SparseGrid → dense [B, C, *spatial] (torch
    layout, matching the reference models' flatten ordering expectations)."""

    def __call__(self, g: SparseGrid, train: bool = False) -> jax.Array:
        x = g.masked()
        return jnp.transpose(x, (0, x.ndim - 1) + tuple(range(1, x.ndim - 1)))


class SparseSequential(nn.Module):
    """Sequential over SparseGrid-transforming layers (spconv.SparseSequential)."""

    layers: Sequence[Any]

    @nn.compact
    def __call__(self, g, train: bool = False):
        for layer in self.layers:
            g = layer(g, train=train)
        return g


# registry aliases so algorithm-DSL configs using spconv / SparseConvNet names
# resolve to the TPU implementations
registry.register("spconv.SubMConv2d", SubMConv2d, aliases=("SubMConv2d",))
registry.register("spconv.SparseConv2d", SparseConv2d, aliases=("SparseConv2d",))
registry.register("spconv.SparseInverseConv2d", SparseInverseConv2d,
                  aliases=("SparseInverseConv2d",))
# rank is derived from the input grid, so the 3d DSL names (ModelValidation.py
# ref :26-31 lists spconv.SparseConv3d/SubMConv3d/SparseConvTranspose3d)
# resolve to the same rank-generic classes
registry.register("spconv.SubMConv3d", SubMConv2d, aliases=("SubMConv3d",))
registry.register("spconv.SparseConv3d", SparseConv2d, aliases=("SparseConv3d",))
registry.register("spconv.SparseInverseConv3d", SparseInverseConv2d,
                  aliases=("SparseInverseConv3d",))
registry.register("spconv.ToDense", ToDense,
                  aliases=("ToDense", "sparseconvnet.SparseToDense"))
registry.register("spconv.SparseSequential", SparseSequential,
                  aliases=("SparseSequential", "sparseconvnet.Sequential"))
