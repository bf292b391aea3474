"""Algorithm-DSL parsing shared by SCNet / SPConvNet / DenseConvNet.

Reproduces the reference's layer-list splitting (ref: src/models/SCNet.py:23-49
and src/models/SPConvNet.py:115-157): a leading run of "nn.*" layers starting
with nn.Conv1d becomes the per-waveform preprocessing stack; everything up to
the first "nn.Linear" is the sparse middle; the rest is the linear head.

Dense layers named inside the sparse section (nn.BatchNorm1d / nn.ReLU /
nn.Dropout) are translated onto their SparseGrid-aware equivalents (masked
batchnorm, masked activations) — the reference relies on spconv's
SparseSequential doing the same feature-row dispatch.

SCN-style layers (sparseconvnet.Convolution etc.) use a different positional
signature [DIM, NIN, NOUT, FS, STR]; adapter classes map them onto the
TPU sparse-conv layers.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax

from waveformml_tpu.ops.sparse_conv import (
    MaskedBatchNorm, SparseActivation, SparseConv2d, SparseDropout,
    SparseGrid, SparseReLU, SparseSequential, SubMConv2d, ToDense)
from waveformml_tpu.registry import registry


class SCNConvolution(nn.Module):
    """sparseconvnet.Convolution(dim, nin, nout, fs, stride, bias) adapter."""

    dimension: int
    nin: int
    nout: int
    filter_size: int
    filter_stride: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, g: SparseGrid, train: bool = False) -> SparseGrid:
        return SparseConv2d(self.nin, self.nout, self.filter_size,
                            self.filter_stride, 0, 1, use_bias=self.use_bias,
                            name="conv")(g, train=train)


class SCNSubmanifoldConvolution(nn.Module):
    """sparseconvnet.SubmanifoldConvolution(dim, nin, nout, fs, bias) adapter."""

    dimension: int
    nin: int
    nout: int
    filter_size: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, g: SparseGrid, train: bool = False) -> SparseGrid:
        return SubMConv2d(self.nin, self.nout, self.filter_size,
                          use_bias=self.use_bias, name="conv")(g, train=train)


registry.register("sparseconvnet.Convolution", SCNConvolution,
                  aliases=("scn.Convolution",))
registry.register("sparseconvnet.SubmanifoldConvolution", SCNSubmanifoldConvolution,
                  aliases=("scn.SubmanifoldConvolution",))


def split_algorithm(algorithm: Sequence[Any]) -> Tuple[List[Any], List[Any], List[Any]]:
    """Split the DSL list into (waveform_funcs, sparse_funcs, linear_funcs)
    (ref: SCNet.py:23-49)."""
    sparse_funcs: List[Any] = []
    linear_funcs: List[Any] = []
    waveform_funcs: List[Any] = []
    has_wf = False
    for i, f in enumerate(algorithm):
        if i == 0 and isinstance(f, str) and f == "nn.Conv1d":
            has_wf = True
            waveform_funcs.append(f)
            continue
        if has_wf:
            if isinstance(f, str):
                if f == "nn.Linear":
                    # the linear head starts HERE even with no sparse middle
                    # (a Conv1d stack straight into a Linear): absorbing it
                    # into the waveform section leaves linear_funcs empty and
                    # the nets crash indexing the head args
                    linear_funcs = list(algorithm[i:])
                    break
                if f.startswith("nn."):
                    waveform_funcs.append(f)
                else:
                    has_wf = False
                    sparse_funcs.append(f)
            else:
                waveform_funcs.append(f)
            continue
        if isinstance(f, str) and f == "nn.Linear":
            linear_funcs = list(algorithm[i:])
            break
        sparse_funcs.append(f)
    return waveform_funcs, sparse_funcs, linear_funcs


# dense-name → SparseGrid-aware translation inside the sparse middle
_SPARSE_TRANSLATIONS = {
    "nn.ReLU": lambda *a, **k: SparseReLU(),
    "ReLU": lambda *a, **k: SparseReLU(),
    "nn.BatchNorm1d": lambda c=None, *a, **k: MaskedBatchNorm(c),
    "BatchNorm1d": lambda c=None, *a, **k: MaskedBatchNorm(c),
    "nn.LeakyReLU": lambda s=0.01, *a, **k: SparseActivation(
        lambda x: jax.nn.leaky_relu(x, s)),
    "nn.Sigmoid": lambda *a, **k: SparseActivation(jax.nn.sigmoid),
    "nn.Tanh": lambda *a, **k: SparseActivation(jax.numpy.tanh),
    "nn.Dropout": lambda r=0.5, *a, **k: SparseDropout(float(r)),
    "Dropout": lambda r=0.5, *a, **k: SparseDropout(float(r)),
}


def build_sparse_instances(spec: Sequence[Any]) -> List[Any]:
    """create_class_instances over the sparse section, translating dense layer
    names to masked equivalents."""
    instances: List[Any] = []
    current = None
    current_name = None
    for item in spec:
        if isinstance(item, str):
            if current is not None:
                instances.append(current())
            current_name = item
            current = _SPARSE_TRANSLATIONS.get(item) or registry.retrieve_class(item)
        elif isinstance(item, (list, tuple)):
            if current is None:
                raise ValueError(f"sparse DSL: args {item} with no preceding class")
            instances.append(current(*item))
            current = None
        else:
            kwargs = item.to_dict() if hasattr(item, "to_dict") else dict(item)
            instances.append(current(**kwargs))
            current = None
    if current is not None:
        instances.append(current())
    return instances


def dsl_to_row_specs(spec: Sequence[Any]) -> Optional[List[Tuple]]:
    """Translate a sparse-section ``algorithm`` DSL list into _SpecNet row
    spec tuples when the stack is pure-SubM (stride 1, dilation 1) — the
    row-space gather-GEMM fast path then applies (2D and 3D). Returns None
    for stacks with regular/strided/inverse convs or unknown layers."""
    def _arg(args, pos, key, default=None):
        """Positional-list or dict/kwargs DSL arg (both forms are valid for
        build_sparse_instances / registry.create_class_instances)."""
        if isinstance(args, dict):
            return args.get(key, default)
        return args[pos] if len(args) > pos else default

    specs: List[Tuple] = []
    i = 0
    items = list(spec)
    while i < len(items):
        name = items[i]
        if not isinstance(name, str):
            return None
        args = items[i + 1] if i + 1 < len(items) and \
            not isinstance(items[i + 1], str) else None
        i += 2 if args is not None else 1
        if args is not None and not isinstance(args, (list, tuple, dict)):
            # Config objects: same attribute surface as the kwargs form
            args = args.to_dict() if hasattr(args, "to_dict") else None
            if args is None:
                return None
        short = name.rsplit(".", 1)[-1]
        if short in ("SubMConv2d", "SubMConv3d"):
            cin = _arg(args, 0, "in_channels") if args else None
            cout = _arg(args, 1, "out_channels") if args else None
            k = _arg(args, 2, "kernel_size") if args else None
            if cin is None or cout is None or k is None:
                return None
            cin, cout, k = int(cin), int(cout), int(k)
            stride = int(_arg(args, 3, "stride", 1))
            dilation = int(_arg(args, 5, "dilation", 1))
            # the row-conv custom VJP assumes a symmetric (odd-k) offset
            # window (row_conv.py flips the kernel for d_feats); even k would
            # silently produce wrong input gradients — use the grid path
            if stride != 1 or dilation != 1 or k % 2 != 1:
                return None
            specs.append(("subm", cin, cout, k, (k - 1) // 2, f"subm{k}"))
        elif short in ("BatchNorm1d",):
            c = _arg(args, 0, "num_features") if args else None
            specs.append(("bn", int(c) if c is not None else None))
        elif short in ("ReLU",):
            specs.append(("relu",))
        elif short in ("Dropout",):
            rate = _arg(args, 0, "p", 0.5) if args else 0.5
            specs.append(("dropout", float(rate)))
        elif short in ("ToDense", "SparseToDense"):
            specs.append(("todense",))
        else:
            return None
    return specs
