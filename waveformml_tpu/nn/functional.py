"""Loss criteria with the torch class-name API the configs use.

The reference resolves ``net_config.criterion_class`` (e.g. "CrossEntropyLoss",
"L1Loss") onto torch.nn by reflection (ref: src/engineering/LitBase.py:38-43)
with reduction "mean" for event-level tasks and "sum" for segment-level tasks.
Here each criterion is a pure-JAX callable class registered under the same
names. All criteria accept ``reduction`` in {"mean", "sum", "none"} and an
optional ``where`` mask (TPU addition: masked reductions over padded batches).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from waveformml_tpu.registry import registry


def _reduce(x: jax.Array, reduction: str, where: Optional[jax.Array] = None) -> jax.Array:
    if where is not None:
        x = jnp.where(where, x, 0)
    if reduction == "none":
        return x
    if reduction == "sum":
        return jnp.sum(x)
    if reduction == "mean":
        if where is not None:
            return jnp.sum(x) / jnp.maximum(jnp.sum(where), 1)
        return jnp.mean(x)
    raise ValueError(f"unknown reduction {reduction!r}")


class _Criterion:
    reduction: str = "mean"

    def __init__(self, *args, reduction: str = "mean", **kwargs):
        self.reduction = reduction
        if args or kwargs:
            # silently discarding config criterion_params (the torch classes
            # would have honored them) trains a different objective than the
            # user asked for — refuse loudly instead
            raise ValueError(
                f"{type(self).__name__}: unsupported criterion params "
                f"args={args!r} kwargs={kwargs!r}")

    def __call__(self, pred: jax.Array, target: jax.Array,
                 where: Optional[jax.Array] = None) -> jax.Array:
        return _reduce(self.elementwise(pred, target), self.reduction, where)

    def elementwise(self, pred: jax.Array, target: jax.Array) -> jax.Array:
        raise NotImplementedError

    def mean_denominator(self, target: jax.Array) -> Optional[jax.Array]:
        """Per-sample contribution to the 'mean' denominator, or None for the
        plain sample count. torch divides a weighted NLL/CE mean by the sum of
        the selected class weights, not the count — tasks that rebuild the
        reduction from elementwise() (for psum-able loss_sum/weight pairs)
        must use this as the denominator term."""
        return None


class _WeightedNLLBase(_Criterion):
    """Shared per-class-weight handling (torch's first positional arg)."""

    def __init__(self, weight=None, *args, reduction: str = "mean", **kwargs):
        super().__init__(*args, reduction=reduction, **kwargs)
        self.weight = None if weight is None else \
            jnp.asarray(weight, jnp.float32)

    def _logp(self, pred):
        raise NotImplementedError

    def elementwise(self, pred, target):
        t = target[..., None].astype(jnp.int32)
        nll = -jnp.take_along_axis(self._logp(pred), t, axis=-1)[..., 0]
        if self.weight is not None:
            nll = nll * self.weight[t[..., 0]]
        return nll

    def __call__(self, pred, target, where=None):
        x = self.elementwise(pred, target)
        if self.weight is not None and self.reduction == "mean":
            # torch divides a weighted mean by Σ weights, not the count
            w = self.mean_denominator(target)
            if where is not None:
                x = jnp.where(where, x, 0)
                w = jnp.where(where, w, 0)
            return jnp.sum(x) / jnp.maximum(jnp.sum(w), 1e-12)
        return _reduce(x, self.reduction, where)

    def mean_denominator(self, target):
        # Defined regardless of self.reduction: the task path builds criteria
        # with reduction="none" and reconstructs the reference's reduction
        # itself (mean for event-level tasks, LitBase.py:39-43).
        if self.weight is None:
            return None
        return self.weight[target.astype(jnp.int32)]


@registry.register("CrossEntropyLoss", aliases=("nn.CrossEntropyLoss",))
class CrossEntropyLoss(_WeightedNLLBase):
    """Softmax cross entropy on logits [N, C] with int targets [N];
    optional per-class ``weight`` (torch positional convention)."""

    def _logp(self, pred):
        return jax.nn.log_softmax(pred, axis=-1)


@registry.register("NLLLoss", aliases=("nn.NLLLoss",))
class NLLLoss(_WeightedNLLBase):
    """Negative log likelihood on log-probabilities [N, C]."""

    def _logp(self, pred):
        return pred


@registry.register("L1Loss", aliases=("nn.L1Loss",))
class L1Loss(_Criterion):
    def elementwise(self, pred, target):
        return jnp.abs(pred - target)


@registry.register("MSELoss", aliases=("nn.MSELoss",))
class MSELoss(_Criterion):
    def elementwise(self, pred, target):
        d = pred - target
        return d * d


@registry.register("SmoothL1Loss", aliases=("nn.SmoothL1Loss",))
class SmoothL1Loss(_Criterion):
    def __init__(self, *args, reduction: str = "mean", beta: float = 1.0, **kwargs):
        super().__init__(reduction=reduction)
        self.beta = beta

    def elementwise(self, pred, target):
        d = jnp.abs(pred - target)
        return jnp.where(d < self.beta, 0.5 * d * d / self.beta, d - 0.5 * self.beta)


@registry.register("BCELoss", aliases=("nn.BCELoss",))
class BCELoss(_Criterion):
    def elementwise(self, pred, target):
        eps = 1e-7
        p = jnp.clip(pred, eps, 1 - eps)
        t = target.astype(p.dtype)
        return -(t * jnp.log(p) + (1 - t) * jnp.log1p(-p))


@registry.register("BCEWithLogitsLoss", aliases=("nn.BCEWithLogitsLoss",))
class BCEWithLogitsLoss(_Criterion):
    def elementwise(self, pred, target):
        t = target.astype(pred.dtype)
        # numerically stable: max(x,0) - x*t + log(1 + exp(-|x|))
        return jnp.maximum(pred, 0) - pred * t + jnp.log1p(jnp.exp(-jnp.abs(pred)))


@registry.register("HuberLoss", aliases=("nn.HuberLoss",))
class HuberLoss(_Criterion):
    def __init__(self, *args, reduction: str = "mean", delta: float = 1.0, **kwargs):
        super().__init__(reduction=reduction)
        self.delta = delta

    def elementwise(self, pred, target):
        d = jnp.abs(pred - target)
        return jnp.where(d < self.delta, 0.5 * d * d, self.delta * (d - 0.5 * self.delta))


def build_criterion(name: str, params=None, reduction: str = "mean"):
    """Resolve criterion_class + criterion_params from config
    (ref: LitBase.py:38-43)."""
    cls = registry.retrieve_class(name)
    args = list(params) if params else []
    return cls(*args, reduction=reduction)
