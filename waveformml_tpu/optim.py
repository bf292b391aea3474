"""Optimizers and LR schedulers with the torch class-name config API.

The reference resolves ``optimize_config.optimizer_class`` ("optim.SGD") and
``scheduler_class`` ("lr_scheduler.ExponentialLR") onto torch by reflection
(ref: src/engineering/LitPSD.py:60-76 configure_optimizers, config examples).
Here the same names map onto optax. The learning rate is injected as a
mutable hyperparameter (optax.inject_hyperparams) so epoch-stepped schedulers
— including host-driven ReduceLROnPlateau — just write the new lr into the
optimizer state between epochs, keeping one compiled train step.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import optax

from waveformml_tpu.registry import registry


# ---------------------------------------------------------------------------------
# optimizers
# ---------------------------------------------------------------------------------

def _sgd(lr: float, momentum: float = 0.0, weight_decay: float = 0.0,
         dampening: float = 0.0, nesterov: bool = False) -> optax.GradientTransformation:
    """torch.optim.SGD semantics: v = μv + (1-dampening)·g; update uses
    nesterov lookahead when set; weight_decay is L2 (added to grad)."""

    if nesterov and (dampening or not momentum):
        raise ValueError("nesterov momentum requires a momentum and zero "
                         "dampening (torch.optim.SGD contract)")

    def build(learning_rate):
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        if momentum and dampening:
            chain.append(_trace_with_dampening(momentum, dampening))
        elif momentum:
            chain.append(optax.trace(decay=momentum, nesterov=nesterov,
                                     accumulator_dtype=None))
        chain.append(optax.scale_by_learning_rate(learning_rate))
        return optax.chain(*chain)

    return optax.inject_hyperparams(build)(learning_rate=lr)


def _trace_with_dampening(momentum: float, dampening: float) -> optax.GradientTransformation:
    """torch momentum buffer with dampening: buf_0 = g_0 (no dampening on the
    very first step), buf_t = momentum*buf + (1-dampening)*g thereafter."""
    import jax
    import jax.numpy as jnp

    def init(params):
        return {"trace": jax.tree_util.tree_map(jnp.zeros_like, params),
                "count": jnp.zeros([], jnp.int32)}

    def update(updates, state, params=None):
        first = state["count"] == 0
        scale = jnp.where(first, 1.0, 1.0 - dampening)
        new_trace = jax.tree_util.tree_map(
            lambda t, g: momentum * t + scale * g, state["trace"], updates)
        return new_trace, {"trace": new_trace, "count": state["count"] + 1}

    return optax.GradientTransformation(init, update)


def _adam(lr: float, betas=(0.9, 0.999), eps: float = 1e-8,
          weight_decay: float = 0.0) -> optax.GradientTransformation:
    def build(learning_rate):
        chain = [optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps)]
        if weight_decay:
            chain.insert(0, optax.add_decayed_weights(weight_decay))
        chain.append(optax.scale_by_learning_rate(learning_rate))
        return optax.chain(*chain)

    return optax.inject_hyperparams(build)(learning_rate=lr)


def _adamw(lr: float, betas=(0.9, 0.999), eps: float = 1e-8,
           weight_decay: float = 0.01) -> optax.GradientTransformation:
    def build(learning_rate):
        return optax.chain(
            optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(learning_rate))

    return optax.inject_hyperparams(build)(learning_rate=lr)


def _rmsprop(lr: float, alpha: float = 0.99, eps: float = 1e-8,
             weight_decay: float = 0.0, momentum: float = 0.0) -> optax.GradientTransformation:
    def build(learning_rate):
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        # torch.optim.RMSprop divides by sqrt(nu) + eps; optax's default
        # eps_in_sqrt=True computes sqrt(nu + eps), which differs by
        # orders of magnitude for small gradients
        chain.append(optax.scale_by_rms(decay=alpha, eps=eps,
                                        eps_in_sqrt=False))
        if momentum:
            chain.append(optax.trace(decay=momentum))
        chain.append(optax.scale_by_learning_rate(learning_rate))
        return optax.chain(*chain)

    return optax.inject_hyperparams(build)(learning_rate=lr)


_OPTIMIZERS: Dict[str, Callable] = {
    "SGD": _sgd,
    "optim.SGD": _sgd,
    "Adam": _adam,
    "optim.Adam": _adam,
    "AdamW": _adamw,
    "optim.AdamW": _adamw,
    "RMSprop": _rmsprop,
    "optim.RMSprop": _rmsprop,
}
for name, fn in _OPTIMIZERS.items():
    registry.register(name, fn)


def build_optimizer(name: str, lr: float, params: Optional[Dict[str, Any]] = None
                    ) -> optax.GradientTransformation:
    key = name.split(".")[-1]
    fn = _OPTIMIZERS.get(name) or _OPTIMIZERS.get(key) or _OPTIMIZERS.get("optim." + key)
    if fn is None:
        raise KeyError(f"unknown optimizer {name!r}")
    p = dict(params or {})
    if "betas" in p and isinstance(p["betas"], list):
        p["betas"] = tuple(p["betas"])
    return fn(lr, **p)


def _hyperparams_state(opt_state):
    """Locate the inject_hyperparams state inside a possibly wrapped opt
    state (optax.chain tuples, MultiSteps for accumulate_grad_batches)."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state
    if hasattr(opt_state, "inner_opt_state"):  # optax.MultiSteps
        return _hyperparams_state(opt_state.inner_opt_state)
    if isinstance(opt_state, (tuple, list)):  # optax.chain
        for s in opt_state:
            found = _hyperparams_state(s)
            if found is not None:
                return found
    return None


def set_learning_rate(opt_state, lr: float):
    """Write a new lr into inject_hyperparams state (epoch scheduler step)."""
    import jax.numpy as jnp

    state = _hyperparams_state(opt_state)
    if state is None:
        raise ValueError(
            "optimizer state does not expose a mutable learning rate "
            "(no inject_hyperparams state found); build optimizers through "
            "waveformml_tpu.optim.build_optimizer")
    cur = state.hyperparams["learning_rate"]
    state.hyperparams["learning_rate"] = jnp.asarray(
        lr, dtype=getattr(cur, "dtype", jnp.float32))
    return opt_state


def get_learning_rate(opt_state) -> float:
    state = _hyperparams_state(opt_state)
    if state is None:
        raise ValueError(
            "optimizer state does not expose a learning rate "
            "(no inject_hyperparams state found)")
    return float(state.hyperparams["learning_rate"])


# ---------------------------------------------------------------------------------
# epoch schedulers (host-side; mirror torch.optim.lr_scheduler semantics)
# ---------------------------------------------------------------------------------

class Scheduler:
    """lr(epoch) multiplier schedule stepped once per epoch."""

    def __init__(self, base_lr: float, **kwargs):
        self.base_lr = base_lr
        self.epoch = 0

    def step(self, metric: Optional[float] = None) -> float:
        """Advance one epoch; return the new lr."""
        self.epoch += 1
        return self.lr()

    def lr(self) -> float:
        raise NotImplementedError

    def state_dict(self) -> Dict[str, Any]:
        return {"epoch": self.epoch, "base_lr": self.base_lr}

    def load_state_dict(self, d: Dict[str, Any]) -> None:
        self.epoch = d["epoch"]
        self.base_lr = d["base_lr"]


@registry.register("lr_scheduler.ExponentialLR", aliases=("ExponentialLR",))
class ExponentialLR(Scheduler):
    def __init__(self, base_lr: float, gamma: float = 0.9, **kwargs):
        super().__init__(base_lr)
        self.gamma = gamma

    def lr(self) -> float:
        return self.base_lr * (self.gamma ** self.epoch)


@registry.register("lr_scheduler.StepLR", aliases=("StepLR",))
class StepLR(Scheduler):
    def __init__(self, base_lr: float, step_size: int = 10, gamma: float = 0.1, **kwargs):
        super().__init__(base_lr)
        self.step_size = step_size
        self.gamma = gamma

    def lr(self) -> float:
        return self.base_lr * (self.gamma ** (self.epoch // self.step_size))


@registry.register("lr_scheduler.CosineAnnealingLR", aliases=("CosineAnnealingLR",))
class CosineAnnealingLR(Scheduler):
    def __init__(self, base_lr: float, T_max: int = 50, eta_min: float = 0.0, **kwargs):
        super().__init__(base_lr)
        self.T_max = T_max
        self.eta_min = eta_min

    def lr(self) -> float:
        return self.eta_min + (self.base_lr - self.eta_min) * \
            (1 + math.cos(math.pi * self.epoch / self.T_max)) / 2


@registry.register("lr_scheduler.ReduceLROnPlateau", aliases=("ReduceLROnPlateau",))
class ReduceLROnPlateau(Scheduler):
    """torch.optim.lr_scheduler.ReduceLROnPlateau semantics: 'rel' threshold
    mode by default (best·(1−threshold) for min — an absolute bar at torch's
    1e-4 default would be ~100× stricter at small loss scales), cooldown
    epochs after each reduction, and full state round-trip through
    checkpoints (current LR, best, bad_epochs, cooldown)."""

    def __init__(self, base_lr: float, factor: float = 0.1, patience: int = 10,
                 min_lr: float = 0.0, mode: str = "min", threshold: float = 1e-4,
                 threshold_mode: str = "rel", cooldown: int = 0, **kwargs):
        super().__init__(base_lr)
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.mode = mode
        self.threshold = threshold
        if threshold_mode not in ("rel", "abs"):
            raise ValueError(f"threshold_mode must be rel/abs, got {threshold_mode!r}")
        self.threshold_mode = threshold_mode
        self.cooldown = int(cooldown)
        self.cooldown_counter = 0
        self.best: Optional[float] = None
        self.bad_epochs = 0
        self.current = base_lr

    def _improved(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.threshold_mode == "rel":
            if self.mode == "min":
                return metric < self.best * (1.0 - self.threshold)
            return metric > self.best * (1.0 + self.threshold)
        if self.mode == "min":
            return metric < self.best - self.threshold
        return metric > self.best + self.threshold

    def step(self, metric: Optional[float] = None) -> float:
        self.epoch += 1
        if metric is None:
            return self.current
        # torch order of operations: cooldown ticks down EVERY epoch while
        # active (improvements don't extend it) and suppresses bad_epochs
        if self._improved(metric):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.bad_epochs = 0
        if self.bad_epochs > self.patience:
            self.current = max(self.min_lr, self.current * self.factor)
            self.bad_epochs = 0
            self.cooldown_counter = self.cooldown
        return self.current

    def lr(self) -> float:
        return self.current

    def state_dict(self) -> Dict[str, Any]:
        # resume must NOT reset the reduced LR back to base_lr or forget the
        # plateau history
        d = super().state_dict()
        d.update({"current": self.current, "best": self.best,
                  "bad_epochs": self.bad_epochs,
                  "cooldown_counter": self.cooldown_counter})
        return d

    def load_state_dict(self, d: Dict[str, Any]) -> None:
        super().load_state_dict(d)
        self.current = d.get("current", self.base_lr)
        self.best = d.get("best")
        self.bad_epochs = d.get("bad_epochs", 0)
        self.cooldown_counter = d.get("cooldown_counter", 0)


def build_scheduler(name: Optional[str], base_lr: float,
                    params: Optional[Dict[str, Any]] = None) -> Optional[Scheduler]:
    if not name:
        return None
    cls = registry.lookup(name) or registry.lookup(name.split(".")[-1])
    if cls is None:
        raise KeyError(f"unknown scheduler {name!r}")
    return cls(base_lr, **dict(params or {}))
