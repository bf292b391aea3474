"""Optimizer semantics vs torch.optim (the config contract: torch class
names in optimize_config must behave like torch, ref config examples +
src/engineering/LitPSD.py:60-76 configure_optimizers)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

import waveformml_tpu.optim as wopt


def _run_ours(opt, w0, grads):
    """Apply a fixed gradient sequence through our optax transformation."""
    import optax

    w = jnp.asarray(w0)
    state = opt.init(w)
    for g in grads:
        updates, state = opt.update(jnp.asarray(g), state, w)
        w = optax.apply_updates(w, updates)
    return np.asarray(w)


def _run_torch(torch_opt_cls, w0, grads, **kw):
    w = torch.tensor(np.asarray(w0), requires_grad=True)
    opt = torch_opt_cls([w], **kw)
    for g in grads:
        opt.zero_grad()
        w.grad = torch.tensor(np.asarray(g))
        opt.step()
    return w.detach().numpy()


@pytest.mark.parametrize("momentum,dampening,weight_decay,nesterov", [
    (0.0, 0.0, 0.0, False),
    (0.9, 0.0, 0.0, False),
    (0.9, 0.0, 0.0, True),
    (0.9, 0.3, 0.0, False),       # dampening path (custom trace)
    (0.9, 0.3, 0.01, False),      # dampening + L2
])
def test_sgd_matches_torch(momentum, dampening, weight_decay, nesterov):
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=7).astype(np.float32)
    grads = [rng.normal(size=7).astype(np.float32) for _ in range(6)]
    ours = _run_ours(
        wopt.build_optimizer("optim.SGD", 0.1,
                             {"momentum": momentum, "dampening": dampening,
                              "weight_decay": weight_decay,
                              "nesterov": nesterov}),
        w0, grads)
    theirs = _run_torch(torch.optim.SGD, w0, grads, lr=0.1, momentum=momentum,
                        dampening=dampening, weight_decay=weight_decay,
                        nesterov=nesterov)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_sgd_nesterov_dampening_rejected():
    with pytest.raises(ValueError):
        wopt.build_optimizer("optim.SGD", 0.1,
                             {"momentum": 0.9, "dampening": 0.3,
                              "nesterov": True})


def test_adam_matches_torch():
    rng = np.random.default_rng(1)
    w0 = rng.normal(size=5).astype(np.float32)
    grads = [rng.normal(size=5).astype(np.float32) for _ in range(8)]
    ours = _run_ours(wopt.build_optimizer("optim.Adam", 0.01), w0, grads)
    theirs = _run_torch(torch.optim.Adam, w0, grads, lr=0.01)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)
