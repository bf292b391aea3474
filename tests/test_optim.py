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


def test_plateau_scheduler_state_roundtrip_and_rel_threshold():
    """ReduceLROnPlateau: (a) torch's default 'rel' threshold mode —
    improvement means metric < best*(1-threshold); (b) cooldown suppresses
    bad-epoch counting after a cut; (c) checkpoint state round-trips the
    reduced LR and plateau history (resume used to reset to base_lr)."""
    from waveformml_tpu.optim import ReduceLROnPlateau

    s = ReduceLROnPlateau(1.0, factor=0.5, patience=1, threshold=0.1,
                          cooldown=1)
    assert s.step(1.0) == 1.0          # first metric = best
    assert s.step(0.95) == 1.0         # not < 1.0*(1-0.1): bad_epoch 1
    assert s.step(0.95) == 0.5         # bad_epoch 2 > patience: cut, cooldown
    assert s.step(0.95) == 0.5         # cooldown epoch: no bad_epoch
    assert s.bad_epochs == 0
    assert s.step(0.85) == 0.5         # 0.85 < 1.0*0.9: improvement
    assert s.best == 0.85

    d = s.state_dict()
    s2 = ReduceLROnPlateau(1.0, factor=0.5, patience=1, threshold=0.1,
                           cooldown=1)
    s2.load_state_dict(d)
    assert s2.current == 0.5 and s2.best == 0.85 and s2.lr() == 0.5

    # abs mode must be distinguishable from rel: best=2.0 gives rel bound
    # 2.0*(1-0.1)=1.8 but abs bound 2.0-0.1=1.9 — metric 1.85 improves ONLY
    # under abs mode
    sa = ReduceLROnPlateau(1.0, factor=0.5, patience=0, threshold=0.1,
                           threshold_mode="abs")
    sa.step(2.0)
    assert sa.step(1.85) == 1.0 and sa.best == 1.85  # abs: improvement
    sr = ReduceLROnPlateau(1.0, factor=0.5, patience=0, threshold=0.1)
    sr.step(2.0)
    assert sr.step(1.85) == 0.5  # rel: bad epoch -> cut


def test_closed_form_schedulers_match_torch_trajectories():
    """ExponentialLR / StepLR / CosineAnnealingLR LR trajectories must match
    torch.optim.lr_scheduler epoch-for-epoch over 25 epochs."""
    import torch

    from waveformml_tpu.optim import (CosineAnnealingLR, ExponentialLR,
                                      StepLR)

    cases = [
        (ExponentialLR(0.1, gamma=0.85),
         lambda o: torch.optim.lr_scheduler.ExponentialLR(o, gamma=0.85)),
        (StepLR(0.1, step_size=4, gamma=0.3),
         lambda o: torch.optim.lr_scheduler.StepLR(o, step_size=4, gamma=0.3)),
        (CosineAnnealingLR(0.1, T_max=10, eta_min=0.001),
         lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(
             o, T_max=10, eta_min=0.001)),
    ]
    for ours, make_torch in cases:
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=0.1)
        theirs = make_torch(opt)
        np.testing.assert_allclose(ours.lr(), opt.param_groups[0]["lr"],
                                   rtol=1e-6)
        for epoch in range(25):
            lr_ours = ours.step()
            opt.step()
            theirs.step()
            np.testing.assert_allclose(
                lr_ours, opt.param_groups[0]["lr"], rtol=1e-6,
                err_msg=f"{type(ours).__name__} epoch {epoch}")


def test_plateau_scheduler_matches_torch_trajectories():
    """LR trajectory parity vs torch.optim.lr_scheduler.ReduceLROnPlateau on
    random metric sequences — in particular improvements landing INSIDE the
    cooldown window, where torch still decrements the cooldown counter (an
    improvement must not extend cooldown and delay the next cut)."""
    import torch

    from waveformml_tpu.optim import ReduceLROnPlateau

    rng = np.random.default_rng(7)
    for case, (patience, cooldown, threshold) in enumerate(
            [(0, 1, 0.1), (1, 2, 0.05), (2, 1, 0.0), (0, 3, 0.2)]):
        metrics = rng.random(30).tolist()
        # plant an improvement right after a likely cut to hit the
        # improve-during-cooldown branch
        metrics[3] = 0.0
        ours = ReduceLROnPlateau(1.0, factor=0.5, patience=patience,
                                 cooldown=cooldown, threshold=threshold)
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=1.0)
        theirs = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, factor=0.5, patience=patience, cooldown=cooldown,
            threshold=threshold)
        for i, m in enumerate(metrics):
            lr_ours = ours.step(m)
            theirs.step(m)
            lr_torch = opt.param_groups[0]["lr"]
            assert lr_ours == lr_torch, \
                f"case {case} step {i}: {lr_ours} != torch {lr_torch}"


def test_sgd_nesterov_requires_momentum():
    import pytest

    from waveformml_tpu.optim import build_optimizer

    with pytest.raises(ValueError, match="momentum"):
        build_optimizer("optim.SGD", 0.1, {"nesterov": True})
