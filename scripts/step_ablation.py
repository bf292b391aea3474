#!/usr/bin/env python
"""Decompose the flagship sparse-PSD train step into timed components.

Times, inside ONE TPU client session (tunnel-phase fair): the full chained
train step, forward-only, forward+backward, and the optimizer update alone,
so the remaining per-step fixed cost (loss masks, SGD, BN stats) is
attributable. Complements docs/PERF_NOTES.md "Where the step goes".

Usage: python scripts/step_ablation.py [--events 4096] [--out_planes 8]
                                       [--n_conv 2] [--steps 30]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=4096)
    ap.add_argument("--out_planes", type=int, default=8)
    ap.add_argument("--n_conv", type=int, default=2)
    ap.add_argument("--half_precision", type=int, default=0)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    from waveformml_tpu.utils.util import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench import _chained_train_wps, _sparse_block, _sparse_cfg
    from waveformml_tpu.engineering.tasks import LitPSD

    cfg = _sparse_cfg(out_planes=args.out_planes, n_conv=args.n_conv,
                      half_precision=args.half_precision)
    task = LitPSD(cfg)
    block = _sparse_block(n_events=args.events)

    # full step, chained (same harness as the bench headline)
    wps, full_s, trainer = _chained_train_wps(cfg, task, block,
                                              n_warmup=3, n_steps=args.steps)

    db = {k: jnp.asarray(v) for k, v in trainer._device_batch(block).items()}
    db0 = jax.tree.map(lambda x: x[0], db)  # strip the device axis
    # the trainer's shard_map steps sync BN over the "data" axis; the
    # component closures below run unsharded
    from waveformml_tpu.nn.bn import set_bn_axis

    set_bn_axis(None)
    params = trainer.state.params
    bstats = trainer.state.batch_stats
    opt_state = trainer.state.opt_state
    rng = jax.random.PRNGKey(0)

    def loss_fn(p, bs, d, train):
        variables = {"params": p}
        if bs is not None:
            variables["batch_stats"] = bs
        outputs, new_stats = task.apply_model(variables, d, train=train,
                                              rngs={"dropout": rng})
        loss_sum, weight, metrics = task.loss_and_metrics(outputs, d)
        return loss_sum / jnp.maximum(weight, 1e-12), (new_stats, metrics)

    fwd_eval = jax.jit(lambda p, bs, d: loss_fn(p, bs, d, False)[0])
    fwd_train = jax.jit(lambda p, bs, d: loss_fn(p, bs, d, True))
    fwd_bwd = jax.jit(lambda p, bs, d: jax.value_and_grad(
        lambda q: loss_fn(q, bs, d, True)[0])(p))
    model_only = jax.jit(
        lambda p, bs, d: task.apply_model(
            {"params": p, **({"batch_stats": bs} if bs is not None else {})},
            d, train=False)[0])

    grads = jax.tree.map(jnp.zeros_like, params)

    def opt_only(p, g, o):
        import optax

        updates, new_o = trainer.optimizer.update(g, o, p)
        return optax.apply_updates(p, updates), new_o

    opt_jit = jax.jit(opt_only)

    def timeit(fn, *a):
        out = None
        for _ in range(3):
            out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # host sync
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / args.steps

    rows = {
        "full_step_ms": full_s * 1e3,
        "fwd_bwd_ms": timeit(fwd_bwd, params, bstats, db0) * 1e3,
        "fwd_train_ms": timeit(fwd_train, params, bstats, db0) * 1e3,
        "fwd_eval_ms": timeit(fwd_eval, params, bstats, db0) * 1e3,
        "model_only_ms": timeit(model_only, params, bstats, db0) * 1e3,
        "optimizer_ms": timeit(opt_jit, params, grads, opt_state) * 1e3,
        "wps": wps,
        "events": args.events,
        "out_planes": args.out_planes,
        "n_conv": args.n_conv,
    }

    # conv-stack vs head attribution INSIDE the forward (SubMPSDNet exposes
    # stack / head0 / linear submodules; setup-defined attrs only exist on
    # BOUND modules, so gate on the class, not hasattr)
    from waveformml_tpu.models.nets import SubMPSDNet

    model = task.model
    if isinstance(model, SubMPSDNet):
        inputs0 = task.model_inputs(db0)

        def vars_of(p, bs):
            return {"params": p, **({"batch_stats": bs}
                                    if bs is not None else {})}

        stack_fwd = jax.jit(lambda p, bs: model.apply(
            vars_of(p, bs), inputs0, False, True,
            method=lambda m, b, tr, rr: m.stack(b, train=tr, return_rows=rr)))
        rows_out = stack_fwd(params, bstats)

        def head_fn(m, r, b, tr):
            x = m.head0(r, b)
            return m.linear(x, train=tr) if m.linear is not None else x

        head_fwd = jax.jit(lambda p, bs, r: model.apply(
            vars_of(p, bs), r, inputs0, False, method=head_fn))

        def stack_scalar(p, bs):
            return jnp.sum(model.apply(
                vars_of(p, bs), inputs0, False, True,
                method=lambda m, b, tr, rr: m.stack(b, train=tr,
                                                    return_rows=rr))
                .astype(jnp.float32))

        def head_scalar(p, bs, r):
            return jnp.sum(model.apply(vars_of(p, bs), r, inputs0, False,
                                       method=head_fn).astype(jnp.float32))

        stack_fb = jax.jit(lambda p, bs: jax.value_and_grad(
            lambda q: stack_scalar(q, bs))(p))
        head_fb = jax.jit(lambda p, bs, r: jax.value_and_grad(
            lambda q: head_scalar(q, bs, r))(p))
        rows.update({
            "stack_fwd_ms": timeit(stack_fwd, params, bstats) * 1e3,
            "head_fwd_ms": timeit(head_fwd, params, bstats, rows_out) * 1e3,
            "stack_fwd_bwd_ms": timeit(stack_fb, params, bstats) * 1e3,
            "head_fwd_bwd_ms": timeit(head_fb, params, bstats, rows_out) * 1e3,
        })
    print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                      for k, v in rows.items()}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
