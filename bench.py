#!/usr/bin/env python
"""Benchmark: sparse detector-grid PSD training throughput, TPU vs CPU torch.

Measures the flagship SPConvNet-style sparse PSD classifier's full training
step (forward + backward + update) in waveforms/sec on the available JAX
device, against the reference-stack-equivalent PyTorch model running the same
workload on CPU (the reference's implemented reality is single-device
CPU/GPU torch — SURVEY §2.11; BASELINE.md north star: ≥10× waveforms/sec/chip
over the CPU torch baseline).

Methodology: K jit train steps are dispatched back-to-back (each step's
output state feeds the next, so the work is fully chained) and timed with a
single host fetch of the final loss — async dispatch pipelines the tunnel
latency away while the fetch forces completion of all K steps.
``jax.block_until_ready`` alone does NOT synchronize through this
environment's TPU tunnel; only a host materialization does.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N_SAMPLES = 65          # waveform pair → 130 features (WaveformPairCal layout)
N_EVENTS = 4096         # events per training step (JAX side)
TORCH_EVENTS = 512      # torch-CPU baseline batch (throughput is size-stable)
AVG_MULT = 3            # pulses per event
N_TYPE = 2
SCAN_STEPS = 50
TORCH_STEPS = 8


def _synthetic_batch(rng, n_events, n_feat):
    from waveformml_tpu.detector import NX, NY

    rows = []
    for e in range(n_events):
        for s in rng.choice(NX * NY, size=AVG_MULT, replace=False):
            rows.append([s % NX, s // NX, e])
    coords = np.asarray(rows, dtype=np.int32)
    feats = rng.random((coords.shape[0], n_feat), dtype=np.float32)
    labels = rng.integers(0, N_TYPE, n_events).astype(np.int64)
    return coords, feats, labels


def bench_jax() -> float:
    """Waveforms/sec for the jit SPMD train step, K chained dispatches."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from waveformml_tpu.datasets.hdf5_dataset import FileBlock
    from waveformml_tpu.engineering.tasks import LitPSD
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.parallel.mesh import make_mesh

    cfg = _flagship(n_samples=N_SAMPLES)
    task = LitPSD(cfg)
    mesh = make_mesh(jax.devices()[:1])
    trainer = Trainer(cfg, task, mesh=mesh, seed=0)

    rng = np.random.default_rng(0)
    coords, feats, labels = _synthetic_batch(rng, N_EVENTS, 2 * N_SAMPLES)
    block = FileBlock(coords, feats, labels, {})
    trainer._ensure_state(block)
    db = {k: jnp.asarray(v) for k, v in trainer._device_batch(block).items()}
    step_rng = jax.random.PRNGKey(0)

    def one_step():
        out = trainer._train_step_fn(
            trainer.state.params, trainer.state.batch_stats,
            trainer.state.opt_state, step_rng, db)
        (trainer.state.params, trainer.state.batch_stats,
         trainer.state.opt_state) = out[0], out[1], out[2]
        return out[3]

    for _ in range(3):
        loss = one_step()
    float(loss)  # warmup + compile, synced
    t0 = time.perf_counter()
    for _ in range(SCAN_STEPS):
        loss = one_step()
    float(loss)  # host fetch forces completion of the whole chain
    dt = (time.perf_counter() - t0) / SCAN_STEPS
    return coords.shape[0] / dt


def bench_torch_cpu() -> float:
    """Equivalent-capacity torch CPU training step (the reference stack's
    compute pattern: scatter to dense + Conv2d stack + linear, CE loss,
    SGD+momentum), waveforms/sec."""
    import torch
    import torch.nn as nn

    from waveformml_tpu.detector import NX, NY
    torch.set_num_threads(os.cpu_count() or 8)
    n_feat = 2 * N_SAMPLES
    # mirror the flagship SubM stack (SubM on the dense grid == padded Conv2d)
    from waveformml_tpu.models.sparse_blocks import SparseConv2DForEZ

    specs = SparseConv2DForEZ.schedule(n_feat, out_planes=8, kernel_size=3,
                                       n_conv=2, n_point=1, conv_position=1,
                                       version=2)
    convs = []
    cfinal = n_feat
    for spec in specs:
        if spec[0] == "subm":
            _, cin, cout, k, pd, _key = spec
            convs.append(nn.Conv2d(cin, cout, k, 1, pd))
            cfinal = cout
        elif spec[0] == "bn":
            convs.append(nn.BatchNorm2d(spec[1]))
        elif spec[0] == "relu":
            convs.append(nn.ReLU())
    flat = NX * NY * cfinal
    model = nn.Sequential(*convs)
    head = nn.Sequential(nn.Flatten(), nn.Linear(flat, 18), nn.Linear(18, N_TYPE))
    params = list(model.parameters()) + list(head.parameters())
    opt = torch.optim.SGD(params, lr=0.01, momentum=0.9, nesterov=True)
    crit = nn.CrossEntropyLoss()

    rng = np.random.default_rng(0)
    # same per-waveform workload as the JAX side, smaller batch (CPU throughput
    # is batch-size-stable here; per-waveform rate is what we compare)
    coords, feats, labels = _synthetic_batch(rng, TORCH_EVENTS, n_feat)
    dense = np.zeros((TORCH_EVENTS, NX, NY, n_feat), dtype=np.float32)
    dense[coords[:, 2], coords[:, 0], coords[:, 1]] = feats
    x = torch.from_numpy(dense).permute(0, 3, 1, 2).contiguous()
    y = torch.from_numpy(labels)

    def one_step():
        opt.zero_grad()
        loss = crit(head(model(x)), y)
        loss.backward()
        opt.step()

    one_step()
    t0 = time.perf_counter()
    for _ in range(TORCH_STEPS):
        one_step()
    dt = (time.perf_counter() - t0) / TORCH_STEPS
    return coords.shape[0] / dt


def main() -> int:
    import jax

    backend = jax.default_backend()
    jax_wps = bench_jax()
    try:
        torch_wps = bench_torch_cpu()
    except Exception as e:  # baseline failure must not kill the bench
        print(f"torch baseline failed: {e}", file=sys.stderr)
        torch_wps = None
    vs = (jax_wps / torch_wps) if torch_wps else 0.0
    print(json.dumps({
        "metric": f"sparse PSD train throughput ({backend})",
        "value": round(jax_wps, 1),
        "unit": "waveforms/sec/chip",
        "vs_baseline": round(vs, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
