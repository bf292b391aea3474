#!/usr/bin/env python
"""Benchmark suite: the 5 BASELINE.md configs + a compute-heavy bf16 config,
TPU (JAX) vs the reference stack's CPU-torch compute pattern.

Configs (BASELINE.json `configs` 1-5):
  1. dense Conv1d PSD classifier        -> bench_dense_conv1d
  2. WFParams waveform-parameter regr.  -> bench_wfparams
  3. SparseConv2d detector-grid PSD     -> bench_sparse_psd (headline, printed LAST)
  4. Z WritePredictions streaming       -> bench_stream (end-to-end incl. HDF5 IO)
  5. HPO sweep (TPE + MedianPruner)     -> bench_hpo
  +  compute-heavy bf16 sparse PSD      -> bench_heavy (step time + MFU estimate,
                                           at width 64 and at the width-128
                                           throughput-accuracy frontier)
  +  graph-family SAGE classifier       -> bench_graph (GraphNet stack from
                                           config/examples/IoniClassifierGraph.json
                                           vs the hand-written torch SAGE mirror)

Each prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
The flagship sparse PSD config runs FIRST (so a stalled link later in the
suite can never lose the headline) and its line is RE-PRINTED as the very
last line at process exit — including on SIGTERM from an external watchdog —
because the driver parses the final line. All lines are also written to
bench_results.json.

Methodology (train configs): K jit train steps are dispatched back-to-back
(each step's output state feeds the next, so the work is fully chained) and
timed with a single host fetch of the final loss — async dispatch pipelines
the tunnel latency away while the fetch forces completion of all K steps.
``jax.block_until_ready`` alone does NOT synchronize through this
environment's TPU tunnel; only a host materialization does.

torch-CPU baseline batch sizing: per-waveform throughput of the torch models
is batch-size-stable — measured on the sparse config (2026-08-17, this host):
1309.0 wf/s at 512 events vs 1299.9 wf/s at 4096 events (0.7% difference), so
the smaller torch batch is used to bound baseline wall-clock without biasing
the ratio.

Select a subset with BENCH_ONLY=name1,name2 (names above without `bench_`).
"""
from __future__ import annotations

import json
import math
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

RESULTS = []


def _emit(metric, value, unit, vs_baseline, **extra):
    # ts + source make bench_results.json the single authoritative record:
    # every entry says when it was measured and by which invocation kind
    # (the driver's end-of-round run leaves BENCH_SOURCE unset; manual
    # runs should set BENCH_SOURCE=builder)
    entry = {"metric": metric, "value": round(float(value), 2), "unit": unit,
             "vs_baseline": round(float(vs_baseline), 2), **extra,
             "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
             "source": os.environ.get("BENCH_SOURCE", "driver")}
    RESULTS.append(entry)
    print(json.dumps(entry), flush=True)
    return entry


def _torch_dense_input(coords, feats, n_events, n_feat):
    """Scatter sparse (coords, feats) to the torch NCHW dense input — the
    single definition the torch baselines share (coords = [x, y, event])."""
    import torch

    from waveformml_tpu.detector import NX, NY

    dense = np.zeros((n_events, NX, NY, n_feat), dtype=np.float32)
    dense[coords[:, 2], coords[:, 0], coords[:, 1]] = feats
    return torch.from_numpy(dense).permute(0, 3, 1, 2).contiguous()


def _synthetic_batch(rng, n_events, n_feat):
    from waveformml_tpu.detector import NX, NY, seg_to_xy

    rows = []
    for e in range(n_events):
        for s in rng.choice(NX * NY, size=AVG_MULT, replace=False):
            x, y = seg_to_xy(int(s))
            rows.append([x, y, e])
    coords = np.asarray(rows, dtype=np.int32)
    feats = rng.random((coords.shape[0], n_feat), dtype=np.float32)
    labels = rng.integers(0, N_TYPE, n_events).astype(np.int64)
    return coords, feats, labels


def _chained_train_wps(cfg, task, block, n_warmup=3, n_steps=SCAN_STEPS,
                       count_rows=None):
    """Waveforms/sec of the jit train step, K chained dispatches; returns
    (wps, step_seconds, trainer)."""
    import jax
    import jax.numpy as jnp

    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.parallel.mesh import make_mesh

    trainer = Trainer(cfg, task, mesh=make_mesh(jax.devices()[:1]), seed=0)
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

    for _ in range(n_warmup):
        loss = one_step()
    float(loss)  # warmup + compile, synced
    t0 = time.perf_counter()
    for _ in range(n_steps):
        loss = one_step()
    float(loss)  # host fetch forces completion of the whole chain
    dt = (time.perf_counter() - t0) / n_steps
    rows = count_rows if count_rows is not None else block.coords.shape[0]
    return rows / dt, dt, trainer


def _torch_train_wps(model_fn, x, y, crit, n_rows, steps=TORCH_STEPS, lr=0.01):
    """Waveforms/sec for a torch CPU training loop over a fixed batch."""
    import torch

    torch.set_num_threads(os.cpu_count() or 8)
    model = model_fn()
    opt = torch.optim.SGD(model.parameters(), lr=lr, momentum=0.9)

    def one_step():
        opt.zero_grad()
        loss = crit(model(x), y)
        loss.backward()
        opt.step()

    one_step()
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = (time.perf_counter() - t0) / steps
    return n_rows / dt


# ---------------------------------------------------------------------------------
# config 3 (headline): sparse detector-grid PSD
# ---------------------------------------------------------------------------------

def _sparse_cfg(out_planes=8, n_conv=2, half_precision=0):
    from __graft_entry__ import _flagship

    cfg = _flagship(n_samples=N_SAMPLES)
    hp = cfg.net_config.hparams
    hp.out_planes = out_planes
    hp.conv_params.n_conv = n_conv
    cfg.system_config.half_precision = half_precision
    return cfg


def _sparse_block(n_events=N_EVENTS):
    from waveformml_tpu.datasets.hdf5_dataset import FileBlock

    rng = np.random.default_rng(0)
    coords, feats, labels = _synthetic_batch(rng, n_events, 2 * N_SAMPLES)
    return FileBlock(coords, feats, labels, {})


def bench_sparse_jax() -> float:
    from waveformml_tpu.engineering.tasks import LitPSD

    cfg = _sparse_cfg()
    block = _sparse_block()
    wps, _, _ = _chained_train_wps(cfg, LitPSD(cfg), block)
    return wps


def bench_infer(backend):
    """Batched inference (the BASELINE north star's second half): eval-mode
    forward of the flagship sparse PSD model, 50 queued dispatches, one
    fetch (in-order device execution makes the last fetch a barrier)."""
    import jax
    import jax.numpy as jnp
    import torch

    from waveformml_tpu.engineering.tasks import LitPSD
    from waveformml_tpu.ops.sparse import SparseBatch, pad_sparse

    cfg = _sparse_cfg()
    task = LitPSD(cfg)
    rng = np.random.default_rng(0)
    coords, feats, _labels = _synthetic_batch(rng, N_EVENTS, 2 * N_SAMPLES)
    row_bucket = 1 << (coords.shape[0] - 1).bit_length()
    c, f, m = pad_sparse(coords, feats, row_bucket)
    batch = SparseBatch(jnp.asarray(c), jnp.asarray(f), jnp.asarray(m), N_EVENTS)
    # host-prefetched plans (neighbor + site layout), the canonical serving
    # prep (InferenceModel probes + ships the same plans on its host-prep
    # path): init_variables records the model's plan requirements — and is
    # the single init (its variables are reused for the forward)
    from waveformml_tpu.datasets.hdf5_dataset import FileBlock

    variables = task.init_variables(jax.random.PRNGKey(0), {
        "coords": c, "feats": f, "mask": m,
        "labels": np.zeros(N_EVENTS, np.int64),
        "label_mask": np.ones(N_EVENTS, bool)})
    db = task.prepare_block(
        FileBlock(coords, feats, np.zeros(N_EVENTS, np.int64), {}),
        row_bucket, N_EVENTS)
    plans = {k[len("plan_"):]: jnp.asarray(v) for k, v in db.items()
             if k.startswith("plan_")}

    @jax.jit
    def fwd(feats_dev):
        b = SparseBatch(batch.coords, feats_dev, batch.mask, N_EVENTS,
                        plans=plans or None)
        return task.model.apply(variables, b)

    fdev = jnp.asarray(f)
    out = fwd(fdev)
    np.asarray(out)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(SCAN_STEPS):
        out = fwd(fdev)
    np.asarray(out)
    jax_wps = coords.shape[0] / ((time.perf_counter() - t0) / SCAN_STEPS)

    def torch_side():
        import torch.nn as nn

        from waveformml_tpu.detector import NX, NY

        n_feat = 2 * N_SAMPLES
        trng = np.random.default_rng(1)
        tc, tf, _ = _synthetic_batch(trng, TORCH_EVENTS, n_feat)
        x = _torch_dense_input(tc, tf, TORCH_EVENTS, n_feat)
        model, _ = _torch_sparse_model(n_feat)
        model.eval()
        with torch.no_grad():
            model(x)
            t0 = time.perf_counter()
            for _ in range(TORCH_STEPS):
                model(x)
        return tc.shape[0] / ((time.perf_counter() - t0) / TORCH_STEPS)

    torch_wps = _cached_baseline("infer_sparse", torch_side)
    _emit(f"sparse PSD batched inference throughput ({backend})", jax_wps,
          "waveforms/sec/chip", jax_wps / torch_wps if torch_wps else 0.0)


def _torch_sparse_model(n_feat, out_planes=8, n_conv=2):
    """Reference compute pattern: scatter to dense + Conv2d stack + linear
    (SubM on the dense grid == padded Conv2d), from the SAME schedule."""
    import torch.nn as nn

    from waveformml_tpu.detector import NX, NY
    from waveformml_tpu.models.sparse_blocks import SparseConv2DForEZ

    specs = SparseConv2DForEZ.schedule(n_feat, out_planes=out_planes,
                                       kernel_size=3, n_conv=n_conv, n_point=1,
                                       conv_position=1, version=2)
    convs, cfinal = [], n_feat
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
    return nn.Sequential(*convs, nn.Flatten(), nn.Linear(flat, 18),
                         nn.Linear(18, N_TYPE)), cfinal


def bench_sparse_torch(out_planes=8, n_conv=2, steps=TORCH_STEPS) -> float:
    import torch
    import torch.nn as nn

    from waveformml_tpu.detector import NX, NY

    n_feat = 2 * N_SAMPLES
    rng = np.random.default_rng(0)
    coords, feats, labels = _synthetic_batch(rng, TORCH_EVENTS, n_feat)
    x = _torch_dense_input(coords, feats, TORCH_EVENTS, n_feat)
    y = torch.from_numpy(labels)
    return _torch_train_wps(
        lambda: _torch_sparse_model(n_feat, out_planes, n_conv)[0],
        x, y, nn.CrossEntropyLoss(), coords.shape[0], steps=steps)


def bench_sparse_psd(backend):
    jax_wps = bench_sparse_jax()
    torch_wps = _cached_baseline("sparse_psd_train", bench_sparse_torch)
    _emit(f"sparse PSD train throughput ({backend})", jax_wps,
          "waveforms/sec/chip", jax_wps / torch_wps if torch_wps else 0.0)


# ---------------------------------------------------------------------------------
# config 1: dense Conv1d PSD classifier
# ---------------------------------------------------------------------------------

CNN_PARAMS = {"num_channels": 1, "out_size": 8, "num_expand": 2,
              "num_contract": 2, "expand_factor": 4, "size_factor": 7,
              "stride_factor": 2}


def _dense_cfg():
    from waveformml_tpu.config import Config

    n_samples = 2 * N_SAMPLES
    return Config({
        "run_config": {"exp_name": "bench", "run_class": "LitWaveform", "imports": []},
        "system_config": {"model_name": "bench", "n_samples": n_samples,
                          "n_type": N_TYPE, "type_names": ["a", "b"],
                          "model_base_path": "/tmp/bench_model",
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "CrossEntropyLoss", "criterion_params": [],
                       "imports": [], "net_class": "WaveformModels.ConvWaveformNet",
                       "net_type": "CNN",
                       "hparams": {"cnn_params": dict(CNN_PARAMS),
                                   "n_lin": 2, "out_size": N_TYPE}},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {"momentum": 0.9}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDatasetWaveformNorm",
                           "dataset_params": {}, "n_train": 1, "n_validate": 1},
    })


def _waveform_block(n_rows, n_feat, labels):
    from waveformml_tpu.datasets.hdf5_dataset import FileBlock

    rng = np.random.default_rng(1)
    coords = rng.integers(0, 308, (n_rows, 1)).astype(np.int32)
    feats = rng.random((n_rows, n_feat), dtype=np.float32)
    return FileBlock(coords, feats, labels, {})


DENSE_EVENTS = 256   # row bucket 1024: remote compile time of the conv1d train
                     # step grows steeply with batch rows on this host's TPU
                     # tunnel (16384 rows: >8 min; 1024 rows: ~2 min total) and
                     # per-waveform throughput is dispatch-saturated already


def bench_dense_conv1d(backend):
    import torch
    import torch.nn as nn

    from waveformml_tpu.engineering.tasks import LitWaveform
    from waveformml_tpu.models.blocks import Conv1DNet

    n_feat = 2 * N_SAMPLES
    rng = np.random.default_rng(2)
    n_rows = AVG_MULT * DENSE_EVENTS
    labels = rng.integers(0, N_TYPE, n_rows).astype(np.int64)
    cfg = _dense_cfg()
    block = _waveform_block(n_rows, n_feat, labels)
    jax_wps, _, _ = _chained_train_wps(cfg, LitWaveform(cfg), block)

    # torch mirror from the SAME Conv1DNet schedule + ConvWaveformNet head
    layers, out_len = Conv1DNet.schedule(n_feat, **CNN_PARAMS)

    def make_model():
        mods = []
        for cin, cout, fs, st, pd in layers:
            mods += [nn.Conv1d(cin, cout, fs, st, pd), nn.ReLU()]
        out = out_len * layers[-1][1]
        n_lin = 2
        planes = [int(math.floor(out - i * ((out - N_TYPE) / n_lin)))
                  for i in range(n_lin + 1)]
        lin = []
        for i in range(n_lin):
            lin += [nn.Linear(planes[i], planes[i + 1]), nn.ReLU()]
        return nn.Sequential(*mods, nn.Flatten(), *lin[:-1])

    n_torch = AVG_MULT * TORCH_EVENTS
    trng = np.random.default_rng(3)
    x = torch.from_numpy(
        trng.random((n_torch, n_feat)).astype(np.float32))[:, None, :]
    y = torch.from_numpy(trng.integers(0, N_TYPE, n_torch))
    torch_wps = _cached_baseline("dense_conv1d_train", lambda: _torch_train_wps(
        make_model, x, y, nn.CrossEntropyLoss(), n_torch))
    _emit(f"dense Conv1d PSD train throughput ({backend})", jax_wps,
          "waveforms/sec/chip", jax_wps / torch_wps if torch_wps else 0.0)


# ---------------------------------------------------------------------------------
# config 2: WFParams waveform-parameter regression
# ---------------------------------------------------------------------------------

N_WFPARAMS = 5  # t0, rise, peak amplitude, tail fraction, width


def bench_wfparams(backend):
    import torch
    import torch.nn as nn

    from waveformml_tpu.config import Config
    from waveformml_tpu.engineering.tasks import LitWaveform

    n_feat = 2 * N_SAMPLES
    hp = {"n_expand": 1, "expansion_factor": 2, "n_contract": 2,
          "out_size": N_WFPARAMS}
    cfg = Config({
        "run_config": {"exp_name": "bench", "run_class": "LitWaveform", "imports": []},
        "system_config": {"model_name": "bench", "n_samples": n_feat,
                          "n_type": N_TYPE, "type_names": ["a"],
                          "model_base_path": "/tmp/bench_model",
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "L1Loss", "criterion_params": [],
                       "imports": [], "net_class": "WaveformModels.LinearWaveformNet",
                       "net_type": "MLP", "hparams": dict(hp)},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {"momentum": 0.9}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDatasetWFPairNorm",
                           "dataset_params": {}, "n_train": 1, "n_validate": 1},
    })
    rng = np.random.default_rng(4)
    n_rows = AVG_MULT * N_EVENTS
    labels = rng.random((n_rows, N_WFPARAMS), dtype=np.float32)
    block = _waveform_block(n_rows, n_feat, labels)
    jax_wps, _, _ = _chained_train_wps(cfg, LitWaveform(cfg), block)

    # torch mirror with the same LinearWaveformNet plane formula
    planes = [n_feat]
    expand = float((planes[0] * hp["expansion_factor"] - planes[0]) / hp["n_expand"])
    planes += [int(round(planes[0] + expand * (i + 1))) for i in range(hp["n_expand"])]
    contract = float((planes[-1] - N_WFPARAMS) / hp["n_contract"])
    start_n = planes[-1]
    planes += [int(round(start_n - contract * (i + 1)))
               for i in range(hp["n_contract"])]
    planes[-1] = N_WFPARAMS

    def make_model():
        mods = []
        for i in range(len(planes) - 1):
            mods.append(nn.Linear(planes[i], planes[i + 1]))
            if i < len(planes) - 2:
                mods.append(nn.ReLU())
        return nn.Sequential(*mods)

    n_torch = AVG_MULT * TORCH_EVENTS
    x = torch.from_numpy(
        np.random.default_rng(5).random((n_torch, n_feat)).astype(np.float32))
    y = torch.from_numpy(labels[:n_torch])
    torch_wps = _cached_baseline("wfparams_train", lambda: _torch_train_wps(
        make_model, x, y, nn.L1Loss(), n_torch))
    _emit(f"WFParams regression train throughput ({backend})", jax_wps,
          "waveforms/sec/chip", jax_wps / torch_wps if torch_wps else 0.0)


# ---------------------------------------------------------------------------------
# config 4: Z WritePredictions streaming pipeline (end-to-end incl. HDF5 IO)
# ---------------------------------------------------------------------------------

STREAM_EVENTS = 10000
# the reference default read size is 2048 rows (PredictionWriter.py:39) —
# sized for a local GPU. Through a high-latency device link the tradeoff is
# measured (2026-08-20, docs/PERF_NOTES.md): big reads amortize per-dispatch
# RPC overhead but expose a whole chunk's latency as pipeline drain after
# the last launch (8192 → drain 0.27 s on a 4-chunk file); 4096 halves the
# drain with no measurable launch-overhead cost. pipeline_depth 8 keeps the
# launch stream ahead of the fetch thread's round-trips.
STREAM_READ = int(os.environ.get("WFML_BENCH_STREAM_READ", 4096))
STREAM_GZIP_IN = 4   # the analysis chain's inputs are gzip-chunked tables
                     # (HDF5IO.py:88-91) — charge both sides the real decode


def _z_setup(tmp):
    """Trained-enough LitZ checkpoint + config + synthetic input file."""
    import jax

    from waveformml_tpu.config import Config, save_config
    from waveformml_tpu.datasets.hdf5_dataset import FileBlock
    from waveformml_tpu.datasets.synthetic import write_wfpair_cal
    from waveformml_tpu.engineering.tasks import LitZ
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.parallel.mesh import make_mesh

    cfg = Config({
        "run_config": {"exp_name": "z", "run_class": "LitZ", "imports": []},
        "system_config": {"model_name": "z", "n_samples": N_SAMPLES, "n_type": 2,
                          "type_names": ["a"], "model_base_path": os.path.join(tmp, "model"),
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "L1Loss", "criterion_params": [],
                       "imports": [], "net_type": "2DConvolution",
                       "algorithm": "conv",
                       "hparams": {"conv": {"kernel_size": 3, "n_layers": 2},
                                   "point": {"pointwise_layers": 1}}},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDatasetWFPair",
                           "dataset_params": {}, "n_train": 8, "n_validate": 4},
    })
    config_path = os.path.join(tmp, "config.json")
    save_config(cfg, config_path)
    task = LitZ(cfg)
    trainer = Trainer(cfg, task, mesh=make_mesh(__import__("jax").devices()[:1]),
                      seed=0)
    rng = np.random.default_rng(0)
    coords = np.array([[1, 1, 0], [2, 2, 1]], dtype=np.int32)
    feats = rng.random((2, 2 * N_SAMPLES)).astype(np.float32)
    block = FileBlock(coords, feats, rng.random(2).astype(np.float32), {})
    trainer._ensure_state(block)
    ckpt = os.path.join(tmp, "model.ckpt")
    trainer.save_checkpoint(ckpt)
    input_path = os.path.join(tmp, "input_WFCalFilteredSE.h5")
    write_wfpair_cal(input_path, n_events=STREAM_EVENTS, seed=4,
                     compression=STREAM_GZIP_IN)
    from waveformml_tpu.io.sql import write_synthetic_caldb

    caldb = os.path.join(tmp, "cal.db")
    write_synthetic_caldb(caldb, "benchcal", seed=2)
    os.environ["PROSPECT_CALDB"] = caldb
    return config_path, ckpt, input_path


def bench_stream(backend):
    import tempfile

    from waveformml_tpu.inference.prediction_writer import ZPredictionWriter

    with tempfile.TemporaryDirectory() as tmp:
        config_path, ckpt, input_path = _z_setup(tmp)
        out_path = os.path.join(tmp, "out_ModelOut.h5")
        pw = ZPredictionWriter(out_path, input_path, config_path, ckpt,
                               calgroup="benchcal", n_rows_per_read=STREAM_READ,
                               datatype="WaveformPairCal")
        # warmup pass (compile) on a copy, then the timed pass
        pw.write_predictions()
        os.remove(out_path)
        pw2 = ZPredictionWriter(out_path, input_path, config_path, ckpt,
                                calgroup="benchcal", n_rows_per_read=STREAM_READ,
                                datatype="WaveformPairCal")
        t0 = time.perf_counter()
        pw2.write_predictions()
        e2e_s = time.perf_counter() - t0
        jax_wps = STREAM_EVENTS / e2e_s
        pipe = {k: round(v, 3) for k, v in
                getattr(pw2, "stage_seconds", {}).items()}
        pipe.update({k: round(v, 3) for k, v in
                     getattr(getattr(pw2, "model", None), "dispatch_phases",
                             {}).items()})

        bd = _safe(lambda: _stream_breakdown(input_path, tmp, config_path, ckpt))
        # torch at BOTH output-gzip levels: 9 is what the reference hardcodes
        # (HDF5IO.py:88-91); 4 matches this repo's output policy so the
        # matched-level ratio isolates pipeline speed from compression policy
        # STREAM_READ changes the torch workload too (it chunks its reads
        # the same way): a non-default read size gets its own cache key so
        # an experiment never reuses the default-8192 baseline number. The
        # default keeps the legacy key so the committed cache stays warm.
        sfx = "" if STREAM_READ == 8192 else f"_r{STREAM_READ}"
        torch_wps4 = _cached_baseline(f"stream_gz4{sfx}", lambda: _torch_stream(input_path, tmp, gzip_level=4))
        torch_wps9 = _cached_baseline(f"stream_gz9{sfx}", lambda: _torch_stream(input_path, tmp, gzip_level=9))

    # host->device link bandwidth: the stream's structural floor is shipping
    # the waveform bytes across this link; record it so the ratio is
    # interpretable (through this host's remote TPU tunnel the link runs at
    # single-digit MB/s — on a local PCIe/ICI host the same pipeline is
    # HDF5-decode-bound instead)
    def link_probe():
        import jax
        import jax.numpy as jnp

        buf = np.zeros((4 * 1024 * 1024,), np.uint8)
        x = jnp.asarray(buf)
        float(x[0])  # warm
        t = time.perf_counter()
        for _ in range(2):
            x = jnp.asarray(buf)
            float(x[0])
        return 8.0 / (time.perf_counter() - t)

    h2d = _safe(link_probe)
    extra = {"pipeline_s": pipe}
    if bd:
        host_s = bd["decode_s"] + bd["prep_s"] + bd["write_s"]
        # throughput of the host stages alone: what the same pipeline delivers
        # when the device link is local (PCIe h2d of int16 waveforms ~0.1 ms
        # per chunk and the forward overlaps via pipeline_depth)
        link_excluded = STREAM_EVENTS / host_s
        stages = {k: bd[k] for k in
                  ("decode_s", "prep_s", "device_link_s", "write_s")}
        max_stage = max(stages.values())
        extra = {
            "link_excluded_wps": round(link_excluded, 1),
            "vs_baseline_link_excluded": round(
                link_excluded / torch_wps4, 2) if torch_wps4 else None,
            "breakdown_s": {k: round(v, 3) for k, v in stages.items()},
            # pipeline quality: 1.0 = end-to-end equals the slowest stage
            # (perfect overlap of decode/dispatch/fetch/write)
            "end_to_end_s": round(e2e_s, 3),
            "max_stage_s": round(max_stage, 3),
            "pipeline_efficiency": round(max_stage / e2e_s, 3),
            # same-phase overlap quality: the link work serialized on the
            # main thread DURING the timed pass (dispatch_s carries the
            # transfers) over end-to-end. The breakdown-based number above
            # compares across tunnel phases (the link moves ±40% run to
            # run, so it can land anywhere incl. >1); this one cannot.
            "pipeline_efficiency_in_run": round(
                pipe.get("dispatch_s", 0.0) / e2e_s, 3) if pipe else None,
            "pipeline_s": pipe,
        }
    _emit(f"Z WritePredictions streaming throughput ({backend})", jax_wps,
          "waveforms/sec end-to-end",
          jax_wps / torch_wps4 if torch_wps4 else 0.0,
          vs_baseline_gzip9=round(jax_wps / torch_wps9, 2) if torch_wps9 else None,
          h2d_MBps=round(h2d, 2) if h2d else None, **extra)


def _stream_breakdown(input_path, tmp, config_path, ckpt):
    """Measured per-stage wall time over the full file: HDF5 gzip decode /
    host prep / device dispatch+fetch (includes the link on this host) /
    gzip-4 output write. Stages run unpipelined here so each is isolated."""
    from waveformml_tpu.evaluation.ad1 import Z_NORMALIZATION_FACTOR
    from waveformml_tpu.inference.prediction_writer import ZPredictionWriter
    from waveformml_tpu.io.compound_types import extension_type_map
    from waveformml_tpu.io.hdf5 import H5Input, H5Output
    from waveformml_tpu.ops.sparse import consecutive_event_index

    t = extension_type_map(input_path)
    inp = H5Input(input_path)
    inp.setup_table(t.name, t.type, t.event_index_name,
                    event_index_coord=t.event_index_coord)
    t0 = time.perf_counter()
    chunks = list(inp.iter_chunks(STREAM_READ, preserve_event="truncate"))
    t_decode = time.perf_counter() - t0
    inp.close()
    n_rows = sum(c.shape[0] for c in chunks)

    t0 = time.perf_counter()
    preps = []
    for c in chunks:
        coords = c["coord"].copy()
        coords[:, -1] = consecutive_event_index(coords[:, -1])
        preps.append(coords)
    t_prep = time.perf_counter() - t0

    pw = ZPredictionWriter(os.path.join(tmp, "bd_ignored.h5"), input_path,
                           config_path, ckpt, calgroup="benchcal",
                           n_rows_per_read=STREAM_READ,
                           datatype="WaveformPairCal")
    pw.model.fetch(pw.model.dispatch(preps[0], chunks[0]["waveform"]))  # warm
    t0 = time.perf_counter()
    outs = [np.asarray(pw.model.fetch(pw.model.dispatch(coords, c["waveform"])))
            for coords, c in zip(preps, chunks)]
    t_device = time.perf_counter() - t0
    pw.input.close()
    pw.close()

    t0 = time.perf_counter()
    out = H5Output(os.path.join(tmp, "bd_out.h5"))
    out.create_table(t.name, (n_rows,), t.type, compression_opts=4)
    for c, z in zip(chunks, outs):
        c["EZ"][:, 1] = (z - 0.5) * Z_NORMALIZATION_FACTOR
        out.add_rows(t.name, c)
    out.close()
    t_write = time.perf_counter() - t0
    return {"rows": n_rows, "decode_s": t_decode, "prep_s": t_prep,
            "device_link_s": t_device, "write_s": t_write}


def _torch_stream(input_path, tmp, gzip_level=9):
    """Reference hot loop (PredictionWriter.py:73-104): chunked HDF5 read →
    scatter to dense grid → torch conv model → swap predictions → write.
    gzip_level 9 is what the reference hardcodes (HDF5IO.py:88-91); 4 gives
    the matched-compression comparison."""
    import h5py
    import torch
    import torch.nn as nn

    from waveformml_tpu.detector import NX, NY

    torch.set_num_threads(os.cpu_count() or 8)
    n_feat = 2 * N_SAMPLES
    model = nn.Sequential(
        nn.Conv2d(n_feat, 16, 3, 1, 1), nn.ReLU(),
        nn.Conv2d(16, 16, 3, 1, 1), nn.ReLU(), nn.Conv2d(16, 1, 1))
    model.eval()
    out_path = os.path.join(tmp, f"torch_gz{gzip_level}_ModelOut.h5")
    t0 = time.perf_counter()
    n_done = 0
    with h5py.File(input_path) as h5in, h5py.File(out_path, "w") as h5out:
        din = h5in["WaveformPairCal"]
        dout = h5out.create_dataset("WaveformPairCal", shape=din.shape,
                                    dtype=din.dtype, chunks=(1024,),
                                    compression="gzip",
                                    compression_opts=gzip_level)
        n = din.shape[0]
        with torch.no_grad():
            for lo in range(0, n, STREAM_READ):
                rec = din[lo:lo + STREAM_READ]
                wf = rec["waveform"].astype(np.float32)
                coord = rec["coord"]
                b = wf.shape[0]
                dense = np.zeros((b, NX, NY, n_feat), dtype=np.float32)
                dense[np.arange(b), coord[:, 0], coord[:, 1]] = wf
                x = torch.from_numpy(dense).permute(0, 3, 1, 2).contiguous()
                z = model(x).reshape(b, -1).amax(1).numpy()
                rec["EZ"][:, 1] = z
                dout[lo:lo + b] = rec
                n_done += b
    # events/sec (not rows/sec), matching the JAX side's STREAM_EVENTS basis
    return STREAM_EVENTS / (time.perf_counter() - t0)


# ---------------------------------------------------------------------------------
# graph model family: GraphNet SAGE train throughput
# (the shipped config/examples/IoniClassifierGraph.json stack at bench scale —
#  ref: src/models/GraphNet.py:222-315 builds the same stack with PyG SAGEConv)
# ---------------------------------------------------------------------------------

GRAPH_K = 4        # IoniClassifierGraph.json hparams.k
GRAPH_OUT = 16     # hparams.graph_out
GRAPH_LAYERS = 2   # hparams.n_graph


def _graph_bench_cfg():
    from waveformml_tpu.config import Config

    return Config({
        "run_config": {"exp_name": "bench", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "bench", "n_samples": N_SAMPLES,
                          "n_type": N_TYPE, "type_names": ["Ioni", "Recoil"],
                          "model_base_path": "/tmp/bench_model",
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "CrossEntropyLoss", "criterion_params": [],
                       "imports": [], "net_class": "GraphNet.GraphNet",
                       "net_type": "Graph",
                       "hparams": {"k": GRAPH_K, "n_graph": GRAPH_LAYERS,
                                   "n_lin": 2, "graph_out": GRAPH_OUT,
                                   "graph_class_index": 1}},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {"momentum": 0.9}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDataset2D",
                           "dataset_params": {}, "n_train": 1, "n_validate": 1,
                           "data_module": "GraphDataModule"},
    })


def _torch_graph_train() -> float:
    """MEASURED torch-CPU graph baseline: the hand-written SAGEConv mirror
    from tests/test_parity_graph_torch.py made trainable — per layer
    x' = W_l mean_{j∈N(i)} x_j + b + W_r x_i, BatchNorm1d, ReLU; masked
    global max pool; LinearBlock head; CrossEntropyLoss + SGD. Both sides
    consume HOST-precomputed kNN edges (generous to torch: the reference
    rebuilds knn_graph inside every forward, GraphNet.py:222-243)."""
    import torch
    import torch.nn as nn

    from waveformml_tpu.models.graph_net import _graph_planes
    from waveformml_tpu.ops.graph import knn_graph

    torch.set_num_threads(os.cpu_count() or 8)
    n_feat = 2 * N_SAMPLES
    rng = np.random.default_rng(6)
    coords, feats, labels = _synthetic_batch(rng, TORCH_EVENTS, n_feat)
    edges = knn_graph(coords[:, :2].astype(np.float64), GRAPH_K,
                      coords[:, 2].astype(np.int64))
    src = torch.from_numpy(edges[0])
    dst = torch.from_numpy(edges[1])
    n_rows = coords.shape[0]
    deg = torch.zeros(n_rows, 1).index_add_(
        0, dst, torch.ones(edges.shape[1], 1)).clamp(min=1)
    ev = torch.from_numpy(coords[:, 2].astype(np.int64))
    x0 = torch.from_numpy(feats)
    y = torch.from_numpy(labels)
    planes = _graph_planes(n_feat, GRAPH_LAYERS, 0, 1.0, GRAPH_OUT, "linear")
    hfac = (float(N_TYPE) / GRAPH_OUT) ** 0.5  # LinearBlock geometric schedule
    head_planes = [GRAPH_OUT,
                   int(round(GRAPH_OUT * hfac)),
                   int(round(GRAPH_OUT * hfac ** 2))]

    class TorchSAGENet(nn.Module):
        def __init__(self):
            super().__init__()
            self.lin_l = nn.ModuleList(
                [nn.Linear(planes[i], planes[i + 1])
                 for i in range(GRAPH_LAYERS)])
            self.lin_r = nn.ModuleList(
                [nn.Linear(planes[i], planes[i + 1], bias=False)
                 for i in range(GRAPH_LAYERS)])
            self.bns = nn.ModuleList(
                [nn.BatchNorm1d(planes[i + 1]) for i in range(GRAPH_LAYERS)])
            self.head = nn.ModuleList(
                [nn.Linear(head_planes[i], head_planes[i + 1])
                 for i in range(2)])

        def forward(self, x):
            for i in range(GRAPH_LAYERS):
                s = torch.zeros(n_rows, x.shape[1]).index_add_(0, dst, x[src])
                x = self.lin_l[i](s / deg) + self.lin_r[i](x)
                x = torch.relu(self.bns[i](x))
            pooled = torch.zeros(TORCH_EVENTS, x.shape[1]).scatter_reduce(
                0, ev[:, None].expand(-1, x.shape[1]), x, "amax",
                include_self=False)
            for lin in self.head:  # LinearBlock: no inter-layer activation
                pooled = lin(pooled)
            return pooled

    return _torch_train_wps(TorchSAGENet, x0, y, nn.CrossEntropyLoss(), n_rows)


def bench_graph(backend):
    """Graph-family train throughput (ref model: GraphNet.py:222-315). The
    jit step consumes host-prebuilt padded kNN edge tables (built per batch
    on the loader's prefetch thread in production); device side is pure
    segment-op message passing."""
    from waveformml_tpu.engineering.tasks import LitPSD

    cfg = _graph_bench_cfg()
    block = _sparse_block()
    jax_wps, step_s, _ = _chained_train_wps(cfg, LitPSD(cfg), block)
    torch_wps = _cached_baseline("graph_train", _torch_graph_train)
    _emit(f"graph train throughput ({backend})", jax_wps,
          "waveforms/sec/chip", jax_wps / torch_wps if torch_wps else 0.0,
          step_ms=round(step_s * 1e3, 3), conv="SAGE", k=GRAPH_K,
          n_graph=GRAPH_LAYERS)


# ---------------------------------------------------------------------------------
# config 5: HPO sweep (native TPE + MedianPruner over the sparse PSD model)
# ---------------------------------------------------------------------------------

HPO_TRIALS = 2        # each trial recompiles (lr is a folded constant), and
                      # remote compile on this host's TPU tunnel can take minutes
HPO_STEPS = 150       # steps per trial (JAX runs them; torch runs a real
                      # mini-study whose steady-state step time scales the rest)
HPO_TORCH_PROBE = 4   # measured torch steps per trial in the real mini-study


def bench_hpo(backend):
    import jax
    import jax.numpy as jnp

    from waveformml_tpu.engineering.tasks import LitPSD
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.optimization.hpo import create_study
    from waveformml_tpu.parallel.mesh import make_mesh

    block = _sparse_block()

    K = 10  # steps chained per dispatch: per-dispatch RPC latency through the
            # TPU tunnel varies wildly; 15 dispatches/trial instead of 150

    # per-trial phase attribution (VERDICT r4: 56 s vs 90 s driver runs were
    # unattributable): setup = Trainer build + param init, compile = the
    # first _multi_step_fn call (jit trace + remote XLA compile run
    # synchronously at call time; only execution is async), steps = the rest
    trial_timings = []

    def objective(trial):
        t_setup = time.perf_counter()
        lr = trial.suggest_float("lr", 1e-4, 1e-1, log=True)
        cfg = _sparse_cfg()
        cfg.optimize_config.lr = lr
        task = LitPSD(cfg)
        trainer = Trainer(cfg, task, mesh=make_mesh(jax.devices()[:1]), seed=0,
                          steps_per_dispatch=K)
        trainer._ensure_state(block)
        db1 = trainer._device_batch(block)
        dbs = {k: jnp.asarray(np.stack([v] * K)) for k, v in db1.items()}
        rng = jax.random.PRNGKey(0)
        loss = None
        timing = {"setup_s": time.perf_counter() - t_setup,
                  "compile_s": 0.0, "steps_s": 0.0}
        trial_timings.append(timing)
        for i in range(HPO_STEPS // K):
            t0 = time.perf_counter()
            out = trainer._multi_step_fn(
                trainer.state.params, trainer.state.batch_stats,
                trainer.state.opt_state, jax.random.fold_in(rng, i), dbs)
            timing["compile_s" if i == 0 else "steps_s"] += \
                time.perf_counter() - t0
            (trainer.state.params, trainer.state.batch_stats,
             trainer.state.opt_state) = out[0], out[1], out[2]
            loss = out[3][-1]
            step = (i + 1) * K - 1
            if step % 50 == 49:
                t0 = time.perf_counter()
                trial.report(float(loss), step)
                timing["steps_s"] += time.perf_counter() - t0
                if trial.should_prune():
                    from waveformml_tpu.optimization.hpo import TrialPruned
                    raise TrialPruned()
        return float(loss)

    from waveformml_tpu.optimization.hpo import MedianPruner, TPESampler

    study = create_study("bench_sweep", sampler=TPESampler(seed=0),
                         pruner=MedianPruner(n_warmup_steps=10, interval_steps=3))
    t0 = time.perf_counter()
    study.optimize(objective, n_trials=HPO_TRIALS)
    jax_s = time.perf_counter() - t0

    torch_s = _cached_baseline("hpo_measured", _torch_hpo_measured)
    _emit(f"HPO sweep wall-clock, {HPO_TRIALS} trials x {HPO_STEPS} steps ({backend})",
          jax_s, "seconds (lower is better)",
          torch_s / jax_s if torch_s else 0.0,
          torch_measured_s=round(torch_s, 1) if torch_s else None,
          trial_s=[{k: round(v, 2) for k, v in t.items()}
                   for t in trial_timings])


def _torch_hpo_measured() -> float:
    """MEASURED torch sweep wall-clock: run a real mini-study — fresh model +
    optimizer per trial at a sampled lr, training on the SAME batch size the
    JAX sweep uses (N_EVENTS events) — then scale the per-trial step count
    arithmetically with the measured steady-state step time (a full
    HPO_TRIALS*HPO_STEPS torch sweep at this batch would run ~1.5 h).
    Mirrors ModelOptimization.objective's rebuild-per-trial
    (ref: src/optimization/ModelOptimization.py:181-232)."""
    import torch
    import torch.nn as nn

    from waveformml_tpu.detector import NX, NY

    torch.set_num_threads(os.cpu_count() or 8)
    n_feat = 2 * N_SAMPLES
    rng = np.random.default_rng(0)
    coords, feats, labels = _synthetic_batch(rng, N_EVENTS, n_feat)
    x = _torch_dense_input(coords, feats, N_EVENTS, n_feat)
    y = torch.from_numpy(labels)
    crit = nn.CrossEntropyLoss()
    lr_rng = np.random.default_rng(7)

    setup_s, step_times = 0.0, []
    for _trial in range(HPO_TRIALS):
        t0 = time.perf_counter()
        lr = float(10 ** lr_rng.uniform(-4, -1))  # suggest_float(log=True)
        model, _ = _torch_sparse_model(n_feat)
        opt = torch.optim.SGD(model.parameters(), lr=lr, momentum=0.9)

        def one_step():
            opt.zero_grad()
            loss = crit(model(x), y)
            loss.backward()
            opt.step()
            return loss

        one_step()  # first step: lazy allocs, charged to setup
        setup_s += time.perf_counter() - t0
        t1 = time.perf_counter()
        for _ in range(HPO_TORCH_PROBE):
            loss = one_step()
        step_times.append((time.perf_counter() - t1) / HPO_TORCH_PROBE)
        float(loss)
    return setup_s + HPO_TRIALS * HPO_STEPS * float(np.mean(step_times))


# ---------------------------------------------------------------------------------
# compute-heavy bf16 config: step time + MFU estimate
# ---------------------------------------------------------------------------------

HEAVY_PLANES = 64
HEAVY_PLANES_WIDE = 128  # w128 beats w64 in wf/s since the FoldedSiteLinear
                         # dense-GEMM rework (docs/PERF_NOTES.md MFU sweep) —
                         # the wide variant is the quoted-MFU config; w64 is
                         # kept for round-over-round continuity
HEAVY_CONV = 4
PEAK_TFLOPS = float(os.environ.get("WFML_PEAK_TFLOPS", 197.0))  # v5e bf16 peak


def _sparse_train_flops(n_rows, n_events, n_feat, out_planes, n_conv,
                        executed=False):
    """Analytic FLOPs per train step (fwd+bwd ~ 3x fwd) of the SubM stack +
    SubMPSDNet head (planes schedule mirrors models/nets.py SubMPSDNet.setup,
    n_lin=2 → head width √(n_type·flat)).

    executed=False counts the row-space algorithm (active sites only — the
    honest useful-work MFU denominator). executed=True counts the dense
    flatten-Linear head the torch reference always runs. Since the r5
    site-grouped head (ops/site_head.py) the TPU model no longer executes
    those dense FLOPs either, so the emitted ``mfu_exec`` reads as
    DENSE-EQUIVALENT MFU — throughput normalized to the reference model
    family's arithmetic (the sparse-kernel-literature convention) — while
    ``mfu`` remains actual useful-work utilization."""
    from waveformml_tpu.detector import NX, NY
    from waveformml_tpu.models.sparse_blocks import SparseConv2DForEZ

    specs = SparseConv2DForEZ.schedule(n_feat, out_planes=out_planes,
                                       kernel_size=3, n_conv=n_conv, n_point=1,
                                       conv_position=1, version=2)
    fwd, cfinal = 0.0, n_feat
    for spec in specs:
        if spec[0] == "subm":
            _, cin, cout, k, _pd, _key = spec
            fwd += n_rows * (k * k) * cin * cout * 2
            cfinal = cout
    flat = NX * NY * cfinal
    f_head = int(round(flat * (float(N_TYPE) / flat) ** 0.5))
    head_rows = n_events * NX * NY if executed else n_rows
    fwd += head_rows * cfinal * f_head * 2     # folded/dense first linear
    fwd += n_events * f_head * N_TYPE * 2      # second linear
    return 3.0 * fwd


def _bench_heavy_at(backend, planes, metric_suffix=""):
    from waveformml_tpu.engineering.tasks import LitPSD

    cfg = _sparse_cfg(out_planes=planes, n_conv=HEAVY_CONV, half_precision=1)
    block = _sparse_block()
    wps, step_s, _ = _chained_train_wps(cfg, LitPSD(cfg), block)
    flops = _sparse_train_flops(block.coords.shape[0], N_EVENTS,
                                2 * N_SAMPLES, planes, HEAVY_CONV)
    flops_exec = _sparse_train_flops(block.coords.shape[0], N_EVENTS,
                                     2 * N_SAMPLES, planes, HEAVY_CONV,
                                     executed=True)
    mfu = flops / step_s / (PEAK_TFLOPS * 1e12)
    torch_wps = _cached_baseline(
        f"heavy_train_w{planes}" if planes != HEAVY_PLANES else "heavy_train",
        lambda: bench_sparse_torch(out_planes=planes, n_conv=HEAVY_CONV,
                                   steps=4))
    _emit(f"compute-heavy bf16 sparse PSD train throughput{metric_suffix} ({backend})",
          wps, "waveforms/sec/chip", wps / torch_wps if torch_wps else 0.0,
          step_ms=round(step_s * 1e3, 3), mfu=round(mfu, 4),
          mfu_exec=round(flops_exec / step_s / (PEAK_TFLOPS * 1e12), 4),
          tflops=round(flops / step_s / 1e12, 2), out_planes=planes)


def bench_heavy(backend):
    _bench_heavy_at(backend, HEAVY_PLANES)
    # width-128 variant: with the r5 site-grouped head + conv-stack fixes,
    # w128 costs ~12% step time over w64 for 2x the capacity (4.37 vs
    # 3.89 ms) — still the quoted-MFU accuracy/throughput frontier config
    _bench_heavy_at(backend, HEAVY_PLANES_WIDE, metric_suffix=" w128")


# ---------------------------------------------------------------------------------

def _safe(fn):
    """Baseline failure must not kill the bench."""
    try:
        return fn()
    except Exception as e:
        print(f"baseline failed: {e}", file=sys.stderr)
        return None


_TORCH_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_torch_cache.json")
# Version token for the torch-baseline cache: bump when any baseline's
# workload definition (event counts, model shapes, gzip level, step counts)
# changes so cached numbers can't outlive the workload they measured.
_BASELINE_WORKLOAD_V = 1


def _cached_baseline(key, fn):
    """Measure a torch-CPU baseline once per host configuration and reuse it.

    The baselines are deterministic CPU workloads (fixed seeds, fixed thread
    count) — re-measuring them every driver run burned most of the suite's
    wall-clock budget on this 1-core host (heavy: ~5 min of torch for 1 s of
    TPU timing) and made per-config budgets overrun. The cache key carries
    the torch version, CPU count, and a workload-version token (bump it
    whenever a baseline's event count / model shape changes, or the stale
    cached number silently survives the workload change) so a toolchain,
    host, or workload change invalidates it; BENCH_REFRESH_TORCH=1 forces
    re-measurement."""
    try:
        import torch
        tver = torch.__version__
    except ImportError:  # torch-less host: measure (and fail) via _safe
        return _safe(fn)

    sig = (f"{key}|torch{tver}|cpus{os.cpu_count()}|wl{_BASELINE_WORKLOAD_V}")
    cache = {}
    try:
        with open(_TORCH_CACHE) as f:
            cache = json.load(f)
    except (OSError, ValueError):
        pass
    if not os.environ.get("BENCH_REFRESH_TORCH") and sig in cache:
        return cache[sig]
    val = _safe(fn)
    if val:
        cache[sig] = val
        try:
            with open(_TORCH_CACHE, "w") as f:
                json.dump(cache, f, indent=1, sort_keys=True)
        except OSError:
            pass
    return val


# Run order within a child. Headline FIRST (freshest link phase + it can
# never be starved by earlier stalls); its line is re-printed last at exit
# for the driver's parse. stream and hpo run EARLY in the shared child —
# two rounds running they were the only configs the driver artifact missed,
# because each sat in its own fresh TPU client paying the 1-10 min
# first-execution stall out of its own small budget.
BENCHES = ["sparse_psd", "infer", "stream", "hpo", "graph", "heavy",
           "dense_conv1d", "wfparams"]
# Orchestrator child GROUPS: every child process is a fresh TPU client and
# pays the link's per-client first-execution stall (1-10 min on a slow-phase
# day — docs/PERF_NOTES.md) BEFORE its first timing, so ALL non-headline
# configs share ONE long-lived child: the stall is paid once, by `infer`
# (the cheapest config), and stream/hpo run against a warm client. The
# headline stays alone (escalating retries roll the link-phase dice).
# Inside the child a per-config SIGALRM watchdog (BENCH_CONFIG_S) keeps one
# hung config from eating the group's remaining budget, and the child prints
# each metric line as it completes so a group timeout salvages partial
# results. The global wall-clock guard (BENCH_TOTAL_S, default 3000 s)
# keeps the suite inside the driver's budget regardless.
GROUPS = [("sparse_psd", 480),
          # 2400 s: the group gained an 8th config (graph) in r5, and the
          # historical failure mode is precisely the TAIL configs dying at
          # the group watchdog on a slow-tunnel day
          ("infer,stream,hpo,graph,heavy,dense_conv1d,wfparams", 2400)]


def _run_inline(names) -> int:
    from waveformml_tpu.utils.util import enable_compilation_cache

    enable_compilation_cache()
    import signal

    import jax

    backend = jax.default_backend()
    fns = {"dense_conv1d": bench_dense_conv1d, "wfparams": bench_wfparams,
           "stream": bench_stream, "hpo": bench_hpo, "heavy": bench_heavy,
           "infer": bench_infer, "sparse_psd": bench_sparse_psd,
           "graph": bench_graph}
    per_cfg = float(os.environ.get("BENCH_CONFIG_S", 480))
    can_alarm = hasattr(signal, "SIGALRM")

    def _on_alarm(_sig, _frm):
        raise TimeoutError("per-config budget (BENCH_CONFIG_S) exceeded")

    first = True
    for name in BENCHES:
        if names is not None and name not in names:
            continue
        # the FIRST config in this process pays the TPU client's
        # first-execution stall (unbounded here; the parent's group timeout
        # covers a total hang) — only subsequent configs get the alarm
        use_alarm = can_alarm and not first and per_cfg > 0
        if use_alarm:
            old = signal.signal(signal.SIGALRM, _on_alarm)
            # ceil: alarm(0) would CANCEL the watchdog for budgets < 1 s
            signal.alarm(max(1, math.ceil(per_cfg)))
        try:
            fns[name](backend)
        except Exception as e:
            if name == "sparse_psd":
                raise
            print(f"bench {name} failed: {e}", file=sys.stderr)
        finally:
            if use_alarm:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, old)
        first = False
    if names is not None:
        # standalone BENCH_ONLY subset invoked by a user: persist like the
        # orchestrator does (a child process's parent collects via stdout,
        # so only top-level subset runs write the file)
        if not os.environ.get("BENCH_CHILD"):
            _write_results(os.path.dirname(os.path.abspath(__file__)))
    return 0


HEADLINE = {"entry": None}
_FINALIZED = {"done": False}


def _write_results(here):
    """Merge this run's RESULTS into bench_results.json by metric name (a
    subset run or a run with skipped groups must refresh the metrics it
    measured without erasing the rest of the record) and append every entry
    to bench_history.jsonl — the append-only log README ranges regenerate
    from (scripts/readme_bench_table.py)."""
    path = os.path.join(here, "bench_results.json")
    try:
        with open(path) as f:
            merged = list(json.load(f))
    except (OSError, ValueError):
        merged = []
    new = []
    for entry in RESULTS:
        metric = entry.get("metric")
        if any(e is entry or (e.get("metric") == metric
                              and e.get("ts") == entry.get("ts"))
               for e in merged):
            continue  # already persisted by an earlier incremental write
        merged = [e for e in merged if e.get("metric") != metric]
        merged.append(entry)
        new.append(entry)
    try:
        with open(path, "w") as f:
            json.dump(merged, f, indent=1)
        with open(os.path.join(here, "bench_history.jsonl"), "a") as f:
            for entry in new:
                f.write(json.dumps(entry) + "\n")
    except OSError:
        pass


def _finalize(here):
    """Re-print the headline as the LAST stdout line (the driver parses the
    final line) and persist all results. Idempotent: runs once, whether via
    normal completion, atexit, or the SIGTERM handler an external watchdog
    fires when the suite overruns."""
    if _FINALIZED["done"]:
        return
    _FINALIZED["done"] = True
    _write_results(here)
    if HEADLINE["entry"] is not None:
        print(json.dumps(HEADLINE["entry"]), flush=True)


_USAGE_FALLBACK = ("Usage: python bench.py  (no arguments; select a config "
                   "subset with BENCH_ONLY=name1,name2)")


def main() -> int:
    if sys.argv[1:]:
        # no argparse on purpose (config selection is env-driven so the
        # orchestrator's child invocations stay argv-identical), but NO argv
        # token may silently launch the full multi-config run: -h/--help
        # prints usage and exits 0, anything else (a typo'd flag, a stray
        # config name meant for BENCH_ONLY) prints usage and exits non-zero
        print(__doc__ or _USAGE_FALLBACK)  # __doc__ is None under python -OO
        return 0 if any(a in ("-h", "--help") for a in sys.argv[1:]) else 2
    only = os.environ.get("BENCH_ONLY")
    if only is not None or os.environ.get("BENCH_CHILD"):
        return _run_inline([s.strip() for s in only.split(",")]
                           if only else None)

    # Orchestrator mode (the driver's `python bench.py`): each config runs in
    # its own subprocess with a hard timeout — the shared TPU tunnel's latency
    # is erratic (the same config has measured 4 min and >9 min on this host),
    # and one stuck config must not lose the whole suite. The headline sparse
    # config runs FIRST (with escalating retries) and its line is re-emitted
    # at exit so the driver's final-line parse always sees it.
    import atexit
    import signal
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    t_start = time.perf_counter()
    total_budget = float(os.environ.get("BENCH_TOTAL_S", 3000))

    atexit.register(_finalize, here)

    def on_term(_sig, _frm):
        _finalize(here)
        os._exit(0)

    signal.signal(signal.SIGTERM, on_term)

    def collect_output(name: str, stdout) -> bool:
        """Parse a child's stdout (complete or partial) for metric lines."""
        if isinstance(stdout, bytes):
            stdout = stdout.decode("utf-8", "replace")
        got = False
        for line in (stdout or "").splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    entry = json.loads(line)
                except json.JSONDecodeError:
                    continue
                # latest measurement wins: a salvaged timed-out attempt
                # followed by a successful retry must not leave two
                # conflicting entries for the same metric in RESULTS /
                # bench_results.json
                metric = entry.get("metric")
                RESULTS[:] = [e for e in RESULTS
                              if e.get("metric") != metric]
                RESULTS.append(entry)
                if "sparse_psd" in name.split(",") and \
                        entry.get("metric", "").startswith("sparse PSD train"):
                    HEADLINE["entry"] = entry
                print(line, flush=True)
                got = True
        return got

    def run_child(name: str, budget: int) -> bool:
        env = {**os.environ, "BENCH_ONLY": name, "BENCH_CHILD": "1"}
        try:
            r = subprocess.run([sys.executable, "-u", os.path.abspath(__file__)],
                               capture_output=True, text=True, env=env,
                               cwd=here, timeout=budget)
        except subprocess.TimeoutExpired as e:
            # a grouped child prints each config's line as it finishes, so
            # the partial stdout may already hold completed measurements —
            # salvage them instead of discarding the whole group
            salvaged = collect_output(name, e.stdout)
            if e.stderr:
                err = e.stderr
                sys.stderr.write(err.decode("utf-8", "replace")
                                 if isinstance(err, bytes) else err)
            print(f"bench {name} timed out after {budget}s "
                  f"({'partial results salvaged' if salvaged else 'skipped'})",
                  file=sys.stderr)
            return False
        sys.stderr.write(r.stderr)
        got = collect_output(name, r.stdout)
        return got and r.returncode == 0

    # 1. headline first: escalating retries with fresh processes (each retry
    #    rolls the link-phase dice again)
    name, budget = GROUPS[0]
    ok = False
    for attempt_budget in (budget, budget + 240, budget + 600):
        if run_child(name, attempt_budget):
            ok = True
            break
        if HEADLINE["entry"] is not None:
            # the timed-out child already printed its measurement (teardown
            # stall): keep it instead of re-paying compile + link stall
            ok = True
            break
    if not ok and HEADLINE["entry"] is None:
        # totally-stalled link day: one inline attempt with NO watchdog —
        # bounded only by the caller — so the final-line parse still gets a
        # real measurement if the stall ever clears
        print("link stalled through all headline attempts; "
              "running inline without a watchdog", file=sys.stderr)
        try:
            _run_inline(["sparse_psd"])
            for entry in RESULTS:
                if "sparse PSD train throughput" in entry.get("metric", ""):
                    HEADLINE["entry"] = entry
        except Exception as e:
            print(f"inline headline failed: {e}", file=sys.stderr)

    # 2. the rest, inside the global wall-clock guard
    for name, budget in GROUPS[1:]:
        remaining = total_budget - (time.perf_counter() - t_start)
        if remaining < 120:
            print(f"global budget exhausted, skipping {name}", file=sys.stderr)
            continue
        run_child(name, int(min(budget, remaining)))
        _write_results(here)  # persist incrementally

    _finalize(here)
    return 0


if __name__ == "__main__":
    sys.exit(main())
