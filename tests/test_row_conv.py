import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveformml_tpu.detector import NX, NY
from waveformml_tpu.models.nets import batch_to_grid
from waveformml_tpu.models.sparse_blocks import SparseConv2DForEZ
from waveformml_tpu.ops.row_conv import (
    build_neighbor_plan, build_site_lookup, rows_to_dense, subm_conv_rows)
from waveformml_tpu.ops.sparse import SparseBatch, pad_sparse


def _batch(rng, n_events=4, n_feat=10, n_pad=32):
    rows = []
    for e in range(n_events):
        for s in rng.choice(NX * NY, size=3, replace=False):
            rows.append([s % NX, s // NX, e])
    coords = np.asarray(rows, dtype=np.int32)
    feats = rng.normal(size=(coords.shape[0], n_feat)).astype(np.float32)
    c, f, m = pad_sparse(coords, feats, n_pad)
    return SparseBatch(jnp.asarray(c), jnp.asarray(f), jnp.asarray(m), n_events)


def test_neighbor_plan_correct(rng):
    b = _batch(rng)
    plan = np.asarray(build_neighbor_plan(b, 3))
    coords = np.asarray(b.coords)
    mask = np.asarray(b.mask)
    # brute force: neighbor k of row r
    site_of = {}
    for r in range(coords.shape[0]):
        if mask[r]:
            site_of[(coords[r, 2], coords[r, 0], coords[r, 1])] = r
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    for r in range(coords.shape[0]):
        if not mask[r]:
            continue
        for k, (dx, dy) in enumerate(offs):
            x, y = coords[r, 0] + dx, coords[r, 1] + dy
            expect = site_of.get((coords[r, 2], x, y), -1) \
                if 0 <= x < NX and 0 <= y < NY else -1
            assert plan[r, k] == expect, (r, k, dx, dy)


def test_subm_rows_matches_dense_conv(rng):
    """Row-space SubM conv == dense-grid SubM conv exactly."""
    from waveformml_tpu.ops.sparse_conv import SubMConv2d

    b = _batch(rng)
    g = batch_to_grid(b)
    dense_layer = SubMConv2d(10, 6, kernel_size=3)
    variables = dense_layer.init(jax.random.PRNGKey(0), g)
    out_dense = dense_layer.apply(variables, g)
    kernel = variables["params"]["conv"]["kernel"]  # [3, 3, 10, 6]
    bias = variables["params"]["conv"]["bias"]
    plan = build_neighbor_plan(b, 3)
    out_rows = subm_conv_rows(b.feats, plan, kernel.reshape(9, 10, 6), bias, b.mask)
    # gather dense output at active rows and compare
    from waveformml_tpu.ops.sparse import gather_from_dense

    dense_rows = gather_from_dense(out_dense.features, b)
    np.testing.assert_allclose(np.asarray(out_rows), np.asarray(dense_rows),
                               atol=1e-5)


def test_forez_row_path_matches_dense(rng):
    """SparseConv2DForEZ v2 (pure SubM) via SparseBatch (row path) equals the
    SparseGrid (dense path) execution with the same parameters."""
    b = _batch(rng, n_feat=10)
    model = SparseConv2DForEZ(10, out_planes=2, kernel_size=3, n_conv=1,
                              n_point=2, conv_position=1, version=2)
    g = batch_to_grid(b)
    v_dense = model.init(jax.random.PRNGKey(0), g)
    out_dense = model.apply(v_dense, g)
    v_rows = model.init(jax.random.PRNGKey(0), b)
    # copy dense conv params into the row-path layout
    rp = flax.core.unfreeze(v_rows)["params"]
    dp = flax.core.unfreeze(v_dense)["params"]
    for lname, layer_params in dp.items():
        if "conv" in layer_params:  # SubM layer
            k = layer_params["conv"]["kernel"]
            kk = k.shape[0] * k.shape[1]
            rp[lname]["kernel"] = k.reshape(kk, k.shape[2], k.shape[3])
            rp[lname]["bias"] = layer_params["conv"]["bias"]
        else:  # batchnorm etc: same structure
            rp[lname] = layer_params
    out_rows = model.apply({"params": rp,
                            **{k: v for k, v in v_rows.items() if k != "params"}}, b)
    np.testing.assert_allclose(np.asarray(out_rows), np.asarray(out_dense),
                               atol=1e-5)


def test_rows_to_dense_layout(rng):
    b = _batch(rng, n_feat=2)
    dense = rows_to_dense(b.feats, b)
    assert dense.shape == (4, 2, NX, NY)
    coords = np.asarray(b.coords)
    mask = np.asarray(b.mask)
    feats = np.asarray(b.feats)
    d = np.asarray(dense)
    for r in range(coords.shape[0]):
        if mask[r]:
            np.testing.assert_allclose(d[coords[r, 2], :, coords[r, 0], coords[r, 1]],
                                       feats[r], rtol=1e-6)


def test_submpsdnet_trains(rng, tmp_path):
    from waveformml_tpu.config import Config
    from waveformml_tpu.datasets.hdf5_dataset import FileBlock
    from waveformml_tpu.engineering.tasks import LitPSD
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.parallel.mesh import make_mesh

    cfg = Config({
        "run_config": {"exp_name": "s", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "s", "n_samples": 8, "n_type": 2,
                          "type_names": ["A", "B"],
                          "model_base_path": str(tmp_path / "m"),
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "CrossEntropyLoss", "criterion_params": [],
                       "imports": [], "net_class": "SubMPSDNet",
                       "net_type": "2DConvolution",
                       "hparams": {"out_planes": 4, "n_lin": 2,
                                   "conv_params": {"kernel_size": 3, "n_conv": 2,
                                                   "n_point": 1, "conv_position": 1,
                                                   "version": 2}}},
        "optimize_config": {"total_epoch": 1, "lr": 0.05, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {"momentum": 0.9, "nesterov": True}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDataset2D", "dataset_params": {},
                           "n_train": 4, "n_validate": 2},
    })
    task = LitPSD(cfg)
    trainer = Trainer(cfg, task, mesh=make_mesh(jax.devices()[:2]), seed=0)
    coords = np.array([[1, 1, 0], [2, 2, 0], [5, 5, 1], [7, 7, 1]], dtype=np.int32)
    feats = np.asarray(rng.random((4, 16)), dtype=np.float32)
    labels = np.array([0, 1], dtype=np.int64)
    block = FileBlock(coords, feats, labels, {})
    trainer._ensure_state(block)
    db = {k: jnp.asarray(v) for k, v in trainer._device_batch(block).items()}
    # overfit: loss must drop
    losses = []
    for i in range(40):
        out = trainer._train_step_fn(trainer.state.params,
                                     trainer.state.batch_stats,
                                     trainer.state.opt_state,
                                     jax.random.PRNGKey(i), db)
        (trainer.state.params, trainer.state.batch_stats,
         trainer.state.opt_state) = out[0], out[1], out[2]
        losses.append(float(out[3]))
    assert losses[-1] < losses[0] * 0.5, losses[:3] + losses[-3:]
