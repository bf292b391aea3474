"""3D (x, y, t) sparse conv path: rank-generic conv semantics, SCNet with
net_type 3DConvolution, and the PulseDataset3D → SparseBatch pipeline."""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from waveformml_tpu.config import Config
from waveformml_tpu.detector import NX, NY
from waveformml_tpu.ops.sparse import (
    SparseBatch, occupancy_mask_3d, pad_sparse, scatter_to_dense_3d)
from waveformml_tpu.ops.sparse_conv import (
    SparseConv2d, SparseGrid, SubMConv2d, dilate_occupancy)

T = 6


def _grid3d(rng, B=2, C=3, density=0.05):
    occ = rng.random((B, NX, NY, T)) < density
    occ[:, 0, 0, 0] = True
    feats = rng.normal(size=(B, NX, NY, T, C)).astype(np.float32)
    feats = feats * occ[..., None]
    return SparseGrid(jnp.array(feats), jnp.array(occ))


def _batch3d(rng, n_events=3, n_pad=256):
    rows, feats = [], []
    for e in range(n_events):
        sites = rng.choice(NX * NY, size=int(rng.integers(1, 4)), replace=False)
        for s in sites:
            for t in sorted(rng.choice(T, size=int(rng.integers(1, T)), replace=False)):
                rows.append([s % NX, s // NX, int(t), e])
                feats.append(rng.normal(size=2))
    coords = np.asarray(rows, dtype=np.int32)
    f = np.asarray(feats, dtype=np.float32)
    c, f, m = pad_sparse(coords, f, n_pad)
    return SparseBatch(jnp.array(c), jnp.array(f), jnp.array(m), n_events)


def _brute_force_subm3d(feats, occ, kernel, bias):
    B, H, W, D, Cin = feats.shape
    kh, kw, kd, _, Cout = kernel.shape
    out = np.zeros((B, H, W, D, Cout), np.float32)
    for b in range(B):
        for i, j, k in zip(*np.nonzero(occ[b])):
            acc = np.zeros(Cout, np.float32)
            for di in range(kh):
                for dj in range(kw):
                    for dk in range(kd):
                        ii, jj, kk = i + di - kh // 2, j + dj - kw // 2, k + dk - kd // 2
                        if (0 <= ii < H and 0 <= jj < W and 0 <= kk < D
                                and occ[b, ii, jj, kk]):
                            acc += feats[b, ii, jj, kk] @ kernel[di, dj, dk]
            out[b, i, j, k] = acc + bias
    return out


def test_subm_conv3d_exact(rng):
    g = _grid3d(rng)
    layer = SubMConv2d(3, 5, kernel_size=3)  # rank comes from the input grid
    variables = layer.init(jax.random.PRNGKey(0), g)
    out = layer.apply(variables, g)
    kernel = np.asarray(variables["params"]["conv"]["kernel"])
    bias = np.asarray(variables["params"]["conv"]["bias"])
    ref = _brute_force_subm3d(np.asarray(g.features), np.asarray(g.occupancy),
                              kernel, bias)
    np.testing.assert_allclose(np.asarray(out.features), ref, rtol=2e-4, atol=2e-5)
    assert bool(jnp.all(out.occupancy == g.occupancy))


def test_sparse_conv3d_occupancy_dilation(rng):
    g = _grid3d(rng, density=0.02)
    layer = SparseConv2d(3, 4, kernel_size=3, stride=1, padding=1)
    variables = layer.init(jax.random.PRNGKey(1), g)
    out = layer.apply(variables, g)
    occ = np.asarray(g.occupancy)
    want = np.zeros_like(occ)
    B, H, W, D = occ.shape
    for b in range(B):
        for i, j, k in zip(*np.nonzero(occ[b])):
            want[b, max(0, i - 1):i + 2, max(0, j - 1):j + 2,
                 max(0, k - 1):k + 2] = True
    np.testing.assert_array_equal(np.asarray(out.occupancy), want)
    # inactive output sites carry zero features
    inactive = ~np.asarray(out.occupancy)
    assert np.abs(np.asarray(out.features)[inactive]).max() == 0


def test_scatter_3d_round_trip(rng):
    b = _batch3d(rng)
    dense = scatter_to_dense_3d(b, T)
    occ = occupancy_mask_3d(b, T)
    assert dense.shape == (3, NX, NY, T, 2)
    n_real = int(np.asarray(b.mask).sum())
    assert int(np.asarray(occ).sum()) == n_real
    # every real row's features land at its site
    c = np.asarray(b.coords)[np.asarray(b.mask)]
    f = np.asarray(b.feats)[np.asarray(b.mask)]
    d = np.asarray(dense)
    for row in range(n_real):
        x, y, t, e = c[row]
        np.testing.assert_allclose(d[e, x, y, t], f[row], rtol=1e-6)


def test_scnet_3d_algorithm_dsl(rng):
    from waveformml_tpu.models.nets import SCNet
    cfg = Config({
        "system_config": {"n_samples": T, "n_type": 3, "model_name": "m",
                          "model_base_path": "/tmp/m"},
        "net_config": {
            "net_type": "3DConvolution",
            "algorithm": [
                "spconv.SubMConv3d", [2, 4, 3, 1, 1, 1],
                "nn.BatchNorm1d", [4],
                "nn.ReLU",
                "spconv.SparseConv3d", [4, 4, 2, 2, 0, 1],
                "spconv.ToDense",
                "nn.Linear", [4 * (NX // 2) * (NY // 2) * (T // 2), 16],
                "nn.ReLU",
                "nn.Linear", [16, 3],
            ]},
    })
    model = SCNet(cfg)
    b = _batch3d(rng)
    variables = model.init(jax.random.PRNGKey(0), b)
    out = model.apply(variables, b)
    assert out.shape == (3, 3)
    assert bool(jnp.isfinite(out).all())


def test_pulse_dataset_3d_end_to_end(rng, tmp_path):
    """Synthetic *Waveform3DPairSim.h5 dirs → PulseDataset3D → collate →
    4-column SparseBatch → SCNet 3D forward."""
    from waveformml_tpu.datasets.data_module import PSDDataModule, collate_blocks
    from waveformml_tpu.datasets.synthetic import write_classification_dirs_3d
    from waveformml_tpu.models.nets import SCNet

    n_samples = T
    write_classification_dirs_3d(str(tmp_path / "data"), ["a", "b"],
                                 n_files=2, events_per_file=6,
                                 n_samples=n_samples, seed=1)
    cfg = Config({
        "run_config": {"exp_name": "e", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "m3d", "n_samples": n_samples,
                          "n_type": 2, "type_names": ["a", "b"],
                          "model_base_path": str(tmp_path / "model"),
                          "half_precision": 0},
        "net_config": {"net_type": "3DConvolution", "criterion_class": "CrossEntropyLoss",
                       "criterion_params": [], "imports": [],
                       "net_class": "SCNet",
                       "algorithm": [
                           "spconv.SubMConv3d", [2, 4, 3, 1, 1, 1],
                           "nn.ReLU",
                           "spconv.ToDense",
                           "nn.Linear", [4 * NX * NY * n_samples, 8],
                           "nn.ReLU",
                           "nn.Linear", [8, 2],
                       ]},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [],
                           "base_path": str(tmp_path / "data"),
                           "paths": ["a", "b"],
                           "dataset_class": "PulseDataset3D",
                           "dataset_params": {}, "n_train": 8, "n_validate": 4,
                           "dataloader_params": {"batch_size": 2, "num_workers": 0}},
    })
    dm = PSDDataModule(cfg)
    dm.gen_train_dataset()
    block = next(iter(dm.train_dataloader()))
    assert block.coords.shape[1] == 4
    assert len(np.unique(block.coords[:, 3])) > 1  # distinct event ids

    from waveformml_tpu.engineering.tasks import LitPSD
    task = LitPSD(cfg)
    db = task.prepare_block(block, task.row_bucket(block), task.event_bucket(block))
    db = {k: jnp.asarray(v) for k, v in db.items()}
    batch = task.sparse_batch(db)
    assert batch.coords.shape[1] == 4
    variables = task.model.init(jax.random.PRNGKey(0), batch)
    out = task.model.apply(variables, batch)
    assert out.shape == (batch.n_events, 2)
    assert bool(jnp.isfinite(out).all())


def test_rank2_unaffected(rng):
    """The rank-generalized classes still match the 2D brute force."""
    occ = rng.random((2, NX, NY)) < 0.15
    occ[:, 0, 0] = True
    feats = (rng.normal(size=(2, NX, NY, 3)) * occ[..., None]).astype(np.float32)
    g = SparseGrid(jnp.array(feats), jnp.array(occ))
    out_occ = dilate_occupancy(g.occupancy, 3, 1, 1, 1)
    want = np.zeros_like(occ)
    for b in range(2):
        for i, j in zip(*np.nonzero(occ[b])):
            want[b, max(0, i - 1):i + 2, max(0, j - 1):j + 2] = True
    np.testing.assert_array_equal(np.asarray(out_occ), want)


def test_row_conv3d_matches_brute_force(rng):
    """3D row-space SubM conv (K³ neighbor plan) equals the brute-force
    neighbor sum — the 3D analog of the 2D row-path equality guarantee."""
    from waveformml_tpu.ops.row_conv import (build_neighbor_plan_3d,
                                             subm_conv_rows)

    b = _batch3d(rng)
    C, Cout, K = 2, 5, 3
    kernel = jnp.asarray(rng.normal(size=(K ** 3, C, Cout)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(Cout,)).astype(np.float32))
    plan = build_neighbor_plan_3d(b, K, T)
    out = subm_conv_rows(b.feats, plan, kernel, bias, b.mask)

    # brute force over the dense grid with the same kernel layout
    from waveformml_tpu.ops.sparse import occupancy_mask_3d, scatter_to_dense_3d
    dense = np.asarray(scatter_to_dense_3d(b, T))
    occ = np.asarray(occupancy_mask_3d(b, T))
    k5 = np.asarray(kernel).reshape(K, K, K, C, Cout)
    ref = _brute_force_subm3d(dense, occ, k5, np.asarray(bias))
    c = np.asarray(b.coords)[np.asarray(b.mask)]
    got = np.asarray(out)[np.asarray(b.mask)]
    for row in range(c.shape[0]):
        x, y, t, e = c[row]
        np.testing.assert_allclose(got[row], ref[e, x, y, t],
                                   rtol=2e-4, atol=2e-5)


def test_scnet_3d_row_path_active(rng):
    """The 3D row fast path is available via DSLSpecNet(n_t=...) even though
    SCNet defaults 3D to the dense grid (measured faster on TPU at the small
    early channel counts)."""
    from waveformml_tpu.models.nets import SCNet
    from waveformml_tpu.models.sparse_blocks import DSLSpecNet
    cfg = Config({
        "system_config": {"n_samples": T, "n_type": 2, "model_name": "m",
                          "model_base_path": "/tmp/m"},
        "net_config": {
            "net_type": "3DConvolution",
            "algorithm": [
                "spconv.SubMConv3d", [2, 4, 3, 1, 1, 1],
                "nn.BatchNorm1d", [4],
                "nn.ReLU",
                "spconv.ToDense",
                "nn.Linear", [4 * NX * NY * T, 8],
                "nn.Linear", [8, 2],
            ]},
    })
    from waveformml_tpu.models.algorithm import dsl_to_row_specs, split_algorithm
    model = SCNet(cfg)
    b = _batch3d(rng)
    variables = model.init(jax.random.PRNGKey(0), b)
    model_bound = model.bind(variables)
    # SCNet 3D stays dense by default
    assert not isinstance(model_bound.sparse_model, DSLSpecNet)
    out = model.apply(variables, b)
    assert out.shape == (3, 2) and bool(jnp.isfinite(out).all())

    # the opt-in row net computes the same function shape-wise
    _, sparse, _ = split_algorithm(cfg.net_config.algorithm)
    specs = dsl_to_row_specs(sparse)
    row_net = DSLSpecNet(tuple(specs), n_t=T)
    rv = row_net.init(jax.random.PRNGKey(0), b)
    dense_out = row_net.apply(rv, b)
    assert dense_out.shape == (3, 4, NX, NY, T)
    assert bool(jnp.isfinite(dense_out).all())


def test_pulse_dataset_3d_trainer_fit(rng, tmp_path):
    """Full 3D training loop: PulseDataset3D → SPMD Trainer.fit over the
    4-column sparse batches (SubMConv3d stack)."""
    import math

    from waveformml_tpu.datasets.data_module import PSDDataModule
    from waveformml_tpu.datasets.synthetic import write_classification_dirs_3d
    from waveformml_tpu.engineering.tasks import LitPSD
    from waveformml_tpu.engineering.trainer import Trainer

    n_samples = T
    write_classification_dirs_3d(str(tmp_path / "data"), ["a", "b"],
                                 n_files=4, events_per_file=8,
                                 n_samples=n_samples, seed=7)
    cfg = Config({
        "run_config": {"exp_name": "t3", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "t3", "n_samples": n_samples,
                          "n_type": 2, "type_names": ["a", "b"],
                          "model_base_path": str(tmp_path / "model"),
                          "half_precision": 0},
        "net_config": {"net_type": "3DConvolution",
                       "criterion_class": "CrossEntropyLoss",
                       "criterion_params": [], "imports": [],
                       "net_class": "SCNet",
                       "algorithm": [
                           "spconv.SubMConv3d", [2, 4, 3, 1, 1, 1],
                           "nn.ReLU",
                           "spconv.ToDense",
                           "nn.Linear", [4 * NX * NY * n_samples, 8],
                           "nn.ReLU",
                           "nn.Linear", [8, 2],
                       ]},
        "optimize_config": {"total_epoch": 2, "lr": 0.05, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {"momentum": 0.9}},
        "dataset_config": {"mode": "path", "imports": [],
                           "base_path": str(tmp_path / "data"),
                           "paths": ["a", "b"],
                           "dataset_class": "PulseDataset3D",
                           "dataset_params": {}, "n_train": 12, "n_validate": 4,
                           "dataloader_params": {"batch_size": 2,
                                                 "num_workers": 0}},
    })
    from waveformml_tpu.engineering.tasks import LitPSD

    trainer = Trainer(cfg, LitPSD(cfg), seed=0, early_stopping_patience=10)
    metrics = trainer.fit(PSDDataModule(cfg))
    assert math.isfinite(metrics["train_loss"])
    assert "val_loss" in metrics


def test_even_kernel_3d_rejected():
    """The row-space custom VJP reuses a k-reversed plan for d_feats, which
    is only valid for odd (negation-symmetric) windows; the 3D plan builder
    must reject even k like the 2D one instead of silently corrupting
    gradients."""
    import pytest

    from waveformml_tpu.ops.row_conv import build_neighbor_plan_3d
    from waveformml_tpu.ops.sparse import SparseBatch

    c = np.array([[0, 0, 0, 0], [1, 1, 1, 0]], np.int32)
    f = np.ones((2, 3), np.float32)
    m = np.ones(2, bool)
    batch = SparseBatch(jnp.asarray(c), jnp.asarray(f), jnp.asarray(m), 1)
    with pytest.raises(ValueError, match="odd kernel"):
        build_neighbor_plan_3d(batch, kernel_size=2, n_t=4)
