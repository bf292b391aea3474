"""Aux utilities: SimpleProfiler, HistCollator, GraphDataset cache,
AnalyzeWaveforms script."""
import json
import os
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_simple_profiler_summary(tmp_path):
    from waveformml_tpu.utils.profiler import SimpleProfiler

    p = SimpleProfiler()
    for _ in range(3):
        with p.profile("run_training_step"):
            time.sleep(0.01)
    with p.profile("get_train_batch"):
        time.sleep(0.005)
    rows = dict((r[0], r) for r in p.rows())
    assert rows["run_training_step"][1] == 3
    assert rows["run_training_step"][2] >= 0.03
    out = tmp_path / "profile_results.txt"
    p.describe(str(out))
    text = out.read_text()
    assert "Profiler Report" in text
    assert "run_training_step" in text and "get_train_batch" in text


def test_trainer_writes_profile_results(tmp_path, rng):
    """--profiler through the Trainer drops profile_results.txt in the log dir."""
    from waveformml_tpu.config import Config, validate_config
    from waveformml_tpu.datasets.data_module import PSDDataModule
    from waveformml_tpu.datasets.synthetic import write_classification_dirs
    from waveformml_tpu.engineering.tasks import LitPSD
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.utils.tb import TBLogger

    write_classification_dirs(str(tmp_path / "data"), ["a", "b"], n_files=2,
                              events_per_file=6, n_samples=8, seed=3)
    cfg = Config({
        "run_config": {"exp_name": "p", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "prof", "n_samples": 8, "n_type": 2,
                          "type_names": ["a", "b"],
                          "model_base_path": str(tmp_path / "model"),
                          "half_precision": 0},
        "net_config": {"net_type": "2DConvolution", "net_class": "DenseConvNet",
                       "criterion_class": "CrossEntropyLoss", "criterion_params": [],
                       "imports": [],
                       "hparams": {"n_conv": 1, "n_lin": 1, "out_planes": 2,
                                   "conv_params": {"size_factor": 3,
                                                   "pad_factor": 1.0}}},
        "optimize_config": {"total_epoch": 1, "lr": 0.05, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [],
                           "base_path": str(tmp_path / "data"),
                           "paths": ["a", "b"], "dataset_class": "PulseDataset2D",
                           "dataset_params": {}, "n_train": 6, "n_validate": 6,
                           "dataloader_params": {"batch_size": 1, "num_workers": 0}},
    })
    validate_config(cfg)
    task = LitPSD(cfg)
    logger = TBLogger(str(tmp_path / "logs"))
    trainer = Trainer(cfg, task, logger=logger, profiler=True, seed=0)
    trainer.fit(PSDDataModule(cfg))
    path = os.path.join(logger.log_dir, "profile_results.txt")
    assert os.path.exists(path)
    text = open(path).read()
    assert "run_training_step" in text and "evaluation_step" in text


def test_hist_collator():
    from waveformml_tpu.utils.hist import Hist2DCollator, HistCollator

    h = HistCollator(bins=10, range=(0.0, 1.0))
    h.add(np.array([0.05, 0.15, 0.15, 0.95]))
    assert h.counts.sum() == 4
    assert h.counts[1] == 2
    h2 = HistCollator(bins=10, range=(0.0, 1.0))
    h2.add(np.array([0.05]))
    h.merge(h2)
    assert h.counts[0] == 2
    assert h.normalized().sum() == pytest.approx(1.0)
    with pytest.raises(ValueError):
        h.add_histogram(np.zeros(5))

    h2d = Hist2DCollator(bins=(4, 4), range=((0, 1), (0, 1)))
    h2d.add(np.array([0.1, 0.9]), np.array([0.1, 0.9]))
    assert h2d.counts.sum() == 2
    assert h2d.counts[0, 0] == 1 and h2d.counts[3, 3] == 1


def test_hist_collator_degenerate_and_fuzz():
    """Auto-range must survive constant (min==max) input — including nonzero
    constants, which the old `x.max() or 1.0` rescue missed — and fuzzed
    inputs must always land every sample in a finite-width bin."""
    from waveformml_tpu.utils.hist import Hist2DCollator, HistCollator

    for const in (0.0, 3.5, -2.0):
        h = HistCollator(bins=8)
        h.add(np.full(5, const))
        assert h.counts.sum() == 5
        assert np.all(np.isfinite(h.edges)) and h.edges[0] < h.edges[-1]

        h2d = Hist2DCollator(bins=(4, 4))
        h2d.add(np.full(5, const), np.full(5, const))
        assert h2d.counts.sum() == 5
        ex, ey = h2d.edges
        assert ex[0] < ex[-1] and ey[0] < ey[-1]

    rng = np.random.default_rng(0)
    for _ in range(25):
        n = int(rng.integers(1, 50))
        scale = float(rng.choice([1e-6, 1.0, 1e6]))
        x = rng.normal(rng.uniform(-5, 5), rng.uniform(0, 2), n) * scale
        y = rng.normal(rng.uniform(-5, 5), rng.uniform(0, 2), n) * scale
        h = HistCollator(bins=int(rng.integers(1, 20)))
        h.add(x)
        assert h.counts.sum() == n
        h2d = Hist2DCollator(bins=(3, 7))
        h2d.add(x, y)
        assert h2d.counts.sum() == n


def test_graph_dataset_cache(tmp_path, rng):
    from waveformml_tpu.config import Config
    from waveformml_tpu.datasets.graph_dataset import GraphDataset
    from waveformml_tpu.datasets.pulse_dataset import PulseDataset2D
    from waveformml_tpu.datasets.synthetic import write_classification_dirs

    write_classification_dirs(str(tmp_path / "data"), ["A"], n_files=2,
                              events_per_file=8, n_samples=8, seed=7)
    cfg = Config({
        "system_config": {"model_name": "m", "model_base_path": str(tmp_path / "model"),
                          "n_samples": 8, "type_names": ["A"]},
        "dataset_config": {"base_path": str(tmp_path / "data"),
                           "paths": ["A"], "dataset_params": {}},
    })
    ds = PulseDataset2D(cfg, "train", 16)
    g = GraphDataset(ds, edge_specs=[("knn", 3, False), ("window", 1, True)])
    assert len(g) == len(ds.get_file_list())
    assert all(os.path.exists(p) for p in g.processed_file_names)
    block = g[0]
    raw = ds[0]
    np.testing.assert_array_equal(block.coords, raw.coords)
    np.testing.assert_allclose(block.feats, raw.feats)
    assert "edges_knn3" in block.extras and "edge_mask_knn3" in block.extras
    assert "edges_w1" in block.extras
    e = block.extras["edges_knn3"]
    m = block.extras["edge_mask_knn3"]
    assert e.shape[0] == 2 and m.dtype == bool
    # cache hit: same edge config must not re-process (mtimes unchanged);
    # a DIFFERENT spec list rebuilds — see
    # test_graph_dataset_cache_invalidates_on_change
    mtimes = [os.path.getmtime(p) for p in g.processed_file_names]
    g2 = GraphDataset(ds, edge_specs=[("knn", 3, False), ("window", 1, True)])
    assert [os.path.getmtime(p) for p in g2.processed_file_names] == mtimes
    # PyG-compatible surface
    assert g.len() == len(g)
    np.testing.assert_array_equal(g.get(0).coords, block.coords)


def test_analyze_waveforms_script(tmp_path):
    from waveformml_tpu.datasets.synthetic import write_classification_dirs

    write_classification_dirs(str(tmp_path / "data"), ["A", "B"], n_files=2,
                              events_per_file=8, n_samples=40, seed=11)
    out = tmp_path / "analysis"
    env = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "AnalyzeWaveforms.py"),
         str(tmp_path / "data" / "A"), str(tmp_path / "data" / "B"),
         "-o", str(out)],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr
    z = np.load(out / "average_waveforms.npz")
    assert "A_mean" in z and "B_mean" in z and z["A_mean"].shape == (80,)
    feats = json.load(open(out / "waveform_features.json"))
    assert feats["A"]["n"] > 0 and 0 <= feats["A"]["psd"] <= 1
    # classes differ in tail fraction → PSD must separate them
    assert feats["B"]["psd"] > feats["A"]["psd"]
    assert (out / "average_waveforms.png").exists()


def test_graph_dataset_cache_invalidates_on_change(tmp_path, rng):
    """The processed npz cache is keyed by source mtime + event range +
    edge specs: a changed edge config or touched source rebuilds instead of
    silently serving stale graphs (PyG reuses processed/ unconditionally)."""
    from waveformml_tpu.config import Config
    from waveformml_tpu.datasets.graph_dataset import GraphDataset
    from waveformml_tpu.datasets.pulse_dataset import PulseDataset2D
    from waveformml_tpu.datasets.synthetic import write_classification_dirs

    write_classification_dirs(str(tmp_path / "data"), ["A"], n_files=2,
                              events_per_file=8, n_samples=8, seed=3)
    cfg = Config({
        "system_config": {"model_name": "m",
                          "model_base_path": str(tmp_path / "model"),
                          "n_samples": 8, "type_names": ["A"]},
        "dataset_config": {"base_path": str(tmp_path / "data"),
                           "paths": ["A"], "dataset_params": {}},
    })
    ds = PulseDataset2D(cfg, "train", 16)
    g1 = GraphDataset(ds, edge_specs=[("knn", 3, False)])
    assert "edges_knn3" in g1[0].extras
    mt1 = os.path.getmtime(g1.processed_file_names[0])

    # same config: cache reused (no rewrite)
    g2 = GraphDataset(ds, edge_specs=[("knn", 3, False)])
    assert os.path.getmtime(g2.processed_file_names[0]) == mt1

    # new edge spec: block rebuilt with the new edges
    g3 = GraphDataset(ds, edge_specs=[("knn", 5, False)])
    assert "edges_knn5" in g3[0].extras

    # touched source file: rebuilt
    src = ds.get_file_list()[0]
    os.utime(src, (time.time() + 10, time.time() + 10))
    g4 = GraphDataset(ds, edge_specs=[("knn", 5, False)])
    assert os.path.getmtime(g4.processed_file_names[0]) > mt1


def test_retrieve_best_checkpoint_fallback_and_nan(tmp_path):
    """Checkpoints without a parseable val_loss must still be retrievable
    (float('inf')-1 == inf made the old sentinel unselectable), and a
    metric-bearing name always beats the fallback."""
    from waveformml_tpu.utils.util import retrieve_best_checkpoint

    only_last = tmp_path / "a"
    only_last.mkdir()
    (only_last / "last.ckpt").mkdir()
    assert retrieve_best_checkpoint(str(only_last)).endswith("last.ckpt")

    mixed = tmp_path / "b"
    mixed.mkdir()
    (mixed / "last.ckpt").mkdir()
    (mixed / "epoch=3-val_loss=0.50.ckpt").mkdir()
    (mixed / "epoch=5-val_loss=0.25.ckpt").mkdir()
    assert retrieve_best_checkpoint(str(mixed)).endswith(
        "epoch=5-val_loss=0.25.ckpt")


def test_hist_collators_weighted_fractional_counts():
    from waveformml_tpu.utils.hist import Hist2DCollator, HistCollator

    h = HistCollator(bins=2, range=(0.0, 2.0))
    h.add(np.array([0.5, 0.5, 1.5]), weights=np.array([0.4, 0.4, 0.25]))
    np.testing.assert_allclose(h.counts, [0.8, 0.25])

    h2 = Hist2DCollator(bins=(2, 2), range=((0.0, 2.0), (0.0, 2.0)))
    h2.add(np.array([0.5]), np.array([1.5]), weights=np.array([0.3]))
    np.testing.assert_allclose(h2.counts, [[0.0, 0.3], [0.0, 0.0]])


def test_parallel_chunk_reader_empty_table(tmp_path):
    import h5py

    from waveformml_tpu.io.hdf5 import ParallelChunkReader

    dt = np.dtype([("a", np.float32)])
    p = tmp_path / "empty.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("T", shape=(0,), maxshape=(None,), dtype=dt,
                         chunks=(64,), compression="gzip")
    with h5py.File(p) as f:
        pr = ParallelChunkReader(f["T"])
        out = pr.read(0, 0)
        assert out.shape == (0,) and out.dtype == dt


def test_cached_graph_edges_consumed_by_prepare_block(tmp_path, rng):
    """Regression: GraphDataset's cached edges must actually be CONSUMED by
    the task's prepare_block (not row-padded into junk extra_ keys while
    edges are rebuilt from scratch). Proven three ways: the prepared batch
    matches a cache-less one, no extra_edges_* keys leak, and a sabotaged
    cache changes the output."""
    from waveformml_tpu.config import Config
    from waveformml_tpu.datasets.graph_dataset import GraphDataset
    from waveformml_tpu.datasets.hdf5_dataset import FileBlock
    from waveformml_tpu.datasets.pulse_dataset import PulseDataset2D
    from waveformml_tpu.datasets.synthetic import write_classification_dirs
    from waveformml_tpu.engineering.tasks import LitPSD

    write_classification_dirs(str(tmp_path / "data"), ["A"], n_files=1,
                              events_per_file=10, n_samples=8, seed=3)
    dcfg = Config({
        "system_config": {"model_name": "m",
                          "model_base_path": str(tmp_path / "model"),
                          "n_samples": 8, "type_names": ["A"]},
        "dataset_config": {"base_path": str(tmp_path / "data"),
                           "paths": ["A"], "dataset_params": {}},
    })
    ds = PulseDataset2D(dcfg, "train", 10)
    K = 4
    g = GraphDataset(ds, edge_specs=[("knn", K, False)])

    tcfg = Config({
        "run_config": {"exp_name": "g", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "g", "n_samples": 8, "n_type": 2,
                          "type_names": ["A", "B"],
                          "model_base_path": str(tmp_path / "m2"),
                          "half_precision": 0},
        "net_config": {"criterion_class": "CrossEntropyLoss",
                       "criterion_params": [], "imports": [],
                       "net_class": "GraphNet.GraphNet", "net_type": "Graph",
                       "hparams": {"k": K, "n_graph": 1, "n_lin": 1,
                                   "graph_out": 4, "graph_class_index": 1}},
        "optimize_config": {"total_epoch": 1, "lr": 0.01,
                            "validation_freq": 1, "imports": [],
                            "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDataset2D",
                           "dataset_params": {}, "n_train": 1,
                           "n_validate": 1},
    })
    task = LitPSD(tcfg)
    cached = g[0]
    plain = FileBlock(cached.coords, cached.feats, cached.labels, {})
    rb, eb = task.row_bucket(plain), task.event_bucket(plain)
    db_cached = task.prepare_block(cached, rb, eb)
    db_live = task.prepare_block(plain, rb, eb)
    np.testing.assert_array_equal(db_cached[f"edges_knn{K}"],
                                  db_live[f"edges_knn{K}"])
    np.testing.assert_array_equal(db_cached[f"edge_mask_knn{K}"],
                                  db_live[f"edge_mask_knn{K}"])
    assert not any(k.startswith("extra_edges") for k in db_cached)
    # sabotage proves the cached edges are the ones consumed
    bad_extras = dict(cached.extras)
    bad_extras[f"edge_mask_knn{K}"] = np.zeros_like(
        bad_extras[f"edge_mask_knn{K}"])
    bad = FileBlock(cached.coords, cached.feats, cached.labels, bad_extras)
    db_bad = task.prepare_block(bad, rb, eb)
    assert not db_bad[f"edge_mask_knn{K}"].any()


def test_get_file_md5_handles_checkpoint_directories(tmp_path):
    """Orbax checkpoints are directories — provenance hashing must digest
    them (contents + relative paths) instead of silently skipping."""
    from waveformml_tpu.utils.util import get_file_md5

    d = tmp_path / "epoch=1-val_loss=0.50.ckpt"
    (d / "sub").mkdir(parents=True)
    (d / "a.bin").write_bytes(b"123")
    (d / "sub" / "b.bin").write_bytes(b"456")
    h1 = get_file_md5(str(d))
    assert len(h1) == 32
    (d / "a.bin").write_bytes(b"124")
    assert get_file_md5(str(d)) != h1


def test_apply_num_threads_sets_real_caps(monkeypatch):
    from waveformml_tpu.utils.util import apply_num_threads

    monkeypatch.delenv("OMP_NUM_THREADS", raising=False)
    monkeypatch.setenv("XLA_FLAGS", "")
    apply_num_threads(4)
    assert os.environ["OMP_NUM_THREADS"] == "4"
    assert "intra_op_parallelism_threads=4" in os.environ["XLA_FLAGS"]
    # None/0 is a no-op
    monkeypatch.setenv("XLA_FLAGS", "x")
    apply_num_threads(None)
    assert os.environ["XLA_FLAGS"] == "x"
