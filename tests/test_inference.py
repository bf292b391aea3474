import json
import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from waveformml_tpu.config import Config, save_config
from waveformml_tpu.datasets.synthetic import write_wfpair_cal
from waveformml_tpu.io.sql import write_synthetic_caldb


@pytest.fixture(scope="module")
def z_model_setup(tmp_path_factory):
    """A trained-enough (1-step) LitZ checkpoint + config on disk."""
    import jax

    from waveformml_tpu.datasets.hdf5_dataset import FileBlock
    from waveformml_tpu.engineering.tasks import LitZ
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.parallel.mesh import make_mesh

    tmp = tmp_path_factory.mktemp("infer")
    cfg = Config({
        "run_config": {"exp_name": "z", "run_class": "LitZ", "imports": []},
        "system_config": {"model_name": "z", "n_samples": 65, "n_type": 2,
                          "type_names": ["a"], "model_base_path": str(tmp / "model"),
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
    config_path = str(tmp / "config.json")
    save_config(cfg, config_path)
    task = LitZ(cfg)
    trainer = Trainer(cfg, task, mesh=make_mesh(jax.devices()[:1]), seed=0)
    rng = np.random.default_rng(0)
    coords = np.array([[1, 1, 0], [2, 2, 1]], dtype=np.int32)
    feats = rng.random((2, 130)).astype(np.float32)
    labels = rng.random(2).astype(np.float32)
    block = FileBlock(coords, feats, labels, {})
    trainer._ensure_state(block)
    ckpt = str(tmp / "model.ckpt")
    trainer.save_checkpoint(ckpt)
    caldb = str(tmp / "cal.db")
    write_synthetic_caldb(caldb, "testcal", seed=2)
    return tmp, config_path, ckpt, caldb


def test_inference_model_roundtrip(z_model_setup):
    from waveformml_tpu.config import load_config
    from waveformml_tpu.inference.model import InferenceModel

    tmp, config_path, ckpt, _ = z_model_setup
    model = InferenceModel(load_config(config_path), ckpt)
    rng = np.random.default_rng(1)
    coords = np.array([[1, 1, 0], [3, 4, 0], [5, 5, 1]], dtype=np.int32)
    vals = rng.random((3, 130)).astype(np.float32)
    out = model(coords, vals)
    assert out.shape == (2, 1, 14, 11)
    # same result for a repeated call (deterministic eval)
    out2 = model(coords, vals)
    np.testing.assert_allclose(out, out2)


def test_z_prediction_writer_end_to_end(z_model_setup, monkeypatch):
    from waveformml_tpu.inference.prediction_writer import ZPredictionWriter
    import h5py

    tmp, config_path, ckpt, caldb = z_model_setup
    monkeypatch.setenv("PROSPECT_CALDB", caldb)
    input_path = str(tmp / "input_WFCalFilteredSE.h5")
    write_wfpair_cal(input_path, n_events=30, seed=4)
    with h5py.File(input_path) as h5:
        original_ez = h5["WaveformPairCal"]["EZ"][()].copy()
    out_path = str(tmp / "out_ModelOut.h5")
    pw = ZPredictionWriter(out_path, input_path, config_path, ckpt,
                           calgroup="testcal", n_rows_per_read=16,
                           datatype="WaveformPairCal")
    pw.write_predictions()
    pw.write_XML(runtime=1.0)
    with h5py.File(out_path) as h5:
        rec = h5["WaveformPairCal"][()]
        # z (EZ[:,1]) replaced by model predictions, E (EZ[:,0]) untouched
        assert not np.allclose(rec["EZ"][:, 1], original_ez[:, 1])
        np.testing.assert_allclose(rec["EZ"][:, 0], original_ez[:, 0])
        # everything else preserved
        np.testing.assert_array_equal(rec["waveform"],
                                      _read(input_path, "waveform"))
        attrs = h5["WaveformPairCal"].attrs
        assert "nevents" in attrs
    # XML sidecar written (standalone since input has no sidecar)
    xml_path = out_path + ".xml"
    assert os.path.exists(xml_path)
    tree = ET.parse(xml_path)
    steps = tree.getroot().findall(".//AnalysisStep")
    assert steps and steps[0].get("code")


def _read(path, field):
    import h5py

    with h5py.File(path) as h5:
        return h5["WaveformPairCal"][field][()]


def test_evaluate_cli(z_model_setup, tmp_path):
    """Drive Evaluate.py via its main() on a PSD setup."""
    import Evaluate
    from waveformml_tpu.config import Config, save_config
    from waveformml_tpu.datasets.data_module import PSDDataModule
    from waveformml_tpu.datasets.synthetic import write_classification_dirs
    from waveformml_tpu.engineering.tasks import LitPSD
    from waveformml_tpu.engineering.trainer import Trainer

    write_classification_dirs(str(tmp_path / "data"), ["A", "B"], n_files=3,
                              events_per_file=20, n_samples=8, seed=9)
    cfg = Config({
        "run_config": {"exp_name": "t", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "m", "n_samples": 8, "n_type": 2,
                          "type_names": ["A", "B"],
                          "model_base_path": str(tmp_path / "model"),
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "CrossEntropyLoss", "criterion_params": [],
                       "imports": [], "net_class": "DenseConvNet",
                       "net_type": "2DConvolution",
                       "hparams": {"n_conv": 1, "n_lin": 1, "out_planes": 2,
                                   "conv_params": {"size_factor": 2, "pad_factor": 1.0}}},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [],
                           "base_path": str(tmp_path / "data"),
                           "paths": ["A", "B"], "dataset_class": "PulseDataset2D",
                           "dataset_params": {}, "dataloader_params": {"batch_size": 1},
                           "n_train": 20, "n_validate": 10, "n_test": 10},
    })
    config_path = str(tmp_path / "cfg.json")
    save_config(cfg, config_path)
    task = LitPSD(cfg)
    trainer = Trainer(cfg, task, max_epochs=1, seed=0)
    dm = PSDDataModule(cfg)
    trainer.fit(dm)
    ckpt = str(tmp_path / "ckpt" / "epoch=0-val_loss=0.70.ckpt")
    trainer.save_checkpoint(ckpt)
    rc = Evaluate.main([config_path, ckpt, "-v", "2"])
    assert rc == 0


def test_combine_data_cli(tmp_path):
    import CombineData
    from waveformml_tpu.datasets.synthetic import write_classification_dirs

    write_classification_dirs(str(tmp_path / "data"), ["A", "B"], n_files=2,
                              events_per_file=15, n_samples=8, seed=11)
    out_dir = str(tmp_path / "combined")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        rc = CombineData.main([str(tmp_path / "data" / "A"),
                               str(tmp_path / "data" / "B"),
                               "-t", "2d", "-s", "10", "-o", out_dir, "-v", "2"])
    finally:
        os.chdir(cwd)
    assert rc == 0
    combined = [f for f in os.listdir(out_dir) if f.startswith("Combined_")]
    assert combined


def test_single_ended_ez_with_frozen_z(z_model_setup, rng):
    """net_config z_weights + z_config → LitEZ composes a frozen pretrained Z
    model: out_planes 1 + concatenated stop-gradient z channel
    (ref: SingleEndedEZConv.py:23-64)."""
    import jax
    import jax.numpy as jnp

    from waveformml_tpu.engineering.tasks import LitEZ
    from waveformml_tpu.ops.sparse import SparseBatch, pad_sparse

    tmp, config_path, ckpt, _ = z_model_setup
    cfg = Config({
        "run_config": {"exp_name": "ez", "run_class": "LitEZ", "imports": []},
        "system_config": {"model_name": "ez", "n_samples": 65, "n_type": 2,
                          "type_names": ["a"], "model_base_path": str(tmp / "model_ez"),
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "L1Loss", "criterion_params": [],
                       "imports": [], "net_type": "2DConvolution",
                       "net_class": "SingleEndedEZConv",
                       "algorithm": "conv",
                       "z_weights": ckpt, "z_config": config_path,
                       "hparams": {"kernel_size": 3, "n_conv": 1, "n_point": 1,
                                   "conv_position": 1, "version": 1}},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDatasetWFPairEZ",
                           "dataset_params": {}, "n_train": 8, "n_validate": 4},
    })
    task = LitEZ(cfg)
    assert task.model.z_apply is not None
    coords = np.array([[1, 1, 0], [3, 4, 0], [5, 5, 1]], np.int32)
    feats = rng.random((3, 130)).astype(np.float32)
    c, f, m = pad_sparse(coords, feats, 16)
    batch = SparseBatch(*(np.asarray(x) for x in (c, f, m)), 2)
    variables = task.model.init(jax.random.PRNGKey(0), batch)
    out = task.model.apply(variables, batch)
    assert out.shape == (2, 2, 14, 11)  # E channel + frozen z channel

    # the z channel equals the frozen z model's own output (stop-gradded)
    from waveformml_tpu.config import load_config
    from waveformml_tpu.inference.model import InferenceModel
    inf = InferenceModel(load_config(config_path), ckpt)
    z_direct = inf.task.model.apply(inf.variables, batch, train=False)
    np.testing.assert_allclose(np.asarray(out[:, 1:2]), np.asarray(z_direct),
                               rtol=1e-6)

    # the freeze guarantee is STRUCTURAL: z_apply is a closure over the
    # restored checkpoint, so no z-branch parameter exists in the trainable
    # tree at all — and the E branch receives real (nonzero) gradients.
    # stop_gradient additionally blocks the z OUTPUT from the graph: the
    # model output's z channel must be constant wrt trainable params.
    names = [jax.tree_util.keystr(k)
             for k, _ in jax.tree_util.tree_leaves_with_path(variables["params"])]
    assert not any("frozen" in n.lower() or "litz" in n.lower()
                   for n in names), names

    # randomize params: at default init the ReLU tail can output exactly 0
    # on this tiny batch, making every gradient vacuously zero
    prng = np.random.default_rng(3)
    live_params = jax.tree.map(
        lambda x: jnp.asarray(prng.normal(0, 0.5, np.shape(x))
                              .astype(np.float32)), variables["params"])

    def loss_fn(p):
        o = task.model.apply({**variables, "params": p}, batch)
        return jnp.sum(o ** 2)

    g = jax.grad(loss_fn)(live_params)
    assert any(float(jnp.abs(x).max()) > 0
               for x in jax.tree_util.tree_leaves(g))
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(g))

    def z_channel(p):
        o = task.model.apply({**variables, "params": p}, batch)
        return jnp.sum(o[:, 1:2] ** 2)

    gz = jax.grad(z_channel)(live_params)
    assert all(float(jnp.abs(x).max()) == 0.0
               for x in jax.tree_util.tree_leaves(gz))


def test_occlusion_study_end_to_end(tmp_path):
    """Full occlusion pipeline (BASELINE/VERDICT occlusion sweep): train,
    Evaluate -oc n per feature -> occlude_<n> tfevents, then
    EvalOcclusionStudy collects the per-index losses into a plot
    (ref: scripts/RunOcclusionStudy.py + scripts/EvalOcclusionStudy.py)."""
    import subprocess
    import sys

    import Evaluate
    from waveformml_tpu.config import Config, save_config
    from waveformml_tpu.datasets.data_module import PSDDataModule
    from waveformml_tpu.datasets.synthetic import write_classification_dirs
    from waveformml_tpu.engineering.tasks import LitPSD
    from waveformml_tpu.engineering.trainer import Trainer

    write_classification_dirs(str(tmp_path / "data"), ["A", "B"], n_files=3,
                              events_per_file=20, n_samples=8, seed=11)
    cfg = Config({
        "run_config": {"exp_name": "t", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "m", "n_samples": 8, "n_type": 2,
                          "type_names": ["A", "B"],
                          "model_base_path": str(tmp_path / "model"),
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "CrossEntropyLoss", "criterion_params": [],
                       "imports": [], "net_class": "DenseConvNet",
                       "net_type": "2DConvolution",
                       "hparams": {"n_conv": 1, "n_lin": 1, "out_planes": 2,
                                   "conv_params": {"size_factor": 2, "pad_factor": 1.0}}},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [],
                           "base_path": str(tmp_path / "data"),
                           "paths": ["A", "B"], "dataset_class": "PulseDataset2D",
                           "dataset_params": {}, "dataloader_params": {"batch_size": 1},
                           "n_train": 20, "n_validate": 10, "n_test": 10},
    })
    config_path = str(tmp_path / "cfg.json")
    save_config(cfg, config_path)
    task = LitPSD(cfg)
    trainer = Trainer(cfg, task, max_epochs=1, seed=0)
    trainer.fit(PSDDataModule(cfg))
    ckpt = str(tmp_path / "ckpt" / "epoch=0-val_loss=0.70.ckpt")
    trainer.save_checkpoint(ckpt)

    for n in (0, 1):  # the per-index Evaluate runs RunOcclusionStudy drives
        assert Evaluate.main([config_path, ckpt, "-oc", str(n), "-v", "2"]) == 0
    eval_dir = os.path.join(os.path.dirname(ckpt), "evaluate")
    assert os.path.isdir(os.path.join(eval_dir, "occlude_0"))
    assert os.path.isdir(os.path.join(eval_dir, "occlude_1"))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "EvalOcclusionStudy.py"),
         eval_dir, "2"],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "PYTHONPATH": repo, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr + r.stdout
    assert "ind 0 is" in r.stdout and "ind 1 is" in r.stdout
    assert os.path.exists(os.path.join(eval_dir, "occlude_results_test_loss.png"))


def _tiny_task_ckpt(tmp_path, run_class, net_cfg, n_type, name):
    """Init-only checkpoint + config for a writer test."""
    import jax

    from waveformml_tpu.config import Config, save_config
    from waveformml_tpu.datasets.hdf5_dataset import FileBlock
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.parallel.mesh import make_mesh
    from waveformml_tpu.registry import retrieve_class

    cfg = Config({
        "run_config": {"exp_name": name, "run_class": run_class, "imports": []},
        "system_config": {"model_name": name, "n_samples": 65, "n_type": n_type,
                          "type_names": [f"c{i}" for i in range(n_type)],
                          "model_base_path": str(tmp_path / "model"),
                          "half_precision": 0},
        "net_config": {"criterion_params": [], "imports": [],
                       "net_type": "2DConvolution", **net_cfg},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDatasetWFPairNorm",
                           "dataset_params": {}, "n_train": 8, "n_validate": 4},
    })
    task = retrieve_class(run_class)(cfg)
    rng = np.random.default_rng(0)
    coords = np.array([[1, 1, 0], [2, 2, 1]], dtype=np.int32)
    feats = rng.random((2, 130)).astype(np.float32)
    labels = (np.zeros(2, np.int64) if "Class" in run_class or "PSD" in run_class
              else rng.random(2).astype(np.float32))
    trainer = Trainer(cfg, task, mesh=__import__("jax").devices()[:1] and
                      make_mesh(__import__("jax").devices()[:1]), seed=0)
    trainer._ensure_state(FileBlock(coords, feats, labels, {}))
    ckpt = str(tmp_path / f"{name}.ckpt")
    trainer.save_checkpoint(ckpt)
    cfg_path = str(tmp_path / f"{name}.json")
    save_config(cfg, cfg_path)
    return cfg_path, ckpt


def test_irn_prediction_writer_end_to_end(tmp_path):
    """IRN writer swaps per-event model outputs into phys[:, 4:] on a WFNorm
    stream (ref: PredictionWriter.py:180-195)."""
    import h5py

    from waveformml_tpu.datasets.synthetic import write_wfnorm
    from waveformml_tpu.inference.prediction_writer import IRNPredictionWriter

    cfg_path, ckpt = _tiny_task_ckpt(
        tmp_path, "LitPSD",
        {"criterion_class": "CrossEntropyLoss", "net_class": "SubMPSDNet",
         "hparams": {"out_planes": 4, "n_lin": 1,
                     "conv_params": {"kernel_size": 3, "n_conv": 1, "n_point": 1,
                                     "conv_position": 1, "version": 2}}},
        n_type=3, name="irn")
    input_path = str(tmp_path / "run2_WFNorm.h5")
    write_wfnorm(input_path, n_events=25, seed=3)
    with h5py.File(input_path) as h5:
        orig = h5["WaveformPairNorm"]["phys"][()].copy()
    out_path = str(tmp_path / "irn_ModelOut.h5")
    pw = IRNPredictionWriter(out_path, input_path, cfg_path, ckpt,
                             n_rows_per_read=16)
    pw.write_predictions()
    with h5py.File(out_path) as h5:
        rec = h5["WaveformPairNorm"][()]
    assert not np.allclose(rec["phys"][:, 4:], orig[:, 4:])
    np.testing.assert_allclose(rec["phys"][:, :4], orig[:, :4])


def test_irnim_prediction_writer_end_to_end(tmp_path):
    """IRNIM writer swaps per-row class scores into phys[:, 2:]
    (ref: PredictionWriter.py:198-275, output_is_sparse path)."""
    import h5py

    from waveformml_tpu.datasets.synthetic import write_wfnorm
    from waveformml_tpu.inference.prediction_writer import IRNIMPredictionWriter

    cfg_path, ckpt = _tiny_task_ckpt(
        tmp_path, "LitSegClassifier",
        {"criterion_class": "CrossEntropyLoss", "net_class": "SPConvPreserveNet",
         "hparams": {"n_conv": 1,
                     "conv_params": {"pointwise_factor": 0, "pad_factor": 1.0,
                                     "size_factor": 3, "stride_factor": 1.2,
                                     "n_expansion": 1, "expansion_factor": 1.2,
                                     "version": 1, "n_contraction": 1}}},
        n_type=5, name="irnim")
    input_path = str(tmp_path / "run3_WFNorm.h5")
    write_wfnorm(input_path, n_events=25, seed=5)
    with h5py.File(input_path) as h5:
        orig = h5["WaveformPairNorm"]["phys"][()].copy()
    out_path = str(tmp_path / "irnim_ModelOut.h5")
    pw = IRNIMPredictionWriter(out_path, input_path, cfg_path, ckpt,
                               n_rows_per_read=16)
    pw.write_predictions()
    with h5py.File(out_path) as h5:
        rec = h5["WaveformPairNorm"][()]
    assert not np.allclose(rec["phys"][:, 2:], orig[:, 2:])
    np.testing.assert_allclose(rec["phys"][:, :2], orig[:, :2])


def test_write_predictions_cli(z_model_setup, monkeypatch):
    """The WritePredictions.py CLI end-to-end (arg plumbing, output naming,
    XML provenance; ref: WritePredictions.py:11-86)."""
    import WritePredictions
    from waveformml_tpu.datasets.synthetic import write_wfpair_cal

    tmp, config_path, ckpt, caldb = z_model_setup
    monkeypatch.setenv("PROSPECT_CALDB", caldb)
    input_path = str(tmp / "cli_WFCalFilteredSE.h5")
    write_wfpair_cal(input_path, n_events=20, seed=6)
    rc = WritePredictions.main([input_path, config_path, ckpt, "-w", "z",
                                "-c", "testcal", "-r", "16",
                                "-d", "WaveformPairCal"])
    assert rc == 0
    out_path = input_path[:-3] + "ModelOut.h5"
    assert os.path.exists(out_path)
    assert os.path.exists(out_path + ".xml")


def test_irnim_physpulse_convert_end_to_end(tmp_path, monkeypatch):
    """IRNIM writer in PhysPulse mode: WaveformPairCal stream → per-row class
    scores → full PhysPulse conversion (ref: PredictionWriter.py:198-275,
    convert path with datatype='PhysPulse')."""
    import h5py

    from waveformml_tpu.datasets.synthetic import write_wfpair_cal
    from waveformml_tpu.inference.prediction_writer import IRNIMPredictionWriter
    from waveformml_tpu.io.sql import write_synthetic_caldb

    cfg_path, ckpt = _tiny_task_ckpt(
        tmp_path, "LitSegClassifier",
        {"criterion_class": "CrossEntropyLoss", "net_class": "SPConvPreserveNet",
         "hparams": {"n_conv": 1,
                     "conv_params": {"pointwise_factor": 0, "pad_factor": 1.0,
                                     "size_factor": 3, "stride_factor": 1.2,
                                     "n_expansion": 1, "expansion_factor": 1.2,
                                     "version": 1, "n_contraction": 1}}},
        n_type=5, name="irnimp")
    caldb = str(tmp_path / "cal.db")
    write_synthetic_caldb(caldb, "testcal", seed=9)
    monkeypatch.setenv("PROSPECT_CALDB", caldb)
    input_path = str(tmp_path / "run4_WFCalFilteredSE.h5")
    write_wfpair_cal(input_path, n_events=25, seed=8)
    out_path = str(tmp_path / "run4_Phys.h5")
    pw = IRNIMPredictionWriter(out_path, input_path, cfg_path, ckpt,
                               calgroup="testcal", datatype="PhysPulse",
                               n_rows_per_read=16)
    pw.write_predictions()
    with h5py.File(out_path) as h5:
        rec = h5["PhysPulse"][()]
    with h5py.File(input_path) as h5:
        cin = h5["WaveformPairCal"]["coord"][()]
    assert rec.shape[0] == cin.shape[0]
    np.testing.assert_array_equal(rec["seg"], cin[:, 0] + cin[:, 1] * 14)
    assert np.isfinite(rec["E"]).all()


def test_pack_db_roundtrip_edge_dtypes():
    """_pack_db must reproduce jnp.asarray semantics for the leaves a
    prepare_block can emit: 0-d scalars, bools, int64 (x64-off
    canonicalization), int16 — and go BEYOND it for big-endian HDF5 reads,
    which jnp.asarray rejects outright ('>f4 is not a valid JAX array
    type') but the pack path byte-swaps to native."""
    import jax.numpy as jnp
    from jax import lax

    from waveformml_tpu.inference.model import _pack_db

    db = {
        "be": np.array([1.5, -2.25, 3.0], dtype=">f4"),
        "scalar": np.float32(7.5),
        "flags": np.array([True, False, True]),
        "wide": np.array([1, 2, 3], dtype=np.int64),
        "adc": np.array([[-5, 300]], dtype=np.int16),
    }
    buf, spec = _pack_db(db)
    packed = jnp.asarray(buf)
    for key, shape, dt, off, nb in spec:
        raw = packed[off:off + nb]
        d = np.dtype(dt)
        if d == np.bool_:
            got = raw.reshape(shape).astype(jnp.bool_)
        elif d.itemsize == 1:
            got = lax.bitcast_convert_type(raw.reshape(shape), jnp.dtype(d))
        else:
            got = lax.bitcast_convert_type(
                raw.reshape(tuple(shape) + (d.itemsize,)), jnp.dtype(d))
        src = np.asarray(db[key])
        if src.dtype.byteorder not in ("=", "|"):
            src = src.astype(src.dtype.newbyteorder("="))
        want = jnp.asarray(src)
        assert got.shape == want.shape, (key, got.shape, want.shape)
        assert got.dtype == want.dtype, (key, got.dtype, want.dtype)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fetch_disambiguates_row_vs_event_bucket_collision():
    """The row and event bucket tables share 256/512/1024/...: when a chunk's
    padded row count equals its padded event count, the shape alone cannot
    tell a per-row output from a per-event one. output_unit must decide."""
    from waveformml_tpu.inference.model import InferenceModel

    n, n_events, bucket = 2000, 1200, 2048
    per_row = np.arange(bucket, dtype=np.float32)          # padded [2048]
    per_event = np.arange(bucket, dtype=np.float32) + 0.5  # padded [2048]
    handle_row = (per_row, n, n_events, bucket, bucket)
    handle_evt = (per_event, n, n_events, bucket, bucket)

    m = object.__new__(InferenceModel)
    m._warned_ambiguous = False

    m.output_unit = "row"
    assert InferenceModel.fetch(m, handle_row).shape == (n,)
    m.output_unit = "event"
    assert InferenceModel.fetch(m, handle_evt).shape == (n_events,)
    m.output_unit = "auto"  # legacy tie-break: per-event, with a warning
    assert InferenceModel.fetch(m, handle_evt).shape == (n_events,)
    assert m._warned_ambiguous
    # no collision: auto still infers correctly from the shape
    handle = (np.zeros((512, 3)), 500, 120, 512, 128)
    assert InferenceModel.fetch(m, handle).shape == (500, 3)


def test_irnim_dense_output_layout(tmp_path):
    """The dense (output_is_sparse=False) classifier path must map the torch
    layout [B, C, NX, NY] through the channel-last swap kernel."""
    from waveformml_tpu.ops.sparse import swap_sparse_from_dense

    rng = np.random.default_rng(6)
    B, C, NX, NY = 3, 5, 14, 11
    dense = rng.random((B, C, NX, NY)).astype(np.float32)
    coord = np.array([[0, 0, 0], [13, 10, 0], [7, 3, 1], [9, 9, 2]],
                     dtype=np.int32)
    out = np.zeros((coord.shape[0], C), dtype=np.float32)
    swap_sparse_from_dense(out, np.moveaxis(dense, 1, -1), coord)
    for i, (x, y, b) in enumerate(coord):
        np.testing.assert_allclose(out[i], dense[b, :, x, y])


def test_inference_model_graph_net_host_prep(tmp_path):
    """Graph models need task.prepare_block (padded edge lists from the host
    C++ kernels, feature augmentation): InferenceModel must route them
    through the host-prep path instead of the packed-buffer fast path."""
    import jax

    from waveformml_tpu.datasets.hdf5_dataset import FileBlock
    from waveformml_tpu.engineering.tasks import LitZ
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.inference.model import InferenceModel
    from waveformml_tpu.parallel.mesh import make_mesh

    n_samples = 16
    cfg = Config({
        "run_config": {"exp_name": "gzi", "run_class": "LitZ", "imports": []},
        "system_config": {"model_name": "gzi", "n_samples": n_samples,
                          "n_type": 2, "type_names": ["a"],
                          "model_base_path": str(tmp_path / "m"),
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "L1Loss", "criterion_params": [],
                       "imports": [], "net_class": "GraphZNet",
                       "net_type": "graph", "algorithm": "conv",
                       "hparams": {"neighbors": 1, "n_conv": 1, "n_point": 1,
                                   "conv_position": 1, "graph_index": 0}},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDataset2DWithZ",
                           "dataset_params": {}, "n_train": 4, "n_validate": 2},
    })
    config_path = str(tmp_path / "config.json")
    save_config(cfg, config_path)
    rng = np.random.default_rng(1)
    task = LitZ(cfg)
    trainer = Trainer(cfg, task, mesh=make_mesh(jax.devices()[:1]), seed=0)
    coords = np.array([[1, 1, 0], [2, 2, 0], [5, 5, 1], [6, 6, 1]],
                      dtype=np.int32)
    feats = rng.random((4, 2 * n_samples)).astype(np.float32)
    trainer._ensure_state(FileBlock(coords, feats,
                                    rng.random(4).astype(np.float32), {}))
    ckpt = str(tmp_path / "g.ckpt")
    trainer.save_checkpoint(ckpt)

    m = InferenceModel(cfg, ckpt)
    assert m._needs_host_prep
    out = m(coords, feats)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    # dense z grid truncated to the true event count
    assert out.shape[0] == 2


def test_inference_model_litwaveform_host_prep(tmp_path):
    """LitWaveform overrides prepare_block (detector-number coords appended
    to features) with ROW-aligned labels despite event_predictions=True —
    the host-prep path must size its dummy labels by labels_per_row, or a
    multi-row-event chunk crashes broadcasting (E,) into (N,)."""
    import jax

    from waveformml_tpu.datasets.hdf5_dataset import FileBlock
    from waveformml_tpu.engineering.tasks import LitWaveform
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.inference.model import InferenceModel
    from waveformml_tpu.parallel.mesh import make_mesh

    n_samples = 16
    cfg = Config({
        "run_config": {"exp_name": "wfi", "run_class": "LitWaveform", "imports": []},
        "system_config": {"model_name": "wfi", "n_samples": n_samples,
                          "n_type": 2, "type_names": ["a"],
                          "model_base_path": str(tmp_path / "m"),
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "L1Loss", "criterion_params": [],
                       "imports": [], "net_class": "LinearWaveformNet",
                       "net_type": "linear", "use_detector_number": True,
                       "num_detectors": 308,
                       "hparams": {"n_lin": 2, "out_size": 1}},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDatasetWaveformNorm",
                           "dataset_params": {}, "n_train": 4, "n_validate": 2},
    })
    save_config(cfg, str(tmp_path / "config.json"))
    rng = np.random.default_rng(2)
    task = LitWaveform(cfg)
    assert task.labels_per_row
    # 6 rows spanning 3 events: per-row labels (N=6) != events (E=3)
    det = rng.integers(0, 308, 6).astype(np.int32)  # 1-D det-id coords
    feats = rng.random((6, n_samples)).astype(np.float32)
    trainer = Trainer(cfg, task, mesh=make_mesh(jax.devices()[:1]), seed=0)
    trainer._ensure_state(FileBlock(det, feats,
                                    rng.random(6).astype(np.float32), {}))
    ckpt = str(tmp_path / "w.ckpt")
    trainer.save_checkpoint(ckpt)

    m = InferenceModel(cfg, ckpt, output_unit="row")
    assert m._needs_host_prep
    out = np.asarray(m(det, feats))
    assert np.isfinite(out).all()
    assert out.shape[0] == 6  # one prediction per row


def test_inference_model_probes_plan_requirements(tmp_path):
    """A plan-consuming model (row-conv SubM stack + site-grouped head):
    InferenceModel's first dispatch probes the requirements via one
    eval_shape trace, flips to the host-prep path, and ships the
    host-built plans — matching the train-path numerics exactly."""
    import jax

    from waveformml_tpu.datasets.hdf5_dataset import FileBlock
    from waveformml_tpu.engineering.tasks import LitPSD
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.inference.model import InferenceModel
    from waveformml_tpu.parallel.mesh import make_mesh

    n_samples = 8
    cfg = Config({
        "run_config": {"exp_name": "spi", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "spi", "n_samples": n_samples,
                          "n_type": 2, "type_names": ["a", "b"],
                          "model_base_path": str(tmp_path / "m"),
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "CrossEntropyLoss",
                       "criterion_params": [], "imports": [],
                       "net_class": "SubMPSDNet", "net_type": "2DConvolution",
                       "hparams": {"out_planes": 4, "n_lin": 2,
                                   "conv_params": {"kernel_size": 3,
                                                   "n_conv": 1, "n_point": 1,
                                                   "conv_position": 1,
                                                   "version": 2}}},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDataset2D",
                           "dataset_params": {}, "n_train": 4, "n_validate": 2},
    })
    config_path = str(tmp_path / "config.json")
    save_config(cfg, config_path)
    rng = np.random.default_rng(2)
    task = LitPSD(cfg)
    trainer = Trainer(cfg, task, mesh=make_mesh(jax.devices()[:1]), seed=0)
    coords = np.array([[1, 1, 0], [2, 2, 0], [5, 5, 1], [6, 6, 1]],
                      dtype=np.int32)
    feats = rng.random((4, 2 * n_samples)).astype(np.float32)
    trainer._ensure_state(FileBlock(coords, feats,
                                    np.array([0, 1], np.int64), {}))
    ckpt = str(tmp_path / "s.ckpt")
    trainer.save_checkpoint(ckpt)

    m = InferenceModel(cfg, ckpt)
    assert not m._needs_host_prep          # fast path until probed
    out = np.asarray(m(coords, feats))
    assert m._plan_probe_done
    assert m._needs_host_prep              # probe found plan requirements
    assert {("site", 0, None), (3, 2, None), (1, 2, None)} <= m.task._plan_reqs
    assert np.isfinite(out).all() and out.shape == (2, 2)
    # second dispatch (host-prep path, plans shipped) agrees with the first
    out2 = np.asarray(m(coords, feats))
    np.testing.assert_allclose(out2, out, rtol=1e-5, atol=1e-6)
