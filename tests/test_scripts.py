import json
import os
import sqlite3
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")
ENV = {**os.environ, "PYTHONPATH": REPO + ":" + SCRIPTS,
       "JAX_PLATFORMS": "cpu"}


def _run(script, *args, cwd=None):
    return subprocess.run([sys.executable, os.path.join(SCRIPTS, script), *args],
                          capture_output=True, text=True, env=ENV, cwd=cwd,
                          timeout=300)


def test_peak_finder_script():
    r = _run("test_peak_finder.py")
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_gen_wfparam_config(tmp_path):
    ranges = tmp_path / "ranges.json"
    ranges.write_text(json.dumps({"lambda": [1500, 2000], "n": [1.4, 1.8]}))
    db = tmp_path / "wf.db"
    out = tmp_path / "cfgs"
    r = _run("GenWFParamConfig.py", str(ranges), str(db), "-n", "2",
             "-o", str(out))
    assert r.returncode == 0, r.stderr
    conn = sqlite3.connect(db)
    n_sets = conn.execute("SELECT COUNT(*) FROM param_set").fetchone()[0]
    assert n_sets == 4  # 2 points × 2 params
    cfgs = list(out.glob("WaveCal*.cfg"))
    assert len(cfgs) == 4
    text = cfgs[0].read_text()
    assert "lambda:" in text and "%(" not in text  # fully rendered


def test_validate_combined_script(tmp_path):
    from waveformml_tpu.config import Config
    from waveformml_tpu.datasets.pulse_dataset import PulseDataset2D
    from waveformml_tpu.datasets.synthetic import write_classification_dirs

    write_classification_dirs(str(tmp_path / "data"), ["A", "B"], n_files=2,
                              events_per_file=15, n_samples=8, seed=13)
    cfg = Config({
        "system_config": {"model_name": "m", "model_base_path": str(tmp_path / "model"),
                          "n_samples": 8, "type_names": ["A", "B"]},
        "dataset_config": {"base_path": str(tmp_path / "data"),
                           "paths": ["A", "B"], "data_prep": "shuffle",
                           "shuffled_size": 10, "dataset_params": {}},
    })
    ds = PulseDataset2D(cfg, "train", 30)
    ds.write_shuffled()
    r = _run("ValidateCombined.py", ds.data_dir)
    assert r.returncode == 0, r.stderr + r.stdout
    assert "OK" in r.stdout


def test_compare_gains_script(tmp_path):
    from waveformml_tpu.io.sql import write_synthetic_caldb

    db1 = tmp_path / "cal1.db"
    db2 = tmp_path / "cal2.db"
    write_synthetic_caldb(str(db1), "testcal", seed=1)
    write_synthetic_caldb(str(db2), "testcal", seed=2)
    r = _run("CompareGains.py", str(db1), str(db2), "testcal")
    assert r.returncode == 0, r.stderr
    assert "max diff is det" in r.stdout


def test_compare_sim_cal_curve_script(tmp_path):
    from waveformml_tpu.io.sql import write_synthetic_caldb

    db1 = tmp_path / "cal1.db"
    db2 = tmp_path / "cal2.db"
    write_synthetic_caldb(str(db1), "simcal", seed=1)
    write_synthetic_caldb(str(db2), "refcal", seed=1)
    r = _run("CompareSimCalCurve.py", str(db1), "simcal", str(db2), "refcal",
             "--seg", "0")
    assert r.returncode == 0, r.stderr
    assert "normed diff" in r.stdout


def test_add_attr_script(tmp_path):
    import h5py

    ref = tmp_path / "ref.h5"
    tgt = tmp_path / "tgt.h5"
    for p, runtime in ((ref, 123.0), (tgt, 0.0)):
        with h5py.File(p, "w") as h5:
            h5.create_dataset("PhysPulse", data=np.zeros(4))
            h5["PhysPulse"].attrs.create("runtime", runtime)
    r = _run("AddAttr.py", str(ref), str(tgt))
    assert r.returncode == 0, r.stderr
    with h5py.File(tgt) as h5:
        assert h5["PhysPulse"].attrs["runtime"] == 123.0


# ---------------------------------------------------------------------------------
# round-2 coverage: the remaining scripts (VERDICT #7)
# ---------------------------------------------------------------------------------

def _import_script(name):
    """Import a scripts/ module in-process (for monkeypatching subprocess)."""
    import importlib

    if SCRIPTS not in sys.path:
        sys.path.insert(0, SCRIPTS)
    return importlib.import_module(name)


def test_plot_model_weights(tmp_path):
    import orbax.checkpoint as ocp

    ckpt = tmp_path / "model.ckpt"
    params = {"dense_0": {"kernel": np.random.default_rng(0).random((8, 4)),
                          "bias": np.zeros(4)},
              "conv": {"kernel": np.random.default_rng(1).random((3, 3, 2, 4))}}
    ocp.PyTreeCheckpointer().save(str(ckpt), {"params": params})
    out = tmp_path / "plots"
    r = _run("PlotModelWeights.py", str(ckpt), "-o", str(out))
    assert r.returncode == 0, r.stderr
    pngs = list(out.glob("*.png"))
    assert len(pngs) >= 2, r.stdout  # both >=2D tensors plotted


def test_compare_pmt_wf(tmp_path):
    from waveformml_tpu.datasets.synthetic import write_wfpair_cal

    f1 = tmp_path / "a_WFPairSim.h5"
    f2 = tmp_path / "b_WFPairSim.h5"
    write_wfpair_cal(str(f1), n_events=120, seed=0)
    write_wfpair_cal(str(f2), n_events=120, seed=1)
    out = tmp_path / "cmp.png"
    r = _run("Compare_PMT_WF.py", str(f1), str(f2),
             "-ch", "0", "1", "2", "3", "4", "5", "-o", str(out))
    assert r.returncode == 0, r.stderr
    assert out.exists()


def test_compare_calibration_curves(tmp_path):
    from waveformml_tpu.io.sql import write_synthetic_caldb

    db1 = tmp_path / "cal1.db"
    db2 = tmp_path / "cal2.db"
    write_synthetic_caldb(str(db1), "calA", seed=1)
    write_synthetic_caldb(str(db2), "calB", seed=2)
    out = tmp_path / "plots"
    r = _run("CompareCalibrationCurves.py", str(db1), "calA", str(db2), "calB",
             "-ch", "0", "1", "-o", str(out))
    assert r.returncode == 0, r.stderr
    assert list(out.glob("compare_atten_ch*.png")), r.stdout


def test_analyze_waveforms(tmp_path):
    from waveformml_tpu.datasets.synthetic import write_waveform_pair_sim

    for cls in ("A", "B"):
        d = tmp_path / cls
        os.makedirs(d)
        write_waveform_pair_sim(str(d / f"{cls}0_WaveformPairSim.h5"),
                                n_events=25, n_samples=16,
                                seed=ord(cls))
    out = tmp_path / "analysis"
    r = _run("AnalyzeWaveforms.py", str(tmp_path / "A"), str(tmp_path / "B"),
             "--type", "2d", "-o", str(out))
    assert r.returncode == 0, r.stderr
    assert list(out.glob("*.npz")) and list(out.glob("*.png")), r.stdout


def test_eval_wfparams(tmp_path):
    from waveformml_tpu.io.sql import write_synthetic_caldb

    ranges = tmp_path / "ranges.json"
    ranges.write_text(json.dumps({"lambda": [1500, 2000]}))
    db = tmp_path / "wf.db"
    r = _run("GenWFParamConfig.py", str(ranges), str(db), "-n", "2",
             "-o", str(tmp_path / "cfgs"))
    assert r.returncode == 0, r.stderr
    refdb = tmp_path / "ref.db"
    write_synthetic_caldb(str(refdb), "refcal", seed=0)
    # one sim caldb per registered param set, named <name>.db with group <name>
    for name in ("WaveCal1", "WaveCal2"):
        write_synthetic_caldb(str(tmp_path / f"{name}.db"), name,
                              seed=int(name[-1]))
    pattern = str(tmp_path / "{name}.db")
    r = _run("EvalWFParams.py", str(db), str(refdb), "refcal",
             "--sim_caldb_pattern", pattern)
    assert r.returncode == 0, r.stderr + r.stdout
    assert "evaluated" in r.stdout
    conn = sqlite3.connect(db)
    n = conn.execute("SELECT COUNT(*) FROM curve_diffs").fetchone()[0]
    assert n > 0
    # --best reporting path reads the stored diffs back
    r = _run("EvalWFParams.py", str(db), str(refdb), "refcal", "-b", "1",
             "--seg", "0")
    assert r.returncode == 0, r.stderr
    assert "best fits" in r.stdout


def test_run_occlusion_study_commands(monkeypatch, tmp_path):
    """RunOcclusionStudy drives Evaluate.py once per feature index with -oc n,
    forwarding calgroup and extra args (ref: scripts/RunOcclusionStudy.py)."""
    mod = _import_script("RunOcclusionStudy")
    calls = []
    monkeypatch.setattr(mod.subprocess, "call", lambda a: calls.append(a) or 0)
    cfg = tmp_path / "c.json"
    cfg.write_text("{}")
    assert mod.main([str(cfg), "ckpt", "3", "-c", "mycal", "--", "-nt", "2"]) == 0
    assert len(calls) == 3
    for n, argl in enumerate(calls):
        assert argl[1].endswith("Evaluate.py")
        assert argl[2:4] == [str(cfg), "ckpt"]
        assert ["-oc", str(n)] == argl[argl.index("-oc"):argl.index("-oc") + 2]
        assert "mycal" in argl


def test_write_prediction_batch_commands(monkeypatch, tmp_path):
    mod = _import_script("WritePredictionBatch")
    calls = []
    monkeypatch.setattr(mod.subprocess, "call", lambda a: calls.append(a) or 0)
    for n in ("x_WFCalSE.h5", "y_WFCalSE.h5", "skip.txt"):
        (tmp_path / n).write_bytes(b"")
    assert mod.main([str(tmp_path), "cfg.json", "ckpt", "-w", "z"]) == 0
    assert len(calls) == 2  # only the .h5 files
    assert calls[0][1].endswith("WritePredictions.py")
    assert calls[0][2].endswith("x_WFCalSE.h5")
    assert calls[0][-2:] == ["-w", "z"]  # extra args forwarded


def test_eval_occlusion_study(tmp_path):
    """End of the occlusion pipeline: per-index tfevents → loss-vs-index plot
    (ref: scripts/EvalOcclusionStudy.py:11-69)."""
    from waveformml_tpu.utils.tb import TBLogger

    losses = {0: 0.5, 1: 0.25}
    for idx, loss in losses.items():
        lg = TBLogger(str(tmp_path / f"occlude_{idx}"))
        lg.log_scalar("test_loss", loss + 0.1, 0)
        lg.log_scalar("test_loss", loss, 1)  # best value
        lg.close()
    r = _run("EvalOcclusionStudy.py", str(tmp_path), "2")
    assert r.returncode == 0, r.stderr + r.stdout
    assert "ind 0 is 0.5" in r.stdout and "ind 1 is 0.25" in r.stdout
    assert (tmp_path / "occlude_results_test_loss.png").exists()


def test_eval_best_trials(monkeypatch, tmp_path):
    """EvalBestTrials ranks the study.db and evaluates each top trial's best
    checkpoint (ref: scripts/EvalBestTrials.py:45-92)."""
    from waveformml_tpu.config import Config, save_config
    from waveformml_tpu.optimization.hpo import create_study

    cfg = Config({
        "run_config": {"exp_name": "sweep", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "m", "n_samples": 8, "n_type": 2,
                          "type_names": ["a"],
                          "model_base_path": str(tmp_path / "model")},
        "net_config": {"criterion_class": "CrossEntropyLoss",
                       "criterion_params": [], "imports": [],
                       "net_type": "2DConvolution", "net_class": "SubMPSDNet",
                       "hparams": {"out_planes": 4, "n_lin": 1,
                                   "conv_params": {"kernel_size": 3, "n_conv": 1,
                                                   "n_point": 1,
                                                   "conv_position": 1,
                                                   "version": 2}}},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDataset2D",
                           "dataset_params": {}, "n_train": 1, "n_validate": 1},
    })
    cfg_path = tmp_path / "config.json"
    save_config(cfg, str(cfg_path))
    study_dir = tmp_path / "model" / "m" / "studies" / "sweep"
    os.makedirs(study_dir)
    study = create_study("sweep", storage=str(study_dir / "study.db"))
    study.optimize(lambda t: t.suggest_float("lr", 0.0, 1.0), n_trials=3)
    # best trial artifacts: a config + an orbax-style checkpoint dir name
    numbers = [n for n, _ in sorted(
        ((t.number, t.value) for t in study.get_trials()), key=lambda x: x[1])]
    best = numbers[0]
    trial_dir = study_dir / f"trial_{best}"
    os.makedirs(trial_dir / "ckpts")
    (trial_dir / "ckpts" / "epoch=1-val_loss=0.100.ckpt").mkdir()
    save_config(cfg, str(trial_dir / "config.json"))

    mod = _import_script("EvalBestTrials")
    calls = []
    monkeypatch.setattr(mod.subprocess, "call", lambda a: calls.append(a) or 0)
    assert mod.main([str(cfg_path), "-n", "2", "-c", "g"]) == 0
    assert len(calls) == 1  # only the trial with artifacts is evaluated
    assert calls[0][1].endswith("Evaluate.py")
    assert calls[0][2].endswith("config.json")
    assert calls[0][3].endswith(".ckpt")
    assert "-c" in calls[0] and "g" in calls[0]


def test_write_zandclass_end_to_end(tmp_path):
    """Full BASELINE config-4 pipeline: z model + 5-class segment classifier →
    streamed PhysPulse output with XML sidecar (ref: scripts/WriteZAndClass.py
    + PredictionWriter.py:277-362)."""
    import h5py
    import jax

    from waveformml_tpu.config import Config, save_config
    from waveformml_tpu.datasets.hdf5_dataset import FileBlock
    from waveformml_tpu.datasets.synthetic import write_wfpair_cal
    from waveformml_tpu.engineering.tasks import LitSegClassifier, LitZ
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.io.sql import write_synthetic_caldb
    from waveformml_tpu.parallel.mesh import make_mesh

    def base_cfg(run_class, model_name, extra_net):
        return Config({
            "run_config": {"exp_name": model_name, "run_class": run_class,
                           "imports": []},
            "system_config": {"model_name": model_name, "n_samples": 65,
                              "n_type": 5,
                              "type_names": ["io", "rc", "nc", "in", "mu"],
                              "model_base_path": str(tmp_path / "model"),
                              "half_precision": 0},
            "net_config": {"criterion_params": [], "imports": [],
                           "net_type": "2DConvolution", **extra_net},
            "optimize_config": {"total_epoch": 1, "lr": 0.01,
                                "validation_freq": 1, "imports": [],
                                "optimizer_class": "optim.SGD",
                                "optimizer_params": {}},
            "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                               "dataset_class": "PulseDatasetWFPair",
                               "dataset_params": {}, "n_train": 8,
                               "n_validate": 4},
        })

    rng = np.random.default_rng(0)
    coords = np.array([[1, 1, 0], [2, 2, 1]], dtype=np.int32)
    feats = rng.random((2, 130)).astype(np.float32)

    zcfg = base_cfg("LitZ", "z", {
        "criterion_class": "L1Loss", "algorithm": "conv",
        "hparams": {"conv": {"kernel_size": 3, "n_layers": 2},
                    "point": {"pointwise_layers": 1}}})
    ztask = LitZ(zcfg)
    ztr = Trainer(zcfg, ztask, mesh=make_mesh(jax.devices()[:1]), seed=0)
    ztr._ensure_state(FileBlock(coords, feats,
                                rng.random(2).astype(np.float32), {}))
    zckpt = str(tmp_path / "z.ckpt")
    ztr.save_checkpoint(zckpt)
    zcfg_path = str(tmp_path / "z.json")
    save_config(zcfg, zcfg_path)

    ccfg = base_cfg("LitSegClassifier", "cls", {
        "criterion_class": "CrossEntropyLoss", "net_class": "SPConvPreserveNet",
        "hparams": {"n_conv": 1,
                    "conv_params": {"pointwise_factor": 0, "pad_factor": 1.0,
                                    "size_factor": 3, "stride_factor": 1.2,
                                    "n_expansion": 1, "expansion_factor": 1.2,
                                    "version": 1, "n_contraction": 1}}})
    ctask = LitSegClassifier(ccfg)
    ctr = Trainer(ccfg, ctask, mesh=make_mesh(jax.devices()[:1]), seed=1)
    ctr._ensure_state(FileBlock(coords, feats,
                                np.zeros(2, np.int64), {}))
    cckpt = str(tmp_path / "cls.ckpt")
    ctr.save_checkpoint(cckpt)
    ccfg_path = str(tmp_path / "cls.json")
    save_config(ccfg, ccfg_path)

    caldb = str(tmp_path / "cal.db")
    write_synthetic_caldb(caldb, "testcal", seed=2)
    input_path = str(tmp_path / "run1_WFCalFilteredSE.h5")
    write_wfpair_cal(input_path, n_events=40, seed=4)

    env = {**ENV, "PROSPECT_CALDB": caldb}
    r = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "WriteZAndClass.py"),
         input_path, zcfg_path, zckpt, ccfg_path, cckpt, "-c", "testcal",
         "-r", "64"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr + r.stdout
    out_path = str(tmp_path / "run1_Phys.h5")
    assert os.path.exists(out_path)
    with h5py.File(out_path) as h5:
        rec = h5["PhysPulse"][()]
        assert rec.shape[0] > 0
        assert np.isfinite(rec["E"]).all()
        # seg index derived from input coords
        with h5py.File(input_path) as h5in:
            cin = h5in["WaveformPairCal"]["coord"][()]
        np.testing.assert_array_equal(rec["seg"], cin[:, 0] + cin[:, 1] * 14)
    xml_path = out_path + ".xml"
    assert os.path.exists(xml_path)
    text = open(xml_path).read()
    assert "ML_z_placement" in text


def test_analyze_waveforms_det_type(tmp_path):
    """AnalyzeWaveforms --type det reads DetPulseCoord phys-pulse files."""
    import h5py

    rng = np.random.default_rng(4)
    for cls in ("A", "B"):
        d = tmp_path / cls
        os.makedirs(d)
        n = 40
        rec = np.zeros(n, dtype=np.dtype([("coord", np.int32, (3,)),
                                          ("pulse", np.float32, (7,))]))
        rec["coord"][:, 0] = rng.integers(0, 14, n)
        rec["coord"][:, 1] = rng.integers(0, 11, n)
        rec["coord"][:, 2] = np.sort(rng.integers(0, 12, n))
        rec["pulse"] = rng.random((n, 7), dtype=np.float32)
        with h5py.File(str(d / f"{cls}0_DetCoordSim.h5"), "w") as h5:
            h5.create_dataset("DetPulseCoord", data=rec)
    out = tmp_path / "analysis"
    r = _run("AnalyzeWaveforms.py", str(tmp_path / "A"), str(tmp_path / "B"),
             "--type", "det", "-o", str(out))
    assert r.returncode == 0, r.stderr + r.stdout
    assert list(out.glob("*.npz")), r.stdout


def test_validate_combined_checks_compound_label_column(tmp_path, rng):
    """Compound-layout combined files carry the per-row label field; the
    validator must replay it from the sources and fail on corruption
    (ref ValidateCombined asserts the merged contents match the sources)."""
    import h5py

    from waveformml_tpu.config import Config
    from waveformml_tpu.registry import retrieve_class

    n, n_samples = 30, 8
    dt = np.dtype([("coord", np.int32, (3,)),
                   ("waveform", np.float32, (2 * n_samples,)),
                   ("z", np.float32)])
    for i, name in enumerate(["A", "B"]):
        d = tmp_path / "data" / name
        os.makedirs(d)
        rec = np.zeros(n, dtype=dt)
        rec["coord"][:, 0] = rng.integers(0, 14, n)
        rec["coord"][:, 1] = rng.integers(0, 11, n)
        rec["coord"][:, 2] = np.sort(rng.integers(0, 10, n))
        rec["waveform"] = rng.random((n, 2 * n_samples), dtype=np.float32)
        rec["z"] = rng.random(n, dtype=np.float32) * (i + 1)
        with h5py.File(str(d / f"f{i}_WaveformPairZSim.h5"), "w") as h5:
            h5.create_dataset("WaveformPairsWithZ", data=rec)
            h5["WaveformPairsWithZ"].attrs.create("nevents", np.array([10.0]))

    cfg = Config({
        "system_config": {"model_name": "m", "n_samples": n_samples,
                          "model_base_path": str(tmp_path / "model"),
                          "type_names": ["A", "B"]},
        "dataset_config": {"base_path": str(tmp_path / "data"),
                           "paths": ["A", "B"], "data_prep": "shuffle",
                           "shuffled_size": 10, "dataset_params": {}},
    })
    ds = retrieve_class("PulseDataset2DWithZ")(cfg, "train", 20)
    ds.write_shuffled()
    r = _run("ValidateCombined.py", ds.data_dir, "--dataset",
             "WaveformPairsWithZ", "--coord", "coord", "--feat", "waveform")
    assert r.returncode == 0, r.stderr + r.stdout
    assert "OK" in r.stdout

    # corrupt ONLY the label column of one combined file: must now fail
    from pathlib import Path

    combined = sorted(Path(ds.data_dir).glob("Combined_*.h5"))[0]
    with h5py.File(combined, "r+") as h5:
        rec = h5["WaveformPairsWithZ"][()]
        rec["z"] = rec["z"][::-1].copy()
        del h5["WaveformPairsWithZ"]
        h5.create_dataset("WaveformPairsWithZ", data=rec)
    r2 = _run("ValidateCombined.py", ds.data_dir, "--dataset",
              "WaveformPairsWithZ", "--coord", "coord", "--feat", "waveform")
    assert r2.returncode != 0
    assert "incorrect labels" in (r2.stderr + r2.stdout)

    # shift ONE event boundary in the batch-index column (coords/waveforms
    # stay row-identical, event count unchanged): rows now belong to the
    # wrong events — the per-event row-count replay must catch this
    with h5py.File(combined, "r+") as h5:
        rec = h5["WaveformPairsWithZ"][()]
        rec["z"] = rec["z"][::-1].copy()  # undo the label corruption
        ev = rec["coord"][:, 2]
        boundaries = np.flatnonzero(np.diff(ev)) + 1
        b = next(i for i in boundaries if np.sum(ev == ev[i]) >= 2)
        rec["coord"][b, 2] = ev[b - 1]
        del h5["WaveformPairsWithZ"]
        h5.create_dataset("WaveformPairsWithZ", data=rec)
    r3 = _run("ValidateCombined.py", ds.data_dir, "--dataset",
              "WaveformPairsWithZ", "--coord", "coord", "--feat", "waveform")
    assert r3.returncode != 0
    assert "event boundaries are corrupted" in (r3.stderr + r3.stdout)
