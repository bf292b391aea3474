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
