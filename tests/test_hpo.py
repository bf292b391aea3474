"""Tests for the native HPO engine (waveformml_tpu/optimization/hpo.py).

Covers the Optuna-subset semantics the reference relies on
(ref: src/optimization/ModelOptimization.py:150-273): suggest_* distributions,
TPE sampling quality vs random, MedianPruner behavior, sqlite persistence +
load_if_exists resume, config-path hyperparameter application, and an e2e
``main.py <cfg> -oc <opt.json> -p`` study driving real training trials.
"""
import json
import math
import os

import numpy as np
import pytest

from waveformml_tpu.config import Config
from waveformml_tpu.optimization.hpo import (
    MedianPruner, ModelOptimization, NopPruner, OptunaDB, RandomSampler,
    Study, TPESampler, Trial, TrialPruned, create_study)


# ---------------------------------------------------------------------------------
# samplers
# ---------------------------------------------------------------------------------

def test_suggest_distributions_bounds_and_types():
    study = create_study(sampler=RandomSampler(seed=7))
    ints, floats, logs, cats = [], [], [], []
    for i in range(400):
        t = Trial(study, i)
        ints.append(t.suggest_int("i", 2, 9))
        floats.append(t.suggest_float("f", -1.5, 2.5))
        logs.append(t.suggest_float("lg", 1e-5, 1e-1, log=True))
        cats.append(t.suggest_categorical("c", ["a", "b", "c"]))
    assert all(isinstance(v, int) and 2 <= v <= 9 for v in ints)
    assert set(ints) == set(range(2, 10))        # all values reachable
    assert all(-1.5 <= v <= 2.5 for v in floats)
    assert all(1e-5 <= v <= 1e-1 for v in logs)
    # log-uniform: median near geometric mean sqrt(1e-5*1e-1)=1e-3, far from
    # the arithmetic midpoint 0.05 a uniform sampler would produce
    assert 2e-4 < float(np.median(logs)) < 5e-3
    assert set(cats) == {"a", "b", "c"}


def test_suggest_is_stable_within_a_trial():
    """Re-suggesting the same name in one trial returns the cached value."""
    study = create_study(sampler=RandomSampler(seed=0))
    t = Trial(study, 0)
    v1 = t.suggest_float("lr", 1e-4, 1e-1, log=True)
    v2 = t.suggest_float("lr", 1e-4, 1e-1, log=True)
    assert v1 == v2
    assert t.suggest_loguniform("lr", 1e-4, 1e-1) == v1
    assert t.suggest_uniform("u", 0, 1) == t.params["u"]


def _run_study(sampler, n_trials=40):
    """Deterministic toy objective: quadratic bowl at x=0.31, log-scaled lr."""
    study = create_study(sampler=sampler)

    def objective(trial):
        x = trial.suggest_float("x", 0.0, 1.0)
        lr = trial.suggest_float("lr", 1e-5, 1e-1, log=True)
        return (x - 0.31) ** 2 + (math.log10(lr) - (-3)) ** 2 * 0.01

    study.optimize(objective, n_trials=n_trials)
    return study


def test_tpe_beats_random_on_toy_objective():
    """After the startup phase, TPE should concentrate near the optimum: the
    mean of its post-startup trial values beats random sampling's (averaged
    over seeds so a lucky random draw can't flip the comparison)."""
    tpe_tail, rnd_tail, tpe_best = [], [], []
    for seed in range(5):
        tpe = _run_study(TPESampler(seed=seed, n_startup_trials=10))
        rnd = _run_study(RandomSampler(seed=seed))
        tpe_tail += [t.value for t in tpe.get_trials()[10:]]
        rnd_tail += [t.value for t in rnd.get_trials()[10:]]
        tpe_best.append(min(t.value for t in tpe.get_trials()))
    assert float(np.mean(tpe_tail)) < float(np.mean(rnd_tail))
    # and TPE finds genuinely good points
    assert float(np.median(tpe_best)) < 0.01


def test_tpe_categorical_prefers_good_choice():
    study = create_study(sampler=TPESampler(seed=1, n_startup_trials=8))

    def objective(trial):
        c = trial.suggest_categorical("c", ["good", "bad"])
        return 0.1 if c == "good" else 1.0

    study.optimize(objective, n_trials=60)
    tail = [t.params["c"] for t in study.get_trials()[20:]]
    assert tail.count("good") > tail.count("bad")


# ---------------------------------------------------------------------------------
# pruners
# ---------------------------------------------------------------------------------

def _completed_trial(study, number, curve):
    t = Trial(study, number)
    t.params = {"x": number}
    for step, v in enumerate(curve):
        t.intermediate_values[step] = v
    t.value = curve[-1]
    t.state = "COMPLETE"
    study._persist_trial(t)


def test_median_pruner_semantics():
    pruner = MedianPruner(n_startup_trials=2, n_warmup_steps=2, interval_steps=1)
    study = create_study(pruner=pruner)
    # three completed peers with best-so-far 0.5 at step>=2
    for n in range(3):
        _completed_trial(study, n, [1.0, 0.7, 0.5, 0.45])

    bad = Trial(study, 10)
    bad.intermediate_values = {0: 5.0}           # warmup: never pruned
    assert not pruner.prune(study, bad)
    bad.intermediate_values = {0: 5.0, 1: 5.0, 2: 5.0}   # worse than median 0.5
    assert pruner.prune(study, bad)

    good = Trial(study, 11)
    good.intermediate_values = {0: 1.0, 1: 0.6, 2: 0.3}  # better than median
    assert not pruner.prune(study, good)


def test_median_pruner_interval_and_startup():
    pruner = MedianPruner(n_startup_trials=5, n_warmup_steps=2, interval_steps=3)
    study = create_study(pruner=pruner)
    for n in range(3):       # fewer than n_startup_trials peers
        _completed_trial(study, n, [1.0, 0.7, 0.5])
    t = Trial(study, 9)
    t.intermediate_values = {0: 9.0, 1: 9.0, 2: 9.0}
    assert not pruner.prune(study, t)            # startup not reached
    for n in range(3, 6):
        _completed_trial(study, n, [1.0, 0.7, 0.5])
    assert pruner.prune(study, t)                # step 2 == warmup, aligned
    t.intermediate_values[3] = 9.0               # step 3: (3-2) % 3 != 0
    assert not pruner.prune(study, t)


def test_nop_pruner_never_prunes():
    study = create_study(pruner=NopPruner())
    t = Trial(study, 0)
    t.intermediate_values = {i: 100.0 for i in range(20)}
    assert not t.should_prune()


def test_optimize_records_pruned_trials():
    study = create_study()

    def objective(trial):
        trial.report(1.0, 0)
        if trial.number % 2 == 0:
            raise TrialPruned()
        return 0.5

    study.optimize(objective, n_trials=4)
    states = [t.state for t in study.get_trials()]
    assert states == ["PRUNED", "COMPLETE", "PRUNED", "COMPLETE"]
    pruned = study.get_trials()[0]
    assert pruned.value == 1.0                   # last reported intermediate


# ---------------------------------------------------------------------------------
# sqlite persistence / resume
# ---------------------------------------------------------------------------------

def test_sqlite_persistence_and_resume(tmp_path):
    db = str(tmp_path / "study.db")
    storage = "sqlite:///" + db

    s1 = Study("exp", storage=storage, sampler=RandomSampler(seed=0))
    s1.optimize(lambda t: t.suggest_float("x", 0, 1) ** 2, n_trials=3)
    assert os.path.exists(db)
    assert len(s1.get_trials()) == 3

    # second instance resumes: sees prior trials, numbering continues
    s2 = Study("exp", storage=storage, sampler=RandomSampler(seed=1),
               load_if_exists=True)
    assert len(s2.get_trials()) == 3
    s2.optimize(lambda t: t.suggest_float("x", 0, 1) ** 2, n_trials=2)
    trials = s2.get_trials()
    assert [t.number for t in trials] == [0, 1, 2, 3, 4]
    assert all(t.state == "COMPLETE" for t in trials)
    # intermediate values and params round-trip through sqlite
    assert all("x" in t.params for t in trials)
    best = s2.best_trial
    assert best.value == min(t.value for t in trials)

    # load_if_exists=False on a populated study raises (optuna semantics)
    with pytest.raises(RuntimeError):
        Study("exp", storage=storage, load_if_exists=False)


def test_optunadb_reader(tmp_path):
    db = str(tmp_path / "study.db")
    s = Study("exp", storage="sqlite:///" + db, sampler=RandomSampler(seed=3))
    values = iter([0.5, 0.1, 0.9, 0.3])
    s.optimize(lambda t: next(values), n_trials=4)
    reader = OptunaDB(db)
    assert reader.get_best_trial() == 1
    top = reader.get_top_trials(2)
    assert top == [(1, 0.1), (3, 0.3)]
    reader.close()


# ---------------------------------------------------------------------------------
# ModelOptimization config-path semantics
# ---------------------------------------------------------------------------------

def _mo_config(tmp_path):
    return Config({
        "run_config": {"exp_name": "hpo_exp", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "hpo_m", "n_samples": 8, "n_type": 2,
                          "type_names": ["a", "b"],
                          "model_base_path": str(tmp_path / "model"),
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "CrossEntropyLoss", "criterion_params": [],
                       "imports": [], "net_class": "DenseConvNet",
                       "net_type": "2DConvolution",
                       "hparams": {"n_conv": 1, "n_lin": 1, "out_planes": 2,
                                   "conv_params": {"size_factor": 3, "pad_factor": 1.0}}},
        "optimize_config": {"total_epoch": 2, "lr": 0.05, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {"momentum": 0.9},
                            "scheduler_class": "lr_scheduler.ExponentialLR",
                            "scheduler_params": {"gamma": 0.97}},
        "dataset_config": {"mode": "path", "imports": [],
                           "base_path": str(tmp_path / "data"),
                           "paths": ["a", "b"], "dataset_class": "PulseDataset2D",
                           "dataset_params": {},
                           "dataloader_params": {"batch_size": 1, "num_workers": 0},
                           # n_* are per-directory: with 3 files × 30 events
                           # per class dir, each split takes one file per dir
                           "n_train": 30, "n_validate": 20, "n_test": 20},
    })


def test_modify_config_path_addressing(tmp_path):
    cfg = _mo_config(tmp_path)
    opt = Config({"hyperparameters": {
        "/optimize_config/lr": [1e-4, 1e-1],              # ratio>100 → log
        "/optimize_config/optimizer_params/momentum": [0.5, 0.99],
        "/net_config/hparams/out_planes": [2, 8],         # int
        "/net_config/hparams/n_lin": [1, 2, 3],           # >2 → categorical
        "/optimize_config/optimizer_params/nesterov": True,  # bool
        "/net_config/hparams/n_conv": {"val": [1, 2]},    # dict categorical
    }})
    mo = ModelOptimization(opt, cfg, str(tmp_path / "model"))
    study = create_study(sampler=RandomSampler(seed=0))
    trial = Trial(study, 0)
    mo.modify_config(trial)
    assert 1e-4 <= cfg.optimize_config.lr <= 1e-1
    assert 0.5 <= cfg.optimize_config.optimizer_params.momentum <= 0.99
    assert cfg.net_config.hparams.out_planes in range(2, 9)
    assert cfg.net_config.hparams.n_lin in (1, 2, 3)
    assert isinstance(cfg.optimize_config.optimizer_params.nesterov, bool)
    assert cfg.net_config.hparams.n_conv in (1, 2)
    # log detection: the lr distribution was registered as logfloat
    assert trial.params["lr"] == cfg.optimize_config.lr

    # bad path raises IOError like the reference
    bad = Config({"hyperparameters": {"/no_such/section": [0, 1]}})
    with pytest.raises(IOError):
        ModelOptimization(bad, cfg, str(tmp_path / "model"))

    # missing hyperparameters section raises IOError
    with pytest.raises(IOError):
        ModelOptimization(Config({}), cfg, str(tmp_path / "model"))

    # malformed dict bounds raise ValueError
    opt2 = Config({"hyperparameters": {"/optimize_config/lr": {"min": 0}}})
    mo2 = ModelOptimization(opt2, cfg, str(tmp_path / "model"))
    with pytest.raises(ValueError):
        mo2.modify_config(Trial(study, 1))


# ---------------------------------------------------------------------------------
# e2e: main.py -oc opt.json -p drives real training trials
# ---------------------------------------------------------------------------------

def test_hpo_end_to_end_via_main(tmp_path):
    from waveformml_tpu.datasets.synthetic import write_classification_dirs

    write_classification_dirs(str(tmp_path / "data"), ["a", "b"], n_files=3,
                              events_per_file=30, n_samples=8, seed=0)
    cfg = _mo_config(tmp_path)
    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg.to_dict(), f)
    opt_path = str(tmp_path / "opt.json")
    with open(opt_path, "w") as f:
        json.dump({"hyperparameters": {"/optimize_config/lr": [1e-3, 1e-1]},
                   "sampler": "RandomSampler", "sampler_params": {"seed": 0},
                   "optimize_args": {"n_trials": 3}}, f)

    import main as main_mod

    rc = main_mod.main([cfg_path, "-oc", opt_path, "-p", "--max_epochs", "2"])
    assert rc == 0

    study_dir = os.path.join(str(tmp_path / "model"), "hpo_m", "studies", "hpo_exp")
    assert os.path.exists(os.path.join(study_dir, "study.db"))
    results = json.load(open(os.path.join(study_dir, "trial_results.json")))
    assert results["n_finished_trials"] == 3
    assert math.isfinite(results["best_trial"])
    assert "lr" in results["best_trial_params"]
    # per-trial artifacts: config + checkpoint under trial_<n>
    reader = OptunaDB(os.path.join(study_dir, "study.db"))
    best_n = reader.get_best_trial()
    reader.close()
    trial_dir = os.path.join(study_dir, f"trial_{best_n}")
    assert os.path.exists(os.path.join(trial_dir, "config.json"))
    from waveformml_tpu.utils.util import retrieve_best_checkpoint

    assert retrieve_best_checkpoint(trial_dir) is not None

    # resume: a second run with 2 more trials continues numbering in the db
    with open(opt_path, "w") as f:
        json.dump({"hyperparameters": {"/optimize_config/lr": [1e-3, 1e-1]},
                   "sampler": "RandomSampler", "sampler_params": {"seed": 1},
                   "optimize_args": {"n_trials": 2}}, f)
    rc = main_mod.main([cfg_path, "-oc", opt_path, "--max_epochs", "1"])
    assert rc == 0
    reader = OptunaDB(os.path.join(study_dir, "study.db"))
    top = reader.get_top_trials(10)
    reader.close()
    assert len(top) == 5                          # 3 + 2 resumed trials


def test_modify_config_colliding_leaf_names(tmp_path):
    """Two hyperparameter paths sharing a leaf must sample independently
    (the reference keys suggestions by leaf alone and collapses them)."""
    from waveformml_tpu.optimization.hpo import ModelOptimization

    cfg = Config({
        "run_config": {"exp_name": "c", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "c", "n_samples": 8, "n_type": 2,
                          "type_names": ["a"], "model_base_path": str(tmp_path),
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"dropout": 0.0, "imports": []},
        "optimize_config": {"dropout": 0.0, "lr": 0.01, "imports": [],
                            "total_epoch": 1, "validation_freq": 1,
                            "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDataset2D",
                           "dataset_params": {}, "n_train": 2},
    })
    opt = Config({"hyperparameters": {
        "/net_config/dropout": [0.0, 0.1],
        "/optimize_config/dropout": [0.8, 0.9],
    }})
    mo = ModelOptimization(opt, cfg, str(tmp_path / "model"))
    study = create_study(sampler=RandomSampler(seed=0))
    trial = Trial(study, 0)
    mo.modify_config(trial)
    assert 0.0 <= cfg.net_config.dropout <= 0.1
    assert 0.8 <= cfg.optimize_config.dropout <= 0.9
    assert set(trial.params) == {"/net_config/dropout",
                                 "/optimize_config/dropout"}


def test_sqlite_storage_isolates_studies(tmp_path):
    """Two studies sharing one sqlite file must not overwrite each other's
    trials (composite (study_name, number) key)."""
    db = f"sqlite:///{tmp_path}/shared.db"
    a = create_study(study_name="A", storage=db, load_if_exists=True)
    b = create_study(study_name="B", storage=db, load_if_exists=True)
    a.optimize(lambda t: 1.25 + t.suggest_float("x", 0, 1) * 0, n_trials=1)
    b.optimize(lambda t: 2.5 + t.suggest_float("x", 0, 1) * 0, n_trials=1)
    a2 = create_study(study_name="A", storage=db, load_if_exists=True)
    b2 = create_study(study_name="B", storage=db, load_if_exists=True)
    assert [t.value for t in a2.get_trials()] == [1.25]
    assert [t.value for t in b2.get_trials()] == [2.5]


def test_sqlite_storage_migrates_old_schema(tmp_path):
    """A study.db created before the composite primary key must migrate in
    place and keep its trials readable."""
    import sqlite3

    path = str(tmp_path / "old.db")
    conn = sqlite3.connect(path)
    conn.execute(
        """CREATE TABLE trials (
               number INTEGER PRIMARY KEY, study_name TEXT, state TEXT,
               value REAL, params TEXT, intermediate TEXT,
               datetime_start TEXT, datetime_complete TEXT)""")
    conn.execute("INSERT INTO trials VALUES (0, 'old', 'COMPLETE', 3.5, "
                 "'{}', '{}', NULL, NULL)")
    conn.commit()
    conn.close()
    s = create_study(study_name="old", storage=f"sqlite:///{path}",
                     load_if_exists=True)
    trials = s.get_trials()
    assert len(trials) == 1 and trials[0].value == 3.5
    s.optimize(lambda t: 1.0 + t.suggest_float("x", 0, 1) * 0, n_trials=1)
    assert sorted(t.value for t in s.get_trials()) == [1.0, 3.5]


def test_concurrent_trial_reservation_no_clobber(tmp_path):
    """Two Study handles on one sqlite file (two processes resuming a study)
    must never allocate the same trial number: the RUNNING row is reserved
    with a plain INSERT inside an IMMEDIATE transaction, so a finished
    trial can't be overwritten by a concurrent claimant's upsert."""
    db = str(tmp_path / "study.db")
    storage = "sqlite:///" + db
    a = Study("exp", storage=storage, sampler=RandomSampler(seed=0))
    b = Study("exp", storage=storage, sampler=RandomSampler(seed=1),
              load_if_exists=True)
    # interleave reservations across the two handles
    ta0 = a._reserve_trial()
    tb0 = b._reserve_trial()
    ta1 = a._reserve_trial()
    tb1 = b._reserve_trial()
    numbers = [t.number for t in (ta0, tb0, ta1, tb1)]
    assert len(set(numbers)) == 4, numbers
    # complete them out of order; every result survives
    for t, v in ((tb1, 4.0), (ta0, 1.0), (tb0, 2.0), (ta1, 3.0)):
        t.value, t.state = v, "COMPLETE"
        t.study._persist_trial(t)
    trials = a.get_trials()
    assert sorted(t.number for t in trials) == sorted(numbers)
    assert sorted(t.value for t in trials) == [1.0, 2.0, 3.0, 4.0]
    assert all(t.state == "COMPLETE" for t in trials)
