"""main.py train-driver surface, end-to-end in-process (ref: main.py flags
the reference forwards to PyTorch Lightning — SURVEY §2.1)."""
import glob
import json
import os

import numpy as np
import pytest

from waveformml_tpu.config import Config, save_config
from waveformml_tpu.datasets.synthetic import write_classification_dirs

N_SAMPLES = 8


@pytest.fixture(scope="module")
def cli_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    write_classification_dirs(str(tmp / "data"), ["A", "B"], n_files=6,
                              events_per_file=20, n_samples=N_SAMPLES, seed=21)
    cfg = Config({
        "run_config": {"exp_name": "cli", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "m", "n_samples": N_SAMPLES, "n_type": 2,
                          "type_names": ["A", "B"],
                          "model_base_path": str(tmp / "model"),
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "CrossEntropyLoss", "criterion_params": [],
                       "imports": [], "net_class": "DenseConvNet",
                       "net_type": "2DConvolution",
                       "hparams": {"n_conv": 1, "n_lin": 1, "out_planes": 2,
                                   "conv_params": {"size_factor": 2,
                                                   "pad_factor": 1.0}}},
        "optimize_config": {"total_epoch": 2, "lr": 0.05, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {"momentum": 0.9}},
        "dataset_config": {"mode": "path", "imports": [],
                           "base_path": str(tmp / "data"),
                           "paths": ["A", "B"], "dataset_class": "PulseDataset2D",
                           "dataset_params": {},
                           "dataloader_params": {"batch_size": 1},
                           "n_train": 60, "n_validate": 20, "n_test": 20},
    })
    config_path = str(tmp / "cfg.json")
    save_config(cfg, config_path)
    return tmp, config_path


def test_main_train_test_validate(cli_setup, capsys):
    """`main.py cfg -t --validate`: static DSL validation, fit, test, TB run
    dir with run_info.json and a best checkpoint."""
    import main

    tmp, config_path = cli_setup
    rc = main.main([config_path, "-t", "--validate", "-v", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "fit:" in out and "test:" in out
    run_dir = os.path.join(str(tmp / "model" / "m"), "runs", "cli", "version_0")
    assert os.path.isfile(os.path.join(run_dir, "run_info.json"))
    info = json.load(open(os.path.join(run_dir, "run_info.json")))
    assert "git" in info  # provenance recorded
    assert glob.glob(os.path.join(run_dir, "*.ckpt"))
    assert glob.glob(os.path.join(run_dir, "*tfevents*"))


def test_main_resume_from_best(cli_setup, capsys):
    """`-lb -r` resumes training from the best checkpoint, reusing the
    exp dir rather than auto-incrementing (ref: main.py:99-109)."""
    import main

    tmp, config_path = cli_setup
    rc = main.main([config_path, "-lb", "-r", "--max_epochs", "1", "-v", "2"])
    assert rc == 0
    assert "fit:" in capsys.readouterr().out
    # resumed into runs/cli (version_1), not runs/cli_1
    assert os.path.isdir(os.path.join(str(tmp / "model" / "m"), "runs", "cli",
                                      "version_1"))
    assert not os.path.isdir(os.path.join(str(tmp / "model" / "m"), "runs",
                                          "cli_1"))


def test_main_auto_lr_find_and_overfit(cli_setup, capsys):
    """`--auto_lr_find --overfit_batches` path: LR finder picks a positive lr
    and the overfit debug loop still fits."""
    import main

    tmp, config_path = cli_setup
    rc = main.main([config_path, "--auto_lr_find", "--overfit_batches", "2",
                    "--max_epochs", "2", "-v", "2"])
    assert rc == 0
    assert "fit:" in capsys.readouterr().out


def test_main_profiler_writes_summary(cli_setup):
    """`--profiler` drops profile_results.txt in the run dir
    (ref: main.py:182-187)."""
    import main

    tmp, config_path = cli_setup
    rc = main.main([config_path, "--profiler", "--max_epochs", "1", "-v", "2"])
    assert rc == 0
    hits = glob.glob(os.path.join(str(tmp / "model" / "m"), "runs", "cli*",
                                  "version_*", "profile_results.txt"))
    assert hits, "no profile_results.txt written"


def test_main_name_override_and_custom_validation(cli_setup, tmp_path, capsys):
    """--name overrides exp_name; -cv uses a custom requirements file
    (ref: main.py:39-61 --name / --config_validation)."""
    import json as _json

    import main

    tmp, config_path = cli_setup
    # custom requirements: a copy of the shipped schema
    req_src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "waveformml_tpu", "config_requirements.json")
    req_path = str(tmp_path / "req.json")
    with open(req_src) as f:
        _json.dump(_json.load(f), open(req_path, "w"))
    rc = main.main([config_path, "--name", "renamed", "-cv", req_path,
                    "--max_epochs", "1", "-v", "2"])
    assert rc == 0
    assert "fit:" in capsys.readouterr().out
    assert os.path.isdir(os.path.join(str(tmp / "model" / "m"), "runs",
                                      "renamed"))


def test_trainer_argparse_bridge(cli_setup, capsys):
    """Trainer.add_argparse_args exposes every scalar Trainer kwarg as a CLI
    flag (the reference merges Lightning's full Trainer surface, ref
    main.py:74): flags the driver never spelled out — --terminate_on_nan,
    --early_stopping_patience, --steps_per_dispatch, --tp — parse and reach
    the Trainer."""
    import argparse

    import main
    from waveformml_tpu.engineering.trainer import Trainer

    parser = main.build_parser()
    dests = {a.dest for a in parser._actions}
    for flag in ("terminate_on_nan", "early_stopping_patience",
                 "steps_per_dispatch", "parallel", "tp"):
        assert flag in dests, flag

    args = parser.parse_args(["cfg", "--terminate_on_nan", "false",
                              "--early_stopping_patience", "3",
                              "--steps_per_dispatch", "2"])
    kw = Trainer.kwargs_from_args(args)
    assert kw["terminate_on_nan"] is False
    assert kw["early_stopping_patience"] == 3
    assert kw["steps_per_dispatch"] == 2
    # object-wired ctor params never become flags
    for banned in ("config", "task", "logger", "mesh", "checkpoint_dir"):
        assert banned not in kw

    # end-to-end: an auto-generated flag changes Trainer behavior
    tmp, config_path = cli_setup
    rc = main.main([config_path, "--max_epochs", "1",
                    "--steps_per_dispatch", "2",
                    "--early_stopping_patience", "2", "-v", "2"])
    assert rc == 0
    assert "fit:" in capsys.readouterr().out

    # kwargs_from_args tolerates a namespace missing trainer flags
    ns = argparse.Namespace(seed=7)
    assert Trainer.kwargs_from_args(ns) == {"seed": 7}


def test_main_restore_without_checkpoint_starts_fresh(cli_setup, caplog):
    """-r with no -l/-lb must warn and start a NEW experiment directory
    (reference parity: main.py:155 gates resume on a checkpoint source) —
    silently reusing the old run dir from random init is the failure mode."""
    import logging

    import main

    tmp, config_path = cli_setup
    runs_dir = os.path.join(str(tmp), "model", "m", "runs")
    before = set(os.listdir(runs_dir)) if os.path.isdir(runs_dir) else set()
    with caplog.at_level(logging.WARNING):
        rc = main.main([config_path, "-r", "--max_epochs", "1", "-v", "2"])
    assert rc == 0
    assert any("restore_training ignored" in r.message for r in caplog.records)
    after = set(os.listdir(runs_dir))
    assert len(after) > len(before)  # fresh experiment name, not reuse
