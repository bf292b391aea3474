import json
import os

import pytest

from waveformml_tpu.config import (
    Config, config_equals, config_superset, load_config, save_config,
    to_dict, to_object, validate_config,
)


def test_config_attribute_access():
    cfg = Config({"a": {"b": 1, "c": [1, {"d": 2}]}, "e": "x"})
    assert cfg.a.b == 1
    assert cfg.a.c[0] == 1
    assert cfg.a.c[1].d == 2
    assert cfg.e == "x"
    assert cfg["a"]["b"] == 1


def test_config_roundtrip():
    d = {"a": {"b": 1}, "c": [1, 2, {"d": "x"}]}
    assert to_dict(to_object(d)) == d
    assert config_equals(to_object(d), d)


def test_config_superset():
    a = {"x": 1, "y": {"z": 2, "w": 3}}
    b = {"y": {"z": 2}}
    assert config_superset(a, b)
    assert not config_superset(b, a)
    assert not config_superset({"y": {"z": 5}}, b)


def test_validate_fills_defaults():
    cfg = Config({
        "run_config": {"exp_name": "t", "run_class": "LitPSD"},
        "system_config": {"model_name": "m", "n_samples": 10, "type_names": ["a", "b"]},
        "net_config": {"net_class": "DenseConvNet"},
        "optimize_config": {},
        "dataset_config": {"paths": ["p"], "n_train": 10, "n_validate": 5},
    })
    validate_config(cfg)
    assert cfg.optimize_config.optimizer_class == "optim.SGD"
    assert cfg.optimize_config.scheduler_params.gamma == 0.9
    assert cfg.net_config.criterion_class == "CrossEntropyLoss"


def test_load_save_roundtrip(tmp_path):
    p = tmp_path / "cfg.json"
    d = {
        "run_config": {"exp_name": "t", "run_class": "LitPSD"},
        "system_config": {"model_name": "m", "n_samples": 4, "type_names": ["a"]},
        "net_config": {},
        "optimize_config": {},
        "dataset_config": {"paths": ["p"], "n_train": 1, "n_validate": 1},
    }
    p.write_text(json.dumps(d))
    cfg = load_config(str(p))
    out = tmp_path / "saved.json"
    save_config(cfg, str(out))
    reloaded = json.loads(out.read_text())
    assert reloaded["run_config"]["exp_name"] == "t"


def test_missing_required_raises():
    cfg = Config({"run_config": {}, "system_config": {"type_names": ["a"], "n_samples": 1},
                  "net_config": {}, "optimize_config": {},
                  "dataset_config": {"n_train": 1, "n_validate": 1}})
    with pytest.raises(ValueError, match="paths"):
        validate_config(cfg)


def test_config_method_names_do_not_shadow_keys():
    """Membership and .get must consult the stored keys, not Config's own
    method names ('keys' in cfg was always True before)."""
    cfg = Config({"a": 1})
    assert "a" in cfg
    for name in ("keys", "items", "get", "copy", "setdefault", "to_dict"):
        assert name not in cfg
        assert cfg.get(name, "missing") == "missing"
    cfg.setdefault("keys_field", 2)
    assert cfg.keys_field == 2


def test_zero_valued_template_keys_are_required():
    """Reference semantics (util.py:294-338): a numeric 0 in the requirements
    template marks a REQUIRED key, not a usable default of 0."""
    cfg = Config({"run_config": {"exp_name": "t", "run_class": "LitPSD"},
                  "system_config": {"model_name": "m", "type_names": ["a"]},
                  "net_config": {}, "optimize_config": {},
                  "dataset_config": {"paths": ["p"], "n_train": 1,
                                     "n_validate": 1}})
    with pytest.raises(ValueError, match="n_samples"):
        validate_config(cfg)


def test_validate_does_not_fill_sgd_params_for_other_optimizers(tmp_path):
    """config_requirements.json's optimizer_params default belongs to
    optim.SGD: an Adam config omitting the key entirely must get an EMPTY
    params dict (filling momentum/nesterov would crash Adam's constructor),
    while an SGD config still inherits the defaults."""
    import json

    from waveformml_tpu import optim as wopt
    from waveformml_tpu.config import load_config

    base = {
        "run_config": {"exp_name": "v", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "m", "n_samples": 8, "n_type": 2,
                          "type_names": ["a", "b"], "model_base_path": "m"},
        "net_config": {"criterion_class": "CrossEntropyLoss",
                       "criterion_params": [], "imports": [],
                       "net_class": "DenseConvNet",
                       "net_type": "2DConvolution"},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "imports": [],
                            "optimizer_class": "optim.Adam"},
        "dataset_config": {"mode": "path", "imports": [], "paths": ["a"],
                           "dataset_class": "PulseDataset2D",
                           "dataset_params": {}, "n_train": 1, "n_validate": 1,
                           "n_test": 1},
    }
    p = tmp_path / "adam.json"
    p.write_text(json.dumps(base))
    cfg = load_config(str(p), validate=True)
    params = cfg.optimize_config.optimizer_params
    assert not hasattr(params, "momentum")
    # and the optimizer actually builds
    wopt.build_optimizer(cfg.optimize_config.optimizer_class, 0.01,
                         {k: v for k, v in params.__dict__.items()})

    base["optimize_config"]["optimizer_class"] = "optim.SGD"
    p2 = tmp_path / "sgd.json"
    p2.write_text(json.dumps(base))
    cfg2 = load_config(str(p2), validate=True)
    assert cfg2.optimize_config.optimizer_params.momentum == 0.9

    # alias spelling resolves to the same class, so it must inherit the
    # same defaults — a raw string compare would silently train momentum 0
    base["optimize_config"]["optimizer_class"] = "SGD"
    p3 = tmp_path / "sgd_alias.json"
    p3.write_text(json.dumps(base))
    cfg3 = load_config(str(p3), validate=True)
    assert cfg3.optimize_config.optimizer_params.momentum == 0.9
    assert cfg3.optimize_config.optimizer_params.nesterov is True

    # and in a FRESH interpreter where config is the first (and only)
    # waveformml_tpu import: alias resolution must trigger the builtin
    # registrations itself rather than rely on a prior optim import
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-c",
         "import json, sys\n"
         "from waveformml_tpu.config import load_config\n"
         f"cfg = load_config({str(p3)!r}, validate=True)\n"
         "sys.exit(0 if cfg.optimize_config.optimizer_params.momentum == 0.9"
         " else 3)"],
        env={**os.environ, "JAX_PLATFORMS": "cpu"}, capture_output=True,
        text=True)
    assert r.returncode == 0, r.stderr
