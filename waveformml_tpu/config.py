"""Config system: JSON/YAML configs as nested attribute objects.

Reproduces the reference's config surface (ref: src/utils/util.py:25-71
``DictionaryUtility.to_object/to_dict``; util.py:282-338 ``ValidateUtility``;
util.py:430-441 config search path) with the same five sections
(run_config / system_config / net_config / optimize_config / dataset_config,
plus optional optuna_config / evaluation_config). Configs are the public API
and the DI container: class names inside are resolved through
:mod:`waveformml_tpu.registry` instead of importlib reflection.
"""
from __future__ import annotations

import copy
import json
import os
from typing import Any, Dict, List, Optional

try:
    import yaml  # type: ignore

    _HAS_YAML = True
except Exception:  # pragma: no cover
    _HAS_YAML = False


class Config:
    """Recursive attribute-access wrapper over a dict.

    Equivalent of the reference's anonymous ``to_object`` namespace objects
    (ref: src/utils/util.py:25-49): ``config.section.key`` access everywhere,
    plus dict-style access, ``to_dict`` round-trip, and deep equality.
    """

    def __init__(self, d: Optional[Dict[str, Any]] = None):
        if d:
            for k, v in d.items():
                setattr(self, str(k), _wrap(v))

    # -- attribute/dict dual access ------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return getattr(self, key)

    def __setitem__(self, key: str, value: Any) -> None:
        setattr(self, key, value)

    def __setattr__(self, key: str, value: Any) -> None:
        # wrap on every assignment path so cfg.sec.key = {...} and
        # cfg.sec["key"] = {...} behave identically
        object.__setattr__(self, key, _wrap(value))

    def __contains__(self, key: str) -> bool:
        # __dict__, not hasattr: method names (keys/items/get/...) must not
        # shadow key lookups — 'keys' in cfg was always True before
        return key in self.__dict__

    def get(self, key: str, default: Any = None) -> Any:
        return self.__dict__.get(key, default)

    def setdefault(self, key: str, default: Any = None) -> Any:
        if key not in self.__dict__:
            setattr(self, key, _wrap(default))
        return self.__dict__[key]

    def keys(self):
        return self.__dict__.keys()

    def items(self):
        return self.__dict__.items()

    def to_dict(self) -> Dict[str, Any]:
        """Inverse of construction (ref: util.py:51-71)."""
        return _unwrap(self)

    def copy(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()))

    def __eq__(self, other: Any) -> bool:
        if isinstance(other, Config):
            return self.to_dict() == other.to_dict()
        if isinstance(other, dict):
            return self.to_dict() == other
        return NotImplemented

    def __repr__(self) -> str:
        return f"Config({self.to_dict()!r})"


def _wrap(v: Any) -> Any:
    if isinstance(v, dict):
        return Config(v)
    if isinstance(v, (list, tuple)):
        return [_wrap(x) for x in v]
    return v


def _unwrap(v: Any) -> Any:
    if isinstance(v, Config):
        return {k: _unwrap(x) for k, x in v.__dict__.items()}
    if isinstance(v, (list, tuple)):
        return [_unwrap(x) for x in v]
    return v


def to_object(d: Dict[str, Any]) -> Config:
    """dict → Config (ref name: DictionaryUtility.to_object, util.py:25-49)."""
    return Config(d)


def to_dict(obj: Any) -> Dict[str, Any]:
    """Config → dict (ref name: DictionaryUtility.to_dict, util.py:51-71)."""
    return _unwrap(obj)


def config_equals(a: Any, b: Any) -> bool:
    """Deep config equality (ref: util.py config_equals)."""
    return _unwrap(a) == _unwrap(b)


def config_superset(superset: Any, subset: Any) -> bool:
    """True if `superset` contains every key of `subset` with equal values.

    Used by the shuffle pipeline's skip-if-existing logic
    (ref: src/datasets/PulseDataset.py:59-79).
    """
    sup, sub = _unwrap(superset), _unwrap(subset)

    def _contains(a: Any, b: Any) -> bool:
        if isinstance(b, dict):
            if not isinstance(a, dict):
                return False
            return all(k in a and _contains(a[k], v) for k, v in b.items())
        return a == b

    return _contains(sup, sub)


# ---------------------------------------------------------------------------------
# search path + load/save (ref: util.py:404-441 get_config/save_config)
# ---------------------------------------------------------------------------------

def find_config_path(name: str, search_dirs: Optional[List[str]] = None) -> str:
    """Resolve a config name: absolute path, ./config/<name>, then CWD
    (ref: util.py:430-441). Tries .json/.yaml/.yml extensions."""
    candidates = []
    dirs = search_dirs if search_dirs is not None else [os.path.join(os.getcwd(), "config"), os.getcwd()]
    if os.path.isabs(name) or os.path.exists(name):
        candidates.append(name)
    for d in dirs:
        candidates.append(os.path.join(d, name))
    exts = ["", ".json", ".yaml", ".yml"]
    for c in candidates:
        for e in exts:
            p = c + e
            if os.path.isfile(p):
                return p
    raise FileNotFoundError(f"config '{name}' not found (searched {candidates})")


def load_config(path: str, validate: bool = True) -> Config:
    """Load a JSON or YAML config into a Config object; optionally validate
    and fill defaults from config_requirements.json (ref: main.py:81-95)."""
    p = find_config_path(path)
    with open(p) as f:
        if p.endswith((".yaml", ".yml")):
            if not _HAS_YAML:
                raise RuntimeError("yaml not available")
            d = yaml.safe_load(f)
        else:
            d = json.load(f)
    cfg = Config(d)
    if validate:
        validate_config(cfg)
    return cfg


def save_config(config: Any, path: str) -> None:
    """Write config JSON (ref: util.py save_config)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(_unwrap(config), f, indent=2)


def json_to_yaml(json_path: str, yaml_path: str) -> None:
    """JSON→YAML converter (ref: src/utils/JSONYAML.py:11-40)."""
    if not _HAS_YAML:
        raise RuntimeError("yaml not available")
    with open(json_path) as f:
        d = json.load(f)
    with open(yaml_path, "w") as f:
        yaml.safe_dump(d, f)


def yaml_to_json(yaml_path: str, json_path: str) -> None:
    """YAML→JSON converter (ref: src/utils/JSONYAML.py:43-72)."""
    if not _HAS_YAML:
        raise RuntimeError("yaml not available")
    with open(yaml_path) as f:
        d = yaml.safe_load(f)
    with open(json_path, "w") as f:
        json.dump(d, f, indent=2)


# ---------------------------------------------------------------------------------
# validation / defaults (ref: util.py:282-338, config_requirements.json)
# ---------------------------------------------------------------------------------

_REQUIREMENTS_FILE = os.path.join(os.path.dirname(__file__), "config_requirements.json")


def _load_requirements() -> Dict[str, Any]:
    with open(_REQUIREMENTS_FILE) as f:
        return json.load(f)


def validate_config(config: Config, requirements: Optional[Dict[str, Any]] = None) -> Config:
    """Schema-check the config against the requirements template, filling in
    defaults for absent keys that carry a default value (non-empty / nonzero),
    and raising on absent keys with no default (ref: util.py:282-338).

    Keys beginning with '_' in the template are comments.
    """
    req = requirements if requirements is not None else _load_requirements()

    def _apply(node: Config, template: Dict[str, Any], path: str) -> None:
        for key, default in template.items():
            if key.startswith("_"):
                continue
            here = f"{path}/{key}" if path else key
            if isinstance(default, dict) and not path:
                # top-level config sections recurse per-property
                if key not in node.__dict__:
                    setattr(node, key, Config({}))
                sub = getattr(node, key)
                if not isinstance(sub, Config):
                    raise ValueError(f"config key {here} must be a section (dict)")
                _apply(sub, default, here)
            elif isinstance(default, dict):
                # dict-valued property defaults are ATOMIC (ref util.py:332-338):
                # filled wholesale when the key is absent, never merged per-key
                # into a present value (e.g. optimizer_params={} with Adam must
                # NOT inherit the SGD momentum default)
                if key not in node.__dict__:
                    # the shipped optimizer/scheduler param defaults belong to
                    # optim.SGD / ExponentialLR specifically: filling them for
                    # a DIFFERENT class would crash its constructor (Adam has
                    # no `momentum`) or silently change its hyperparameters —
                    # an absent params dict for another class stays empty
                    sibling = {"optimizer_params": "optimizer_class",
                               "scheduler_params": "scheduler_class"}.get(key)
                    tmpl_cls = template.get(sibling) if sibling else None
                    cfg_cls = getattr(node, sibling, tmpl_cls) if sibling else None
                    if sibling and not _same_class(cfg_cls, tmpl_cls):
                        setattr(node, key, _wrap({}))
                    else:
                        setattr(node, key, _wrap(copy.deepcopy(default)))
                elif not isinstance(getattr(node, key), Config):
                    raise ValueError(f"config key {here} must be a dict")
            else:
                if key not in node.__dict__:
                    if _has_default(default):
                        setattr(node, key, _wrap(copy.deepcopy(default)))
                    else:
                        raise ValueError(f"required config key missing: {here}")

    def _same_class(a: Any, b: Any) -> bool:
        # "SGD" and "optim.SGD" are registry aliases of the same class — the
        # template defaults apply to both spellings; compare resolved classes
        # and fall back to the strings for names the registry doesn't know
        if a == b:
            return True
        if not (isinstance(a, str) and isinstance(b, str)):
            return False
        # the module-level wrapper, NOT registry.retrieve_class: only the
        # wrapper runs _ensure_builtin_registrations, and config may be the
        # first waveformml_tpu module imported
        from waveformml_tpu.registry import retrieve_class

        try:
            return retrieve_class(a) is retrieve_class(b)
        except Exception:
            return False

    def _has_default(v: Any) -> bool:
        # reference semantics (util.py:294-338): "" / 0 / [""] / [{}] / {}
        # mark REQUIRED keys, anything else is a usable default. One lenient
        # divergence: a bare [] fills as an empty list (the reference treats
        # it as required) — strictly more permissive, so any config that
        # passes reference validation passes here too.
        if isinstance(v, str):
            return v != ""
        if isinstance(v, (bool, int, float)):
            return v != 0
        if isinstance(v, list):
            return len(v) == 0 or (v != [""] and v != [{}])
        if isinstance(v, dict):
            return len(v) > 0
        return True

    _apply(config, req, "")
    return config
