"""Class registry: the framework's dependency-injection mechanism.

The reference resolves config class-name strings by runtime importlib reflection
(ref: src/utils/util.py:74-137 ``ModuleUtility.retrieve_class`` /
``create_class_instances``). Here the same config strings resolve through an
explicit registry: safer, import-cycle-free, and it lets torch-era names
("optim.SGD", "nn.CrossEntropyLoss", "src.engineering.LitPSD", "LitPSD",
"WaveformModels.TemporalWaveformNet") map onto TPU-native implementations so
existing reference configs keep working unmodified.

Resolution order for a name like "A.B.C":
  1. exact registered key "A.B.C"
  2. registered key equal to the trailing components ("B.C", then "C")
  3. any registered key whose trailing components equal the name
"""
from __future__ import annotations

import importlib
import logging
from typing import Any, Callable, Dict, List, Optional, Sequence


class Registry:
    def __init__(self) -> None:
        self._by_name: Dict[str, Any] = {}
        self._lazy: Dict[str, str] = {}  # name -> "module:attr" imported on demand

    def register(self, name: str, obj: Any = None, aliases: Sequence[str] = ()) -> Any:
        """Register ``obj`` under ``name`` (and aliases). Usable as decorator."""

        def _do(o: Any) -> Any:
            for n in (name, *aliases):
                self._by_name[n] = o
            return o

        if obj is None:
            return _do
        return _do(obj)

    def register_lazy(self, name: str, target: str, aliases: Sequence[str] = ()) -> None:
        """Register a class by "module:attr" string, imported on first lookup."""
        for n in (name, *aliases):
            self._lazy[n] = target

    def _materialize(self, key: str) -> Any:
        target = self._lazy[key]
        mod_name, attr = target.split(":")
        # import BEFORE popping: a failed (possibly transient) import must
        # not erase the registration, or every later lookup masks the real
        # error behind a "no registered class" KeyError
        obj = getattr(importlib.import_module(mod_name), attr)
        self._lazy.pop(key, None)
        self._by_name[key] = obj
        return obj

    def lookup(self, name: str) -> Optional[Any]:
        if name in self._by_name:
            return self._by_name[name]
        if name in self._lazy:
            return self._materialize(name)
        # suffix matching: "src.engineering.LitPSD" -> "LitPSD";
        # "WaveformModels.TemporalWaveformNet" -> "TemporalWaveformNet"
        parts = name.split(".")
        for i in range(1, len(parts)):
            suffix = ".".join(parts[i:])
            if suffix in self._by_name:
                return self._by_name[suffix]
            if suffix in self._lazy:
                return self._materialize(suffix)
        # reverse: registered key ends with the requested name
        for key in list(self._lazy):
            if key.endswith("." + name):
                return self._materialize(key)
        for key, obj in self._by_name.items():
            if key.endswith("." + name):
                return obj
        return None

    def retrieve_class(self, name: str) -> Any:
        """Resolve a config class-name string to a class
        (ref: util.py:96-107 ``ModuleUtility.retrieve_class``)."""
        obj = self.lookup(name)
        if obj is None:
            raise KeyError(
                f"no registered class for '{name}' "
                f"(known: {sorted(set(list(self._by_name) + list(self._lazy)))[:40]}...)"
            )
        return obj

    def create_class_instances(self, spec: List[Any],
                               translations: Optional[Dict[str, Callable]] = None
                               ) -> List[Any]:
        """Build a layer list from the config ``algorithm`` DSL: alternating
        class-path strings and positional-arg lists (dict form supported)
        (ref: util.py:109-137). ``translations`` substitutes a factory for
        specific class names (e.g. masked BatchNorm inside padded-row
        stacks) before the registry lookup."""
        instances: List[Any] = []
        current: Optional[Callable] = None
        for item in spec:
            if isinstance(item, str):
                if current is not None:
                    instances.append(current())  # bare class with no args
                current = (translations or {}).get(item) or self.retrieve_class(item)
            elif isinstance(item, (list, tuple)):
                if current is None:
                    raise ValueError(f"algorithm DSL: args {item} with no preceding class")
                instances.append(current(*item))
                current = None
            elif isinstance(item, dict) or hasattr(item, "to_dict"):
                if current is None:
                    raise ValueError("algorithm DSL: kwargs with no preceding class")
                kwargs = item.to_dict() if hasattr(item, "to_dict") else item
                instances.append(current(**kwargs))
                current = None
            else:
                raise ValueError(f"algorithm DSL: unexpected entry {item!r}")
        if current is not None:
            instances.append(current())
        return instances


registry = Registry()


def register(name: str, aliases: Sequence[str] = ()):
    """Module-level decorator: ``@register("SPConvNet", aliases=("SPConvNet.SPConvNet",))``."""
    return registry.register(name, aliases=aliases)


def _ensure_builtin_registrations() -> None:
    """Import the framework packages whose import side-effect registers classes."""
    for mod in (
        "waveformml_tpu.nn.functional",
        "waveformml_tpu.optim",
        "waveformml_tpu.models",
        "waveformml_tpu.datasets",
        "waveformml_tpu.engineering",
    ):
        try:
            importlib.import_module(mod)
        except ImportError as e:
            # keep going (partial registries are usable) but surface the
            # root cause: a later "no registered class" KeyError otherwise
            # sends the user debugging the registry, not the environment
            logging.getLogger(__name__).warning(
                "failed to import %s (its classes will be unavailable): %s",
                mod, e)


def retrieve_class(name: str) -> Any:
    """Convenience wrapper that makes sure built-ins are registered first."""
    _ensure_builtin_registrations()
    return registry.retrieve_class(name)
