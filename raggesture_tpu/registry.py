"""Minimal type-string registry (capability match for mmcv's Registry).

The reference maps config ``type:`` strings to classes through one shared
mmcv Registry (/root/reference/mogen/models/builder.py:11-16, where MODELS =
LOSSES = ARCHITECTURES = SUBMODULES = ATTENTIONS, and mogen/datasets/
builder.py:27-28 for DATASETS/PIPELINES).  We keep the same surface —
``MODELS.register_module()`` decorators, ``build_from_cfg(cfg, registry)``
— over a ~60 line stdlib implementation so user configs can name
alternative architectures/attentions/datasets by string.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Mapping, Optional


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._module_dict: Dict[str, Callable] = {}

    def __contains__(self, key: str) -> bool:
        return key in self._module_dict

    def get(self, key: str) -> Optional[Callable]:
        return self._module_dict.get(key)

    def keys(self):
        return self._module_dict.keys()

    def register_module(self, name: Optional[str] = None,
                        module: Optional[Callable] = None, force: bool = False):
        """Usable as ``@R.register_module()`` or ``R.register_module(module=f)``."""
        if module is not None:
            self._register(module, name, force)
            return module

        def decorator(cls):
            self._register(cls, name, force)
            return cls

        return decorator

    def _register(self, module: Callable, name: Optional[str], force: bool):
        key = name or module.__name__
        if not force and key in self._module_dict:
            raise KeyError(f"{key} already registered in {self.name}")
        self._module_dict[key] = module

    def __repr__(self) -> str:
        return f"Registry({self.name}, items={sorted(self._module_dict)})"


def build_from_cfg(cfg: Mapping[str, Any], registry: Registry,
                   default_args: Optional[Mapping[str, Any]] = None) -> Any:
    """Instantiate ``registry[cfg['type']](**cfg-minus-type, **default_args)``
    (the mmcv build contract, mogen/models/builder.py:19-36)."""
    if "type" not in cfg:
        raise KeyError(f"cfg must have a 'type' key, got {sorted(cfg)}")
    args = {k: v for k, v in cfg.items() if k != "type"}
    if default_args:
        for k, v in default_args.items():
            args.setdefault(k, v)
    obj_type = cfg["type"]
    obj_cls = registry.get(obj_type)
    if obj_cls is None:
        raise KeyError(
            f"{obj_type!r} not in {registry.name} registry; "
            f"known: {sorted(registry.keys())}")
    try:
        return obj_cls(**args)
    except TypeError as e:
        raise TypeError(f"building {obj_type}: {e}") from e


# shared registries — same aliasing as the reference (one registry for all
# model kinds, a separate one for datasets)
MODELS = Registry("models")
LOSSES = MODELS
ARCHITECTURES = MODELS
SUBMODULES = MODELS
ATTENTIONS = MODELS
DATASETS = Registry("datasets")
PIPELINES = Registry("pipelines")
