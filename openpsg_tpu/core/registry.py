"""Tiny name → constructor registry.

Replaces the mmcv/mmdet registry machinery the reference relies on
(e.g. ``@DETECTORS.register_module()`` at
kings_sgg/models/detectors/openseed_relation_v2.py:19).  Configs name
components by ``type`` and we construct them here; ``custom_imports`` in a
config triggers the module imports that populate these registries.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict, Optional


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._modules: Dict[str, Callable] = {}

    def register_module(self, name: Optional[str] = None, module: Optional[Callable] = None):
        """Use as decorator ``@REG.register_module()`` or call directly."""
        if module is not None:
            self._register(name or module.__name__, module)
            return module

        def _decorator(cls):
            self._register(name or cls.__name__, cls)
            return cls

        return _decorator

    def _register(self, name: str, module: Callable):
        if name in self._modules and self._modules[name] is not module:
            raise KeyError(f"{name} already registered in {self.name}")
        self._modules[name] = module

    def get(self, name: str) -> Callable:
        if name not in self._modules:
            raise KeyError(
                f"{name!r} not found in registry {self.name!r}; "
                f"known: {sorted(self._modules)}"
            )
        return self._modules[name]

    def __contains__(self, name: str) -> bool:
        return name in self._modules

    def __repr__(self) -> str:
        return f"Registry({self.name}, {sorted(self._modules)})"


DETECTORS = Registry("detectors")
HEADS = Registry("heads")
DATASETS = Registry("datasets")
PIPELINES = Registry("pipelines")
HOOKS = Registry("hooks")


def build_from_cfg(cfg: Dict[str, Any], registry: Registry, **extra_kwargs):
    """Construct ``registry[cfg['type']](**cfg_minus_type, **extra_kwargs)``."""
    if cfg is None:
        return None
    cfg = dict(cfg)
    obj_type = cfg.pop("type")
    cls = registry.get(obj_type) if isinstance(obj_type, str) else obj_type
    cfg.update(extra_kwargs)
    return cls(**cfg)


def import_modules(module_names, allow_failed_imports: bool = False):
    """Reference parity with mmcv ``custom_imports`` (tools/train.py via
    configs/psg/baseline_v4_ov.py:7-13): importing plugin modules registers
    their components."""
    imported = []
    for name in module_names or []:
        try:
            imported.append(importlib.import_module(name))
        except ImportError:
            if not allow_failed_imports:
                raise
            imported.append(None)
    return imported
