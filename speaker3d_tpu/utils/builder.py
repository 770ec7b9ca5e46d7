"""Recursive object builder / dependency injection from config.

Behavioral contract (reference: speakerlab/utils/builder.py): config entries
of the form ``{obj: 'dotted.path.Class', args: {...}}`` are instantiated
recursively; ``<name>`` strings are references to other config entries
(resolved with cycle detection, and also substituted *inside* path strings,
e.g. ``'<exp_dir>/models'``). Built objects are cached per config.
"""

from __future__ import annotations

import importlib
import re
from typing import Any

_REF_RE = re.compile(r"<([^<>]+)>")


def dynamic_import(path: str):
    """'pkg.mod.Attr' -> attribute. (reference: utils/builder.py:9-12)"""
    module_name, attr = path.rsplit(".", 1)
    module = importlib.import_module(module_name)
    return getattr(module, attr)


def is_ref_str(value: Any) -> bool:
    return isinstance(value, str) and _REF_RE.search(value) is not None


class Builder:
    def __init__(self, config):
        self.config = config
        self._cache: dict = {}
        self._building: set = set()

    def build(self, name: str):
        """Build (with caching) the config entry ``name``."""
        if name in self._cache:
            return self._cache[name]
        if name in self._building:
            raise ValueError(f"circular reference detected while building {name!r}")
        self._building.add(name)
        try:
            spec = self.config[name] if not hasattr(self.config, "get") \
                else self.config.get(name)
            if spec is None:
                raise KeyError(f"no config entry named {name!r}")
            obj = self._deep_build(spec)
        finally:
            self._building.discard(name)
        self._cache[name] = obj
        return obj

    def _resolve_str(self, value: str):
        m = _REF_RE.fullmatch(value)
        if m:  # whole-string reference -> the built object itself
            return self.build(m.group(1))

        def sub(match):  # reference embedded in a longer string -> str()
            return str(self.build(match.group(1)))

        return _REF_RE.sub(sub, value)

    def _deep_build(self, spec: Any):
        if isinstance(spec, dict) and "obj" in spec:
            cls = dynamic_import(spec["obj"])
            args = {k: self._deep_build(v)
                    for k, v in (spec.get("args") or {}).items()}
            return cls(**args)
        if isinstance(spec, dict):
            return {k: self._deep_build(v) for k, v in spec.items()}
        if isinstance(spec, (list, tuple)):
            return type(spec)(self._deep_build(v) for v in spec)
        if is_ref_str(spec):
            return self._resolve_str(spec)
        return spec


def build(name: str, config) -> Any:
    """One-shot build (no cross-call caching).
    (reference: utils/builder.py:90)"""
    return Builder(config).build(name)
