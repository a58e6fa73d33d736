"""Config-driven validator loading (reference
ballet/validation/common.py:295-309 ``load_spec`` and
ballet/validation/main.py:31-68 ``_load_validator_class_params``).

A spec is either the fully-qualified class name (str) or a dict
``{"name": "pkg.mod.Class", "params": {...}}``. ``make_validator``
partially applies the params, mirroring the reference's funcy
``func_partial``.
"""

from __future__ import annotations

import functools
import importlib


def load_spec(spec) -> tuple[type, dict]:
    """Resolve a validator spec to (class, params)."""
    if isinstance(spec, str):
        path, params = spec, {}
    elif isinstance(spec, dict):
        path = spec["name"]
        params = spec.get("params", {})
    else:
        raise TypeError(f"spec must be str or dict, got {type(spec).__name__}")
    modname, clsname = path.rsplit(".", maxsplit=1)
    mod = importlib.import_module(modname)
    cls = getattr(mod, clsname)
    return cls, dict(params)


def make_validator(spec):
    """Spec → zero-arg-constructible factory with params pre-applied."""
    cls, params = load_spec(spec)
    return functools.partial(cls, **params)


def instantiate(spec):
    """Spec → instance (specs that need no positional args)."""
    return make_validator(spec)()
