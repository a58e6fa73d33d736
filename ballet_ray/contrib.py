"""Plugin feature discovery — the reference's collaboration model.

A contributor drops a module defining exactly ONE ``Feature`` into a
contrib package; the engine walks the package, imports every submodule,
and collects that feature (reference ballet/contrib.py:19-122,
``_collect_contrib_feature_from_module`` :97-122). Modules with zero or
more than one Feature are skipped, matching the reference.

Accepted inputs: an already-imported module/package, a dotted module
name, or a filesystem directory of ``*.py`` modules (the common "contrib
dir in a repo checkout" case, which needs no package installation).
"""

from __future__ import annotations

import importlib
import importlib.util
import pkgutil
import types
from pathlib import Path

from ballet_ray.feature import Feature


def _collect_contrib_feature_from_module(mod: types.ModuleType) -> Feature | None:
    """The single Feature instance defined by ``mod``, else None (zero or
    ambiguous candidates are skipped, reference :97-122)."""
    candidates = [obj for attr in dir(mod) if isinstance(obj := getattr(mod, attr), Feature)]
    # dedupe aliased bindings of the same object
    uniq: list[Feature] = []
    for c in candidates:
        if not any(c is u for u in uniq):
            uniq.append(c)
    if len(uniq) != 1:
        return None
    feature = uniq[0]
    feature.source = mod.__name__
    return feature


def _iter_package_modules(package: types.ModuleType):
    for _, modname, _ in pkgutil.walk_packages(
        path=package.__path__, prefix=package.__name__ + "."
    ):
        try:
            yield importlib.import_module(modname)
        except ImportError:
            continue


def _iter_path_modules(path: Path):
    for py in sorted(path.rglob("*.py")):
        if py.name.startswith("_"):
            continue
        modname = f"_ballet_ray_contrib_{py.stem}"
        spec = importlib.util.spec_from_file_location(modname, py)
        if spec is None or spec.loader is None:
            continue
        mod = importlib.util.module_from_spec(spec)
        try:
            spec.loader.exec_module(mod)
        except Exception:
            continue  # a broken contrib module must not sink the others
        yield mod


def collect_contrib_features(contrib) -> list[Feature]:
    """Walk a contrib package (module object, dotted name, or directory
    path) and collect one ``Feature`` per module."""
    if isinstance(contrib, (str, Path)) and Path(contrib).is_dir():
        mods = _iter_path_modules(Path(contrib))
    else:
        if isinstance(contrib, str):
            contrib = importlib.import_module(contrib)
        if not isinstance(contrib, types.ModuleType):
            raise ValueError("contrib must be a module, dotted name, or directory path")
        if hasattr(contrib, "__path__"):  # a package
            mods = _iter_package_modules(contrib)
        else:
            mods = [contrib]
    out = []
    for mod in mods:
        f = _collect_contrib_feature_from_module(mod)
        if f is not None:
            out.append(f)
    return out
