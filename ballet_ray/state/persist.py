"""Fitted-artifact persistence: fit once, apply in later jobs.

The reference keeps fitted pipelines in process memory (its data cache is
a 10-minute memoizer, ballet/project.py:288); at corpus scale the fit
passes are expensive distributed jobs, so the fitted artifact itself must
outlive the driver. Every fitted object in this engine is picklable by
contract (the CanPickleCheck conformance check), so persistence is a
versioned pickle envelope:

- atomic write (temp file + rename) — a crashed save never leaves a
  half-written artifact
- an envelope records the engine version and the object's class path;
  load verifies the envelope format and surfaces a clear error on
  mismatch instead of a bare unpickling failure

Works for ``FeatureEngineeringPipeline`` (after fit), fitted encoders,
``BpeTokenizer``, PQ codebooks / PCA models (dicts of arrays) — anything
the pickle contract covers.
"""

from __future__ import annotations

import os
import pickle

_FORMAT = "ballet_ray.artifact.v1"


def save_artifact(obj, path: str) -> str:
    """Pickle ``obj`` into a versioned envelope at ``path`` (atomic)."""
    from ballet_ray import __version__ as engine_version

    from ballet_ray.functions.partition import hash_backend

    env = {
        "format": _FORMAT,
        "engine_version": engine_version,
        # hash-derived fits (splits, samples, shuffle orders) only
        # reproduce under the backend that wrote them; load_artifact
        # surfaces a mismatch instead of silently changing memberships
        "hash_backend": hash_backend(),
        "class": f"{type(obj).__module__}.{type(obj).__qualname__}",
        "payload": obj,
    }
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{os.path.basename(path)}.tmp")
    with open(tmp, "wb") as f:
        pickle.dump(env, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    return path


def load_artifact(path: str, *, expect_class: str | None = None):
    """Load a saved artifact; raises ``ValueError`` on a foreign file or a
    class mismatch (``expect_class`` may be a suffix, e.g.
    ``"FeatureEngineeringPipeline"``)."""
    with open(path, "rb") as f:
        env = pickle.load(f)
    if not (isinstance(env, dict) and env.get("format") == _FORMAT):
        raise ValueError(f"{path!r} is not a ballet_ray artifact")
    if expect_class is not None and not env["class"].endswith(expect_class):
        raise ValueError(
            f"artifact holds {env['class']}, expected *{expect_class}"
        )
    saved_backend = env.get("hash_backend")
    if saved_backend is not None:
        from ballet_ray.functions.partition import hash_backend

        here = hash_backend()
        if saved_backend != here:
            raise ValueError(
                f"artifact was fitted under hash backend {saved_backend!r} "
                f"but this environment resolves to {here!r}; hash-derived "
                f"state (splits/samples/shuffle orders) will not reproduce "
                f"— refit instead of loading."
            )
    return env["payload"]


def save_pipeline(pipeline, path: str) -> str:
    """Persist a FITTED FeatureEngineeringPipeline (fit state travels with
    the features; a later driver loads and calls ``transform`` without
    re-running the fit passes)."""
    return save_artifact(pipeline, path)


def load_pipeline(path: str):
    return load_artifact(path, expect_class="Pipeline")
