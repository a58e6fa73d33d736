"""Top-level validation driver (reference ballet/validation/main.py:182-196
``validate``): structure → feature-API → acceptance → prune, composed from
config-loaded validators.

Config shape::

    {
      "contrib": <module | dotted name | directory path>,   # feature modules
      "data": {"dataset": <ray.data.Dataset>, "target": <col name | array>},
      "proposed": <source-name of the candidate feature>,   # optional: last collected
      "validation": {
        "feature_accepter": "pkg.mod.Class" | {"name": ..., "params": {...}},
        "feature_pruner":   same spec form,
      },
      "sample_rows": 2048,   # driver-side cap for the information kernels
    }

The structure/API stages run against the real Dataset (distributed);
the information-theoretic acceptance/pruning kernels run on a bounded
driver-side sample, as the reference does (it subsamples too).
"""

from __future__ import annotations

import numpy as np

from ballet_ray.contrib import collect_contrib_features
from ballet_ray.exc import (
    FeatureRejected,
    InvalidFeatureApi,
    InvalidProjectStructure,
    NoFeaturesCollectedError,
)
from ballet_ray.validation.accepters import call_judge
from ballet_ray.validation.feature_checks import check_feature_api as run_feature_api_checks
from ballet_ray.validation.spec import instantiate

PRUNER_MESSAGE = "Found Redundant Feature: "  # log-parsing parity


def _load_data(config):
    data = config["data"]
    ds = data["dataset"]
    target = data.get("target")
    return ds, target


def _sample_frame(ds, sample_rows: int, base_cols: list | None = None):
    """Bounded driver-side sample. For Datasets this is the hash-priority
    reservoir over INPUT row content (discover._priority_sample_pdf) — not
    ``limit()``, which is a block prefix and biased on sorted data — so
    every feature and the target draw the same rows."""
    import ray.data as rd

    if isinstance(ds, rd.Dataset):
        from ballet_ray.validation.discover import _priority_sample_pdf

        cols = list(base_cols) if base_cols is not None else list(ds.schema().names)
        return _priority_sample_pdf(ds, cols, sample_rows)
    return ds.head(sample_rows)


def _feature_matrix(feature, ds, sample_rows: int) -> np.ndarray:
    import ray.data as rd

    out = feature.as_feature_engineering_pipeline().fit_transform(ds)
    in_cols = list(ds.schema().names) if isinstance(ds, rd.Dataset) else list(ds.columns)
    pdf = _sample_frame(out, sample_rows, base_cols=in_cols)
    cols = [c for c in pdf.columns if c not in set(in_cols)]
    return pdf[cols].to_numpy(dtype=float)


def _target_vector(ds, target, sample_rows: int, encoder_spec=None) -> np.ndarray:
    if isinstance(target, str):
        pdf = _sample_frame(ds, sample_rows)
        y = pdf[target].to_numpy()
    else:
        y = np.asarray(target)[:sample_rows]
    if encoder_spec is not None:
        # reference parity: y is encoded by an EncoderPipeline-shaped
        # fit/transform before acceptance (ballet/validation/main.py:127-129)
        enc = encoder_spec if hasattr(encoder_spec, "fit") else instantiate(encoder_spec)
        y = np.asarray(enc.fit(y).transform(y))
    return np.asarray(y, dtype=float)


def validate(
    config: dict,
    *,
    check_project_structure: bool = True,
    check_feature_api: bool = True,
    evaluate_feature_acceptance: bool = True,
    evaluate_feature_pruning: bool = True,
) -> dict:
    """Run the configured validation stages; raises the reference's
    exception types on failure and returns a stage-by-stage report."""
    report: dict = {}

    features = collect_contrib_features(config["contrib"])
    if check_project_structure:
        if not features:
            raise InvalidProjectStructure("no collectible features in contrib")
    elif not features:
        raise NoFeaturesCollectedError
    report["collected"] = [f.source for f in features]

    ds, target = _load_data(config)
    sample_rows = int(config.get("sample_rows", 2048))

    if check_feature_api:
        api_report = {}
        for f in features:
            results = run_feature_api_checks(f, ds)
            api_report[f.source] = results
            failed = [name for name, ok, _ in results if not ok]
            if failed:
                raise InvalidFeatureApi(f"{f.source} failed checks: {failed}")
        report["feature_api"] = {
            src: [name for name, ok, _ in res if ok] for src, res in api_report.items()
        }

    proposed_src = config.get("proposed")
    if proposed_src is not None:
        matches = [f for f in features if f.source == proposed_src]
        if len(matches) != 1:
            raise NoFeaturesCollectedError(f"proposed feature {proposed_src!r} not found")
        proposed = matches[0]
    else:
        proposed = features[-1]
    accepted_features = [f for f in features if f is not proposed]
    report["proposed"] = proposed.source

    needs_matrices = evaluate_feature_acceptance or evaluate_feature_pruning
    if needs_matrices:
        y = _target_vector(
            ds, target, sample_rows, encoder_spec=config["data"].get("target_encoder")
        )
        cand = _feature_matrix(proposed, ds, sample_rows)
        accepted = {
            f.source or f"feature_{i}": _feature_matrix(f, ds, sample_rows)
            for i, f in enumerate(accepted_features)
        }

    # reference parity: unconfigured validators fall back to the GFSSF
    # pair (the reference project template's defaults)
    vconf = config.get("validation", {})

    if evaluate_feature_acceptance:
        accepter = instantiate(
            vconf.get("feature_accepter", "ballet_ray.validation.accepters.GFSSFAccepter")
        )
        ok = call_judge(accepter, candidate=cand, accepted=accepted, y=y)
        report["accepted"] = bool(ok)
        if not ok:
            raise FeatureRejected(proposed.source)

    if evaluate_feature_pruning:
        pruner = instantiate(
            vconf.get("feature_pruner", "ballet_ray.validation.accepters.GFSSFPruner")
        )
        all_feats = {**accepted, proposed.source or "__proposed__": cand}
        redundant = pruner.prune(all_feats, y)
        report["redundant"] = list(redundant)

    return report
