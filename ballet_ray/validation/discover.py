"""Feature discovery — per-feature summary statistics over a Dataset.

Reference: ballet/discovery.py:102-212 (discover) and _summarize_feature
(:24-99): per feature report mean/std/var/min/median/max, nunique, and
(expensive path) mutual information with the target and conditional MI
versus the other features. Distributed parts use Dataset aggregates; the
information measures run on a bounded driver-side sample like the
reference (which subsamples too).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ballet_ray.feature import Feature
from ballet_ray.pipeline import FeatureEngineeringPipeline, dataset_schema
from ballet_ray.validation.entropy import (
    estimate_conditional_information,
    estimate_mutual_information,
)


def _feature_values_sample(feature: Feature, ds, cap: int) -> np.ndarray:
    pipe = FeatureEngineeringPipeline([feature])
    out = pipe.fit_transform(ds)
    new_cols = [c for c in dataset_schema(out).names if c not in dataset_schema(ds).names]
    pdf = out.select_columns(new_cols).limit(cap).to_pandas()
    return pdf.to_numpy(dtype=float)


def discover(
    features: list[Feature],
    ds,
    y_col: str | None = None,
    *,
    input: str | None = None,
    primitive: str | None = None,
    sample_cap: int = 2000,
    expensive_stats: bool = False,
) -> pd.DataFrame:
    """One row per feature with summary statistics (and MI when
    ``expensive_stats`` or a small feature count, like the reference).

    Query operators (reference ballet/discovery.py:158-166): ``input``
    keeps only features whose input is/contains the given column
    (callable selectors never match); ``primitive`` keeps only features
    whose transformer uses a primitive with that class/function name."""
    from ballet_ray.transformer import get_transformer_primitives

    def _keep(f: Feature) -> bool:
        if input is not None:
            if callable(f.input) and not isinstance(f.input, (str, list, tuple)):
                return False
            ins = [f.input] if isinstance(f.input, str) else list(f.input)
            if input not in ins:
                return False
        if primitive is not None and primitive not in get_transformer_primitives(f.transformer):
            return False
        return True

    features = [f for f in features if _keep(f)]

    y = None
    if y_col is not None:
        y = ds.select_columns([y_col]).limit(sample_cap).to_pandas().to_numpy(dtype=float)

    mats = {id(f): _feature_values_sample(f, ds, sample_cap) for f in features}
    rows = []
    for f in features:
        z = mats[id(f)]
        rec = {
            "name": f.name or str(f.input),
            "input": f.input if isinstance(f.input, str) else list(f.input) if not callable(f.input) else "<callable>",
            "primitives": get_transformer_primitives(f.transformer),
            "ncols": z.shape[1],
            "mean": float(np.nanmean(z)),
            "std": float(np.nanstd(z)),
            "var": float(np.nanvar(z)),
            "min": float(np.nanmin(z)),
            "median": float(np.nanmedian(z)),
            "max": float(np.nanmax(z)),
            "nunique": int(len(np.unique(z[~np.isnan(z)]))),
        }
        if y is not None:
            n = min(len(z), len(y))
            rec["mutual_information"] = estimate_mutual_information(z[:n], y[:n])
            if expensive_stats:
                others = [mats[id(g)] for g in features if g is not f]
                if others:
                    zz = np.concatenate([m[:n] for m in others], axis=1)
                    rec["conditional_mutual_information"] = estimate_conditional_information(
                        z[:n], y[:n], zz
                    )
        rows.append(rec)
    return pd.DataFrame(rows)
