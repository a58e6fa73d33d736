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


def _input_row_priority(t, base_cols):
    """Deterministic uint64 priority per row from the INPUT columns' content
    — identical across calls, partitionings and transform order, so every
    feature (and the target) draws the SAME sample rows. Unhashable columns
    (nested lists etc.) are skipped; any hashable subset identifies rows."""
    import pyarrow as pa

    from ballet_ray.functions.hashing import mix
    from ballet_ray.functions.partition import stable_hash_array

    h = np.full(len(t), np.uint64(0xCBF29CE484222325))
    for c in base_cols:
        if c not in t.column_names:
            continue
        try:
            hc = stable_hash_array(t.column(c).to_numpy(zero_copy_only=False))
        except Exception:
            continue
        h = mix(h, hc)
    return h


def _priority_sample_pdf(out, base_cols: list[str], cap: int) -> pd.DataFrame:
    """The ``cap`` rows with the smallest input-content priority, sorted by
    priority — an unbiased deterministic sample. Unlike ``limit(cap)`` (a
    PREFIX of the first blocks — biased on time/source-sorted data, the
    exact bug class fixed in the imputers' reservoir, cleaning.py) the
    winners span all blocks uniformly. Per-batch local top-cap bounds what
    the sort shuffle carries; the driver sees only ``cap`` rows."""
    import pyarrow as pa

    def candidates(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("__prio", pa.array([], type=pa.uint64()))
        pr = _input_row_priority(t, base_cols)
        if len(t) > cap:
            keep = np.sort(np.argpartition(pr, cap - 1)[:cap])
            t = t.take(pa.array(keep))
            pr = pr[keep]
        return t.append_column("__prio", pa.array(pr))

    pdf = (
        out.map_batches(candidates, batch_format="pyarrow")
        .sort("__prio")
        .limit(cap)
        .to_pandas()
    )
    return pdf.drop(columns="__prio")


def _feature_values_sample(feature: Feature, ds, cap: int) -> np.ndarray:
    pipe = FeatureEngineeringPipeline([feature])
    out = pipe.fit_transform(ds)
    base_cols = list(dataset_schema(ds).names)
    new_cols = [c for c in dataset_schema(out).names if c not in base_cols]
    pdf = _priority_sample_pdf(out, base_cols, cap)
    return pdf[new_cols].to_numpy(dtype=float)


def _target_values_sample(ds, y_col: str, cap: int) -> np.ndarray:
    """The target drawn from the SAME priority-sampled rows as the
    features (the priority is a pure function of input row content)."""
    base_cols = list(dataset_schema(ds).names)
    pdf = _priority_sample_pdf(ds, base_cols, cap)
    return pdf[[y_col]].to_numpy(dtype=float)


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
        y = _target_values_sample(ds, y_col, sample_cap)

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
