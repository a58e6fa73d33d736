"""Feature-API conformance checks — the reference's 15-check suite
(ballet/validation/feature_api/checks.py:25-240) adapted to the Ray
engine's Feature/pipeline API. ``check_feature_api`` runs every check,
collecting (name, passed, advice) like check_from_class
(ballet/validation/common.py:264-281).
"""

from __future__ import annotations

import copy
import pickle
from typing import Iterable

import numpy as np
import pyarrow as pa

from ballet_ray.feature import Feature
from ballet_ray.pipeline import FeatureEngineeringPipeline, dataset_schema


class _Check:
    advice = "see check name"

    def __init__(self, ds):
        self.ds = ds

    def check(self, feature) -> None:
        raise NotImplementedError

    @property
    def name(self) -> str:
        return type(self).__name__


class IsFeatureCheck(_Check):
    advice = "The object needs to be an instance of ballet_ray.Feature"

    def check(self, feature):
        assert isinstance(feature, Feature)


class HasCorrectInputTypeCheck(_Check):
    advice = "input must be a string, an iterable of strings, or a callable column selector"

    def check(self, feature):
        i = feature.input
        ok = (
            isinstance(i, str)
            or callable(i)
            or (isinstance(i, Iterable) and all(isinstance(c, str) for c in i))
        )
        assert ok


class HasTransformerInterfaceCheck(_Check):
    advice = "transformer must implement fit / transform_table / fit_transform"

    def check(self, feature):
        for attr in ("fit", "transform_table", "fit_transform"):
            assert hasattr(feature.transformer, attr)


class CanMakePipelineCheck(_Check):
    advice = "FeatureEngineeringPipeline([feature]) must construct"

    def check(self, feature):
        FeatureEngineeringPipeline([feature])


class CanFitCheck(_Check):
    advice = "the feature fails when fitting on sample data"

    def check(self, feature):
        FeatureEngineeringPipeline([feature]).fit(self.ds)


class CanFitOneRowCheck(_Check):
    advice = "the feature fails when fitting on a single row"

    def check(self, feature):
        FeatureEngineeringPipeline([feature]).fit(self.ds.limit(1))


class CanTransformCheck(_Check):
    advice = "the feature fails when transforming sample data"

    def check(self, feature):
        p = FeatureEngineeringPipeline([feature]).fit(self.ds)
        p.transform(self.ds).count()


class CanTransformNewRowsCheck(_Check):
    advice = "fit on a train split must be able to transform unseen rows"

    def check(self, feature):
        train, test = self.ds.split_proportionately([0.9])
        p = FeatureEngineeringPipeline([feature]).fit(train)
        p.transform(test).count()


class CanTransformOneRowCheck(_Check):
    advice = "the fitted feature fails on a single-row dataset"

    def check(self, feature):
        p = FeatureEngineeringPipeline([feature]).fit(self.ds)
        p.transform(self.ds.limit(1)).count()


class CanFitTransformCheck(_Check):
    advice = "fit_transform must succeed on sample data"

    def check(self, feature):
        FeatureEngineeringPipeline([feature]).fit_transform(self.ds).count()


class HasCorrectOutputDimensionsCheck(_Check):
    advice = "transform must produce exactly one output row per input row"

    def check(self, feature):
        p = FeatureEngineeringPipeline([feature]).fit(self.ds)
        assert p.transform(self.ds).count() == self.ds.count()


class CanDeepcopyCheck(_Check):
    advice = "the feature must be deepcopy-able"

    def check(self, feature):
        copy.deepcopy(feature)


class CanPickleCheck(_Check):
    advice = "the feature must pickle (required for Ray serialization)"

    def check(self, feature):
        # cloudpickle, not plain pickle: Ray ships UDFs via cloudpickle, so
        # lambdas/closures in contrib modules are fine (the reference's
        # equivalent check uses dill for the same reason,
        # ballet/validation/feature_api/checks.py:196-211)
        from ray import cloudpickle

        assert cloudpickle.loads(cloudpickle.dumps(feature)) is not None


class NoMissingValuesCheck(_Check):
    advice = "the feature must not produce null/NaN values"

    def check(self, feature):
        p = FeatureEngineeringPipeline([feature]).fit(self.ds)
        out = p.transform(self.ds)
        feat_cols = [c for c in dataset_schema(out).names if c not in dataset_schema(self.ds).names]
        for batch in out.select_columns(feat_cols).iter_batches(batch_format="pyarrow"):
            for c in feat_cols:
                col = batch.column(c)
                assert col.null_count == 0
                if pa.types.is_floating(col.type):
                    assert not np.isnan(col.to_numpy(zero_copy_only=False)).any()


class NoInfiniteValuesCheck(_Check):
    advice = "the feature must not produce infinite values"

    def check(self, feature):
        p = FeatureEngineeringPipeline([feature]).fit(self.ds)
        out = p.transform(self.ds)
        feat_cols = [c for c in dataset_schema(out).names if c not in dataset_schema(self.ds).names]
        for batch in out.select_columns(feat_cols).iter_batches(batch_format="pyarrow"):
            for c in feat_cols:
                col = batch.column(c)
                if pa.types.is_floating(col.type):
                    assert not np.isinf(col.to_numpy(zero_copy_only=False)).any()


ALL_CHECKS = [
    IsFeatureCheck,
    HasCorrectInputTypeCheck,
    HasTransformerInterfaceCheck,
    CanMakePipelineCheck,
    CanFitCheck,
    CanFitOneRowCheck,
    CanTransformCheck,
    CanTransformNewRowsCheck,
    CanTransformOneRowCheck,
    CanFitTransformCheck,
    HasCorrectOutputDimensionsCheck,
    CanDeepcopyCheck,
    CanPickleCheck,
    NoMissingValuesCheck,
    NoInfiniteValuesCheck,
]


def check_feature_api(feature, ds, checks=None) -> list[tuple[str, bool, str | None]]:
    """Run every check; returns (check_name, passed, advice-if-failed)."""
    results = []
    for cls in checks or ALL_CHECKS:
        c = cls(ds)
        try:
            # each check gets a fresh deepcopy so fitted state can't leak
            c.check(copy.deepcopy(feature))
            results.append((c.name, True, None))
        except Exception:  # noqa: BLE001 — checks are expected to fail loudly
            results.append((c.name, False, c.advice))
    return results
