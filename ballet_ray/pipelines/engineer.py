"""engineer_features — the reference's top-level data path (SURVEY.md §3.1).

Reference: make_engineer_features(pipeline, encoder, load_data) returns a
function producing EngineerFeaturesResult(X_df, features, pipeline, X,
y_df, encoder, y) — ballet/pipeline.py:84-119. Here the frames are lazy
Datasets and the "feature matrix" is the transformed Dataset's feature
columns; ``write`` materializes to partitioned Parquet + a manifest.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from ballet_ray.pipeline import EncoderPipeline, FeatureEngineeringPipeline, dataset_schema


@dataclass
class EngineerFeaturesResult:
    X_ds: Any  # input Dataset
    features: list
    pipeline: FeatureEngineeringPipeline
    X: Any  # transformed Dataset (input + feature columns)
    y_ds: Any = None
    encoder: EncoderPipeline | None = None
    y: Any = None
    feature_columns: list[str] = field(default_factory=list)


def engineer_features(
    features,
    X_ds,
    *,
    y_ds=None,
    encoder_features=None,
    keep: str | list[str] = "all",
) -> EngineerFeaturesResult:
    """Fit the feature pipeline on X (and the encoder pipeline on y), then
    transform both — the reference's engineer_features with Datasets."""
    pipeline = FeatureEngineeringPipeline(features)
    in_cols = set(dataset_schema(X_ds).names)
    X = pipeline.fit_transform(X_ds, keep=keep)
    feat_cols = [c for c in dataset_schema(X).names if c not in in_cols]

    encoder = None
    y = None
    if y_ds is not None:
        encoder = EncoderPipeline(encoder_features or [])
        y = encoder.fit_transform(y_ds)

    return EngineerFeaturesResult(
        X_ds=X_ds,
        features=list(pipeline.features),
        pipeline=pipeline,
        X=X,
        y_ds=y_ds,
        encoder=encoder,
        y=y,
        feature_columns=feat_cols,
    )
