"""Flagship pipeline: raw documents → canonical token table → feature matrix.

Mirrors the reference's engineer_features data path (ballet/pipeline.py:84-119)
— load, fit the feature pipeline, transform, emit the feature matrix — but as
one streaming Ray Data pipeline:

read_parquet → hash-tokenize (text → tokens list<int32>, n_tok) →
fused batch features (token_count invariant, log1p, count-encoded lang)
→ per-source fitted standardization (groupwise z-score) → feature matrix.
"""

from __future__ import annotations

import ray.data as rd

from ballet_ray.feature import Feature
from ballet_ray.pipeline import FeatureEngineeringPipeline
from ballet_ray.stages.core import Log1p, TokenCount
from ballet_ray.stages.encoders import CountEncoder, StandardScaler
from ballet_ray.stages.groupwise import GroupwiseTransform
from ballet_ray.stages.text import hash_tokenize


def flagship_features(sf_dir: str):
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"])
    tokenized = docs.map_batches(lambda t: hash_tokenize(t), batch_format="pyarrow")
    pipe = FeatureEngineeringPipeline(
        [
            Feature("tokens", TokenCount(), output="token_count"),
            Feature("n_tok", Log1p(), output="log_n_tok"),
            Feature("lang", CountEncoder(), output="lang_count"),
            Feature("n_tok", GroupwiseTransform(StandardScaler(), groupby="source"), output="n_tok_z"),
        ]
    )
    out = pipe.fit_transform(tokenized)
    return out.select_columns(
        ["doc_id", "tokens", "n_tok", "source", "token_count", "log_n_tok", "lang_count", "n_tok_z"]
    )
