"""ballet_ray — a from-scratch Ray-Data-native feature-engineering engine.

Re-expresses the capabilities of the reference library ballet/ballet
(Feature / FeatureEngineeringPipeline fit-transform semantics, the
``ballet.eng`` transformer-step library, validation-side accepters and
entropy/MI kernels) as idiomatic Ray Data pipelines:

- every Feature compiles to ``map_batches`` over zero-copy Arrow batches,
- fitted (stateful) transformers run a distributed fit pass
  (``Dataset.aggregate`` / ``groupby``) that produces a small broadcastable
  ``FittedState``; the transform pass is stateless ``map_batches`` closing
  over that state (or an actor pool when the state is heavy),
- keyed / windowed operators (lag, lead, rolling, ffill, sessionize) run
  in a single hash-bucket co-partition pass with vectorized numpy kernels,
- point-in-time (as-of) joins co-partition both sides by entity-key bucket
  and merge within buckets, with explicit skew handling for hot keys,
- everything streams: no stage materializes the full dataset.

Nothing here is a port: the reference is a single-process pandas library
(see SURVEY.md); this engine is designed for a multi-node Ray cluster
streaming ~100 TB of pre-tokenized Parquet through the object store.
"""

__version__ = "0.4.0"  # round-numbered: bumped each build round

from ballet_ray.feature import Feature
from ballet_ray.pipeline import EncoderPipeline, FeatureEngineeringPipeline

RANDOM_STATE = 1754  # mirrors reference ballet/util/__init__.py:18

__all__ = [
    "EncoderPipeline",
    "Feature",
    "FeatureEngineeringPipeline",
    "RANDOM_STATE",
]
