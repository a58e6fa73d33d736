"""Feature definition — the reference's core abstraction, Ray-Data-shaped.

A reference Feature is ``(input, transformer, output)`` (ballet/feature.py:47-135):
a learned function mapping raw variables of one instance to feature values.
Here a Feature compiles to one or more Dataset stages; features whose
transforms are all stateless-and-batch-local fuse into a single
``map_batches`` over Arrow batches (columnar append is free), keyed/windowed
features join the pipeline's single co-partition pass.
"""

from __future__ import annotations

import re
from typing import Callable, Iterable

import pyarrow as pa

from ballet_ray.transformer import Transform, desugar_transformer, validate_transform_api


def _slugify(name: str) -> str:
    return re.sub(r"\W+", "_", name.strip().lower()).strip("_")


class Feature:
    """input → transformer → named output columns.

    input: a column name, list of names, or callable(schema)->list[str]
    (callable column selectors per ballet/feature.py:26-31).
    transformer: None | callable | Transform | list thereof (desugaring per
    ballet/transformer.py:290-309).
    output: optional output column name(s) (alias, ballet/feature.py:61-64).
    """

    def __init__(
        self,
        input,
        transformer=None,
        name: str | None = None,
        description: str | None = None,
        output: str | list[str] | None = None,
        source: str | None = None,
        options: dict | None = None,
    ) -> None:
        if not (
            isinstance(input, str)
            or callable(input)
            or (isinstance(input, Iterable) and all(isinstance(c, str) for c in input))
        ):
            raise TypeError("input must be str, iterable of str, or callable(schema)->cols")
        self.input = input
        self.transformer: Transform = desugar_transformer(transformer)
        validate_transform_api(self.transformer)
        self.name = name
        self.description = description
        self.output = [output] if isinstance(output, str) else (list(output) if output else None)
        self.source = source
        self.options = options or {}

    # ------------------------------------------------------------------
    def resolve_input(self, schema: pa.Schema) -> list[str]:
        if isinstance(self.input, str):
            cols = [self.input]
        elif callable(self.input) and not isinstance(self.input, (list, tuple)):
            cols = list(self.input(schema))
        else:
            cols = list(self.input)
        missing = [c for c in cols if c not in schema.names]
        if missing:
            raise KeyError(f"feature {self.name or self.input}: missing input columns {missing}")
        return cols

    def output_names(self, schema: pa.Schema) -> list[str]:
        cols = self.resolve_input(schema)
        inferred = self.transformer.output_names(cols)
        if self.output is not None:
            if len(self.output) == 1 and len(inferred) > 1:
                return [f"{self.output[0]}_{j}" for j in range(len(inferred))]
            if len(self.output) != len(inferred):
                raise ValueError(
                    f"feature {self.name}: output alias count {len(self.output)} "
                    f"!= produced columns {len(inferred)}"
                )
            return list(self.output)
        if self.name:
            slug = _slugify(self.name)
            return [slug] if len(inferred) == 1 else [f"{slug}_{j}" for j in range(len(inferred))]
        return inferred

    def transform_table(self, table: pa.Table, schema: pa.Schema | None = None) -> pa.Table:
        schema = schema or table.schema
        cols = self.resolve_input(schema)
        out = self.transformer.transform_table(table, cols)
        names = self.output_names(schema)
        if list(out.column_names) != names:
            out = out.rename_columns(names)
        return out

    # -- reference API conveniences (ballet/feature.py:85-135: fit/transform
    # delegate to a singleton one-feature pipeline) ---------------------
    def as_feature_engineering_pipeline(self):
        from ballet_ray.pipeline import FeatureEngineeringPipeline

        return FeatureEngineeringPipeline([self])

    def fit(self, ds):
        self._pipeline = self.as_feature_engineering_pipeline().fit(ds)
        return self

    def transform(self, ds):
        if not hasattr(self, "_pipeline"):
            raise RuntimeError("Feature.transform called before fit")
        return self._pipeline.transform(ds)

    def fit_transform(self, ds):
        return self.fit(ds).transform(ds)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Feature(input={self.input!r}, transformer={type(self.transformer).__name__}, output={self.output})"
