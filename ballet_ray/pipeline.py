"""FeatureEngineeringPipeline — compile Features into Ray Data stages.

Reference semantics (ballet/pipeline.py:19-71): an ordered collection of
Features; fit fits every feature, transform concatenates per-feature outputs
column-wise; an empty feature list degenerates to a single NullTransformer
feature (ballet/pipeline.py:27-31). Output-name aliasing per
ballet/pipeline.py:48-65.

Compilation (Ray-Data-first, not a port):

1. **fit pass** — all transforms that can express their fit as aggregate
   requests are batched into ONE ``Dataset.aggregate`` scan (FitPlanner);
   transforms with shuffle-shaped fits (per-group, chains) fit themselves.
2. **batch pass** — every stateless/fitted batch-local feature fuses into a
   single ``map_batches(batch_format='pyarrow')`` that appends columns to
   the Arrow batch (columnar concat is free). Later features may read
   earlier features' outputs within the fused stage.
3. **keyed pass(es)** — all keyed/windowed features sharing the same
   (entity key, order key) run in one hash-bucket co-partition shuffle
   (stages/windows.py:apply_keyed).
"""

from __future__ import annotations

import pyarrow as pa

from ballet_ray.feature import Feature
from ballet_ray.stages.windows import KeyedTransform, apply_keyed
from ballet_ray.transformer import Transform


def dataset_schema(ds) -> pa.Schema:
    """Arrow schema of a Dataset (cheap for parquet reads; pandas-backed
    datasets fall back to peeking one row)."""
    s = ds.schema(fetch_if_missing=True)
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    try:
        return pa.schema([pa.field(n, t) for n, t in zip(s.names, s.types)])
    except TypeError:
        # pandas block types (numpy dtypes / python classes): peek one row
        tbl = ds.limit(1).to_arrow_refs()
        import ray as _ray

        first = _ray.get(tbl[0])
        return first.schema


def transform_dataset_single(ds, transform: Transform, cols: list[str]):
    """Apply one transform to a Dataset, returning ONLY its output columns
    (used for chain fits and feature-API checks)."""
    if isinstance(transform, KeyedTransform):
        names = transform.output_names(cols)
        out = apply_keyed(
            ds, [(transform, cols, names)], transform.key, transform.order_by
        )
        return out.select_columns(names)
    return ds.map_batches(
        lambda t, tr=transform, cc=list(cols): tr.transform_table(t, cc),
        batch_format="pyarrow",
    )


def _apply_fused_plan(table: pa.Table, plan) -> pa.Table:
    """Apply the fused batch-feature plan to one Arrow batch."""
    out = table
    for tr, cols, names in plan:
        res = tr.transform_table(out, cols)
        if list(res.column_names) != names:
            res = res.rename_columns(names)
        for cn in res.column_names:
            col = res.column(cn)
            if cn in out.column_names:
                out = out.drop_columns([cn])
            out = out.append_column(cn, col)
    return out


class FusedBatchStage:
    """Actor-pool variant of the fused batch stage: the plan (including any
    heavy fitted state — large category dictionaries, per-group transformer
    maps) is deserialized ONCE per actor in ``__init__`` and amortized
    across every batch the actor processes."""

    def __init__(self, plan):
        self.plan = plan

    def __call__(self, table: pa.Table) -> pa.Table:
        return _apply_fused_plan(table, self.plan)


class FeatureEngineeringPipeline:
    """Ordered Features → one fitted, reusable Dataset-to-Dataset function.

    ``actor_concurrency``: when set, the fused batch stage runs as an actor
    pool (``map_batches(FusedBatchStage, concurrency=...)``) so fitted state
    ships to each worker once instead of per task — use for heavy-state
    encoders. ``batch_size`` tunes batch granularity for both modes."""

    def __init__(
        self,
        features,
        *,
        num_buckets: int = 64,
        skew_threshold: int | None = None,
        slice_target: int = 250_000,
        hot_sample_frac: float = 1.0,
        actor_concurrency: int | tuple[int, int] | None = None,
        batch_size: int | None = None,
    ):
        if features is None:
            features = []
        if isinstance(features, Feature):
            features = [features]
        features = list(features)
        if not features:
            from ballet_ray.stages.core import NullTransform

            # reference: empty pipeline = single null feature (ballet/pipeline.py:27-31)
            features = [Feature(input=[], transformer=NullTransform(), name="null")]
        self.features = features
        self.num_buckets = num_buckets
        self.skew_threshold = skew_threshold
        self.slice_target = slice_target
        self.hot_sample_frac = hot_sample_frac
        self.actor_concurrency = actor_concurrency
        self.batch_size = batch_size
        self._fitted = False

    # ------------------------------------------------------------------
    def _plan(self, schema: pa.Schema):
        batch_feats: list[tuple[Feature, list[str], list[str]]] = []
        keyed_groups: dict[tuple, list[tuple[KeyedTransform, list[str], list[str]]]] = {}
        # schema grows as batch features append columns
        names = list(schema.names)
        virtual = pa.schema(
            [schema.field(n) for n in schema.names]
        )
        for f in self.features:
            cols = f.resolve_input(virtual)
            t = f.transformer
            if isinstance(t, KeyedTransform):
                outs = f.output_names(virtual)
                keyed_groups.setdefault(t.partition_spec(), []).append((t, cols, outs))
            else:
                outs = f.output_names(virtual)
                batch_feats.append((f, cols, outs))
            for o, typ in zip(outs, [pa.float64()] * len(outs)):
                if o not in names:
                    virtual = virtual.append(pa.field(o, typ))
                    names.append(o)
        return batch_feats, keyed_groups

    # ------------------------------------------------------------------
    def fit(self, ds):
        from ballet_ray.state.fitstate import FitPlanner

        schema = dataset_schema(ds)
        base_names = set(schema.names)
        virtual = schema
        planner = FitPlanner()
        direct_fits = []  # (transform, cols, prior batch plan)
        applied: list[tuple[Transform, list[str], list[str]]] = []
        for f in self.features:
            t = f.transformer
            try:
                cols = f.resolve_input(virtual)
            except KeyError:
                if t.requires_fit:
                    raise
                # stateless feature whose inputs are absent from a narrow
                # fit dataset (stats_ds): nothing to fit, skip it here
                continue
            derived = any(c not in base_names for c in cols)
            if t.requires_fit:
                if not derived and t.agg_requests(cols) and type(t).fit is Transform.fit:
                    planner.add(t, cols)
                else:
                    direct_fits.append((t, cols, list(applied)))
            # grow the virtual schema with this feature's (eventual) outputs
            try:
                outs = f.output_names(virtual)
            except Exception:
                outs = []
            for o in outs:
                if o not in virtual.names:
                    virtual = virtual.append(pa.field(o, pa.float64()))
            if not isinstance(t, KeyedTransform):
                applied.append((t, cols, outs))
        planner.run(ds)
        for t, cols, prior in direct_fits:
            fit_ds = ds
            if any(c not in base_names for c in cols):
                # lazily apply the preceding batch features so derived input
                # columns exist during this transform's fit scan
                plan = [p for p in prior if p[0] is not t]

                def _apply_prior(table, plan=plan):
                    out = table
                    for tr, cc, names in plan:
                        res = tr.transform_table(out, cc)
                        if list(res.column_names) != names and len(res.column_names) == len(names):
                            res = res.rename_columns(names)
                        for cn in res.column_names:
                            if cn in out.column_names:
                                out = out.drop_columns([cn])
                            out = out.append_column(cn, res.column(cn))
                    return out

                fit_ds = ds.map_batches(_apply_prior, batch_format="pyarrow")
            t.fit(fit_ds, cols)
        self._fitted = True
        return self

    def transform(self, ds, keep: list[str] | str = "all", stats_ds=None):
        """keep="all" preserves every input column; a column list keeps only
        those plus the feature columns — and, crucially, lets the planner
        DROP unneeded payload columns (token lists) before the keyed
        co-partition shuffle, which is the reference's feature-matrix
        semantics (ballet/pipeline.py:48-65) and avoids moving bytes the
        output never uses."""
        schema = dataset_schema(ds)
        batch_feats, keyed_groups = self._plan(schema)

        if batch_feats:
            plan = [(f.transformer, cols, outs) for f, cols, outs in batch_feats]
            if self.actor_concurrency is not None:
                ds = ds.map_batches(
                    FusedBatchStage,
                    fn_constructor_kwargs={"plan": plan},
                    batch_format="pyarrow",
                    batch_size=self.batch_size,
                    concurrency=self.actor_concurrency,
                )
            else:
                ds = ds.map_batches(
                    lambda t, p=plan: _apply_fused_plan(t, p),
                    batch_format="pyarrow",
                    batch_size=self.batch_size,
                )

        if keep != "all" and keyed_groups:
            # shed columns the keyed passes and the final output don't need
            # BEFORE the shuffle (wide payloads dominate shuffle bytes)
            base_keep = [keep] if isinstance(keep, str) else list(keep)
            needed = set(base_keep)
            for (k, ob), transforms in keyed_groups.items():
                needed |= {k, *ob}
                for _, cols, _ in transforms:
                    needed |= set(cols)
            produced = {o for _, _, outs in batch_feats for o in outs}
            needed |= produced  # batch feature outputs are part of the matrix
            avail = set(schema.names) | produced
            ds = ds.select_columns(sorted(needed & avail))

        for (key, order_by), transforms in keyed_groups.items():
            ds = apply_keyed(
                ds,
                transforms,
                key,
                order_by,
                num_buckets=self.num_buckets,
                skew_threshold=self.skew_threshold,
                slice_target=self.slice_target,
                hot_sample_frac=self.hot_sample_frac,
                stats_ds=stats_ds,
            )

        if keep != "all":
            feat_cols = [o for _, _, outs in batch_feats for o in outs] + [
                o for ts in keyed_groups.values() for _, _, outs in ts for o in outs
            ]
            base = [keep] if isinstance(keep, str) else list(keep)
            ds = ds.select_columns(base + feat_cols)
        return ds

    def fit_transform(self, ds, keep: list[str] | str = "all", stats_ds=None):
        # narrow stats_ds (column-pruned read of the same rows) accelerates
        # the fit pass and the keyed pre-passes; results are identical
        self.fit(stats_ds if stats_ds is not None else ds)
        return self.transform(ds, keep=keep, stats_ds=stats_ds)

    def output_names(self, schema: pa.Schema) -> list[str]:
        batch_feats, keyed_groups = self._plan(schema)
        return [o for _, _, outs in batch_feats for o in outs] + [
            o for ts in keyed_groups.values() for _, _, outs in ts for o in outs
        ]

    # -- fitted-state persistence (reference pickles whole pipelines,
    # ballet/util/io.py:93-117: save_model/load_model) --------------------
    def save(self, path: str) -> str:
        """Persist the pipeline INCLUDING fitted state (cloudpickle — the
        same serializer Ray ships UDFs with, so anything that ran
        distributed also saves). Load with ``FeatureEngineeringPipeline.load``
        and call ``transform`` on new data without refitting."""
        from ray import cloudpickle

        with open(path, "wb") as f:
            cloudpickle.dump(self, f)
        return path

    @classmethod
    def load(cls, path: str) -> "FeatureEngineeringPipeline":
        from ray import cloudpickle

        with open(path, "rb") as f:
            obj = cloudpickle.load(f)
        if not isinstance(obj, FeatureEngineeringPipeline):
            raise TypeError(f"{path} does not contain a pipeline: {type(obj).__name__}")
        return obj


class EncoderPipeline(FeatureEngineeringPipeline):
    """Target-encoder pipeline (reference ballet/encoder.py:7-55): the same
    machinery applied to the target column(s)."""
