"""Checkpoint-resumable backfill runs with per-partition lineage manifests.

North rule: "resumable from checkpoint with per-partition lineage +
metrics". The run is two phases:

Phase 1 — *bucketing shuffle, materialized once*: read the input, fit the
feature pipeline (fitted state pickled to ``out/state/fitted.pkl`` so a
resume never refits), assign ``part = stable_hash(key) % P``, and write
``out/buckets/part=<k>/`` partitioned Parquet. This is the only all-to-all
move of the payload; a marker file records completion.

Phase 2 — *embarrassingly parallel per-partition feature materialization*:
every partition not yet covered by a manifest is read back, transformed
bucket-locally (batch features + keyed window features computed with the
same kernels as the streaming path — each bucket holds whole entities), and
written ATOMICALLY (temp dir + rename) to ``out/features/part=<k>/`` with a
lineage manifest ``out/manifest/part-<k>.json`` recording input files, row
and token counts, a content checksum, and wall time.

Resume = rerun the same command: phase 1 is skipped via its marker, phase 2
processes only partitions without manifests. A torn partition (temp dir
left behind, no manifest) is re-done from its bucket — output is
deterministic, so the rerun converges to the same bytes.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ballet_ray.functions.partition import stable_hash_array
from ballet_ray.stages.windows import KeyedTransform


def _checksum_table(table: pa.Table) -> str:
    """Order-insensitive content checksum over a few stable columns."""
    import pandas as pd

    h = np.uint64(0)
    for name in sorted(table.column_names):
        col = table.column(name)
        if pa.types.is_list(col.type) or pa.types.is_fixed_size_list(col.type):
            arr = col.combine_chunks().flatten().to_numpy(zero_copy_only=False)
        else:
            arr = col.to_numpy(zero_copy_only=False)
        hv = pd.util.hash_array(np.asarray(arr if arr.dtype.kind != "O" else arr.astype(object)), categorize=False)
        with np.errstate(over="ignore"):
            h = h + np.bitwise_xor.reduce(hv) + np.uint64(len(hv))
    return f"{int(h):016x}"


def transform_bucket_local(pipe, table: pa.Table, *, hot: bool = False, carry: dict | None = None) -> pa.Table:
    """Apply a fitted FeatureEngineeringPipeline to one in-memory bucket:
    batch features append columns; keyed features compute bucket-locally.
    Non-hot buckets hold whole entities; hot buckets are single-entity time
    slices whose exact window semantics come from the slice's ``carry``
    state (stages/windows.py:compute_carry_extended)."""
    from ballet_ray.stages.windows import compute_carry_extended

    out = table
    for f in pipe.features:
        cols = f.resolve_input(out.schema)
        t = f.transformer
        names = f.output_names(out.schema)
        if isinstance(t, KeyedTransform) and hot:
            sort_keys = [t.key, *t.order_by]
            order = pc.sort_indices(
                out.select(sort_keys), sort_keys=[(k, "ascending") for k in sort_keys]
            ).to_numpy(zero_copy_only=False)
            narrow_cols = {}
            for cname in dict.fromkeys([*sort_keys, *cols]):
                col = out.column(cname)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                if pa.types.is_timestamp(col.type):
                    v = col.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)[order]
                    narrow_cols[cname] = pa.array(v.astype("datetime64[us]"))
                else:
                    narrow_cols[cname] = pa.array(col.to_numpy(zero_copy_only=False)[order])
            sorted_tbl = pa.table(narrow_cols)
            inv = np.empty(len(order), dtype=np.int64)
            inv[order] = np.arange(len(order))
            outs = compute_carry_extended(sorted_tbl, t, cols, t.key, t.order_by[0], carry)
            for want, (have, arr) in zip(names, outs.items()):
                out = out.append_column(want, pa.array(np.asarray(arr)[inv]))
        elif isinstance(t, KeyedTransform):
            # compute in (key, order) sort order over ONLY the narrow columns
            # the kernel reads (never sorting the token payload), then
            # scatter back so appended columns align with `out`'s row order
            sort_keys = [t.key, *t.order_by]
            order = pc.sort_indices(
                out.select(sort_keys), sort_keys=[(k, "ascending") for k in sort_keys]
            ).to_numpy(zero_copy_only=False)
            narrow_cols = {}
            for cname in dict.fromkeys([*sort_keys, *cols]):
                col = out.column(cname)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                if pa.types.is_timestamp(col.type):
                    vals_np = col.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)[order]
                    narrow_cols[cname] = pa.array(vals_np.astype("datetime64[us]"))
                else:
                    narrow_cols[cname] = pa.array(col.to_numpy(zero_copy_only=False)[order])
            sorted_tbl = pa.table(narrow_cols)
            from ballet_ray.functions import windows_np as wnp

            codes = wnp.group_codes(sorted_tbl.column(t.key).to_numpy(zero_copy_only=False))
            starts = wnp.group_starts(codes)
            outs = t.transform_sorted(sorted_tbl, codes, starts, cols)
            inv = np.empty(len(order), dtype=np.int64)
            inv[order] = np.arange(len(order))
            for want, (have, arr) in zip(names, outs.items()):
                vals = np.asarray(arr)[inv]
                out = out.append_column(want, pa.array(vals))
        else:
            res = t.transform_table(out, cols)
            if list(res.column_names) != names and len(res.column_names) == len(names):
                res = res.rename_columns(names)
            for cn in res.column_names:
                if cn in out.column_names:
                    out = out.drop_columns([cn])
                out = out.append_column(cn, res.column(cn))
    return out


class CheckpointedBackfill:
    def __init__(
        self,
        out_dir: str,
        *,
        key: str = "doc_id",
        num_partitions: int = 32,
        skew_threshold: int | None = None,
        slice_target: int = 250_000,
        hot_sample_frac: float = 1.0,
        fit_columns: list[str] | None = None,
    ):
        self.out_dir = out_dir
        self.key = key
        self.num_partitions = num_partitions
        self.skew_threshold = skew_threshold
        self.slice_target = slice_target
        self.hot_sample_frac = hot_sample_frac
        self.fit_columns = fit_columns
        self.buckets_dir = os.path.join(out_dir, "buckets")
        self.features_dir = os.path.join(out_dir, "features")
        self.manifest_dir = os.path.join(out_dir, "manifest")
        self.state_dir = os.path.join(out_dir, "state")

    # ------------------------------------------------------------------
    def _keyed_specs(self, pipe):
        """(order_col, transforms) of the pipeline's keyed features on our
        partition key (the only ones phase-1 slicing must respect)."""
        transforms = []
        order_col = None
        for f in pipe.features:
            t = f.transformer
            if isinstance(t, KeyedTransform) and t.key == self.key and t.order_by:
                transforms.append((t, [c for c in ([f.input] if isinstance(f.input, str) else list(f.input))], None))
                order_col = t.order_by[0]
        return order_col, transforms

    def _hot_state(self, pipe, input_path: str):
        """Compute (or load from the run's state dir) the hot-entity plan
        and per-slice carries — persisted so a resume sees identical
        partitioning."""
        import pickle

        path = os.path.join(self.state_dir, "hot.pkl")
        os.makedirs(self.state_dir, exist_ok=True)
        if os.path.exists(path):
            with open(path, "rb") as fh:
                return pickle.load(fh)
        hot_plan, hot_ids, carries = {}, {}, {}
        order_col, transforms = self._keyed_specs(pipe)
        if self.skew_threshold is not None and order_col is not None:
            import ray.data as rd

            from ballet_ray.stages.asof import _hot_key_plan
            from ballet_ray.stages.windows import (
                RollingMeanTime,
                Sessionize,
                _summarize_hot_slices,
            )

            value_cols = sorted({c for _, cols, _ in transforms for c in cols})
            narrow = rd.read_parquet(
                input_path, columns=list(dict.fromkeys([self.key, order_col, *value_cols]))
            )
            hot_plan = _hot_key_plan(
                narrow, self.key, order_col, self.skew_threshold, self.slice_target,
                sample_frac=self.hot_sample_frac,
            )
            range_us = max(
                (t.range_us for t, _, _ in transforms if isinstance(t, RollingMeanTime)),
                default=0,
            )
            if range_us:
                hot_plan = {
                    k: (t0, max(slice_us, range_us)) for k, (t0, slice_us) in hot_plan.items()
                }
            hot_ids = {k: i for i, k in enumerate(hot_plan)}
            if hot_plan:
                w_max = max((t.lookback for t, _, _ in transforms), default=0)
                gaps = sorted({t.gap_us for t, _, _ in transforms if isinstance(t, Sessionize)})
                carries = _summarize_hot_slices(
                    narrow, transforms, self.key, (order_col,), hot_plan, hot_ids, max(w_max, 1), gaps,
                    range_us=range_us,
                )
        state = {"hot_plan": hot_plan, "hot_ids": hot_ids, "carries": carries, "order_col": order_col}
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            pickle.dump(state, fh)
        os.replace(tmp, path)
        return state

    # ------------------------------------------------------------------
    def _completed_parts(self) -> set[int]:
        if not os.path.isdir(self.manifest_dir):
            return set()
        out = set()
        for f in os.listdir(self.manifest_dir):
            if f.startswith("part-") and f.endswith(".json"):
                out.add(int(f[len("part-") : -len(".json")]))
        return out

    def _fit_or_load(self, pipe, ds):
        import pickle

        os.makedirs(self.state_dir, exist_ok=True)
        path = os.path.join(self.state_dir, "fitted.pkl")
        if os.path.exists(path):
            with open(path, "rb") as fh:
                return pickle.load(fh)
        pipe.fit(ds)
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            pickle.dump(pipe, fh)
        os.replace(tmp, path)
        return pipe

    def _phase1_bucketize(self, input_path: str, hot_state: dict):
        import ray.data as rd

        marker = os.path.join(self.buckets_dir, "_COMPLETE")
        if os.path.exists(marker):
            return
        if os.path.isdir(self.buckets_dir):
            shutil.rmtree(self.buckets_dir)  # torn phase 1 → redo
        os.makedirs(self.buckets_dir, exist_ok=True)
        ds = rd.read_parquet(input_path)
        key, P = self.key, self.num_partitions
        hot_plan = hot_state["hot_plan"]
        hot_ids = hot_state["hot_ids"]
        order_col = hot_state["order_col"]

        def add_part(t: pa.Table) -> pa.Table:
            keys = t.column(key).to_numpy(zero_copy_only=False)
            part = (stable_hash_array(keys) % np.uint64(P)).astype(np.int64)
            if hot_plan:
                from ballet_ray.stages.windows import _ts_us_col

                ts = _ts_us_col(t.column(order_col))
                for k, (t0, slice_us) in hot_plan.items():
                    mk = keys == k
                    if mk.any():
                        sl = np.maximum((ts[mk] - t0) // slice_us, 0)
                        # hot entities get their own sliced partitions above P
                        part[mk] = P + hot_ids[k] * 1_000_000 + sl
            return t.append_column("part", pa.array(part))

        ds.map_batches(add_part, batch_format="pyarrow").write_parquet(
            self.buckets_dir, partition_cols=["part"]
        )
        with open(marker, "w") as fh:
            fh.write("ok")

    # ------------------------------------------------------------------
    def run(self, input_path: str, pipe) -> dict:
        """Execute (or resume) the backfill; returns a run summary."""
        import ray
        import ray.data as rd

        t_start = time.time()
        os.makedirs(self.features_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

        hot_state = self._hot_state(pipe, input_path)
        self._phase1_bucketize(input_path, hot_state)
        t_p1 = time.time()
        fit_ds = rd.read_parquet(input_path, columns=self.fit_columns) if self.fit_columns else rd.read_parquet(input_path)
        pipe = self._fit_or_load(pipe, fit_ds)
        t_fit = time.time()

        done = self._completed_parts()
        # partitions are whatever phase 1 wrote (hash buckets + hot slices)
        all_parts = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(self.buckets_dir)
            if d.startswith("part=")
        )
        part_dirs = {
            k: os.path.join(self.buckets_dir, f"part={k}")
            for k in all_parts
            if k not in done
        }

        features_dir, manifest_dir = self.features_dir, self.manifest_dir
        P = self.num_partitions
        carries = hot_state["carries"]
        pipe_ref = ray.put(pipe)

        @ray.remote
        def process(k: int, bucket_dir: str) -> dict:
            t0 = time.time()
            table = pq.read_table(bucket_dir)
            p = ray.get(pipe_ref)
            if k >= P:
                out = transform_bucket_local(p, table, hot=True, carry=carries.get(k - P))
            else:
                out = transform_bucket_local(p, table)
            if "part" in out.column_names:
                out = out.drop_columns(["part"])
            tmp = os.path.join(features_dir, f".tmp-part={k}")
            final = os.path.join(features_dir, f"part={k}")
            if os.path.isdir(tmp):
                shutil.rmtree(tmp)
            os.makedirs(tmp)
            pq.write_table(out, os.path.join(tmp, "data.parquet"))
            if os.path.isdir(final):
                shutil.rmtree(final)
            os.replace(tmp, final)
            man = {
                "part": k,
                "input_dir": bucket_dir,
                "input_files": sorted(os.listdir(bucket_dir)),
                "rows": out.num_rows,
                "tokens": int(pc.sum(out.column("n_tok")).as_py()) if "n_tok" in out.column_names else None,
                "checksum": _checksum_table(out),
                "wall_s": round(time.time() - t0, 3),
            }
            mtmp = os.path.join(manifest_dir, f".part-{k}.json.tmp")
            with open(mtmp, "w") as fh:
                json.dump(man, fh)
            os.replace(mtmp, os.path.join(manifest_dir, f"part-{k}.json"))
            return man

        manifests = ray.get([process.remote(k, d) for k, d in part_dirs.items()])
        return {
            "partitions_total": len(all_parts),
            "partitions_resumed": len(done),
            "partitions_processed": len(manifests),
            "rows_processed": sum(m["rows"] for m in manifests),
            "wall_s": round(time.time() - t_start, 3),
            "phase1_s": round(t_p1 - t_start, 3),
            "fit_s": round(t_fit - t_p1, 3),
            "phase2_s": round(time.time() - t_fit, 3),
        }


class CheckpointedPack:
    """Resumable tokens → training-examples job (context-window chunking +
    best-fit packing) with the same manifest contract as
    :class:`CheckpointedBackfill`.

    Chunk+pack needs NO shuffle, so the resume partition is the natural
    unit of a map-only job: a GROUP of input shard files. Every group
    without a manifest is processed as one Ray task (read → chunk_table →
    pack_table → atomic write + lineage manifest); a rerun of the same
    command skips completed groups. ``files_per_part`` bounds the task's
    working set (one group's decoded token payload).
    """

    def __init__(
        self, out_dir: str, *, max_len: int = 512, stride: int | None = None,
        pack_len: int = 2048, files_per_part: int = 2,
        tokens_col: str = "tokens", id_col: str = "doc_id",
        sep_token: int | None = None,
        objective: str | None = None, objective_rate: float = 0.5,
        noise_density: float = 0.15, mean_span_len: float = 3.0,
    ):
        if objective not in (None, "fim", "prefix_lm", "span"):
            raise ValueError("objective must be None, 'fim', 'prefix_lm' or 'span'")
        if objective == "fim" and pack_len < max_len + 3:
            raise ValueError(
                f"objective='fim' grows a window by 3 sentinels: need "
                f"pack_len >= max_len + 3 (got {pack_len} < {max_len + 3})")
        if objective == "span":
            # exact worst-case decoder length over window sizes 1..max_len
            # (T5's clamped rounding; decoder = inputs ⊕ targets = L+2·ns+1)
            import numpy as _np

            L = _np.arange(1, max_len + 1, dtype=_np.int64)
            nn = _np.clip(_np.round(L * noise_density).astype(_np.int64), 1,
                          _np.maximum(L - 1, 1))
            ns = _np.maximum(_np.round(nn / mean_span_len).astype(_np.int64), 1)
            ns = _np.minimum(_np.minimum(ns, nn), _np.maximum(L - nn, 1))
            worst = int((_np.where(L >= 2, L + 2 * ns + 1, L)).max())
            if pack_len < worst:
                raise ValueError(
                    f"objective='span' can grow a {max_len}-token window to "
                    f"{worst} tokens at these parameters: need pack_len >= "
                    f"{worst} (got {pack_len})")
        self.out_dir = out_dir
        self.examples_dir = os.path.join(out_dir, "examples")
        self.manifest_dir = os.path.join(out_dir, "manifest")
        self.max_len = max_len
        self.stride = stride
        self.pack_len = pack_len
        self.files_per_part = files_per_part
        self.tokens_col = tokens_col
        self.id_col = id_col
        self.sep_token = sep_token
        self.objective = objective
        self.objective_rate = objective_rate
        self.noise_density = noise_density
        self.mean_span_len = mean_span_len

    def _completed(self) -> set[int]:
        if not os.path.isdir(self.manifest_dir):
            return set()
        return {
            int(f.split("-", 1)[1].split(".", 1)[0])
            for f in os.listdir(self.manifest_dir)
            if f.startswith("part-") and f.endswith(".json")
        }

    def run(self, input_path: str) -> dict:
        import ray

        from ballet_ray.stages.sequences import chunk_table, pack_table

        t_start = time.time()
        os.makedirs(self.examples_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)
        files = sorted(
            os.path.join(input_path, f)
            for f in os.listdir(input_path)
            if f.endswith(".parquet")
        )
        groups = [
            files[i : i + self.files_per_part]
            for i in range(0, len(files), self.files_per_part)
        ]
        done = self._completed()
        examples_dir, manifest_dir = self.examples_dir, self.manifest_dir
        max_len, stride, pack_len = self.max_len, self.stride, self.pack_len
        tokens_col, id_col, sep_token = self.tokens_col, self.id_col, self.sep_token
        objective, objective_rate = self.objective, self.objective_rate
        noise_density, mean_span_len = self.noise_density, self.mean_span_len
        member_cols = {"prefix_lm": ("n_prefix",), "span": ("n_in",)}.get(objective, ())

        @ray.remote
        def process(k: int, group: list) -> dict:
            t0 = time.time()
            table = pa.concat_tables([pq.read_table(f, columns=[id_col, tokens_col]) for f in group])
            in_tokens = int(pc.sum(pc.list_value_length(table.column(tokens_col))).as_py() or 0)
            chunked = chunk_table(
                table, list_col=tokens_col, id_col=id_col, max_len=max_len, stride=stride
            )
            # objective transforms sit between chunking and packing — the
            # published recipes' placement (FIM: Bavarian 2022 applies to
            # context windows; span/prefix-LM: UL2's denoisers over fixed
            # windows) — keyed by (doc, chunk) so a rerun of the same
            # partition is byte-identical and resume stays consistent
            if objective == "fim":
                from ballet_ray.stages.sequences import fim_table

                chunked = fim_table(
                    chunked, tokens_col=tokens_col, id_col=id_col,
                    rate=objective_rate, chunk_col="chunk_id",
                    carry_cols=("chunk_id",),
                )
            elif objective == "prefix_lm":
                # tokens unchanged; the split point packs alongside each
                # member as n_prefix (the loss boundary)
                from ballet_ray.stages.sequences import prefix_lm_mark_table

                chunked = prefix_lm_mark_table(
                    chunked, tokens_col=tokens_col, id_col=id_col,
                    rate=objective_rate, chunk_col="chunk_id",
                    carry_cols=("chunk_id",),
                )
            elif objective == "span":
                # decoder layout: inputs ⊕ targets as one stream, n_in
                # packs alongside each member (loss on positions >= n_in)
                from ballet_ray.stages.sequences import span_corruption_table

                chunked = span_corruption_table(
                    chunked, tokens_col=tokens_col, id_col=id_col,
                    noise_density=noise_density, mean_span_len=mean_span_len,
                    chunk_col="chunk_id", carry_cols=("chunk_id",),
                    layout="decoder",
                )
            # pack in bounded slices: best-fit keeps a sorted open-pack
            # list whose insert cost grows with pack count, so one giant
            # group (250k rows -> ~33k open packs) is quadratic-ish;
            # 8k-row slices keep the list ~1k long at the cost of <0.5%
            # fill (measured), and bound the working set
            parts = []
            for lo in range(0, chunked.num_rows, 8192):
                parts.append(
                    pack_table(chunked.slice(lo, 8192), list_col=tokens_col, id_col=id_col,
                               max_len=pack_len, sep_token=sep_token, member_cols=member_cols)
                )
            packed = pa.concat_tables(parts) if parts else pack_table(
                chunked, list_col=tokens_col, id_col=id_col, max_len=pack_len,
                sep_token=sep_token, member_cols=member_cols
            )
            tmp = os.path.join(examples_dir, f".tmp-part={k}")
            final = os.path.join(examples_dir, f"part={k}")
            if os.path.isdir(tmp):
                shutil.rmtree(tmp)
            os.makedirs(tmp)
            pq.write_table(packed, os.path.join(tmp, "data.parquet"))
            if os.path.isdir(final):
                shutil.rmtree(final)
            os.replace(tmp, final)
            out_tokens = int(pc.sum(packed.column("n_tok")).as_py() or 0)
            man = {
                "part": k,
                "objective": objective,
                "input_files": [os.path.basename(f) for f in group],
                "rows_in": table.num_rows,
                "chunks": chunked.num_rows,
                "packs": packed.num_rows,
                "tokens_in": in_tokens,
                "tokens_out": out_tokens,
                "fill": round(out_tokens / max(packed.num_rows * pack_len, 1), 4),
                # scalar-column checksum: the full-payload hash re-reads
                # 4 bytes/token (7.2 s/group isolated, worse under
                # concurrent DRAM pressure) while the realistic failure a
                # manifest guards against — torn/partial partition writes —
                # is already detected by (pack_id, n_tok, n_docs) content
                "checksum": _checksum_table(packed.select([c for c in ("pack_id", "n_tok", "n_docs") if c in packed.column_names])),
                "wall_s": round(time.time() - t0, 3),
            }
            mtmp = os.path.join(manifest_dir, f".part-{k}.json.tmp")
            with open(mtmp, "w") as fh:
                json.dump(man, fh)
            os.replace(mtmp, os.path.join(manifest_dir, f"part-{k}.json"))
            return man

        todo = [(k, g) for k, g in enumerate(groups) if k not in done]
        manifests = ray.get([process.remote(k, g) for k, g in todo])
        return {
            "partitions_total": len(groups),
            "partitions_resumed": len(done),
            "partitions_processed": len(manifests),
            "packs": sum(m["packs"] for m in manifests),
            "tokens_out": sum(m["tokens_out"] for m in manifests),
            "wall_s": round(time.time() - t_start, 3),
        }
