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


def transform_bucket_local(pipe, table: pa.Table) -> pa.Table:
    """Apply a fitted FeatureEngineeringPipeline to one in-memory bucket:
    batch features append columns; keyed features compute bucket-locally
    (valid because buckets hold whole entities)."""
    out = table
    for f in pipe.features:
        cols = f.resolve_input(out.schema)
        t = f.transformer
        names = f.output_names(out.schema)
        if isinstance(t, KeyedTransform):
            # compute in (key, order) sort order, then scatter back so the
            # appended columns align with `out`'s row order
            sort_keys = [t.key, *t.order_by]
            order = pc.sort_indices(out, sort_keys=[(k, "ascending") for k in sort_keys])
            sorted_tbl = out.take(order)
            from ballet_ray.functions import windows_np as wnp

            codes = wnp.group_codes(sorted_tbl.column(t.key).to_numpy(zero_copy_only=False))
            starts = wnp.group_starts(codes)
            outs = t.transform_sorted(sorted_tbl, codes, starts, cols)
            inv = np.empty(len(order), dtype=np.int64)
            inv[order.to_numpy(zero_copy_only=False)] = np.arange(len(order))
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
    def __init__(self, out_dir: str, *, key: str = "doc_id", num_partitions: int = 32):
        self.out_dir = out_dir
        self.key = key
        self.num_partitions = num_partitions
        self.buckets_dir = os.path.join(out_dir, "buckets")
        self.features_dir = os.path.join(out_dir, "features")
        self.manifest_dir = os.path.join(out_dir, "manifest")
        self.state_dir = os.path.join(out_dir, "state")

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

    def _phase1_bucketize(self, input_path: str):
        import ray.data as rd

        marker = os.path.join(self.buckets_dir, "_COMPLETE")
        if os.path.exists(marker):
            return
        if os.path.isdir(self.buckets_dir):
            shutil.rmtree(self.buckets_dir)  # torn phase 1 → redo
        os.makedirs(self.buckets_dir, exist_ok=True)
        ds = rd.read_parquet(input_path)
        key, P = self.key, self.num_partitions

        def add_part(t: pa.Table) -> pa.Table:
            h = stable_hash_array(t.column(key).to_numpy(zero_copy_only=False))
            return t.append_column("part", pa.array((h % np.uint64(P)).astype(np.int64)))

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

        self._phase1_bucketize(input_path)
        pipe = self._fit_or_load(pipe, rd.read_parquet(input_path))

        done = self._completed_parts()
        todo = [k for k in range(self.num_partitions) if k not in done]
        part_dirs = {
            k: os.path.join(self.buckets_dir, f"part={k}") for k in todo
            if os.path.isdir(os.path.join(self.buckets_dir, f"part={k}"))
        }

        features_dir, manifest_dir = self.features_dir, self.manifest_dir
        pipe_ref = ray.put(pipe)

        @ray.remote
        def process(k: int, bucket_dir: str) -> dict:
            t0 = time.time()
            table = pq.read_table(bucket_dir)
            p = ray.get(pipe_ref)
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
            "partitions_total": self.num_partitions,
            "partitions_resumed": len(done),
            "partitions_processed": len(manifests),
            "rows_processed": sum(m["rows"] for m in manifests),
            "wall_s": round(time.time() - t_start, 3),
        }
