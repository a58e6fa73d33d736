"""Near-dedup stress check: N synthetic token docs with planted duplicate
clusters → token MinHash LSH → distributed connected components →
left-anti join resolution, with Dataset.to_pandas forbidden during
cluster assignment (structural no-driver-materialization guarantee at a
size where cheating would OOM nothing but still be visible).

Usage: python tools/stress_dedup.py [n_docs] [dup_clusters] [num_cpus]
Prints one JSON line: counts + wall times per phase.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    import numpy as np
    import pyarrow as pa

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    import ray.data as rd

    rng = np.random.RandomState(7)
    base_unique = n_docs - 3 * clusters  # each planted cluster = 1 base + 2 copies

    def gen(n0, n1, tag):
        toks = [rng.randint(0, 50_000, rng.randint(30, 80)).astype(np.int32) for _ in range(n1 - n0)]
        ids = [f"{tag}{i:08d}" for i in range(n0, n1)]
        return pa.table({"doc_id": pa.array(ids), "tokens": pa.array(toks)}), toks

    t_all = time.time()
    uniq_tbl, _ = gen(0, base_unique, "u")
    dup_base_tbl, dup_toks = gen(0, clusters, "d")
    copies = pa.table(
        {
            "doc_id": pa.array([f"d{i:08d}_c{j}" for i in range(clusters) for j in (1, 2)]),
            "tokens": pa.array([dup_toks[i] for i in range(clusters) for _ in (1, 2)]),
        }
    )
    ds = rd.from_arrow(pa.concat_tables([uniq_tbl, dup_base_tbl, copies])).repartition(num_cpus * 2)
    gen_s = time.time() - t_all

    from ballet_ray.stages.dedup import assign_clusters, token_minhash_lsh_pairs

    t0 = time.time()
    pairs = token_minhash_lsh_pairs(ds, est_threshold=0.9).materialize()
    n_pairs = pairs.count()
    lsh_s = time.time() - t0

    t0 = time.time()
    import ray.data as rdata

    orig_to_pandas = rdata.Dataset.to_pandas

    def forbidden(self, *a, **kw):
        raise AssertionError("driver materialization during cluster assignment")

    rdata.Dataset.to_pandas = forbidden
    try:
        # driver_edges_threshold=0 forces the fully distributed propagation
        # path — the to_pandas ban guards THAT path; the sub-threshold
        # driver union-find fast path legitimately materializes its (small,
        # bounded-by-dup-count) edge set.
        labels = assign_clusters(pairs, driver_edges_threshold=0)
        labels = labels.materialize()
    finally:
        rdata.Dataset.to_pandas = orig_to_pandas
    cc_s = time.time() - t0

    t0 = time.time()
    import pyarrow.compute as pc

    from ballet_ray.stages.joins import left_anti_join

    loser_ds = labels.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("doc_id"), t.column("cluster_rep"))).select(["doc_id"]),
        batch_format="pyarrow",
    )
    kept = left_anti_join(ds, loser_ds, key="doc_id", num_partitions=num_cpus).count()
    join_s = time.time() - t0

    expect_kept = base_unique + clusters  # one survivor per planted cluster
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "planted_clusters": clusters,
                "pairs": n_pairs,
                "kept": kept,
                "expected_kept": expect_kept,
                "exact": kept == expect_kept,
                "gen_s": round(gen_s, 1),
                "lsh_s": round(lsh_s, 1),
                "components_s": round(cc_s, 1),
                "anti_join_s": round(join_s, 1),
                "num_cpus": num_cpus,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
