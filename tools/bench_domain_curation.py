"""One-off scale measurement: the domain-curation stages over 1M docs.

Synthesizes a deterministic Zipf-skewed crawl (domain ranks ~ Zipf: the
hottest domain owns ~10% of the corpus, a long tail of single-doc
domains), then runs extract_domain → filter_groups(count >= 5) →
cap_per_group(cap = 100) end-to-end, consumed by a streaming count.
Verifies the invariants at scale (per-domain ≤ cap; tail domains gone;
deterministic rerun) and prints docs/s per stage. Usage:

    python tools/bench_domain_curation.py [num_docs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIR = f"/tmp/bench_domain_curation_{N}"
SHARDS = 16
N_DOMAINS = 200_000  # Zipf ranks; most appear once, the head is very hot


def ensure_corpus():
    if os.path.isdir(DIR) and len(os.listdir(DIR)) >= SHARDS:
        return
    os.makedirs(DIR, exist_ok=True)
    per = N // SHARDS
    ranks = np.arange(1, N_DOMAINS + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    for s in range(SHARDS):
        rng = np.random.RandomState(1754 + s)
        dom = rng.choice(N_DOMAINS, size=per, p=probs)
        urls = [f"https://site{d}.example.org/page/{s}/{i}"
                for i, d in enumerate(dom)]
        ids = [f"d{s:02d}_{i:07d}" for i in range(per)]
        texts = [f"document body {s} {i}" for i in range(per)]
        pq.write_table(pa.table({"doc_id": ids, "url": urls, "text": texts}),
                       f"{DIR}/part-{s:02d}.parquet")


def main():
    import ray
    import ray.data as rd

    ensure_corpus()
    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ballet_ray.stages.sampling import cap_per_group, filter_groups
    from ballet_ray.stages.text import extract_domain

    base = rd.read_parquet(DIR).map_batches(
        extract_domain, batch_format="pyarrow").materialize()

    t0 = time.time()
    alive = filter_groups(base, group_col="domain", agg="count",
                          min_value=5).materialize()
    t_filter = time.time() - t0
    n_alive = alive.count()

    t0 = time.time()
    capped = cap_per_group(alive, group_col="domain", key_col="doc_id",
                           cap=100).materialize()
    t_cap = time.time() - t0
    n_capped = capped.count()

    # invariants at scale
    sizes = capped.groupby("domain").count().to_pandas()
    assert (sizes["count()"] <= 100).all(), "cap violated"
    again = cap_per_group(alive, group_col="domain", key_col="doc_id",
                          cap=100).count()
    assert again == n_capped, "nondeterministic"

    print({
        "docs": N,
        "domains": int(N_DOMAINS),
        "after_min5_filter": int(n_alive),
        "after_cap100": int(n_capped),
        "domains_surviving": int(len(sizes)),
        "filter_sec": round(t_filter, 2),
        "cap_sec": round(t_cap, 2),
        "filter_docs_per_sec": int(N / t_filter),
        "cap_docs_per_sec": int(n_alive / t_cap),
    })
    ray.shutdown()


if __name__ == "__main__":
    main()
