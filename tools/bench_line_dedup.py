"""One-off scale measurement: remove_duplicate_lines over 1M multi-line docs.

Synthesizes a deterministic boilerplate-heavy corpus (8 body lines from a
50k-line pool + 3 boilerplate lines shared corpus-wide per doc), runs the
line dedup end-to-end (consumed by a streaming aggregate over the rewritten
text), prints docs/s and removal stats. Usage:

    python tools/bench_line_dedup.py [num_docs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIR = f"/tmp/bench_line_dedup_{N}"
SHARDS = 16
BOILER = [
    "accept all cookies to continue",
    "subscribe to our newsletter today",
    "copyright 2024 example media group all rights reserved",
]


def ensure_corpus():
    if os.path.isdir(DIR) and len(os.listdir(DIR)) >= SHARDS:
        return
    os.makedirs(DIR, exist_ok=True)
    pool = np.array([f"body line {i} with some words" for i in range(50_000)],
                    dtype=object)
    per = N // SHARDS
    for s in range(SHARDS):
        rng = np.random.RandomState(1754 + s)
        picks = rng.randint(0, len(pool), size=(per, 8))
        texts = ["\n".join([BOILER[0]] + list(pool[p[:4]]) + [BOILER[1]]
                           + list(pool[p[4:]]) + [BOILER[2]]) for p in picks]
        ids = [f"d{s:02d}_{i:07d}" for i in range(per)]
        pq.write_table(pa.table({"doc_id": ids, "text": texts}),
                       f"{DIR}/part-{s:02d}.parquet")


def main():
    import ray
    import ray.data as rd

    ensure_corpus()
    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ray.data.aggregate import Sum

    from ballet_ray.stages.dedup import remove_duplicate_lines

    ds = rd.read_parquet(DIR)
    t0 = time.time()
    out = remove_duplicate_lines(ds)
    agg = out.aggregate(Sum("n_removed", alias_name="removed"),
                        Sum("n_lines", alias_name="kept"))
    dt = time.time() - t0
    print({
        "docs": N,
        "sec": round(dt, 2),
        "docs_per_sec": int(N / dt),
        "lines_removed": int(agg["removed"]),
        "lines_kept": int(agg["kept"]),
    })
    ray.shutdown()


if __name__ == "__main__":
    main()
