import numpy as np
import pandas as pd
import ray.data as rd

from ballet_ray.stages.dedup import assign_clusters, dedup_by_minhash
from ballet_ray.stages.sketches import approx_distinct, approx_distinct_per_group


def test_assign_clusters_components():
    # components: {1,2,3} (chain), {7,9}, singleton 5 appears in no pair
    pairs = rd.from_items(
        [
            {"id_a": 1, "id_b": 2},
            {"id_a": 2, "id_b": 3},
            {"id_a": 7, "id_b": 9},
        ]
    )
    out = assign_clusters(pairs).to_pandas().set_index("doc_id")["cluster_rep"].to_dict()
    assert out == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_dedup_by_minhash_end_to_end():
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [base, base, "totally different words about arrow and shuffles everywhere", base],
        }
    )
    kept = dedup_by_minhash(rd.from_pandas(df), est_threshold=0.8, concurrency=2).to_pandas()
    assert sorted(kept["doc_id"]) == [1, 3]  # cluster {1,2,4} -> keep 1; 3 unique


def test_approx_distinct_within_error():
    n = 5000
    df = pd.DataFrame({"x": np.arange(n) % 1234})
    est = approx_distinct(rd.from_pandas(df).repartition(5), "x", k=1024)
    assert abs(est - 1234) / 1234 < 0.1


def test_approx_distinct_exact_below_capacity():
    df = pd.DataFrame({"x": np.arange(100)})
    assert approx_distinct(rd.from_pandas(df), "x", k=1024) == 100


def test_approx_distinct_per_group(sf_dir):
    got = approx_distinct_per_group(
        rd.read_parquet(f"{sf_dir}/events.parquet"), "user_id", "event_type", k=256
    )
    exact = (
        pd.read_parquet(f"{sf_dir}/events.parquet")
        .groupby("event_type")["user_id"]
        .nunique()
    )
    for _, r in got.iterrows():
        e = exact[r["event_type"]]
        assert abs(r["approx_nd"] - e) / e < 0.15
