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


def test_exact_dedup_string_ids():
    """North-rule schema has doc_id:string — dedup must not assume numeric ids."""
    from ballet_ray.stages.dedup import exact_dedup

    df = pd.DataFrame(
        {
            "doc_id": ["d05", "d01", "d03", "d02", "d04"],
            "text": ["aa", "aa", "bb", "bb", "cc"],
        }
    )
    for resolve in ("broadcast", "join"):
        out = exact_dedup(
            rd.from_pandas(df).repartition(2), "text", "doc_id", resolve=resolve
        ).to_pandas()
        assert sorted(out["doc_id"]) == ["d01", "d02", "d04"], resolve


def test_cluster_losers_keep_best():
    """Quality-aware cluster retention: the winner per connected component
    is the best keep_col member (min-id tiebreak), not the min id."""
    from ballet_ray.stages.dedup import cluster_losers

    pairs = rd.from_items(
        [
            {"id_a": 1, "id_b": 2},
            {"id_a": 2, "id_b": 3},
            {"id_a": 7, "id_b": 9},
        ]
    )
    clusters = assign_clusters(pairs)  # comps {1,2,3}, {7,9}
    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 5, 7, 9],
                "score": [0.1, 0.9, 0.5, 0.0, 0.4, 0.4],  # 7/9 tie → min id 7
            }
        )
    ).repartition(2)
    dropped = cluster_losers(
        clusters, ds, keep_col="score", keep="max"
    ).to_pandas()
    assert sorted(dropped["doc_id"]) == [1, 3, 9]  # winners: 2 (best), 7 (tie)
    dropped_min = cluster_losers(
        clusters, ds, keep_col="score", keep="min"
    ).to_pandas()
    assert sorted(dropped_min["doc_id"]) == [2, 3, 9]  # winners: 1 (0.1), 7

    # default (no keep_col) stays the min-id representative
    dropped_def = cluster_losers(clusters).to_pandas()
    assert sorted(dropped_def["doc_id"]) == [2, 3, 9]


def test_dedup_by_minhash_keep_best():
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [base, base, "totally different words about arrow and shuffles everywhere", base],
            "quality": [0.1, 0.9, 0.2, 0.5],
        }
    )
    kept = dedup_by_minhash(
        rd.from_pandas(df).repartition(2), est_threshold=0.8, concurrency=2,
        keep_col="quality",
    ).to_pandas()
    assert sorted(kept["doc_id"]) == [2, 3]  # best-quality copy wins, not min id

    # no near-dups at all → identity (empty clusters can be schema-less)
    df2 = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [base, "totally different words about arrow and shuffles everywhere"],
            "quality": [0.1, 0.9],
        }
    )
    kept2 = dedup_by_minhash(
        rd.from_pandas(df2), est_threshold=0.8, concurrency=1, keep_col="quality"
    ).to_pandas()
    assert sorted(kept2["doc_id"]) == [1, 2]


def test_exact_dedup_keep_best():
    """Quality-aware winner selection: keep_col picks the best copy per
    content group (keep='max'/'min'), min-id tiebreak, NaN scores never win
    over a scored copy — brute pandas reference parity, both resolve modes."""
    from ballet_ray.stages.dedup import exact_dedup

    rng = np.random.default_rng(7)
    n = 200
    df = pd.DataFrame(
        {
            "doc_id": rng.permutation(n).astype(np.int64),
            "key": [f"k{i % 37}" for i in range(n)],
            "score": rng.normal(size=n).round(3),
        }
    )
    # ties at the top of one group + NaN scores sprinkled in
    df.loc[df["key"] == "k3", "score"] = 5.0
    df.loc[rng.choice(n, 20, replace=False), "score"] = np.nan

    def brute(keep: str) -> list:
        s = df.sort_values(
            ["key", "score", "doc_id"],
            ascending=[True, keep == "min", True],
            na_position="last",
        )
        return sorted(s.groupby("key", sort=False).head(1)["doc_id"])

    ds = rd.from_pandas(df).repartition(4)
    for keep in ("max", "min"):
        want = brute(keep)
        for resolve in ("broadcast", "join"):
            got = exact_dedup(
                ds, "key", "doc_id", resolve=resolve, keep_col="score", keep=keep
            ).to_pandas()
            assert sorted(got["doc_id"]) == want, (keep, resolve)
            # full rows survive, not just ids
            assert set(got.columns) == {"doc_id", "key", "score"}

    # all-NaN group still keeps exactly one row (min-id)
    df2 = pd.DataFrame(
        {"doc_id": [9, 4, 7], "key": ["z", "z", "z"], "score": [np.nan] * 3}
    )
    out = exact_dedup(
        rd.from_pandas(df2), "key", "doc_id", keep_col="score"
    ).to_pandas()
    assert list(out["doc_id"]) == [4]

    import pytest

    with pytest.raises(ValueError):
        exact_dedup(ds, "key", "doc_id", keep_col="score", keep="best")


def test_assign_clusters_string_ids():
    pairs = rd.from_items(
        [
            {"id_a": "a", "id_b": "b"},
            {"id_a": "b", "id_b": "c"},
            {"id_a": "x", "id_b": "y"},
        ]
    )
    out = assign_clusters(pairs).to_pandas().set_index("doc_id")["cluster_rep"].to_dict()
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_minhash_simhash_custom_text_col():
    """text_col parameter must actually be honored (was hard-coded 'text')."""
    from ballet_ray.stages.dedup import minhash_lsh_pairs, simhash_pairs

    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    df = pd.DataFrame({"doc_id": [1, 2], "body": [base, base]})
    mh = minhash_lsh_pairs(
        rd.from_pandas(df), text_col="body", est_threshold=0.8, concurrency=1
    ).to_pandas()
    assert {tuple(sorted(p)) for p in zip(mh["id_a"], mh["id_b"])} == {(1, 2)}
    sh = simhash_pairs(rd.from_pandas(df), text_col="body", concurrency=1).to_pandas()
    assert {tuple(sorted(p)) for p in zip(sh["id_a"], sh["id_b"])} == {(1, 2)}


def test_minhash_bucket_cap_keeps_connectivity():
    """A degenerate bucket (many identical docs) above max_bucket degrades to
    star pairs: O(n) work, and end-to-end dedup still keeps exactly one copy."""
    base = "identical content repeated many times across the corpus for the cap test tonight"
    n = 20
    df = pd.DataFrame({"doc_id": list(range(n)), "text": [base] * n})
    kept = dedup_by_minhash(
        rd.from_pandas(df).repartition(3), est_threshold=0.9, concurrency=1, max_bucket=5
    ).to_pandas()
    assert kept["doc_id"].tolist() == [0]


def test_ngram_jaccard_distributed_joins():
    """Jaccard verify must work when pairs reference a subset of docs and
    must attach texts by hash join (no corpus dict on the driver)."""
    from ballet_ray.stages.dedup import ngram_jaccard_pairs

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b c d e f g", "a b c d e f h", "unrelated words here entirely"],
        }
    )
    ds = rd.from_pandas(df).repartition(2)
    pairs = rd.from_items([{"id_a": 1, "id_b": 2}])
    out = ngram_jaccard_pairs(ds, pairs, k=3).to_pandas()
    assert len(out) == 1
    assert np.isclose(out["jaccard"].iloc[0], 4 / 6)


def test_token_minhash_on_canonical_table(corpus_dir):
    """Token-level MinHash over the north-rule tokens column finds exact
    duplicate sequences without any text processing."""
    import pyarrow as pa

    from ballet_ray.stages.dedup import token_minhash_lsh_pairs

    pdf = rd.read_parquet(corpus_dir, columns=["doc_id", "tokens"]).limit(300).to_pandas()
    # the corpus is event-log shaped (doc_id repeats); dedup operates on
    # SEQUENCES, which need unique ids
    pdf["seq_id"] = [f"seq{i:05d}" for i in range(len(pdf))]
    dup = pdf.head(5).copy()
    dup["seq_id"] = [f"dup_{v}" for v in dup["seq_id"]]
    both = rd.from_pandas(pd.concat([pdf, dup], ignore_index=True)[["seq_id", "tokens"]]).repartition(4)
    pairs = token_minhash_lsh_pairs(both, id_col="seq_id", est_threshold=0.95).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
    for i in range(5):
        assert tuple(sorted((f"seq{i:05d}", f"dup_seq{i:05d}"))) in found


def test_assign_clusters_never_materializes_to_driver(monkeypatch):
    """Structural guarantee: cluster assignment must not call
    Dataset.to_pandas / take_all anywhere (edges and labels stay
    distributed; the driver only sees the converged result)."""
    import ray.data as rdata

    n = 30_000  # 10k chains of length 3
    a = np.arange(n)
    pairs_df = pd.DataFrame({"id_a": a, "id_b": a + n})
    pairs2 = pd.DataFrame({"id_a": a + n, "id_b": a + 2 * n})
    pairs = rd.from_pandas(pd.concat([pairs_df, pairs2], ignore_index=True)).repartition(8)

    def boom(self, *a, **kw):
        raise AssertionError("driver materialization inside assign_clusters")

    monkeypatch.setattr(rdata.Dataset, "to_pandas", boom)
    monkeypatch.setattr(rdata.Dataset, "take_all", boom)
    labels = assign_clusters(pairs)
    monkeypatch.undo()
    out = labels.to_pandas()
    assert len(out) == 3 * n
    # every chain collapses to its minimum id
    got = out.set_index("doc_id")["cluster_rep"]
    assert (got.loc[a + n].to_numpy() == a).all()
    assert (got.loc[a + 2 * n].to_numpy() == a).all()


def test_token_dedup_end_to_end_with_list_payload():
    """Integrated canonical-table dedup: token LSH pairs → distributed
    components → list-payload-safe anti-join keeps exactly one survivor
    per planted cluster (tools/stress_dedup.py at test scale)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ballet_ray.stages.dedup import assign_clusters, token_minhash_lsh_pairs
    from ballet_ray.stages.joins import left_anti_join

    rng = np.random.RandomState(11)
    n_uniq, clusters = 3_000, 60
    toks = [rng.randint(0, 50_000, rng.randint(30, 60)).astype(np.int32) for _ in range(n_uniq + clusters)]
    ids = [f"u{i:05d}" for i in range(n_uniq)] + [f"d{i:05d}" for i in range(clusters)]
    dup_ids = [f"d{i:05d}_c{j}" for i in range(clusters) for j in (1, 2)]
    dup_toks = [toks[n_uniq + i] for i in range(clusters) for _ in (1, 2)]
    t = pa.table({"doc_id": pa.array(ids + dup_ids), "tokens": pa.array(toks + dup_toks)})
    ds = rd.from_arrow(t).repartition(4)

    pairs = token_minhash_lsh_pairs(ds, est_threshold=0.9)
    labels = assign_clusters(pairs)
    losers = labels.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("doc_id"), t.column("cluster_rep"))).select(["doc_id"]),
        batch_format="pyarrow",
    )
    kept = left_anti_join(ds, losers, key="doc_id").to_pandas()
    assert len(kept) == n_uniq + clusters
    # the min-id representative of each planted cluster survives with its tokens
    survivors = set(kept["doc_id"])
    for i in range(clusters):
        assert f"d{i:05d}" in survivors and f"d{i:05d}_c1" not in survivors
    row = kept[kept["doc_id"] == "d00000"].iloc[0]
    assert np.array_equal(np.asarray(row["tokens"]), toks[n_uniq])


def test_kll_quantile_sketch_bounds_and_exactness():
    """KLL: exact below capacity (matches the discrete-quantile rule),
    bounded rank error above it, merge- and serialization-safe."""
    import numpy as np

    from ballet_ray.stages.sketches import _KLL

    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, 100_000)
    xs = np.sort(x)
    qs = [0.1, 0.5, 0.9, 0.99]

    # exact below capacity: discrete quantile (smallest elem with cum >= q*n)
    exact = _KLL(200_000)
    exact.add(x)
    for q, e in zip(qs, exact.quantiles(qs)):
        assert e == xs[int(np.ceil(q * len(xs))) - 1]

    # approximate: rank error well under 1% at k=512 on 100k values
    sk = _KLL(512)
    for chunk in np.array_split(x, 37):
        sk.add(chunk)
    for q, e in zip(qs, sk.quantiles(qs)):
        assert abs(np.searchsorted(xs, e) / len(xs) - q) < 0.01

    # merging two half-sketches stays within the same bound
    a, b = _KLL(512), _KLL(512)
    a.add(x[:50_000])
    b.add(x[50_000:])
    m = a.merge(b)
    assert abs(np.searchsorted(xs, m.quantiles([0.5])[0]) / len(xs) - 0.5) < 0.01

    # serialize/deserialize roundtrip preserves every level + parity
    r = _KLL.deserialize(m.serialize(), 512)
    assert r.parity == m.parity
    assert all(np.array_equal(p, q2) for p, q2 in zip(m.levels, r.levels))


def test_approx_quantiles_distributed_matches_exact(sf_dir):
    """Tree-merged distributed path over a multi-block dataset: exact
    below capacity regardless of block boundaries."""
    import numpy as np
    import ray.data as rd

    from ballet_ray.stages.sketches import approx_quantiles

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"]).repartition(8)
    got = approx_quantiles(ds, "o_totalprice", [0.5, 0.9], k=1_000_000)
    vals = np.sort(ds.to_pandas()["o_totalprice"].to_numpy())
    for q, g in zip([0.5, 0.9], got):
        assert g == vals[int(np.ceil(q * len(vals))) - 1]


def test_misra_gries_summary_and_topk():
    import numpy as np
    import ray.data as rd

    from ballet_ray.stages.sketches import _mg_summary, approx_top_k

    rng = np.random.default_rng(12)
    # zipf-ish: value i has weight ~ 1/(i+1)
    vals = rng.choice(200, p=(1 / np.arange(1, 201)) / (1 / np.arange(1, 201)).sum(), size=50_000)

    # per-batch MG bound: est <= true, true - est <= n/(cap+1)
    cap = 16
    sv, sc = _mg_summary(vals, cap)
    assert len(sv) <= cap
    true = {v: int((vals == v).sum()) for v in sv}
    for v, c in zip(sv, sc):
        assert c <= true[v] and true[v] - c <= len(vals) / (cap + 1)

    import pyarrow as pa

    ds = rd.from_arrow(pa.table({"v": vals})).repartition(8)
    # capacity >= distinct -> exact top-k equals a full groupby
    got = approx_top_k(ds, "v", k=10, capacity=512).to_pandas()
    u, c = np.unique(vals, return_counts=True)
    order = np.lexsort((u, -c))[:10]
    assert list(got.v) == list(u[order]) and list(got.cnt) == list(c[order])

    # tight capacity: top-1 still found, estimates are valid lower bounds
    approx = approx_top_k(ds, "v", k=5, capacity=32).to_pandas()
    truth = dict(zip(u, c))
    assert approx.v.iloc[0] == u[order][0]
    for v, est in zip(approx.v, approx.cnt):
        assert est <= truth[v] and truth[v] - est <= len(vals) / 33 * 8  # per-block bound x blocks


def test_mg_summary_tie_heavy_bound():
    """Misra-Gries per-batch error bound n/(capacity+1) must hold on
    tie-heavy inputs (many counters sharing the k-th largest count)."""
    import numpy as np

    from ballet_ray.stages.sketches import _mg_summary

    rng = np.random.default_rng(0)
    for trial in range(20):
        cap = int(rng.integers(2, 12))
        # heavy ties: values drawn from a small set of count levels
        n_vals = int(rng.integers(cap + 1, cap * 4))
        counts = rng.choice([1, 3, 5, 5, 5, 9], size=n_vals)
        values = np.repeat(np.arange(n_vals), counts)
        rng.shuffle(values)
        n = len(values)
        vals, cnts = _mg_summary(values, cap)
        assert len(vals) <= cap
        bound = n / (cap + 1)
        true = {v: c for v, c in zip(*np.unique(values, return_counts=True))}
        est = dict(zip(vals.tolist(), cnts.tolist()))
        for v, tc in true.items():
            e = est.get(v, 0)
            assert e <= tc, "estimate must be a lower bound"
            assert tc - e <= bound + 1e-9, (trial, v, tc, e, bound)
