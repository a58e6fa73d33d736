"""Per-document duplication fraction (Dolma-style quality signal)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ballet_ray.stages.dedup import duplication_scores


def _brute(df, n, min_count):
    """Reference: distinct n-word windows per doc; dup iff the window
    occurs in >= min_count distinct docs."""
    win_docs = {}
    doc_wins = {}
    for _, r in df.iterrows():
        words = r["text"].split(" ")
        wins = {" ".join(words[i:i + n]) for i in range(len(words) - n + 1)}
        doc_wins[r["doc_id"]] = wins
        for w in wins:
            win_docs.setdefault(w, set()).add(r["doc_id"])
    out = {}
    for did, wins in doc_wins.items():
        if not wins:
            continue
        nd = sum(1 for w in wins if len(win_docs[w]) >= min_count)
        out[did] = (len(wins), nd, nd / len(wins))
    return out


@pytest.mark.parametrize("key", ["hash", "text"])
def test_matches_brute(ray_session, key):
    shared = " ".join(f"s{j}" for j in range(10))
    rows = [
        ("a", "alpha beta gamma " + shared),
        ("b", "delta epsilon " + shared + " zeta"),
        ("c", " ".join(f"u{j}" for j in range(15))),   # fully unique
        ("d", shared),                                  # fully duplicated
        ("e", "x y"),                                   # shorter than n -> no row
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    n = 4
    got = duplication_scores(rd.from_pandas(df).repartition(3), n=n,
                             key=key).to_pandas().set_index("doc_id")
    expect = _brute(df, n, 2)
    assert set(got.index) == set(expect)
    for did, (nw, nd, frac) in expect.items():
        assert got.loc[did, "n_windows"] == nw, did
        assert got.loc[did, "n_dup_windows"] == nd, did
        assert got.loc[did, "dup_frac"] == pytest.approx(frac), did
    assert got.loc["c", "dup_frac"] == 0.0
    assert got.loc["d", "dup_frac"] == 1.0


def test_no_duplicates_all_zero(ray_session):
    df = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(6)],
        "text": [" ".join(f"w{i}_{j}" for j in range(12)) for i in range(6)],
    })
    got = duplication_scores(rd.from_pandas(df).repartition(2), n=3).to_pandas()
    assert len(got) == 6
    assert (got["dup_frac"] == 0.0).all()


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(9)
    pool = [f"t{i}" for i in range(30)]
    rows = [(f"d{i}", " ".join(rng.choice(pool, size=20))) for i in range(40)]
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    a = duplication_scores(rd.from_pandas(df).repartition(2), n=3).to_pandas()
    b = duplication_scores(rd.from_pandas(df).repartition(11), n=3).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )


def test_token_mode_matches_text_mode(ray_session):
    """Over word sequences expressed as token ids, the token-mode scores
    must equal the text-mode scores of the equivalent documents."""
    import pyarrow as pa

    rng = np.random.default_rng(21)
    rows = [rng.integers(0, 25, size=int(rng.integers(6, 18))).tolist()
            for _ in range(30)]
    df = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(30)],
        "text": [" ".join(f"w{x}" for x in r) for r in rows],
    })
    t = pa.table({
        "doc_id": pa.array(df["doc_id"]),
        "tokens": pa.array(rows, type=pa.list_(pa.int32())),
    })
    n = 3
    a = duplication_scores(rd.from_pandas(df).repartition(4), n=n) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = duplication_scores(rd.from_arrow(t).repartition(4), n=n,
                           tokens_col="tokens") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_min_count_raises_bar(ray_session):
    shared = " ".join(f"s{j}" for j in range(8))
    df = pd.DataFrame({
        "doc_id": ["a", "b", "c"],
        "text": [shared, shared, shared],
    })
    # min_count=3: window must appear in all three docs (it does)
    got3 = duplication_scores(rd.from_pandas(df), n=4, min_count=3).to_pandas()
    assert (got3["dup_frac"] == 1.0).all()
    got4 = duplication_scores(rd.from_pandas(df), n=4, min_count=4).to_pandas()
    assert (got4["dup_frac"] == 0.0).all()
