"""Corpus-wide exact line dedup (C4/RefinedWeb boilerplate removal)."""

import numpy as np
import pandas as pd
import ray.data as rd

from ballet_ray.stages.dedup import remove_duplicate_lines


def _brute(df, *, normalize=True, min_chars=1):
    """Reference rule: global first occurrence (min id, min line_no) of each
    normalized line wins; lines shorter than min_chars never keyed."""
    seen = set()
    out = {}
    for _, row in df.sort_values("doc_id").iterrows():
        kept = []
        removed = 0
        for line in row["text"].split("\n"):
            key = line.strip().lower() if normalize else line
            if len(key) < min_chars:
                kept.append(line)
                continue
            if key in seen:
                removed += 1
            else:
                seen.add(key)
                kept.append(line)
        out[row["doc_id"]] = ("\n".join(kept), removed)
    return out


def _check(df, got, **kw):
    expect = _brute(df, **kw)
    got = got.set_index("doc_id")
    assert set(got.index) == set(expect)
    for did, (text, removed) in expect.items():
        assert got.loc[did, "text"] == text, did
        assert got.loc[did, "n_removed"] == removed, did


def test_boilerplate_removed_first_kept(ray_session):
    banner = "Accept all cookies"
    df = pd.DataFrame({
        "doc_id": ["a", "b", "c"],
        "text": [
            f"{banner}\nunique alpha\nSubscribe now",
            f"{banner}\nunique beta\nSubscribe now",
            "unique gamma\nno banner here",
        ],
    })
    got = remove_duplicate_lines(rd.from_pandas(df).repartition(3)).to_pandas()
    _check(df, got)
    g = got.set_index("doc_id")
    assert banner in g.loc["a", "text"] and banner not in g.loc["b", "text"]
    assert g.loc["c", "n_removed"] == 0


def test_normalization_and_blank_lines(ray_session):
    df = pd.DataFrame({
        "doc_id": ["a", "b"],
        "text": [
            "Hello World\n\nbody a",
            "  hello world \n\nbody b",  # same line after strip+lower
        ],
    })
    got = remove_duplicate_lines(rd.from_pandas(df)).to_pandas().set_index("doc_id")
    # normalized dup removed from b, ORIGINAL text kept in a; blanks survive both
    assert got.loc["a", "text"] == "Hello World\n\nbody a"
    assert got.loc["b", "text"] == "\nbody b"
    _check(df, remove_duplicate_lines(rd.from_pandas(df)).to_pandas())


def test_in_doc_repeats_and_partition_invariance(ray_session):
    rng = np.random.default_rng(11)
    pool = [f"line {i}" for i in range(40)]
    rows = []
    for d in range(60):
        k = rng.integers(2, 8)
        rows.append((f"d{d:03d}", "\n".join(rng.choice(pool, size=k))))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    a = remove_duplicate_lines(rd.from_pandas(df).repartition(2)).to_pandas()
    b = remove_duplicate_lines(rd.from_pandas(df).repartition(13)).to_pandas()
    _check(df, a)
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )


def test_no_duplicates_passthrough(ray_session):
    # empty loser table: the join must be skipped, docs pass through verbatim
    df = pd.DataFrame({
        "doc_id": ["a", "b"],
        "text": ["unique one\nalpha", "unique two\nbeta"],
    })
    got = remove_duplicate_lines(rd.from_pandas(df).repartition(2)).to_pandas()
    _check(df, got)
    assert (got["n_removed"] == 0).all()


def test_spans_tiny_from_pandas_input(ray_session):
    """Regression: 3-doc from_pandas input exercised two latent hash_join
    bugs (missed list packing on pandas-block schemas; schema-less empty
    blocks poisoning the join aggregator)."""
    from ballet_ray.stages.dedup import remove_duplicate_spans

    df = pd.DataFrame({
        "doc_id": ["a", "b", "c"],
        "tokens": [list(range(100)), list(range(100)), list(range(200, 230))],
    })
    out = (remove_duplicate_spans(rd.from_pandas(df).repartition(3), n=16)
           .to_pandas().set_index("doc_id"))
    assert out.loc["a", "n_removed"] == 0 and out.loc["b", "n_removed"] == 100
    # and the no-duplicate corpus skips the join entirely
    df2 = pd.DataFrame({"doc_id": ["a", "b"],
                        "tokens": [list(range(40)), list(range(100, 140))]})
    out2 = remove_duplicate_spans(rd.from_pandas(df2).repartition(2), n=16).to_pandas()
    assert (out2["n_removed"] == 0).all() and len(out2) == 2


def test_min_chars_keeps_short_lines(ray_session):
    df = pd.DataFrame({
        "doc_id": ["a", "b"],
        "text": ["ok\nlong shared line", "ok\nlong shared line"],
    })
    got = remove_duplicate_lines(
        rd.from_pandas(df), min_chars=5
    ).to_pandas().set_index("doc_id")
    # "ok" is under min_chars -> never keyed, survives in both docs
    assert got.loc["a", "text"] == "ok\nlong shared line"
    assert got.loc["b", "text"] == "ok"
    _check(df, got.reset_index(), min_chars=5)


def test_carry_cols_ride_the_join(ray_session):
    # extra columns requested via carry_cols survive the id-keyed join
    # untouched, including on docs that lose lines
    df = pd.DataFrame({
        "doc_id": ["a", "b", "c"],
        "text": ["shared line\nalpha", "shared line\nbeta", "gamma"],
        "source": ["web", "books", "web"],
        "weight": [0.5, 1.5, 2.0],
    })
    got = remove_duplicate_lines(
        rd.from_pandas(df).repartition(3), carry_cols=("source", "weight")
    ).to_pandas().set_index("doc_id")
    assert set(got.columns) >= {"text", "n_lines", "n_removed", "source", "weight"}
    for did in ("a", "b", "c"):
        assert got.loc[did, "source"] == df.set_index("doc_id").loc[did, "source"]
        assert got.loc[did, "weight"] == df.set_index("doc_id").loc[did, "weight"]
    assert got.loc["b", "n_removed"] == 1
    _check(df[["doc_id", "text"]], got.reset_index()[["doc_id", "text", "n_removed"]])


def _brute_unit(df, sep, *, min_chars=1):
    seen = set()
    out = {}
    for _, row in df.sort_values("doc_id").iterrows():
        kept, removed = [], 0
        for u in row["text"].split(sep):
            key = u.strip().lower()
            if len(key) < min_chars:
                kept.append(u)
                continue
            if key in seen:
                removed += 1
            else:
                seen.add(key)
                kept.append(u)
        out[row["doc_id"]] = (sep.join(kept), removed)
    return out


def test_paragraph_unit(ray_session):
    block = "Cookie notice line one.\nBy continuing you agree."
    df = pd.DataFrame({
        "doc_id": ["a", "b", "c"],
        "text": [
            f"{block}\n\nunique alpha par\nstill alpha",
            f"{block}\n\nunique beta par",
            "unique gamma only",
        ],
    })
    got = remove_duplicate_lines(
        rd.from_pandas(df).repartition(3), unit="paragraph"
    ).to_pandas().set_index("doc_id")
    expect = _brute_unit(df, "\n\n")
    for did, (text, removed) in expect.items():
        assert got.loc[did, "text"] == text, did
        assert got.loc[did, "n_removed"] == removed, did
    # the multi-line block survives in a, vanishes whole from b
    assert block in got.loc["a", "text"] and block not in got.loc["b", "text"]
    # line mode would NOT remove it as one unit: keys differ
    got_line = remove_duplicate_lines(
        rd.from_pandas(df).repartition(3), unit="line"
    ).to_pandas().set_index("doc_id")
    assert got_line.loc["b", "n_removed"] == 2


def test_unit_validation(ray_session):
    import pytest as _pytest
    with _pytest.raises(ValueError):
        remove_duplicate_lines(rd.from_items([{"doc_id": "a", "text": "x"}]),
                               unit="sentence")
