"""rank_buckets (CCNet head/middle/tail split) vs a pandas reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ballet_ray.stages.windows import rank_buckets


def _ref_buckets(df, value_col, group_col, cuts, labels):
    def one(g):
        r = g[value_col].rank(method="min")
        n = len(g)
        pr = (r - 1) / (n - 1) if n > 1 else pd.Series(0.0, index=g.index)
        idx = np.searchsorted(np.asarray(cuts), pr.to_numpy(), side="right")
        return pd.Series(np.asarray(labels, dtype=object)[idx], index=g.index)

    if group_col is None:
        return one(df)
    return df.groupby(group_col, group_keys=False).apply(one)


def test_rank_buckets_grouped_matches_pandas():
    rng = np.random.default_rng(7)
    n = 2000
    df = pd.DataFrame({
        "id": np.arange(n),
        "g": rng.choice(["en", "fr", "de"], n),
        # heavy ties: quantized values exercise the shared-rank path
        "v": np.round(rng.normal(size=n), 1),
    })
    ds = rd.from_pandas(df).repartition(7)
    out = rank_buckets(ds, value_col="v", group_col="g").to_pandas()
    assert len(out) == n and set(out.columns) == {"id", "g", "v", "bucket"}
    exp = df.copy()
    exp["bucket"] = _ref_buckets(df, "v", "g", (1 / 3, 2 / 3),
                                 ("head", "middle", "tail"))
    m = out.sort_values("id").reset_index(drop=True)
    e = exp.sort_values("id").reset_index(drop=True)
    assert (m["bucket"] == e["bucket"]).all()
    # head = the LOW-value third within each group (CCNet: best ppl)
    for g in ("en", "fr", "de"):
        sub = m[m.g == g]
        assert sub[sub.bucket == "head"]["v"].max() <= sub[sub.bucket == "tail"]["v"].min()


def test_rank_buckets_ungrouped_custom_cuts_and_rank_cols():
    df = pd.DataFrame({"id": range(100), "v": np.arange(100)[::-1] * 1.0})
    out = rank_buckets(rd.from_pandas(df).repartition(3), value_col="v",
                       group_col=None, cuts=(0.1, 0.5),
                       labels=("p10", "mid", "top"), out_col="tier",
                       keep_rank=True).to_pandas().sort_values("id")
    assert {"rank", "percent_rank", "tier"} <= set(out.columns)
    assert "__g" not in out.columns
    exp = _ref_buckets(df, "v", None, (0.1, 0.5), ("p10", "mid", "top"))
    assert (out.sort_values("id")["tier"].to_numpy() == exp.to_numpy()).all()
    # exactly the 10 smallest v land in p10 (pr < 0.1 over n=100 -> ranks 1..10)
    assert (out.tier == "p10").sum() == 10


def test_rank_buckets_single_row_group_and_validation():
    df = pd.DataFrame({"g": ["a", "a", "b"], "v": [1.0, 2.0, 5.0]})
    out = rank_buckets(rd.from_pandas(df), value_col="v", group_col="g").to_pandas()
    # single-row group has percent_rank 0 -> first label
    assert out[out.g == "b"]["bucket"].iloc[0] == "head"
    with pytest.raises(ValueError):
        rank_buckets(rd.from_pandas(df), value_col="v", cuts=(0.5,),
                     labels=("a", "b", "c"))
    with pytest.raises(ValueError):
        rank_buckets(rd.from_pandas(df), value_col="v", cuts=(0.5, 0.5),
                     labels=("a", "b", "c"))
    with pytest.raises(ValueError):
        rank_buckets(rd.from_pandas(df), value_col="v", cuts=(0.0, 0.5),
                     labels=("a", "b", "c"))
