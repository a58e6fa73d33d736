import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ballet_ray.feature import Feature
from ballet_ray.pipeline import FeatureEngineeringPipeline
from ballet_ray.stages.encoders import SimpleImputer, StandardScaler
from ballet_ray.stages.groupwise import GroupedFunctionTransform, GroupwiseTransform
from ballet_ray.stages.joins import broadcast_join, hash_join, semi_join_filter


def test_broadcast_join_left(sf_dir):
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet")
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    out = broadcast_join(
        orders, cust, key="o_custkey", right_key="c_custkey", value_cols=["c_name"]
    ).to_pandas()
    exp = pd.read_parquet(f"{sf_dir}/orders.parquet").merge(
        cust[["c_custkey", "c_name"]], left_on="o_custkey", right_on="c_custkey", how="left"
    )
    assert len(out) == len(exp)
    got = out.sort_values("o_orderkey")["c_name"].tolist()
    want = exp.sort_values("o_orderkey")["c_name"].tolist()
    assert got == want


def test_hash_join_inner(sf_dir):
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    out = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=8)
    lpdf = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    opdf = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    exp = lpdf.merge(opdf, left_on="l_orderkey", right_on="o_orderkey")
    assert out.count() == len(exp)


def test_semi_anti_join(sf_dir):
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet")
    keys = [1, 2, 3, 7]
    kept = semi_join_filter(orders, keys, key="o_custkey").to_pandas()
    dropped = semi_join_filter(orders, keys, key="o_custkey", invert=True).to_pandas()
    assert set(kept["o_custkey"]) <= set(keys)
    assert not (set(dropped["o_custkey"]) & set(keys))
    assert len(kept) + len(dropped) == orders.count()


def _groupwise_frame():
    # reference groupwise fixture shape (tests/eng/test_base.py:83-102):
    # per-group mean imputation
    return pd.DataFrame(
        {
            "name": ["a", "a", "a", "b", "b", "b", "b"],
            "year": [1, 2, 3, 1, 2, 3, 4],
            "value": [1.0, 2.0, np.nan, 4.0, np.nan, 5.0, 5.0],
        }
    )


def test_groupwise_mean_impute_golden():
    df = _groupwise_frame()
    ds = rd.from_pandas(df)
    t = GroupwiseTransform(SimpleImputer("mean"), groupby="name")
    t.fit(ds, ["value"])
    out = (
        FeatureEngineeringPipeline([Feature("value", t, output="imputed")])
        .fit_transform(ds)
        .to_pandas()
        .sort_values(["name", "year"])
    )
    # golden: group a mean = 1.5; group b mean = 14/3
    assert out["imputed"].tolist() == [1.0, 2.0, 1.5, 4.0, pytest.approx(14 / 3), 5.0, 5.0]


def test_groupwise_unknown_group_policies():
    train = _groupwise_frame()
    test = pd.DataFrame({"name": ["z"], "year": [9], "value": [3.0]})
    t_err = GroupwiseTransform(StandardScaler(), groupby="name", handle_unknown="error")
    t_err.fit(rd.from_pandas(train), ["value"])
    with pytest.raises(Exception):
        t_err.transform_table(
            rd.from_pandas(test).take_batch(10, batch_format="pyarrow"), ["value"]
        )
    t_ok = GroupwiseTransform(StandardScaler(), groupby="name", handle_unknown="ignore")
    t_ok.fit(rd.from_pandas(train), ["value"])
    res = t_ok.transform_table(
        rd.from_pandas(test).take_batch(10, batch_format="pyarrow"), ["value"]
    )
    # unknown group passes through unchanged
    assert res.column(0).to_pylist() == [3.0]


def test_grouped_function_transform():
    df = _groupwise_frame().dropna().reset_index(drop=True)
    ds = rd.from_pandas(df)
    pipe = FeatureEngineeringPipeline(
        [Feature("value", GroupedFunctionTransform(np.sum, key="name"), output="group_sum")]
    )
    out = pipe.fit_transform(ds).to_pandas()
    exp = df.groupby("name")["value"].transform("sum")
    merged = out.merge(df.assign(exp=exp), on=["name", "year"], suffixes=("", "_src"))
    assert np.allclose(merged["group_sum"], merged["exp"])


def test_write_table_sinks(tmp_path, sf_dir):
    import ray.data as rd

    from ballet_ray.sources.registry import load_table, write_table

    ds = rd.read_parquet(f"{sf_dir}/nation.parquet")
    for fmt in ("parquet", "csv", "json"):
        out = str(tmp_path / fmt)
        write_table(ds, out, format=fmt)
        assert load_table(out, format=fmt).count() == ds.count()


def test_extract_ts_features_matches_pandas(sf_dir):
    from ballet_ray.stages.aggregates import extract_ts_features

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "value"])
    got = (
        extract_ts_features(ds, key="user_id", order_by=["ts", "event_id"], value_col="value")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(["user_id", "ts", "event_id"])
    g = pdf.groupby("user_id")["value"]
    assert np.allclose(got["value_mean"], g.mean().to_numpy())
    assert np.allclose(got["value_std"], g.std(ddof=0).to_numpy())
    assert np.allclose(got["value_abs_energy"], g.apply(lambda x: (x**2).sum()).to_numpy())
    assert np.allclose(
        got["value_mean_abs_change"],
        g.apply(lambda x: x.diff().abs().mean()).to_numpy(),
    )
    assert (got["value_n"].to_numpy() == g.count().to_numpy()).all()


def test_dfs_aggregate_features_fill_missing(sf_dir):
    from ballet_ray.stages.aggregates import dfs_aggregate_features

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    out = dfs_aggregate_features(
        cust, orders, parent_key="c_custkey", child_key="o_custkey",
        value_cols=["o_totalprice"], aggs=("count", "sum", "mean", "max"),
    ).to_pandas()
    po = pd.read_parquet(f"{sf_dir}/orders.parquet").groupby("o_custkey")["o_totalprice"]
    stats = po.agg(["count", "sum", "mean", "max"])
    merged = out.set_index("c_custkey").join(stats, how="left")
    with_orders = merged["count"].notna()
    assert np.allclose(merged.loc[with_orders, "child_count"], merged.loc[with_orders, "count"])
    assert np.allclose(merged.loc[with_orders, "o_totalprice_max"], merged.loc[with_orders, "max"])
    # customers without any order get the fill value, not null
    assert (merged.loc[~with_orders, "child_count"] == 0.0).all()
    assert (merged.loc[~with_orders, "o_totalprice_sum"] == 0.0).all()


def test_pack_unpack_list_columns_roundtrip():
    import pyarrow as pa

    from ballet_ray.stages.joins import pack_list_columns, unpack_list_columns

    t = pa.table(
        {
            "id": [1, 2, 3],
            "tokens": pa.array([[1, 2, 3], [], [7]], type=pa.list_(pa.int32())),
            "emb": pa.array([[1.5, 2.5], [0.0], []], type=pa.list_(pa.float32())),
            "name": ["a", "b", "c"],
        }
    )
    packed = pack_list_columns(t)
    assert all(not str(f.type).startswith("list") for f in packed.schema)
    back = unpack_list_columns(packed)
    assert back.column("tokens").to_pylist() == [[1, 2, 3], [], [7]]
    assert back.column("emb").to_pylist() == [[1.5, 2.5], [0.0], []]
    assert back.column("name").to_pylist() == ["a", "b", "c"]
    # sliced input (non-zero offsets) round-trips too
    back2 = unpack_list_columns(pack_list_columns(t.slice(1)))
    assert back2.column("tokens").to_pylist() == [[], [7]]


def test_left_anti_join_with_list_payload():
    import pyarrow as pa

    from ballet_ray.stages.joins import left_anti_join

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": ["a", "b", "c", "d"],
                "tokens": pa.array([[1, 2], [3], [4, 5, 6], [7]], type=pa.list_(pa.int32())),
            }
        )
    ).repartition(2)
    losers = rd.from_items([{"doc_id": "b"}, {"doc_id": "d"}])
    out = left_anti_join(ds, losers, key="doc_id").to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == ["a", "c"]
    # the list payload survives the Acero join intact
    assert [list(x) for x in out["tokens"]] == [[1, 2], [4, 5, 6]]


def test_hash_join_with_list_payload():
    import pyarrow as pa

    from ballet_ray.stages.joins import hash_join

    left = rd.from_arrow(
        pa.table(
            {"k": [1, 2, 3], "tokens": pa.array([[1], [2, 2], [3]], type=pa.list_(pa.int32()))}
        )
    )
    right = rd.from_items([{"k": 2, "v": "x"}, {"k": 3, "v": "y"}])
    out = hash_join(left, right, on="k", num_partitions=2).to_pandas().sort_values("k")
    assert out["k"].tolist() == [2, 3]
    assert [list(x) for x in out["tokens"]] == [[2, 2], [3]]
    assert out["v"].tolist() == ["x", "y"]


def test_dfs_fill_missing_covers_all_nan_children():
    """Parents whose children exist but have only null values must get
    fill_missing, not NaN (NaN is not an Arrow null — ADVICE r3)."""
    import pyarrow as pa

    from ballet_ray.stages.aggregates import dfs_aggregate_features

    parent = rd.from_arrow(pa.table({"k": [1, 2, 3]}))
    child = rd.from_arrow(
        pa.table({"k": [1, 1, 2], "v": pa.array([None, None, 5.0], type=pa.float64())})
    )
    out = (
        dfs_aggregate_features(
            parent, child, parent_key="k", value_cols=["v"],
            aggs=("count", "sum", "mean", "min", "max", "std"), fill_missing=-1.0,
        )
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    # k=1: children exist, all values null -> every value agg filled
    for c in ["v_sum", "v_mean", "v_min", "v_max", "v_std"]:
        assert out.loc[1, c] == -1.0, (c, out.loc[1, c])
        assert not np.isnan(out.loc[3, c])  # no children at all -> filled too
    assert out.loc[1, "child_count"] == 2.0
    assert out.loc[2, "v_sum"] == 5.0


def test_tree_leading_empty_leaves_backfill():
    """A leading run of >=2 empty leaves must inherit the nearest non-NaN
    neighbor (forward+backward fill), not stay NaN (ADVICE r3)."""
    from ballet_ray.stages.trees import _grow_tree

    means = np.array([np.nan, np.nan, 3.0, np.nan, 7.0, np.nan, np.nan])
    # exercise the fill logic through a synthetic histogram that produces
    # empty leading bins: counts 0 for the first bins
    cnt = np.array([0, 0, 2, 0, 2, 0, 0], dtype=np.int64)
    s = np.array([0.0, 0.0, 6.0, 0.0, 14.0, 0.0, 0.0])
    ss = np.array([0.0, 0.0, 20.0, 0.0, 100.0, 0.0, 0.0])
    uppers, leaf_means = _grow_tree(cnt, s, ss, max_depth=6)
    assert not np.isnan(leaf_means).any(), leaf_means
