"""Driver-contract queries: one entry per operator family (SURVEY.md §2),
each with a DuckDB oracle in ORACLE_SQL (omitted for genuinely
non-SQL-expressible ops → driver runs a rows-only check).

Parity rules applied throughout:
- every computed column is NAMED IDENTICALLY in the Ray pipeline and SQL;
- derived floats are rounded (ROUND(x, N) in SQL, np.round here) so
  summation-order differences can't flip the driver's value hash;
- NaN produced by window kernels is converted to null (SQL windows yield
  NULL);
- deterministic ordering: window functions order by (ts, event_id), top-k
  ties broken by key columns.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ballet_ray.feature import Feature
from ballet_ray.pipeline import FeatureEngineeringPipeline
from ballet_ray.stages.asof import asof_join
from ballet_ray.stages.core import NullIndicator, ValueReplacer
from ballet_ray.stages.dedup import exact_dedup, minhash_lsh_pairs, simhash_pairs
from ballet_ray.stages.encoders import (
    CountEncoder,
    KBinsDiscretizer,
    MinMaxScaler,
    OrdinalEncoder,
    TargetEncoder,
    Winsorizer,
)
from ballet_ray.stages.groupwise import GroupwiseTransform
from ballet_ray.stages.joins import broadcast_join, hash_join
from ballet_ray.stages.similarity import embedding_near_dup_pairs, knn_brute
from ballet_ray.stages.text import Fingerprint, LangId, QualityScore, RegexTokenCount
from ballet_ray.stages.windows import FFill, Lag, MultiLag, RollingMean, Sessionize, apply_keyed


def _round_cols(ds, digits: dict[str, int]):
    """Round half AWAY from zero (DuckDB ROUND semantics; numpy/pyarrow
    default to half-to-even, which diverges on exact .5 boundaries like
    4.28125 @ 4 digits)."""

    def f(t: pa.Table) -> pa.Table:
        for c, d in digits.items():
            if c in t.column_names:
                i = t.column_names.index(c)
                x = t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
                s = 10.0**d
                r = np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s
                t = t.set_column(i, c, pa.array(r))
        return t

    return ds.map_batches(f, batch_format="pyarrow")


def _cast_cols(ds, types: dict[str, pa.DataType]):
    def f(t: pa.Table) -> pa.Table:
        for c, ty in types.items():
            if c in t.column_names:
                i = t.column_names.index(c)
                t = t.set_column(i, c, t.column(c).cast(ty))
        return t

    return ds.map_batches(f, batch_format="pyarrow")


def _nan_to_null(ds, cols: list[str]):
    def f(t: pa.Table) -> pa.Table:
        for c in cols:
            if c in t.column_names:
                col = t.column(c)
                if pa.types.is_floating(col.type):
                    i = t.column_names.index(c)
                    t = t.set_column(i, c, pc.if_else(pc.is_nan(col), pa.scalar(None, col.type), col))
        return t

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# groupby / aggregate / sort / scan family (TPC-H-ish)
# ---------------------------------------------------------------------------


def q_tpch_q1(sf_dir: str):
    from ray.data.aggregate import Count, Mean, Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("l_shipdate"), pa.scalar(pd.Timestamp("1998-09-02"))))
        disc_price = pc.multiply(t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return t.append_column("disc_price", disc_price)

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Mean("l_quantity", alias_name="avg_qty"),
            Mean("l_extendedprice", alias_name="avg_price"),
            Mean("l_discount", alias_name="avg_disc"),
            Count(alias_name="count_order"),
        )
    )
    return _round_cols(
        out,
        {"sum_base_price": 2, "sum_disc_price": 2, "avg_qty": 4, "avg_price": 4, "avg_disc": 4, "sum_qty": 2},
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                          AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                     AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
       ROUND(AVG(l_quantity), 4)                          AS avg_qty,
       ROUND(AVG(l_extendedprice), 4)                     AS avg_price,
       ROUND(AVG(l_discount), 4)                          AS avg_disc,
       COUNT(*)                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_topk_orders(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


SQL_TOPK_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def q_revenue_by_nation(sf_dir: str):
    from ray.data.aggregate import Sum

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return t.append_column("rev", r).select(["l_orderkey", "rev"])

    li = li.map_batches(rev, batch_format="pyarrow")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    j = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=16)
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    j = broadcast_join(j, cust, key="o_custkey", right_key="c_custkey", value_cols=["c_nationkey"])
    j = broadcast_join(j, nation, key="c_nationkey", right_key="n_nationkey", value_cols=["n_name"])
    out = j.groupby("n_name").aggregate(Sum("rev", alias_name="revenue"))
    return _round_cols(out, {"revenue": 2})


SQL_REVENUE_BY_NATION = """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# windowed / keyed family over events
# ---------------------------------------------------------------------------


def _events(sf_dir: str):
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"])


def q_lag_lead_events(sf_dir: str):
    ds = _events(sf_dir)
    out = apply_keyed(
        ds,
        [
            (
                MultiLag([1, 2, -1], key="user_id", order_by=["ts", "event_id"]),
                ["value"],
                ["value_lag1", "value_lag2", "value_lead1"],
            )
        ],
        "user_id",
        ["ts", "event_id"],
    ).select_columns(["event_id", "user_id", "value", "value_lag1", "value_lag2", "value_lead1"])
    return _nan_to_null(out, ["value_lag1", "value_lag2", "value_lead1"])


SQL_LAG_LEAD_EVENTS = """
SELECT event_id, user_id, value,
       LAG(value, 1)  OVER w AS value_lag1,
       LAG(value, 2)  OVER w AS value_lag2,
       LEAD(value, 1) OVER w AS value_lead1
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_rolling_mean_events(sf_dir: str):
    ds = _events(sf_dir)
    out = apply_keyed(
        ds,
        [(RollingMean(3, key="user_id", order_by=["ts", "event_id"]), ["value"], ["value_rmean3"])],
        "user_id",
        ["ts", "event_id"],
    ).select_columns(["event_id", "user_id", "value_rmean3"])
    return _round_cols(_nan_to_null(out, ["value_rmean3"]), {"value_rmean3": 4})


SQL_ROLLING_MEAN_EVENTS = """
SELECT event_id, user_id,
       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS value_rmean3
FROM events
"""


def q_sessionize_events(sf_dir: str):
    ds = _events(sf_dir)
    out = apply_keyed(
        ds,
        [(Sessionize(1800, key="user_id", order_by=["ts", "event_id"]), ["ts"], ["session_id"])],
        "user_id",
        ["ts", "event_id"],
    ).select_columns(["event_id", "user_id", "session_id"])
    return out


SQL_SESSIONIZE_EVENTS = """
SELECT event_id, user_id,
       CAST(SUM(CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM (
  SELECT event_id, user_id, ts,
         COALESCE(date_diff('second', LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts), 0) AS gap_s
  FROM events
)
"""


def q_ffill_events(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type", "value"])

    def mask(t: pa.Table) -> pa.Table:
        masked = pc.if_else(pc.equal(t.column("event_type"), "error"), pa.scalar(None, pa.float64()), t.column("value"))
        return t.append_column("value_masked", masked)

    ds = ds.map_batches(mask, batch_format="pyarrow")
    out = apply_keyed(
        ds,
        [(FFill(key="user_id", order_by=["ts", "event_id"]), ["value_masked"], ["value_ffill"])],
        "user_id",
        ["ts", "event_id"],
    ).select_columns(["event_id", "user_id", "value_ffill"])
    return _nan_to_null(out, ["value_ffill"])


SQL_FFILL_EVENTS = """
SELECT event_id, user_id,
       LAST_VALUE(CASE WHEN event_type = 'error' THEN NULL ELSE value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
FROM events
"""


def q_asof_click_purchase(sf_dir: str):
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type", "value"])

    def split_left(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "click"))
        return t.select(["event_id", "ts", "user_id"])

    def split_right(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        return t.select(["user_id", "ts", "value"])

    clicks = ev.map_batches(split_left, batch_format="pyarrow")
    purchases = ev.map_batches(split_right, batch_format="pyarrow")

    # dedupe right per (user, ts): keep max value (deterministic) — the
    # coarse-partition grouped_reduce (the (user, ts) key is one group per
    # purchase row; Ray's per-group combine costs ~60 µs per distinct key)
    from ballet_ray.functions.reduce import grouped_reduce

    purchases = grouped_reduce(
        purchases, ["user_id", "ts"], {"value": "max"}, pre_combine=True
    )
    out = asof_join(
        clicks,
        purchases.map_batches(lambda t: t.rename_columns(["user_id", "ts", "last_purchase_value"]), batch_format="pyarrow"),
        on="ts",
        by="user_id",
        right_cols=["last_purchase_value"],
        allow_exact=True,
    ).select_columns(["event_id", "user_id", "last_purchase_value"])
    return out


SQL_ASOF_CLICK_PURCHASE = """
WITH clicks AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, MAX(value) AS last_purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id, p.last_purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def q_window_join_events(sf_dir: str):
    """Windowed join: each click enriched with COUNT/SUM/AVG/MAX of the
    same user's purchases in the trailing hour ``[ts-1h, ts)`` — the
    feature-store staple (strictly-before window: zero temporal leakage)."""
    from ballet_ray.stages.asof import window_join

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def split_left(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "click"))
        return t.select(["event_id", "ts", "user_id"])

    def split_right(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        return t.select(["user_id", "ts", "value"])

    clicks = ev.map_batches(split_left, batch_format="pyarrow")
    purchases = ev.map_batches(split_right, batch_format="pyarrow")
    out = window_join(
        clicks,
        purchases,
        on="ts",
        by="user_id",
        window="1h",
        aggs={"value": ("sum", "mean", "max")},
        count_name="purchase_count",
    ).select_columns(
        ["event_id", "user_id", "purchase_count", "value_sum", "value_mean", "value_max"]
    )
    return _round_cols(out, {"value_sum": 2, "value_mean": 4, "value_max": 4})


SQL_WINDOW_JOIN_EVENTS = """
WITH clicks AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id, c.user_id,
       COUNT(p.user_id) AS purchase_count,
       ROUND(SUM(p.value), 2) AS value_sum,
       ROUND(AVG(p.value), 4) AS value_mean,
       ROUND(MAX(p.value), 4) AS value_max
FROM clicks c LEFT JOIN purchases p
  ON p.user_id = c.user_id
 AND p.ts >= c.ts - INTERVAL 1 HOUR AND p.ts < c.ts
GROUP BY c.event_id, c.user_id
"""


_DSIR_B = 1000  # hashed-n-gram buckets (the paper uses 10k; 1k keeps the sf oracle cheap)


def q_dsir_logw_docs(sf_dir: str):
    """DSIR (Xie et al. 2023) log importance weights: how much each raw
    document's hashed uni+bigram distribution looks like the target
    subcorpus (here: the English documents). Two 8 KB tree-reduced
    bucket-count fits + one shuffle-free scoring pass; md5 bucket mode so
    the DuckDB oracle reproduces the hash exactly."""
    from ballet_ray.stages.dsir import dsir_log_weights

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    target = docs.map_batches(lambda t: t.filter(pc.equal(t.column("lang"), "en")), batch_format="pyarrow")
    return dsir_log_weights(
        docs, target, buckets=_DSIR_B, alpha=1.0, method="md5", round_to=4
    )


SQL_DSIR_LOGW_DOCS = f"""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
    SELECT doc_id, g FROM docs, UNNEST(w) AS t(g)
    UNION ALL
    SELECT doc_id, w[i] || ' ' || w[i + 1] AS g
    FROM docs, UNNEST(range(1, len(w))) AS t(i)
),
bg AS (
    SELECT doc_id,
           CAST(CAST('0x' || substr(md5(g), 1, 8) AS UBIGINT) % {_DSIR_B} AS BIGINT) AS b
    FROM grams
),
tgt AS (
    SELECT b, COUNT(*) AS c
    FROM bg JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY b
),
rawc AS (SELECT b, COUNT(*) AS c FROM bg GROUP BY b),
tot AS (
    SELECT (SELECT SUM(c) FROM tgt) AS tt, (SELECT SUM(c) FROM rawc) AS tr
),
lam AS (
    SELECT r.b,
           ln(COALESCE(t.c, 0) + 1.0) - ln(tot.tt + {_DSIR_B})
         - ln(r.c + 1.0) + ln(tot.tr + {_DSIR_B}) AS l
    FROM rawc r LEFT JOIN tgt t USING (b) CROSS JOIN tot
)
SELECT bg.doc_id, ROUND(SUM(lam.l), 4) AS logw
FROM bg JOIN lam USING (b)
GROUP BY bg.doc_id
"""


def q_dsir_resample_docs(sf_dir: str):
    """DSIR selection step: Gumbel-top-k importance resampling without
    replacement (k=100 docs toward the English-subcorpus distribution).
    Deterministic — the Gumbel noise is a hash-uniform transform of the
    doc id, so the draw is reproducible and SQL-auditable; only
    (id, logw, key) enter the final global top-k sort."""
    from ballet_ray.stages.dsir import dsir_resample

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    target = docs.map_batches(lambda t: t.filter(pc.equal(t.column("lang"), "en")), batch_format="pyarrow")
    return dsir_resample(
        docs, target, k=100, buckets=_DSIR_B, alpha=1.0,
        salt="dsir", method="md5", round_to=4,
    )


SQL_DSIR_RESAMPLE_DOCS = f"""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
    SELECT doc_id, g FROM docs, UNNEST(w) AS t(g)
    UNION ALL
    SELECT doc_id, w[i] || ' ' || w[i + 1] AS g
    FROM docs, UNNEST(range(1, len(w))) AS t(i)
),
bg AS (
    SELECT doc_id,
           CAST(CAST('0x' || substr(md5(g), 1, 8) AS UBIGINT) % {_DSIR_B} AS BIGINT) AS b
    FROM grams
),
tgt AS (
    SELECT b, COUNT(*) AS c
    FROM bg JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY b
),
rawc AS (SELECT b, COUNT(*) AS c FROM bg GROUP BY b),
tot AS (
    SELECT (SELECT SUM(c) FROM tgt) AS tt, (SELECT SUM(c) FROM rawc) AS tr
),
lam AS (
    SELECT r.b,
           ln(COALESCE(t.c, 0) + 1.0) - ln(tot.tt + {_DSIR_B})
         - ln(r.c + 1.0) + ln(tot.tr + {_DSIR_B}) AS l
    FROM rawc r LEFT JOIN tgt t USING (b) CROSS JOIN tot
),
scored AS (
    SELECT bg.doc_id, SUM(lam.l) AS logw
    FROM bg JOIN lam USING (b)
    GROUP BY bg.doc_id
),
keyed AS (
    SELECT doc_id, logw,
           logw + -ln(-ln(
               (CAST('0x' || substr(md5('dsir' || CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT)
                + 0.5) / 4294967296.0
           )) AS key
    FROM scored
)
SELECT doc_id, ROUND(logw, 4) AS logw, ROUND(key, 4) AS key
FROM keyed
ORDER BY key DESC, doc_id
LIMIT 100
"""


def q_bigram_logprob_docs(sf_dir: str):
    """CCNet-style perplexity filter: per-doc logprob / mean logprob /
    perplexity under an interpolated bigram LM fit on the corpus itself
    (λ·MLE-bigram + (1−λ)·add-α unigram). One term-keyed groupby per model
    table, broadcast behind top-K caps; scoring is shuffle-free."""
    from ballet_ray.stages.text import bigram_logprob_scores

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bigram_logprob_scores(ds, lam=0.8, alpha=0.5, round_to=4)


SQL_BIGRAM_LOGPROB_DOCS = """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
words AS (SELECT doc_id, g FROM docs, UNNEST(w) AS t(g)),
uni AS (SELECT g, COUNT(*) AS c FROM words GROUP BY g),
tot AS (SELECT SUM(c) AS T, COUNT(*) AS V FROM uni),
pairs AS (
    SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
    FROM docs, UNNEST(range(1, len(w))) AS t(i)
),
bi AS (SELECT w1, w2, COUNT(*) AS c2 FROM pairs GROUP BY w1, w2),
lp AS (
    SELECT p.doc_id,
           ln(0.8 * COALESCE(bi.c2, 0) / u1.c
              + 0.2 * (u2.c + 0.5) / (tot.T + 0.5 * tot.V)) AS l
    FROM pairs p
    JOIN uni u1 ON u1.g = p.w1
    JOIN uni u2 ON u2.g = p.w2
    LEFT JOIN bi ON bi.w1 = p.w1 AND bi.w2 = p.w2
    CROSS JOIN tot
),
agg AS (SELECT doc_id, SUM(l) AS s, COUNT(*) AS np FROM lp GROUP BY doc_id)
SELECT d.doc_id,
       ROUND(COALESCE(agg.s, 0), 4) AS logprob,
       ROUND(COALESCE(agg.s / agg.np, 0), 4) AS mean_logprob,
       ROUND(EXP(-COALESCE(agg.s / agg.np, 0)), 4) AS ppl
FROM docs d LEFT JOIN agg ON agg.doc_id = d.doc_id
"""


def q_kn_logprob_docs(sf_dir: str):
    """CCNet's real filter shape: per-doc logprob / mean / perplexity under
    an interpolated Kneser–Ney TRIGRAM LM fit on the corpus (Chen & Goodman
    1999 interpolated KN with Ney discounts D = n1/(n1+2n2) per order — the
    family KenLM implements; the bigram query above is the cheap stand-in).
    Fit = one corpus-wide trigram groupby + coarse-partition context
    kernels; scoring shuffle-free. Full SQL oracle recomputes the entire
    fit in DuckDB."""
    from ballet_ray.stages.knlm import kn_logprob_scores

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return kn_logprob_scores(ds, alpha=0.5, round_to=4)


SQL_KN_LOGPROB_DOCS = """
WITH docs AS (SELECT doc_id, string_split('<s> <s> ' || text, ' ') AS w FROM documents),
tris AS (
    SELECT doc_id, w[i] AS u, w[i + 1] AS v, w[i + 2] AS t3
    FROM docs, UNNEST(range(1, len(w) - 1)) AS t(i)
),
tc AS (SELECT u, v, t3, COUNT(*)::DOUBLE AS c FROM tris GROUP BY u, v, t3),
cof3 AS (SELECT SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)::DOUBLE AS n1,
                SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END)::DOUBLE AS n2 FROM tc),
d3 AS (SELECT CASE WHEN n1 + 2 * n2 > 0 THEN n1 / (n1 + 2 * n2) ELSE 0.5 END AS d FROM cof3),
ctx3 AS (SELECT u, v, SUM(c) AS tot, COUNT(*)::DOUBLE AS np FROM tc GROUP BY u, v),
k AS (SELECT v, t3, COUNT(*)::DOUBLE AS kc FROM tc GROUP BY v, t3),
cof2 AS (SELECT SUM(CASE WHEN kc = 1 THEN 1 ELSE 0 END)::DOUBLE AS n1,
                SUM(CASE WHEN kc = 2 THEN 1 ELSE 0 END)::DOUBLE AS n2 FROM k),
d2 AS (SELECT CASE WHEN n1 + 2 * n2 > 0 THEN n1 / (n1 + 2 * n2) ELSE 0.5 END AS d FROM cof2),
ctx2 AS (SELECT v, SUM(kc) AS tot, COUNT(*)::DOUBLE AS nw FROM k GROUP BY v),
cw AS (SELECT t3, COUNT(*)::DOUBLE AS c FROM k GROUP BY t3),
nb AS (SELECT COUNT(*)::DOUBLE AS n FROM k),
vv AS (SELECT COUNT(*)::DOUBLE AS v FROM cw),
lp AS (
    SELECT tr.doc_id,
           ln(GREATEST(tc.c - d3.d, 0) / ctx3.tot
              + d3.d * ctx3.np / ctx3.tot
                * (GREATEST(k.kc - d2.d, 0) / ctx2.tot
                   + d2.d * ctx2.nw / ctx2.tot
                     * ((cw.c + 0.5) / (nb.n + 0.5 * (vv.v + 1))))) AS l
    FROM tris tr
    JOIN tc ON tc.u = tr.u AND tc.v = tr.v AND tc.t3 = tr.t3
    JOIN ctx3 ON ctx3.u = tr.u AND ctx3.v = tr.v
    JOIN k ON k.v = tr.v AND k.t3 = tr.t3
    JOIN ctx2 ON ctx2.v = tr.v
    JOIN cw ON cw.t3 = tr.t3
    CROSS JOIN d3 CROSS JOIN d2 CROSS JOIN nb CROSS JOIN vv
),
agg AS (SELECT doc_id, SUM(l) AS s, COUNT(*) AS np FROM lp GROUP BY doc_id)
SELECT d.doc_id,
       ROUND(COALESCE(agg.s, 0), 4) AS logprob,
       ROUND(COALESCE(agg.s / agg.np, 0), 4) AS mean_logprob,
       ROUND(EXP(-COALESCE(agg.s / agg.np, 0)), 4) AS ppl
FROM docs d LEFT JOIN agg ON agg.doc_id = d.doc_id
"""


def q_ppl_bucket_docs(sf_dir: str):
    """CCNet head/middle/tail split (Wenzek et al. 2020 §3.3): score every
    doc with the corpus-fit interpolated bigram LM, then cut the
    per-LANGUAGE perplexity ranking into thirds — 'head' = the most fluent
    third of each language. Exact SQL window semantics via grouped_rank."""
    from ballet_ray.stages.text import bigram_logprob_scores
    from ballet_ray.stages.windows import rank_buckets

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    scored = bigram_logprob_scores(ds, lam=0.8, alpha=0.5, round_to=4,
                                   keep_cols=["lang"])
    out = rank_buckets(scored, value_col="ppl", group_col="lang")
    return out.select_columns(["doc_id", "lang", "ppl", "bucket"])


SQL_PPL_BUCKET_DOCS = """
WITH docs AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
words AS (SELECT doc_id, g FROM docs, UNNEST(w) AS t(g)),
uni AS (SELECT g, COUNT(*) AS c FROM words GROUP BY g),
tot AS (SELECT SUM(c) AS T, COUNT(*) AS V FROM uni),
pairs AS (
    SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
    FROM docs, UNNEST(range(1, len(w))) AS t(i)
),
bi AS (SELECT w1, w2, COUNT(*) AS c2 FROM pairs GROUP BY w1, w2),
lp AS (
    SELECT p.doc_id,
           ln(0.8 * COALESCE(bi.c2, 0) / u1.c
              + 0.2 * (u2.c + 0.5) / (tot.T + 0.5 * tot.V)) AS l
    FROM pairs p
    JOIN uni u1 ON u1.g = p.w1
    JOIN uni u2 ON u2.g = p.w2
    LEFT JOIN bi ON bi.w1 = p.w1 AND bi.w2 = p.w2
    CROSS JOIN tot
),
agg AS (SELECT doc_id, SUM(l) AS s, COUNT(*) AS np FROM lp GROUP BY doc_id),
scored AS (
    SELECT d.doc_id, d.lang,
           ROUND(EXP(-COALESCE(agg.s / agg.np, 0)), 4) AS ppl
    FROM docs d LEFT JOIN agg ON agg.doc_id = d.doc_id
)
SELECT doc_id, lang, ppl,
       CASE WHEN pr < 1.0/3 THEN 'head'
            WHEN pr < 2.0/3 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM (SELECT *, PERCENT_RANK() OVER (PARTITION BY lang ORDER BY ppl) AS pr
      FROM scored)
"""


def q_bpe_tokenize_docs(sf_dir: str):
    """Train-and-apply BPE (Sennrich 2016) over the corpus. Rows-only
    (tokenizer fits are not SQL-expressible); exact-parity + partition-
    invariance pytest in tests/test_bpe.py."""
    from ballet_ray.stages.bpe import apply_bpe, train_bpe

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    tok = train_bpe(ds, num_merges=200)
    return apply_bpe(ds, tok).select_columns(["doc_id", "n_tok"])


def q_bytebpe_tokenize_docs(sf_dir: str):
    """Train-and-apply byte-level BPE (GPT-2 family, Radford 2019): BPE
    over UTF-8 bytes with the space-attach pretokenizer, so every input
    encodes without UNK and decode(encode(text)) == text byte-for-byte.
    Rows-only (tokenizer fits are not SQL-expressible); brute-reference
    merge parity, unicode roundtrip and actor-pool parity pytest in
    tests/test_bytebpe.py."""
    from ballet_ray.stages.bytebpe import apply_byte_bpe, train_byte_bpe

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    tok = train_byte_bpe(ds, num_merges=200)
    return apply_byte_bpe(ds, tok).select_columns(["doc_id", "n_tok"])


def q_span_corruption_docs(sf_dir: str):
    """T5 span corruption (Raffel 2020) over the pre-tokenized column
    (word lengths stand in for token ids): mask random token spans,
    emit (inputs, targets) with negative sentinels. Rows-only (the
    keyed-gap segmentation is splitmix64 math, not SQL-expressible);
    exact per-row reference parity + layout-invariant pytest in
    tests/test_span_corruption.py."""
    from ballet_ray.stages.sequences import span_corruption

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.cast(t.column("text"), pa.string()), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        lens = pc.cast(pc.utf8_length(words.flatten()), pa.int64())
        return pa.table({"doc_id": t.column("doc_id"),
                         "tokens": pa.ListArray.from_arrays(words.offsets, lens)})

    out = span_corruption(ds.map_batches(toks, batch_format="pyarrow"),
                          noise_density=0.15, mean_span_len=3.0)
    return out.select_columns(["doc_id", "n_in", "n_tgt"])


def q_unigram_tokenize_docs(sf_dir: str):
    """Train-and-apply unigram-LM tokenizer (Kudo 2018 / SentencePiece).
    Rows-only (EM fits are not SQL-expressible); Viterbi-optimality,
    partition-invariance and roundtrip pytest in tests/test_unigram.py."""
    from ballet_ray.stages.unigram import apply_unigram, train_unigram

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    tok = train_unigram(ds, vocab_size=300, max_piece_len=6,
                        seed_size=2000, em_rounds=1)
    return apply_unigram(ds, tok).select_columns(["doc_id", "n_tok"])


def q_wordpiece_tokenize_docs(sf_dir: str):
    """Train-and-apply WordPiece (Schuster & Nakajima 2012 / BERT).
    Rows-only (tokenizer fits are not SQL-expressible); brute-reference
    merge parity, greedy-longest-match, partition-invariance and roundtrip
    pytest in tests/test_wordpiece.py."""
    from ballet_ray.stages.wordpiece import apply_wordpiece, train_wordpiece

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    tok = train_wordpiece(ds, vocab_size=300)
    return apply_wordpiece(ds, tok).select_columns(["doc_id", "n_tok"])


def q_split_sentences_docs(sf_dir: str):
    """Sentence explosion (one row per sentence, stable within-doc index).
    Corpus text is punctuation-free, so both sides wrap each doc in the
    same deterministic page exercising every boundary kind: newline, '. ',
    '? ', multi-punct '!! ', trailing whitespace, a blank-line run."""
    from ballet_ray.stages.text import split_sentences

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def wrap(t: pa.Table) -> pa.Table:
        txt = pc.cast(t.column("text"), pa.string())
        did = pc.cast(t.column("doc_id"), pa.string())
        page = pc.binary_join_element_wise(
            "Intro line one\n", txt,
            ". Then a question? Yes!! Finally   \n\nTail ", did, "")
        return pa.table({"doc_id": t.column("doc_id"), "text": page})

    return split_sentences(ds.map_batches(wrap, batch_format="pyarrow"))


SQL_SPLIT_SENTENCES_DOCS = """
WITH page AS (
    SELECT doc_id,
           'Intro line one' || chr(10) || text ||
           '. Then a question? Yes!! Finally   ' || chr(10) || chr(10) ||
           'Tail ' || CAST(doc_id AS VARCHAR) AS p
    FROM documents
), m AS (
    SELECT doc_id,
           string_split(
               regexp_replace(
                   regexp_replace(p, '([.!?]+)\\s+', '\\1' || chr(30), 'g'),
                   '\\n+', chr(30), 'g'),
               chr(30)) AS arr
    FROM page
), x AS (
    SELECT doc_id, i,
           trim(arr[i], ' ' || chr(9) || chr(13) || chr(10)) AS s
    FROM m, UNNEST(range(1, len(arr) + 1)) AS t(i)
)
SELECT doc_id,
       ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS sent_idx,
       s AS sentence
FROM x
WHERE length(s) >= 1
"""


def q_dedup_sentences_docs(sf_dir: str):
    """Sentence-level corpus dedup (composition: split_sentences →
    exact_dedup on the sentence text, global first occurrence by
    (doc_id, sent_idx) wins). The synthetic page's four constant
    sentences are corpus-wide duplicates — 500 docs collapse them to one
    each — while the doc sentence dedups only across planted clone docs."""
    from ballet_ray.stages.dedup import exact_dedup
    from ballet_ray.stages.text import split_sentences

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def wrap(t: pa.Table) -> pa.Table:
        txt = pc.cast(t.column("text"), pa.string())
        did = pc.cast(t.column("doc_id"), pa.string())
        page = pc.binary_join_element_wise(
            "Intro line one\n", txt,
            ". Then a question? Yes!! Finally   \n\nTail ", did, "")
        return pa.table({"doc_id": t.column("doc_id"), "text": page})

    sents = split_sentences(ds.map_batches(wrap, batch_format="pyarrow"))

    def add_sid(t: pa.Table) -> pa.Table:
        sid = pc.add(pc.multiply(t.column("doc_id"), 64), t.column("sent_idx"))
        return t.append_column("sid", pc.cast(sid, pa.int64()))

    kept = exact_dedup(sents.map_batches(add_sid, batch_format="pyarrow"),
                       col="sentence", id_col="sid")

    def unpack(t: pa.Table) -> pa.Table:
        sid = t.column("sid").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(sid // 64),
            "sent_idx": pa.array(sid % 64),
            "sentence": t.column("sentence"),
        })

    return kept.map_batches(unpack, batch_format="pyarrow")


SQL_DEDUP_SENTENCES_DOCS = """
WITH page AS (
    SELECT doc_id,
           'Intro line one' || chr(10) || text ||
           '. Then a question? Yes!! Finally   ' || chr(10) || chr(10) ||
           'Tail ' || CAST(doc_id AS VARCHAR) AS p
    FROM documents
), m AS (
    SELECT doc_id,
           string_split(
               regexp_replace(
                   regexp_replace(p, '([.!?]+)\\s+', '\\1' || chr(30), 'g'),
                   '\\n+', chr(30), 'g'),
               chr(30)) AS arr
    FROM page
), x AS (
    SELECT doc_id, i,
           trim(arr[i], ' ' || chr(9) || chr(13) || chr(10)) AS s
    FROM m, UNNEST(range(1, len(arr) + 1)) AS t(i)
), sents AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS sent_idx,
           s AS sentence
    FROM x
    WHERE length(s) >= 1
)
SELECT doc_id, sent_idx, sentence
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY sentence
                                   ORDER BY doc_id * 64 + sent_idx) AS rn
      FROM sents)
WHERE rn = 1
"""


def q_tumbling_window_events(sf_dir: str):
    from ballet_ray.functions.reduce import grouped_reduce

    ds = _events(sf_dir)

    def bucket(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t.column("ts"), unit="hour")
        t = t.append_column("window_start", hour)
        t = t.append_column("n_events", pa.array(np.ones(len(t), dtype=np.int64)))
        return t.append_column("sum_value", t.column("value"))

    # (user, window) is high-cardinality → coarse-partition grouped_reduce
    out = grouped_reduce(
        ds.map_batches(bucket, batch_format="pyarrow"),
        ["user_id", "window_start"],
        {"n_events": "sum", "sum_value": "sum"},
        pre_combine=True,
    )
    return _round_cols(out, {"sum_value": 2})


SQL_TUMBLING_WINDOW_EVENTS = """
SELECT user_id, date_trunc('hour', ts) AS window_start,
       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY user_id, date_trunc('hour', ts)
"""


# ---------------------------------------------------------------------------
# fitted encoders family
# ---------------------------------------------------------------------------


def q_standardize_docs(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"])
    from ballet_ray.stages.encoders import StandardScaler

    t = GroupwiseTransform(StandardScaler(), groupby="source")
    pipe = FeatureEngineeringPipeline([Feature("n_chars", t, output="n_chars_z")])
    out = pipe.fit_transform(ds).select_columns(["doc_id", "source", "n_chars_z"])
    return _round_cols(out, {"n_chars_z": 4})


SQL_STANDARDIZE_DOCS = """
SELECT doc_id, source,
       ROUND((n_chars - AVG(n_chars) OVER (PARTITION BY source))
             / STDDEV_POP(n_chars) OVER (PARTITION BY source), 4) AS n_chars_z
FROM documents
"""


def q_count_encode_lang(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    pipe = FeatureEngineeringPipeline([Feature("lang", CountEncoder(), output="lang_count")])
    return pipe.fit_transform(ds).select_columns(["doc_id", "lang", "lang_count"])


SQL_COUNT_ENCODE_LANG = """
SELECT doc_id, lang, COUNT(*) OVER (PARTITION BY lang) AS lang_count
FROM documents
"""


def q_ordinal_encode_lang(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    pipe = FeatureEngineeringPipeline([Feature("lang", OrdinalEncoder(), output="lang_code")])
    return pipe.fit_transform(ds).select_columns(["doc_id", "lang_code"])


SQL_ORDINAL_ENCODE_LANG = """
SELECT doc_id, DENSE_RANK() OVER (ORDER BY lang) - 1 AS lang_code
FROM documents
"""


def q_minmax_orders(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    pipe = FeatureEngineeringPipeline([Feature("o_totalprice", MinMaxScaler(), output="price_mm")])
    out = pipe.fit_transform(ds).select_columns(["o_orderkey", "price_mm"])
    return _round_cols(out, {"price_mm": 6})


SQL_MINMAX_ORDERS = """
SELECT o_orderkey,
       ROUND((o_totalprice - MIN(o_totalprice) OVER ())
             / (MAX(o_totalprice) OVER () - MIN(o_totalprice) OVER ()), 6) AS price_mm
FROM orders
"""


def q_target_encode_priority(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    pipe = FeatureEngineeringPipeline(
        [Feature("o_orderpriority", TargetEncoder(target_col="o_totalprice"), output="priority_tmean")]
    )
    out = pipe.fit_transform(ds).select_columns(["o_orderkey", "priority_tmean"])
    return _round_cols(out, {"priority_tmean": 4})


SQL_TARGET_ENCODE_PRIORITY = """
SELECT o_orderkey,
       ROUND(AVG(o_totalprice) OVER (PARTITION BY o_orderpriority), 4) AS priority_tmean
FROM orders
"""


def q_value_replace_discount(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber", "l_discount"])
    pipe = FeatureEngineeringPipeline([Feature("l_discount", ValueReplacer(0.0, -1.0), output="disc_repl")])
    return pipe.fit_transform(ds).select_columns(["l_orderkey", "l_linenumber", "disc_repl"])


SQL_VALUE_REPLACE_DISCOUNT = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_discount = 0.0 THEN -1.0 ELSE l_discount END AS disc_repl
FROM lineitem
"""


def q_null_indicator_events(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"])

    def mask(t: pa.Table) -> pa.Table:
        masked = pc.if_else(pc.equal(t.column("event_type"), "error"), pa.scalar(None, pa.float64()), t.column("value"))
        return t.append_column("value_masked", masked)

    ds = ds.map_batches(mask, batch_format="pyarrow")
    from ballet_ray.stages.core import NullFiller

    pipe = FeatureEngineeringPipeline(
        [
            Feature("value_masked", NullIndicator(), output="value_isnull"),
            Feature("value_masked", NullFiller(0.0), output="value_filled"),
        ]
    )
    out = pipe.fit_transform(ds).select_columns(["event_id", "value_isnull", "value_filled"])
    return _cast_cols(out, {"value_isnull": pa.int64()})


SQL_NULL_INDICATOR_EVENTS = """
SELECT event_id,
       CAST(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS BIGINT) AS value_isnull,
       CASE WHEN event_type = 'error' THEN 0.0 ELSE value END AS value_filled
FROM events
"""


def q_kbins_orders(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    pipe = FeatureEngineeringPipeline(
        [Feature("o_totalprice", KBinsDiscretizer(n_bins=4, strategy="quantile"), output="price_bin")]
    )
    return pipe.fit_transform(ds).select_columns(["o_orderkey", "price_bin"])


SQL_KBINS_ORDERS = """
WITH e AS (
  SELECT quantile_cont(o_totalprice, 0.25) AS q1,
         quantile_cont(o_totalprice, 0.50) AS q2,
         quantile_cont(o_totalprice, 0.75) AS q3
  FROM orders
)
SELECT o_orderkey,
       (CASE WHEN o_totalprice > q1 THEN 1 ELSE 0 END
        + CASE WHEN o_totalprice > q2 THEN 1 ELSE 0 END
        + CASE WHEN o_totalprice > q3 THEN 1 ELSE 0 END) AS price_bin
FROM orders, e
"""


def q_winsorize_orders(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    pipe = FeatureEngineeringPipeline(
        [Feature("o_totalprice", Winsorizer(0.01, 0.99), output="price_w")]
    )
    out = pipe.fit_transform(ds).select_columns(["o_orderkey", "price_w"])
    return _round_cols(out, {"price_w": 4})


SQL_WINSORIZE_ORDERS = """
WITH e AS (
  SELECT quantile_cont(o_totalprice, 0.01) AS lo, quantile_cont(o_totalprice, 0.99) AS hi
  FROM orders
)
SELECT o_orderkey,
       ROUND(LEAST(GREATEST(o_totalprice, lo), hi), 4) AS price_w
FROM orders, e
"""


# ---------------------------------------------------------------------------
# text / dedup / similarity family
# ---------------------------------------------------------------------------


def q_token_count_docs(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pipe = FeatureEngineeringPipeline([Feature("text", RegexTokenCount(), output="text_ntok")])
    return pipe.fit_transform(ds).select_columns(["doc_id", "text_ntok"])


SQL_TOKEN_COUNT_DOCS = """
SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS text_ntok
FROM documents
"""


def q_fingerprint_docs(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pipe = FeatureEngineeringPipeline([Feature("text", Fingerprint(), output="text_md5")])
    return pipe.fit_transform(ds).select_columns(["doc_id", "text_md5"])


SQL_FINGERPRINT_DOCS = """
SELECT doc_id, md5(text) AS text_md5 FROM documents
"""


def q_quality_docs(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pipe = FeatureEngineeringPipeline([Feature("text", QualityScore())])
    out = pipe.fit_transform(ds).select_columns(["doc_id", "words", "mean_wlen", "alpha_frac", "quality"])
    return _round_cols(out, {"mean_wlen": 4, "alpha_frac": 4, "quality": 6})


def q_tfidf_top_terms_docs(sf_dir: str):
    """Top TF-IDF term per document (sklearn smooth idf, lexicographic
    tie-break). Scale shape: one vocab-keyed groupby builds the DF table,
    which is broadcast; the per-doc argmax runs inside map_batches with no
    doc-keyed shuffle (a doc's terms never span blocks)."""
    from ballet_ray.stages.text import tfidf_top_terms

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return tfidf_top_terms(ds, text_col="text", id_col="doc_id", round_to=6)


SQL_TFIDF_TOP_TERMS_DOCS = """
WITH counts AS (
    SELECT doc_id, w, COUNT(*) AS c
    FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
    GROUP BY doc_id, w
), df AS (
    SELECT w, COUNT(*) AS df FROM counts GROUP BY w
), n AS (SELECT COUNT(*) AS n FROM documents)
SELECT doc_id, w AS top_term,
       ROUND(c * (ln((1.0 + n.n) / (1.0 + df.df)) + 1.0), 6) AS score
FROM counts JOIN df USING (w) CROSS JOIN n
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY doc_id
    ORDER BY c * (ln((1.0 + n.n) / (1.0 + df.df)) + 1.0) DESC, w
) = 1
"""


def q_bm25_top_terms_docs(sf_dir: str):
    """Top BM25 term per doc (Okapi k1=1.2 b=0.75, Lucene idf) — same
    vocab-keyed-DF + in-batch-argmax shape as TF-IDF."""
    from ballet_ray.stages.text import bm25_top_terms

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bm25_top_terms(ds, text_col="text", id_col="doc_id", round_to=6)


SQL_BM25_TOP_TERMS_DOCS = """
WITH counts AS (
    SELECT doc_id, w, COUNT(*) AS c
    FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
    GROUP BY doc_id, w
), dl AS (
    SELECT doc_id, SUM(c) AS dl FROM counts GROUP BY doc_id
), df AS (
    SELECT w, COUNT(*) AS df FROM counts GROUP BY w
), n AS (SELECT COUNT(*) AS n FROM documents),
a AS (SELECT SUM(c) * 1.0 / (SELECT n FROM n) AS avgdl FROM counts)
SELECT doc_id, w AS top_term,
       ROUND(ln(1 + (n.n - df.df + 0.5) / (df.df + 0.5))
             * c * 2.2 / (c + 1.2 * (1 - 0.75 + 0.75 * dl.dl / a.avgdl)), 6) AS score
FROM counts
JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN n CROSS JOIN a
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY doc_id
    ORDER BY ln(1 + (n.n - df.df + 0.5) / (df.df + 0.5))
             * c * 2.2 / (c + 1.2 * (1 - 0.75 + 0.75 * dl.dl / a.avgdl)) DESC, w
) = 1
"""


def q_ngram_repetition_docs(sf_dir: str):
    """Duplicate/top bigram fractions (the n>1 half of the Gopher
    repetition family) — exact counts over base-V integer n-gram keys."""
    from ballet_ray.stages.text import NgramRepetition

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pipe = FeatureEngineeringPipeline([Feature("text", NgramRepetition(2))])
    out = pipe.fit_transform(ds).select_columns(["doc_id", "dup_2gram_frac", "top_2gram_frac"])
    return _round_cols(out, {"dup_2gram_frac": 6, "top_2gram_frac": 6})


SQL_NGRAM_REPETITION_DOCS = """
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bg AS (
    SELECT doc_id, UNNEST([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS g
    FROM ws
), counts AS (
    SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g
), agg AS (
    SELECT doc_id,
           1.0 - COUNT(*) * 1.0 / SUM(c) AS dup_f,
           MAX(c) * 1.0 / SUM(c) AS top_f
    FROM counts GROUP BY doc_id
)
SELECT d.doc_id,
       ROUND(COALESCE(agg.dup_f, 0.0), 6) AS dup_2gram_frac,
       ROUND(COALESCE(agg.top_f, 0.0), 6) AS top_2gram_frac
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
"""


def q_unigram_logprob_docs(sf_dir: str):
    """KenLM-style unigram LM scoring (smoothed corpus unigram model,
    per-doc total and mean log-probability) — the cheap fluency signal for
    corpus filtering. One vocab groupby + broadcast log-prob table; the
    per-doc sums run in-batch with no doc-keyed shuffle."""
    from ballet_ray.stages.text import unigram_logprob_scores

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return unigram_logprob_scores(ds, text_col="text", id_col="doc_id", alpha=0.5)


SQL_UNIGRAM_LOGPROB_DOCS = """
WITH words AS (
    SELECT doc_id, w FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
), tot AS (SELECT COUNT(*) AS total, COUNT(DISTINCT w) AS vocab FROM words),
cnts AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
lp AS (
    SELECT w, ln((c + 0.5) / (tot.total + 0.5 * tot.vocab)) AS logp
    FROM cnts CROSS JOIN tot
)
SELECT words.doc_id,
       ROUND(SUM(lp.logp), 4) AS logprob,
       ROUND(SUM(lp.logp) / COUNT(*), 4) AS mean_logprob
FROM words JOIN lp USING (w)
GROUP BY words.doc_id
"""


def q_word_repetition_docs(sf_dir: str):
    """Gopher-style within-document repetition filters (duplicate-word and
    top-word fractions) — the standard corpus-quality signals for dropping
    boilerplate/spam before training. One vectorized map_batches pass."""
    from ballet_ray.stages.text import WordRepetition

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pipe = FeatureEngineeringPipeline([Feature("text", WordRepetition())])
    out = pipe.fit_transform(ds).select_columns(["doc_id", "dup_word_frac", "top_word_frac"])
    return _round_cols(out, {"dup_word_frac": 6, "top_word_frac": 6})


SQL_WORD_REPETITION_DOCS = """
WITH counts AS (
    SELECT doc_id, w, COUNT(*) AS c
    FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
    GROUP BY doc_id, w
)
SELECT doc_id,
       ROUND(1.0 - COUNT(*) * 1.0 / SUM(c), 6) AS dup_word_frac,
       ROUND(MAX(c) * 1.0 / SUM(c), 6) AS top_word_frac
FROM counts GROUP BY doc_id
"""


SQL_QUALITY_DOCS = """
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS words,
       ROUND(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
             * 1.0 / len(regexp_extract_all(text, '[A-Za-z0-9]+')), 4) AS mean_wlen,
       ROUND(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
             * 1.0 / length(text), 4) AS alpha_frac,
       ROUND(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
             * 1.0 / length(text)
             * LEAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')), 256) / 256.0, 6) AS quality
FROM documents
"""


def q_exact_dedup_docs(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = exact_dedup(ds, "text", "doc_id")
    return out.select_columns(["doc_id"])


SQL_EXACT_DEDUP_DOCS = """
SELECT doc_id FROM documents
QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
"""


def q_exact_dedup_best_events(sf_dir: str):
    """Quality-aware exact dedup: one event per user_id, keeping the
    HIGHEST-value copy (min event_id tiebreak, NULL values never beat a
    scored copy) — the keep-the-best-copy retention real curation
    pipelines use (keep longest / highest-scoring duplicate), exercised
    through exact_dedup(keep_col=...)."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    out = exact_dedup(ds, "user_id", "event_id", keep_col="value", keep="max")
    return out.select_columns(["event_id", "user_id"])


SQL_EXACT_DEDUP_BEST_EVENTS = """
SELECT event_id, user_id FROM events
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY value DESC NULLS LAST, event_id
) = 1
"""


def q_distinct_lang_counts(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
    return ds.groupby("lang").count().map_batches(
        lambda t: t.rename_columns(["lang", "n_docs"]), batch_format="pyarrow"
    )


SQL_DISTINCT_LANG_COUNTS = """
SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
"""


def q_knn_embeddings(sf_dir: str):
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = qdf[qdf["vec_id"] < 2].sort_values("vec_id")
    q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = knn_brute(emb, q, embedding_col="embedding", id_col="vec_id", k=5)
    return _cast_cols(out.select_columns(["query_idx", "vec_id"]), {"query_idx": pa.int64()})


SQL_KNN_EMBEDDINGS = """
WITH q AS (SELECT vec_id AS query_idx, embedding AS qe FROM embeddings WHERE vec_id < 2)
SELECT query_idx, vec_id FROM (
  SELECT q.query_idx, e.vec_id,
         list_cosine_similarity(e.embedding, q.qe) AS score
  FROM embeddings e CROSS JOIN q
) QUALIFY ROW_NUMBER() OVER (PARTITION BY query_idx ORDER BY score DESC, vec_id) <= 5
"""


def q_ivf_knn_embeddings(sf_dir: str):
    """IVF-bucketed ANN (coarse k-means cells + probe-limited exact scan)
    — the scale path beside LSH. Full probing (nprobe = K) is exhaustive
    and exactly equals brute force, which makes this correctness mode
    DuckDB-oracle-able; the pytest covers partial-probe recall. At corpus
    scale nprobe/K bounds the fraction of vectors each query touches."""
    from ballet_ray.stages.similarity import ivf_fit_centroids, ivf_knn

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = qdf[qdf["vec_id"] < 2].sort_values("vec_id")
    q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    cents = ivf_fit_centroids(emb, embedding_col="embedding", n_centroids=16,
                              sample_size=256, iters=3)
    out = ivf_knn(emb, q, cents, embedding_col="embedding", id_col="vec_id",
                  k=5, nprobe=len(cents))
    return _cast_cols(out.select_columns(["query_idx", "vec_id"]), {"query_idx": pa.int64()})


SQL_IVF_KNN_EMBEDDINGS = SQL_KNN_EMBEDDINGS


def q_cumcount_events(sf_dir: str):
    from ballet_ray.stages.windows import CumCount

    ds = _events(sf_dir)
    out = apply_keyed(
        ds,
        [(CumCount(key="user_id", order_by=["ts", "event_id"]), [], ["cum_count"])],
        "user_id",
        ["ts", "event_id"],
    ).select_columns(["event_id", "user_id", "cum_count"])
    return out


SQL_CUMCOUNT_EVENTS = """
SELECT event_id, user_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS BIGINT) AS cum_count
FROM events
"""


def q_rolling_time_events(sf_dir: str):
    from ballet_ray.stages.windows import RollingMeanTime

    ds = _events(sf_dir)
    out = apply_keyed(
        ds,
        [(RollingMeanTime(3600, ts_col="ts", key="user_id"), ["value"], ["value_rtmean"])],
        "user_id",
        ["ts"],
    ).select_columns(["event_id", "user_id", "value_rtmean"])
    return _round_cols(_nan_to_null(out, ["value_rtmean"]), {"value_rtmean": 4})


SQL_ROLLING_TIME_EVENTS = """
SELECT event_id, user_id,
       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 4) AS value_rtmean
FROM events
"""


def q_backfill_grid(sf_dir: str):
    """Backfill: latest event value per user at three fixed timestamps —
    the north rule's entity×timestamp grid materialization."""
    from ballet_ray.stages.asof import backfill, make_backfill_grid

    from ballet_ray.functions.reduce import distinct_keys, grouped_reduce

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    # distributed grid: distinct users stay a Dataset, stamps broadcast
    users = distinct_keys(ev, "user_id")
    stamps = pd.to_datetime(["2024-01-10", "2024-02-01", "2024-03-01"]).values.astype("datetime64[us]")
    grid = make_backfill_grid(users, stamps, key="user_id", ts_col="ts")
    dedup = grouped_reduce(ev, ["user_id", "ts"], {"value": "max"}, pre_combine=True)
    out = backfill(grid, dedup, on="ts", by="user_id", feature_cols=["value"])
    return out.select_columns(["user_id", "ts", "value"])


SQL_BACKFILL_GRID = """
WITH users AS (SELECT DISTINCT user_id FROM events),
stamps AS (
  SELECT * FROM (VALUES (TIMESTAMP '2024-01-10'), (TIMESTAMP '2024-02-01'),
                        (TIMESTAMP '2024-03-01')) s(ts)
),
grid AS (SELECT user_id, ts FROM users CROSS JOIN stamps),
dedup AS (SELECT user_id, ts, MAX(value) AS value FROM events GROUP BY user_id, ts)
SELECT g.user_id, g.ts, d.value
FROM grid g ASOF LEFT JOIN dedup d ON g.user_id = d.user_id AND g.ts >= d.ts
"""


def q_topk_per_group(sf_dir: str):
    """Top-2 orders by price per priority (grouped top-k)."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])

    def top2(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(2)

    return ds.groupby("o_orderpriority").map_groups(top2, batch_format="pandas")


SQL_TOPK_PER_GROUP = """
SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey) <= 2
"""


def q_semi_join_lineitems(sf_dir: str):
    """Lineitems of the top-10 orders by price: broadcast semi join."""
    from ballet_ray.stages.joins import semi_join_filter

    top = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(10)
        .to_pandas()["o_orderkey"]
        .to_numpy()
    )
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber", "l_quantity"])
    return semi_join_filter(li, top, key="l_orderkey")


SQL_SEMI_JOIN_LINEITEMS = """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
)
"""


def q_distinct_users_per_type(sf_dir: str):
    """COUNT(DISTINCT user_id) per event_type — two-level pre-aggregation
    (distinct pairs first, then count) instead of shipping raw rows."""
    from ballet_ray.functions.reduce import distinct_keys

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    pairs = distinct_keys(ds, ["event_type", "user_id"])
    out = pairs.groupby("event_type").count()
    return out.map_batches(
        lambda t: t.rename_columns(["event_type", "n_users"]), batch_format="pyarrow"
    )


SQL_DISTINCT_USERS_PER_TYPE = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY event_type
"""


def q_grouped_minmax_broadcast(sf_dir: str):
    """Per-user min/max joined back to every row via broadcast — the
    computed-small-side broadcast join pattern."""
    from ballet_ray.functions.reduce import grouped_reduce

    ds = _events(sf_dir)
    stats = grouped_reduce(
        ds.map_batches(
            lambda t: t.append_column("user_min", t.column("value")).append_column(
                "user_max", t.column("value")
            ),
            batch_format="pyarrow",
        ),
        "user_id",
        {"user_min": "min", "user_max": "max"},
        pre_combine=True,
    )
    out = broadcast_join(ds, stats, key="user_id", value_cols=["user_min", "user_max"])
    return out.select_columns(["event_id", "user_id", "user_min", "user_max"])


SQL_GROUPED_MINMAX_BROADCAST = """
SELECT event_id, user_id,
       MIN(value) OVER (PARTITION BY user_id) AS user_min,
       MAX(value) OVER (PARTITION BY user_id) AS user_max
FROM events
"""


# -- rows-only checks (no SQL equivalent) -----------------------------------


def q_minhash_dedup_docs(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_lsh_pairs(ds, est_threshold=0.5, concurrency=None)


def q_simhash_docs(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_pairs(ds, max_hamming=3, concurrency=2)


def q_langid_docs(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=2).select_columns(
        ["doc_id", "pred_lang", "stop_frac"]
    )


def _langid_sql() -> str:
    """The stopword scorer expressed in SQL: per-doc token list → hits per
    language → argmax (ties broken by table order, 'und' when 0 hits);
    stop_frac = best_hits / max(1, n_tokens). Both sides compute the same
    IEEE double division, so no rounding is needed."""
    from ballet_ray.stages.text import _STOPWORDS

    rows = ", ".join(
        f"('{lang}', '{w}')" for lang in _STOPWORDS for w in sorted(_STOPWORDS[lang])
    )
    tie = "CASE lang " + " ".join(
        f"WHEN '{lang}' THEN {i}" for i, lang in enumerate(_STOPWORDS)
    ) + " END"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
counts AS (SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id),
sw(lang, tok) AS (VALUES {rows}),
hits AS (
  SELECT t.doc_id, s.lang, COUNT(*) AS h
  FROM toks t JOIN sw s ON t.tok = s.tok
  GROUP BY t.doc_id, s.lang
),
best AS (
  SELECT doc_id, lang, h FROM hits
  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h DESC, {tie}) = 1
)
SELECT d.doc_id,
       COALESCE(b.lang, 'und') AS pred_lang,
       COALESCE(b.h, 0) * 1.0 / GREATEST(1, COALESCE(c.n_tok, 0)) AS stop_frac
FROM documents d
LEFT JOIN counts c USING (doc_id)
LEFT JOIN best b USING (doc_id)
"""


def q_embedding_near_dups(sf_dir: str):
    """Embedding near-dedup over the table unioned with an exact-duplicate
    clone (vec_id + 100000): the synthetic embeddings have no natural
    near-pairs (max off-diagonal cosine ~0.6), so the planted duplicates
    make the check meaningful — identical vectors always share an LSH
    bucket, so recall is exactly 1 and the result is SQL-oracle-able."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def clone(t: pa.Table) -> pa.Table:
        ids = pc.add(t.column("vec_id"), pa.scalar(100000))
        return pa.table({"vec_id": ids, "embedding": t.column("embedding")})

    both = emb.union(emb.map_batches(clone, batch_format="pyarrow"))
    pairs = embedding_near_dup_pairs(
        both, embedding_col="embedding", id_col="vec_id", dim=64, threshold=0.99
    )
    return _round_cols(pairs.select_columns(["id_a", "id_b", "cosine"]), {"cosine": 4})


SQL_EMBEDDING_NEAR_DUPS = """
SELECT vec_id AS id_a, vec_id + 100000 AS id_b, 1.0 AS cosine FROM embeddings
"""


def _render_embedding_images(sf_dir: str, brightness: int, id_offset: int):
    """Deterministic PNG image table derived from the embeddings table:
    each 64-dim vector min-max-scales into [30, 220] grayscale (headroom
    so brightness shifts never clip), reshapes 8×8, upsamples ×4 and
    encodes through the stdlib-zlib PNG codec — real binary payloads with
    no external data or image libraries."""
    from ballet_ray.stages.codecs import encode_png

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def render(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id")
        if id_offset:
            ids = pc.add(ids, pa.scalar(id_offset))
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        e = flat.reshape(len(t), 64)
        lo, hi = e.min(axis=1, keepdims=True), e.max(axis=1, keepdims=True)
        # quantize FIRST, shift after: floor(x + b) can differ from
        # floor(x) + b by one ulp-rounding step, which would leave planted
        # clones at Hamming 1 instead of the oracle's exact 0
        px = ((e - lo) / np.maximum(hi - lo, 1e-9) * 190 + 30).astype(np.uint8)
        px = px + np.uint8(brightness)
        payloads = [
            encode_png(
                np.repeat(np.repeat(p.reshape(8, 8), 4, axis=0), 4, axis=1)[..., None]
                .repeat(3, axis=2)
            )
            for p in px
        ]
        return pa.table({"vec_id": ids, "payload": pa.array(payloads, type=pa.binary())})

    return emb.map_batches(render, batch_format="pyarrow")


def q_image_near_dup_docs(sf_dir: str):
    """Image near-dedup (decode → perceptual dhash → banded Hamming
    pairs): the rendered corpus unioned with a +10-brightness clone of
    every image (vec_id + 100000). dhash compares ADJACENT area-mean cells,
    so a non-clipping constant brightness shift preserves every comparison
    exactly — each planted pair sits at Hamming distance 0, while distinct
    embeddings render to effectively random 56-bit-plus patterns whose
    pairwise distances never reach max_hamming. Recall for the planted
    pairs is therefore exact and the result SQL-oracle-able."""
    from ballet_ray.stages.image_hash import image_near_dup_pairs

    base = _render_embedding_images(sf_dir, 0, 0)
    clones = _render_embedding_images(sf_dir, 10, 100000)
    pairs = image_near_dup_pairs(
        base.union(clones), id_col="vec_id", media_col="payload", max_hamming=3
    )
    return pairs.select_columns(["id_a", "id_b", "hamming"])


SQL_IMAGE_NEAR_DUPS = """
SELECT vec_id AS id_a, vec_id + 100000 AS id_b, CAST(0 AS BIGINT) AS hamming
FROM embeddings
"""


def q_minhash_cluster_dedup_docs(sf_dir: str):
    """End-to-end near-dedup: LSH pairs → connected components → keep one
    representative per cluster (rows-only: LSH-dependent)."""
    from ballet_ray.stages.dedup import dedup_by_minhash

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dedup_by_minhash(ds, est_threshold=0.6, concurrency=None).select_columns(["doc_id"])


def q_streaming_session_events(sf_dir: str):
    """Incremental per-entity windowing via per-bucket streaming consumers
    (state carried across chunks); oracled against the equivalent batch
    window SQL — (user_id, ts) is unique in events, so ordering is
    deterministic."""
    from ballet_ray.stages.streaming import streaming_window_features

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    out = streaming_window_features(
        ds, key="user_id", ts_col="ts", value_col="value", gap_seconds=1800, num_buckets=4
    )
    return _nan_to_null(out, ["value_lag1"])


SQL_STREAMING_SESSION_EVENTS = """
SELECT user_id, ts,
       CAST(SUM(CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS BIGINT) AS cum_count,
       LAG(value) OVER (PARTITION BY user_id ORDER BY ts) AS value_lag1
FROM (
  SELECT user_id, ts, value,
         COALESCE(date_diff('second', LAG(ts) OVER (PARTITION BY user_id ORDER BY ts), ts), 0) AS gap_s
  FROM events
)
"""


def q_approx_distinct_users(sf_dir: str):
    """KMV-sketch approximate COUNT(DISTINCT user_id) per event_type.

    A KMV sketch is provably EXACT while the merged sketch holds fewer than
    k distinct hashes, so at every shipped test scale (≤1,500 distinct
    users per type at sf0.1 vs k=2048) the oracle is plain COUNT(DISTINCT);
    above capacity it degrades to the documented ±1/√(k-2) estimate
    (pytest covers the error bound at 5k distinct with a small k)."""
    from ballet_ray.stages.sketches import approx_distinct_per_group

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    return approx_distinct_per_group(ds, "user_id", "event_type", k=2048)


SQL_APPROX_DISTINCT_USERS = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS approx_nd
FROM events GROUP BY event_type
"""


def q_approx_quantiles_orders(sf_dir: str):
    """KLL-sketch per-group quantiles of o_totalprice by o_orderpriority.

    The KLL sketch is the exact value multiset until a level exceeds its
    capacity, so at correctness scale (≤30k rows per priority at sf0.1 vs
    k=65536) the oracle is plain quantile_disc; above capacity it degrades
    to the documented ~1/k rank error (pytest covers 100k values at k=512).
    At 100 TB this is one streaming pass whose shuffle carries one ≤0.5 MB
    sketch per block, tree-merged — the distributed percentile primitive
    for corpus quality-score thresholding."""
    from ballet_ray.stages.sketches import approx_quantiles_per_group

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    return approx_quantiles_per_group(
        ds, "o_totalprice", "o_orderpriority", [0.25, 0.5, 0.75, 0.9, 0.99], k=65536
    )


SQL_APPROX_QUANTILES_ORDERS = """
SELECT o_orderpriority, 0.25 AS q, quantile_disc(o_totalprice, 0.25) AS val
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT o_orderpriority, 0.5, quantile_disc(o_totalprice, 0.5) FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT o_orderpriority, 0.75, quantile_disc(o_totalprice, 0.75) FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT o_orderpriority, 0.9, quantile_disc(o_totalprice, 0.9) FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT o_orderpriority, 0.99, quantile_disc(o_totalprice, 0.99) FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# extended encoder families (encoders_ext / windows.Difference)
# ---------------------------------------------------------------------------


def q_binary_encode_lang(sf_dir: str):
    from ballet_ray.stages.encoders_ext import BinaryEncoder

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    pipe = FeatureEngineeringPipeline([Feature("lang", BinaryEncoder())])
    return pipe.fit_transform(ds).select_columns(["doc_id", "lang_b0", "lang_b1", "lang_b2"])


SQL_BINARY_ENCODE_LANG = """
WITH codes AS (
  SELECT doc_id, DENSE_RANK() OVER (ORDER BY lang) AS code FROM documents
)
SELECT doc_id,
       CAST(floor(code / 4) % 2 AS BIGINT) AS lang_b0,
       CAST(floor(code / 2) % 2 AS BIGINT) AS lang_b1,
       CAST(code % 2 AS BIGINT)            AS lang_b2
FROM codes
"""


def q_woe_encode_orders(sf_dir: str):
    from ballet_ray.stages.encoders_ext import WOEEncoder

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])

    def label(t: pa.Table) -> pa.Table:
        return t.append_column(
            "is_big", pc.cast(pc.greater(t.column("o_totalprice"), 150000.0), pa.float64())
        )

    ds = ds.map_batches(label, batch_format="pyarrow")
    pipe = FeatureEngineeringPipeline(
        [Feature("o_orderpriority", WOEEncoder(target_col="is_big"), output="pri_woe")]
    )
    out = pipe.fit_transform(ds).select_columns(["o_orderkey", "pri_woe"])
    return _round_cols(out, {"pri_woe": 6})


SQL_WOE_ENCODE_ORDERS = """
WITH lab AS (
  SELECT o_orderkey, o_orderpriority,
         CASE WHEN o_totalprice > 150000 THEN 1.0 ELSE 0.0 END AS y
  FROM orders
),
tot AS (SELECT SUM(y) AS pos_tot, COUNT(*) AS n_tot FROM lab),
g AS (SELECT o_orderpriority, SUM(y) AS pos_c, COUNT(*) AS n_c FROM lab GROUP BY 1)
SELECT l.o_orderkey,
       ROUND(LN(((g.pos_c + 0.5) / (t.pos_tot + 1.0))
              / ((g.n_c - g.pos_c + 0.5) / (t.n_tot - t.pos_tot + 1.0))), 6) AS pri_woe
FROM lab l JOIN g USING (o_orderpriority) CROSS JOIN tot t
"""


def q_mestimate_encode_priority(sf_dir: str):
    from ballet_ray.stages.encoders_ext import MEstimateEncoder

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    pipe = FeatureEngineeringPipeline(
        [Feature("o_orderpriority", MEstimateEncoder(target_col="o_totalprice", m=2.0), output="pri_mest")]
    )
    out = pipe.fit_transform(ds).select_columns(["o_orderkey", "pri_mest"])
    return _round_cols(out, {"pri_mest": 4})


SQL_MESTIMATE_ENCODE_PRIORITY = """
WITH gstat AS (SELECT AVG(o_totalprice) AS gm FROM orders),
g AS (SELECT o_orderpriority, SUM(o_totalprice) AS s, COUNT(*) AS n FROM orders GROUP BY 1)
SELECT o.o_orderkey,
       ROUND((g.s + 2.0 * gstat.gm) / (g.n + 2.0), 4) AS pri_mest
FROM orders o JOIN g USING (o_orderpriority) CROSS JOIN gstat
"""


def q_loo_encode_priority(sf_dir: str):
    from ballet_ray.stages.encoders_ext import LeaveOneOutEncoder

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    pipe = FeatureEngineeringPipeline(
        [Feature("o_orderpriority", LeaveOneOutEncoder(target_col="o_totalprice"), output="pri_loo")]
    )
    out = pipe.fit_transform(ds).select_columns(["o_orderkey", "pri_loo"])
    return _round_cols(out, {"pri_loo": 4})


SQL_LOO_ENCODE_PRIORITY = """
SELECT o_orderkey,
       ROUND((SUM(o_totalprice) OVER w - o_totalprice)
             / (COUNT(*) OVER w - 1), 4) AS pri_loo
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority)
"""


def q_jamesstein_encode_priority(sf_dir: str):
    from ballet_ray.stages.encoders_ext import JamesSteinEncoder

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    pipe = FeatureEngineeringPipeline(
        [Feature("o_orderpriority", JamesSteinEncoder(target_col="o_totalprice"), output="pri_js")]
    )
    out = pipe.fit_transform(ds).select_columns(["o_orderkey", "pri_js"])
    return _round_cols(out, {"pri_js": 4})


SQL_JAMESSTEIN_ENCODE_PRIORITY = """
WITH gstat AS (SELECT AVG(o_totalprice) AS gm, VAR_POP(o_totalprice) AS gv FROM orders),
g AS (
  SELECT o_orderpriority, AVG(o_totalprice) AS cm,
         VAR_POP(o_totalprice) AS cv, COUNT(*) AS n
  FROM orders GROUP BY 1
),
b AS (
  SELECT o_orderpriority, cm,
         LEAST(GREATEST((cv / n) / ((cv / n) + gv), 0.0), 1.0) AS shrink
  FROM g CROSS JOIN gstat
)
SELECT o.o_orderkey,
       ROUND((1.0 - b.shrink) * b.cm + b.shrink * gstat.gm, 4) AS pri_js
FROM orders o JOIN b USING (o_orderpriority) CROSS JOIN gstat
"""


def q_normalize_lineitem(sf_dir: str):
    from ballet_ray.stages.encoders_ext import Normalizer

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]
    )
    pipe = FeatureEngineeringPipeline(
        [Feature(["l_quantity", "l_extendedprice"], Normalizer("l2"))]
    )
    out = pipe.fit_transform(ds).select_columns(
        ["l_orderkey", "l_linenumber", "l_quantity_norm", "l_extendedprice_norm"]
    )
    return _round_cols(out, {"l_quantity_norm": 6, "l_extendedprice_norm": 6})


SQL_NORMALIZE_LINEITEM = """
SELECT l_orderkey, l_linenumber,
       ROUND(l_quantity      / sqrt(l_quantity * l_quantity + l_extendedprice * l_extendedprice), 6) AS l_quantity_norm,
       ROUND(l_extendedprice / sqrt(l_quantity * l_quantity + l_extendedprice * l_extendedprice), 6) AS l_extendedprice_norm
FROM lineitem
"""


def q_poly_lineitem(sf_dir: str):
    from ballet_ray.stages.encoders_ext import PolynomialFeatures

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber", "l_quantity", "l_discount"]
    )
    pipe = FeatureEngineeringPipeline(
        [Feature(["l_quantity", "l_discount"], PolynomialFeatures(include_inputs=False))]
    )
    out = pipe.fit_transform(ds).select_columns(
        ["l_orderkey", "l_linenumber", "l_quantity_x_l_quantity", "l_quantity_x_l_discount", "l_discount_x_l_discount"]
    )
    return _round_cols(
        out,
        {"l_quantity_x_l_quantity": 6, "l_quantity_x_l_discount": 6, "l_discount_x_l_discount": 6},
    )


SQL_POLY_LINEITEM = """
SELECT l_orderkey, l_linenumber,
       ROUND(l_quantity * l_quantity, 6) AS l_quantity_x_l_quantity,
       ROUND(l_quantity * l_discount, 6) AS l_quantity_x_l_discount,
       ROUND(l_discount * l_discount, 6) AS l_discount_x_l_discount
FROM lineitem
"""


def q_fourier_events(sf_dir: str):
    from ballet_ray.stages.encoders_ext import FourierFeatures

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])
    pipe = FeatureEngineeringPipeline(
        [Feature("ts", FourierFeatures(86400.0, num_terms=2))]
    )
    out = pipe.fit_transform(ds).select_columns(
        ["event_id", "ts_sin1", "ts_cos1", "ts_sin2", "ts_cos2"]
    )
    return _round_cols(out, {"ts_sin1": 6, "ts_cos1": 6, "ts_sin2": 6, "ts_cos2": 6})


SQL_FOURIER_EVENTS = """
SELECT event_id,
       ROUND(sin(2 * pi() * epoch(ts) / 86400.0), 6) AS ts_sin1,
       ROUND(cos(2 * pi() * epoch(ts) / 86400.0), 6) AS ts_cos1,
       ROUND(sin(4 * pi() * epoch(ts) / 86400.0), 6) AS ts_sin2,
       ROUND(cos(4 * pi() * epoch(ts) / 86400.0), 6) AS ts_cos2
FROM events
"""


def q_diff_events(sf_dir: str):
    from ballet_ray.stages.windows import Difference

    ds = _events(sf_dir)
    out = apply_keyed(
        ds,
        [(Difference(1, key="user_id", order_by=["ts", "event_id"]), ["value"], ["value_diff1"])],
        "user_id",
        ["ts", "event_id"],
    ).select_columns(["event_id", "user_id", "value_diff1"])
    return _nan_to_null(out, ["value_diff1"])


SQL_DIFF_EVENTS = """
SELECT event_id, user_id,
       value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS value_diff1
FROM events
"""


# ---------------------------------------------------------------------------
# cleaning / contrast family
# ---------------------------------------------------------------------------


def q_rare_label_docs(sf_dir: str):
    from ballet_ray.stages.cleaning import RareLabelEncoder

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    pipe = FeatureEngineeringPipeline([Feature("lang", RareLabelEncoder(tol=0.2), output="lang_rare")])
    return pipe.fit_transform(ds).select_columns(["doc_id", "lang_rare"])


SQL_RARE_LABEL_DOCS = """
WITH freq AS (
  SELECT lang, COUNT(*) * 1.0 / (SELECT COUNT(*) FROM documents) AS f
  FROM documents GROUP BY lang
)
SELECT doc_id, CASE WHEN f >= 0.2 THEN lang ELSE 'Rare' END AS lang_rare
FROM documents JOIN freq USING (lang)
"""


def q_outlier_trim_orders(sf_dir: str):
    from ballet_ray.stages.cleaning import OutlierTrimmer, apply_filter

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    return apply_filter(ds, OutlierTrimmer(0.05, 0.95), ["o_totalprice"])


SQL_OUTLIER_TRIM_ORDERS = """
WITH b AS (
  SELECT quantile_cont(o_totalprice, 0.05) AS lo, quantile_cont(o_totalprice, 0.95) AS hi
  FROM orders
)
SELECT o_orderkey, o_totalprice FROM orders, b
WHERE o_totalprice >= lo AND o_totalprice <= hi
"""


def q_math_combo_lineitem(sf_dir: str):
    from ballet_ray.stages.cleaning import MathematicalCombination

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber", "l_quantity", "l_discount"]
    )
    pipe = FeatureEngineeringPipeline(
        [Feature(["l_quantity", "l_discount"], MathematicalCombination(["sum", "mean"]))]
    )
    out = pipe.fit_transform(ds).select_columns(["l_orderkey", "l_linenumber", "combo_sum", "combo_mean"])
    return _round_cols(out, {"combo_sum": 6, "combo_mean": 6})


SQL_MATH_COMBO_LINEITEM = """
SELECT l_orderkey, l_linenumber,
       ROUND(l_quantity + l_discount, 6)         AS combo_sum,
       ROUND((l_quantity + l_discount) / 2.0, 6) AS combo_mean
FROM lineitem
"""


def q_sum_encode_lang(sf_dir: str):
    from ballet_ray.stages.encoders_ext import SumEncoder

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    pipe = FeatureEngineeringPipeline([Feature("lang", SumEncoder())])
    return pipe.fit_transform(ds).select_columns(
        ["doc_id", "lang_sum0", "lang_sum1", "lang_sum2", "lang_sum3"]
    )


SQL_SUM_ENCODE_LANG = """
WITH codes AS (SELECT doc_id, DENSE_RANK() OVER (ORDER BY lang) AS r FROM documents)
SELECT doc_id,
       CASE WHEN r = 1 THEN 1.0 WHEN r = 5 THEN -1.0 ELSE 0.0 END AS lang_sum0,
       CASE WHEN r = 2 THEN 1.0 WHEN r = 5 THEN -1.0 ELSE 0.0 END AS lang_sum1,
       CASE WHEN r = 3 THEN 1.0 WHEN r = 5 THEN -1.0 ELSE 0.0 END AS lang_sum2,
       CASE WHEN r = 4 THEN 1.0 WHEN r = 5 THEN -1.0 ELSE 0.0 END AS lang_sum3
FROM codes
"""




def q_catboost_encode_priority(sf_dir: str):
    """Ordered (leakage-free) target encoding: each row's encoding uses
    only EARLIER rows of its category in o_orderkey order."""
    from ballet_ray.stages.encoders_ext import CatBoostEncoder

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    enc = CatBoostEncoder("o_orderpriority", "o_orderkey", a=1.0)
    pipe = FeatureEngineeringPipeline([Feature("o_totalprice", enc.keyed(), output="pri_cb")])
    out = pipe.fit_transform(ds).select_columns(["o_orderkey", "pri_cb"])
    return _round_cols(out, {"pri_cb": 4})


SQL_CATBOOST_ENCODE_PRIORITY = """
SELECT o_orderkey,
       ROUND((COALESCE(SUM(o_totalprice) OVER w, 0) + (SELECT AVG(o_totalprice) FROM orders))
             / (COALESCE(COUNT(o_totalprice) OVER w, 0) + 1.0), 4) AS pri_cb
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
"""




def q_cumsum_events(sf_dir: str):
    from ballet_ray.stages.windows import CumSum

    ds = _events(sf_dir)
    out = apply_keyed(
        ds,
        [(CumSum(key="user_id", order_by=["ts", "event_id"]), ["value"], ["value_cumsum"])],
        "user_id",
        ["ts", "event_id"],
    ).select_columns(["event_id", "user_id", "value_cumsum"])
    return _round_cols(out, {"value_cumsum": 4})


SQL_CUMSUM_EVENTS = """
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING), 4) AS value_cumsum
FROM events
"""


# ---------------------------------------------------------------------------
# per-entity aggregation generators (tsfresh / featuretools minimal subsets)
# ---------------------------------------------------------------------------


def q_ts_features_events(sf_dir: str):
    from ballet_ray.stages.aggregates import extract_ts_features

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "value"])
    out = extract_ts_features(ds, key="user_id", order_by=["ts", "event_id"], value_col="value")
    return _round_cols(
        out,
        {"value_mean": 4, "value_std": 4, "value_median": 4,
         "value_abs_energy": 4, "value_mean_abs_change": 4,
         "value_min": 4, "value_max": 4},
    )


SQL_TS_FEATURES_EVENTS = """
WITH chg AS (
  SELECT user_id,
         ABS(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS d
  FROM events
),
mac AS (SELECT user_id, AVG(d) AS mean_abs_change FROM chg WHERE d IS NOT NULL GROUP BY user_id),
base AS (
  SELECT user_id,
         AVG(value) AS mean_v, STDDEV_POP(value) AS std_v,
         MIN(value) AS min_v, MAX(value) AS max_v,
         MEDIAN(value) AS med_v, SUM(value * value) AS abs_energy,
         COUNT(value) AS n_v
  FROM events GROUP BY user_id
),
above AS (
  SELECT e.user_id, CAST(SUM(CASE WHEN e.value > b.mean_v THEN 1 ELSE 0 END) AS BIGINT) AS n_above
  FROM events e JOIN base b USING (user_id) GROUP BY e.user_id
)
SELECT b.user_id,
       ROUND(b.mean_v, 4)        AS value_mean,
       ROUND(b.std_v, 4)         AS value_std,
       ROUND(b.min_v, 4)         AS value_min,
       ROUND(b.max_v, 4)         AS value_max,
       ROUND(b.med_v, 4)         AS value_median,
       ROUND(b.abs_energy, 4)    AS value_abs_energy,
       ROUND(m.mean_abs_change, 4) AS value_mean_abs_change,
       a.n_above                 AS value_count_above_mean,
       CAST(b.n_v AS BIGINT)     AS value_n
FROM base b JOIN mac m USING (user_id) JOIN above a USING (user_id)
"""


def q_dfs_customer_orders(sf_dir: str):
    from ballet_ray.stages.aggregates import dfs_aggregate_features

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    out = dfs_aggregate_features(
        cust, orders, parent_key="c_custkey", child_key="o_custkey",
        value_cols=["o_totalprice"], aggs=("count", "sum", "mean"), fill_missing=0.0,
    ).select_columns(["c_custkey", "child_count", "o_totalprice_sum", "o_totalprice_mean"])
    return _round_cols(
        _cast_cols(out, {"child_count": pa.float64()}),
        {"o_totalprice_sum": 2, "o_totalprice_mean": 2},
    )


SQL_DFS_CUSTOMER_ORDERS = """
WITH g AS (
  SELECT o_custkey, COUNT(*) AS cnt, SUM(o_totalprice) AS s, AVG(o_totalprice) AS m
  FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey,
       CAST(COALESCE(g.cnt, 0) AS DOUBLE) AS child_count,
       ROUND(COALESCE(g.s, 0.0), 2)       AS o_totalprice_sum,
       ROUND(COALESCE(g.m, 0.0), 2)       AS o_totalprice_mean
FROM customer c LEFT JOIN g ON c.c_custkey = g.o_custkey
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def q_dfs_two_hop_customer(sf_dir: str):
    """Depth-2 DFS: lineitems roll up to orders, then order-level features
    roll up to customers (featuretools recursive-DFS parity)."""
    from ballet_ray.stages.aggregates import dfs_two_hop

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    out = dfs_two_hop(
        cust, orders, li,
        gp_key="c_custkey", parent_gp_key="o_custkey",
        parent_key="o_orderkey", child_parent_key="l_orderkey",
        value_cols=["l_quantity"], child_aggs=("count", "sum"),
        parent_aggs=("count", "sum", "mean"), fill_missing=0.0,
    ).select_columns(
        ["c_custkey", "child_count", "child_count_sum", "child_count_mean",
         "l_quantity_sum_sum", "l_quantity_sum_mean"]
    )
    return _round_cols(
        _cast_cols(out, {"child_count": pa.float64()}),
        {"child_count_sum": 2, "child_count_mean": 4,
         "l_quantity_sum_sum": 2, "l_quantity_sum_mean": 4},
    )


SQL_DFS_TWO_HOP_CUSTOMER = """
WITH l1g AS (
  SELECT l_orderkey, COUNT(*) AS cc, SUM(l_quantity) AS qs FROM lineitem GROUP BY 1
),
l1 AS (
  SELECT o.o_orderkey, o.o_custkey, COALESCE(g.cc, 0) AS cc, COALESCE(g.qs, 0.0) AS qs
  FROM orders o LEFT JOIN l1g g ON o.o_orderkey = g.l_orderkey
),
l2 AS (
  SELECT o_custkey, COUNT(*) AS n_orders, SUM(cc) AS cc_sum, AVG(cc) AS cc_mean,
         SUM(qs) AS qs_sum, AVG(qs) AS qs_mean
  FROM l1 GROUP BY 1
)
SELECT c.c_custkey,
       CAST(COALESCE(l2.n_orders, 0) AS DOUBLE) AS child_count,
       ROUND(COALESCE(l2.cc_sum, 0.0), 2)       AS child_count_sum,
       ROUND(COALESCE(l2.cc_mean, 0.0), 4)      AS child_count_mean,
       ROUND(COALESCE(l2.qs_sum, 0.0), 2)       AS l_quantity_sum_sum,
       ROUND(COALESCE(l2.qs_mean, 0.0), 4)      AS l_quantity_sum_mean
FROM customer c LEFT JOIN l2 ON c.c_custkey = l2.o_custkey
"""


def q_dtree_disc_orders(sf_dir: str):
    """Histogram-CART discretiser (depth 1, 64 equal-width bins): price →
    leaf mean of ln(price). The SQL oracle replays the identical split
    search with window functions."""
    from ballet_ray.stages.trees import DecisionTreeDiscretiser

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])

    def addy(t: pa.Table) -> pa.Table:
        x = t.column("o_totalprice").to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column("y", pa.array(np.log(x)))

    ds = ds.map_batches(addy, batch_format="pyarrow")
    pipe = FeatureEngineeringPipeline(
        [Feature("o_totalprice", DecisionTreeDiscretiser(target_col="y", max_depth=1, bins=64),
                 output="price_tree")]
    )
    out = pipe.fit_transform(ds).select_columns(["o_orderkey", "price_tree"])
    return _round_cols(out, {"price_tree": 4})


SQL_DTREE_DISC_ORDERS = """
WITH p AS (SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders),
d AS (
  SELECT o_orderkey, LN(o_totalprice) AS y,
         LEAST(CAST(FLOOR((o_totalprice - p.mn) / ((p.mx - p.mn) / 64.0)) AS INT), 63) AS b
  FROM orders, p
),
h AS (SELECT b, COUNT(*) AS c, SUM(y) AS s, SUM(y*y) AS ss FROM d GROUP BY b),
tot AS (SELECT SUM(c) AS C, SUM(s) AS S, SUM(ss) AS SS FROM h),
cand AS (
  SELECT b, SUM(c) OVER w AS cl, SUM(s) OVER w AS sl, SUM(ss) OVER w AS ssl
  FROM h WINDOW w AS (ORDER BY b ROWS UNBOUNDED PRECEDING)
),
scored AS (
  SELECT cand.b,
         (ssl - sl*sl/cl) + ((tot.SS - ssl) - (tot.S - sl)*(tot.S - sl)/(tot.C - cl)) AS sse,
         sl/cl AS lmean, (tot.S - sl)/(tot.C - cl) AS rmean
  FROM cand, tot WHERE cl > 0 AND cl < tot.C
),
best AS (SELECT * FROM scored ORDER BY sse ASC, b ASC LIMIT 1)
SELECT d.o_orderkey,
       ROUND(CASE WHEN d.b <= best.b THEN best.lmean ELSE best.rmean END, 4) AS price_tree
FROM d, best
"""


def q_dtree_encode_priority(sf_dir: str):
    """DecisionTree category encoder (depth 4 ≥ n_categories-1 guarantees
    greedy isolation of all 5 priorities → encoding equals the
    per-category target mean, which the oracle checks end-to-end through
    the tree machinery)."""
    from ballet_ray.stages.trees import DecisionTreeEncoder

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    )
    pipe = FeatureEngineeringPipeline(
        [Feature("o_orderpriority", DecisionTreeEncoder(target_col="o_totalprice", max_depth=4),
                 output="pri_dtree")]
    )
    out = pipe.fit_transform(ds).select_columns(["o_orderkey", "pri_dtree"])
    return _round_cols(out, {"pri_dtree": 4})


SQL_DTREE_ENCODE_PRIORITY = """
WITH g AS (SELECT o_orderpriority, AVG(o_totalprice) AS m FROM orders GROUP BY 1)
SELECT o.o_orderkey, ROUND(g.m, 4) AS pri_dtree
FROM orders o JOIN g USING (o_orderpriority)
"""


def q_glmm_encode_priority(sf_dir: str):
    """GLMM (intercept-only random effects) target encoding via the
    method-of-moments shrinkage formula the SQL oracle replicates."""
    from ballet_ray.stages.encoders_ext import GLMMEncoder

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    )
    pipe = FeatureEngineeringPipeline(
        [Feature("o_orderpriority", GLMMEncoder(target_col="o_totalprice"), output="pri_glmm")]
    )
    out = pipe.fit_transform(ds).select_columns(["o_orderkey", "pri_glmm"])
    return _round_cols(out, {"pri_glmm": 4})


SQL_GLMM_ENCODE_PRIORITY = """
WITH g AS (
  SELECT o_orderpriority AS cat, CAST(COUNT(o_totalprice) AS DOUBLE) AS n,
         AVG(o_totalprice) AS m, SUM(o_totalprice * o_totalprice) AS ss
  FROM orders GROUP BY 1
),
tot AS (
  SELECT SUM(n) AS N, CAST(COUNT(*) AS DOUBLE) AS k, SUM(n * m) / SUM(n) AS mu,
         SUM(ss - n * m * m) AS ssw, SUM(n * n) AS sn2
  FROM g
),
parms AS (
  SELECT N, k, mu,
         ssw / GREATEST(N - k, 1.0) AS sigma2,
         (N - sn2 / N) / GREATEST(k - 1.0, 1.0) AS c_n
  FROM tot
),
btw AS (SELECT SUM(g.n * (g.m - p.mu) * (g.m - p.mu)) AS ssb FROM g, parms p),
parms2 AS (
  SELECT p.*, GREATEST(0.0, (b.ssb - (p.k - 1.0) * p.sigma2) / GREATEST(p.c_n, 1e-12)) AS tau2
  FROM parms p, btw b
),
enc AS (
  SELECT g.cat, p.mu + (g.m - p.mu) * (p.tau2 / (p.tau2 + p.sigma2 / g.n)) AS e
  FROM g, parms2 p
)
SELECT o.o_orderkey, ROUND(enc.e, 4) AS pri_glmm
FROM orders o JOIN enc ON o.o_orderpriority = enc.cat
"""


def q_ts_features_full_events(sf_dir: str):
    """The full tsfresh-style catalogue (23 features) per user — moments,
    quantiles, diff stats, mean crossings, least-squares trend — every
    member skew-safe via bounded hot-entity passes."""
    from ballet_ray.stages.aggregates import _TS_FEATURES_FULL, extract_ts_features

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "value"])
    out = extract_ts_features(
        ds, key="user_id", order_by=["ts", "event_id"], value_col="value",
        features=_TS_FEATURES_FULL,
    )
    return _round_cols(
        out,
        {
            "value_mean": 4, "value_std": 4, "value_variance": 4, "value_min": 4,
            "value_max": 4, "value_median": 4, "value_quantile_25": 4,
            "value_quantile_75": 4, "value_skewness": 4, "value_kurtosis": 4,
            "value_root_mean_square": 4, "value_sum": 2, "value_abs_energy": 2,
            "value_mean_abs_change": 4, "value_absolute_sum_of_changes": 2,
            "value_mean_change": 6, "value_cid_ce": 2, "value_ratio_beyond_2sigma": 6,
            "value_linear_trend_slope": 6,
        },
    )


SQL_TS_FEATURES_FULL_EVENTS = """
WITH e AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS p
  FROM events WHERE value IS NOT NULL
),
base AS (
  SELECT user_id,
         COUNT(*) AS n, SUM(value) AS sum_v, AVG(value) AS mean_v,
         STDDEV_POP(value) AS std_v, VAR_POP(value) AS var_v,
         MIN(value) AS min_v, MAX(value) AS max_v,
         QUANTILE_CONT(value, 0.5) AS med_v,
         QUANTILE_CONT(value, 0.25) AS q25_v, QUANTILE_CONT(value, 0.75) AS q75_v,
         SUM(value * value) AS abs_energy, SQRT(AVG(value * value)) AS rms_v,
         SUM(p * value) AS spx, SUM(CAST(p AS DOUBLE) * p) AS sp2,
         arg_min(value, p) AS first_v, arg_max(value, p) AS last_v
  FROM e GROUP BY user_id
),
cent AS (
  SELECT e.user_id,
         CAST(SUM(CASE WHEN e.value > b.mean_v THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
         CAST(SUM(CASE WHEN e.value < b.mean_v THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
         AVG(CASE WHEN ABS(e.value - b.mean_v) > 2 * b.std_v THEN 1.0 ELSE 0.0 END) AS beyond2,
         AVG(POWER(e.value - b.mean_v, 3)) AS m3,
         AVG(POWER(e.value - b.mean_v, 4)) AS m4
  FROM e JOIN base b USING (user_id) GROUP BY e.user_id
),
lagd AS (
  SELECT e.user_id, e.value, b.mean_v,
         LAG(e.value) OVER (PARTITION BY e.user_id ORDER BY e.p) AS lv
  FROM e JOIN base b USING (user_id)
),
diffs AS (
  SELECT user_id,
         AVG(ABS(value - lv)) AS mac,
         SUM(ABS(value - lv)) AS asoc,
         SUM(value - lv) / COUNT(*) AS mean_chg,
         SQRT(SUM((value - lv) * (value - lv))) AS cid,
         CAST(SUM(CASE WHEN (value > mean_v) <> (lv > mean_v) THEN 1 ELSE 0 END) AS BIGINT) AS xc
  FROM lagd WHERE lv IS NOT NULL GROUP BY user_id
)
SELECT b.user_id,
       ROUND(b.mean_v, 4)  AS value_mean,
       ROUND(b.std_v, 4)   AS value_std,
       ROUND(b.min_v, 4)   AS value_min,
       ROUND(b.max_v, 4)   AS value_max,
       ROUND(b.med_v, 4)   AS value_median,
       ROUND(b.abs_energy, 2) AS value_abs_energy,
       ROUND(d.mac, 4)     AS value_mean_abs_change,
       c.n_above           AS value_count_above_mean,
       CAST(b.n AS BIGINT) AS value_n,
       ROUND(b.sum_v, 2)   AS value_sum,
       ROUND(b.var_v, 4)   AS value_variance,
       ROUND(c.m3 / POWER(b.std_v, 3), 4) AS value_skewness,
       ROUND(c.m4 / POWER(b.std_v, 4) - 3.0, 4) AS value_kurtosis,
       ROUND(b.rms_v, 4)   AS value_root_mean_square,
       ROUND(b.q25_v, 4)   AS value_quantile_25,
       ROUND(b.q75_v, 4)   AS value_quantile_75,
       ROUND(d.asoc, 2)    AS value_absolute_sum_of_changes,
       -- telescoping closed form (last-first)/(n-1): the same two float64
       -- ops the engine performs, not a SUM over ~n diffs whose rounding
       -- can land the other side of the 1e-6 boundary (hit at sf0.1)
       ROUND((b.last_v - b.first_v) / (b.n - 1), 6) AS value_mean_change,
       ROUND(d.cid, 2)     AS value_cid_ce,
       c.n_below           AS value_count_below_mean,
       ROUND(c.beyond2, 6) AS value_ratio_beyond_2sigma,
       d.xc                AS value_number_crossings_mean,
       ROUND((b.spx - (b.n - 1) / 2.0 * b.sum_v)
             / (b.sp2 - b.n * POWER((b.n - 1) / 2.0, 2)), 6) AS value_linear_trend_slope
FROM base b JOIN cent c USING (user_id) JOIN diffs d USING (user_id)
"""


def q_chunk_docs(sf_dir: str):
    """Context-window chunking (HF overflow-token shape) over each doc's
    word sequence: max_len=16, stride=12 overlapping windows. Pure
    one-to-many map_batches — no shuffle; the list payload is windowed
    with one vectorized gather. Chunks are emitted as md5 of the joined
    window (list columns don't hash stably across engines)."""
    import hashlib

    from ballet_ray.stages.sequences import chunk_sequences

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def words(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"), "w": pc.split_pattern(t.column("text"), " ")})

    chunks = chunk_sequences(
        ds.map_batches(words, batch_format="pyarrow"),
        list_col="w",
        id_col="doc_id",
        max_len=16,
        stride=12,
    )

    def digest(t: pa.Table) -> pa.Table:
        joined = pc.binary_join(t.column("w"), " ")
        md5s = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in joined.to_pylist()]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "chunk_id": pc.cast(t.column("chunk_id"), pa.int64()),
                "chunk_md5": pa.array(md5s),
                "chunk_len": pc.cast(t.column("chunk_len"), pa.int64()),
            }
        )

    return chunks.map_batches(digest, batch_format="pyarrow")


SQL_CHUNK_DOCS = """
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
SELECT doc_id, UNNEST([{
        'chunk_id': (i - 1) // 12,
        'chunk_md5': md5(array_to_string(w[i:i+15], ' ')),
        'chunk_len': len(w[i:i+15])
    } FOR i IN range(1, len(w) + 1, 12)], recursive := true)
FROM ws
"""


def q_pack_docs(sf_dir: str):
    """Greedy first-fit-decreasing packing of word sequences into
    max_len=128 training examples (partition-local, zero shuffle).
    Bin membership depends on batch boundaries, so not SQL-expressible —
    rows-only here; invariants (mass preservation, capacity, coverage)
    are pytest-enforced in test_sequences.py."""
    from ballet_ray.stages.sequences import pack_sequences

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def words(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"), "w": pc.split_pattern(t.column("text"), " ")})

    packs = pack_sequences(
        ds.map_batches(words, batch_format="pyarrow"), list_col="w", id_col="doc_id", max_len=128
    )
    return packs.select_columns(["pack_id", "n_docs", "n_tok"])


def q_hash_split_docs(sf_dir: str):
    """Stable md5-keyed train/val/test assignment — reproducible under any
    repartitioning (rows decide, not blocks)."""
    from ballet_ray.stages.core import HashSplit

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    pipe = FeatureEngineeringPipeline([Feature("doc_id", HashSplit({"train": 0.8, "val": 0.1, "test": 0.1}, method="md5"))])
    return pipe.fit_transform(ds).select_columns(["doc_id", "split"])


SQL_HASH_SPLIT_DOCS = """
SELECT doc_id,
       CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
FROM (
    SELECT doc_id,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) / 4294967296.0 AS u
    FROM documents
)
"""


def q_redact_docs(sf_dir: str):
    """Regex redaction (PII-scrub shape) with RE2 kernels; the corpus is
    synthetic words, so the demonstration patterns hit real text: vowel
    runs and the article 'the'."""
    from ballet_ray.stages.text import RegexRedactor

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    red = RegexRedactor([(r"\bthe\b", "<ART>"), (r"[aeiou]+", "*")])
    pipe = FeatureEngineeringPipeline([Feature("text", red)])
    return pipe.fit_transform(ds).select_columns(["doc_id", "text_redacted", "text_n_redactions"])


SQL_REDACT_DOCS = """
WITH s1 AS (
    SELECT doc_id,
           len(regexp_extract_all(text, '\\bthe\\b')) AS h1,
           regexp_replace(text, '\\bthe\\b', '<ART>', 'g') AS t1
    FROM documents
)
SELECT doc_id,
       regexp_replace(t1, '[aeiou]+', '*', 'g') AS text_redacted,
       h1 + len(regexp_extract_all(t1, '[aeiou]+')) AS text_n_redactions
FROM s1
"""


def q_pii_signals_docs(sf_dir: str):
    """Per-doc PII detection counts (Dolma's pii attribute set: email /
    phone / IP taggers). The synthetic corpus has no PII, so both sides
    append the same deterministic snippets — an email pair on every doc,
    a phone iff ``n_chars & 1``, two IPs iff ``n_chars & 2`` — then count
    with identical RE2 patterns."""
    from ballet_ray.stages.text import PiiSignals

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "n_chars"])

    def wrap(t: pa.Table) -> pa.Table:
        # no pc.mod in pyarrow: select bits with bit_wise_and
        f1 = pc.equal(pc.bit_wise_and(t.column("n_chars"), 1), 1)
        f2 = pc.equal(pc.bit_wise_and(t.column("n_chars"), 2), 2)
        phone = pc.if_else(f1, " call 415-555-0172 or (212) 555 0199", "")
        ips = pc.if_else(f2, " from 10.0.0.1 via 192.168.250.3", "")
        page = pc.binary_join_element_wise(
            pc.cast(t.column("text"), pa.string()),
            " contact admin@example.com or bob.smith+x@test.co.uk",
            phone, ips, "")
        return pa.table({"doc_id": t.column("doc_id"), "page": page})

    pages = ds.map_batches(wrap, batch_format="pyarrow")
    pipe = FeatureEngineeringPipeline([Feature("page", PiiSignals())])
    return pipe.fit_transform(pages).select_columns(
        ["doc_id", "page_n_emails", "page_n_phones",
         "page_n_ip_addresses", "page_n_pii"])


def _sql_pii_signals() -> str:
    from ballet_ray.stages.text import PII_SIGNAL_PATTERNS as P

    return f"""
WITH pages AS (
    SELECT doc_id,
           text || ' contact admin@example.com or bob.smith+x@test.co.uk'
                || CASE WHEN (n_chars & 1) = 1
                        THEN ' call 415-555-0172 or (212) 555 0199' ELSE '' END
                || CASE WHEN (n_chars & 2) = 2
                        THEN ' from 10.0.0.1 via 192.168.250.3' ELSE '' END AS page
    FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(page, '{P["emails"]}')) AS page_n_emails,
       len(regexp_extract_all(page, '{P["phones"]}')) AS page_n_phones,
       len(regexp_extract_all(page, '{P["ip_addresses"]}')) AS page_n_ip_addresses,
       len(regexp_extract_all(page, '{P["emails"]}'))
           + len(regexp_extract_all(page, '{P["phones"]}'))
           + len(regexp_extract_all(page, '{P["ip_addresses"]}')) AS page_n_pii
FROM pages
"""


SQL_PII_SIGNALS_DOCS = _sql_pii_signals()


# deterministic HTML shell wrapped around each document for the
# strip_html oracle — single-quote-free so it drops into a SQL literal
_PAGE_PRE = (
    '<html><head><title>t</title><script type="text/javascript">'
    "var x = 1 < 2;</script><style>p { color: red; }</style></head>"
    "<body><h1>Heading &amp; more</h1><!-- hidden comment --><p>"
)
_PAGE_POST = (
    '</p><div class="foot">&copy; footer&nbsp;&lt;end&gt;</div></body></html>'
)


def q_strip_html_docs(sf_dir: str):
    """HTML → text extraction (HtmlToText, the web-ingest first stage).
    Corpus text is plain words, so both sides wrap each doc in the same
    deterministic HTML shell (script/style blocks, comment, entities,
    block + inline tags), then strip it with the identical RE2 chain."""
    from ballet_ray.stages.text import HtmlToText

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def wrap(t: pa.Table) -> pa.Table:
        page = pc.binary_join_element_wise(
            _PAGE_PRE, pc.cast(t.column("text"), pa.string()), _PAGE_POST, "")
        return pa.table({"doc_id": t.column("doc_id"), "page": page})

    pages = ds.map_batches(wrap, batch_format="pyarrow")
    pipe = FeatureEngineeringPipeline([Feature("page", HtmlToText())])
    return pipe.fit_transform(pages).select_columns(
        ["doc_id", "page_text", "page_n_tags"])


def _sql_strip_html() -> str:
    from ballet_ray.stages.text import HTML_BLOCK_TAG_RE, HTML_ENTITIES

    drop = "p"
    for tag in ("script", "style", "noscript", "template"):
        drop = (f"regexp_replace({drop}, '(?is)<{tag}\\b[^>]*>.*?</{tag}>'"
                ", '', 'g')")
    ent = "t"
    for pat, repl in HTML_ENTITIES:
        sql_repl = repl.replace("'", "''")
        ent = f"replace({ent}, '{pat}', '{sql_repl}')"
    return f"""
WITH page AS (
    SELECT doc_id, '{_PAGE_PRE}' || text || '{_PAGE_POST}' AS p
    FROM documents
), s1 AS (
    SELECT doc_id,
           len(regexp_extract_all(p, '(?s)<[^>]*>')) AS page_n_tags,
           {drop} AS t
    FROM page
), s2 AS (
    SELECT doc_id, page_n_tags,
           regexp_replace(regexp_replace(regexp_replace(t,
               '(?s)<!--.*?-->', '', 'g'),
               '{HTML_BLOCK_TAG_RE}', E'\\n', 'g'),
               '(?s)<[^>]*>', '', 'g') AS t
    FROM s1
), s3 AS (
    SELECT doc_id, page_n_tags, {ent} AS t
    FROM s2
)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           regexp_replace(t,
           '[ \\t\\r\\f\\v]+', ' ', 'g'),
           ' ?\\n ?', E'\\n', 'g'),
           '\\n{{3,}}', E'\\n\\n', 'g'),
           '^\\s+', '', 'g'),
           '\\s+$', '', 'g') AS page_text,
       page_n_tags
FROM s3
"""


SQL_STRIP_HTML_DOCS = _sql_strip_html()


def q_normalize_text_docs(sf_dir: str):
    """Unicode NFC + case + whitespace/control normalization
    (TextNormalizer, the pre-hash dedup step). Both sides first rough the
    text up identically: a decomposed accent (e + combining acute), tabs,
    a control char, and double spaces."""
    from ballet_ray.stages.text import TextNormalizer

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def mess(t: pa.Table) -> pa.Table:
        messy = pc.binary_join_element_wise(
            "Café\t BEGIN  ",
            pc.cast(t.column("text"), pa.string()),
            "\t\x01 end ",
            "")
        return pa.table({"doc_id": t.column("doc_id"), "messy": messy})

    pipe = FeatureEngineeringPipeline([Feature("messy", TextNormalizer())])
    return pipe.fit_transform(ds.map_batches(mess, batch_format="pyarrow")) \
        .select_columns(["doc_id", "messy_norm"])


SQL_NORMALIZE_TEXT_DOCS = """
WITH m AS (
    SELECT doc_id,
           'Cafe' || chr(769) || chr(9) || ' BEGIN  ' || text ||
           chr(9) || chr(1) || ' end ' AS messy
    FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           lower(nfc_normalize(messy)),
           '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),
           '[ \\t]+', ' ', 'g'),
           '^\\s+', '', 'g'),
           '\\s+$', '', 'g') AS messy_norm
FROM m
"""


def q_domain_filter_docs(sf_dir: str):
    """UT1-style domain blocklist filtering (filter_by_domain, block mode
    with subdomain matching): four synthetic URL shapes per doc — a
    subdomain of a blocked domain (dropped), a clean host (kept), a
    scheme-less exact blocked host (dropped), and a host whose SUFFIX
    string equals a blocked domain without a label boundary (kept —
    'notevil.org' must NOT match 'evil.org')."""
    from ballet_ray.stages.text import extract_domain, filter_by_domain

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def mess(t: pa.Table) -> pa.Table:
        did = pc.cast(t.column("doc_id"), pa.string())
        j = pc.binary_join_element_wise
        variants = [
            j("https://Ads.Blocked.COM/x/", did, ""),
            j("http://good.site.org/p/", did, ""),
            j("evil.org/", did, ""),
            j("https://notevil.org/", did, ""),
        ]
        did_np = t.column("doc_id").combine_chunks().to_numpy(
            zero_copy_only=False)
        mod = pa.array(did_np % 4, pa.int64())
        url = variants[3]
        for k in range(2, -1, -1):
            url = pc.if_else(pc.equal(mod, k), variants[k], url)
        return pa.table({"doc_id": t.column("doc_id"), "url": url})

    kept = filter_by_domain(
        ds.map_batches(mess, batch_format="pyarrow"),
        {"blocked.com", "evil.org"}, mode="block")
    return kept.map_batches(
        lambda t: extract_domain(t, out_col="domain").select(
            ["doc_id", "domain"]),
        batch_format="pyarrow")


SQL_DOMAIN_FILTER_DOCS = """
WITH m AS (
    SELECT doc_id,
      CASE doc_id % 4
        WHEN 0 THEN 'https://Ads.Blocked.COM/x/' || doc_id
        WHEN 1 THEN 'http://good.site.org/p/' || doc_id
        WHEN 2 THEN 'evil.org/' || doc_id
        ELSE 'https://notevil.org/' || doc_id
      END AS url
    FROM documents
), h AS (
    SELECT doc_id,
      lower(regexp_extract(url,
        '^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/?#@\\s]*@)?([^/?#:\\s]+)', 1))
        AS domain
    FROM m
)
SELECT doc_id, domain FROM h
WHERE NOT (domain = 'blocked.com' OR domain LIKE '%.blocked.com'
        OR domain = 'evil.org'    OR domain LIKE '%.evil.org')
"""


def q_warc_pipeline_docs(sf_dir: str):
    """Web-crawl ingest front end over the WARC source: a deterministic
    4-shard record-gzipped WARC fixture is encoded from documents (each doc
    wrapped in the strip_html synthetic page, URI messy on purpose), then
    read back with read_warc and pushed through the canonical first stages
    — URI canonicalization + HTML→text — exactly what a Common Crawl
    pipeline runs. The oracle recomputes every output column from the
    documents table directly."""
    import pyarrow.parquet as pq

    from ballet_ray.sources.warc import read_warc, write_warc
    from ballet_ray.stages.text import HtmlToText, canonicalize_url

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).sort_by("doc_id")
    fix_dir = f"/tmp/ballet_ray_fixtures/warc_{docs.num_rows}"
    os.makedirs(fix_dir, exist_ok=True)
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    for shard in range(4):
        write_warc(
            f"{fix_dir}/part-{shard}.warc.gz",
            ({"target_uri":
                  f"HTTPS://Docs.Example.COM:443/doc/{i}?utm_source=warc",
              "payload": (_PAGE_PRE + t + _PAGE_POST).encode("utf-8")}
             for i, t in zip(ids, texts) if i % 4 == shard),
            gzip_per_record=True)

    ds = read_warc(fix_dir)

    def parse(t: pa.Table) -> pa.Table:
        doc_id = pc.cast(pc.struct_field(pc.extract_regex(
            t.column("target_uri"), pattern=r"/doc/(?P<id>\d+)"), "id"),
            pa.int64())
        return pa.table({
            "doc_id": doc_id,
            "url": t.column("target_uri"),
            "page": pc.cast(t.column("payload"), pa.string()),
            "http_status": t.column("http_status"),
            "payload_len": t.column("payload_len"),
        })

    parsed = ds.map_batches(parse, batch_format="pyarrow") \
        .map_batches(canonicalize_url, batch_format="pyarrow")
    pipe = FeatureEngineeringPipeline([Feature("page", HtmlToText())])
    return pipe.fit_transform(parsed).select_columns(
        ["doc_id", "canonical_url", "page_text", "page_n_tags",
         "http_status", "payload_len"])


def _sql_warc_pipeline() -> str:
    # reuse the strip_html chain, plus the recomputed envelope columns
    strip = _sql_strip_html()
    return f"""
WITH stripped AS ({strip})
SELECT s.doc_id,
       'https://docs.example.com/doc/' || s.doc_id AS canonical_url,
       s.page_text,
       s.page_n_tags,
       200::INTEGER AS http_status,
       octet_length(encode('{_PAGE_PRE}' || d.text || '{_PAGE_POST}'))
           AS payload_len
FROM stripped s JOIN documents d USING (doc_id)
"""


SQL_WARC_PIPELINE_DOCS = _sql_warc_pipeline()


def q_canonicalize_url_docs(sf_dir: str):
    """URL canonicalization (canonicalize_url: fragment strip, tracking-param
    strip + separator tidy, scheme/authority lowercase, default-port strip,
    root-slash strip). No URL column exists in the test tables, so both
    sides synthesize the same five messy URL shapes from doc_id — mixed
    case, :80/:443 ports, utm_/gclid/fbclid/ref params, fragments, a
    scheme-less URL, and a bare root slash."""
    from ballet_ray.stages.text import canonicalize_url

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def mess(t: pa.Table) -> pa.Table:
        did = pc.cast(t.column("doc_id"), pa.string())
        j = pc.binary_join_element_wise
        variants = [
            j("HTTPS://WWW.Example.COM:443/Docs/", did, "?utm_source=feed&id=",
              did, "&fbclid=XYZ#sec-2", ""),
            j("HTTP://News.Site.ORG:80/?gclid=g", did, ""),
            j("https://CDN.Host.IO:443/", did, "/", ""),
            j("example.com/page/", did, "?ref=tw&q=", did, "#top", ""),
            j("https://API.Service.Net/v1/items?id=", did,
              "&utm_campaign=x&utm_medium=y&igshid=z", ""),
        ]
        did_np = t.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        mod = pa.array(did_np % 5, pa.int64())
        url = variants[4]
        for k in range(3, -1, -1):
            url = pc.if_else(pc.equal(mod, k), variants[k], url)
        return pa.table({"doc_id": t.column("doc_id"), "url": url})

    out = ds.map_batches(mess, batch_format="pyarrow") \
        .map_batches(canonicalize_url, batch_format="pyarrow")
    return out.select_columns(["doc_id", "canonical_url"])


def _sql_canonicalize_url() -> str:
    from ballet_ray.stages.text import TRACKING_PARAMS_RE

    return f"""
WITH m AS (
    SELECT doc_id,
      CASE doc_id % 5
        WHEN 0 THEN 'HTTPS://WWW.Example.COM:443/Docs/' || doc_id
                    || '?utm_source=feed&id=' || doc_id || '&fbclid=XYZ#sec-2'
        WHEN 1 THEN 'HTTP://News.Site.ORG:80/?gclid=g' || doc_id
        WHEN 2 THEN 'https://CDN.Host.IO:443/' || doc_id || '/'
        WHEN 3 THEN 'example.com/page/' || doc_id || '?ref=tw&q=' || doc_id || '#top'
        ELSE 'https://API.Service.Net/v1/items?id=' || doc_id
             || '&utm_campaign=x&utm_medium=y&igshid=z'
      END AS url
    FROM documents
), s1 AS (
    SELECT doc_id,
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(url, '#[\\s\\S]*$', ''),
          '([?&]){TRACKING_PARAMS_RE}=[^&#]*', '\\1', 'g'),
          '\\?&+', '?', 'g'),
          '&&+', '&', 'g'),
          '[?&]+$', '') AS u
    FROM m
), s2 AS (
    SELECT doc_id,
      CASE WHEN regexp_matches(u, '^[A-Za-z][A-Za-z0-9+.-]*://')
        THEN lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
             || regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')
        ELSE u END AS u
    FROM s1
)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(u,
      '^(http://[^/:?#]+):80([/?#][\\s\\S]*)?$', '\\1\\2'),
      '^(https://[^/:?#]+):443([/?#][\\s\\S]*)?$', '\\1\\2'),
      '^([A-Za-z0-9+.-]+://[^/?#]+)/$', '\\1') AS canonical_url
FROM s2
"""


SQL_CANONICALIZE_URL_DOCS = _sql_canonicalize_url()


def q_dedup_lines_docs(sf_dir: str):
    """Corpus-wide exact line dedup (remove_duplicate_lines: global first
    occurrence by (doc_id, line_no) wins). Corpus text is single-line, so
    both sides first explode each doc into one word per line plus one
    corpus-wide banner line — heavy cross-doc duplication, exercising the
    certain-loser combiner, the winner resolution, and the rebuild."""
    from ballet_ray.stages.dedup import remove_duplicate_lines

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        txt = pc.binary_join_element_wise(
            "the shared banner line\n",
            pc.replace_substring(pc.cast(t.column("text"), pa.string()),
                                 pattern=" ", replacement="\n"),
            "")
        return pa.table({"doc_id": t.column("doc_id"), "text": txt})

    out = remove_duplicate_lines(
        ds.map_batches(explode, batch_format="pyarrow"))

    def widen(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "text": t.column("text"),
            "n_lines": pc.cast(t.column("n_lines"), pa.int64()),
            "n_removed": pc.cast(t.column("n_removed"), pa.int64()),
        })

    return out.map_batches(widen, batch_format="pyarrow")


SQL_DEDUP_LINES_DOCS = """
WITH src AS (
    SELECT doc_id,
           split('the shared banner line' || chr(10) ||
                 replace(text, ' ', chr(10)), chr(10)) AS arr
    FROM documents
), ln AS (
    SELECT doc_id,
           unnest(arr) AS line,
           unnest(generate_series(0, len(arr) - 1)) AS line_no
    FROM src
), marked AS (
    SELECT doc_id, line, line_no,
           CASE WHEN len(lower(trim(line))) < 1 THEN TRUE
                WHEN row_number() OVER (PARTITION BY lower(trim(line))
                                        ORDER BY doc_id, line_no) = 1 THEN TRUE
                ELSE FALSE END AS keep
    FROM ln
)
SELECT doc_id,
       coalesce(string_agg(line, chr(10) ORDER BY line_no)
                FILTER (WHERE keep), '') AS text,
       count(*) FILTER (WHERE keep) AS n_lines,
       count(*) FILTER (WHERE NOT keep) AS n_removed
FROM marked
GROUP BY doc_id
"""


def q_semantic_dedup_embeddings(sf_dir: str):
    """SemDeDup (k-means cells + within-cell cosine pruning, min-id
    keeper) over the embeddings unioned with exact-duplicate clones
    (vec_id + 100000). Identical vectors always land in the same k-means
    cell and have cosine 1, so exactly the clones are dropped — recall 1,
    SQL-oracle-able (same planting pattern as embedding_near_dups)."""
    from ballet_ray.stages.similarity import semantic_dedup

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def clone(t: pa.Table) -> pa.Table:
        ids = pc.add(t.column("vec_id"), pa.scalar(100000))
        return pa.table({"vec_id": ids, "embedding": t.column("embedding")})

    both = emb.union(emb.map_batches(clone, batch_format="pyarrow"))
    return semantic_dedup(
        both, embedding_col="embedding", id_col="vec_id", dim=64, threshold=0.99, n_centroids=32
    )


SQL_SEMANTIC_DEDUP_EMBEDDINGS = """
SELECT vec_id + 100000 AS vec_id FROM embeddings
"""


def q_stratified_sample_docs(sf_dir: str):
    """Deterministic per-language subsample: the 20 smallest md5-priority
    docs per lang. Hash-priority (not random()) makes the sample
    reproducible under any partitioning and SQL-auditable."""
    from ballet_ray.stages.sampling import stratified_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    return stratified_sample(ds, group_col="lang", key_col="doc_id", n=20, method="md5")


SQL_STRATIFIED_SAMPLE_DOCS = """
SELECT lang, doc_id FROM (
    SELECT lang, doc_id,
           ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS rn
    FROM documents
) WHERE rn <= 20
"""


def q_mixture_sample_docs(sf_dir: str):
    """Corpus mixture weighting: per-source Bernoulli keep-rates applied
    by hash threshold (pure streaming filter, reproducible, resumable)."""
    from ballet_ray.stages.sampling import hash_rate_filter

    rates = {f"src{i}": (1.0 if i % 3 == 0 else (0.5 if i % 3 == 1 else 0.2)) for i in range(20)}
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    return hash_rate_filter(ds, key_col="doc_id", rates=rates, group_col="source", salt="mix:", method="md5")


SQL_MIXTURE_SAMPLE_DOCS = """
SELECT doc_id, source FROM (
    SELECT doc_id, source,
           CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
               / 4294967296.0 AS u,
           CASE WHEN CAST(substr(source, 4) AS INT) % 3 = 0 THEN 1.0
                WHEN CAST(substr(source, 4) AS INT) % 3 = 1 THEN 0.5
                ELSE 0.2 END AS thr
    FROM documents
) WHERE u < thr
"""


def q_unimax_mixture_docs(sf_dir: str):
    """UniMax mixture allocation (Chung 2023): water-fill a 1.3×-corpus
    budget across languages with a 2-epoch cap — the smallest language
    hits the cap (2 full epochs), mid languages get one full pass plus a
    fractional hash-sampled second epoch, the largest is down-sampled.
    Exercises the whole algorithm: driver water-fill, map-only epoch
    expansion, deterministic md5 fractional draw."""
    from ballet_ray.stages.sampling import unimax_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    budget = 1.3 * ds.count()
    return unimax_sample(
        ds, group_col="lang", key_col="doc_id", budget=budget,
        max_epochs=2.0, salt="umx:", method="md5",
    )


SQL_UNIMAX_MIXTURE_DOCS = """
WITH sizes AS (
    SELECT lang, CAST(COUNT(*) AS DOUBLE) AS c FROM documents GROUP BY lang
), budget AS (
    SELECT 1.3 * SUM(c) AS b FROM sizes
), ord AS (
    SELECT lang, c, 2.0 * c AS cap,
           ROW_NUMBER() OVER (ORDER BY 2.0 * c, lang) AS rn,
           SUM(2.0 * c) OVER (ORDER BY 2.0 * c, lang ROWS UNBOUNDED PRECEDING) AS cum,
           LAG(2.0 * c, 1, 0.0) OVER (ORDER BY 2.0 * c, lang) AS prev_cap,
           COUNT(*) OVER () AS k
    FROM sizes
), lvl AS (
    SELECT MAX((b - (cum - cap)) / (k - rn + 1)) AS t
    FROM ord, budget
    WHERE (b - (cum - cap)) / (k - rn + 1) >= prev_cap
      AND (b - (cum - cap)) / (k - rn + 1) <= cap
), rates AS (
    SELECT lang, LEAST(cap, COALESCE((SELECT t FROM lvl), cap)) / c AS r FROM ord
)
SELECT doc_id, lang, UNNEST(range(0, reps)) AS epoch
FROM (
    SELECT d.doc_id, d.lang,
           CAST(floor(r) AS BIGINT)
           + CASE WHEN CAST(('0x' || substr(md5('umx:' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                       / 4294967296.0 < r - floor(r) THEN 1 ELSE 0 END AS reps
    FROM documents d JOIN rates USING (lang)
)
"""


def q_percent_rank_orders(sf_dir: str):
    """RANK/PERCENT_RANK of order price within priority via the
    distinct-value route (rank = 1 + Σ counts of smaller values; the
    per-group scan touches distinct values, not rows)."""
    from ballet_ray.stages.windows import grouped_rank

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    )
    out = grouped_rank(ds, group_col="o_orderpriority", value_col="o_totalprice")
    out = out.select_columns(["o_orderkey", "o_orderpriority", "rank", "percent_rank"])
    return _round_cols(out, {"percent_rank": 6})


SQL_PERCENT_RANK_ORDERS = """
SELECT o_orderkey, o_orderpriority,
       RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rank,
       ROUND(PERCENT_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice), 6) AS percent_rank
FROM orders
"""


def q_pca_embeddings(sf_dir: str):
    """Distributed PCA (one tree-reduced moments pass, driver-side d×d
    eigh) projecting the embedding column onto 4 components. Not
    SQL-expressible (eigendecomposition) — rows-only here; exact numpy
    parity is pytest-enforced in test_decomposition.py."""
    from ballet_ray.stages.decomposition import pca_fit_embeddings, pca_transform_embeddings

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    model = pca_fit_embeddings(emb, n_components=4)
    out = pca_transform_embeddings(emb, model)
    return _round_cols(out, {f"pc{i}": 6 for i in range(4)})


def q_logreg_quality_docs(sf_dir: str):
    """Model-based quality filter: distributed-Newton logistic regression
    predicting lang=='en' from the QualityScore features, scored per doc.
    Not SQL-expressible (iterative solver) — rows-only; exact parity of
    the distributed fit vs in-memory Newton is pytest-enforced in
    test_classifier.py."""
    from ballet_ray.stages.classifier import DistributedLogReg
    from ballet_ray.stages.text import QualityScore

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])

    def label(t: pa.Table) -> pa.Table:
        y = pc.cast(pc.equal(t.column("lang"), "en"), pa.float64())
        return t.append_column("is_en", y)

    pipe = FeatureEngineeringPipeline(
        [
            Feature("text", QualityScore()),
            Feature(["words", "mean_wlen", "alpha_frac"], DistributedLogReg("is_en", n_iter=6)),
        ]
    )
    out = pipe.fit_transform(ds.map_batches(label, batch_format="pyarrow"))
    return _round_cols(out.select_columns(["doc_id", "prob"]), {"prob": 6})


def q_duplicate_passages_docs(sf_dir: str):
    """Corpus-wide duplicate passage detection (substring-level dedup
    building block): every overlapping 5-word window keyed and counted in
    one groupby; windows seen twice+ are the duplicated passages.
    key='text' ships the passage string (oracle-able); key='hash' is the
    scale mode (uint64 per window)."""
    from ballet_ray.stages.dedup import duplicate_passages

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return duplicate_passages(ds, n=5, min_count=2, key="text")


SQL_DUPLICATE_PASSAGES_DOCS = """
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (
    SELECT UNNEST([array_to_string(w[i:i+4], ' ') FOR i IN range(1, len(w) - 3)]) AS passage_key
    FROM ws
)
SELECT passage_key, COUNT(*) AS dup_count
FROM wins GROUP BY passage_key HAVING COUNT(*) >= 2
"""


def q_token_duplicate_passages_docs(sf_dir: str):
    """Duplicate token-window detection over the canonical tokens shape
    (documents hash-tokenized in-flight): Horner-hashed 8-token windows,
    one keyed count, no token payload in the shuffle. Keys are siphash-
    derived — not SQL-reproducible, so rows-only; exact brute parity is
    pytest-enforced (test_text_dedup_similarity)."""
    from ballet_ray.stages.dedup import token_duplicate_passages
    from ballet_ray.stages.text import hash_tokenize

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    toks = ds.map_batches(hash_tokenize, batch_format="pyarrow").select_columns(["doc_id", "tokens"])
    out = token_duplicate_passages(toks, n=8, min_count=2)
    return out.select_columns(["passage_key", "dup_count"])


def q_remove_spans_docs(sf_dir: str):
    """Exact substring-level dedup (Lee et al. 2022 shape): every
    duplicated 5-word span loses all but its global first occurrence
    (min doc_id, then offset); docs come back with losing spans cut out.
    Fully distributed: window-keyed loser selection, per-doc offset
    aggregation, one id-keyed join carrying the payload."""
    from ballet_ray.stages.dedup import remove_duplicate_spans

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def words(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"), "w": pc.split_pattern(t.column("text"), " ")})

    out = remove_duplicate_spans(
        ds.map_batches(words, batch_format="pyarrow"), tokens_col="w", n=5
    )

    def join_words(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "remaining": pc.binary_join(t.column("w"), " "),
                "n_removed": pc.cast(t.column("n_removed"), pa.int64()),
            }
        )

    return out.map_batches(join_words, batch_format="pyarrow")


SQL_REMOVE_SPANS_DOCS = """
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (
    SELECT doc_id, UNNEST([{'off': i, 'p': array_to_string(w[i:i+4], ' ')} FOR i IN range(1, len(w) - 3)], recursive := true)
    FROM ws
),
losers AS (
    SELECT doc_id, "off" FROM wins
    QUALIFY ROW_NUMBER() OVER (PARTITION BY p ORDER BY doc_id, "off") > 1
),
cov AS (
    SELECT DISTINCT doc_id, UNNEST(range("off", "off" + 5)) AS pos FROM losers
),
wpos AS (
    SELECT doc_id, UNNEST(w) AS word, generate_subscripts(w, 1) AS i FROM ws
),
kept AS (
    SELECT p.doc_id,
           string_agg(p.word, ' ' ORDER BY p.i) AS remaining,
           COUNT(*) AS n_tok
    FROM wpos p LEFT JOIN cov ON p.doc_id = cov.doc_id AND p.i = cov.pos
    WHERE cov.pos IS NULL
    GROUP BY p.doc_id
)
SELECT ws.doc_id,
       COALESCE(kept.remaining, '') AS remaining,
       len(ws.w) - COALESCE(kept.n_tok, 0) AS n_removed
FROM ws LEFT JOIN kept ON ws.doc_id = kept.doc_id
"""


def q_contamination_docs(sf_dir: str):
    """Benchmark decontamination: docs 0-49 play the eval set; corpus docs
    (id >= 50) are flagged with the count AND fraction of their 8-word
    windows that appear anywhere in the eval set (PaLM thresholds the
    fraction: drop at ≥70% contaminated 8-grams). Eval window keys
    broadcast once; the corpus side is one shuffle-free streaming pass."""
    from ballet_ray.stages.dedup import find_contaminated

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    corpus = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("doc_id"), 50)), batch_format="pyarrow"
    )
    eval_ds = ds.map_batches(
        lambda t: t.filter(pc.less(t.column("doc_id"), 50)), batch_format="pyarrow"
    )
    return find_contaminated(corpus, eval_ds, n=8, key="text",
                              with_fraction=True)


SQL_CONTAMINATION_DOCS = """
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
cw AS (
    SELECT doc_id, UNNEST([array_to_string(w[i:i+7], ' ') FOR i IN range(1, len(w) - 6)]) AS p
    FROM ws WHERE doc_id >= 50
),
ew AS (
    SELECT DISTINCT UNNEST([array_to_string(w[i:i+7], ' ') FOR i IN range(1, len(w) - 6)]) AS p
    FROM ws WHERE doc_id < 50
)
SELECT cw.doc_id, COUNT(*) AS n_hits,
       MAX(len(ws.w) - 7) AS n_windows,
       COUNT(*) / CAST(MAX(len(ws.w) - 7) AS DOUBLE) AS hit_frac
FROM cw JOIN ew USING (p) JOIN ws ON ws.doc_id = cw.doc_id
GROUP BY cw.doc_id
"""


def q_token_contamination_docs(sf_dir: str):
    """Benchmark decontamination over the PRE-TOKENIZED column (the
    north-rule input shape): docs 0-49 play the eval set, word-length
    sequences stand in for token ids, and corpus docs (id >= 50) are
    flagged with the count and fraction of their 8-TOKEN windows that
    appear anywhere in the eval set. Eval window keys broadcast once; the
    corpus side is one shuffle-free streaming pass over the shared Horner
    window kernel — no text, no strings."""
    from ballet_ray.stages.dedup import find_contaminated_tokens

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.cast(t.column("text"), pa.string()), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        lens = pc.utf8_length(words.flatten())
        return pa.table({"doc_id": t.column("doc_id"),
                         "tokens": pa.ListArray.from_arrays(words.offsets, lens)})

    tok_ds = ds.map_batches(toks, batch_format="pyarrow")
    corpus = tok_ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("doc_id"), 50)), batch_format="pyarrow"
    )
    eval_ds = tok_ds.map_batches(
        lambda t: t.filter(pc.less(t.column("doc_id"), 50)), batch_format="pyarrow"
    )
    return find_contaminated_tokens(corpus, eval_ds, n=8, with_fraction=True)


SQL_TOKEN_CONTAMINATION_DOCS = """
WITH tk AS (SELECT doc_id,
                   list_transform(string_split(text, ' '), w -> len(w)) AS tok
            FROM documents),
cw AS (
    SELECT doc_id, UNNEST([array_to_string(tok[i:i+7], ',') FOR i IN range(1, len(tok) - 6)]) AS p
    FROM tk WHERE doc_id >= 50
),
ew AS (
    SELECT DISTINCT UNNEST([array_to_string(tok[i:i+7], ',') FOR i IN range(1, len(tok) - 6)]) AS p
    FROM tk WHERE doc_id < 50
)
SELECT cw.doc_id, COUNT(*) AS n_hits,
       MAX(len(tk.tok) - 7) AS n_windows,
       COUNT(*) / CAST(MAX(len(tk.tok) - 7) AS DOUBLE) AS hit_frac
FROM cw JOIN ew USING (p) JOIN tk ON tk.doc_id = cw.doc_id
GROUP BY cw.doc_id
"""


def q_fim_transform_docs(sf_dir: str):
    """Fill-in-the-middle transform (Bavarian 2022) over the pre-tokenized
    column (word lengths stand in for token ids): half the docs —
    selected deterministically by row id in md5 SQL-audit mode — are cut
    at two uniform split points and reordered to [PRE] prefix [SUF]
    suffix [MID] middle with negative sentinel ids. The oracle checks the
    EXACT transformed sequences order-sensitively via the comma-joined
    token string."""
    from ballet_ray.stages.sequences import fim_transform

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.cast(t.column("text"), pa.string()), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        lens = pc.cast(pc.utf8_length(words.flatten()), pa.int64())
        return pa.table({"doc_id": t.column("doc_id"),
                         "tokens": pa.ListArray.from_arrays(words.offsets, lens)})

    out = fim_transform(ds.map_batches(toks, batch_format="pyarrow"),
                        rate=0.5, method="md5")

    def shape(t: pa.Table) -> pa.Table:
        col = t.column("tokens")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat_str = pc.cast(col.flatten(), pa.string())
        offs = col.offsets
        joined = pc.binary_join(pa.ListArray.from_arrays(offs, flat_str), ",")
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tok": pc.cast(t.column("n_tok"), pa.int64()),
                         "toks": joined})

    return out.map_batches(shape, batch_format="pyarrow")


SQL_FIM_TRANSFORM_DOCS = """
WITH tk AS (SELECT doc_id,
                   list_transform(string_split(text, ' '),
                                  w -> CAST(len(w) AS BIGINT)) AS tok
            FROM documents),
p AS (SELECT doc_id, tok,
        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) / 4294967296.0 AS us,
        CAST(FLOOR(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8)) AS UBIGINT) / 4294967296.0 * (len(tok) + 1)) AS BIGINT) AS a,
        CAST(FLOOR(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 17, 8)) AS UBIGINT) / 4294967296.0 * (len(tok) + 1)) AS BIGINT) AS b
      FROM tk),
q AS (SELECT doc_id,
        CASE WHEN us < 0.5 THEN
            [CAST(-1 AS BIGINT)] || tok[1:least(a, b)]
            || [CAST(-2 AS BIGINT)] || tok[greatest(a, b) + 1:len(tok)]
            || [CAST(-3 AS BIGINT)] || tok[least(a, b) + 1:greatest(a, b)]
        ELSE tok END AS tokens
      FROM p)
SELECT doc_id, len(tokens) AS n_tok, array_to_string(tokens, ',') AS toks
FROM q
"""


def q_vocab_prune_docs(sf_dir: str):
    """Vocabulary pruning over the pre-tokenized column (word lengths
    stand in for token ids): corpus-wide id-frequency fit (per-batch
    np.unique combiners → one bounded groupby, deterministic (count desc,
    id asc) cap), keep the top 10, remap kept ids to dense ranks 1..10,
    everything else → UNK 0. Order-sensitive full oracle via the
    comma-joined remapped sequences + per-doc UNK counts."""
    from ballet_ray.stages.sequences import apply_vocab_prune, fit_vocab_prune

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.cast(t.column("text"), pa.string()), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        lens = pc.cast(pc.utf8_length(words.flatten()), pa.int64())
        return pa.table({"doc_id": t.column("doc_id"),
                         "tokens": pa.ListArray.from_arrays(words.offsets, lens)})

    tok_ds = ds.map_batches(toks, batch_format="pyarrow")
    kept, new = fit_vocab_prune(tok_ds, keep=10)
    out = apply_vocab_prune(tok_ds, kept, new)

    def shape(t: pa.Table) -> pa.Table:
        col = t.column("tokens")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        joined = pc.binary_join(
            pa.ListArray.from_arrays(col.offsets, pc.cast(col.flatten(), pa.string())), ",")
        return pa.table({"doc_id": t.column("doc_id"), "toks": joined,
                         "n_unk": pc.cast(t.column("n_unk"), pa.int64())})

    return out.map_batches(shape, batch_format="pyarrow")


SQL_VOCAB_PRUNE_DOCS = """
WITH tk AS (SELECT doc_id,
                   list_transform(string_split(text, ' '),
                                  w -> CAST(len(w) AS BIGINT)) AS tok
            FROM documents),
cnt AS (SELECT tok[u.i] AS t, COUNT(*) AS c
        FROM tk, UNNEST(generate_series(1, len(tok))) AS u(i)
        GROUP BY tok[u.i]),
v AS (SELECT t, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS nid
      FROM cnt QUALIFY nid <= 10),
m0 AS (SELECT doc_id, u.i AS ord, tok[u.i] AS t
       FROM tk, UNNEST(generate_series(1, len(tok))) AS u(i)),
m AS (SELECT m0.doc_id, m0.ord, COALESCE(v.nid, 0) AS new
      FROM m0 LEFT JOIN v ON v.t = m0.t)
SELECT doc_id,
       COALESCE(array_to_string(list(new ORDER BY ord), ','), '') AS toks,
       CAST(COALESCE(SUM(CASE WHEN new = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_unk
FROM m
GROUP BY doc_id
"""


def q_prefix_lm_docs(sf_dir: str):
    """UL2 S-denoiser / prefix-LM split over the pre-tokenized column:
    every doc splits at one uniform point c in [1, L-1] (md5 SQL-audit
    mode, the second uniform of the FIM hash — substr 9..16), inputs =
    tokens[:c], targets = tokens[c:]. Order-sensitive full oracle via the
    comma-joined halves."""
    from ballet_ray.stages.sequences import prefix_lm_split

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.cast(t.column("text"), pa.string()), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        lens = pc.cast(pc.utf8_length(words.flatten()), pa.int64())
        return pa.table({"doc_id": t.column("doc_id"),
                         "tokens": pa.ListArray.from_arrays(words.offsets, lens)})

    out = prefix_lm_split(ds.map_batches(toks, batch_format="pyarrow"),
                          rate=1.0, method="md5")

    def shape(t: pa.Table) -> pa.Table:
        def join(name):
            col = t.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pc.binary_join(pa.ListArray.from_arrays(
                col.offsets, pc.cast(col.flatten(), pa.string())), ",")
        return pa.table({"doc_id": t.column("doc_id"),
                         "inp": join("inputs"), "tgt": join("targets"),
                         "n_in": pc.cast(t.column("n_in"), pa.int64()),
                         "n_tgt": pc.cast(t.column("n_tgt"), pa.int64())})

    return out.map_batches(shape, batch_format="pyarrow")


SQL_PREFIX_LM_DOCS = """
WITH tk AS (SELECT doc_id,
                   list_transform(string_split(text, ' '),
                                  w -> CAST(len(w) AS BIGINT)) AS tok
            FROM documents),
p AS (SELECT doc_id, tok,
        CASE WHEN len(tok) >= 2 THEN
            1 + CAST(FLOOR(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8)) AS UBIGINT) / 4294967296.0 * (len(tok) - 1)) AS BIGINT)
        ELSE len(tok) END AS c
      FROM tk)
SELECT doc_id,
       array_to_string(tok[1:c], ',') AS inp,
       array_to_string(tok[c+1:len(tok)], ',') AS tgt,
       c AS n_in,
       len(tok) - c AS n_tgt
FROM p
"""


def q_shuffle_index_docs(sf_dir: str):
    """Deterministic epoch-order assignment: dense 0..N-1 rank under
    ORDER BY md5(doc_id), doc_id — a reproducible global permutation
    (counts-only bin pre-pass + one payload shuffle)."""
    from ballet_ray.stages.sampling import global_shuffle_index

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return global_shuffle_index(ds, key_col="doc_id", method="md5").select_columns(["doc_id", "shuffle_idx"])


SQL_SHUFFLE_INDEX_DOCS = """
SELECT doc_id,
       ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS shuffle_idx
FROM documents
"""


def q_gopher_filter_docs(sf_dir: str):
    """Gopher/C4-style composite quality filter as ONE fused pass: word
    count + repetition signals computed batch-locally, conjunctive
    thresholds applied as a streaming filter (words >= 20,
    dup_word_frac <= 0.6, top_word_frac <= 0.13 — each bites on this
    corpus). The whole preset is a single map_batches chain: no shuffle,
    nothing materialized."""
    from ballet_ray.stages.text import QualityScore, WordRepetition

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pipe = FeatureEngineeringPipeline(
        [Feature("text", QualityScore()), Feature("text", WordRepetition())]
    )
    out = pipe.fit_transform(ds).select_columns(
        ["doc_id", "words", "dup_word_frac", "top_word_frac"]
    )

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(t.column("words"), 20),
                pc.less_equal(t.column("dup_word_frac"), 0.6),
            ),
            pc.less_equal(t.column("top_word_frac"), 0.13),
        )
        return t.filter(m)

    return _round_cols(out.map_batches(keep, batch_format="pyarrow"),
                       {"dup_word_frac": 6, "top_word_frac": 6})


SQL_GOPHER_FILTER_DOCS = """
WITH counts AS (
    SELECT doc_id, w, COUNT(*) AS c
    FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
    GROUP BY doc_id, w
), rep AS (
    SELECT doc_id,
           1.0 - COUNT(*) * 1.0 / SUM(c) AS dup_word_frac,
           MAX(c) * 1.0 / SUM(c) AS top_word_frac
    FROM counts GROUP BY doc_id
), q AS (
    SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS words FROM documents
)
SELECT doc_id, words,
       ROUND(dup_word_frac, 6) AS dup_word_frac,
       ROUND(top_word_frac, 6) AS top_word_frac
FROM q JOIN rep USING (doc_id)
WHERE words >= 20 AND dup_word_frac <= 0.6 AND top_word_frac <= 0.13
"""


def q_token_near_dedup_docs(sf_dir: str):
    """NEAR-dedup over the pre-tokenized shape (the token twin of
    minhash_dedup): word-length sequences stand in for token arrays;
    token-shingle MinHash-LSH pairs -> components -> keep the LONGEST
    member per cluster (n_tok keep_col, min-id tiebreak). Rows-only:
    LSH bucket membership is not SQL-expressible; exact-parity pytest
    covers the semantics (tests/test_list_content_hash.py)."""
    from ballet_ray.stages.dedup import dedup_by_token_minhash

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.cast(t.column("text"), pa.string()), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        lens = pc.utf8_length(words.flatten())
        toks = pa.ListArray.from_arrays(words.offsets, lens)
        n = pc.cast(pc.list_value_length(toks), pa.int64())
        return pa.table({"doc_id": t.column("doc_id"), "tokens": toks,
                         "n_tok": n})

    tok_ds = ds.map_batches(toks, batch_format="pyarrow")
    out = dedup_by_token_minhash(tok_ds, keep_col="n_tok", est_threshold=0.8)
    return out.select_columns(["doc_id", "n_tok"])


def q_token_seq_dedup_docs(sf_dir: str):
    """EXACT sequence-level dedup over a pre-tokenized list column (the
    north-rule input shape): each doc's word-length sequence stands in for
    its token array; exact_dedup's zero-copy binary reinterpretation of
    the list values buffer hashes whole rows (offsets define boundaries,
    so [1,2],[3] != [1],[2,3]) and keeps the min doc_id per distinct
    sequence. The planted exact-dup docs share sequences, so the dedup
    bites."""
    from ballet_ray.stages.dedup import exact_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.cast(t.column("text"), pa.string()), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        lens = pc.utf8_length(words.flatten())
        toks = pa.ListArray.from_arrays(words.offsets, lens)
        return pa.table({"doc_id": t.column("doc_id"), "toks": toks})

    tok_ds = ds.map_batches(toks, batch_format="pyarrow")
    out = exact_dedup(tok_ds, col="toks", id_col="doc_id")

    def shape(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(t.column("toks"))
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tok": pc.cast(n, pa.int64())})

    return out.map_batches(shape, batch_format="pyarrow")


SQL_TOKEN_SEQ_DEDUP_DOCS = """
WITH tok AS (
    SELECT doc_id,
           list_transform(string_split(text, ' '), w -> len(w)) AS toks
    FROM documents
)
SELECT doc_id, len(toks) AS n_tok
FROM (SELECT doc_id, toks,
             MIN(doc_id) OVER (PARTITION BY toks) AS keep_id
      FROM tok)
WHERE doc_id = keep_id
"""


def q_gopher_signals_docs(sf_dir: str):
    """The structural half of Gopher's published rules (Rae 2021 §A1.1):
    within-doc duplicate line/paragraph fractions (count + char weighted),
    bullet/ellipsis line fractions, symbol-to-word ratio, alpha-word
    fraction, 8-stop-word hits. Corpus text is single-line, so both sides
    build the same deterministic multi-line page: a stop-word line, a
    bullet line, an ellipsis line, a '#' heading paragraph — with the
    bullet line duplicated for doc_id%3==0 and the whole second paragraph
    duplicated for doc_id%7==2 so every repetition signal varies."""
    from ballet_ray.stages.text import GopherSignals

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def wrap(t: pa.Table) -> pa.Table:
        txt = pc.cast(t.column("text"), pa.string())
        did = pc.cast(t.column("doc_id"), pa.string())
        idn = t.column("doc_id").to_numpy(zero_copy_only=False)
        dup_bullet = np.where(idn % 3 == 0, True, False)
        base_bullet = pc.binary_join_element_wise(
            "- bullet item number ", did, "\n", "")
        extra_bullet = pa.array(
            np.where(dup_bullet,
                     np.asarray(base_bullet.to_pandas(), dtype=object), "")
            .astype(object), pa.string())
        para_b = pc.binary_join_element_wise(
            "# heading ", did, "\n", extra_bullet, "closing line.", "")
        page = pc.binary_join_element_wise(
            txt, "\n",
            "the be to of and that have with all stop words.\n",
            base_bullet,
            "to be continued...\n\n",
            para_b, "")
        dup_para = pa.array(
            np.where(idn % 7 == 2,
                     np.char.add("\n\n", np.asarray(
                         para_b.to_pandas(), dtype=str)), "")
            .astype(object), pa.string())
        page = pc.binary_join_element_wise(page, dup_para, "")
        return pa.table({"doc_id": t.column("doc_id"), "page": page})

    pages = ds.map_batches(wrap, batch_format="pyarrow")
    pipe = FeatureEngineeringPipeline([Feature("page", GopherSignals())])
    out = pipe.fit_transform(pages).select_columns(
        ["doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac",
         "dup_para_frac", "dup_para_char_frac", "bullet_line_frac",
         "ellipsis_line_frac", "punct_line_frac", "short_line_frac",
         "symbol_word_ratio", "alpha_word_frac", "stop_hits"])
    return _round_cols(out, {
        "dup_line_frac": 6, "dup_line_char_frac": 6, "dup_para_frac": 6,
        "dup_para_char_frac": 6, "bullet_line_frac": 6,
        "ellipsis_line_frac": 6, "punct_line_frac": 6,
        "short_line_frac": 6, "symbol_word_ratio": 6,
        "alpha_word_frac": 6})


def _sql_gopher_signals() -> str:
    from ballet_ray.stages.text import GOPHER_STOP_WORDS

    hits = " + ".join(
        f"(CASE WHEN regexp_matches(lower(p), '\\b{w}\\b') THEN 1 ELSE 0 END)"
        for w in GOPHER_STOP_WORDS)
    return f"""
WITH page AS (
    SELECT doc_id,
           text || chr(10) ||
           'the be to of and that have with all stop words.' || chr(10) ||
           '- bullet item number ' || CAST(doc_id AS VARCHAR) || chr(10) ||
           'to be continued...' || chr(10) || chr(10) ||
           '# heading ' || CAST(doc_id AS VARCHAR) || chr(10) ||
           CASE WHEN doc_id % 3 = 0
                THEN '- bullet item number ' || CAST(doc_id AS VARCHAR) || chr(10)
                ELSE '' END ||
           'closing line.' ||
           CASE WHEN doc_id % 7 = 2
                THEN chr(10) || chr(10) ||
                     '# heading ' || CAST(doc_id AS VARCHAR) || chr(10) ||
                     CASE WHEN doc_id % 3 = 0
                          THEN '- bullet item number ' ||
                               CAST(doc_id AS VARCHAR) || chr(10)
                          ELSE '' END ||
                     'closing line.'
                ELSE '' END AS p
    FROM documents
), per_line AS (
    SELECT doc_id, line, COUNT(*) AS c, len(line) AS ln
    FROM (SELECT doc_id, UNNEST(string_split(p, chr(10))) AS line FROM page)
    GROUP BY doc_id, line
), linerep AS (
    SELECT doc_id, SUM(c) AS n_lines,
           1.0 - COUNT(*) * 1.0 / SUM(c) AS dup_line_frac,
           CASE WHEN SUM(c * ln) > 0
                THEN 1.0 - SUM(ln) * 1.0 / SUM(c * ln) ELSE 0.0 END
               AS dup_line_char_frac
    FROM per_line GROUP BY doc_id
), per_para AS (
    SELECT doc_id, para, COUNT(*) AS c, len(para) AS ln
    FROM (SELECT doc_id,
                 UNNEST(string_split(p, chr(10) || chr(10))) AS para
          FROM page)
    GROUP BY doc_id, para
), pararep AS (
    SELECT doc_id,
           1.0 - COUNT(*) * 1.0 / SUM(c) AS dup_para_frac,
           CASE WHEN SUM(c * ln) > 0
                THEN 1.0 - SUM(ln) * 1.0 / SUM(c * ln) ELSE 0.0 END
               AS dup_para_char_frac
    FROM per_para GROUP BY doc_id
), flat AS (
    SELECT doc_id,
           len(list_filter(string_split(p, chr(10)),
               l -> regexp_matches(l, '^\\s*[-*•]'))) * 1.0
               / len(string_split(p, chr(10))) AS bullet_line_frac,
           len(list_filter(string_split(p, chr(10)),
               l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$'))) * 1.0
               / len(string_split(p, chr(10))) AS ellipsis_line_frac,
           len(list_filter(string_split(p, chr(10)),
               l -> regexp_matches(l, '[.!?"”'']\\s*$'))) * 1.0
               / len(string_split(p, chr(10))) AS punct_line_frac,
           len(list_filter(string_split(p, chr(10)),
               l -> len(l) < 30)) * 1.0
               / len(string_split(p, chr(10))) AS short_line_frac,
           (len(regexp_extract_all(p, '#'))
            + len(regexp_extract_all(p, '\\.\\.\\.'))
            + len(regexp_extract_all(p, '…'))) * 1.0
               / len(regexp_extract_all(p, '\\S+')) AS symbol_word_ratio,
           len(list_filter(regexp_extract_all(p, '\\S+'),
               w -> regexp_matches(w, '[A-Za-z]'))) * 1.0
               / len(regexp_extract_all(p, '\\S+')) AS alpha_word_frac,
           CAST({hits} AS BIGINT) AS stop_hits
    FROM page
)
SELECT doc_id, n_lines,
       ROUND(dup_line_frac, 6) AS dup_line_frac,
       ROUND(dup_line_char_frac, 6) AS dup_line_char_frac,
       ROUND(dup_para_frac, 6) AS dup_para_frac,
       ROUND(dup_para_char_frac, 6) AS dup_para_char_frac,
       ROUND(bullet_line_frac, 6) AS bullet_line_frac,
       ROUND(ellipsis_line_frac, 6) AS ellipsis_line_frac,
       ROUND(punct_line_frac, 6) AS punct_line_frac,
       ROUND(short_line_frac, 6) AS short_line_frac,
       ROUND(symbol_word_ratio, 6) AS symbol_word_ratio,
       ROUND(alpha_word_frac, 6) AS alpha_word_frac,
       stop_hits
FROM linerep JOIN pararep USING (doc_id) JOIN flat USING (doc_id)
"""


SQL_GOPHER_SIGNALS_DOCS = _sql_gopher_signals()


def q_c4_clean_docs(sf_dir: str):
    """C4's published line/doc heuristics (Raffel et al. 2020 §2.2) as one
    zero-shuffle pass: keep lines ending in terminal punctuation with >= 5
    words and no 'javascript'; drop docs containing 'lorem ipsum' or '{'
    or keeping < 3 lines. Corpus text is single-line, so both sides wrap
    each doc in the same deterministic multi-line page (nav line, the doc
    sentence, a javascript notice, a too-short line, two closing
    sentences) and poison doc_id%13==0 with lorem ipsum and doc_id%17==3
    with a code line."""
    from ballet_ray.stages.text import c4_clean

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def wrap(t: pa.Table) -> pa.Table:
        txt = pc.cast(t.column("text"), pa.string())
        did = pc.cast(t.column("doc_id"), pa.string())
        base = pc.binary_join_element_wise(
            "Site Navigation Home About\n", txt, ".\n",
            "Please enable javascript to continue viewing this page.\n",
            "Short note.\n",
            "Document ", did, " closes with a well formed sentence.\n",
            "Every page deserves a proper closing sentence.", "")
        idn = t.column("doc_id").to_numpy(zero_copy_only=False)
        lorem = pa.array(np.where(
            idn % 13 == 0,
            "\nlorem ipsum dolor sit amet consectetur.", "").astype(object),
            pa.string())
        brace = pa.array(np.where(
            idn % 17 == 3, "\nfunction f() { return 1; }", "").astype(object),
            pa.string())
        page = pc.binary_join_element_wise(base, lorem, brace, "")
        return pa.table({"doc_id": t.column("doc_id"), "text": page})

    return c4_clean(ds.map_batches(wrap, batch_format="pyarrow"))


SQL_C4_CLEAN_DOCS = """
WITH page AS (
    SELECT doc_id,
           'Site Navigation Home About' || chr(10) ||
           text || '.' || chr(10) ||
           'Please enable javascript to continue viewing this page.' || chr(10) ||
           'Short note.' || chr(10) ||
           'Document ' || CAST(doc_id AS VARCHAR) ||
           ' closes with a well formed sentence.' || chr(10) ||
           'Every page deserves a proper closing sentence.' ||
           CASE WHEN doc_id % 13 = 0
                THEN chr(10) || 'lorem ipsum dolor sit amet consectetur.'
                ELSE '' END ||
           CASE WHEN doc_id % 17 = 3
                THEN chr(10) || 'function f() { return 1; }'
                ELSE '' END AS p
    FROM documents
), split AS (
    SELECT doc_id, p, string_split(p, chr(10)) AS ls FROM page
), kept AS (
    SELECT doc_id, p, len(ls) AS lines_in,
           list_filter(ls, l -> regexp_matches(l, '[.!?"”'']\\s*$')
               AND len(regexp_extract_all(l, '[A-Za-z0-9]+')) >= 5
               AND NOT contains(lower(l), 'javascript')) AS kl
    FROM split
)
SELECT doc_id, array_to_string(kl, chr(10)) AS text,
       lines_in, len(kl) AS lines_kept
FROM kept
WHERE len(kl) >= 3
  AND NOT contains(lower(p), 'lorem ipsum')
  AND NOT contains(p, '{')
"""


def q_approx_top_events(sf_dir: str):
    """Heavy hitters via mergeable Misra-Gries summaries (<= capacity rows
    shuffled per block); exact below capacity, so the event-type counts
    oracle exactly."""
    from ballet_ray.stages.sketches import approx_top_k

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
    return approx_top_k(ds, "event_type", k=5, capacity=64)


SQL_APPROX_TOP_EVENTS = """
SELECT event_type, COUNT(*) AS cnt
FROM events GROUP BY event_type
ORDER BY cnt DESC, event_type LIMIT 5
"""


def q_curriculum_index_docs(sf_dir: str):
    """Curriculum epoch ordering: three length tiers (short → long),
    hash-shuffled within each tier, materialized as a dense global index
    by the same counts-bin + one-shuffle machinery as shuffle_index."""
    from ballet_ray.stages.sampling import global_shuffle_index

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def tier(t: pa.Table) -> pa.Table:
        words = pc.count_substring_regex(t.column("text"), pattern="[A-Za-z0-9]+")
        w = words.to_numpy(zero_copy_only=False)
        b = np.where(w < 30, 0, np.where(w < 60, 1, 2)).astype(np.int64)
        return pa.table({"doc_id": t.column("doc_id"), "tier": pa.array(b)})

    tiered = ds.map_batches(tier, batch_format="pyarrow")
    out = global_shuffle_index(tiered, key_col="doc_id", bucket_col="tier", n_buckets=3, method="md5")
    return out.select_columns(["doc_id", "tier", "shuffle_idx"])


SQL_CURRICULUM_INDEX_DOCS = """
WITH t AS (
    SELECT doc_id,
           CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9]+')) < 30 THEN 0
                WHEN len(regexp_extract_all(text, '[A-Za-z0-9]+')) < 60 THEN 1
                ELSE 2 END AS tier
    FROM documents
)
SELECT doc_id, tier,
       ROW_NUMBER() OVER (ORDER BY tier, md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS shuffle_idx
FROM t
"""


def q_diversity_sample_embeddings(sf_dir: str):
    """Coreset selection: greedy k-center within k-means cells (~100
    exemplars spread over embedding space). Iterative farthest-point
    traversal is not SQL-expressible — rows-only; k-center coverage and
    partitioning-determinism are pytest-enforced (test_semantic_dedup)."""
    from ballet_ray.stages.similarity import diversity_sample

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return diversity_sample(
        emb, embedding_col="embedding", id_col="vec_id", dim=64, k=100,
        n_centroids=16, kmeans_iters=2,
    )


def q_corpus_divergence_docs(sf_dir: str):
    """Distribution-shift alarm between two corpus halves (even vs odd
    sources): KL both ways + Jensen-Shannon over smoothed unigram
    distributions. One vocab-keyed groupby per side; divergences computed
    on the vocab-sized joined table."""
    from ballet_ray.stages.text import corpus_divergence

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])

    def side(t: pa.Table, parity: int) -> pa.Table:
        num = pc.cast(pc.utf8_slice_codeunits(t.column("source"), 3, 99), pa.int64())
        return t.filter(pc.equal(pc.bit_wise_and(num, 1), parity))

    a = ds.map_batches(lambda t: side(t, 0), batch_format="pyarrow")
    b = ds.map_batches(lambda t: side(t, 1), batch_format="pyarrow")
    out = corpus_divergence(a, b, alpha=0.5)
    return _round_cols(rd.from_arrow(out), {"kl_ab": 6, "kl_ba": 6, "js": 6})


SQL_CORPUS_DIVERGENCE_DOCS = """
WITH words AS (
    SELECT CAST(substr(source, 4) AS INT) % 2 AS side, w
    FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
), cnt AS (
    SELECT side, w, COUNT(*) AS c FROM words GROUP BY side, w
), vocab AS (SELECT DISTINCT w FROM cnt),
sm AS (
    SELECT v.w,
           COALESCE(a.c, 0) + 0.5 AS xa,
           COALESCE(b.c, 0) + 0.5 AS xb
    FROM vocab v
    LEFT JOIN (SELECT w, c FROM cnt WHERE side = 0) a USING (w)
    LEFT JOIN (SELECT w, c FROM cnt WHERE side = 1) b USING (w)
), p AS (
    SELECT w, xa / SUM(xa) OVER () AS pa, xb / SUM(xb) OVER () AS pb FROM sm
)
SELECT ROUND(SUM(pa * ln(pa / pb)), 6) AS kl_ab,
       ROUND(SUM(pb * ln(pb / pa)), 6) AS kl_ba,
       ROUND(0.5 * SUM(pa * ln(pa / ((pa + pb) / 2))) + 0.5 * SUM(pb * ln(pb / ((pa + pb) / 2))), 6) AS js
FROM p
"""


def q_ewm_events(sf_dir: str):
    """Per-user exponentially weighted mean of event values (alpha=0.1,
    pandas adjust=False semantics) — renormalized closed-form scan, one
    keyed co-partition pass."""
    from ballet_ray.stages.windows import EwmMean

    ds = _events(sf_dir)
    pipe = FeatureEngineeringPipeline(
        [Feature("value", EwmMean(0.1, key="user_id", order_by=("ts", "event_id")))]
    )
    out = pipe.fit_transform(ds).select_columns(["event_id", "user_id", "value_ewm"])
    return _round_cols(out, {"value_ewm": 6})


SQL_EWM_EVENTS = """
WITH e AS (
    SELECT event_id, user_id, value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
)
SELECT a.event_id, a.user_id,
       ROUND(SUM(CASE WHEN b.rn = 1 THEN pow(0.9, a.rn - 1)
                      ELSE 0.1 * pow(0.9, a.rn - b.rn) END * b.value), 6) AS value_ewm
FROM e a JOIN e b ON a.user_id = b.user_id AND b.rn <= a.rn
GROUP BY a.event_id, a.user_id
"""


def q_hopping_window_events(sf_dir: str):
    """Hopping (sliding) window aggregate: 2-hour windows every 30
    minutes. Each event explodes into its ceil(size/step)=4 windows
    inside map_batches (pure arithmetic, no per-row Python), then ONE
    window-keyed groupby — the streaming-window shape tumbling can't
    express."""
    from ray.data.aggregate import Count, Sum

    ds = _events(sf_dir)
    SIZE = 7_200_000_000  # 2h in µs
    STEP = 1_800_000_000  # 30min

    def explode(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False)
        nwin = SIZE // STEP
        base = (ts // STEP) * STEP
        starts = base[:, None] - np.arange(nwin, dtype=np.int64)[None, :] * STEP
        keep = ts[:, None] < starts + SIZE  # always true here, kept for generality
        idx, k = np.nonzero(keep)
        return pa.table(
            {
                "w_start": pa.array(starts[idx, k]),
                "value": pa.array(v[idx]),
            }
        )

    agg = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("w_start")
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )
    out = _cast_cols(agg, {"w_start": pa.timestamp("us")})
    return _round_cols(out, {"sum_value": 4})


SQL_HOPPING_WINDOW_EVENTS = """
SELECT make_timestamp(s) AS w_start, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM (
    SELECT value,
           UNNEST([(epoch_us(ts) // 1800000000) * 1800000000 - k * 1800000000
                   FOR k IN range(0, 4)]) AS s
    FROM events
)
GROUP BY s
"""


def q_window_distinct_users(sf_dir: str):
    """Windowed cardinality: approximate distinct users per 1-day tumbling
    window via mergeable KMV sketches (exact below capacity → oracled).
    The composition a streaming dashboard runs: window bucketing in
    map_batches + per-group sketch merge."""
    from ballet_ray.stages.sketches import approx_distinct_per_group

    ds = _events(sf_dir)
    DAY = 86_400_000_000

    def daywin(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {"w_day": pa.array((ts // DAY) * DAY), "user_id": t.column("user_id")}
        )

    out = approx_distinct_per_group(
        ds.map_batches(daywin, batch_format="pyarrow"), "user_id", "w_day", k=2048
    )
    out["w_day"] = pd.to_datetime(out["w_day"], unit="us")
    return out


SQL_WINDOW_DISTINCT_USERS = """
SELECT make_timestamp((epoch_us(ts) // 86400000000) * 86400000000) AS w_day,
       CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS approx_nd
FROM events GROUP BY 1
"""


def q_corr_matrix_lineitem(sf_dir: str):
    """Pairwise Pearson correlation matrix from ONE tree-reduced moments
    pass (shared with the PCA fit) — the feature-selection screen over a
    wide numeric frame."""
    from ballet_ray.stages.decomposition import correlation_matrix

    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)
    # away-from-zero rounding via _round_cols (SQL ROUND parity)
    return _round_cols(correlation_matrix(ds, cols), {"corr": 6})


SQL_CORR_MATRIX_LINEITEM = """
SELECT 'l_quantity' AS col_a, 'l_quantity' AS col_b, ROUND(corr(l_quantity, l_quantity), 6) AS corr FROM lineitem
UNION ALL
SELECT 'l_quantity', 'l_extendedprice', ROUND(corr(l_quantity, l_extendedprice), 6) FROM lineitem
UNION ALL
SELECT 'l_quantity', 'l_discount', ROUND(corr(l_quantity, l_discount), 6) FROM lineitem
UNION ALL
SELECT 'l_extendedprice', 'l_extendedprice', ROUND(corr(l_extendedprice, l_extendedprice), 6) FROM lineitem
UNION ALL
SELECT 'l_extendedprice', 'l_discount', ROUND(corr(l_extendedprice, l_discount), 6) FROM lineitem
UNION ALL
SELECT 'l_discount', 'l_discount', ROUND(corr(l_discount, l_discount), 6) FROM lineitem
"""


def q_vocab_top_docs(sf_dir: str):
    """Corpus vocabulary build: global word frequencies, top 50.
    Scale shape: per-batch partial counts (one split + value_counts per
    block) → one small vocab-keyed groupby sum → sort+limit on the tiny
    result. The doc payload never shuffles."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(t.column("text"), " "))
        vc = pc.value_counts(words)
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({"w": vc.field("values"), "cnt": pc.cast(vc.field("counts"), pa.int64())})

    counts = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("w")
        .sum("cnt")
        .rename_columns({"sum(cnt)": "cnt"})
    )
    out = counts.sort(["cnt", "w"], descending=[True, False]).limit(50)
    return out


SQL_VOCAB_TOP_DOCS = """
SELECT w, COUNT(*) AS cnt
FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
GROUP BY w
ORDER BY cnt DESC, w
LIMIT 50
"""


def q_semantic_decontam_embeddings(sf_dir: str):
    """Embedding-space benchmark decontamination (the semantic complement
    of the n-gram PaLM rule): corpus = embeddings ∪ exact clones of the
    3-vector eval set (vec_id + 100000); rows whose max cosine against
    any eval vector >= 0.99 are dropped — exactly the eval originals and
    their clones (same planting pattern as semantic_dedup_embeddings:
    identical vectors have cosine 1, random 64-d pairs are far below the
    threshold on BOTH engines). Eval matrix broadcast once; one GEMM per
    batch, map-only."""
    from ballet_ray.stages.similarity import semantic_decontaminate

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qdf = qdf[qdf["vec_id"] < 3].sort_values("vec_id")
    ev = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)

    def clone(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("vec_id"), pa.scalar(3)))
        return pa.table({"vec_id": pc.add(t.column("vec_id"), pa.scalar(100000)),
                         "embedding": t.column("embedding")})

    corpus = emb.union(emb.map_batches(clone, batch_format="pyarrow"))
    out = semantic_decontaminate(corpus, ev, embedding_col="embedding", threshold=0.99)
    return out.select_columns(["vec_id"])


SQL_SEMANTIC_DECONTAM_EMBEDDINGS = """
WITH ev AS (SELECT embedding FROM embeddings WHERE vec_id < 3),
corpus AS (
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id < 3
)
SELECT c.vec_id FROM corpus c
WHERE (SELECT MAX(list_cosine_similarity(c.embedding, e.embedding)) FROM ev e) < 0.99
"""


# ORDER IS THE CERTIFICATION INTERFACE: the round driver snapshots only the
# FIRST 50 entries of this dict into CORRECTNESS_r{N}.json (insertion order).
# Rounds 2-4 certified the same leading 50; the 46 queries added since are
# therefore listed FIRST so round 5 records them. The long-certified 50
# follow (they keep pytest + tools/check_oracles.py full-sweep coverage).
QUERIES = {
    "exact_dedup_best_events": q_exact_dedup_best_events,
    "unimax_mixture_docs": q_unimax_mixture_docs,
    "kn_logprob_docs": q_kn_logprob_docs,
    "token_contamination_docs": q_token_contamination_docs,
    "fim_transform_docs": q_fim_transform_docs,
    "vocab_prune_docs": q_vocab_prune_docs,
    "prefix_lm_docs": q_prefix_lm_docs,
    "strip_html_docs": q_strip_html_docs,
    "dedup_lines_docs": q_dedup_lines_docs,
    "normalize_text_docs": q_normalize_text_docs,
    "image_near_dup_docs": q_image_near_dup_docs,
    "poly_lineitem": q_poly_lineitem,
    "fourier_events": q_fourier_events,
    "rare_label_docs": q_rare_label_docs,
    "outlier_trim_orders": q_outlier_trim_orders,
    "math_combo_lineitem": q_math_combo_lineitem,
    "ts_features_events": q_ts_features_events,
    "dfs_customer_orders": q_dfs_customer_orders,
    "dtree_disc_orders": q_dtree_disc_orders,
    "dtree_encode_priority": q_dtree_encode_priority,
    "glmm_encode_priority": q_glmm_encode_priority,
    "chunk_docs": q_chunk_docs,
    "pack_docs": q_pack_docs,
    "hash_split_docs": q_hash_split_docs,
    "redact_docs": q_redact_docs,
    "vocab_top_docs": q_vocab_top_docs,
    "semantic_dedup_embeddings": q_semantic_dedup_embeddings,
    "pca_embeddings": q_pca_embeddings,
    "logreg_quality_docs": q_logreg_quality_docs,
    "stratified_sample_docs": q_stratified_sample_docs,
    "mixture_sample_docs": q_mixture_sample_docs,
    "percent_rank_orders": q_percent_rank_orders,
    "corr_matrix_lineitem": q_corr_matrix_lineitem,
    "duplicate_passages_docs": q_duplicate_passages_docs,
    "remove_spans_docs": q_remove_spans_docs,
    "bm25_top_terms_docs": q_bm25_top_terms_docs,
    "contamination_docs": q_contamination_docs,
    "shuffle_index_docs": q_shuffle_index_docs,
    "gopher_filter_docs": q_gopher_filter_docs,
    "approx_top_events": q_approx_top_events,
    "curriculum_index_docs": q_curriculum_index_docs,
    "diversity_sample_embeddings": q_diversity_sample_embeddings,
    "corpus_divergence_docs": q_corpus_divergence_docs,
    "ewm_events": q_ewm_events,
    "hopping_window_events": q_hopping_window_events,
    "window_distinct_users": q_window_distinct_users,
    "window_join_events": q_window_join_events,
    "dsir_logw_docs": q_dsir_logw_docs,
    "bigram_logprob_docs": q_bigram_logprob_docs,
    # --- added after the 50-entry driver snapshot filled (round 5);
    # covered by tools/check_oracles.py + pytest ---
    "canonicalize_url_docs": q_canonicalize_url_docs,
    "warc_pipeline_docs": q_warc_pipeline_docs,
    "domain_filter_docs": q_domain_filter_docs,
    "c4_clean_docs": q_c4_clean_docs,
    "gopher_signals_docs": q_gopher_signals_docs,
    "token_seq_dedup_docs": q_token_seq_dedup_docs,
    "token_near_dedup_docs": q_token_near_dedup_docs,
    "pii_signals_docs": q_pii_signals_docs,
    "ppl_bucket_docs": q_ppl_bucket_docs,
    # --- long-certified in rounds 2-4 (full coverage via check_oracles) ---
    # --- family variants demoted past the driver's 50-entry snapshot cap
    # --- (sibling query of each family holds the certification slot) ---
    "split_sentences_docs": q_split_sentences_docs,
    "dedup_sentences_docs": q_dedup_sentences_docs,
    "bpe_tokenize_docs": q_bpe_tokenize_docs,        # rows-only: tokenizer
    "unigram_tokenize_docs": q_unigram_tokenize_docs,  # fits aren't SQL
    "wordpiece_tokenize_docs": q_wordpiece_tokenize_docs,  # rows-only
    "diff_events": q_diff_events,
    "sum_encode_lang": q_sum_encode_lang,
    "catboost_encode_priority": q_catboost_encode_priority,
    "cumsum_events": q_cumsum_events,
    "dfs_two_hop_customer": q_dfs_two_hop_customer,
    "ts_features_full_events": q_ts_features_full_events,
    "token_duplicate_passages_docs": q_token_duplicate_passages_docs,
    "dsir_resample_docs": q_dsir_resample_docs,
    "tpch_q1": q_tpch_q1,
    "topk_orders": q_topk_orders,
    "revenue_by_nation": q_revenue_by_nation,
    "lag_lead_events": q_lag_lead_events,
    "rolling_mean_events": q_rolling_mean_events,
    "sessionize_events": q_sessionize_events,
    "ffill_events": q_ffill_events,
    "asof_click_purchase": q_asof_click_purchase,
    "tumbling_window_events": q_tumbling_window_events,
    "standardize_docs": q_standardize_docs,
    "count_encode_lang": q_count_encode_lang,
    "ordinal_encode_lang": q_ordinal_encode_lang,
    "minmax_orders": q_minmax_orders,
    "target_encode_priority": q_target_encode_priority,
    "value_replace_discount": q_value_replace_discount,
    "null_indicator_events": q_null_indicator_events,
    "kbins_orders": q_kbins_orders,
    "winsorize_orders": q_winsorize_orders,
    "token_count_docs": q_token_count_docs,
    "fingerprint_docs": q_fingerprint_docs,
    "quality_docs": q_quality_docs,
    "word_repetition_docs": q_word_repetition_docs,
    "tfidf_top_terms_docs": q_tfidf_top_terms_docs,
    "unigram_logprob_docs": q_unigram_logprob_docs,
    "ngram_repetition_docs": q_ngram_repetition_docs,
    "exact_dedup_docs": q_exact_dedup_docs,
    "distinct_lang_counts": q_distinct_lang_counts,
    "knn_embeddings": q_knn_embeddings,
    "cumcount_events": q_cumcount_events,
    "rolling_time_events": q_rolling_time_events,
    "backfill_grid": q_backfill_grid,
    "topk_per_group": q_topk_per_group,
    "semi_join_lineitems": q_semi_join_lineitems,
    "distinct_users_per_type": q_distinct_users_per_type,
    "grouped_minmax_broadcast": q_grouped_minmax_broadcast,
    "minhash_dedup_docs": q_minhash_dedup_docs,
    "simhash_docs": q_simhash_docs,
    "langid_docs": q_langid_docs,
    "embedding_near_dups": q_embedding_near_dups,
    "minhash_cluster_dedup_docs": q_minhash_cluster_dedup_docs,
    "streaming_session_events": q_streaming_session_events,
    "approx_distinct_users": q_approx_distinct_users,
    "approx_quantiles_orders": q_approx_quantiles_orders,
    "ivf_knn_embeddings": q_ivf_knn_embeddings,
    "binary_encode_lang": q_binary_encode_lang,
    "woe_encode_orders": q_woe_encode_orders,
    "mestimate_encode_priority": q_mestimate_encode_priority,
    "loo_encode_priority": q_loo_encode_priority,
    "jamesstein_encode_priority": q_jamesstein_encode_priority,
    "normalize_lineitem": q_normalize_lineitem,
    "bytebpe_tokenize_docs": q_bytebpe_tokenize_docs,  # rows-only: tokenizer
    "span_corruption_docs": q_span_corruption_docs,    # rows-only: splitmix math
    "semantic_decontam_embeddings": q_semantic_decontam_embeddings,
}

ORACLE_SQL = {
    "strip_html_docs": SQL_STRIP_HTML_DOCS,
    "dedup_lines_docs": SQL_DEDUP_LINES_DOCS,
    "normalize_text_docs": SQL_NORMALIZE_TEXT_DOCS,
    "image_near_dup_docs": SQL_IMAGE_NEAR_DUPS,
    "tpch_q1": SQL_TPCH_Q1,
    "topk_orders": SQL_TOPK_ORDERS,
    "revenue_by_nation": SQL_REVENUE_BY_NATION,
    "lag_lead_events": SQL_LAG_LEAD_EVENTS,
    "rolling_mean_events": SQL_ROLLING_MEAN_EVENTS,
    "sessionize_events": SQL_SESSIONIZE_EVENTS,
    "ffill_events": SQL_FFILL_EVENTS,
    "asof_click_purchase": SQL_ASOF_CLICK_PURCHASE,
    "tumbling_window_events": SQL_TUMBLING_WINDOW_EVENTS,
    "standardize_docs": SQL_STANDARDIZE_DOCS,
    "count_encode_lang": SQL_COUNT_ENCODE_LANG,
    "ordinal_encode_lang": SQL_ORDINAL_ENCODE_LANG,
    "minmax_orders": SQL_MINMAX_ORDERS,
    "target_encode_priority": SQL_TARGET_ENCODE_PRIORITY,
    "value_replace_discount": SQL_VALUE_REPLACE_DISCOUNT,
    "null_indicator_events": SQL_NULL_INDICATOR_EVENTS,
    "kbins_orders": SQL_KBINS_ORDERS,
    "winsorize_orders": SQL_WINSORIZE_ORDERS,
    "token_count_docs": SQL_TOKEN_COUNT_DOCS,
    "fingerprint_docs": SQL_FINGERPRINT_DOCS,
    "quality_docs": SQL_QUALITY_DOCS,
    "word_repetition_docs": SQL_WORD_REPETITION_DOCS,
    "tfidf_top_terms_docs": SQL_TFIDF_TOP_TERMS_DOCS,
    "unigram_logprob_docs": SQL_UNIGRAM_LOGPROB_DOCS,
    "ngram_repetition_docs": SQL_NGRAM_REPETITION_DOCS,
    "exact_dedup_docs": SQL_EXACT_DEDUP_DOCS,
    "exact_dedup_best_events": SQL_EXACT_DEDUP_BEST_EVENTS,
    "unimax_mixture_docs": SQL_UNIMAX_MIXTURE_DOCS,
    "distinct_lang_counts": SQL_DISTINCT_LANG_COUNTS,
    "knn_embeddings": SQL_KNN_EMBEDDINGS,
    "cumcount_events": SQL_CUMCOUNT_EVENTS,
    "rolling_time_events": SQL_ROLLING_TIME_EVENTS,
    "backfill_grid": SQL_BACKFILL_GRID,
    "topk_per_group": SQL_TOPK_PER_GROUP,
    "semi_join_lineitems": SQL_SEMI_JOIN_LINEITEMS,
    "distinct_users_per_type": SQL_DISTINCT_USERS_PER_TYPE,
    "grouped_minmax_broadcast": SQL_GROUPED_MINMAX_BROADCAST,
    "langid_docs": _langid_sql(),
    "streaming_session_events": SQL_STREAMING_SESSION_EVENTS,
    "approx_distinct_users": SQL_APPROX_DISTINCT_USERS,
    "approx_quantiles_orders": SQL_APPROX_QUANTILES_ORDERS,
    "ivf_knn_embeddings": SQL_IVF_KNN_EMBEDDINGS,
    "binary_encode_lang": SQL_BINARY_ENCODE_LANG,
    "woe_encode_orders": SQL_WOE_ENCODE_ORDERS,
    "mestimate_encode_priority": SQL_MESTIMATE_ENCODE_PRIORITY,
    "loo_encode_priority": SQL_LOO_ENCODE_PRIORITY,
    "jamesstein_encode_priority": SQL_JAMESSTEIN_ENCODE_PRIORITY,
    "normalize_lineitem": SQL_NORMALIZE_LINEITEM,
    "poly_lineitem": SQL_POLY_LINEITEM,
    "fourier_events": SQL_FOURIER_EVENTS,
    "diff_events": SQL_DIFF_EVENTS,
    "rare_label_docs": SQL_RARE_LABEL_DOCS,
    "outlier_trim_orders": SQL_OUTLIER_TRIM_ORDERS,
    "math_combo_lineitem": SQL_MATH_COMBO_LINEITEM,
    "sum_encode_lang": SQL_SUM_ENCODE_LANG,
    "catboost_encode_priority": SQL_CATBOOST_ENCODE_PRIORITY,
    "cumsum_events": SQL_CUMSUM_EVENTS,
    "embedding_near_dups": SQL_EMBEDDING_NEAR_DUPS,
    "ts_features_events": SQL_TS_FEATURES_EVENTS,
    "dfs_customer_orders": SQL_DFS_CUSTOMER_ORDERS,
    "dfs_two_hop_customer": SQL_DFS_TWO_HOP_CUSTOMER,
    "dtree_disc_orders": SQL_DTREE_DISC_ORDERS,
    "dtree_encode_priority": SQL_DTREE_ENCODE_PRIORITY,
    "glmm_encode_priority": SQL_GLMM_ENCODE_PRIORITY,
    "ts_features_full_events": SQL_TS_FEATURES_FULL_EVENTS,
    "chunk_docs": SQL_CHUNK_DOCS,
    "hash_split_docs": SQL_HASH_SPLIT_DOCS,
    "redact_docs": SQL_REDACT_DOCS,
    "vocab_top_docs": SQL_VOCAB_TOP_DOCS,
    "semantic_dedup_embeddings": SQL_SEMANTIC_DEDUP_EMBEDDINGS,
    "stratified_sample_docs": SQL_STRATIFIED_SAMPLE_DOCS,
    "mixture_sample_docs": SQL_MIXTURE_SAMPLE_DOCS,
    "percent_rank_orders": SQL_PERCENT_RANK_ORDERS,
    "corr_matrix_lineitem": SQL_CORR_MATRIX_LINEITEM,
    "duplicate_passages_docs": SQL_DUPLICATE_PASSAGES_DOCS,
    "remove_spans_docs": SQL_REMOVE_SPANS_DOCS,
    "bm25_top_terms_docs": SQL_BM25_TOP_TERMS_DOCS,
    "contamination_docs": SQL_CONTAMINATION_DOCS,
    "shuffle_index_docs": SQL_SHUFFLE_INDEX_DOCS,
    "gopher_filter_docs": SQL_GOPHER_FILTER_DOCS,
    "approx_top_events": SQL_APPROX_TOP_EVENTS,
    "curriculum_index_docs": SQL_CURRICULUM_INDEX_DOCS,
    "corpus_divergence_docs": SQL_CORPUS_DIVERGENCE_DOCS,
    "ewm_events": SQL_EWM_EVENTS,
    "hopping_window_events": SQL_HOPPING_WINDOW_EVENTS,
    "window_distinct_users": SQL_WINDOW_DISTINCT_USERS,
    "window_join_events": SQL_WINDOW_JOIN_EVENTS,
    "dsir_logw_docs": SQL_DSIR_LOGW_DOCS,
    "dsir_resample_docs": SQL_DSIR_RESAMPLE_DOCS,
    "bigram_logprob_docs": SQL_BIGRAM_LOGPROB_DOCS,
    "kn_logprob_docs": SQL_KN_LOGPROB_DOCS,
    "canonicalize_url_docs": SQL_CANONICALIZE_URL_DOCS,
    "warc_pipeline_docs": SQL_WARC_PIPELINE_DOCS,
    "domain_filter_docs": SQL_DOMAIN_FILTER_DOCS,
    "c4_clean_docs": SQL_C4_CLEAN_DOCS,
    "gopher_signals_docs": SQL_GOPHER_SIGNALS_DOCS,
    "token_seq_dedup_docs": SQL_TOKEN_SEQ_DEDUP_DOCS,
    "pii_signals_docs": SQL_PII_SIGNALS_DOCS,
    "split_sentences_docs": SQL_SPLIT_SENTENCES_DOCS,
    "dedup_sentences_docs": SQL_DEDUP_SENTENCES_DOCS,
    "ppl_bucket_docs": SQL_PPL_BUCKET_DOCS,
    "token_contamination_docs": SQL_TOKEN_CONTAMINATION_DOCS,
    "fim_transform_docs": SQL_FIM_TRANSFORM_DOCS,
    "vocab_prune_docs": SQL_VOCAB_PRUNE_DOCS,
    "prefix_lm_docs": SQL_PREFIX_LM_DOCS,
    "semantic_decontam_embeddings": SQL_SEMANTIC_DECONTAM_EMBEDDINGS,
}
