"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf_dir and compare with its oracle_sql() via DuckDB —
row count, column set, and order-insensitive value comparison.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    try:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            return res.to_pandas()
    except ImportError:
        pass
    return res.to_pandas()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if len(got) != len(exp):
        problems.append(f"rows {len(got)} != {len(exp)}")
    if sorted(got.columns) != sorted(exp.columns):
        problems.append(f"cols {sorted(got.columns)} != {sorted(exp.columns)}")
        return problems
    g, e = canon(got), canon(exp)
    if len(g) == len(e):
        for c in g.columns:
            if pd.api.types.is_float_dtype(g[c]):
                ok = np.allclose(g[c].to_numpy(), e[c].to_numpy(), equal_nan=True, atol=1e-9)
            else:
                ok = (g[c].fillna("<null>").to_numpy() == e[c].fillna("<null>").to_numpy()).all()
            if not ok:
                bad = (
                    ~np.isclose(g[c].to_numpy(), e[c].to_numpy(), equal_nan=True)
                    if pd.api.types.is_float_dtype(g[c])
                    else g[c].fillna("<null>").to_numpy() != e[c].fillna("<null>").to_numpy()
                )
                problems.append(f"col {c}: {bad.sum()} mismatches, e.g. got={g[c][bad].head(3).tolist()} exp={e[c][bad].head(3).tolist()}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs, sqls = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"rows-only {name}: {len(got)} rows  ({dt:.1f}s)")
            n_pass += 1
            continue
        exp = con.sql(sqls[name]).df()
        problems = compare(name, got, exp)
        if problems:
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows  ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
