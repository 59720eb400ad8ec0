"""Local mimic of the driver's correctness gate: run every queries() entry at
sf0.01 and compare to oracle_sql() via DuckDB (row count + column names +
order-insensitive values). Usage: python scripts/check_queries.py [sf_dir] [names...]"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    # pa.Table and ray Dataset both expose .to_pandas()
    return res if isinstance(res, pd.DataFrame) else res.to_pandas()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 8)),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e
    qs, oracles = e.queries(), e.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got)} rows, cols={list(got.columns)} [{dt:.1f}s]")
            n_pass += 1
            continue
        try:
            want = canon(con.sql(oracles[name]).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {ex}")
            n_fail += 1
            continue
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        ok_vals = ok_rows and ok_cols and got.equals(want)
        if not ok_vals and ok_rows and ok_cols:
            # tolerate dtype-level mismatch (int32 vs int64 etc.)
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              check_exact=True)
                ok_vals = True
            except AssertionError as ex:
                detail = str(ex).splitlines()[:6]
                print(f"FAIL {name}: value mismatch: {detail}")
        if ok_vals:
            print(f"PASS {name}: {len(got)} rows [{dt:.1f}s]")
            n_pass += 1
        else:
            if not ok_rows:
                print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            elif not ok_cols:
                print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
