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


def _fmt(v) -> str:
    """Per-value stringification mirroring the driver's value hash: a
    float64 7949.0 and an int64 7949 must stay DISTINCT ('7949.0' vs
    '7949'), so a dtype artifact in either side can never pass locally
    and fail the driver's strict hash."""
    import numpy as np
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NULL" if f != f else repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass   # arrays/lists in cells: not a scalar NA
    return str(v)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Dtype-STRICT canonical form: columns sorted by name, every cell
    stringified with float formatting preserved, rows sorted."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_fmt)
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
            diff = (got != want).any(axis=0)
            bad = [c for c in got.columns if diff[c]]
            for c in bad[:3]:
                i = int((got[c] != want[c]).idxmax())
                print(f"FAIL {name}: col {c!r} row {i}: "
                      f"got {got[c][i]!r} want {want[c][i]!r}")
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
