"""Query-battery conformance at sf0.001: every oracle-backed queries() entry
must match its DuckDB oracle (row count + columns + order-insensitive values)
— a local mirror of the driver's correctness gate."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def entry_mod():
    import __ray_entry__ as e
    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def test_all_oracle_queries_match(entry_mod, con):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    failures = []
    for name, sql in oracles.items():
        got = _canon(_to_pandas(qs[name](SF)))
        want = _canon(con.sql(sql).df())
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        except AssertionError as ex:
            failures.append((name, str(ex).splitlines()[0]))
    assert not failures, failures


def test_rows_only_queries_run(entry_mod):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    for name in set(qs) - set(oracles):
        got = _to_pandas(qs[name](SF))
        assert len(got) >= 0 and len(got.columns) > 0, name


def test_entry_smoke(entry_mod):
    res = entry_mod.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert "event_type" in df.columns and "n_keys" in df.columns


def test_registry_consistency():
    """Every oracle has a query, every bench-battery name resolves, and no
    rows-only query accidentally shadows an oracle-backed one — the typo
    class that silently drops an entry from the driver's gate."""
    import importlib.util
    import os

    from oregonwaterdataportal_etl_ray.pipelines.queries import (
        ORACLE_SQL, QUERIES)

    assert set(ORACLE_SQL) <= set(QUERIES)
    assert len(QUERIES) >= 86 and len(ORACLE_SQL) >= 71

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    missing = [n for n in bench.BATTERY if n not in QUERIES]
    assert missing == [], missing
