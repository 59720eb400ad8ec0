"""Live-connector integration: count -> offset pages -> CachedFetchStage ->
parse -> batch parquet -> CdcEngine replay, end to end against the oracle
(the reference's ESRI pagination shape, userCode/groundwater/wells.py:287-344)."""

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray

from oregonwaterdataportal_etl_ray.cdc.engine import CdcEngine
from oregonwaterdataportal_etl_ray.cdc.oracle import oracle_replay
from oregonwaterdataportal_etl_ray.sources.paginated import (
    build_page_specs, paginated_dataset)

N_EVENTS = 500
PAGE = 64


def _upstream_records() -> list[dict]:
    """Deterministic fake upstream: change events for 40 (repo, path) keys,
    ~20% updates, a few deletes (content=None), LSN embedded in the commit
    string the way the engine derives it."""
    recs = []
    for lsn in range(1, N_EVENTS + 1):
        key = (lsn * 7919) % 40
        deleted = lsn % 37 == 0
        recs.append({
            "repo": f"org{key % 5}/repo-{key}",
            "path": f"src/mod_{key}.py",
            "commit": f"{lsn:012d}-{(lsn * 2654435761) % (1 << 32):08x}",
            "lang": "py",
            "content": None if deleted else f"content|{key}|v{lsn}",
        })
    return recs


def _make_fetch_pages():
    """The pluggable connector (an HTTP client closure in deployment): parse
    offset/limit out of the page key, serve that slice as a JSON page.

    Built as a CLOSURE capturing the record list so cloudpickle ships it by
    value — a module-level test function would be pickled by reference to
    'test_paginated', which Ray workers cannot import."""
    recs = _upstream_records()

    def fetch(keys):
        out = []
        for k in keys:
            params = dict(p.split("=") for p in k.split("&"))
            lo = int(params["offset"])
            hi = lo + int(params["limit"])
            out.append(json.dumps({"features": recs[lo:hi]}).encode())
        return out
    return fetch


def test_build_page_specs_mirrors_reference_loop():
    specs = build_page_specs(130, 50, base_key="q?")
    assert [s["offset"] for s in specs] == [0, 50, 100]
    assert specs[0]["page_key"] == "q?offset=0&limit=50"
    with pytest.raises(ValueError):
        build_page_specs(-1, 50)


def test_paginated_fetch_through_cdc_engine(ray_session, tmp_path):
    fetch_pages = _make_fetch_pages()
    ds = paginated_dataset(
        count_fn=lambda: N_EVENTS,     # the returnCountOnly call
        fetch_fn=fetch_pages,
        page_size=PAGE,
        ttl_s=3600,
        concurrency=(1, 2))
    # NOTE: the streaming executor does NOT guarantee block delivery order
    # (preserve_order is off by default), so sort by commit before treating
    # this as an ordered batch file — exactly what a live connector must do
    got = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")),
                           promote_options="permissive")
    got = got.sort_by([("commit", "ascending")])
    assert got.num_rows == N_EVENTS
    assert got["commit"][0].as_py().startswith("000000000001")

    # one ordered batch file -> the engine's normal replay path
    batch_file = os.path.join(tmp_path, "batch-0000.parquet")
    pq.write_table(got.select(["repo", "path", "commit", "lang", "content"]),
                   batch_file)
    eng = CdcEngine(os.path.join(tmp_path, "state"), num_buckets=8)
    eng.replay([batch_file], epoch_size=1)
    final = eng.final_dataset(with_sha=True).to_pandas() \
               .sort_values(["repo", "path"]).reset_index(drop=True)
    ora = oracle_replay([batch_file])
    assert len(final) == len(ora)
    assert (final["sha256"].values == ora["sha256"].values).all()
    assert (final["lsn"].values == ora["lsn"].values).all()

    # live refresh: force_fetch bypasses the cache (the reference's weekly
    # bypass) and converges to the same state on re-replay (idempotent)
    ds2 = paginated_dataset(lambda: N_EVENTS, fetch_pages, PAGE,
                            force_fetch=True, concurrency=(1, 2))
    assert ds2.count() == N_EVENTS
    eng.replay([batch_file], epoch_size=1)
    again = eng.final_dataset(with_sha=True).to_pandas() \
               .sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        final[["repo", "path", "sha256", "lsn"]],
        again[["repo", "path", "sha256", "lsn"]])


def test_all_empty_page_batch_schema(ray_session):
    """Pages that ALL parse to zero records (upstream count over-reports a
    whole trailing page): with a declared schema the batch becomes a TYPED
    empty block (no 0-column schema-mismatched blocks in the stream);
    without one the parse task fails loud and asks for schema= instead of
    silently corrupting the Dataset's block schemas."""
    schema = pa.schema([("repo", pa.string()), ("path", pa.string()),
                       ("commit", pa.string()), ("lang", pa.string()),
                       ("content", pa.string())])
    recs = _upstream_records()

    def fetch_overcount(keys):
        out = []
        for k in keys:
            params = dict(p.split("=") for p in k.split("&"))
            lo = int(params["offset"])
            hi = lo + int(params["limit"])
            out.append(json.dumps({"features": recs[lo:hi]}).encode())
        return out

    # count over-reports by 2 whole pages -> trailing pages parse empty
    over = N_EVENTS + 2 * PAGE
    ds = paginated_dataset(lambda: over, fetch_overcount, PAGE, schema=schema)
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")),
                         promote_options="none")   # raises on schema drift
    assert t.num_rows == N_EVENTS
    assert t.schema.names == schema.names

    ds2 = paginated_dataset(lambda: over, fetch_overcount, PAGE)
    with pytest.raises(Exception, match="schema"):
        ds2.materialize()


def test_retrying_fetch_backs_off_then_succeeds_and_fails_loud():
    """The worked live-connector shape: a transiently failing endpoint is
    retried on the policy's schedule and succeeds; attempts exhausted
    re-raises with the key named; non-retryable errors propagate at once."""
    import pytest

    from oregonwaterdataportal_etl_ray.sources.paginated import (
        RetryPolicy, retrying_fetch)

    calls = {"n": 0}

    def flaky(key):
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("transient")
        return f"ok:{key}".encode()

    fast = RetryPolicy(max_attempts=4, base_delay_s=0.001, multiplier=2.0)
    fetch = retrying_fetch(flaky, policy=fast)
    assert fetch(["a"]) == [b"ok:a"]
    assert calls["n"] == 3                      # 2 failures + 1 success

    def dead(key):
        raise TimeoutError("down")

    with pytest.raises(RuntimeError, match="'p9'.*4 attempts"):
        retrying_fetch(dead, policy=fast)(["p9"])

    def broken(key):
        raise ValueError("bad request")         # NOT retryable

    with pytest.raises(ValueError, match="bad request"):
        retrying_fetch(broken, policy=fast)(["x"])


def test_rate_limiter_spaces_acquisitions():
    import time as _t

    from oregonwaterdataportal_etl_ray.sources.paginated import RateLimiter

    rl = RateLimiter(rate_per_s=200, burst=1)
    t0 = _t.monotonic()
    for _ in range(11):
        rl.acquire()
    # 10 post-burst acquisitions at 200/s >= ~50 ms of enforced spacing
    assert _t.monotonic() - t0 >= 0.045


def test_retrying_fetch_composes_with_paginated_dataset(ray_session):
    """End-to-end: retry wrapper + shared L2 cache through the full
    count -> pages -> fetch -> parse connector."""
    import json as _json

    import ray

    from oregonwaterdataportal_etl_ray.sources.paginated import (
        RetryPolicy, paginated_dataset, retrying_fetch)
    from oregonwaterdataportal_etl_ray.stages.cache import shared_cache

    recs = [{"id": i, "v": f"r{i}"} for i in range(40)]
    schema = pa.schema([("id", pa.int64()), ("v", pa.string())])

    fail_first = {"done": False}

    def fetch_one(key):
        if not fail_first["done"]:
            fail_first["done"] = True
            raise ConnectionError("cold start")
        params = dict(p.split("=") for p in key.split("&"))
        lo = int(params["offset"])
        return _json.dumps(
            {"features": recs[lo:lo + int(params["limit"])]}).encode()

    fetch = retrying_fetch(
        fetch_one, policy=RetryPolicy(max_attempts=3, base_delay_s=0.001),
        rate_per_s=10_000)
    ds = paginated_dataset(lambda: len(recs), fetch, page_size=10,
                           schema=schema, shared=shared_cache())
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    assert t.num_rows == len(recs)
    assert sorted(t["id"].to_pylist()) == list(range(40))
