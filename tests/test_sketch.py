"""t-digest quantile sketch: merge-invariance and accuracy vs exact."""

import numpy as np
import pyarrow.parquet as pq

from oregonwaterdataportal_etl_ray.stages.sketch import TDigest

SF = "/root/testdata/sf0.001"


def test_tdigest_accuracy_vs_exact():
    rng = np.random.default_rng(5)
    v = rng.lognormal(0, 1.5, size=200_000)
    d = TDigest(200.0)
    for chunk in np.array_split(v, 20):
        d.add(chunk)
    for q in (0.05, 0.5, 0.95, 0.99):
        exact = np.quantile(v, q)
        approx = d.quantile(q)
        # rank error bound: compare via the CDF, not the value
        rank = (v <= approx).mean()
        assert abs(rank - q) < 0.01, (q, exact, approx, rank)


def test_tdigest_merge_equals_single():
    rng = np.random.default_rng(6)
    v = rng.normal(10, 3, size=50_000)
    parts = np.array_split(v, 8)
    merged = TDigest(200.0)
    for p in parts:
        merged.merge(TDigest(200.0).add(p))
    single = TDigest(200.0).add(v)
    for q in (0.1, 0.5, 0.9):
        r_m = (v <= merged.quantile(q)).mean()
        r_s = (v <= single.quantile(q)).mean()
        assert abs(r_m - q) < 0.01 and abs(r_s - q) < 0.01


def test_sketch_query_close_to_exact(ray_session):
    from oregonwaterdataportal_etl_ray.pipelines.queries import QUERIES
    approx = QUERIES["grouped_percentiles_sketch"](SF).to_pandas() \
        .set_index("event_type").sort_index()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    for et, grp in ev.groupby("event_type"):
        for q, col in ((0.5, "p50"), (0.95, "p95")):
            rank = (grp["value"] <= approx.loc[et, col]).mean()
            assert abs(rank - q) < 0.02, (et, col, rank)

# ---------------------------------------------------------------------------
# HyperLogLog (stderr ~1.04/sqrt(2^12) ~= 1.6%; gates use 3-4 sigma slack)
# ---------------------------------------------------------------------------

def test_hll_accuracy_across_cardinalities():
    import pandas as pd
    from oregonwaterdataportal_etl_ray.stages.sketch import (
        HLL_P, hll_add, hll_estimate)
    rng = np.random.default_rng(7)
    for n in (100, 5_000, 200_000, 2_000_000):
        keys = rng.integers(0, 1 << 62, size=n, dtype=np.uint64)
        exact = len(np.unique(keys))
        regs = np.zeros(1 << HLL_P, np.uint8)
        for chunk in np.array_split(pd.util.hash_array(keys), 8):
            hll_add(regs, chunk)
        est = hll_estimate(regs)
        assert abs(est - exact) / exact < 0.06, (n, exact, est)


def test_hll_merge_equals_single():
    import pandas as pd
    from oregonwaterdataportal_etl_ray.stages.sketch import HLL_P, hll_add, hll_estimate
    rng = np.random.default_rng(8)
    hashed = pd.util.hash_array(
        rng.integers(0, 1 << 62, size=100_000, dtype=np.uint64))
    single = np.zeros(1 << HLL_P, np.uint8)
    hll_add(single, hashed)
    merged = np.zeros(1 << HLL_P, np.uint8)
    for chunk in np.array_split(hashed, 16):
        part = np.zeros(1 << HLL_P, np.uint8)
        hll_add(part, chunk)
        merged = np.maximum(merged, part)
    assert np.array_equal(single, merged)


def test_approx_distinct_query_vs_exact(ray_session):
    from oregonwaterdataportal_etl_ray.pipelines.queries import QUERIES
    approx = QUERIES["approx_distinct_users"](SF).to_pandas() \
        .set_index("event_type")["approx_users"]
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas()
    exact = ev.groupby("event_type")["user_id"].nunique()
    for et, true_n in exact.items():
        rel = abs(approx[et] - true_n) / true_n
        assert rel < 0.06, (et, true_n, approx[et], rel)


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters: recovery + undercount bound (<= n_total / k)
# ---------------------------------------------------------------------------

def test_mg_trim_undercount_bound():
    from oregonwaterdataportal_etl_ray.stages.sketch import mg_trim
    rng = np.random.default_rng(9)
    # zipf-ish vocabulary: a few heavy tokens + a long tail
    counts = np.concatenate([rng.integers(5_000, 10_000, 10),
                             rng.integers(1, 50, 20_000)]).astype(np.int64)
    tokens = np.array([f"t{i}" for i in range(len(counts))])
    k = 256
    kept_t, kept_c = mg_trim(tokens, counts, k)
    assert len(kept_t) <= k
    pos = {t: i for i, t in enumerate(kept_t)}
    n_total = counts.sum()
    for i in range(10):  # every heavy token survives with bounded undercount
        t = f"t{i}"
        assert t in pos
        under = counts[i] - kept_c[pos[t]]
        assert 0 <= under <= n_total / k


def test_top_tokens_sketch_matches_exact(ray_session):
    from oregonwaterdataportal_etl_ray.pipelines.queries import QUERIES
    exact = QUERIES["top_tokens"](SF).to_pandas().set_index("token")["n"]
    approx = QUERIES["top_tokens_sketch"](SF).to_pandas() \
        .set_index("token")["n_lower"]
    n_total = exact.sum()  # top-50 covers the whole tiny vocab at sf0.001
    # every true heavy token recovered; estimates undercount by <= n/k
    for t, true_n in exact.head(20).items():
        assert t in approx.index, t
        assert 0 <= true_n - approx[t] <= n_total / 512, (t, true_n, approx[t])


def test_partials_survive_zero_row_batches():
    """Empty blocks (empty parquet file / empty shuffle partition) must
    produce TYPED empty partials, not crash or degrade to null columns."""
    import pyarrow as pa
    from oregonwaterdataportal_etl_ray.stages.sketch import (
        hll_rows, mg_token_partial)
    empty_grp = pa.table({"lang": pa.array([], pa.string()),
                          "user_id": pa.array([], pa.int64())})
    h = hll_rows(empty_grp, "lang", "user_id")
    assert h.num_rows == 0 and h.schema.field("lang").type == pa.string()
    empty_txt = pa.table({"text": pa.array([], pa.string())})
    m = mg_token_partial(empty_txt, "text", 8)
    assert m.num_rows == 0 and m.schema.field("token").type == pa.string()
    # all-whitespace batch: same law (everything filters out pre-split)
    blank = pa.table({"text": pa.array(["  ", "\t"], pa.string())})
    m2 = mg_token_partial(blank, "text", 8)
    assert m2.num_rows == 0 and m2.schema.field("token").type == pa.string()
