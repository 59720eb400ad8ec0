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
