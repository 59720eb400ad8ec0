"""Count-triggered distributed fallbacks for the near-dup family: when the
candidate pair set exceeds PAIR_DRIVER_LIMIT, the pair dedup runs as a
hash-partitioned first-wins pass, the minhash signature re-join as
co-partitioned gathers, and the fuzzy-dedup corpus filter as a bucketed
ANTI join — and each must produce IDENTICAL output to the driver-side
pandas path it replaces."""

import pandas as pd
import pytest

from oregonwaterdataportal_etl_ray.pipelines import queries as q

SF = "/root/testdata/sf0.001"


def _run_both(monkeypatch, fn, *args):
    q._MINHASH_CACHE.clear()
    monkeypatch.setattr(q, "PAIR_DRIVER_LIMIT", 2_000_000)
    driver = fn(*args)
    q._MINHASH_CACHE.clear()
    monkeypatch.setattr(q, "PAIR_DRIVER_LIMIT", 0)   # force the fallback
    dist = fn(*args)
    q._MINHASH_CACHE.clear()
    return driver, dist


def _pd(res) -> pd.DataFrame:
    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_minhash_pair_stage_fallback_identical(ray_session, monkeypatch):
    driver, dist = _run_both(monkeypatch, q._minhash_near_dup_pairs, SF)
    a, b = _pd(driver), _pd(dist)
    assert len(a) > 0, "corpus must contain planted near-dups"
    pd.testing.assert_frame_equal(a, b)


def test_simhash_fallback_identical(ray_session, monkeypatch):
    driver, dist = _run_both(monkeypatch, q.QUERIES["simhash_near_dup"], SF)
    a, b = _pd(driver), _pd(dist)
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_fuzzy_dedup_anti_join_fallback_identical(ray_session, monkeypatch):
    driver, dist = _run_both(monkeypatch, q.QUERIES["fuzzy_dedup_corpus"], SF)
    a, b = _pd(driver), _pd(dist)
    pd.testing.assert_frame_equal(a, b)


def test_bucketed_anti_join_law(ray_session):
    """bucketed_anti_join == broadcast membership filter on a synthetic
    set with empty buckets on both sides."""
    import numpy as np
    import pyarrow as pa

    import ray
    from oregonwaterdataportal_etl_ray.stages.joins import bucketed_anti_join

    left = pa.table({"doc_id": pa.array(np.arange(1000), pa.int64()),
                     "v": pa.array(np.arange(1000) * 2, pa.int64())})
    drop = pa.table({"node": pa.array(
        np.concatenate([np.arange(0, 1000, 3),
                        np.array([5000, 6000])]), pa.int64())})
    got = (bucketed_anti_join(ray.data.from_arrow(left),
                              ray.data.from_arrow(drop),
                              on="doc_id", id_col="node", num_buckets=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = left.to_pandas()
    want = want[want["doc_id"] % 3 != 0].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
