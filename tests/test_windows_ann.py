"""Window, sessionization, explode, and ANN-variant operator tests
(SURVEY.md §5 layer 1: operator units against an independent oracle)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _events_pd():
    return pq.read_table(f"{SF}/events.parquet").to_pandas()


def test_event_lag_matches_pandas(ray_session):
    from oregonwaterdataportal_etl_ray.pipelines.queries import QUERIES
    got = QUERIES["event_lag"](SF).to_pandas() \
        .sort_values(["user_id", "event_id"]).reset_index(drop=True)
    ev = _events_pd().sort_values(["user_id", "ts", "event_id"])
    ev["prev_value"] = ev.groupby("user_id")["value"].shift(1)
    want = ev[["user_id", "event_id", "value", "prev_value"]] \
        .sort_values(["user_id", "event_id"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["event_id"].values == want["event_id"].values).all()
    pd.testing.assert_series_equal(got["prev_value"], want["prev_value"],
                                   check_names=False)


def test_sessionize_matches_pandas(ray_session):
    from oregonwaterdataportal_etl_ray.pipelines.queries import QUERIES
    got = QUERIES["sessionize"](SF).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    ev = _events_pd().sort_values(["user_id", "ts", "event_id"])
    gap = ev.groupby("user_id")["ts"].diff().dt.total_seconds()
    ev["new_sess"] = gap.isna() | (gap > 1800)
    want = ev.groupby("user_id").agg(
        n_events=("event_id", "size"), n_sessions=("new_sess", "sum")) \
        .reset_index().sort_values("user_id").reset_index(drop=True)
    assert (got["n_events"].values == want["n_events"].values).all()
    assert (got["n_sessions"].values == want["n_sessions"].values).all()


def test_ivf_recall_vs_bruteforce(ray_session):
    """IVF with 4/16 probes must recover most of the exact top-5."""
    from oregonwaterdataportal_etl_ray.pipelines.queries import QUERIES
    exact = QUERIES["ann_topk"](SF).to_pandas()
    approx = QUERIES["ann_ivf"](SF).to_pandas()
    recalls = []
    for q in exact["query_id"].unique():
        e = set(exact.loc[exact.query_id == q, "neighbor_id"])
        a = set(approx.loc[approx.query_id == q, "neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5, recalls


def test_embedding_near_dup_matches_numpy(ray_session):
    from oregonwaterdataportal_etl_ray.pipelines.queries import QUERIES
    got = QUERIES["embedding_near_dup"](SF).to_pandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    t = pq.read_table(f"{SF}/embeddings.parquet")
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    ids = t["vec_id"].to_numpy()
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    r, c = np.nonzero((sims >= 0.4) & (ids[:, None] < ids[None, :]))
    want_pairs = set(zip(ids[r], ids[c]))
    assert got_pairs == want_pairs


def test_pack_documents_invariants(ray_session):
    """Sequence packing: every doc lands in exactly one bin, no multi-doc
    bin exceeds the 2048-token budget, bins are deterministic across runs."""
    from oregonwaterdataportal_etl_ray.pipelines.queries import QUERIES
    got = QUERIES["pack_documents"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    n_tokens_total = sum(len(t.split()) for t in docs["text"])
    assert got["n_docs"].sum() == len(docs)               # full coverage
    assert got["total_tokens"].sum() == n_tokens_total    # nothing lost
    multi = got[got["n_docs"] > 1]
    assert (multi["total_tokens"] <= 2048).all()          # budget respected
    again = QUERIES["pack_documents"](SF).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values(["bucket", "bin_id"]).reset_index(drop=True),
        again.sort_values(["bucket", "bin_id"]).reset_index(drop=True))


def test_embedding_near_dup_lsh_recall(ray_session, tmp_path):
    """The banded-LSH scale path must recover >= 0.9 of the true cosine>=0.85
    pairs on a corpus with planted near-dups, with perfect precision (the
    candidate set is exactly verified)."""
    import pyarrow as pa
    from oregonwaterdataportal_etl_ray.pipelines.queries import QUERIES
    rng = np.random.default_rng(17)
    base = rng.standard_normal((300, 64)).astype(np.float32)
    dups = base[:40] + 0.08 * rng.standard_normal((40, 64)).astype(np.float32)
    m = np.vstack([base, dups])
    ids = np.arange(len(m), dtype=np.int64)
    pa.parquet.write_table(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))

    mn = m.astype(np.float64)
    mn /= np.linalg.norm(mn, axis=1, keepdims=True)
    sims = mn @ mn.T
    r, c = np.nonzero((sims >= 0.85) & (ids[:, None] < ids[None, :]))
    want = set(zip(ids[r].tolist(), ids[c].tolist()))
    assert len(want) >= 30  # the plant worked

    got_t = QUERIES["embedding_near_dup_lsh"](str(tmp_path))
    got = got_t.to_pandas() if isinstance(got_t, pa.Table) else got_t.to_pandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    assert got_pairs <= want                       # exact verify => no FPs
    assert len(got_pairs & want) / len(want) >= 0.9, (len(got_pairs), len(want))


def test_token_explode_empty_and_counts(ray_session):
    from oregonwaterdataportal_etl_ray.pipelines.queries import QUERIES
    got = QUERIES["token_explode"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    docs = docs[docs.doc_id < 50]
    want_n = sum(len(t.split()) for t in docs["text"] if t.strip())
    assert len(got) == want_n
    assert (got["token"] != "").all()


def test_asof_join_matches_pandas(ray_session):
    from oregonwaterdataportal_etl_ray.pipelines.queries import QUERIES
    got = QUERIES["asof_join"](SF).to_pandas() \
        .sort_values(["user_id", "event_id"]).reset_index(drop=True)
    ev = _events_pd().sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    view_val = ev["value"].where(ev["event_type"] == "view")
    # strictly-earlier semantics: shift(1) BEFORE ffill (ffill-then-shift
    # would leak a same-row view into its own lookup)
    prev = view_val.groupby(ev["user_id"]).transform(lambda s: s.shift(1).ffill())
    want = ev.assign(last_view_value=prev)
    want = want[want["event_type"] == "click"][
        ["user_id", "event_id", "value", "last_view_value"]] \
        .sort_values(["user_id", "event_id"]).reset_index(drop=True)
    assert len(got) == len(want)
    import pandas as pd
    pd.testing.assert_series_equal(got["last_view_value"], want["last_view_value"],
                                   check_names=False)


def test_kmeans_assign_coverage_and_argmin_law(ray_session):
    import duckdb
    import numpy as np
    from oregonwaterdataportal_etl_ray.pipelines.queries import QUERIES
    from oregonwaterdataportal_etl_ray.stages.ann import IVFIndex, _matrix
    from oregonwaterdataportal_etl_ray.sources.readers import read_table
    sf = "/root/testdata/sf0.001"
    out = QUERIES["kmeans_assign"](sf).to_pandas()
    total = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/embeddings.parquet'").fetchone()[0]
    assert int(out["n_members"].sum()) == total          # every vector lands
    assert out["cluster"].between(0, 15).all()
    assert (out["mean_dist"] >= 0).all() and (out["mean_dist"] <= 2).all()
    # assignment law: same deterministic sample -> same centroids -> argmin
    # recomputed locally matches the distributed cluster sizes
    sample = read_table(sf, "embeddings", columns=["embedding"]) \
        .limit(4096).take_batch(4096, batch_format="pyarrow")
    index = IVFIndex(_matrix(sample["embedding"]), n_cells=16)
    allv = read_table(sf, "embeddings", columns=["embedding"]) \
        .take_batch(100_000, batch_format="pyarrow")
    cells = index.cell_of(_matrix(allv["embedding"]))
    want = np.bincount(cells, minlength=16)
    got = np.zeros(16, np.int64)
    got[out["cluster"].to_numpy()] = out["n_members"].to_numpy()
    assert np.array_equal(got, want)


def test_global_row_number_is_total_order(ray_session):
    import numpy as np
    import pandas as pd
    import ray as _ray
    from oregonwaterdataportal_etl_ray.stages.window import global_row_number
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"v": rng.integers(0, 40, 5000),   # heavy ties
                       "id": rng.permutation(5000)})
    ds = _ray.data.from_pandas(df).repartition(13)
    out = global_row_number(ds, ["v", "id"], out_col="rn").to_pandas()
    assert sorted(out["rn"]) == list(range(5000))   # exact permutation
    expect = df.sort_values(["v", "id"], ignore_index=True)
    got = out.sort_values("rn", ignore_index=True)
    assert (got["v"].values == expect["v"].values).all()
    assert (got["id"].values == expect["id"].values).all()


def test_lshbands_empty_first_batch_does_not_poison_planes():
    """An empty first batch must not cache (0, L*b) hyperplanes — that
    crashed every later non-empty batch's matmul in the same task."""
    import numpy as np
    import pyarrow as pa

    from oregonwaterdataportal_etl_ray.stages.ann import LSHBands

    stage = LSHBands(n_tables=4, planes_per_table=8)
    empty = pa.table({"vec_id": pa.array([], pa.int64()),
                      "embedding": pa.array([], pa.list_(pa.float32()))})
    assert stage(empty).num_rows == 0
    full = pa.table({"vec_id": pa.array([1, 2], pa.int64()),
                     "embedding": pa.array([[0.1] * 16, [0.9] * 16],
                                           pa.list_(pa.float32()))})
    out = stage(full)
    assert out.num_rows == 2 * 4 and set(out.column_names) == {
        "vec_id", "table_id", "bucket"}
