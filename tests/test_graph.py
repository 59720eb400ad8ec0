"""Distributed connected components: union-find oracle equivalence, long
chains (diameter >> round count), multi-partition contraction, and the
fuzzy-dedup clustering pipelines built on it."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from oregonwaterdataportal_etl_ray.stages.graph import connected_components


def _union_find_canon(edges: np.ndarray) -> dict[int, int]:
    """Reference CC: node -> min id of its component, incident nodes only."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    deg = set()
    for a, b in edges:
        a, b = int(a), int(b)
        if a == b:
            continue
        deg.update((a, b))
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        parent[find(a)] = find(b)
    roots: dict[int, list[int]] = {}
    for n in deg:
        roots.setdefault(find(n), []).append(n)
    return {n: min(roots[find(n)]) for n in deg}


def _cc_dict(ds) -> dict[int, int]:
    df = ds.to_pandas()
    return {int(n): int(c) for n, c in zip(df["node"], df["component"])}


def test_cc_matches_union_find_random_graph():
    rng = np.random.default_rng(7)
    e = rng.integers(0, 2000, size=(3000, 2)).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"id_a": e[:, 0], "id_b": e[:, 1]}))
    assert _cc_dict(connected_components(ds)) == _union_find_canon(e)


def test_cc_long_chain_converges_fast():
    # path of diameter 999: label propagation would need ~999 rounds; the
    # contracting algorithm must finish inside its default max_iter
    chain = pa.table({"id_a": np.arange(1000, dtype=np.int64),
                      "id_b": np.arange(1, 1001, dtype=np.int64)})
    got = _cc_dict(connected_components(ray.data.from_arrow(chain)))
    assert set(got.values()) == {0} and len(got) == 1001


def test_cc_multi_partition_path_matches():
    # tiny local_cap forces the multi-round contraction path; the result
    # must be identical to the single-partition answer
    rng = np.random.default_rng(11)
    e = rng.integers(0, 500, size=(700, 2)).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"id_a": e[:, 0], "id_b": e[:, 1]}))
    assert _cc_dict(connected_components(ds, local_cap=32)) == _union_find_canon(e)


def test_cc_self_loops_and_isolated_components():
    t = pa.table({"id_a": pa.array([1, 5, 5, 9], pa.int64()),
                  "id_b": pa.array([2, 5, 6, 9], pa.int64())})
    got = _cc_dict(connected_components(ray.data.from_arrow(t)))
    # self-loop-only nodes (9) have no real edge and drop out; (5,5) is
    # absorbed by the real (5,6) edge
    assert got == {1: 1, 2: 1, 5: 5, 6: 5}


def test_cc_empty_edges():
    t = pa.table({"id_a": pa.array([], pa.int64()),
                  "id_b": pa.array([], pa.int64())})
    assert connected_components(ray.data.from_arrow(t)).count() == 0


def test_near_dup_clusters_groups_planted_duplicates(sf_dir):
    from oregonwaterdataportal_etl_ray.pipelines.queries import (
        QUERIES, _minhash_pairs_cached)
    pairs = _minhash_pairs_cached(sf_dir)
    clusters = QUERIES["near_dup_clusters"](sf_dir).to_pandas()
    if not len(clusters):
        pytest.skip("no near-dup pairs at this scale")
    # every candidate pair must land in one cluster: total members equals
    # distinct incident docs, and no cluster is smaller than 2
    incident = set(pairs["id_a"].to_pylist()) | set(pairs["id_b"].to_pylist())
    assert int(clusters["n_members"].sum()) == len(incident)
    assert int(clusters["n_members"].min()) >= 2
    # component ids are member minima, hence themselves incident docs
    assert set(clusters["component"]) <= incident


def test_fuzzy_dedup_corpus_invariants(sf_dir):
    import duckdb
    from oregonwaterdataportal_etl_ray.pipelines.queries import (
        QUERIES, _minhash_pairs_cached)
    stats = QUERIES["fuzzy_dedup_corpus"](sf_dir).to_pandas()
    pairs = _minhash_pairs_cached(sf_dir)
    n_pairs_docs = len(set(pairs["id_a"].to_pylist())
                       | set(pairs["id_b"].to_pylist()))
    n_clusters = QUERIES["near_dup_clusters"](sf_dir).count()
    total = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'").fetchone()[0]
    # exactly one doc per cluster survives
    assert int(stats["n_docs"].sum()) == total - (n_pairs_docs - n_clusters)


def test_fast_path_equals_contraction_path(ray_session):
    """The small-graph one-task fast path and the iterated-contraction path
    must produce identical components on the same random graph."""
    import numpy as np

    rng = np.random.default_rng(11)
    u = rng.integers(0, 800, 3000)
    v = rng.integers(0, 800, 3000)
    ds = ray.data.from_arrow(pa.table({"id_a": u, "id_b": v}))
    fast = _cc_dict(connected_components(ds))              # n <= local_cap
    multi = _cc_dict(connected_components(ds, local_cap=64))
    assert fast == multi


def test_dup_cluster_assign_per_batch_edges_across_blocks(ray_session, monkeypatch):
    """The per-batch edge builder's law: a (lang, source) stratum SPLIT
    ACROSS MANY BLOCKS still resolves to one component (within-batch chains
    + the linker chain over batch minima), and the result equals the
    group-min oracle. No task ever sees a whole stratum."""
    import numpy as np
    import pandas as pd

    from oregonwaterdataportal_etl_ray.pipelines import queries as Q

    rng = np.random.default_rng(3)
    n = 600
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": rng.choice(["en", "de", "fr"], n),
        "source": rng.choice(["s0", "s1", "s2", "s3"], n)})
    # shuffle row order so group members scatter across blocks
    df = df.sample(frac=1.0, random_state=5).reset_index(drop=True)
    t = pa.Table.from_pandas(df, preserve_index=False)

    def fake_read_table(sf_dir, name, columns=None, **kw):
        assert name == "documents"
        ds = ray.data.from_arrow(t.select(columns))
        return ds.repartition(16)          # force many small blocks

    monkeypatch.setattr(Q, "read_table", fake_read_table)
    got = Q.QUERIES["dup_cluster_assign"]("<unused>").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    g = df.groupby(["lang", "source"])["doc_id"]
    want = df.assign(component=g.transform("min"), n=g.transform("size"))
    want = want.loc[want["n"] > 1, ["doc_id", "component"]] \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "component"]].astype("int64"), want.astype("int64"))
