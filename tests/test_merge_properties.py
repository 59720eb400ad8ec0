"""Property-based suites (hypothesis), mirroring the reference's fuzz layer
(/root/reference/userCode/wrd/lib_test.py:105-122):

  - apply-twice == apply-once (idempotence, D2),
  - any permutation of a key's events converges to the max-LSN winner (LWW),
  - partial-reduce then merge == direct reduce (combiner correctness).

These run on the in-process Arrow kernels (no Ray session needed) so
hypothesis can iterate fast."""

import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings, strategies as st

from oregonwaterdataportal_etl_ray.cdc.merge import (
    drop_tombstones,
    key_column,
    merge_sorted_runs,
    reduce_lww,
)


def _table(events):
    """events: list of (repo, path, lsn, content|None)"""
    t = pa.table({
        "repo": pa.array([e[0] for e in events], pa.string()),
        "path": pa.array([e[1] for e in events], pa.string()),
        "lsn": pa.array([e[2] for e in events], pa.int64()),
        "content": pa.array([e[3] for e in events], pa.string()),
    })
    return t.append_column("__key", key_column(t))


def _winners(events):
    """Python-dict oracle: last writer (max lsn) wins per key."""
    best = {}
    for repo, path, lsn, content in events:
        k = (repo, path)
        if k not in best or lsn >= best[k][0]:
            if k not in best or lsn > best[k][0]:
                best[k] = (lsn, content)
    return {k: v for k, v in best.items()}


# key alphabets deliberately include the \x1f join separator and prefix
# overlaps ("r1" vs "r1\x1fa"): the injective length-prefixed key encoding
# must keep such pairs distinct under every property below
events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["r1", "r2", "r1\x1fa", "r\x1f", ""]),
        st.sampled_from(["a", "b", "c", "a\x1fb", "\x1fa", ""]),
        st.integers(min_value=1, max_value=50),
        st.one_of(st.none(), st.text(alphabet="xyz", max_size=5)),
    ),
    min_size=1, max_size=60,
)


def _check(events):
    got = reduce_lww(_table(events))
    oracle = _winners(events)
    assert got.num_rows == len(oracle)
    for i in range(got.num_rows):
        k = (got["repo"][i].as_py(), got["path"][i].as_py())
        assert got["lsn"][i].as_py() == oracle[k][0]
        # content equality only guaranteed when LSNs are unique per key;
        # duplicate-LSN rows here may carry different payloads (hypothesis
        # generates them) — real duplicate delivery re-sends identical rows.


@settings(max_examples=150, deadline=None)
@given(events_strategy)
def test_reduce_lww_matches_dict_oracle(events):
    _check(events)


@settings(max_examples=100, deadline=None)
@given(events_strategy, st.randoms())
def test_permutation_invariance(events, rnd):
    """LWW result is invariant to arrival order (when LSNs are unique)."""
    uniq = {}
    for e in events:  # de-dup LSNs so winners are well defined
        uniq[(e[0], e[1], e[2])] = e
    events = list(uniq.values())
    base = reduce_lww(_table(events)).sort_by(
        [("repo", "ascending"), ("path", "ascending")])
    shuffled = events[:]
    rnd.shuffle(shuffled)
    perm = reduce_lww(_table(shuffled)).sort_by(
        [("repo", "ascending"), ("path", "ascending")])
    assert base.select(["repo", "path", "lsn", "content"]).equals(
        perm.select(["repo", "path", "lsn", "content"]))


@settings(max_examples=100, deadline=None)
@given(events_strategy)
def test_apply_twice_equals_apply_once(events):
    once = reduce_lww(_table(events))
    twice = reduce_lww(_table(events + events))
    assert once.num_rows == twice.num_rows
    a = once.sort_by([("repo", "ascending"), ("path", "ascending")])
    b = twice.sort_by([("repo", "ascending"), ("path", "ascending")])
    assert a["lsn"].to_pylist() == b["lsn"].to_pylist()


@settings(max_examples=100, deadline=None)
@given(events_strategy, st.integers(min_value=1, max_value=5))
def test_partial_reduce_combiner_correct(events, n_splits):
    """Splitting into blocks, reducing each, then merging runs == direct reduce.
    This is the guarantee that the map-side combiner never changes results."""
    uniq = {}
    for e in events:
        uniq[(e[0], e[1], e[2])] = e
    events = list(uniq.values())
    direct = reduce_lww(_table(events)).sort_by(
        [("repo", "ascending"), ("path", "ascending")])
    chunk = max(1, len(events) // n_splits)
    runs = [reduce_lww(_table(events[i:i + chunk]))
            for i in range(0, len(events), chunk)]
    merged = merge_sorted_runs(runs).sort_by(
        [("repo", "ascending"), ("path", "ascending")])
    assert direct.select(["repo", "path", "lsn", "content"]).equals(
        merged.select(["repo", "path", "lsn", "content"]))


def test_drop_tombstones():
    t = _table([("r1", "a", 1, "x"), ("r1", "b", 2, None)])
    assert drop_tombstones(t).num_rows == 1


def test_normalize_watermark_strict_filter():
    """D5: rows with lsn <= the bucket's watermark are dropped (strict >,
    half-open resume windows — the reference's +1-minute overlap law,
    /root/reference/userCode/wrd/dag.py:189-197)."""
    from oregonwaterdataportal_etl_ray.cdc.merge import NormalizeEvents, bucket_of_keys
    from oregonwaterdataportal_etl_ray.cdc.schema import plan_target_schema  # noqa: F401

    schema = pa.schema([("repo", pa.string()), ("path", pa.string()),
                        ("commit", pa.string()), ("lang", pa.string()),
                        ("content", pa.string())])
    rows = pa.table({
        "repo": ["r1", "r1", "r1"], "path": ["a", "a", "a"],
        "commit": [f"{i:012d}-aaaaaaaa" for i in (5, 10, 15)],
        "lang": ["py"] * 3, "content": ["v5", "v10", "v15"],
    })
    key = key_column(rows)
    bucket = int(bucket_of_keys(key, 8)[0])
    ne = NormalizeEvents(schema, num_buckets=8, watermarks={bucket: 10})
    out = ne(rows)
    # lsn 5 and 10 are <= watermark 10 -> dropped; only 15 survives
    assert out["lsn"].to_pylist() == [15]
    assert out["content"].to_pylist() == ["v15"]

    # no watermark -> LWW winner only (15)
    ne2 = NormalizeEvents(schema, num_buckets=8)
    out2 = ne2(rows)
    assert out2["lsn"].to_pylist() == [15]


# ---------------------------------------------------------------------------
# LSH pair-generation kernel: partition-vectorized == per-bucket reference
# ---------------------------------------------------------------------------

@given(st.lists(st.tuples(st.integers(0, 30),      # doc_id (few -> dup rows)
                          st.integers(0, 3),       # band_id
                          st.integers(0, 6)),      # band_hash (few -> big buckets)
                max_size=120))
@settings(max_examples=60, deadline=None)
def test_pairs_in_partition_equals_per_bucket_reference(rows):
    """For ANY mix of bucket sizes, duplicate doc rows, and oversize
    truncation, the partition-level vectorized kernel emits exactly the
    per-bucket reference kernel's pairs."""
    import numpy as np
    from oregonwaterdataportal_etl_ray.stages.dedup import bucket_pairs, pairs_in_partition

    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "band_id": pa.array([r[1] for r in rows], pa.int32()),
        "band_hash": pa.array(np.array([r[2] for r in rows], dtype=np.uint64)),
    })
    got = pairs_in_partition(t, max_bucket=5).to_pandas()
    got_set = set(zip(got["id_a"], got["id_b"]))
    want = set()
    if t.num_rows:
        df = t.to_pandas()
        for _, g in df.groupby(["band_id", "band_hash"]):
            p = bucket_pairs(pa.Table.from_pandas(g), max_bucket=5).to_pandas()
            want |= set(zip(p["id_a"], p["id_b"]))
    assert got_set == want


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=200), min_size=0, max_size=40),
       st.integers(min_value=0, max_value=30))
def test_poly_hash_matches_scalar_reference_property(keys, off):
    """Property: the vectorized polynomial bucket hash equals the scalar
    little-endian definition for ARBITRARY strings (embedded NULs, unicode,
    empties, long runs) and is slice-offset invariant — the law the fixed
    golden cases in test_cdc_replay.py spot-check."""
    import numpy as np
    import pyarrow as pa

    from oregonwaterdataportal_etl_ray.cdc.merge import _poly_hash_strings

    P, M = 0x100000001B3, 2 ** 64

    def ref(s: str) -> int:
        h = 0
        for i, b in enumerate(s.encode()):
            h = (h + b * pow(P, i, M)) % M
        h = (h + len(s.encode()) * 0x9E3779B97F4A7C15) % M
        h ^= h >> 30
        h = (h * 0xBF58476D1CE4E5B9) % M
        h ^= h >> 27
        h = (h * 0x94D049BB133111EB) % M
        return h ^ (h >> 31)

    arr = pa.array(keys, pa.string())
    got = _poly_hash_strings(arr)
    assert [int(x) for x in got] == [ref(s) for s in keys]
    off = min(off, len(keys))
    sliced = _poly_hash_strings(arr.slice(off))
    assert (sliced == np.asarray(got[off:])).all()
