"""Operator-unit tests for the stage kernels (SURVEY.md §5 layer (a)):
golden values for hashes/ids, first/last-wins dedup, near-dup detection on
planted duplicates, ANN on planted neighbors, multimodal stub plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from oregonwaterdataportal_etl_ray.functions.kernels import deterministic_id, md5_hex, sha256_hex
from oregonwaterdataportal_etl_ray.stages.ann import BruteForceTopK, HyperplaneLSH, _matrix, final_topk
from oregonwaterdataportal_etl_ray.stages.dedup import (
    BandExploder, MinHasher, SimHasher, bucket_pairs, exact_ngram_jaccard, hamming64,
    pairs_in_partition, simhash_pairs_in_partition)
from oregonwaterdataportal_etl_ray.stages.kernels import keep_first_by, keep_last_by
from oregonwaterdataportal_etl_ray.stages.multimodal import FakeDecoder, FrameSampler, PayloadStats
from oregonwaterdataportal_etl_ray.stages.text import LangId, QualityScore, token_count


# ---- golden hash values (fixed forever, like reference wrd/lib_test.py:77-102)

def test_hash_goldens():
    col = pa.array(["abc", None, ""])
    assert md5_hex(col).to_pylist() == [
        "900150983cd24fb0d6963f7d28e17f72", None,
        "d41d8cd98f00b204e9800998ecf8427e"]
    assert sha256_hex(col).to_pylist()[0] == \
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    ids = deterministic_id(pa.array(["station-1"]), digits=5).to_pylist()
    assert ids == [deterministic_id(pa.array(["station-1"]), digits=5).to_pylist()[0]]
    assert 0 < ids[0] < 10 ** 5


def test_keep_last_and_first():
    t = pa.table({"k": ["a", "a", "b"], "v": [1, 2, 3], "o": [10, 20, 5]})
    last = keep_last_by(t, ["k"], ["o"]).sort_by("k")
    assert last["v"].to_pylist() == [2, 3]
    first = keep_first_by(t, ["k"], ["o"]).sort_by("k")
    assert first["v"].to_pylist() == [1, 3]


def test_dataset_keep_first_distributed():
    """dataset_keep_last(keep='first') — the combiner AND reducer both flip
    to smallest-order-wins, so splitting a key across blocks still yields the
    global first (curation_pipeline's dedup relies on this law)."""
    import ray.data
    from oregonwaterdataportal_etl_ray.pipelines.queries import dataset_keep_last
    t = pa.table({"k": ["a", "b", "a", "b", "a"], "o": [3, 9, 1, 7, 2],
                  "v": [30, 90, 10, 70, 20]})
    ds = ray.data.from_arrow(t).repartition(3)
    out = dataset_keep_last(ds, ["k"], ["o"], num_buckets=4,
                            keep="first").to_pandas()
    got = dict(zip(out["k"], out["v"]))
    assert got == {"a": 10, "b": 70}


def test_keep_last_multi_order_tiebreak():
    t = pa.table({"k": ["a"] * 3, "v": [1, 2, 3], "o1": [5, 5, 4], "o2": [1, 2, 0]})
    assert keep_last_by(t, ["k"], ["o1", "o2"])["v"].to_pylist() == [2]


# ---- text

def test_token_count_edges():
    t = pa.table({"text": ["one two  three", "", "   ", "solo"]})
    assert token_count(t)["n_tokens"].to_pylist() == [3, 0, 0, 1]


def test_quality_and_langid_deterministic():
    t = pa.table({"text": ["The cat and the dog, it is that good for all.",
                           "zzzz 12345 !!!"]})
    q1 = QualityScore()(t)
    q2 = QualityScore()(t)
    assert q1["quality_score"].to_pylist() == q2["quality_score"].to_pylist()
    assert q1["quality_score"][0].as_py() > q1["quality_score"][1].as_py()
    lid = LangId()(pa.table({"text": ["the house and the tree is that big",
                                      "der hund und die katze ist nicht da"]}))
    assert lid["lang_pred"].to_pylist() == ["en", "de"]


# ---- dedup

def test_minhash_detects_planted_near_dup():
    base = "the quick brown fox jumps over the lazy dog " * 20
    near = base.replace("lazy", "sleepy")
    far = "completely different content about databases and rayon " * 20
    mh = MinHasher(num_perm=64, k=5)
    s_base, s_near, s_far = (mh.signature(x) for x in (base, near, far))
    assert (s_base == s_near).mean() > 0.5
    assert (s_base == s_far).mean() < 0.3
    assert exact_ngram_jaccard(base, near) > 0.5
    assert exact_ngram_jaccard(base, far) < 0.1


def test_band_explode_and_pairs():
    mh = MinHasher(num_perm=64, k=5)
    t = pa.table({"doc_id": [1, 2], "text": ["aaa bbb ccc " * 10] * 2})
    sigs = mh(t)
    bands = BandExploder(num_bands=16)(sigs)
    assert bands.num_rows == 32
    # identical docs share every band -> pairs found in each bucket
    g = bands.filter(pc.equal(bands["band_id"], 0))
    pairs = bucket_pairs(g)
    assert pairs.num_rows == 1
    assert pairs["id_a"][0].as_py() == 1 and pairs["id_b"][0].as_py() == 2


def test_simhash_hamming():
    sh = SimHasher(k=5)
    a = sh.simhash("the quick brown fox jumps over the lazy dog " * 10)
    b = sh.simhash("the quick brown fox jumps over the sleepy dog " * 10)
    c = sh.simhash("entirely unrelated text on astrophysics and stars " * 10)
    d_ab = hamming64(np.array([a], dtype=np.uint64), np.array([b], dtype=np.uint64))[0]
    d_ac = hamming64(np.array([a], dtype=np.uint64), np.array([c], dtype=np.uint64))[0]
    assert d_ab < d_ac


def test_batch_hashers_match_per_doc_reference():
    """The vectorized batch kernels must produce byte-identical signatures
    to the per-document reference paths (``signature`` / ``simhash``) for
    every edge: empty, shorter-than-k, unicode, long."""
    texts = ["", "ab", "abcd", "hello world this is a longer text " * 3,
             "unicode ümlaut and 中文", "x" * 5,
             "the quick brown fox " * 50]
    t = pa.table({"text": pa.array(texts)})
    mh = MinHasher(num_perm=64, k=5)
    got = mh(t)["minhash"].to_pylist()
    for i, s in enumerate(texts):
        assert got[i] == mh.signature(s).tolist(), i
    sh = SimHasher(k=5)
    got_sh = sh(t)["simhash"].to_pylist()
    for i, s in enumerate(texts):
        assert got_sh[i] == sh.simhash(s), i
    # nulls hash like empty strings
    tn = pa.table({"text": pa.array(["abc def ghi", None])})
    assert mh(tn)["minhash"].to_pylist()[1] == mh.signature("").tolist()
    assert sh(tn)["simhash"].to_pylist()[1] == sh.simhash("")


def test_pairs_in_partition_matches_per_bucket_reference():
    """The partition-level vectorized pair-gen must emit exactly the pairs
    the per-bucket reference kernel emits, bucket by bucket."""
    rng = np.random.default_rng(5)
    n = 400
    t = pa.table({
        "doc_id": pa.array(rng.integers(0, 120, n), pa.int64()),
        "band_id": pa.array(rng.integers(0, 4, n), pa.int32()),
        "band_hash": pa.array(rng.integers(0, 25, n).astype(np.uint64), pa.uint64()),
    })
    got = pairs_in_partition(t, max_bucket=10).to_pandas()
    got_set = set(zip(got["id_a"], got["id_b"]))
    want = set()
    df = t.to_pandas()
    for (_, _), g in df.groupby(["band_id", "band_hash"]):
        sub = pa.Table.from_pandas(g)
        p = bucket_pairs(sub, max_bucket=10).to_pandas()
        want |= set(zip(p["id_a"], p["id_b"]))
    assert got_set == want


def test_simhash_pairs_in_partition_planted():
    """Within one partition: identical fingerprints in the same bucket pair
    up with hamming 0; oversized buckets (>max) are skipped."""
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 10, 11], pa.int64()),
        "band_id": pa.array([0, 0, 0, 1, 1], pa.int32()),
        "band_key": pa.array(np.array([7, 7, 9, 4, 4], dtype=np.uint64)),
        "simhash": pa.array(np.array([100, 100, 999, 100, 0xFFFF000000000064],
                                     dtype=np.uint64)),
    })
    got = simhash_pairs_in_partition(t, max_bucket=50, max_hamming=8).to_pandas()
    pairs = set(zip(got["id_a"], got["id_b"], got["hamming"]))
    assert (1, 2, 0) in pairs          # same bucket, identical fingerprint
    assert not any(a == 10 for a, _, _ in pairs)  # hamming 16 > 8 filtered
    # oversized bucket skipped entirely
    big = pa.table({
        "doc_id": pa.array(range(60), pa.int64()),
        "band_id": pa.array([0] * 60, pa.int32()),
        "band_key": pa.array(np.full(60, 5, dtype=np.uint64)),
        "simhash": pa.array(np.full(60, 42, dtype=np.uint64)),
    })
    assert simhash_pairs_in_partition(big, max_bucket=50).num_rows == 0


def test_derived_buckets_scale_with_cluster():
    from oregonwaterdataportal_etl_ray.stages.partitioning import (
        derived_join_partitions, derived_num_buckets)
    b8, b1024 = derived_num_buckets(cpus=8), derived_num_buckets(cpus=1024)
    assert b1024 > b8          # grows with the cluster
    assert b8 & (b8 - 1) == 0 and b1024 & (b1024 - 1) == 0  # pow2 (bit-mask keys)
    assert derived_num_buckets(cpus=1) >= 32                # floor
    assert derived_join_partitions(cpus=256) > derived_join_partitions(cpus=8)


# ---- ann

def test_bruteforce_topk_finds_planted_neighbor():
    rng = np.random.default_rng(3)
    m = rng.standard_normal((50, 16)).astype(np.float32)
    m[7] = m[0] + 0.01 * rng.standard_normal(16).astype(np.float32)  # near-dup of 0
    t = pa.table({"vec_id": pa.array(range(50), pa.int64()),
                  "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32()))})
    stage = BruteForceTopK({"ids": np.array([0]), "matrix": m[:1]}, k=3)
    part = stage(t).to_pandas()
    top = final_topk(part, k=3)
    assert top.iloc[0]["neighbor_id"] == 7
    assert top["rank"].tolist() == [1, 2, 3]


def test_hyperplane_lsh_same_vector_same_bucket():
    rng = np.random.default_rng(4)
    m = rng.standard_normal((10, 16)).astype(np.float32)
    t = pa.table({"embedding": pa.array([m[0].tolist()] * 2 + [m[1].tolist()],
                                        pa.list_(pa.float32()))})
    out = HyperplaneLSH(dim=16)(t)
    b = out["lsh_bucket"].to_pylist()
    assert b[0] == b[1]


# ---- multimodal stubs

def test_multimodal_plumbing():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([b"abc", b"defg"], pa.binary())})
    stats = PayloadStats()(t)
    assert stats["payload_bytes"].to_pylist() == [3, 4]
    dec = FakeDecoder()(t)
    assert "payload" not in dec.column_names
    assert dec["height"].to_pylist() == FakeDecoder()(t)["height"].to_pylist()
    frames = FrameSampler(n_frames=2)(t)
    assert frames.num_rows == 4
    assert frames["frame_idx"].to_pylist() == [0, 1, 0, 1]


def test_derive_observation_id_goldens():
    """Pinned semantics of the reference's derived unique id (M3,
    /root/reference/userCode/wrd/sta_generation.py:18-66): digits of
    parent_id+time, truncated to 18."""
    from oregonwaterdataportal_etl_ray.functions.kernels import derive_observation_id
    ids = derive_observation_id(
        pa.array([123, 45678]),
        pa.array(["2023-01-02T03:00:00Z", "1999-12-31T23:59:59Z"]))
    assert ids.to_pylist() == [12320230102030000, 456781999123123595]
    # collision-free across times for the same parent
    a = derive_observation_id(pa.array([1]), pa.array(["2023-01-02T03:00:00Z"]))
    b = derive_observation_id(pa.array([1]), pa.array(["2023-01-02T04:00:00Z"]))
    assert a.to_pylist() != b.to_pylist()


def test_coalesce_timestamps_multi_format_and_tz():
    """M11: the reference's try-formats-in-order parse + PT->UTC conversion
    (userCode/wrd/lib.py:131-149), vectorized."""
    import pyarrow.compute as pc
    from oregonwaterdataportal_etl_ray.functions.kernels import coalesce_timestamps
    col = pa.array(["03-15-2024 12:30", "03-15-2024",
                    "07/04/2023 01:02:03 PM", None])
    naive = coalesce_timestamps(col)
    assert pc.strftime(naive.cast(pa.timestamp("s")),
                       format="%Y-%m-%dT%H:%M:%SZ").to_pylist() == [
        "2024-03-15T12:30:00Z", "2024-03-15T00:00:00Z",
        "2023-07-04T13:02:03Z", None]
    utc = coalesce_timestamps(col, assume_tz="America/Los_Angeles")
    got = pc.strftime(utc.cast(pa.timestamp("s", tz="UTC")),
                      format="%Y-%m-%dT%H:%M:%SZ").to_pylist()
    # March 15 is PDT (UTC-7); July 4 is PDT too
    assert got[0] == "2024-03-15T19:30:00Z"
    assert got[2] == "2023-07-04T20:02:03Z"
    # a winter date is PST (UTC-8)
    win = coalesce_timestamps(pa.array(["01-15-2024 12:00"]),
                              assume_tz="America/Los_Angeles")
    assert pc.strftime(win.cast(pa.timestamp("s", tz="UTC")),
                       format="%H:%M").to_pylist() == ["20:00"]
    import pytest
    with pytest.raises(ValueError, match="known formats"):
        coalesce_timestamps(pa.array(["not a date"]))
    assert coalesce_timestamps(pa.array(["not a date"]),
                               on_unparsed="null").null_count == 1


def test_strip_availability_suffix():
    from oregonwaterdataportal_etl_ray.functions.kernels import strip_availability_suffix
    got = strip_availability_suffix(pa.array(
        ["mean_daily_flow_available", "water_temp_avail", "plain", "avail_x"]))
    assert got.to_pylist() == ["mean_daily_flow", "water_temp", "plain", "avail_x"]


def test_winnow_fingerprints_batch_matches_reference_and_detects_overlap():
    """Winnowing: vectorized batch kernel == per-doc reference on every
    edge; docs sharing a long substring share fingerprints (the winnowing
    guarantee), unrelated docs share ~none."""
    from oregonwaterdataportal_etl_ray.stages.text import RollingFingerprints
    rf = RollingFingerprints(k=8, window=4)
    shared = "a long shared passage of text that overlaps between documents"
    texts = ["", "short", "x" * 7, "x" * 8,
             "prefix one " + shared + " suffix alpha",
             "different lead-in " + shared + " other tail",
             "completely unrelated content about volcanoes and glaciers"]
    t = pa.table({"text": pa.array(texts)})
    got = rf(t)["fingerprints"].to_pylist()
    for i, s in enumerate(texts):
        assert got[i] == rf._fingerprint(s), i
    a, b, c = set(got[4]), set(got[5]), set(got[6])
    assert len(a & b) >= 3              # shared passage -> shared prints
    assert not (a & c)                  # unrelated -> disjoint


def test_circle_polygon_is_geojson_and_metrically_sound():
    """M14 (reference userCode/groundwater/lib.py:4-35 + lib_test.py): the
    ring is closed GeoJSON [(lon, lat), ...] of num_points+1 vertices, every
    vertex sits at the requested great-circle distance, and the batch kernel
    matches the scalar wrapper."""
    from oregonwaterdataportal_etl_ray.functions.geometry import (
        CirclePolygon, EARTH_RADIUS_M, FEET_TO_M, generate_circle_polygon)
    polygon = generate_circle_polygon(
        center_lat=37.7749, center_lon=-122.4194, radius_feet=1000, num_points=12)
    assert polygon and len(polygon) == 1            # one ring (GeoJSON polygon)
    ring = polygon[0]
    assert len(ring) == 13                          # closed: 12 points + repeat
    assert ring[0] == ring[-1]
    for item in ring:
        assert isinstance(item, tuple) and len(item) == 2
        assert isinstance(item[0], float) and isinstance(item[1], float)
    # metric soundness: haversine distance of every vertex == radius (<0.1%)
    lat1, lon1 = np.radians(37.7749), np.radians(-122.4194)
    for lon, lat in ring[:-1]:
        la, lo = np.radians(lat), np.radians(lon)
        h = (np.sin((la - lat1) / 2) ** 2 +
             np.cos(lat1) * np.cos(la) * np.sin((lo - lon1) / 2) ** 2)
        dist = 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(h))
        assert abs(dist - 1000 * FEET_TO_M) < 0.3, dist
    # batch kernel == scalar wrapper
    t = pa.table({"lat": [37.7749, 45.0], "lon": [-122.4194, -120.0],
                  "radius_feet": [1000.0, 250.0]})
    out = CirclePolygon()(t)
    got = out["polygon"][0].as_py()[0]
    assert [(p[0], p[1]) for p in got] == [list(x) for x in ring] or \
           [tuple(p) for p in got] == ring


def test_bloom_filter_no_false_negatives_and_bounded_fpp():
    from oregonwaterdataportal_etl_ray.stages.joins import BloomFilter
    rng = np.random.default_rng(3)
    members = rng.choice(10_000_000, size=50_000, replace=False)
    bf = BloomFilter(len(members), fpp=0.01)
    bf.add(members)
    assert bf.contains(members).all()  # zero false negatives, by construction
    outsiders = np.setdiff1d(rng.choice(10_000_000, size=100_000), members)
    fpp = bf.contains(outsiders).mean()
    assert fpp < 0.03, fpp


def test_bloom_membership_filter_is_exact(ray_session):
    import ray
    from oregonwaterdataportal_etl_ray.stages.joins import BloomFilter, BloomMembershipFilter
    keys = np.arange(0, 1000, 3)
    bf = BloomFilter(len(keys), fpp=0.05)
    bf.add(keys)
    t = pa.table({"k": pa.array(np.arange(1000), pa.int64())})
    f_semi = BloomMembershipFilter(ray.put(bf), ray.put(keys), "k", keep=True)
    f_anti = BloomMembershipFilter(ray.put(bf), ray.put(keys), "k", keep=False)
    semi = f_semi(t)["k"].to_numpy()
    anti = f_anti(t)["k"].to_numpy()
    assert set(semi) == set(keys.tolist())          # exact despite Bloom FPs
    assert set(anti) == set(range(1000)) - set(keys.tolist())


def test_ngram_pair_verifier_matches_scalar_reference(ray_session):
    """The distributed pair-verify stage must agree exactly with the scalar
    exact_ngram_jaccard on every pair, including short-text padding."""
    from oregonwaterdataportal_etl_ray.stages.dedup import NgramPairVerifier
    texts = {
        1: "the quick brown fox jumps over the lazy dog " * 10,
        2: ("the quick brown fox jumps over the lazy dog " * 10).replace("lazy", "sleepy"),
        3: "completely different content about databases " * 10,
        4: "ab",          # shorter than k -> zero-padded single shingle
        5: "ab",
    }
    tbl = pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                    "text": pa.array(list(texts.values()))})
    pairs = [(1, 2), (1, 3), (2, 3), (4, 5), (1, 4)]
    batch = pa.table({"id_a": pa.array([a for a, _ in pairs], pa.int64()),
                      "id_b": pa.array([b for _, b in pairs], pa.int64())})
    ver = NgramPairVerifier(tbl, k=5)   # texts_ref may be a plain table
    got = ver(batch)
    for (a, b), jac in zip(pairs, got["jaccard"].to_pylist()):
        assert jac == pytest.approx(exact_ngram_jaccard(texts[a], texts[b], k=5))
    assert got["jaccard"].to_pylist()[3] == 1.0   # identical short docs


def test_token_ngrams_matches_scalar_reference():
    from oregonwaterdataportal_etl_ray.stages.text import token_ngrams
    texts = ["The quick  brown fox", "a b", "", "   ", "x y z x y z",
             "ONE two THREE four"]
    col = pa.chunked_array([pa.array(texts[:3]), pa.array(texts[3:])])
    doc_idx, grams = token_ngrams(col, n=3)

    def scalar(s):
        t = s.strip().lower().split()
        return [" ".join(t[i:i + 3]) for i in range(len(t) - 2)]

    expect = [(i, g) for i, s in enumerate(texts) for g in scalar(s)]
    assert list(zip(doc_idx.tolist(), grams.tolist())) == expect
    # rows with <3 tokens or blank text emit nothing
    assert 1 not in doc_idx and 2 not in doc_idx and 3 not in doc_idx


def test_hot_ngram_flags_planted_boilerplate(ray_session, tmp_path):
    """A doc that is one 3-gram repeated corpus-wide must score hot_ratio 1.0;
    a doc of globally-unique tokens must score 0.0 — independent of how the
    gram occurrences split across blocks."""
    import pyarrow.parquet as pq
    from oregonwaterdataportal_etl_ray.pipelines.queries import QUERIES
    boiler = "lorem ipsum dolor"  # one gram, planted in many docs
    docs = [{"doc_id": i, "text": f"{boiler} tail{i}", "lang": "en",
             "source": "s", "n_chars": 0} for i in range(10)]
    docs.append({"doc_id": 99, "text": "uniq1 uniq2 uniq3 uniq4",
                 "lang": "en", "source": "s", "n_chars": 0})
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(docs), f"{sf}/documents.parquet")
    out = QUERIES["hot_ngram_flags"](sf).to_pandas().set_index("doc_id")
    # docs 0..9 share the gram "lorem ipsum dolor" (freq 10 >= K=5); their
    # other gram ("dolor tail{i}" etc.) is unique -> ratio strictly between
    assert out.loc[0, "n_grams"] == 2 and out.loc[0, "n_hot"] == 1
    assert out.loc[99, "n_hot"] == 0 and out.loc[99, "hot_ratio"] == 0.0


def test_hot_ngram_skew_guard_bounds_shuffle_rows(ray_session, tmp_path):
    """The skew guard's law: an ultra-hot gram (one gram repeated 100x the
    median per-gram frequency inside a doc) ships ONE weighted row per
    (doc, gram) into the shuffle, never one row per occurrence — so a
    boilerplate gram's partition grows with distinct docs, not occurrences.
    And the weighted path must still produce oracle-identical stats."""
    import duckdb
    import pyarrow.parquet as pq
    from oregonwaterdataportal_etl_ray.pipelines.queries import (
        ORACLE_SQL, QUERIES, _hot_ngram_explode)
    hot = ("spam " * 302).strip()           # ~300 copies of the "spam spam
    docs = [{"doc_id": 0, "text": hot,       # spam" gram in ONE doc
             "lang": "en", "source": "s", "n_chars": 0}]
    docs += [{"doc_id": i, "text": f"alpha{i} beta{i} gamma{i} delta{i}",
              "lang": "en", "source": "s", "n_chars": 0} for i in range(1, 8)]
    t = pa.Table.from_pylist(docs)

    ex = _hot_ngram_explode(t.select(["doc_id", "text"]), nb=8)
    per_doc = ex.to_pandas().groupby("doc_id").size()
    # doc 0 has 300 occurrences of one gram -> exactly 1 shuffled row
    assert per_doc[0] == 1
    assert ex.to_pandas().set_index("doc_id").loc[0, "cnt"] == 300
    assert per_doc[1] == 2                  # 2 distinct grams, 2 rows

    sf = str(tmp_path)
    pq.write_table(t, f"{sf}/documents.parquet")
    got = QUERIES["hot_ngram_flags"](sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.sql(ORACLE_SQL["hot_ngram_flags"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_ngram_pair_verifier_names_missing_doc_ids():
    """A candidate pair referencing a doc absent from the pushdown-read text
    table must fail with the offending ids in the message (not an opaque
    in-actor KeyError) — the documents file changed between the memoized
    pair build and the verify pass."""
    from oregonwaterdataportal_etl_ray.stages.dedup import NgramPairVerifier
    texts = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["a b c d e f", "a b c d e g"])})
    v = NgramPairVerifier(texts, k=5)
    ok = v(pa.table({"id_a": pa.array([1], pa.int64()),
                     "id_b": pa.array([2], pa.int64())}))
    assert ok.num_rows == 1
    with pytest.raises(ValueError, match=r"\[7\]"):
        v(pa.table({"id_a": pa.array([1], pa.int64()),
                    "id_b": pa.array([7], pa.int64())}))


def test_benchmark_decontaminate_flags_planted_overlap(ray_session, tmp_path):
    import duckdb
    from oregonwaterdataportal_etl_ray.pipelines.queries import QUERIES, ORACLE_SQL
    sf = "/root/testdata/sf0.001"
    got = QUERIES["benchmark_decontaminate"](sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.sql(ORACLE_SQL["benchmark_decontaminate"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"n_hits": "int64"}), 
                                  want.astype({"n_hits": "int64"}))


def test_bigram_lm_scores_natural_text_better(ray_session):
    """LM-perplexity quality-filter laws: (1) in-distribution text scores
    strictly fewer bits than byte-shuffled text under a model trained on the
    corpus; (2) scoring is deterministic; (3) docs shorter than one bigram
    emit nothing."""
    import numpy as np
    import pyarrow as pa
    import ray as _ray
    from oregonwaterdataportal_etl_ray.stages.text import (
        BigramLmScorer, byte_bigram_counts)
    corpus = ["the quick brown fox jumps over the lazy dog. " * 20,
              "pack my box with five dozen liquor jugs. " * 20] * 10
    sparse = byte_bigram_counts(pa.table({"text": pa.array(corpus)}))
    counts = np.zeros(65536, np.int64)
    counts[sparse["gram"].to_numpy(zero_copy_only=False)] = \
        sparse["n"].to_numpy(zero_copy_only=False)
    ref = _ray.put(counts)
    natural = "the quick brown dog jumps over the lazy fox. "
    rng = np.random.default_rng(7)
    shuffled = bytes(rng.permutation(
        np.frombuffer(natural.encode(), np.uint8))).decode("latin-1")
    scorer = BigramLmScorer(ref)
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array([natural, shuffled, "x"])})
    out = scorer(t)
    assert out["doc_id"].to_pylist() == [1, 2]   # "x" has no bigram
    nat, shuf = out["nll_bits"].to_pylist()
    assert nat < shuf, (nat, shuf)
    out2 = scorer(t)
    assert out.equals(out2)


def test_empty_batch_safety_of_vector_stages():
    """Empty Arrow blocks (empty fragments, fully-filtered blocks) must pass
    through the vectorized stages, not crash them: reshape(0, -1) raises in
    numpy, np.r_[True, ...] on an empty batch fabricates a group, and NaN
    dictionary indices cast to undefined ints."""
    import numpy as np
    import pyarrow as pa

    from oregonwaterdataportal_etl_ray.stages.ann import _matrix
    from oregonwaterdataportal_etl_ray.stages.dedup import BandExploder
    from oregonwaterdataportal_etl_ray.stages.sketch import digest_rows

    assert _matrix(pa.array([], pa.list_(pa.float32()))).shape == (0, 0)

    empty_sig = pa.table({"doc_id": pa.array([], pa.int64()),
                          "minhash": pa.array([], pa.list_(pa.uint64()))})
    out = BandExploder(num_bands=4)(empty_sig)
    assert out.num_rows == 0 and "band_hash" in out.column_names

    empty = pa.table({"g": pa.array([], pa.string()),
                      "v": pa.array([], pa.float64())})
    d = digest_rows(empty, "g", "v")
    assert d.num_rows == 0 and d["d_means"].type == pa.list_(pa.float64())


def test_keep_last_null_keys_are_distinct_groups():
    """NULL key components: (x, NULL) and (y, NULL) are DISTINCT groups and
    all-null keys form one well-defined group — previously NaN dictionary
    indices cast to an undefined int collapsed them unpredictably."""
    import pyarrow as pa

    from oregonwaterdataportal_etl_ray.stages.kernels import keep_last_by

    t = pa.table({
        "a": pa.array(["x", "x", "y", None, None], pa.string()),
        "b": pa.array([None, None, None, "q", "q"], pa.string()),
        "ord": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    out = keep_last_by(t, ["a", "b"], ["ord"]).to_pandas() \
        .sort_values("ord").reset_index(drop=True)
    # groups: (x,NULL) -> ord 2; (y,NULL) -> ord 3; (NULL,q) -> ord 5
    assert list(out["ord"]) == [2, 3, 5]


def test_broadcast_lookup_null_value_is_not_a_miss(ray_session):
    """A lookup key whose first taken column is legitimately null must
    survive on_miss='drop' and not trip on_miss='error' — miss means the
    KEY is absent from the lookup index, not that its value is null."""
    import pandas as pd
    import pyarrow as pa
    import pytest

    from oregonwaterdataportal_etl_ray.stages.joins import BroadcastLookup

    lookup = pd.DataFrame({"k": [1, 2], "val": [None, "b"]}).set_index("k")
    batch = pa.table({"k": pa.array([1, 2, 3], pa.int64())})

    kept = BroadcastLookup(lookup, "k", ["val"], on_miss="drop")(batch)
    assert kept["k"].to_pylist() == [1, 2]      # key 1 kept despite null val

    with pytest.raises(KeyError, match="1 stream keys"):
        BroadcastLookup(lookup, "k", ["val"], on_miss="error")(batch)
    ok = BroadcastLookup(lookup, "k", ["val"], on_miss="error")(
        pa.table({"k": pa.array([1, 2], pa.int64())}))
    assert ok.num_rows == 2


def test_window_kernels_accept_int_value_columns():
    """asof/rolling kernels must accept an int64 no-null value column
    (np.isnan raises on integer arrays)."""
    import pyarrow as pa

    from oregonwaterdataportal_etl_ray.stages.window import (
        asof_prev_group, rolling_avg_group)

    t = pa.table({
        "user_id": pa.array([1] * 6, pa.int64()),
        "ts": pa.array(range(6), pa.int64()),
        "event_id": pa.array(range(6), pa.int64()),
        "event_type": pa.array(["view", "click"] * 3, pa.string()),
        "value": pa.array([10, 20, 30, 40, 50, 60], pa.int64()),
    })
    out = asof_prev_group(t)
    assert out.num_rows == 3
    ra = rolling_avg_group(t, window=2)
    assert ra.num_rows == 6


def test_compression_ratio_laws(ray_session):
    """Compressibility laws: repetitive text compresses far better than
    high-entropy text, ratios are deterministic, empty text is safe, and
    the distributed drive equals the local kernel."""
    import numpy as np
    import pyarrow as pa

    import ray

    from oregonwaterdataportal_etl_ray.stages.text import CompressionRatio

    rng = np.random.default_rng(3)
    noisy = "".join(chr(33 + int(x)) for x in rng.integers(0, 90, 4000))
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["spam " * 800, noisy, ""], pa.string()),
    })
    out = CompressionRatio()(t).to_pandas().set_index("doc_id")
    assert out.loc[1, "compression_ratio"] < 0.05          # boilerplate
    assert out.loc[2, "compression_ratio"] > 0.5           # high entropy
    assert out.loc[3, "n_bytes"] == 0
    again = CompressionRatio()(t).to_pandas().set_index("doc_id")
    assert (out["compression_ratio"] == again["compression_ratio"]).all()

    ds = ray.data.from_arrow(t)
    dist = (ds.map_batches(CompressionRatio, batch_format="pyarrow",
                           batch_size=2, concurrency=2)
              .to_pandas().set_index("doc_id").sort_index())
    assert (dist["n_compressed"] == out["n_compressed"].sort_index()).all()


def test_null_and_whitespace_edge_tolerance():
    """Latent-input hardening laws: null group keys form an ordinary group
    in the sketch combiners (SQL GROUP BY semantics, no argsort TypeError),
    LangId scores null text as 'unknown' instead of crashing, null text
    stays NULL through CompressionRatio, and kernel/SQL trim parity holds
    for tab/newline-padded text."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from oregonwaterdataportal_etl_ray.stages.sketch import digest_rows
    from oregonwaterdataportal_etl_ray.stages.text import (
        CompressionRatio, LangId, token_count)

    d = digest_rows(pa.table({"g": pa.array(["a", None, "a"], pa.string()),
                              "v": pa.array([1.0, 2.0, 3.0])}), "g", "v")
    assert set(map(str, d["g"].to_pylist())) == {"a", "None"} and len(d) == 2

    li = LangId()(pa.table({"text": pa.array(["the cat and the hat", None],
                                             pa.string())})).to_pandas()
    assert li["lang_pred"].tolist()[1] == "unknown"

    cr = CompressionRatio()(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array([None], pa.string())})).to_pandas()
    assert cr["compression_ratio"].isna().all()

    # trim parity vs DuckDB on edge whitespace the fixtures never contain
    txt = "\tfoo bar\n"
    ours = token_count(pa.table({"text": pa.array([txt], pa.string())}))
    sql = duckdb.sql(
        "SELECT len(regexp_split_to_array(trim(?, ' '||chr(9)||chr(10)||"
        "chr(13)||chr(12)||chr(11)), '\\s+')) AS n", params=[txt]).fetchone()[0]
    assert ours["n_tokens"][0].as_py() == sql == 2


def test_chunk_documents_multi_window_edges(ray_session, tmp_path):
    """Chunk-boundary laws on planted lengths the fixtures never reach
    (every sf-corpus doc is < 1 window): n == overlap -> 1 chunk,
    n == size -> 1 chunk, n == size+1 -> 2 overlapping chunks, long docs
    tile with stride coverage (no token left uncovered), blank text emits
    nothing. Verified against the same DuckDB oracle on the planted table."""
    import duckdb
    import pyarrow.parquet as pq
    from oregonwaterdataportal_etl_ray.pipelines.queries import (
        ORACLE_SQL, QUERIES)
    docs = [
        {"doc_id": 0, "text": " ".join(f"t{i}" for i in range(32))},
        {"doc_id": 1, "text": " ".join(f"t{i}" for i in range(128))},
        {"doc_id": 2, "text": " ".join(f"t{i}" for i in range(129))},
        {"doc_id": 3, "text": " ".join(f"t{i}" for i in range(300))},
        {"doc_id": 4, "text": "   "},
        {"doc_id": 5, "text": "one"},
    ]
    for d in docs:
        d.update({"lang": "en", "source": "s", "n_chars": len(d["text"])})
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(docs), f"{sf}/documents.parquet")
    got = QUERIES["chunk_documents"](sf).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)

    per_doc = got.groupby("doc_id").size().to_dict()
    assert per_doc == {0: 1, 1: 1, 2: 2, 3: 3, 5: 1}   # doc 4 (blank): none
    d3 = got[got["doc_id"] == 3]
    assert d3["start_tok"].tolist() == [0, 96, 192]
    assert d3["end_tok"].tolist() == [128, 224, 300]
    # coverage law: next chunk starts inside the previous one (overlap 32)
    assert (d3["start_tok"].to_numpy()[1:]
            < d3["end_tok"].to_numpy()[:-1]).all()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.sql(ORACLE_SQL["chunk_documents"]).df() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns].astype("int64"),
                                  want.astype("int64"))


def test_source_token_budget_cross_block_cumsum(ray_session, monkeypatch):
    """The per-source running budget must be exact when a source's rows
    scatter across many blocks (the bucket shuffle must co-locate them
    before the cumsum), and the cut is strictly doc_id-ordered."""
    import numpy as np
    import ray

    from oregonwaterdataportal_etl_ray.pipelines import queries as Q

    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": rng.choice(["a", "b", "c"], n),
        "n_chars": rng.integers(100, 2000, n).astype(np.int64)})
    shuffled = df.sample(frac=1.0, random_state=2).reset_index(drop=True)
    t = pa.Table.from_pandas(shuffled, preserve_index=False)

    def fake_read_table(sf_dir, name, columns=None, **kw):
        return ray.data.from_arrow(t.select(columns)).repartition(16)

    monkeypatch.setattr(Q, "read_table", fake_read_table)
    got = Q.QUERIES["source_token_budget"]("<unused>").to_pandas() \
        .sort_values(["source", "doc_id"]).reset_index(drop=True)

    want = df.sort_values(["source", "doc_id"]).copy()
    want["cum_chars"] = want.groupby("source")["n_chars"].cumsum()
    want = want[want["cum_chars"] <= 50_000].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["source", "doc_id", "n_chars", "cum_chars"]],
        want[["source", "doc_id", "n_chars", "cum_chars"]])


def test_redact_pii_planted(ray_session, tmp_path):
    """The fixture corpus contains no PII, so the oracle gate is trivially
    green there — plant emails and phone shapes and verify the Ray kernel
    against the DuckDB oracle AND the contract laws (emails redact first so
    their digits never double-count as phones; mixed separators; the
    optional extension group does not swallow trailing text)."""
    import duckdb
    import pyarrow.parquet as pq
    from oregonwaterdataportal_etl_ray.pipelines.queries import (
        ORACLE_SQL, QUERIES)
    docs = [
        {"doc_id": 0, "text": "mail bob@x.co or +1-555-123-4567 x"},
        {"doc_id": 1, "text": "call 555.123.4567 then 1-800-555-0199 end"},
        {"doc_id": 2, "text": "a.b+tag@sub.domain.org and no digits"},
        {"doc_id": 3, "text": "clean text only"},
        {"doc_id": 4, "text": "x9@y.io9 edge 1-234-5678"},
    ]
    for d in docs:
        d.update({"lang": "en", "source": "s", "n_chars": len(d["text"])})
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(docs), f"{sf}/documents.parquet")
    got = QUERIES["redact_pii"](sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.sql(ORACLE_SQL["redact_pii"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
    assert got.loc[0, "redacted"] == "mail <EMAIL> or <PHONE> x"
    assert got.loc[0, "n_emails"] == 1 and got.loc[0, "n_phones"] == 1
    assert got.loc[1, "n_phones"] == 2
    assert got.loc[3, "redacted"] == "clean text only"
    assert int(got["n_emails"].sum()) >= 3   # PII actually planted


def test_null_group_keys_do_not_crash_grouped_queries(ray_session, monkeypatch):
    """Regression (code-review finding): a NULL lang/source row NaN-poisoned
    the dictionary indices inside dup_cluster_assign's edge builder and
    source_token_budget's cumsum (IndexError in the task). NULL keys must
    form ONE group (SQL GROUP BY / PARTITION BY semantics) and
    source_token_budget must emit NULL (not a sentinel) in its output."""
    import numpy as np
    import ray

    from oregonwaterdataportal_etl_ray.pipelines import queries as Q

    df = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "lang": ["en", None, "en", None, "de", "de", None, "en"],
        "source": ["s", "s", "s", "s", None, None, "s", "s"],
        "n_chars": np.full(8, 10, dtype=np.int64)})
    t = pa.Table.from_pandas(df, preserve_index=False)

    def fake_read_table(sf_dir, name, columns=None, **kw):
        return ray.data.from_arrow(t.select(columns)).repartition(4)

    monkeypatch.setattr(Q, "read_table", fake_read_table)

    cc = Q.QUERIES["dup_cluster_assign"]("<unused>").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # (None,'s') docs 1,3,6 are one group -> component 1; ('de',None) 4,5 -> 4
    got = dict(zip(cc["doc_id"], cc["component"]))
    assert got[1] == 1 and got[3] == 1 and got[6] == 1
    assert got[4] == 4 and got[5] == 4

    budget = Q.QUERIES["source_token_budget"]("<unused>").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(budget) == 8                 # tiny corpus: all under budget
    nulls = budget[budget["source"].isna()]
    assert sorted(nulls["doc_id"]) == [4, 5]          # NULL restored, not a
    assert set(nulls["cum_chars"]) == {10, 20}        # sentinel string


def test_stage_null_and_edge_hardening(ray_session):
    """Regression block for the round-4 stages review (each verified by
    execution before the fix):
      - a NULL order value LOSES the LWW in both kernels (NaN used to sort
        greatest and beat every real timestamp), and int64 orders past 2^53
        keep exact precision (no float64 round-trip);
      - composite group keys are INJECTIVE under embedded separators;
      - empty batches pass through EmbedNearDup / IVFAssign / HyperplaneLSH;
      - window kernels accept NULL keys (one SQL-style partition, NULL
        preserved in output);
      - BroadcastLookup misses become typed NULLs, not float64 NaN;
      - QualityScore propagates NULL text as NULL score/ratio."""
    import numpy as np
    import ray

    from oregonwaterdataportal_etl_ray.stages.ann import (EmbedNearDup,
                                                          HyperplaneLSH)
    from oregonwaterdataportal_etl_ray.stages.joins import BroadcastLookup
    from oregonwaterdataportal_etl_ray.stages.window import lag_group

    # LWW null-order + 2^53 precision
    t = pa.table({"k": ["a", "a"], "ts": pa.array([1000, None], pa.int64()),
                  "v": [1, 2]})
    assert keep_last_by(t, ["k"], ["ts"])["v"].to_pylist() == [1]
    assert keep_first_by(t, ["k"], ["ts"])["v"].to_pylist() == [1]
    big = pa.table({"k": ["a", "a"],
                    "ts": pa.array([2 ** 53 + 1, 2 ** 53], pa.int64()),
                    "v": [1, 2]})
    assert keep_last_by(big, ["k"], ["ts"])["v"].to_pylist() == [1]

    # composite-key injectivity under embedded \x1f
    comp = pa.table({"k1": ["a\x1fb", "a"], "k2": ["c", "b\x1fc"],
                     "o": [1, 2], "v": [1, 2]})
    assert keep_last_by(comp, ["k1", "k2"], ["o"]).num_rows == 2

    # ANN stages on empty blocks
    empty = pa.table({"vec_id": pa.array([], pa.int64()),
                      "embedding": pa.array([], pa.list_(pa.float32()))})
    end = EmbedNearDup({"ids": np.array([5], np.int64),
                        "matrix": np.eye(1, 2)}, tau=0.4)
    assert end(empty).num_rows == 0
    assert HyperplaneLSH(dim=2)(empty).num_rows == 0

    # window kernel with NULL keys
    w = pa.table({"user_id": pa.array(["u", None, "u", None], pa.string()),
                  "ts": pa.array([1, 2, 3, 4], pa.timestamp("us")),
                  "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "value": pa.array([1.0, 2.0, 3.0, 4.0])})
    lag = lag_group(w).to_pandas().sort_values("event_id")
    assert lag["prev_value"].tolist()[2] == 1.0     # u chain
    assert lag["prev_value"].tolist()[3] == 2.0     # NULL partition chain
    assert lag["user_id"].isna().sum() == 2         # NULL preserved

    # typed-null lookup misses
    lk = pd.DataFrame({"k": ["a"], "n": pd.array([10], dtype="int64")}) \
        .set_index("k")
    out = BroadcastLookup(lk, stream_key="k", take_cols=["n"])(
        pa.table({"k": pa.array(["a", "zz"])}))
    assert str(out.schema.field("n").type) == "int64"
    assert out["n"].to_pylist() == [10, None]

    # NULL text -> NULL score
    qs = QualityScore()(pa.table({"text": pa.array(["hi", None], pa.string())}))
    assert qs["quality_score"].to_pylist()[1] is None
