"""Debezium JSON envelope source adapter (sources/debezium.py): vectorized
flatten laws, and full round-trips — canonical corpus -> envelope JSONL ->
staged batches -> engine replay must reconverge to the replay of the
ORIGINAL corpus (sha256 row equality for lww; sequential-oracle equality
for patch)."""

import io
import json

import pyarrow as pa
import pyarrow.json as pj
import pytest

from oregonwaterdataportal_etl_ray.cdc import CdcEngine, oracle_replay
from oregonwaterdataportal_etl_ray.cdc.patch import oracle_patch_replay
from oregonwaterdataportal_etl_ray.fixtures import GeneratorSpec
from oregonwaterdataportal_etl_ray.fixtures.events import (
    events_to_debezium_jsonl, generate_change_events, generate_patch_events)
from oregonwaterdataportal_etl_ray.sources.debezium import (
    flatten_envelopes, stage_debezium_jsonl)

KEYS = ["repo", "path"]
VALS = ["lang", "content"]


def _parse(lines):
    return pj.read_json(io.BytesIO("\n".join(
        json.dumps(e) for e in lines).encode()))


def _env_u(repo, path, lsn, op="u", tx=True, **vals):
    src = {"lsn": lsn}
    if tx:
        src["txId"] = f"t{lsn}"   # realistic opaque transaction label
    return {"before": None, "after": {"repo": repo, "path": path, **vals},
            "op": op, "source": src}


def _env_d(repo, path, lsn, tx=True):
    src = {"lsn": lsn}
    if tx:
        src["txId"] = f"t{lsn}"
    return {"before": {"repo": repo, "path": path}, "after": None,
            "op": "d", "source": src}


def test_flatten_upserts_deletes_and_commit_sources():
    t = _parse([
        _env_u("r", "a", 1, op="c", lang="py", content="c1"),
        _env_u("r", "a", 2, op="u", lang=None, content="c2"),
        _env_u("r", "b", 3, op="r", lang="go", content="c3", tx=False),
        _env_d("r", "a", 4),
    ])
    out = flatten_envelopes(t, KEYS, VALS).to_pandas()
    assert list(out["repo"]) == ["r"] * 4
    assert list(out["path"]) == ["a", "a", "b", "a"]   # delete key from before
    assert out["commit"][0] == "000000000001-t1"   # lsn prefix + txId suffix
    assert out["commit"][2] == "000000000003"      # synthesized from lsn
    assert out["content"][3] is None                   # delete -> tombstone
    assert out["lang"][1] is None


def test_flatten_emit_op_maps_crud_to_ud():
    t = _parse([_env_u("r", "a", 1, op="c", content="x", lang=None),
                _env_d("r", "a", 2)])
    out = flatten_envelopes(t, KEYS, VALS, emit_op=True).to_pandas()
    assert list(out["op"]) == ["u", "d"]


def test_flatten_all_upsert_and_all_delete_files():
    # no deletes: `before` infers as null-type; no upserts: `after` does
    up = flatten_envelopes(
        _parse([_env_u("r", "a", 1, content="x", lang="py")]), KEYS, VALS)
    assert up.column("path")[0].as_py() == "a"
    de = flatten_envelopes(_parse([_env_d("r", "a", 2)]), KEYS, VALS)
    assert de.column("path")[0].as_py() == "a"
    assert de.column("content")[0].as_py() is None


def test_flatten_rejects_unknown_op_and_missing_lsn():
    bad_op = _parse([{"before": None, "after": {"repo": "r", "path": "a"},
                      "op": "z", "source": {"lsn": 1}}])
    with pytest.raises(ValueError, match="op outside"):
        flatten_envelopes(bad_op, KEYS, VALS)
    no_lsn = _parse([{"before": None, "after": {"repo": "r", "path": "a"},
                      "op": "u", "source": {"other": 1}}])
    with pytest.raises(ValueError, match="source.lsn"):
        flatten_envelopes(no_lsn, KEYS, VALS)


def test_flatten_real_postgres_txids_order_by_lsn():
    """A real Postgres txId ('569' — digits, no positional meaning) must
    never become the version order: the commit is ALWAYS the 12-digit LSN
    prefix, txId an opaque suffix. Covers string digits, int-typed txId
    (pyarrow.json infers int64), and the lexicographic-order law."""
    t = _parse([
        {"before": None, "after": {"repo": "r", "path": "a", "lang": "py",
                                   "content": "v1"},
         "op": "c", "source": {"lsn": 9, "txId": "569"}},
        {"before": None, "after": {"repo": "r", "path": "a", "lang": "py",
                                   "content": "v2"},
         "op": "u", "source": {"lsn": 10, "txId": "57"}},
    ])
    out = flatten_envelopes(t, KEYS, VALS).to_pandas()
    assert list(out["commit"]) == ["000000000009-569", "000000000010-57"]
    # int(commit[:12]) is the engine's version order — later lsn wins even
    # though '57' < '569' lexicographically
    assert int(out["commit"][1][:12]) > int(out["commit"][0][:12])

    tint = _parse([{"before": None,
                    "after": {"repo": "r", "path": "a", "lang": None,
                              "content": "x"},
                    "op": "u", "source": {"lsn": 3, "txId": 42}}])
    oi = flatten_envelopes(tint, KEYS, VALS).to_pandas()
    assert oi["commit"][0] == "000000000003-42"


def test_flatten_rejects_lsn_outside_12_digit_prefix():
    for bad in (10 ** 12, -1):
        t = _parse([{"before": None,
                     "after": {"repo": "r", "path": "a", "lang": None,
                               "content": "x"},
                     "op": "u", "source": {"lsn": bad}}])
        with pytest.raises(ValueError, match="12-digit"):
            flatten_envelopes(t, KEYS, VALS)


@pytest.fixture(scope="module")
def lww_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("dbz_lww")
    return generate_change_events(str(d), GeneratorSpec(
        n_events=6_000, n_repos=15, paths_per_repo=20, n_batches=5,
        seed=41, dup_rate=0.05, shuffle_frac=0.3, delete_rate=0.07))


def test_lww_roundtrip_matches_original_corpus(lww_corpus, tmp_path):
    jsonl = events_to_debezium_jsonl(lww_corpus["files"],
                                     str(tmp_path / "jsonl"))
    staged = stage_debezium_jsonl(jsonl, str(tmp_path / "staged"),
                                  KEYS, VALS)
    eng = CdcEngine(str(tmp_path / "state"), num_buckets=8, compact_every=2)
    eng.replay(staged, epoch_size=2)
    final = (eng.final_table().to_pandas()
             .sort_values(KEYS).reset_index(drop=True))
    oracle = (oracle_replay(lww_corpus["files"])
              .sort_values(KEYS).reset_index(drop=True))
    assert len(final) == len(oracle)
    assert list(final["sha256"]) == list(oracle["sha256"])
    assert list(final["lsn"]) == list(oracle["lsn"])
    assert list(final["commit"]) == list(oracle["commit"])  # txId carried


def test_patch_roundtrip_matches_original_corpus(tmp_path):
    meta = generate_patch_events(str(tmp_path / "events"), GeneratorSpec(
        n_events=4_000, n_repos=12, paths_per_repo=15, n_batches=4,
        seed=53, dup_rate=0.05, delete_rate=0.08))
    jsonl = events_to_debezium_jsonl(meta["files"], str(tmp_path / "jsonl"))
    staged = stage_debezium_jsonl(jsonl, str(tmp_path / "staged"),
                                  KEYS, VALS, emit_op=True)
    eng = CdcEngine(str(tmp_path / "state"), num_buckets=8,
                    merge_strategy="patch")
    eng.replay(staged, epoch_size=1)
    f = (eng.final_table().to_pandas()
         .sort_values(KEYS).reset_index(drop=True))
    o = oracle_patch_replay(meta["files"])
    assert len(f) == len(o)
    for col in ("repo", "path", "lsn", "content", "lang"):
        assert list(f[col].fillna("~")) == list(o[col].fillna("~")), col


def test_staging_is_idempotent(lww_corpus, tmp_path):
    jsonl = events_to_debezium_jsonl(lww_corpus["files"][:2],
                                     str(tmp_path / "jsonl"))
    out = str(tmp_path / "staged")
    first = stage_debezium_jsonl(jsonl, out, KEYS, VALS)
    import os
    mtimes = {f: os.path.getmtime(f) for f in first}
    second = stage_debezium_jsonl(jsonl, out, KEYS, VALS)
    assert first == second
    assert all(os.path.getmtime(f) == mtimes[f] for f in second)
