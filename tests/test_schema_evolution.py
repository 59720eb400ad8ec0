"""Schema-evolution suites (FIXTURES.md F2): column add (null-fill), widen
(int32 -> int64 safe cast), rename-alias remap (the reference's
``most_recent_operator`` -> ``organization`` pattern,
/root/reference/userCode/wrd/types.py:207)."""

import pyarrow as pa
import pytest

from oregonwaterdataportal_etl_ray.cdc import CdcEngine, EvolutionSpec, oracle_replay, plan_target_schema
from oregonwaterdataportal_etl_ray.cdc.schema import conform_batch
from oregonwaterdataportal_etl_ray.fixtures import GeneratorSpec, generate_change_events


@pytest.fixture(scope="module")
def evolving(tmp_path_factory):
    d = tmp_path_factory.mktemp("evolving")
    return generate_change_events(str(d), GeneratorSpec(
        n_events=8_000, n_repos=20, n_batches=8, seed=23,
        add_col_at=3, widen_at=6, rename_at=5))


def test_plan_unifies_add_widen_rename(evolving):
    target = plan_target_schema(evolving["files"], EvolutionSpec())
    assert target.names[:5] == ["repo", "path", "commit", "lang", "content"]
    assert target.field("size_bytes").type == pa.int64()  # widened
    assert "language" not in target.names                 # remapped to lang


def test_conform_batch_null_fills_and_casts():
    target = pa.schema([("repo", pa.string()), ("path", pa.string()),
                        ("commit", pa.string()), ("lang", pa.string()),
                        ("content", pa.string()), ("size_bytes", pa.int64())])
    early = pa.table({"repo": ["r"], "path": ["p"], "commit": ["c"],
                      "lang": ["py"], "content": ["x"]})
    out = conform_batch(early, target, EvolutionSpec())
    assert out.schema == target
    assert out["size_bytes"].null_count == 1

    renamed = pa.table({"repo": ["r"], "path": ["p"], "commit": ["c"],
                        "language": ["py"], "content": ["x"],
                        "size_bytes": pa.array([1], pa.int32())})
    out2 = conform_batch(renamed, target, EvolutionSpec())
    assert out2.schema == target
    assert out2["lang"].to_pylist() == ["py"]
    assert out2["size_bytes"].to_pylist() == [1]


def test_missing_core_column_raises(tmp_path):
    import pyarrow.parquet as pq
    p = str(tmp_path / "bad.parquet")
    pq.write_table(pa.table({"repo": ["r"], "commit": ["c"]}), p)
    with pytest.raises(ValueError, match="missing core columns"):
        plan_target_schema([p], EvolutionSpec())


def test_replay_across_schema_evolution_matches_oracle(evolving, tmp_path):
    """Engine replay over batches whose schema changes mid-stream equals the
    oracle, and the final table presents ONE unified schema."""
    eng = CdcEngine(str(tmp_path / "state"), num_buckets=8, compact_every=3)
    eng.replay(evolving["files"], epoch_size=2)
    final = eng.final_table().to_pandas()
    oracle = oracle_replay(evolving["files"])
    assert len(final) == len(oracle)
    f = final.sort_values(["repo", "path"]).reset_index(drop=True)
    o = oracle.sort_values(["repo", "path"]).reset_index(drop=True)
    assert list(f["sha256"]) == list(o["sha256"])
    assert "size_bytes" in final.columns and "language" not in final.columns
    # rows that won before the size_bytes column existed are null-filled
    assert f.loc[f["lsn"] == o["lsn"], :].shape[0] == len(f)


def test_separator_in_key_values_stays_injective(tmp_path, ray_session):
    """('a\\x1fb', 'c') and ('a', 'b\\x1fc') are DISTINCT primary keys: the
    length-prefixed key encoding must keep both rows (a bare join collapsed
    them to one LWW survivor)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from oregonwaterdataportal_etl_ray.cdc import CdcEngine

    f = str(tmp_path / "b0.parquet")
    pq.write_table(pa.table({
        "repo": ["a\x1fb", "a"],
        "path": ["c", "b\x1fc"],
        "commit": ["000000000001-x", "000000000002-y"],
        "lang": ["py", "py"],
        "content": ["one", "two"],
    }), f)
    eng = CdcEngine(str(tmp_path / "s"), num_buckets=4)
    eng.replay([f])
    final = eng.final_table(with_sha=False).to_pandas()
    assert len(final) == 2
    assert sorted(zip(final["repo"], final["path"])) == \
        [("a", "b\x1fc"), ("a\x1fb", "c")]


def test_null_keys_and_commits_fail_loud(tmp_path, ray_session):
    """Null PK components / commits raise with counts from BOTH the engine's
    normalize stage and the oracle — never silent collapse, never a
    null-LSN row winning LWW."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from oregonwaterdataportal_etl_ray.cdc import CdcEngine, oracle_replay

    f = str(tmp_path / "bad.parquet")
    pq.write_table(pa.table({
        "repo": ["r", None],
        "path": ["p", "q"],
        "commit": ["000000000001-x", "000000000002-y"],
        "lang": ["py", "py"],
        "content": ["one", "two"],
    }), f)
    eng = CdcEngine(str(tmp_path / "s2"), num_buckets=4)
    with pytest.raises(Exception, match="null values"):
        eng.replay([f])
    with pytest.raises(ValueError, match="null values"):
        oracle_replay([f])


def test_reserved_and_per_file_core_validation(tmp_path, ray_session):
    """Planning rejects input columns named after engine-appended columns,
    and names the specific FILE missing a core column (a single bad file
    must not slip through the union check and null-fill its LSNs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from oregonwaterdataportal_etl_ray.cdc.schema import (
        EvolutionSpec, plan_target_schema)

    good = str(tmp_path / "good.parquet")
    pq.write_table(pa.table({
        "repo": ["r"], "path": ["p"], "commit": ["000000000001-x"],
        "lang": ["py"], "content": ["c"]}), good)

    reserved = str(tmp_path / "reserved.parquet")
    pq.write_table(pa.table({
        "repo": ["r"], "path": ["p"], "commit": ["000000000001-x"],
        "lang": ["py"], "content": ["c"], "lsn": [7]}), reserved)
    with pytest.raises(ValueError, match="reserved engine column"):
        plan_target_schema([good, reserved], EvolutionSpec())

    nocommit = str(tmp_path / "nocommit.parquet")
    pq.write_table(pa.table({
        "repo": ["r"], "path": ["p"], "lang": ["py"], "content": ["c"]}),
        nocommit)
    with pytest.raises(ValueError, match="nocommit.parquet"):
        plan_target_schema([good, nocommit], EvolutionSpec())


def test_v1_layout_dir_refused(tmp_path, ray_session):
    """A state dir persisted under key-encoding v1 must refuse v2 replay
    (bucket placement differs — same corruption class as bucket-count
    drift)."""
    import json
    import os

    import pytest

    from oregonwaterdataportal_etl_ray.cdc import CdcEngine

    state = str(tmp_path / "s3")
    os.makedirs(state)
    with open(os.path.join(state, "layout.json"), "w") as f:
        json.dump({"num_buckets": 8}, f)   # v1: no key_encoding field
    with pytest.raises(ValueError, match="key-encoding"):
        CdcEngine(state, num_buckets=8)
