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
