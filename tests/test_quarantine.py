"""Dead-letter (quarantine) path: malformed events are routed, not fatal.

The engine's default stays fail-loud (the reference's strict-validator law,
/root/reference/userCode/wrd/types.py:120-168 — M15); ``quarantine=True``
instead ships bad rows through the same single shuffle to a quarantine
parquet table with a per-row reason, and the LSM state converges to exactly
the replay of the well-formed subset."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from oregonwaterdataportal_etl_ray.cdc import CdcEngine
from oregonwaterdataportal_etl_ray.fixtures import (GeneratorSpec,
                                                    generate_change_events)

# (file index, row position, malformation) — fixed, deterministic
POISON = [
    (1, 3, "null_path"),
    (1, 17, "null_commit"),
    (3, 5, "bad_commit"),
    (3, 6, "bad_commit"),
    (4, 9, "null_repo"),
]
EXPECT_REASONS = {"null_key_or_commit": 3, "unparseable_lsn_prefix": 2}


def _mask(n: int, pos: list[int]) -> pa.Array:
    m = np.zeros(n, dtype=bool)
    m[pos] = True
    return pa.array(m)


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    """clean corpus + poisoned copy + clean-minus-poisoned-rows copy."""
    clean = tmp_path_factory.mktemp("clean")
    meta = generate_change_events(str(clean), GeneratorSpec(
        n_events=6_000, n_repos=15, paths_per_repo=20, n_batches=6,
        seed=23, dup_rate=0.06, shuffle_frac=0.3, delete_rate=0.06))
    poisoned = tmp_path_factory.mktemp("poisoned")
    filtered = tmp_path_factory.mktemp("filtered")
    pfiles, ffiles = [], []
    by_file: dict[int, list[tuple[int, str]]] = {}
    for fi, pos, kind in POISON:
        by_file.setdefault(fi, []).append((pos, kind))
    for i, f in enumerate(meta["files"]):
        t = pq.read_table(f)
        hits = by_file.get(i, [])
        bad_pos = [p for p, _ in hits]
        pt = t
        for pos, kind in hits:
            m = _mask(t.num_rows, [pos])
            if kind == "null_path":
                col, name = pc.if_else(m, pa.scalar(None, pa.string()), pt["path"]), "path"
            elif kind == "null_repo":
                col, name = pc.if_else(m, pa.scalar(None, pa.string()), pt["repo"]), "repo"
            elif kind == "null_commit":
                col, name = pc.if_else(m, pa.scalar(None, pa.string()), pt["commit"]), "commit"
            else:  # bad_commit: no 12-digit LSN prefix
                col, name = pc.if_else(m, pa.scalar("deadbeef-bad"), pt["commit"]), "commit"
            pt = pt.set_column(pt.column_names.index(name), name, col)
        pf = str(poisoned.joinpath(f"batch-{i:04d}.parquet"))
        pq.write_table(pt, pf)
        pfiles.append(pf)
        ff = str(filtered.joinpath(f"batch-{i:04d}.parquet"))
        pq.write_table(t.filter(pc.invert(_mask(t.num_rows, bad_pos))), ff)
        ffiles.append(ff)
    return {"clean": meta["files"], "poisoned": pfiles, "filtered": ffiles}


def test_default_mode_fails_loud(corpora, tmp_path):
    eng = CdcEngine(str(tmp_path / "state"), num_buckets=8)
    with pytest.raises(Exception, match="malformed change events"):
        eng.replay(corpora["poisoned"], epoch_size=2)


def test_quarantine_routes_bad_rows_and_state_matches_clean_subset(corpora, tmp_path):
    eng = CdcEngine(str(tmp_path / "q"), num_buckets=8, compact_every=2,
                    quarantine=True)
    res = eng.replay(corpora["poisoned"], epoch_size=2)
    assert res.n_quarantined == len(POISON)

    q = eng.quarantine_dataset().to_pandas()
    assert len(q) == len(POISON)
    assert q["_qreason"].value_counts().to_dict() == EXPECT_REASONS
    # quarantined rows keep their original payload for forensics
    assert set(q.columns) >= {"repo", "path", "commit", "content", "_qreason"}

    # LSM state == replay of the well-formed subset, byte-for-byte
    ref = CdcEngine(str(tmp_path / "ref"), num_buckets=8, compact_every=2)
    ref.replay(corpora["filtered"], epoch_size=2)
    f = eng.final_table().to_pandas().sort_values(["repo", "path"])
    r = ref.final_table().to_pandas().sort_values(["repo", "path"])
    assert list(f["sha256"]) == list(r["sha256"])
    assert list(f["lsn"]) == list(r["lsn"])


def test_quarantine_rerun_adds_nothing(corpora, tmp_path):
    state = str(tmp_path / "q")
    eng = CdcEngine(state, num_buckets=8, quarantine=True)
    eng.replay(corpora["poisoned"], epoch_size=3)
    n1 = eng.quarantine_dataset().count()
    res2 = CdcEngine(state, num_buckets=8, quarantine=True).replay(
        corpora["poisoned"], epoch_size=3)
    # counts re-aggregate committed lineage (same as n_applied); the point
    # is that NO NEW rows reach the dead-letter table on a rerun
    assert res2.n_quarantined == len(POISON)
    assert CdcEngine(state, num_buckets=8,
                     quarantine=True).quarantine_dataset().count() == n1


def test_quarantine_run_overwrites_stale_epoch_file(tmp_path):
    """A crash-then-resume can regroup files under an existing epoch
    number; the dead-letter write must OVERWRITE the stale run file —
    short-circuiting on existence would silently drop the resume's
    newly-quarantined rows while reporting the new count."""
    from oregonwaterdataportal_etl_ray.cdc.engine import _quarantine_epoch

    def grp(reasons):
        n = len(reasons)
        return pa.table({
            "bucket": pa.array([0] * n, pa.int32()),
            "lsn": pa.array(range(n), pa.int64()),
            "repo": pa.array([None] * n, pa.string()),
            "_qreason": pa.array(reasons),
        })

    state = str(tmp_path / "q")
    stats1 = _quarantine_epoch(grp(["a"]), state_dir=state, epoch=7)
    assert stats1.column("applied")[0].as_py() == 1
    # resume regrouped a DIFFERENT file set under epoch 7
    stats2 = _quarantine_epoch(grp(["b", "c"]), state_dir=state, epoch=7)
    assert stats2.column("applied")[0].as_py() == 2
    got = pq.read_table(
        str(tmp_path / "q" / "quarantine" / "run-00007.parquet"))
    assert sorted(got.column("_qreason").to_pylist()) == ["b", "c"]


def test_quarantine_mode_on_clean_corpus_is_free(corpora, tmp_path):
    eng = CdcEngine(str(tmp_path / "q"), num_buckets=8, quarantine=True)
    res = eng.replay(corpora["clean"], epoch_size=2)
    assert res.n_quarantined == 0
    assert eng.quarantine_dataset().count() == 0
    ref = CdcEngine(str(tmp_path / "ref"), num_buckets=8)
    ref.replay(corpora["clean"], epoch_size=2)
    f = eng.final_table().to_pandas().sort_values(["repo", "path"])
    r = ref.final_table().to_pandas().sort_values(["repo", "path"])
    assert list(f["sha256"]) == list(r["sha256"])
