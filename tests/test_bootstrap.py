"""Snapshot bootstrap — the full-load half of a full-load-then-CDC migration.

Laws (public Debezium snapshot-mode / DMS full-load semantics):
  1. bootstrap(snapshot as of L) + replay(ALL files, full pre-cut overlap)
     converges to exactly the full-replay oracle — re-delivered pre-cut
     history is a no-op, and a stale pre-cut upsert can NOT resurrect a key
     that was deleted before the cut (the snapshot carries no tombstones).
  2. The cut LSN persists in the state dir; a fresh engine instance (new
     process) applies the same drop filter.
  3. A bootstrapped or lineage-bearing state dir refuses a second bootstrap.
"""

import glob

import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray

from oregonwaterdataportal_etl_ray.cdc import CdcEngine, oracle_replay
from oregonwaterdataportal_etl_ray.fixtures import (
    GeneratorSpec,
    generate_change_events,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("events")
    # deletes + heavy out-of-order so pre-cut stale history really overlaps
    return generate_change_events(str(d), GeneratorSpec(
        n_events=10_000, n_repos=25, paths_per_repo=20, n_batches=8,
        seed=71, dup_rate=0.08, shuffle_frac=0.35, delete_rate=0.10))


@pytest.fixture(scope="module")
def snapshot_and_cut(corpus):
    """Exact LWW state of all events with lsn <= median cut, deletes applied
    (tombstoned keys absent) — what a consistent source snapshot looks like."""
    ev = pd.concat([pq.read_table(f).to_pandas() for f in corpus["files"]],
                   ignore_index=True)
    ev["lsn"] = ev["commit"].str[:12].astype("int64")
    cut = int(ev["lsn"].quantile(0.5))
    pre = ev[ev["lsn"] <= cut].sort_values("lsn", kind="stable")
    snap = pre.groupby(["repo", "path"], as_index=False, sort=False).tail(1)
    snap = snap[snap["content"].notna()][
        ["repo", "path", "commit", "lang", "content"]].reset_index(drop=True)
    return snap, cut


def test_bootstrap_overlap_replay_converges(corpus, snapshot_and_cut,
                                            tmp_path, ray_session):
    snap, cut = snapshot_and_cut
    eng = CdcEngine(str(tmp_path / "s"), num_buckets=8, compact_every=3)
    n = eng.bootstrap(ray.data.from_pandas(snap), as_of_lsn=cut)
    assert n == len(snap)
    # replay EVERYTHING, including all pre-cut files (worst-case overlap)
    eng.replay(corpus["files"], epoch_size=2)
    got = eng.final_table().to_pandas()[
        ["repo", "path", "lsn", "sha256"]].reset_index(drop=True)
    want = oracle_replay(corpus["files"])[
        ["repo", "path", "lsn", "sha256"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_bootstrap_cut_persists_across_instances(corpus, snapshot_and_cut,
                                                 tmp_path, ray_session):
    snap, cut = snapshot_and_cut
    state = str(tmp_path / "s2")
    CdcEngine(state, num_buckets=8).bootstrap(
        ray.data.from_pandas(snap), as_of_lsn=cut)
    eng2 = CdcEngine(state, num_buckets=8)          # fresh instance
    assert eng2.bootstrap_lsn() == cut
    eng2.replay(corpus["files"], epoch_size=3)      # filter applies here too
    got = eng2.final_table().to_pandas()[
        ["repo", "path", "lsn", "sha256"]].reset_index(drop=True)
    want = oracle_replay(corpus["files"])[
        ["repo", "path", "lsn", "sha256"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_bootstrap_refuses_nonfresh_dir(corpus, snapshot_and_cut, tmp_path,
                                        ray_session):
    snap, cut = snapshot_and_cut
    state = str(tmp_path / "s3")
    eng = CdcEngine(state, num_buckets=8)
    eng.bootstrap(ray.data.from_pandas(snap), as_of_lsn=cut)
    with pytest.raises(ValueError, match="fresh state dir"):
        eng.bootstrap(ray.data.from_pandas(snap), as_of_lsn=cut)
    # a replay-built dir refuses too
    state2 = str(tmp_path / "s4")
    eng2 = CdcEngine(state2, num_buckets=8)
    eng2.replay(corpus["files"][:2], epoch_size=1)
    with pytest.raises(ValueError, match="fresh state dir"):
        eng2.bootstrap(ray.data.from_pandas(snap), as_of_lsn=cut)


def test_export_partitioned_resumes(corpus, tmp_path, ray_session):
    """Resumable export: one part per bucket, existing parts skipped, and a
    partial dir completed by a re-run equals the full table."""
    import os
    import pyarrow.parquet as pq2
    eng = CdcEngine(str(tmp_path / "s5"), num_buckets=8, compact_every=3)
    eng.replay(corpus["files"], epoch_size=2)
    out = str(tmp_path / "out")
    st = eng.export_partitioned(out)
    assert st["written"] > 0 and st["skipped"] == 0
    parts = sorted(p for p in os.listdir(out) if p.endswith(".parquet"))
    assert parts and all(p.startswith("part-bucket=") for p in parts)
    # simulate a killed export: delete two parts, re-run, only those rewrite
    for p in parts[:2]:
        os.unlink(os.path.join(out, p))
    st2 = eng.export_partitioned(out)
    assert st2 == {"written": 2, "skipped": st["written"] - 2}
    got = pd.concat([pq2.read_table(os.path.join(out, p)).to_pandas()
                     for p in sorted(os.listdir(out)) if p.endswith(".parquet")],
                    ignore_index=True).sort_values(["repo", "path"])
    want = eng.final_table().to_pandas()
    pd.testing.assert_frame_equal(
        got[["repo", "path", "lsn", "sha256"]].reset_index(drop=True),
        want[["repo", "path", "lsn", "sha256"]].reset_index(drop=True))


def test_bootstrap_timetravel_and_changelog(corpus, snapshot_and_cut,
                                            tmp_path, ray_session):
    """The initial load is an ordinary epoch-0 delta run: with retention on,
    view_deltas/as-of work BEFORE any compaction (no false 'compacted
    without retention' refusal), the change stream reports the snapshot as
    epoch-0 upserts (Debezium snapshot-read shape), and as-of still
    reconstructs epoch 0 AFTER compactions archived the bootstrap run —
    previously the bootstrap rows silently vanished from time travel."""
    snap, cut = snapshot_and_cut
    eng = CdcEngine(str(tmp_path / "s6"), num_buckets=8, compact_every=2,
                    retain_changelog=True)
    eng.bootstrap(ray.data.from_pandas(snap), as_of_lsn=cut)
    # pre-compaction guards must pass on a bootstrapped dir
    eng.view_deltas()
    asof0 = eng.dataset_as_of(0, with_sha=False).to_pandas()
    assert len(asof0) == len(snap)
    cl0 = eng.changelog_dataset(hi=0).to_pandas()
    assert set(cl0["op"]) == {"upsert"} and len(cl0) == len(snap)

    eng.replay(corpus["files"], epoch_size=1)   # compact_every=2: archives fire
    last = max(r["epoch"] for r in eng.committed_epochs())
    asof = eng.dataset_as_of(last, with_sha=False).to_pandas()
    final = eng.final_table(with_sha=False).to_pandas()
    a = asof.sort_values(["repo", "path"]).reset_index(drop=True)
    f = final.sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["repo", "path", "lsn"]],
                                  f[["repo", "path", "lsn"]])
    # epoch 0 is still reconstructible from the archived bootstrap run
    asof0b = eng.dataset_as_of(0, with_sha=False).to_pandas()
    assert len(asof0b) == len(snap)
    assert sorted(zip(asof0b["repo"], asof0b["path"])) == \
        sorted(zip(snap["repo"], snap["path"]))


def test_reshard_carries_bootstrap_cut_and_refuses_asof(
        corpus, snapshot_and_cut, tmp_path, ray_session):
    """reshard() must carry bootstrap.json (else a re-delivered pre-cut
    stale upsert could resurrect a key deleted before the snapshot cut) and
    retain_changelog; pre-reshard history is NOT reconstructible in the new
    bucket space, so as-of reads refuse loudly instead of silently omitting
    it."""
    snap, cut = snapshot_and_cut
    eng = CdcEngine(str(tmp_path / "s7"), num_buckets=4, compact_every=3,
                    retain_changelog=True)
    eng.bootstrap(ray.data.from_pandas(snap), as_of_lsn=cut)
    eng.replay(corpus["files"][:4], epoch_size=2)
    new = eng.reshard(str(tmp_path / "s7r"), 8)
    assert new.bootstrap_lsn() == cut            # the fix under test
    assert new.retain_changelog is True
    new.replay(corpus["files"], epoch_size=2)    # full overlap incl. pre-cut
    got = new.final_table().to_pandas()[
        ["repo", "path", "lsn", "sha256"]].reset_index(drop=True)
    want = oracle_replay(corpus["files"])[
        ["repo", "path", "lsn", "sha256"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    with pytest.raises(ValueError, match="retain_changelog"):
        new.dataset_as_of(0)


def test_bootstrap_bucket_retry_reports_original_counts(
        corpus, snapshot_and_cut, tmp_path, ray_session):
    """A Ray retry of an already-committed bootstrap bucket must report the
    ORIGINAL commit's counts, not zeros (the same retry-stats law
    _merge_bucket pins via last_epoch_stats) — a crash-resumed bootstrap
    would otherwise under-count 'applied' in the epoch-0 lineage record."""
    import pyarrow as pa

    from oregonwaterdataportal_etl_ray.cdc.engine import _bootstrap_bucket
    from oregonwaterdataportal_etl_ray.cdc.merge import (NormalizeEvents,
                                                         parse_lsn)
    from oregonwaterdataportal_etl_ray.cdc.schema import (EvolutionSpec,
                                                          plan_target_schema)

    snap, _ = snapshot_and_cut
    state = str(tmp_path / "state")
    files = corpus["files"][:1]
    target = plan_target_schema(files, EvolutionSpec())
    ne = NormalizeEvents(target, num_buckets=4)
    batch = ne(pa.Table.from_pandas(snap.head(200), preserve_index=False)
               .cast(target))
    one = batch.filter(pa.compute.equal(batch["bucket"], batch["bucket"][0]))

    first = _bootstrap_bucket(one, state_dir=state, epoch=0)
    retry = _bootstrap_bucket(one, state_dir=state, epoch=0)
    for col in ("rows", "live", "deletes", "max_lsn"):
        assert retry[col][0].as_py() == first[col][0].as_py(), col
    assert first["rows"][0].as_py() == one.num_rows
