"""Changelog stream + time-travel reads over retained per-epoch deltas.

The reference's sink is write-only; these are the CDC-native output surfaces
a downstream consumer expects (a Debezium-style change stream and
point-in-time reconstruction), built purely from the LSM's own run files
(compaction archives them under changelog/ instead of unlinking)."""

import pandas as pd
import pytest

from oregonwaterdataportal_etl_ray.cdc import CdcEngine, oracle_replay
from oregonwaterdataportal_etl_ray.fixtures import (
    GeneratorSpec,
    generate_change_events,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("events")
    return generate_change_events(str(d), GeneratorSpec(
        n_events=8_000, n_repos=20, paths_per_repo=25, n_batches=6,
        seed=23, dup_rate=0.05, shuffle_frac=0.3, delete_rate=0.08))


@pytest.fixture(scope="module")
def engine(corpus, tmp_path_factory, ray_session):
    state = str(tmp_path_factory.mktemp("state") / "s")
    # compact_every=2 forces several compactions mid-replay, so the
    # changelog MUST survive archiving for these tests to pass
    eng = CdcEngine(state, num_buckets=8, compact_every=2,
                    retain_changelog=True)
    eng.replay(corpus["files"], epoch_size=1)   # one epoch per batch file
    return eng


def test_changelog_counts_match_lineage(engine, ray_session):
    """Per-epoch upsert/delete row counts in the stream equal the counts the
    merge committed to the lineage records."""
    cl = engine.changelog_dataset().to_pandas()
    by = cl.groupby(["epoch", "op"]).size().unstack(fill_value=0)
    for rec in engine.committed_epochs():
        ups = int(by.loc[rec["epoch"], "upsert"]) if rec["epoch"] in by.index else 0
        dels = int(by.loc[rec["epoch"], "delete"]) if rec["epoch"] in by.index and "delete" in by.columns else 0
        assert ups == rec["upserts"], rec
        assert dels == rec["deletes"], rec


def test_changelog_replays_to_final_state(engine, ray_session):
    """LWW over the full change stream reconstructs the committed table —
    the stream is a lossless CDC feed."""
    cl = engine.changelog_dataset().to_pandas()
    # whole-row last (groupby().last() would skip the tombstone's null
    # content per column and resurrect the previous upsert's value)
    last = cl.sort_values("lsn").groupby(["repo", "path"]).tail(1)
    live = last[last["content"].notna()]
    final = engine.final_table(with_sha=False).to_pandas()
    l = live.sort_values(["repo", "path"]).reset_index(drop=True)
    f = final.sort_values(["repo", "path"]).reset_index(drop=True)
    assert list(l["repo"]) == list(f["repo"])
    assert list(l["path"]) == list(f["path"])
    assert list(l["lsn"]) == list(f["lsn"])


def test_changelog_epoch_range_filter(engine, ray_session):
    cl = engine.changelog_dataset(lo=2, hi=3).to_pandas()
    assert set(cl["epoch"].unique()) <= {2, 3}
    full = engine.changelog_dataset().to_pandas()
    want = full[(full["epoch"] >= 2) & (full["epoch"] <= 3)]
    assert len(cl) == len(want)


@pytest.mark.parametrize("cut", [0, 2, 5])
def test_asof_matches_prefix_oracle(engine, corpus, cut, ray_session):
    """State AS OF epoch E == single-process oracle replay of the first
    E+1 batch files (epoch_size=1 makes the mapping exact)."""
    asof = engine.dataset_as_of(cut).to_pandas()
    oracle = oracle_replay(corpus["files"][:cut + 1])
    assert len(asof) == len(oracle)
    a = asof.sort_values(["repo", "path"]).reset_index(drop=True)
    o = oracle.sort_values(["repo", "path"]).reset_index(drop=True)
    assert list(a["repo"]) == list(o["repo"])
    assert list(a["path"]) == list(o["path"])
    assert list(a["lsn"]) == list(o["lsn"])
    assert list(a["sha256"]) == list(o["sha256"])


def test_asof_final_epoch_equals_final_table(engine, ray_session):
    last_epoch = max(r["epoch"] for r in engine.committed_epochs())
    asof = engine.dataset_as_of(last_epoch, with_sha=False).to_pandas()
    final = engine.final_table(with_sha=False).to_pandas()
    a = asof.sort_values(["repo", "path"]).reset_index(drop=True)
    f = final.sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["repo", "path", "lsn"]],
                                  f[["repo", "path", "lsn"]])


def test_asof_refuses_without_retention(corpus, tmp_path, ray_session):
    """A state dir compacted WITHOUT retention must refuse time travel
    loudly instead of returning a silently wrong reconstruction."""
    eng = CdcEngine(str(tmp_path / "s2"), num_buckets=8, compact_every=2)
    eng.replay(corpus["files"], epoch_size=1)
    with pytest.raises(ValueError, match="retain_changelog"):
        eng.dataset_as_of(1)


def test_asof_refuses_midlife_retention(corpus, tmp_path, ray_session):
    """retain_changelog enabled only mid-life: early deltas were already
    discarded un-archived, so as-of must refuse even though a changelog dir
    now exists (the manifest's discarded_deltas flag, not the dir-existence
    heuristic, is what catches this)."""
    state = str(tmp_path / "s3")
    eng = CdcEngine(state, num_buckets=8, compact_every=2)
    eng.replay(corpus["files"][:3], epoch_size=1)   # compacts, discards deltas
    eng2 = CdcEngine(state, num_buckets=8, compact_every=2,
                     retain_changelog=True)
    eng2.replay(corpus["files"][3:], epoch_size=1)  # archives from here on
    with pytest.raises(ValueError, match="retain_changelog"):
        eng2.dataset_as_of(1)


def test_cli_compact_autodetects_retention(corpus, tmp_path, ray_session):
    """Retention is sticky across CLI subcommands: a dir written with
    retain_changelog persists a marker, and a later bare `cli compact`
    (no flag) archives the delta runs instead of unlinking them —
    previously that compact silently and irreversibly destroyed the
    changelog/as-of surface."""
    from oregonwaterdataportal_etl_ray import cli
    state = str(tmp_path / "s_cli")
    eng = CdcEngine(state, num_buckets=8, compact_every=99,
                    retain_changelog=True)
    eng.replay(corpus["files"][:3], epoch_size=1)    # runs stay outstanding
    assert CdcEngine.retention_enabled(state)
    rc = cli.main(["compact", "--state-dir", state, "--num-buckets", "8"])
    assert rc == 0
    eng2 = CdcEngine(state, num_buckets=8, retain_changelog=True)
    asof = eng2.dataset_as_of(1, with_sha=False).to_pandas()
    oracle = oracle_replay(corpus["files"][:2])
    assert len(asof) == len(oracle)


def test_archive_before_commit_crash_window_is_safe(corpus, tmp_path,
                                                    ray_session):
    """Compaction archives delta runs into changelog/ BEFORE the manifest
    commit (hardlink). The crash window therefore leaves a run visible under
    BOTH names (live in data/, archived in changelog/) — readers must
    deduplicate by epoch, never double-count, and the final table must be
    unaffected."""
    import os

    from oregonwaterdataportal_etl_ray.cdc.engine import _archive_runs

    state = str(tmp_path / "s_arch")
    eng = CdcEngine(state, num_buckets=8, compact_every=99,   # runs stay live
                    retain_changelog=True)
    eng.replay(corpus["files"][:4], epoch_size=1)
    before_stream = eng.changelog_dataset().to_pandas()
    before_final = eng.final_table(with_sha=False).to_pandas()

    # simulate the crash: archival ran, the commit/cleanup never did
    for m in eng.lineage().values():
        _archive_runs(state, m.runs)
        for r in m.runs:
            assert os.path.exists(os.path.join(state, "changelog",
                                               os.path.relpath(r, "data")))
    _archive_runs(state, [m.runs[0]])   # idempotent under retry

    after_stream = eng.changelog_dataset().to_pandas()
    assert len(after_stream) == len(before_stream)   # no double-counting
    pd.testing.assert_frame_equal(
        eng.final_table(with_sha=False).to_pandas(), before_final)
    asof = eng.dataset_as_of(2, with_sha=False).to_pandas()
    oracle = oracle_replay(corpus["files"][:3])
    assert len(asof) == len(oracle)


def test_cli_reshard_and_changelog_modes(corpus, tmp_path, ray_session):
    """CLI-surface drive of the remaining subcommands: the three changelog
    modes (stream / --as-of / --view-deltas) export what the library
    returns, and reshard via the CLI adopts the persisted bucket count and
    produces a dir whose persisted layout matches the request."""
    import json as _json

    import pyarrow.parquet as _pq

    from oregonwaterdataportal_etl_ray import cli

    state = str(tmp_path / "s_cli2")
    eng = CdcEngine(state, num_buckets=8, compact_every=2,
                    retain_changelog=True)
    eng.replay(corpus["files"][:4], epoch_size=1)

    def run(args):
        assert cli.main(args) == 0

    out_s = str(tmp_path / "cl_stream")
    run(["changelog", "--state-dir", state, "--out", out_s])
    import glob as _glob
    n_stream = sum(_pq.read_table(f).num_rows
                   for f in _glob.glob(out_s + "/*.parquet"))
    assert n_stream == len(eng.changelog_dataset().to_pandas())

    out_a = str(tmp_path / "cl_asof")
    run(["changelog", "--state-dir", state, "--out", out_a, "--as-of", "1"])
    n_asof = sum(_pq.read_table(f).num_rows
                 for f in _glob.glob(out_a + "/*.parquet"))
    assert n_asof == len(oracle_replay(corpus["files"][:2]))

    out_v = str(tmp_path / "cl_vd")
    run(["changelog", "--state-dir", state, "--out", out_v, "--view-deltas"])
    n_vd = sum(_pq.read_table(f).num_rows
               for f in _glob.glob(out_v + "/*.parquet"))
    assert n_vd == len(eng.view_deltas().to_pandas())

    new_state = str(tmp_path / "s_cli2_r")
    run(["reshard", "--state-dir", state, "--new-state-dir", new_state,
         "--new-num-buckets", "16"])
    assert CdcEngine.persisted_num_buckets(new_state) == 16
    with open(new_state + "/layout.json") as f:
        assert _json.load(f)["key_encoding"] == 2
    new_eng = CdcEngine(new_state, num_buckets=16)
    a = new_eng.final_table(with_sha=False).to_pandas()
    b = eng.final_table(with_sha=False).to_pandas()
    assert list(a["lsn"]) == list(b["lsn"])


def test_archive_collision_replaces_stale_precommit_leftover(
        corpus, tmp_path, ray_session):
    """The crash-window corner the hardlink protocol alone cannot cover:
    archival ran, the manifest commit did NOT, and on resume the same epoch
    number was reassigned to different content. The stale archived bytes
    were never committed anywhere, so a later archive of the same epoch
    must REPLACE them (keeping them would pin never-committed rows in the
    changelog once the live run is compacted away)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq2

    from oregonwaterdataportal_etl_ray.cdc.engine import _archive_runs
    from oregonwaterdataportal_etl_ray.state.manifest import atomic_write_table

    state = str(tmp_path / "s_coll")
    os.makedirs(f"{state}/data/bucket=00003", exist_ok=True)
    rel = "data/bucket=00003/run-00007.parquet"

    t_stale = pa.table({"repo": ["crashed"], "path": ["p"],
                        "lsn": pa.array([1], pa.int64())})
    atomic_write_table(os.path.join(state, rel), t_stale)
    _archive_runs(state, [rel])              # crashed attempt archived...
    os.unlink(os.path.join(state, rel))      # ...but never committed

    t_new = pa.table({"repo": ["committed"], "path": ["p"],
                      "lsn": pa.array([2], pa.int64())})
    atomic_write_table(os.path.join(state, rel), t_new)
    _archive_runs(state, [rel])              # epoch reused on resume

    dst = os.path.join(state, "changelog", "bucket=00003",
                       "run-00007.parquet")
    got = pq2.read_table(dst)
    assert got["repo"].to_pylist() == ["committed"]   # stale bytes replaced
    assert os.path.samefile(os.path.join(state, rel), dst)  # hardlinked

    # and a plain retry of the SAME (now-linked) run stays a no-op
    _archive_runs(state, [rel])
    assert pq2.read_table(dst)["repo"].to_pylist() == ["committed"]
