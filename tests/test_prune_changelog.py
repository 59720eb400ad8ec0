"""Changelog retention pruning (CdcEngine.prune_changelog): the pruned
prefix folds into a per-bucket floor checkpoint (Kafka-log-compaction
semantics), so as-of reads AT or ABOVE the floor stay exact, reads below
refuse loudly, the change stream refuses below the floor, and downstream
view-delta folds are unchanged at every retained epoch."""

import os
import shutil

import pandas as pd
import pytest

from oregonwaterdataportal_etl_ray.cdc import CdcEngine, oracle_replay
from oregonwaterdataportal_etl_ray.cdc.patch import oracle_patch_replay
from oregonwaterdataportal_etl_ray.cli import main as cli_main
from oregonwaterdataportal_etl_ray.fixtures import GeneratorSpec
from oregonwaterdataportal_etl_ray.fixtures.events import (
    generate_change_events, generate_patch_events)

N_BATCHES = 6
CUT = 3   # prune epochs < 3 (floor checkpoint labeled 2)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("events")
    return generate_change_events(str(d), GeneratorSpec(
        n_events=8_000, n_repos=20, paths_per_repo=25, n_batches=N_BATCHES,
        seed=29, dup_rate=0.05, shuffle_frac=0.3, delete_rate=0.08))


def _fresh_engine(corpus, path) -> CdcEngine:
    eng = CdcEngine(str(path), num_buckets=8, compact_every=2,
                    retain_changelog=True)
    eng.replay(corpus["files"], epoch_size=1)
    eng.compact()   # archive every live run so the whole prefix is prunable
    return eng


def _assert_asof_equals_prefix(eng, corpus, cut):
    asof = (eng.dataset_as_of(cut).to_pandas()
            .sort_values(["repo", "path"]).reset_index(drop=True))
    want = (oracle_replay(corpus["files"][:cut + 1])
            .sort_values(["repo", "path"]).reset_index(drop=True))
    assert len(asof) == len(want)
    assert list(asof["sha256"]) == list(want["sha256"])
    assert list(asof["lsn"]) == list(want["lsn"])


def test_prune_keeps_asof_exact_above_floor_and_refuses_below(
        corpus, tmp_path, ray_session):
    eng = _fresh_engine(corpus, tmp_path / "s")
    pre_stream = eng.changelog_dataset(lo=CUT).to_pandas()
    pre_final = eng.final_table().to_pandas().sort_values(["repo", "path"])

    st = eng.prune_changelog(CUT)
    assert st["buckets"] == 8 and st["pruned_files"] > 0
    assert eng.changelog_floor() == CUT

    # exact at the floor checkpoint and at every later epoch
    _assert_asof_equals_prefix(eng, corpus, CUT - 1)
    _assert_asof_equals_prefix(eng, corpus, CUT + 1)
    _assert_asof_equals_prefix(eng, corpus, N_BATCHES - 1)
    # below the floor: refuse loudly
    with pytest.raises(ValueError, match="retention floor"):
        eng.dataset_as_of(CUT - 2)
    # change stream: refuse below the floor, unchanged at-or-above it
    with pytest.raises(ValueError, match="pruned"):
        eng.changelog_dataset()
    post_stream = eng.changelog_dataset(lo=CUT).to_pandas()
    key = ["repo", "path", "lsn", "epoch", "op"]
    assert (post_stream.sort_values(key).reset_index(drop=True)[key]
            .equals(pre_stream.sort_values(key).reset_index(drop=True)[key]))
    # current state untouched
    post_final = eng.final_table().to_pandas().sort_values(["repo", "path"])
    assert list(post_final["sha256"]) == list(pre_final["sha256"])
    # pruning is idempotent / monotone: a lower or equal cut is a no-op
    assert eng.prune_changelog(CUT) == {
        "buckets": 0, "pruned_files": 0, "pruned_bytes": 0}
    assert eng.prune_changelog(CUT - 1)["buckets"] == 0


def test_prune_view_deltas_cumulative_fold_is_unchanged(
        corpus, tmp_path, ray_session):
    """A consumer folding view increments gets the same totals per repo
    before and after pruning (the floor surfaces as one lumped snapshot
    increment at epoch CUT-1)."""
    eng = _fresh_engine(corpus, tmp_path / "s")
    pre = (eng.view_deltas().to_pandas()
           .groupby("repo")[["d_files", "d_bytes"]].sum())
    eng.prune_changelog(CUT)
    post_df = eng.view_deltas().to_pandas()
    post = post_df.groupby("repo")[["d_files", "d_bytes"]].sum()
    pd.testing.assert_frame_equal(pre.sort_index(), post.sort_index())
    assert post_df["epoch"].min() == CUT - 1   # history starts at the floor


def test_prune_refuses_live_runs_below_cut(corpus, tmp_path, ray_session):
    eng = CdcEngine(str(tmp_path / "s"), num_buckets=8,
                    compact_every=10_000, retain_changelog=True)
    eng.replay(corpus["files"], epoch_size=1)   # nothing compacted: all live
    with pytest.raises(ValueError, match="compact"):
        eng.prune_changelog(CUT)


def test_prune_crash_window_double_read_is_exact_and_rerun_finishes(
        corpus, tmp_path, ray_session):
    """Crash between checkpoint write and file deletion leaves BOTH the
    floor file and the pruned runs: reads must stay exact (the checkpoint
    subsumes same-label runs; LWW dedups identical winners), and a re-run
    completes the deletion."""
    eng = _fresh_engine(corpus, tmp_path / "s")
    cl_backup = str(tmp_path / "cl_backup")
    shutil.copytree(os.path.join(eng.state_dir, "changelog"), cl_backup)
    eng.prune_changelog(CUT)
    # resurrect the deleted run files NEXT TO the floor checkpoints —
    # exactly the crash window state
    for bdir in os.listdir(cl_backup):
        for f in os.listdir(os.path.join(cl_backup, bdir)):
            dst = os.path.join(eng.state_dir, "changelog", bdir, f)
            if not os.path.exists(dst):
                shutil.copy(os.path.join(cl_backup, bdir, f), dst)
    _assert_asof_equals_prefix(eng, corpus, CUT - 1)
    _assert_asof_equals_prefix(eng, corpus, N_BATCHES - 1)
    # a re-run at a HIGHER cut folds floor + resurrected runs and cleans up
    eng.prune_changelog(CUT + 1)
    _assert_asof_equals_prefix(eng, corpus, CUT)
    _assert_asof_equals_prefix(eng, corpus, N_BATCHES - 1)
    leftover = [f for bdir in os.listdir(os.path.join(eng.state_dir, "changelog"))
                for f in os.listdir(os.path.join(eng.state_dir, "changelog", bdir))
                if f.startswith("run-") and
                int(f[4:-8]) < CUT + 1]
    assert leftover == []


def test_prune_patch_strategy_floor_checkpoint(tmp_path, ray_session):
    meta = generate_patch_events(str(tmp_path / "events"), GeneratorSpec(
        n_events=4_000, n_repos=12, paths_per_repo=15, n_batches=N_BATCHES,
        seed=59, dup_rate=0.05, delete_rate=0.08))
    eng = CdcEngine(str(tmp_path / "s"), num_buckets=8, compact_every=2,
                    retain_changelog=True, merge_strategy="patch")
    eng.replay(meta["files"], epoch_size=1)
    eng.compact()
    eng.prune_changelog(CUT)
    for cut in (CUT - 1, N_BATCHES - 1):
        asof = (eng.dataset_as_of(cut, with_sha=False).to_pandas()
                .sort_values(["repo", "path"]).reset_index(drop=True))
        want = oracle_patch_replay(meta["files"][:cut + 1])
        assert len(asof) == len(want)
        for col in ("repo", "path", "lsn", "content", "lang"):
            assert list(asof[col].fillna("~")) == \
                list(want[col].fillna("~")), col
    with pytest.raises(ValueError, match="retention floor"):
        eng.dataset_as_of(CUT - 2)


def test_cli_prune_changelog(corpus, tmp_path, ray_session, capsys):
    eng = _fresh_engine(corpus, tmp_path / "s")
    assert cli_main(["prune-changelog", "--state-dir", eng.state_dir,
                     "--before-epoch", str(CUT), "--num-buckets", "8"]) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    import json
    st = json.loads(out)
    assert st["floor"] == CUT and st["pruned_files"] > 0
    _assert_asof_equals_prefix(eng, corpus, N_BATCHES - 1)
