"""The north-rule resumability scenario, literally: a replay JOB PROCESS is
SIGKILL'd mid-run (no cleanup, no atexit — the `ray job submit` crash case),
then a fresh engine on the same state dir resumes from per-partition
checkpoints and reconverges byte-identically with the oracle, without
reprocessing committed epochs."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

from oregonwaterdataportal_etl_ray.cdc import CdcEngine, oracle_replay
from oregonwaterdataportal_etl_ray.fixtures import GeneratorSpec, generate_change_events

JOB = r"""
import glob, sys
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from oregonwaterdataportal_etl_ray.cdc.engine import CdcEngine
files = sorted(glob.glob(sys.argv[1] + "/*.parquet"))
CdcEngine(sys.argv[2], num_buckets=8, compact_every=3).replay(files, epoch_size=1)
print("JOB DONE", flush=True)
"""


def test_sigkill_mid_replay_resumes_byte_identically(ray_session, tmp_path):
    ev_dir = str(tmp_path / "ev")
    state = str(tmp_path / "state")
    meta = generate_change_events(ev_dir, GeneratorSpec(
        n_events=24_000, n_repos=30, paths_per_repo=25, n_batches=12,
        seed=31, dup_rate=0.06, shuffle_frac=0.4, delete_rate=0.05))

    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    # own session: SIGKILL the whole process group so the job's raylet and
    # workers die with it (a crashed `ray job submit` takes its node down)
    proc = subprocess.Popen([sys.executable, "-c", JOB, ev_dir, state],
                            env=env, start_new_session=True,
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    epochs_path = os.path.join(state, "epochs.json")

    def committed() -> int:
        try:
            with open(epochs_path) as f:
                return len(json.load(f))
        except (OSError, json.JSONDecodeError):
            return 0  # mid-rename / not yet created

    deadline = time.time() + 120
    while committed() < 3 and time.time() < deadline and proc.poll() is None:
        time.sleep(0.05)
    if proc.poll() is None:
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()
    n_before = committed()
    assert n_before >= 3, "job never committed enough epochs to test resume"

    # no committed-visible temp orphans (tmp files live under .tmp/ only)
    stray = [p for p in
             __import__("glob").glob(f"{state}/**/*.parquet", recursive=True)
             if "/.tmp/" in p]
    assert not stray

    # resume with a FRESH engine (this process's Ray session); committed
    # epochs must be skipped, the remainder applied, and the final table
    # must equal the single-process oracle row for row (sha256 + lsn)
    eng = CdcEngine(state, num_buckets=8, compact_every=3)
    eng.replay(sorted(meta["files"]), epoch_size=1)
    applied = {f for r in eng.committed_epochs() for f in r.get("files", [])}
    assert applied == {os.path.realpath(f) for f in meta["files"]}

    final = eng.final_table().to_pandas().sort_values(["repo", "path"]) \
        .reset_index(drop=True)
    want = oracle_replay(sorted(meta["files"])).sort_values(["repo", "path"]) \
        .reset_index(drop=True)
    assert len(final) == len(want)
    assert list(final["sha256"]) == list(want["sha256"])
    assert list(final["lsn"]) == list(want["lsn"])


JOB_RETAINED = JOB.replace(
    "CdcEngine(sys.argv[2], num_buckets=8, compact_every=3)",
    "CdcEngine(sys.argv[2], num_buckets=8, compact_every=2, "
    "retain_changelog=True)")


def test_sigkill_with_retention_keeps_changelog_complete(ray_session, tmp_path):
    """SIGKILL mid-replay with changelog retention on (compact_every=2, so
    archives fire DURING the killed run): the archive-before-commit ordering
    must guarantee that after resume the change stream is complete — its LWW
    fold reconstructs the final table — and mid-history time travel matches
    the prefix oracle. This is the crash window the hardlink archival
    ordering exists for."""
    ev_dir = str(tmp_path / "ev")
    state = str(tmp_path / "state")
    meta = generate_change_events(ev_dir, GeneratorSpec(
        n_events=24_000, n_repos=30, paths_per_repo=25, n_batches=12,
        seed=47, dup_rate=0.06, shuffle_frac=0.4, delete_rate=0.05))

    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    proc = subprocess.Popen([sys.executable, "-c", JOB_RETAINED, ev_dir, state],
                            env=env, start_new_session=True,
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    epochs_path = os.path.join(state, "epochs.json")

    def committed() -> int:
        try:
            with open(epochs_path) as f:
                return len(json.load(f))
        except (OSError, json.JSONDecodeError):
            return 0

    deadline = time.time() + 120
    while committed() < 5 and time.time() < deadline and proc.poll() is None:
        time.sleep(0.05)
    if proc.poll() is None:
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()
    assert committed() >= 5, "job never committed enough epochs to test resume"

    eng = CdcEngine(state, num_buckets=8, compact_every=2,
                    retain_changelog=True)
    eng.replay(sorted(meta["files"]), epoch_size=1)

    final = eng.final_table().to_pandas().sort_values(["repo", "path"]) \
        .reset_index(drop=True)
    want = oracle_replay(sorted(meta["files"])).sort_values(["repo", "path"]) \
        .reset_index(drop=True)
    assert list(final["sha256"]) == list(want["sha256"])
    assert list(final["lsn"]) == list(want["lsn"])

    # changelog completeness: the stream's whole-row LWW fold == final table
    cl = eng.changelog_dataset().to_pandas()
    last = cl.sort_values("lsn").groupby(["repo", "path"]).tail(1)
    live = last[last["content"].notna()].sort_values(["repo", "path"])
    assert list(live["lsn"]) == list(final["lsn"])

    # mid-history time travel == prefix oracle (epoch_size=1: epoch i ==
    # file i), across archives written by BOTH the killed and resumed runs
    cut = 4
    asof = eng.dataset_as_of(cut).to_pandas().sort_values(["repo", "path"]) \
        .reset_index(drop=True)
    o = oracle_replay(sorted(meta["files"])[:cut + 1]) \
        .sort_values(["repo", "path"]).reset_index(drop=True)
    assert list(asof["sha256"]) == list(o["sha256"])


RESHARD_JOB = r"""
import glob, sys
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from oregonwaterdataportal_etl_ray.cdc.engine import CdcEngine
CdcEngine(sys.argv[1], num_buckets=8).reshard(sys.argv[2], new_num_buckets=16)
print("RESHARD DONE", flush=True)
"""


def test_sigkill_mid_reshard_rerun_completes_byte_identically(
        ray_session, tmp_path):
    """Reshard is also the legacy-hash MIGRATION path, so it gets the same
    crash discipline as replay: SIGKILL the reshard job mid-move, re-run it,
    and the new dir must read back byte-identically with the oracle (the
    per-new-bucket manifest epoch check makes the re-run skip committed
    buckets and finish the rest; partially-written files are tmp+rename
    atomic so readers never see them)."""
    ev_dir = str(tmp_path / "ev")
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    generate_change_events(ev_dir, GeneratorSpec(
        n_events=24_000, n_repos=30, paths_per_repo=25, n_batches=6,
        seed=37, dup_rate=0.06, shuffle_frac=0.4, delete_rate=0.05))
    files = sorted(
        os.path.join(ev_dir, f) for f in os.listdir(ev_dir)
        if f.endswith(".parquet"))
    CdcEngine(src, num_buckets=8, compact_every=3).replay(files, epoch_size=2)

    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    proc = subprocess.Popen([sys.executable, "-c", RESHARD_JOB, src, dst],
                            env=env, start_new_session=True,
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)

    def new_manifests() -> int:
        mdir = os.path.join(dst, "manifest")
        try:
            return len([n for n in os.listdir(mdir) if n.startswith("bucket-")])
        except OSError:
            return 0

    # kill once SOME new buckets committed but (likely) not all 16
    deadline = time.time() + 120
    while new_manifests() < 2 and time.time() < deadline and proc.poll() is None:
        time.sleep(0.05)
    if proc.poll() is None:
        os.killpg(proc.pid, signal.SIGKILL)
    proc.wait()
    mid = new_manifests()

    # re-run the reshard in-process: must complete and match the oracle
    new_eng = CdcEngine(src, num_buckets=8).reshard(dst, new_num_buckets=16)
    assert new_manifests() == 16 >= mid
    final = new_eng.final_table().to_pandas() \
        .sort_values(["repo", "path"]).reset_index(drop=True)
    want = oracle_replay(files).sort_values(["repo", "path"]) \
        .reset_index(drop=True)
    assert list(final["sha256"]) == list(want["sha256"])
    assert list(final["lsn"]) == list(want["lsn"])
    # tmp files a SIGKILL stranded mid-write may physically remain, but the
    # write protocol (write to .tmp/<uuid>, then os.replace) keeps them
    # INVISIBLE to readers: no manifest may ever reference a .tmp path
    from oregonwaterdataportal_etl_ray.state.manifest import load_all_manifests
    for m in load_all_manifests(dst).values():
        for rel in ([m.base_file] if m.base_file else []) + list(m.runs):
            assert ".tmp" not in rel, rel
