"""The full production loop composed end-to-end through the CLI surfaces:

a Debezium JSONL stream (with malformed envelopes mixed in) is staged with
`stage-debezium --emit-op` into a directory that a LIVE `tail` session is
consuming under `--merge-strategy patch --quarantine` — new stream files
keep arriving while the tailer runs. The final state must equal the
sequential patch oracle over the well-formed subset, and every poisoned
row must land in the dead-letter table.
"""

import json
import os
import threading
import time

import pyarrow as pa
import pyarrow.parquet as pq

from oregonwaterdataportal_etl_ray.cdc import CdcEngine
from oregonwaterdataportal_etl_ray.cdc.patch import oracle_patch_replay
from oregonwaterdataportal_etl_ray.cli import main as cli_main
from oregonwaterdataportal_etl_ray.fixtures import GeneratorSpec
from oregonwaterdataportal_etl_ray.fixtures.events import (
    events_to_debezium_jsonl, generate_patch_events)

# (file index, row position) of upsert rows whose path we null out —
# malformed on the wire, must be quarantined, never merged
POISON = [(1, 4), (2, 11), (3, 2)]


def _poison(canon_files, out_dir):
    """Null the path of chosen 'u' rows in COPIES of the canonical batches;
    return (poisoned_files, filtered_files) where filtered drops the rows."""
    os.makedirs(f"{out_dir}/poisoned", exist_ok=True)
    os.makedirs(f"{out_dir}/filtered", exist_ok=True)
    by_file = {}
    for fi, pos in POISON:
        by_file.setdefault(fi, []).append(pos)
    pfiles, ffiles = [], []
    for i, f in enumerate(canon_files):
        t = pq.read_table(f)
        hits = sorted(by_file.get(i, []))
        # only upsert rows (a delete's key comes from `before`)
        hits = [p for p in hits if t.column("op")[p].as_py() == "u"]
        assert len(hits) == len(by_file.get(i, [])), \
            "POISON positions must land on 'u' rows for this seed"
        rows = t.to_pylist()
        keep = [r for j, r in enumerate(rows) if j not in hits]
        for j in hits:
            rows[j]["path"] = None
        pf = f"{out_dir}/poisoned/batch-{i:04d}.parquet"
        ff = f"{out_dir}/filtered/batch-{i:04d}.parquet"
        pq.write_table(pa.Table.from_pylist(rows, schema=t.schema), pf)
        pq.write_table(pa.Table.from_pylist(keep, schema=t.schema), ff)
        pfiles.append(pf)
        ffiles.append(ff)
    return pfiles, ffiles


def test_debezium_tail_patch_quarantine_loop(ray_session, tmp_path):
    meta = generate_patch_events(str(tmp_path / "canon"), GeneratorSpec(
        n_events=4_000, n_repos=12, paths_per_repo=15, n_batches=5,
        seed=67, dup_rate=0.05, delete_rate=0.08))
    poisoned, filtered = _poison(meta["files"], str(tmp_path))
    jsonl = events_to_debezium_jsonl(poisoned, str(tmp_path / "jsonl"))

    staged = str(tmp_path / "staged")
    state = str(tmp_path / "state")

    def stage(files):
        d = str(tmp_path / "jsonl_live")
        os.makedirs(d, exist_ok=True)
        # stage-debezium reads a whole dir; feed it the next slice via
        # hardlinks into a growing dir (stage is idempotent per file)
        for f in files:
            dst = os.path.join(d, os.path.basename(f))
            if not os.path.exists(dst):
                os.link(f, dst)
        assert cli_main(["stage-debezium", "--jsonl-dir", d,
                         "--out-dir", staged, "--emit-op"]) == 0

    stage(jsonl[:2])   # first slice is present when the tailer starts

    def feed():
        for k in range(2, len(jsonl)):
            time.sleep(1.0)
            stage(jsonl[k:k + 1])

    feeder = threading.Thread(target=feed, daemon=True)
    feeder.start()
    rc = cli_main(["tail", "--events-dir", staged, "--state-dir", state,
                   "--epoch-size", "1", "--poll-interval", "0.3",
                   "--max-idle-polls", "8", "--num-buckets", "8",
                   "--merge-strategy", "patch", "--quarantine"])
    feeder.join()
    assert rc == 0

    eng = CdcEngine(state, num_buckets=8)   # adopts persisted strategy
    assert eng.merge_strategy == "patch"
    f = (eng.final_table().to_pandas()
         .sort_values(["repo", "path"]).reset_index(drop=True))
    o = oracle_patch_replay(filtered)
    assert len(f) == len(o)
    for col in ("repo", "path", "lsn", "content", "lang"):
        assert list(f[col].fillna("~")) == list(o[col].fillna("~")), col

    q = eng.quarantine_dataset().take_all()
    assert len(q) == len(POISON)
    assert all(r["path"] is None for r in q)


def test_staging_is_idempotent_under_restage(ray_session, tmp_path):
    """Re-running stage-debezium over an already-staged dir rewrites
    nothing (existing staged files are kept verbatim) — the tail session's
    file-set resume contract stays intact across stager restarts."""
    meta = generate_patch_events(str(tmp_path / "canon"), GeneratorSpec(
        n_events=500, n_repos=5, paths_per_repo=5, n_batches=2, seed=5))
    jsonl = events_to_debezium_jsonl(meta["files"], str(tmp_path / "jsonl"))
    staged = str(tmp_path / "staged")
    assert cli_main(["stage-debezium", "--jsonl-dir",
                     str(tmp_path / "jsonl"), "--out-dir", staged,
                     "--emit-op"]) == 0
    stats1 = {f: os.stat(os.path.join(staged, f)) for f in os.listdir(staged)}
    assert cli_main(["stage-debezium", "--jsonl-dir",
                     str(tmp_path / "jsonl"), "--out-dir", staged,
                     "--emit-op"]) == 0
    stats2 = {f: os.stat(os.path.join(staged, f)) for f in os.listdir(staged)}
    assert {f: (s.st_mtime_ns, s.st_ino) for f, s in stats1.items()} == \
           {f: (s.st_mtime_ns, s.st_ino) for f, s in stats2.items()}
    assert len(stats1) == len(jsonl)
