"""Per-partition commit manifests + atomic writes — the exactly-once sink core.

Mirrors the reference's idempotent sink discipline re-expressed for a lake:
  - check-before-write / tolerate-already-exists
    (/root/reference/userCode/wrd/dag.py:256-281, userCode/groundwater/dag.py:62-79),
  - all durable state lives in the sink, never in process RAM, so any run can
    die anywhere and be re-run safely (/root/reference/userCode/wrd/dag.py:389-393),
  - per-datastream watermark read back each run
    (/root/reference/userCode/helper_classes.py:131-162) => per-bucket
    ``last_applied_lsn`` here.

Protocol: write payload to ``<dir>/.tmp/<unique>`` then ``os.replace`` to the
final path (atomic on POSIX). A retried Ray task regenerates byte-identical
content (deterministic merge), so a second replace is a no-op; a task that
observes a manifest already at-or-past its epoch skips entirely (the 404->POST
/ exists->skip pattern of K1)."""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import asdict, dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq


@dataclass
class BucketManifest:
    bucket: int
    epoch: int = -1
    last_applied_lsn: int = 0
    row_count: int = 0            # live keys after merge (tombstones excluded)
    base_file: str | None = None  # relative to state dir
    runs: list[str] = field(default_factory=list)  # delta runs, oldest first
    stats: dict = field(default_factory=dict)      # cumulative merge stats
    # True once any delta run was compacted away WITHOUT changelog archival:
    # time-travel reads are permanently inexact for this bucket (deltas alone
    # no longer reconstruct any cut). Never reset; old manifests load False.
    discarded_deltas: bool = False
    # Changelog retention floor: epochs BELOW this value have been pruned
    # from the archived changelog (folded into one floor checkpoint part by
    # CdcEngine.prune_changelog). as-of reads below floor-1 and changelog
    # reads below the floor refuse loudly. 0 = nothing pruned; old
    # manifests load 0.
    changelog_floor: int = 0
    # stats of the LAST committed epoch ({"epoch", "applied", "upserts",
    # "deletes", "skipped_stale"}): a Ray retry of an already-committed merge
    # task returns these instead of zeros, so the epoch lineage record keeps
    # the real counts. Old manifests load None (retry then reports zeros,
    # the pre-field behavior).
    last_epoch_stats: dict | None = None


def _tmp_path(final_path: str) -> str:
    d = os.path.join(os.path.dirname(final_path), ".tmp")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"{os.path.basename(final_path)}.{uuid.uuid4().hex}")


def atomic_write_bytes(final_path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(final_path), exist_ok=True)
    tmp = _tmp_path(final_path)
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final_path)


def atomic_write_table(final_path: str, table: pa.Table) -> None:
    os.makedirs(os.path.dirname(final_path), exist_ok=True)
    tmp = _tmp_path(final_path)
    # zstd: state-file I/O is the engine's non-scaling shared resource —
    # trading (parallel) CPU for (serial) disk bandwidth wins at every scale
    pq.write_table(table, tmp, compression="zstd", compression_level=1)
    os.replace(tmp, final_path)


def manifest_path(state_dir: str, bucket: int) -> str:
    return os.path.join(state_dir, "manifest", f"bucket-{bucket:05d}.json")


def write_manifest(state_dir: str, m: BucketManifest) -> None:
    atomic_write_bytes(manifest_path(state_dir, m.bucket),
                       json.dumps(asdict(m), sort_keys=True).encode())


def load_manifest(state_dir: str, bucket: int) -> BucketManifest | None:
    p = manifest_path(state_dir, bucket)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return BucketManifest(**json.load(f))


def load_all_manifests(state_dir: str) -> dict[int, BucketManifest]:
    d = os.path.join(state_dir, "manifest")
    out: dict[int, BucketManifest] = {}
    if not os.path.isdir(d):
        return out
    for name in sorted(os.listdir(d)):
        if name.startswith("bucket-") and name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                m = BucketManifest(**json.load(f))
            out[m.bucket] = m
    return out
