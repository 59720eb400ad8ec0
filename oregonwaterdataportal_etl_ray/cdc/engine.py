"""CdcEngine — Ray-Data-native binlog/WAL-tail replay -> lake upsert.

Pipeline shape (SURVEY.md §3.4 / §7.2):

    read_parquet(change batches, coarse blocks)
      -> map_batches(NormalizeEvents, task pool)      # conform + lsn + bucket
                                                      # + watermark filter
                                                      # + partial LWW combine
      -> groupby("bucket")                            # the ONE exchange
                                                      # (sort-based, int32 key)
      -> map_groups(merge bucket)                     # LWW vs committed state,
                                                      # LSM delta runs,
                                                      # exactly-once commit
      -> small stats dataset (driver aggregates lineage)
    (epoch i+1's read+normalize overlaps epoch i's merge; merges stay serial)

Durable state layout under ``state_dir``:
    manifest/bucket-NNNNN.json   per-partition lineage (epoch, last LSN, counts)
    data/bucket=NNNNN/base-*.parquet / run-*.parquet  LSM base + delta runs
    epochs.json                  driver-level epoch -> files lineage
    schema.bin                   unified Arrow schema (serialized)

Scale notes (100 TB design):
  - the partial reduce inside NormalizeEvents is the combiner: the shuffle
    moves winners-per-block, not raw events;
  - one shuffle total, keyed by a consistent hash bucket of (repo, path);
    ``num_buckets`` >> worker count so stragglers even out and skewed repos
    spread across (repo, path) pairs;
  - merge state is on disk (the sink), never in actor RAM — recovery
    re-derives from checkpoint + replay, mirroring the reference's
    "state lives in the sink" rule (/root/reference/userCode/wrd/dag.py:389-393);
  - per-bucket output files => resumable, partitioned, never one giant file.
"""

from __future__ import annotations

import functools
import json
import os
import threading
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from ..functions.kernels import sha256_hex
from ..state.manifest import (
    BucketManifest,
    atomic_write_bytes,
    atomic_write_table,
    load_all_manifests,
    load_manifest,
    write_manifest,
)
from .merge import (BUCKET_HASH_DEFAULT, BUCKET_HASH_SIPHASH, NormalizeEvents,
                    drop_tombstones, merge_sorted_runs, reduce_lww)
from .patch import RESET_COL, fold_epoch_events, fold_patch_runs
from .schema import EvolutionSpec, conform_schema, plan_target_schema

# serializes lazy read-plan builds across prefetch threads (see _normalized)
_PLAN_BUILD_LOCK = threading.Lock()

STATS_SCHEMA = pa.schema([
    ("bucket", pa.int32()), ("epoch", pa.int64()), ("applied", pa.int64()),
    ("upserts", pa.int64()), ("deletes", pa.int64()),
    ("skipped_stale", pa.int64()), ("last_applied_lsn", pa.int64()),
    ("committed", pa.bool_()),
])


def _stats_row(**kw) -> pa.Table:
    return pa.table({k: [kw.get(k)] for k in STATS_SCHEMA.names}, schema=STATS_SCHEMA)


def _read_rel(state_dir: str, rel: str) -> pa.Table:
    return pq.read_table(os.path.join(state_dir, rel))


def _read_committed(state_dir: str, base_file: str | None,
                    runs: list[str], strategy: str = "lww") -> pa.Table | None:
    """THE merge-on-read recipe — the single definition every committed-state
    reader shares (_ReadBucket, compaction inside _merge_bucket, compact(),
    reshard): [base] + runs (epoch-ascending), merged per the dir's
    strategy — LWW row replace, or the patch column-level fold
    (cdc/patch.py). If the assembly of committed state ever changes
    (pruning, layout, tolerance), it changes HERE for every reader at
    once."""
    parts = ([_read_rel(state_dir, base_file)] if base_file else []) + \
            [_read_rel(state_dir, r) for r in runs]
    if strategy == "patch":
        return fold_patch_runs(parts)
    return merge_sorted_runs(parts)


def _archive_runs(state_dir: str, rel_paths: list[str]) -> None:
    """Hardlink superseded RUN files (per-epoch LWW deltas) into
    ``changelog/bucket=B/run-E.parquet`` — the engine's downstream change
    stream (a Debezium-style CDC output) and the raw material for
    time-travel reads. Runs BEFORE the manifest commit, so a crash between
    the two can never produce a committed manifest whose changelog is
    missing epochs (silently-stale as-of reads); the failure mode is
    instead a changelog entry whose run is still live in ``data/`` — same
    bytes under both names (a hardlink), deduplicated by epoch at read
    time. Idempotent under retry; a COLLIDING entry that is not this run's
    own hardlink is replaced: it can only be the leftover of a crashed
    attempt that never committed (a crash between archive and manifest
    write, after which the epoch number may even have been reassigned to a
    different file group on resume) — keeping it would permanently pin
    never-committed bytes in the changelog once the live run is compacted
    away, silently corrupting as-of/view-delta reads for that epoch."""
    for rel in rel_paths:
        if not os.path.basename(rel).startswith("run-"):
            continue
        src = os.path.join(state_dir, rel)
        dst = os.path.join(state_dir, "changelog", os.path.relpath(rel, "data"))
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            os.link(src, dst)      # no data copy; same filesystem by layout
        except FileExistsError:
            try:
                same = os.path.samefile(src, dst)
            except OSError:
                same = False
            if not same:
                # stale pre-commit leftover: atomically point the archive
                # at the bytes that are about to be committed
                tmp = dst + ".relink"
                try:
                    if os.path.exists(tmp):
                        os.unlink(tmp)
                    os.link(src, tmp)
                    os.replace(tmp, dst)
                except OSError:
                    import shutil
                    shutil.copy2(src, dst)
        except OSError:
            if not os.path.exists(dst):   # e.g. FS without hardlinks
                import shutil
                shutil.copy2(src, dst)


def _unlink_superseded(state_dir: str, rel_paths: list[str], keep: set) -> None:
    """Best-effort removal of state files a committed manifest no longer
    references — without this, long-running tail mode grows disk with every
    compaction (the old base + folded runs stay orphaned forever). Runs AFTER
    the manifest commit: a crash in between leaves unreferenced files (a
    bounded space leak, never a dangling reference — and never a missing
    changelog entry, because archival happens before the commit)."""
    for rel in rel_paths:
        if rel in keep:
            continue
        try:
            os.unlink(os.path.join(state_dir, rel))
        except OSError:
            pass


def _quarantine_epoch(group: pa.Table, *, state_dir: str, epoch: int) -> pa.Table:
    """Dead-letter sink: persist one epoch's malformed events (routed by
    NormalizeEvents under ``quarantine=True``) to
    ``quarantine/run-EEEEE.parquet`` with their ``_qreason``, WITHOUT ever
    touching the LSM state. Idempotent under Ray task retry (atomic rename
    of deterministic content). The write ALWAYS overwrites: a
    crash-then-resume can regroup files under an existing epoch number, and
    short-circuiting on the stale file would silently drop the resume's
    newly-quarantined rows while reporting the new count. Overwrite keeps
    delivery to the quarantine table AT-LEAST-ONCE (the conventional DLQ
    contract) — the LSM state itself stays exactly-once, and quarantined
    duplicates are verbatim rows a reader can distinct away."""
    bucket = int(group.column("bucket")[0].as_py())
    t = group.drop_columns(["bucket", "lsn"]).sort_by(
        [(c, "ascending") for c in group.column_names
         if c not in ("bucket", "lsn")])
    path = os.path.join(state_dir, "quarantine", f"run-{epoch:05d}.parquet")
    atomic_write_table(path, t)
    # ``applied`` carries the quarantined-row count; the driver splits this
    # row out by its sentinel bucket id before summing the real merge stats.
    return _stats_row(bucket=bucket, epoch=epoch, applied=t.num_rows,
                      upserts=0, deletes=0, skipped_stale=0,
                      last_applied_lsn=-1, committed=True)


def _merge_bucket(group: pa.Table, *, state_dir: str, epoch: int,
                  compact_every: int, retain_changelog: bool = False,
                  compact_min_bytes: int | None = None,
                  quarantine_bucket: int | None = None,
                  strategy: str = "lww") -> pa.Table:
    """Merge one bucket's epoch delta against its committed LSM state.

    Exactly-once under Ray task retry: (1) a manifest already at-or-past
    ``epoch`` short-circuits to a no-op (check-then-insert, reference
    userCode/wrd/dag.py:256-281); (2) all file writes are tmp+atomic-rename of
    deterministic content, so a duplicate attempt re-creates identical bytes.
    """
    bucket = int(group.column("bucket")[0].as_py())
    if quarantine_bucket is not None and bucket == quarantine_bucket:
        return _quarantine_epoch(group, state_dir=state_dir, epoch=epoch)
    if "_qreason" in group.column_names:
        # dead-letter mode ships an (all-null, for good rows) reason column
        # through the shuffle; it must never reach the persisted LSM runs
        group = group.drop_columns(["_qreason"])
    m = load_manifest(state_dir, bucket) or BucketManifest(bucket=bucket)
    if m.epoch >= epoch:
        # A Ray RETRY of the task that just committed this very epoch must
        # report the original application's counts, not zeros — the driver
        # sums only the surviving result row into the lineage record.
        ls = m.last_epoch_stats
        if ls is not None and m.epoch == epoch and ls.get("epoch") == epoch:
            return _stats_row(bucket=bucket, epoch=epoch,
                              applied=ls["applied"], upserts=ls["upserts"],
                              deletes=ls["deletes"],
                              skipped_stale=ls["skipped_stale"],
                              last_applied_lsn=m.last_applied_lsn,
                              committed=True)
        return _stats_row(bucket=bucket, epoch=epoch, applied=0, upserts=0,
                          deletes=0, skipped_stale=group.num_rows,
                          last_applied_lsn=m.last_applied_lsn, committed=False)

    # Collapse of this epoch's delta. No per-row LSN filter here: the
    # merge is idempotent (a stale or duplicate row loses to the committed
    # winner), and out-of-order rows may legitimately carry LSNs below the
    # bucket's max — exactly-once comes from the epoch-level manifest check
    # above, not from dropping rows. Tombstones are RETAINED in the LSM state
    # so a late stale upsert can never resurrect a deleted key; they are
    # dropped only at read time. Under strategy='patch' the collapse is the
    # column-level fold (cdc/patch.py): one patch row per key, last non-null
    # value per column since the key's last delete within the epoch.
    if strategy == "patch":
        fresh = fold_epoch_events(group)
    else:
        fresh = reduce_lww(group)
    n_stale = group.num_rows - fresh.num_rows

    stats = dict(m.stats) if m.stats else {"upserts": 0, "deletes": 0, "skipped_stale": 0}
    runs = list(m.runs)
    if fresh.num_rows:
        fresh = fresh.sort_by([("repo", "ascending"), ("path", "ascending")])
        if strategy == "patch":
            # a patch run row is a delete only when the epoch's fold ended
            # in a reset with nothing re-set on top of it
            n_del = pc.sum(pc.and_(fresh.column(RESET_COL),
                                   pc.is_null(fresh.column("content")))
                           ).as_py() or 0
        else:
            n_del = fresh.column("content").null_count
        n_up = fresh.num_rows - n_del
        rel = f"data/bucket={bucket:05d}/run-{epoch:05d}.parquet"
        atomic_write_table(os.path.join(state_dir, rel), fresh)
        runs.append(rel)
        new_last = max(m.last_applied_lsn, pc.max(fresh.column("lsn")).as_py())
    else:
        n_del = n_up = 0
        new_last = m.last_applied_lsn

    base_file = m.base_file
    row_count = m.row_count
    superseded: list[str] = []
    # count-based trigger (bounded merge-on-read fan-in) OR size-tiered
    # trigger (bursty epochs produce few but large runs — fold them before
    # the read amplification compounds; the stat calls are per-bucket-epoch)
    due = len(runs) >= compact_every
    if not due and compact_min_bytes is not None and runs:
        def _size(rel: str) -> int:
            # per-file tolerance: one unreadable run must not silently
            # disable the trigger when the OTHERS already cross the bar
            try:
                return os.path.getsize(os.path.join(state_dir, rel))
            except OSError:
                return 0
        due = sum(_size(r) for r in runs) >= compact_min_bytes
    if runs and due:
        merged = _read_committed(state_dir, base_file, runs, strategy).sort_by(
            [("repo", "ascending"), ("path", "ascending")])
        superseded = ([base_file] if base_file else []) + runs
        base_file = f"data/bucket={bucket:05d}/base-{epoch:05d}.parquet"
        atomic_write_table(os.path.join(state_dir, base_file), merged)
        row_count = merged.num_rows - merged.column("content").null_count
        runs = []

    stats["upserts"] += n_up
    stats["deletes"] += n_del
    stats["skipped_stale"] += n_stale
    if superseded and retain_changelog:
        _archive_runs(state_dir, superseded)   # BEFORE the manifest commit
    write_manifest(state_dir, BucketManifest(
        bucket=bucket, epoch=epoch, last_applied_lsn=new_last,
        row_count=row_count, base_file=base_file, runs=runs, stats=stats,
        discarded_deltas=m.discarded_deltas or bool(
            superseded and not retain_changelog),
        last_epoch_stats={"epoch": epoch, "applied": fresh.num_rows,
                          "upserts": n_up, "deletes": n_del,
                          "skipped_stale": n_stale}))
    if superseded:
        _unlink_superseded(state_dir, superseded, keep={base_file})
    return _stats_row(bucket=bucket, epoch=epoch, applied=fresh.num_rows,
                      upserts=n_up, deletes=n_del, skipped_stale=n_stale,
                      last_applied_lsn=new_last, committed=True)


def _bootstrap_bucket(group: pa.Table, *, state_dir: str, epoch: int) -> pa.Table:
    """Write one bucket of an initial snapshot DIRECTLY as its epoch-0 DELTA
    RUN + manifest — no per-event merge. It is a run (not a base) so the
    snapshot participates in the LSM uniformly: under retain_changelog the
    first compaction archives it into ``changelog/`` like any delta, making
    time-travel reads and the change stream complete from epoch 0 (the
    snapshot surfaces as Debezium-style snapshot-read upserts). Exactly-once
    under Ray task retry exactly like _merge_bucket: an already-committed
    manifest short-circuits, and a duplicate attempt regenerates
    byte-identical content."""
    bucket = int(group.column("bucket")[0].as_py())
    m = load_manifest(state_dir, bucket)
    if m is not None and m.epoch >= epoch:
        # report the ORIGINAL commit's counts (reconstructed from the
        # persisted stats), not zeros — a crash-resumed bootstrap would
        # otherwise under-count 'applied' in the epoch-0 lineage record
        # (the same retry-stats law _merge_bucket pins via last_epoch_stats)
        stt = m.stats or {}
        rows = (stt.get("upserts", 0) + stt.get("deletes", 0)
                + stt.get("skipped_stale", 0))
        return pa.table({"bucket": pa.array([bucket], pa.int32()),
                         "rows": pa.array([rows], pa.int64()),
                         "live": pa.array([m.row_count], pa.int64()),
                         "deletes": pa.array([stt.get("deletes", 0)],
                                             pa.int64()),
                         "max_lsn": pa.array([m.last_applied_lsn], pa.int64())})
    fresh = reduce_lww(group).sort_by(
        [("repo", "ascending"), ("path", "ascending")])
    n_del = fresh.column("content").null_count
    live = fresh.num_rows - n_del
    rel = f"data/bucket={bucket:05d}/run-{epoch:05d}.parquet"
    atomic_write_table(os.path.join(state_dir, rel), fresh)
    max_lsn = int(pc.max(fresh.column("lsn")).as_py())
    write_manifest(state_dir, BucketManifest(
        bucket=bucket, epoch=epoch, last_applied_lsn=max_lsn,
        row_count=live, base_file=None, runs=[rel],
        stats={"upserts": live, "deletes": n_del,
               "skipped_stale": group.num_rows - fresh.num_rows}))
    return pa.table({"bucket": pa.array([bucket], pa.int32()),
                     "rows": pa.array([group.num_rows], pa.int64()),
                     "live": pa.array([live], pa.int64()),
                     "deletes": pa.array([n_del], pa.int64()),
                     "max_lsn": pa.array([max_lsn], pa.int64())})


class _ReadBucket:
    """Task-pool UDF (instance): merge-on-read of one committed bucket per
    input row."""

    def __init__(self, state_dir: str, with_sha: bool):
        self.state_dir = state_dir
        self.with_sha = with_sha
        self.schema = CdcEngine.load_schema(state_dir)
        self.strategy = CdcEngine.persisted_merge_strategy(state_dir)

    def _dropped(self) -> tuple:
        """Columns never surfaced to readers: shuffle/state metadata, plus
        patch-strategy internals (``op`` is consumed by the fold; ``_reset``
        is LSM state). Under lww, ``op`` stays — there it is ordinary user
        data."""
        base = ("bucket", "__key")
        return base + (("op", RESET_COL) if self.strategy == "patch" else ())

    def _empty(self) -> pa.Table:
        """Typed empty table carrying the known output schema — a 0-column
        block would give downstream blocks an inconsistent schema (Ray's
        'RefBundle with a different schema' warning)."""
        fields = [f for f in (self.schema or pa.schema([]))
                  if f.name not in self._dropped()]
        fields.append(pa.field("lsn", pa.int64()))
        if self.with_sha:
            fields.append(pa.field("sha256", pa.string()))
        return pa.schema(fields).empty_table()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for b in batch.column("bucket").to_pylist():
            m = load_manifest(self.state_dir, int(b))
            if m is None:
                continue
            merged = _read_committed(self.state_dir, m.base_file, m.runs,
                                     self.strategy)
            if merged is None:
                continue
            t = drop_tombstones(merged)
            if self.with_sha:
                t = t.append_column("sha256", sha256_hex(t["content"]))
            # state dirs written before the __key column was removed from the
            # shuffle still carry it in base/run files; drop defensively so a
            # pre-change state dir can't leak a null-padded __key into output
            drop = [c for c in self._dropped() if c in t.column_names]
            out.append(t.drop_columns(drop))
        if not out:
            return self._empty()
        return pa.concat_tables(out, promote_options="permissive")


def _bucket_delta_files(state_dir: str, m: BucketManifest, lo: int = 0,
                        hi: int | None = None) -> list[tuple[int, str]]:
    """(epoch, abs_path) of one bucket's retained LWW delta runs in range.

    Archived deltas come from ``changelog/bucket=B/`` (moved there by
    compaction under retain_changelog); live deltas come from the committed
    manifest's ``runs`` list — NOT a directory glob, so a run file written by
    a crashed, never-committed epoch is invisible here exactly as it is to
    merge-on-read. The two sets are disjoint (archiving clears ``m.runs``
    and epochs never re-enter it). A ``floor-EEEEE.parquet`` checkpoint
    (written by prune_changelog — the fold of every pruned run at-or-below
    its label) participates like a run at its label epoch and WINS over a
    same-label run file (the crash window between checkpoint write and run
    deletion leaves both; the checkpoint subsumes the run)."""
    out: dict[int, str] = {}
    floors: dict[int, str] = {}
    cl = os.path.join(state_dir, "changelog", f"bucket={m.bucket:05d}")
    if os.path.isdir(cl):
        for f in os.listdir(cl):
            if not f.endswith(".parquet"):
                continue
            if f.startswith("run-"):
                e = int(f[len("run-"):-len(".parquet")])
                if lo <= e and (hi is None or e <= hi):
                    out[e] = os.path.join(cl, f)
            elif f.startswith("floor-"):
                e = int(f[len("floor-"):-len(".parquet")])
                if lo <= e and (hi is None or e <= hi):
                    floors[e] = os.path.join(cl, f)
    out.update(floors)
    for rel in m.runs:
        e = int(os.path.basename(rel)[len("run-"):-len(".parquet")])
        if lo <= e and (hi is None or e <= hi):
            out[e] = os.path.join(state_dir, rel)
    return sorted(out.items())


class _ViewDeltas:
    """Task-pool UDF: per-(repo, epoch) increments of a downstream aggregate
    (live-file count + content bytes) derived from one bucket's retained
    delta runs — the raw material for INCREMENTAL VIEW MAINTENANCE: a
    consumer folds these instead of rescanning the table.

    Per key the delta at epoch e is value(winner at e) − value(previous
    winner), computed vectorized after one (key, epoch) sort — keys are
    bucket-complete, so a bucket task sees every predecessor it needs. The
    per-bucket result is pre-aggregated to one row per (repo, epoch), so the
    downstream shuffle moves O(repos × epochs) rows, never the change rows."""

    def __init__(self, state_dir: str, hi: int | None):
        self.state_dir, self.hi = state_dir, hi

    @staticmethod
    def _empty() -> pa.Table:
        return pa.schema([
            pa.field("repo", pa.string()), pa.field("epoch", pa.int64()),
            pa.field("d_files", pa.int64()), pa.field("d_bytes", pa.int64()),
        ]).empty_table()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .merge import _encode_keys, key_column
        out = []
        for b in batch.column("bucket").to_pylist():
            m = load_manifest(self.state_dir, int(b))
            if m is None:
                continue
            parts = []
            for e, path in _bucket_delta_files(self.state_dir, m, 0, self.hi):
                t = pq.read_table(path,
                                  columns=["repo", "path", "content", "lsn"])
                parts.append(t.append_column(
                    "epoch", pa.array([e] * t.num_rows, pa.int64())))
            if not parts:
                continue
            t = pa.concat_tables(parts, promote_options="permissive")
            codes, _ = _encode_keys(key_column(t))
            epoch = t["epoch"].to_numpy(zero_copy_only=False)
            lsn = t["lsn"].to_numpy(zero_copy_only=False)
            live = pc.is_valid(t["content"]).to_numpy(zero_copy_only=False)
            nbytes = pc.binary_length(pc.fill_null(t["content"], "")) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.lexsort((epoch, codes))
            codes, epoch, lsn = codes[order], epoch[order], lsn[order]
            live, nbytes = live[order].astype(np.int64), nbytes[order]
            # The key's CURRENT value at epoch e is the max-LSN row among
            # deltas <= e, NOT the latest-epoch row — cross-epoch
            # out-of-order delivery stores stale rows in later runs that the
            # LWW merge-on-read ignores (same rule as merge_sorted_runs).
            # Track the running winner per key: a row updates the view only
            # when its lsn reaches the key's cummax (ties are verbatim
            # duplicate deliveries, so >= is value-neutral).
            idx = np.arange(len(codes))
            cummax = pd.Series(lsn).groupby(codes).cummax().to_numpy()
            seg_start = np.r_[True, codes[1:] != codes[:-1]]
            prev_cummax = np.r_[0, cummax[:-1]]
            new_winner = seg_start | (lsn >= prev_cummax)
            widx = np.maximum.accumulate(np.where(new_winner, idx, -1))
            f_now = live[widx]
            v_now = np.where(f_now.astype(bool), nbytes[widx], 0)
            prev_f = np.where(seg_start, 0, np.r_[0, f_now[:-1]])
            prev_v = np.where(seg_start, 0, np.r_[0, v_now[:-1]])
            d_files = f_now - prev_f
            d_bytes = v_now - prev_v
            repos = t["repo"].take(pa.array(order))
            df = pd.DataFrame({"repo": repos.to_pandas(), "epoch": epoch,
                               "d_files": d_files, "d_bytes": d_bytes})
            agg = df.groupby(["repo", "epoch"], sort=False, as_index=False).sum()
            out.append(pa.table({
                "repo": pa.array(agg["repo"], pa.string()),
                "epoch": pa.array(agg["epoch"].to_numpy(np.int64), pa.int64()),
                "d_files": pa.array(agg["d_files"].to_numpy(np.int64), pa.int64()),
                "d_bytes": pa.array(agg["d_bytes"].to_numpy(np.int64), pa.int64()),
            }))
        if not out:
            return self._empty()
        return pa.concat_tables(out)


class _ReadChangelog:
    """Task-pool UDF: one bucket's change stream (epoch-ranged delta rows).

    Under the patch strategy the emitted rows are the per-epoch folded
    PATCHES (null value = unchanged) with their ``_reset`` flag kept — the
    Debezium partial-event stream shape — and ``op`` distinguishes
    ``patch`` (coalesce onto previous state) / ``upsert`` (reset carrying a
    full row) / ``delete`` (pure tombstone). Folding the stream with
    cdc/patch.fold_patch_runs in epoch order reconstructs any state prefix
    (pinned in tests)."""

    def __init__(self, state_dir: str, lo: int, hi: int | None):
        self.state_dir, self.lo, self.hi = state_dir, lo, hi
        self.schema = CdcEngine.load_schema(state_dir)
        self.strategy = CdcEngine.persisted_merge_strategy(state_dir)

    def _empty(self) -> pa.Table:
        # field order MUST match the real per-bucket output (stored run
        # columns [..., lsn, _reset], then appended epoch, then op) — a
        # Dataset mixing empty and non-empty blocks with different column
        # order trips Ray's inconsistent-schema unification
        fields = [f for f in (self.schema or pa.schema([]))
                  if f.name not in ("bucket", "op")]
        fields.append(pa.field("lsn", pa.int64()))
        if self.strategy == "patch":
            fields.append(pa.field(RESET_COL, pa.bool_()))
        fields += [pa.field("epoch", pa.int64()),
                   pa.field("op", pa.string())]
        return pa.schema(fields).empty_table()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for b in batch.column("bucket").to_pylist():
            m = load_manifest(self.state_dir, int(b))
            if m is None:
                continue
            for e, path in _bucket_delta_files(self.state_dir, m,
                                               self.lo, self.hi):
                t = pq.read_table(path)
                drop = [c for c in ("bucket", "__key") if c in t.column_names]
                t = t.drop_columns(drop)
                t = t.append_column(
                    "epoch", pa.array([e] * t.num_rows, pa.int64()))
                if self.strategy == "patch":
                    reset = pc.fill_null(t[RESET_COL], False)
                    tomb = pc.and_(reset, pc.is_null(t["content"]))
                    op = pc.if_else(tomb, pa.scalar("delete"),
                                    pc.if_else(reset, pa.scalar("upsert"),
                                               pa.scalar("patch")))
                else:
                    op = pc.if_else(pc.is_valid(t["content"]),
                                    pa.scalar("upsert"), pa.scalar("delete"))
                out.append(t.append_column("op", op))
        if not out:
            return self._empty()
        return pa.concat_tables(out, promote_options="permissive")


class _ReadBucketAsOf:
    """Task-pool UDF: merge-on-read of one bucket's state AS OF an epoch —
    the LWW merge of every retained delta with epoch <= the cut, bases
    ignored (they mix epochs; the deltas alone reconstruct any point)."""

    def __init__(self, state_dir: str, epoch: int, with_sha: bool):
        self.state_dir, self.epoch, self.with_sha = state_dir, epoch, with_sha
        # reuse _ReadBucket's typed-empty logic (and its loaded schema)
        # instead of re-reading schema.bin per empty batch
        self._base = _ReadBucket(state_dir, with_sha)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for b in batch.column("bucket").to_pylist():
            m = load_manifest(self.state_dir, int(b))
            if m is None:
                continue
            parts = [pq.read_table(p) for _, p in
                     _bucket_delta_files(self.state_dir, m, 0, self.epoch)]
            # epoch-ascending (``_bucket_delta_files`` sorts) — required by
            # the patch fold, irrelevant to the LWW merge
            merged = (fold_patch_runs(parts)
                      if self._base.strategy == "patch"
                      else merge_sorted_runs(parts))
            if merged is None:
                continue
            t = drop_tombstones(merged)
            if self.with_sha:
                t = t.append_column("sha256", sha256_hex(t["content"]))
            drop = [c for c in self._base._dropped() if c in t.column_names]
            out.append(t.drop_columns(drop))
        if not out:
            return self._base._empty()
        return pa.concat_tables(out, promote_options="permissive")


@dataclass
class ReplayResult:
    epochs: list[dict] = field(default_factory=list)
    n_applied: int = 0
    n_upserts: int = 0
    n_deletes: int = 0
    n_skipped: int = 0
    n_quarantined: int = 0


class CdcEngine:
    """Incremental, resumable, exactly-once LWW upsert engine over Ray Data."""

    def __init__(self, state_dir: str, num_buckets: int = 64,
                 evolution: EvolutionSpec | None = None,
                 compact_every: int = 4,
                 normalize_concurrency: int | tuple | None = None,
                 normalize_batch_size: int = 128 * 1024,
                 retain_changelog: bool = False,
                 compact_min_bytes: int | None = None,
                 quarantine: bool = False,
                 merge_strategy: str | None = None):
        self.state_dir = state_dir
        self.num_buckets = num_buckets
        self.evolution = evolution or EvolutionSpec()
        self.compact_every = compact_every
        # size-tiered compaction: also fold a bucket's delta runs whenever
        # their total bytes reach this threshold, regardless of run count
        # (None = count-based only). See _merge_bucket.
        self.compact_min_bytes = compact_min_bytes
        self.normalize_concurrency = normalize_concurrency
        self.normalize_batch_size = normalize_batch_size
        # quarantine=True: replay routes malformed events (null key/commit,
        # unparseable LSN) to a dead-letter table under
        # ``state_dir/quarantine/`` instead of failing the run — see
        # NormalizeEvents(quarantine=...) and _quarantine_epoch. Read it
        # back with quarantine_dataset(). The default stays fail-loud.
        self.quarantine = quarantine
        # retain_changelog: keep every epoch's LWW delta run (compaction
        # archives it under changelog/ instead of unlinking) so the engine
        # can serve a downstream change stream (changelog_dataset) and
        # time-travel reads (dataset_as_of). Storage grows with total change
        # volume, like any CDC retention window; bound it with
        # prune_changelog(before_epoch) (CLI: prune-changelog), which folds
        # the pruned prefix into a per-bucket floor checkpoint so reads at
        # or above the floor stay exact and reads below refuse loudly.
        self.retain_changelog = retain_changelog
        # lazy-loaded snapshot-cut watermark (see bootstrap()); tuple marks
        # "loaded" so a dir without one is not re-stat'd every epoch
        self._bootstrap_wm_cache: tuple | None = None
        os.makedirs(state_dir, exist_ok=True)
        # Persist the retention choice: a later engine over the same dir
        # that forgets the flag (e.g. a bare `cli compact`) would otherwise
        # unlink the delta runs and irreversibly break changelog/as-of
        # reads. The marker lets callers auto-detect (retention_enabled).
        if retain_changelog:
            p = os.path.join(state_dir, "retain_changelog.json")
            if not os.path.exists(p):
                atomic_write_bytes(p, b'{"retain_changelog": true}')
        # num_buckets is the one layout parameter that silently corrupts
        # state if it drifts between runs (a key re-hashes to a different
        # bucket: duplicate PKs in the merged table, tombstones that no
        # longer block their key's stale upserts). Persist it on first use
        # and refuse a mismatched resume loudly.
        layout = self.persisted_layout(state_dir)
        persisted = None if layout is None else int(layout["num_buckets"])
        # the bucket-hash recipe is placement-defining persisted state: a
        # dir keeps the recipe it was built with (pre-recipe layouts were
        # written by the pandas-siphash code -> v1); only fresh dirs get
        # the current default
        self.bucket_hash = (BUCKET_HASH_DEFAULT if layout is None
                            else int(layout.get("bucket_hash",
                                                BUCKET_HASH_SIPHASH)))
        # The merge strategy is STATE-DEFINING persisted layout (lww run
        # files hold whole-row winners; patch run files hold column deltas
        # + _reset — reading one under the other contract silently corrupts
        # the merge): a dir keeps the strategy it was built with; an
        # explicit conflicting request refuses loudly; merge_strategy=None
        # adopts the persisted value (fresh dirs default to lww).
        persisted_ms = (None if layout is None
                        else layout.get("merge_strategy", "lww"))
        if merge_strategy is not None and merge_strategy not in ("lww", "patch"):
            raise ValueError(f"unknown merge_strategy {merge_strategy!r} "
                             "(expected 'lww' or 'patch')")
        if persisted_ms is None:
            self.merge_strategy = merge_strategy or "lww"
        elif merge_strategy is not None and merge_strategy != persisted_ms:
            raise ValueError(
                f"state dir {state_dir!r} was built with merge_strategy="
                f"{persisted_ms!r}, got {merge_strategy!r}; the strategy is "
                "fixed at dir creation (rebuild by replaying from the event "
                "log to change it)")
        else:
            self.merge_strategy = persisted_ms
        # patch + retain_changelog IS supported: the retained runs are
        # per-epoch folded patch rows (exactly the Debezium partial-event
        # stream shape), the changelog reader keeps their _reset flag and
        # tags ops patch/upsert/delete, and as-of reads are an epoch-prefix
        # fold. Only view_deltas stays lww-only (an aggregate increment
        # needs the previous WHOLE row, which a patch does not carry).
        if persisted is None:
            # A dir with persisted bucket state but NO layout.json predates
            # layout persistence — i.e. it was written with the v1
            # (non-injective) key encoding, because layout.json and the v2
            # key shipped together. Stamping it v2 here and replaying would
            # re-hash keys into different buckets (duplicate PKs across
            # buckets, tombstones that stop blocking their key's stale
            # upserts) — exactly the corruption persisted_num_buckets
            # refuses for an explicit v1 stamp. Refuse; only a genuinely
            # fresh dir (no bucket manifests) gets the v2 stamp.
            mdir = os.path.join(state_dir, "manifest")
            if os.path.isdir(mdir):
                ids = [int(n[len("bucket-"):-len(".json")])
                       for n in os.listdir(mdir)
                       if n.startswith("bucket-") and n.endswith(".json")]
                if ids:
                    raise ValueError(
                        f"state dir {state_dir!r} has persisted bucket state "
                        "but no layout.json — it predates layout persistence "
                        "and was built with the v1 (non-injective) key "
                        "encoding; this engine uses v2 (length-prefixed "
                        "keys), which places keys in different buckets. "
                        "Rebuild the state dir by replaying from the event "
                        "log")
            atomic_write_bytes(self._layout_path(state_dir),
                               json.dumps({"num_buckets": num_buckets,
                                           "key_encoding": 2,
                                           "bucket_hash": self.bucket_hash,
                                           "merge_strategy": self.merge_strategy
                                           }).encode())
        elif persisted != num_buckets:
            raise ValueError(
                f"state dir {state_dir!r} was built with num_buckets="
                f"{persisted}, got {num_buckets}; pass the persisted value "
                f"(or use reshard() to change the bucket layout)")

    @staticmethod
    def _layout_path(state_dir: str) -> str:
        return os.path.join(state_dir, "layout.json")

    @classmethod
    def persisted_layout(cls, state_dir: str) -> dict | None:
        """The persisted placement-defining layout (num_buckets, key
        encoding, bucket-hash recipe), or None for a fresh dir (or one
        written before layout persistence existed).
        Refuses a key-encoding mismatch: the injective v2 key changes
        bucket placement, so replaying a v1 dir with v2 code would split
        keys across buckets (same corruption class as a bucket-count
        drift)."""
        p = cls._layout_path(state_dir)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            data = json.load(f)
        if data.get("key_encoding", 1) != 2:
            raise ValueError(
                f"state dir {state_dir!r} was built with key-encoding "
                f"v{data.get('key_encoding', 1)}; this engine uses v2 "
                "(injective length-prefixed keys) — rebuild the state dir "
                "by replaying from the event log")
        return data

    @classmethod
    def persisted_num_buckets(cls, state_dir: str) -> int | None:
        """The bucket count this state dir was built with (see
        :meth:`persisted_layout`)."""
        layout = cls.persisted_layout(state_dir)
        return None if layout is None else int(layout["num_buckets"])

    @classmethod
    def persisted_merge_strategy(cls, state_dir: str) -> str:
        """The merge strategy this state dir was built with ('lww' for
        fresh/pre-strategy dirs — patch shipped with the layout field, so
        an absent field can only mean lww)."""
        layout = cls.persisted_layout(state_dir)
        return "lww" if layout is None else layout.get("merge_strategy", "lww")

    def _require_lww(self, what: str) -> None:
        if self.merge_strategy == "patch":
            raise NotImplementedError(
                f"{what} is not supported under merge_strategy='patch' "
                "(it needs per-epoch whole-row deltas; patch runs hold "
                "column patches)")

    @staticmethod
    def retention_enabled(state_dir: str) -> bool:
        """True if this state dir was ever run with ``retain_changelog=True``
        (persisted marker — see __init__)."""
        return os.path.exists(os.path.join(state_dir, "retain_changelog.json"))

    def _norm_opts(self) -> dict:
        """map_batches kwargs for the normalize stage: by default the task
        pool runs at Ray's own parallelism; ``normalize_concurrency`` (int
        or (min, max)) caps it — e.g. to bound memory or leave room for a
        co-tenant pipeline on a shared cluster."""
        if self.normalize_concurrency is None:
            return {}
        return {"concurrency": self.normalize_concurrency}

    # ---- schema persistence -------------------------------------------
    def _schema_path(self) -> str:
        return os.path.join(self.state_dir, "schema.bin")

    def save_schema(self, schema: pa.Schema) -> None:
        atomic_write_bytes(self._schema_path(), schema.serialize().to_pybytes())

    @staticmethod
    def load_schema(state_dir: str) -> pa.Schema | None:
        p = os.path.join(state_dir, "schema.bin")
        if not os.path.exists(p):
            return None
        with open(p, "rb") as f:
            return pa.ipc.read_schema(pa.BufferReader(f.read()))

    # ---- epoch-level lineage ------------------------------------------
    def _epochs_path(self) -> str:
        return os.path.join(self.state_dir, "epochs.json")

    def committed_epochs(self) -> list[dict]:
        p = self._epochs_path()
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)

    def _commit_epoch(self, record: dict) -> None:
        epochs = self.committed_epochs()
        epochs.append(record)
        atomic_write_bytes(self._epochs_path(),
                           json.dumps(epochs, sort_keys=True).encode())

    # ---- bootstrap (the full-load half of full-load + CDC) -------------
    def _bootstrap_path(self) -> str:
        return os.path.join(self.state_dir, "bootstrap.json")

    def bootstrap_lsn(self) -> int | None:
        """The snapshot-cut LSN recorded by :meth:`bootstrap`, or None for a
        state dir built purely from change replay."""
        if self._bootstrap_wm_cache is None:
            p = self._bootstrap_path()
            lsn = None
            if os.path.exists(p):
                with open(p) as f:
                    lsn = int(json.load(f)["as_of_lsn"])
            self._bootstrap_wm_cache = (lsn,)
        return self._bootstrap_wm_cache[0]

    def bootstrap(self, snapshot: "ray.data.Dataset",
                  as_of_lsn: int | None = None) -> int:
        """Distributed initial snapshot load — the full-load half of a
        full-load-then-CDC migration (the public Debezium snapshot-mode /
        DMS full-load shape). ``snapshot`` is the CURRENT table state (one
        row per key, same columns as the change stream); it runs through the
        same normalize stage as change batches (schema conform, LSN from
        commit, key-hash bucket), LWW-collapses per bucket (tolerating
        accidental duplicate keys), and each bucket's rows are written
        DIRECTLY as its epoch-0 delta run + manifest — one shuffle, no
        per-event merge. ONE scale-shaped pass: nothing materializes on the
        driver. Because the snapshot is an ordinary delta run, changelog
        retention, time travel (:meth:`dataset_as_of`) and incremental view
        folds (:meth:`view_deltas`) treat it uniformly: with
        ``retain_changelog=True`` the change stream reports the initial load
        as epoch-0 upserts (the Debezium snapshot-read shape).

        ``as_of_lsn``: the LSN the snapshot is consistent as of. Subsequent
        :meth:`replay` calls drop events at-or-below this cut (they are
        already reflected in the snapshot, whose tombstones were NOT carried
        over — without the cut filter a re-delivered stale upsert could
        resurrect a key deleted before the snapshot). Defaults to the
        snapshot's own max LSN, which is only safe when the source
        guarantees no pre-cut re-delivery beyond that point.

        Refuses a state dir that has committed lineage or an earlier
        bootstrap; a bootstrap that CRASHED mid-way may be re-run — buckets
        with committed manifests short-circuit (exactly-once, same
        discipline as the merge path). Returns the number of live rows
        loaded."""
        self._require_lww("bootstrap (snapshot rows carry no 'op' column; "
                          "load the snapshot as epoch-0 'u' events instead)")
        if self.committed_epochs() or os.path.exists(self._bootstrap_path()):
            raise ValueError(
                "bootstrap requires a fresh state dir (it is the initial "
                "full load); apply increments with replay()")
        s = snapshot.schema()
        base = getattr(s, "base_schema", None)
        if not isinstance(base, pa.Schema):
            # pandas-backed Datasets surface numpy dtypes; map them (object
            # dtype -> string — pass an Arrow-backed Dataset, e.g. from
            # read_parquet/from_arrow, when exact binary/nested types matter)
            def at(t):
                if isinstance(t, pa.DataType):
                    return t
                try:
                    return pa.from_numpy_dtype(np.dtype(t))
                except (TypeError, pa.ArrowNotImplementedError):
                    return pa.string()
            base = pa.schema(
                [pa.field(n, at(t)) for n, t in zip(s.names, s.types)])
        target = conform_schema(base, self.evolution)
        self.save_schema(target)
        norm = snapshot.map_batches(
            NormalizeEvents(target_schema=target, num_buckets=self.num_buckets,
                            evolution=self.evolution,
                            bucket_hash=self.bucket_hash),
            batch_format="pyarrow", batch_size=self.normalize_batch_size,
            **self._norm_opts())
        write = functools.partial(_bootstrap_bucket, state_dir=self.state_dir,
                                  epoch=0)
        st = (norm.groupby("bucket").map_groups(write, batch_format="pyarrow")
                  .to_pandas())  # one row per bucket — small
        n_live = int(st["live"].sum()) if len(st) else 0
        if as_of_lsn is None:
            as_of_lsn = int(st["max_lsn"].max()) if len(st) else 0
        atomic_write_bytes(self._bootstrap_path(),
                           json.dumps({"as_of_lsn": int(as_of_lsn)}).encode())
        self._bootstrap_wm_cache = (int(as_of_lsn),)
        self._commit_epoch({
            "epoch": 0, "files": ["<bootstrap>"],
            "applied": int(st["rows"].sum()) if len(st) else 0,
            "upserts": n_live,
            "deletes": int(st["deletes"].sum()) if len(st) else 0,
            "skipped_stale": 0, "buckets_touched": int(len(st)),
            "bootstrap_as_of_lsn": int(as_of_lsn)})
        return n_live

    # ---- core ----------------------------------------------------------
    def apply_epoch(self, files: list[str], epoch: int,
                    planned: pa.Schema | None = None) -> dict:
        """Apply one ordered batch-file group as epoch ``epoch``. Idempotent.

        ``planned``: pre-computed unified schema of these files (replay plans
        the whole file set once instead of per epoch — footer metadata only).
        """
        target = self._resolve_schema(files, planned)
        norm = self._normalized(files, target)
        return self._merge_epoch(norm, files, epoch)

    def _resolve_schema(self, files: list[str],
                        planned: pa.Schema | None) -> pa.Schema:
        """Unify the (pre-)planned input schema with any committed state schema
        and persist the result."""
        old_schema = self.load_schema(self.state_dir)
        schemas = [s for s in [old_schema] if s is not None]
        target = planned if planned is not None else plan_target_schema(files, self.evolution)
        if schemas:
            target = pa.unify_schemas(schemas + [target], promote_options="permissive")
        self.save_schema(target)
        return target

    def _normalized(self, files: list[str], target: pa.Schema) -> "ray.data.Dataset":
        """Lazy read -> normalize pipeline for one epoch's batch files.

        NormalizeEvents holds only tiny state (schema + remap dict), so it
        runs as a TASK-pool UDF (instance, pickled per task): full
        parallelism from the first batch, no actor-pool ramp-up.
        Coarse blocks: per-block/task fixed costs dominate small blocks
        (measured 10x), so target ~4 read tasks per CPU slot and never split
        a file. On a multi-node cluster CPU count is the cluster total, so
        block count tracks cluster size exactly as it should.
        """
        cpus = int(ray.cluster_resources().get("CPU", 4))
        nblocks = max(1, min(len(files), 4 * cpus))
        # Plan builds may run on prefetch threads; read_parquet's lazy
        # fsspec-http probe is not thread-safe when aiohttp is absent (the
        # failed module re-executes on every call and a concurrent first
        # import raises a plain ImportError Ray does not catch), so builds
        # are serialized among THEMSELVES — they still overlap execution.
        with _PLAN_BUILD_LOCK:
            ds = ray.data.read_parquet(files, override_num_blocks=nblocks)
        # after a snapshot bootstrap, events at-or-below the snapshot-cut LSN
        # are already reflected in the loaded state AND their tombstones were
        # not carried over — re-delivered pre-cut history must drop here or a
        # stale upsert could resurrect a key deleted before the cut
        cut = self.bootstrap_lsn()
        watermarks = ({b: cut for b in range(self.num_buckets)}
                      if cut is not None else None)
        return ds.map_batches(
            NormalizeEvents(target_schema=target, num_buckets=self.num_buckets,
                            evolution=self.evolution, watermarks=watermarks,
                            bucket_hash=self.bucket_hash,
                            quarantine=self.quarantine,
                            strategy=self.merge_strategy),
            batch_format="pyarrow",
            batch_size=self.normalize_batch_size,
            **self._norm_opts(),
        )

    def _merge_epoch(self, norm: "ray.data.Dataset", files: list[str],
                     epoch: int) -> dict:
        """Shuffle one epoch's normalized winners to their buckets, merge, and
        commit the epoch's lineage record."""
        merge = functools.partial(_merge_bucket, state_dir=self.state_dir,
                                  epoch=epoch, compact_every=self.compact_every,
                                  retain_changelog=self.retain_changelog,
                                  compact_min_bytes=self.compact_min_bytes,
                                  quarantine_bucket=(self.num_buckets
                                                     if self.quarantine
                                                     else None),
                                  strategy=self.merge_strategy)
        # Sort-based groupby shuffle on the int32 bucket column. Measured
        # against ShuffleStrategy.HASH_SHUFFLE at 5M events: the sort exchange
        # costs <1 core-sec per epoch vs ~70 core-sec for the hash-aggregator
        # path, because the combiner upstream already shrank the data and the
        # sort key is a single int32.
        stats = norm.groupby("bucket").map_groups(merge, batch_format="pyarrow")
        st = stats.to_pandas()  # one row per touched bucket — small
        n_quarantined = 0
        if self.quarantine and len(st):
            qm = st["bucket"] == self.num_buckets
            n_quarantined = int(st.loc[qm, "applied"].sum())
            st = st[~qm]
        rec = {
            "epoch": epoch, "files": files,
            "applied": int(st["applied"].sum()) if len(st) else 0,
            "upserts": int(st["upserts"].sum()) if len(st) else 0,
            "deletes": int(st["deletes"].sum()) if len(st) else 0,
            "skipped_stale": int(st["skipped_stale"].sum()) if len(st) else 0,
            "buckets_touched": int(len(st)),
        }
        if self.quarantine:
            rec["quarantined"] = n_quarantined
        self._commit_epoch(rec)
        return rec

    @staticmethod
    def _pending_files(files: list[str], done: list[dict]
                       ) -> tuple[list[str], list[str]]:
        """THE file-set resume predicate replay and tail share (a drift
        between two copies would let the tail grouping decision disagree
        with the actual skip decision). Paths normalize to realpath;
        committed records match on BOTH the raw recorded string and its
        realpath — records written by pre-normalization revisions may hold
        relative paths that realpath differently under another CWD (worst
        case is duplicated work, which LWW keeps correct)."""
        files = [os.path.realpath(f) for f in files]
        applied = {f for rec in done for f in rec.get("files", [])}
        applied |= {os.path.realpath(f) for f in applied}
        return files, [f for f in files if f not in applied]

    def replay(self, files: list[str], epoch_size: int | None = None,
               fail_after_epoch: int | None = None) -> ReplayResult:
        """Replay ``files`` in order, grouped into epochs; resumes from lineage.

        ``fail_after_epoch`` is a test hook that raises after committing that
        many epochs (kill-and-resume suites)."""
        # max(..., 1): replay([]) (a glob that matched nothing) is a no-op
        # returning the committed lineage, not a range(0, 0, 0) crash
        epoch_size = epoch_size or max(len(files), 1)
        done = self.committed_epochs()
        # resume by FILE SET, not epoch position: committed lineage records
        # each epoch's file list, so files already applied are skipped even if
        # the caller's grouping differs from the original run's (e.g. a tail
        # session interleaved with one-shot replays, or late-arriving files
        # that sort before already-applied ones). Normalization/matching
        # rules live in _pending_files — the ONE predicate tail shares.
        files, pending = self._pending_files(files, done)
        result = ReplayResult(epochs=list(done))
        groups = [pending[i:i + epoch_size]
                  for i in range(0, len(pending), epoch_size)]
        # Never reuse a possibly-partially-applied epoch number for a
        # DIFFERENT file group: if a run crashed after some bucket manifests
        # committed at epoch E but before E's lineage record was written,
        # resuming with E assigned to a new group (late-arriving file sorting
        # earlier, changed epoch_size) would make those buckets silently
        # discard the new group's never-applied rows as stale. Allocate from
        # past the highest bucket-manifest epoch instead — re-applying the
        # crashed epoch's own files at a higher number is LWW-idempotent.
        # The manifest scan is O(num_buckets) driver file reads, so only pay
        # it when there is actually something to apply (tail() calls replay
        # once per poll, usually with nothing pending).
        if groups:
            max_bucket_epoch = max(
                (m.epoch for m in load_all_manifests(self.state_dir).values()),
                default=-1)
            start = max(len(done), max_bucket_epoch + 1)
        else:
            start = len(done)
        todo = [(start + j, g) for j, g in enumerate(groups)]
        if todo:
            planned = plan_target_schema([f for _, g in todo for f in g],
                                         self.evolution)
            if fail_after_epoch is not None:
                # deterministic epoch-by-epoch path for kill/resume suites
                last_i = todo[-1][0]
                for i, group in todo:
                    result.epochs.append(self.apply_epoch(group, epoch=i,
                                                          planned=planned))
                    if i + 1 >= fail_after_epoch and i < last_i:
                        raise RuntimeError(f"injected failure after epoch {i}")
            else:
                result.epochs.extend(self._replay_pipelined(todo, planned))
        for rec in result.epochs:
            result.n_applied += rec["applied"]
            result.n_upserts += rec["upserts"]
            result.n_deletes += rec["deletes"]
            result.n_skipped += rec["skipped_stale"]
            result.n_quarantined += rec.get("quarantined", 0)
        return result

    def _replay_pipelined(self, todo: list[tuple[int, list[str]]],
                          planned: pa.Schema) -> list[dict]:
        """Apply epochs in order, overlapping epoch i's (stateful, serialized)
        shuffle+merge with epoch i+1's (stateless) read+normalize.

        Merges stay strictly sequential — only one merge thread exists at a
        time, so watermark/lineage semantics are identical to the serial path;
        the overlap only hides the pipeline fill latency of the next epoch's
        scan behind the current epoch's commit. ``materialize()`` pins an
        epoch's combined winners (not the input) in the object store; while
        epoch i's merge drains, epoch i+1 is already materializing, so up to
        TWO epochs' winners are pinned concurrently — size ``epoch_size``
        (the micro-batch knob) for 2x one epoch's winner footprint.
        """
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        target = self._resolve_schema([f for _, g in todo for f in g], planned)
        records: list[dict] = []
        prev: tuple[threading.Thread, dict] | None = None

        def run_merge(norm, files, epoch, box):
            try:
                t0 = time.time()
                box["rec"] = self._merge_epoch(norm, files, epoch)
                # per-phase attribution for the scaling evidence: how much
                # wall the (stateful, serialized) shuffle+merge leg took,
                # independent of the overlapped read+normalize
                box["rec"]["merge_sec"] = round(time.time() - t0, 3)
            except BaseException as e:  # surfaced on join
                box["err"] = e

        # Building the lazy read+normalize plan costs ~0.5s of DRIVER time
        # per epoch (read_parquet fetches every file's footer metadata before
        # returning) — a cluster-size-independent serial cost that sat on the
        # critical path. Prefetch the next few epochs' plans in a small
        # thread pool so metadata fetch overlaps execution; the window is
        # bounded so a 10^10-event replay with thousands of epochs never
        # holds more than a handful of unexecuted plans.
        prefetch = ThreadPoolExecutor(max_workers=2)
        window: deque = deque()
        nxt = 0

        def top_up(done_idx: int) -> None:
            nonlocal nxt
            while nxt < len(todo) and nxt < done_idx + 4:
                window.append(
                    prefetch.submit(self._normalized, todo[nxt][1], target))
                nxt += 1

        norm_waits: list[float] = []
        try:
            for j, (i, group) in enumerate(todo):
                top_up(j)
                t0 = time.time()
                norm = window.popleft().result().materialize()
                # wall the driver spent BLOCKED on read+normalize (zero when
                # the previous epoch's merge fully hid it) — per-phase
                # attribution for the scaling evidence
                norm_waits.append(round(time.time() - t0, 3))
                if prev is not None:
                    prev[0].join()
                    if "err" in prev[1]:
                        raise prev[1]["err"]
                    records.append(prev[1]["rec"])
                box: dict = {}
                th = threading.Thread(target=run_merge, args=(norm, group, i, box),
                                      daemon=True)
                th.start()
                prev = (th, box)
            if prev is not None:
                prev[0].join()
                if "err" in prev[1]:
                    raise prev[1]["err"]
                records.append(prev[1]["rec"])
            for k, rec in enumerate(records):
                rec["norm_wait_sec"] = norm_waits[k]
            return records
        finally:
            # error path too: join the in-flight merge before propagating —
            # a daemon thread left running would keep committing manifests
            # and epochs.json records AFTER replay() reported failure, and
            # its unsynchronized epochs.json append could race a retry's
            # read-append-write into a lost lineage record
            if prev is not None:
                prev[0].join()
            # and don't leak queued plan builds past the raise
            prefetch.shutdown(wait=False, cancel_futures=True)

    def tail(self, events_dir: str, epoch_size: int = 1,
             poll_interval_s: float = 1.0, max_idle_polls: int = 5,
             pattern: str = "*.parquet", flush_partial: bool = True) -> ReplayResult:
        """Continuous binlog/WAL-tail mode: poll ``events_dir`` for batch files
        not yet in the committed lineage and apply them (sorted order) as
        incremental epochs, until ``max_idle_polls`` consecutive polls find
        nothing new. Resume is file-set based (via :meth:`replay`), so files
        that arrive with names sorting BEFORE already-applied ones are still
        picked up, and a killed tailer re-started on the same state dir
        continues exactly where it left off. A trailing partial group waits
        for its remaining files while polling; on exit it is applied as a
        final short epoch when ``flush_partial`` (else those files are left
        for the next session — they are NOT silently forgotten either way).
        The reference's cron-scheduled micro-batch harvest
        (/root/reference/userCode/wrd/dag.py:375-394) as a long-running job.
        """
        import glob as _glob
        import time as _time

        idle = 0
        while idle < max_idle_polls:
            _, pending = self._pending_files(
                sorted(_glob.glob(os.path.join(events_dir, pattern))),
                self.committed_epochs())
            ready = pending[:len(pending) // epoch_size * epoch_size]
            if not ready:
                idle += 1
                _time.sleep(poll_interval_s)
                continue
            idle = 0
            self.replay(ready, epoch_size=epoch_size)
        if flush_partial:
            files = sorted(_glob.glob(os.path.join(events_dir, pattern)))
            self.replay(files, epoch_size=epoch_size)
        result = ReplayResult(epochs=self.committed_epochs())
        result.n_applied = sum(r["applied"] for r in result.epochs)
        result.n_upserts = sum(r["upserts"] for r in result.epochs)
        result.n_deletes = sum(r["deletes"] for r in result.epochs)
        result.n_skipped = sum(r["skipped_stale"] for r in result.epochs)
        return result

    # ---- compaction -----------------------------------------------------
    def compact(self, purge_tombstones_below_lsn: int | None = None) -> int:
        """Fold every bucket's outstanding delta runs into its base file.

        Distributed (one task per bucket batch), idempotent (tmp+rename of
        deterministic content), and the point where manifest ``row_count``
        becomes exact for every bucket — between compactions it reflects the
        last compacted state, not in-flight runs. Returns buckets compacted.

        ``purge_tombstones_below_lsn``: LSM tombstone GC — drop delete markers
        with ``lsn <`` the given value. SAFETY: a tombstone blocks late stale
        upserts of its key from resurrecting; only purge below an LSN that the
        source guarantees will never be (re)delivered — e.g.
        ``min(last_applied_lsn over all buckets) - disorder_bound``. Use
        :meth:`safe_tombstone_gc_lsn` for the conservative default.
        """
        manifests = load_all_manifests(self.state_dir)
        gc = purge_tombstones_below_lsn
        todo = [b for b, m in manifests.items() if m.runs or gc is not None]
        if not todo:
            return 0
        state_dir = self.state_dir
        retain = self.retain_changelog
        strategy = self.merge_strategy

        def compact_batch(batch: pa.Table) -> pa.Table:
            done = []
            for b in batch.column("bucket").to_pylist():
                m = load_manifest(state_dir, int(b))
                if m is None or (not m.runs and gc is None):
                    continue
                merged = _read_committed(state_dir, m.base_file, m.runs,
                                         strategy)
                n_purged = 0
                if merged is not None and gc is not None:
                    is_tomb = pc.is_null(merged.column("content"))
                    if strategy == "patch":
                        # a content-null PATCH row may still carry live
                        # column state (lang set, content never set) that a
                        # later content patch resurrects into a live row —
                        # purging it would silently lose those columns.
                        # Only a PURE tombstone (every value column null) is
                        # GC-safe under patch.
                        from .patch import _ENGINE_META
                        for c in merged.column_names:
                            if c not in _ENGINE_META and c != "content":
                                is_tomb = pc.and_(is_tomb,
                                                  pc.is_null(merged.column(c)))
                    old = pc.and_(is_tomb, pc.less(merged.column("lsn"), gc))
                    n_purged = pc.sum(old).as_py() or 0
                    if n_purged:
                        merged = merged.filter(pc.invert(old))
                if not m.runs and n_purged == 0:
                    continue  # GC-only pass with nothing purgeable: no rewrite
                old_files = ([m.base_file] if m.base_file else []) + list(m.runs)
                if merged is None or merged.num_rows == 0:
                    m.base_file = None
                else:
                    merged = merged.sort_by(
                        [("repo", "ascending"), ("path", "ascending")])
                    base_file = f"data/bucket={m.bucket:05d}/base-{m.epoch:05d}.parquet"
                    atomic_write_table(os.path.join(state_dir, base_file), merged)
                    m.base_file = base_file
                m.row_count = 0 if merged is None else \
                    merged.num_rows - merged.column("content").null_count
                if m.runs and not retain:
                    m.discarded_deltas = True
                if m.runs and retain:
                    _archive_runs(state_dir, m.runs)   # BEFORE the commit
                m.runs = []
                write_manifest(state_dir, m)
                _unlink_superseded(state_dir, old_files,
                                   keep={m.base_file} if m.base_file else set())
                done.append(int(b))
            return pa.table({"bucket": pa.array(done, pa.int32())})

        ds = ray.data.from_items([{"bucket": b} for b in sorted(todo)])
        return ds.map_batches(compact_batch, batch_format="pyarrow",
                              batch_size=2).count()

    def safe_tombstone_gc_lsn(self, disorder_bound: int) -> int:
        """Conservative tombstone-GC watermark: no bucket has applied past
        this point minus the source's out-of-order bound, so no event below
        it can still arrive through the exactly-once replay path.

        ``disorder_bound`` is REQUIRED and must be the source's re-delivery
        bound: the engine deliberately applies rows with LSNs below a
        bucket's ``last_applied_lsn`` in later epochs (bounded out-of-order
        delivery is legitimate), so ``disorder_bound=0`` is only safe when
        the source never delivers below each bucket's max applied LSN.
        Pass the largest LSN gap the source can re-deliver across epochs."""
        if disorder_bound is None or disorder_bound < 0:
            raise ValueError("disorder_bound must be a non-negative int "
                             "(the source's max out-of-order re-delivery gap)")
        manifests = load_all_manifests(self.state_dir)
        if not manifests:
            return 0
        return max(0, min(m.last_applied_lsn for m in manifests.values())
                   - disorder_bound)

    def prune_changelog(self, before_epoch: int) -> dict:
        """Bound changelog retention: prune archived history below
        ``before_epoch``. Per bucket, every archived delta run (and any
        earlier floor checkpoint) with epoch < before_epoch is folded into
        ONE checkpoint part, ``changelog/bucket=B/floor-EEEEE.parquet``
        with label E = before_epoch - 1 — Kafka-log-compaction semantics:
        the latest state per key subsumes the pruned prefix, so reads at or
        above the floor stay EXACT:

          - ``dataset_as_of(epoch)`` stays exact for
            ``epoch >= before_epoch - 1`` and refuses loudly below (the
            ``discarded_deltas`` refuse-loudly discipline),
          - ``changelog_dataset`` requires ``lo >= before_epoch`` (the true
            per-epoch stream below the floor no longer exists),
          - ``view_deltas`` keeps folding correctly: the checkpoint surfaces
            as one lumped snapshot increment at epoch before_epoch - 1, so
            a consumer's cumulative fold is unchanged at every later epoch.

        Crash-safe and idempotent, per bucket in this order: (1) checkpoint
        written first (atomic rename; double-reading checkpoint + not-yet-
        deleted runs folds idempotently — LWW dedups identical winners, the
        patch fold tolerates equal-lsn duplicate parts), (2) manifest floor
        committed, (3) pruned files unlinked. A killed prune re-run
        finishes the job. Refuses if a bucket still holds a LIVE
        (uncompacted) run below the cut — ``compact()`` first, so pruning
        only ever touches the archived changelog, never merge-on-read
        state. Admin verb: do not run concurrently with replay/tail (same
        contract as compact/reshard). Distributed: one task per bucket
        batch; only pruned bytes are read, the table itself is untouched.
        """
        manifests = self._require_retained_deltas("changelog pruning")
        for m in manifests.values():
            for rel in m.runs:
                e = int(os.path.basename(rel)[len("run-"):-len(".parquet")])
                if e < before_epoch:
                    raise ValueError(
                        f"bucket {m.bucket} has a LIVE (uncompacted) delta "
                        f"run at epoch {e} < {before_epoch}; compact() "
                        "first so the run is archived before pruning")
        todo = [b for b, m in manifests.items()
                if m.changelog_floor < before_epoch]
        if not todo:
            return {"buckets": 0, "pruned_files": 0, "pruned_bytes": 0}
        state_dir = self.state_dir
        strategy = self.merge_strategy

        def prune_batch(batch: pa.Table) -> pa.Table:
            rows = []
            for b in batch.column("bucket").to_pylist():
                m = load_manifest(state_dir, int(b))
                if m is None or m.changelog_floor >= before_epoch:
                    continue
                cl = os.path.join(state_dir, "changelog",
                                  f"bucket={int(b):05d}")
                prunable: list[tuple[int, str]] = []
                if os.path.isdir(cl):
                    for f in os.listdir(cl):
                        if not f.endswith(".parquet"):
                            continue
                        if f.startswith("run-"):
                            e = int(f[len("run-"):-len(".parquet")])
                        elif f.startswith("floor-"):
                            e = int(f[len("floor-"):-len(".parquet")])
                        else:
                            continue
                        if e < before_epoch:
                            prunable.append((e, os.path.join(cl, f)))
                prunable.sort()
                n_bytes = 0
                if prunable:
                    parts = [pq.read_table(p) for _, p in prunable]
                    folded = (fold_patch_runs(parts) if strategy == "patch"
                              else merge_sorted_runs(parts))
                    if folded is not None and folded.num_rows:
                        atomic_write_table(
                            os.path.join(
                                cl, f"floor-{before_epoch - 1:05d}.parquet"),
                            folded.sort_by([("repo", "ascending"),
                                            ("path", "ascending")]))
                m.changelog_floor = before_epoch
                write_manifest(state_dir, m)
                for _, p in prunable:
                    try:
                        n_bytes += os.path.getsize(p)
                        os.unlink(p)
                    except FileNotFoundError:
                        pass
                rows.append({"bucket": int(b), "pruned_files": len(prunable),
                             "pruned_bytes": n_bytes})
            return pa.table({
                "bucket": pa.array([r["bucket"] for r in rows], pa.int32()),
                "pruned_files": pa.array(
                    [r["pruned_files"] for r in rows], pa.int64()),
                "pruned_bytes": pa.array(
                    [r["pruned_bytes"] for r in rows], pa.int64()),
            })

        ds = ray.data.from_items([{"bucket": b} for b in sorted(todo)])
        stats = ds.map_batches(prune_batch, batch_format="pyarrow",
                               batch_size=2).take_all()
        return {"buckets": len(stats),
                "pruned_files": sum(r["pruned_files"] for r in stats),
                "pruned_bytes": sum(r["pruned_bytes"] for r in stats)}

    def changelog_floor(self) -> int:
        """The highest per-bucket retention floor: epochs below it are
        pruned from the changelog (0 = full history retained)."""
        return max((m.changelog_floor for m in
                    load_all_manifests(self.state_dir).values()), default=0)

    def reshard(self, new_state_dir: str, new_num_buckets: int) -> "CdcEngine":
        """Re-partition committed LSM state to a new bucket count (cluster
        resize: 4x the nodes wants ~4x the buckets). Distributed: a task
        pool merge-reads each OLD bucket (tombstones retained — they must
        keep blocking late stale upserts after the move), re-hashes rows to
        the new bucket space, and one task per NEW bucket writes its base
        file + manifest. Epoch lineage (``epochs.json``) is copied verbatim,
        so file-set resume semantics carry over unchanged; new manifests
        commit at the max source epoch so resumed epoch numbers allocate
        past every applied one. Every new bucket's ``last_applied_lsn`` is
        the GLOBAL MIN of the old buckets' watermarks: a new bucket mixes
        keys from several old buckets, so any larger value (e.g. the max
        LSN present) would overstate the watermark for the low-watermark
        keys and make ``safe_tombstone_gc_lsn`` unsafe after the move —
        the global min keeps the GC floor exactly where it was. Idempotent:
        a re-run skips new buckets whose manifest already reached the
        target epoch.

        Engine config carries over: the snapshot-cut watermark
        (``bootstrap.json`` — without it a re-delivered pre-cut stale upsert
        could resurrect a key deleted before the snapshot), changelog
        retention and normalize sizing. The changelog itself does NOT: its
        archived runs live in the OLD bucket space, so new manifests are
        marked ``discarded_deltas`` and time-travel / view-delta reads on
        the resharded dir refuse (honestly) rather than silently omit
        pre-reshard history; the change stream restarts from the reshard
        point.
        """
        manifests = load_all_manifests(self.state_dir)
        target_epoch = max((m.epoch for m in manifests.values()), default=0)
        global_wm = min((m.last_applied_lsn for m in manifests.values()),
                        default=0)
        schema = self.load_schema(self.state_dir)
        new_eng = CdcEngine(new_state_dir, num_buckets=new_num_buckets,
                            evolution=self.evolution,
                            compact_every=self.compact_every,
                            normalize_concurrency=self.normalize_concurrency,
                            normalize_batch_size=self.normalize_batch_size,
                            retain_changelog=self.retain_changelog,
                            compact_min_bytes=self.compact_min_bytes,
                            merge_strategy=self.merge_strategy)
        if schema is not None:
            new_eng.save_schema(schema)
        if os.path.exists(self._bootstrap_path()):
            with open(self._bootstrap_path(), "rb") as f:
                atomic_write_bytes(new_eng._bootstrap_path(), f.read())
            new_eng._bootstrap_wm_cache = None
        atomic_write_bytes(new_eng._epochs_path(),
                           json.dumps(self.committed_epochs(),
                                      sort_keys=True).encode())
        if not manifests:
            return new_eng

        src_dir, dst_dir = self.state_dir, new_state_dir
        strategy = self.merge_strategy
        from .merge import bucket_of_keys, key_column
        # placement in the NEW dir follows the NEW engine's persisted recipe
        # (a fresh dst dir gets the current default) — so reshard doubles as
        # the recipe-migration path: old dirs keep replaying byte-identically
        # under the recipe they were built with, a reshard rewrites placement
        # under the default with a byte-identical final table (pinned in
        # pytest)
        new_recipe = new_eng.bucket_hash

        # Every block this stage emits must carry ONE schema: buckets whose
        # state was compacted at different schema epochs can have drifted
        # footers (a later epoch added a column), and the groupby shuffle
        # must not see inconsistent block schemas (the 'RefBundle with a
        # different schema' hazard). Unify ALL committed footers up front
        # (metadata-only reads) and cast every merged table — and the
        # empty-batch fallback — to the unified stored schema.
        footers = []
        for m in manifests.values():
            for rel in ([m.base_file] if m.base_file else []) + list(m.runs):
                footers.append(pq.read_schema(os.path.join(src_dir, rel)))
        if not footers:
            return new_eng   # every bucket is empty — nothing to move
        stored_schema = pa.unify_schemas(footers, promote_options="permissive")

        def rebucket(batch: pa.Table) -> pa.Table:
            out = []
            for b in batch.column("bucket").to_pylist():
                m = load_manifest(src_dir, int(b))
                if m is None:
                    continue
                merged = _read_committed(src_dir, m.base_file, m.runs,
                                         strategy)
                if merged is None:
                    continue
                # conform to the unified stored schema (missing -> nulls)
                arrays = [merged.column(f.name).cast(f.type)
                          if f.name in merged.column_names
                          else pa.nulls(merged.num_rows, f.type)
                          for f in stored_schema]
                merged = pa.Table.from_arrays(arrays, schema=stored_schema)
                nb = pa.array(bucket_of_keys(key_column(merged), new_num_buckets,
                                             new_recipe),
                              pa.int32())
                merged = merged.set_column(
                    merged.schema.get_field_index("bucket"), "bucket", nb)
                out.append(merged)
            if not out:
                return stored_schema.empty_table()
            return pa.concat_tables(out, promote_options="none")

        def write_new_bucket(group: pa.Table) -> pa.Table:
            bucket = int(group.column("bucket")[0].as_py())
            m = load_manifest(dst_dir, bucket)
            if m is not None and m.epoch >= target_epoch:
                return pa.table({"bucket": pa.array([bucket], pa.int32())})
            t = group.sort_by([("repo", "ascending"), ("path", "ascending")])
            rel = f"data/bucket={bucket:05d}/base-{target_epoch:05d}.parquet"
            atomic_write_table(os.path.join(dst_dir, rel), t)
            write_manifest(dst_dir, BucketManifest(
                bucket=bucket, epoch=target_epoch,
                last_applied_lsn=global_wm,
                row_count=t.num_rows - t.column("content").null_count,
                base_file=rel, runs=[],
                stats={"upserts": 0, "deletes": 0, "skipped_stale": 0,
                       "resharded_from": self.num_buckets},
                # the reshard base mixes every pre-reshard epoch; per-epoch
                # reconstruction through it is impossible in the new bucket
                # space, so as-of/view-delta reads must refuse, not omit
                discarded_deltas=True))
            return pa.table({"bucket": pa.array([bucket], pa.int32())})

        items = [{"bucket": b} for b in sorted(manifests)]
        (ray.data.from_items(items)
            .map_batches(rebucket, batch_format="pyarrow", batch_size=2)
            .groupby("bucket")
            .map_groups(write_new_bucket, batch_format="pyarrow")
            .count())
        return new_eng

    # ---- reads ---------------------------------------------------------
    def final_dataset(self, with_sha: bool = True) -> "ray.data.Dataset":
        """Distributed merge-on-read of the committed table (streams per bucket)."""
        manifests = load_all_manifests(self.state_dir)
        items = [{"bucket": b} for b in sorted(manifests)]
        ds = ray.data.from_items(items)
        # task-pool UDF (instance): per-bucket reads parallelize immediately,
        # no actor-pool ramp; the only state is the state-dir path + schema.
        return ds.map_batches(
            _ReadBucket(self.state_dir, with_sha),
            batch_format="pyarrow", batch_size=2,
        )

    def export_partitioned(self, out_dir: str,
                           with_sha: bool = True) -> dict:
        """Resumable partitioned export: one ``part-bucket=B.parquet`` per
        state bucket, written tmp+atomic-rename. A task whose output file
        ALREADY EXISTS skips it entirely (merge-on-read not even performed),
        so a killed export re-run finishes only the missing partitions —
        the write-side analog of replay's file-set resume. Output files are
        deterministic for a given committed state, so a retried task that
        raced a completed one re-creates identical bytes.

        Returns {"written": n, "skipped": n}. Never one giant file: each
        bucket is its own part, sized by the bucket layout (reshard first
        if parts need resizing). The skip is by file EXISTENCE — resuming
        is only valid against the same committed state; exporting after
        further replay must target a fresh out_dir (or delete stale parts),
        exactly like any snapshot directory."""
        os.makedirs(out_dir, exist_ok=True)
        state_dir = self.state_dir

        def export_batch(batch: pa.Table) -> pa.Table:
            reader = _ReadBucket(state_dir, with_sha)
            written, skipped = [], []
            for b in batch.column("bucket").to_pylist():
                dst = os.path.join(out_dir, f"part-bucket={int(b):05d}.parquet")
                if os.path.exists(dst):
                    skipped.append(int(b))
                    continue
                t = reader(pa.table({"bucket": pa.array([int(b)], pa.int32())}))
                atomic_write_table(dst, t)
                written.append(int(b))
            return pa.table({
                "bucket": pa.array(written + skipped, pa.int32()),
                "written": pa.array([True] * len(written) +
                                    [False] * len(skipped), pa.bool_())})

        manifests = load_all_manifests(self.state_dir)
        ds = ray.data.from_items([{"bucket": b} for b in sorted(manifests)])
        st = ds.map_batches(export_batch, batch_format="pyarrow",
                            batch_size=2).to_pandas()
        return {"written": int(st["written"].sum()) if len(st) else 0,
                "skipped": int((~st["written"]).sum()) if len(st) else 0}

    def changelog_dataset(self, lo: int = 0,
                          hi: int | None = None) -> "ray.data.Dataset":
        """Downstream change stream (Debezium-style CDC output): one row per
        applied LWW winner with ``epoch`` and ``op`` ('upsert'/'delete')
        columns, for epochs in [lo, hi]. Distributed: a task per bucket batch
        reads only that bucket's retained delta runs — no shuffle, no full
        state scan. Complete across compactions only when the engine runs
        with ``retain_changelog=True``; otherwise only not-yet-compacted
        epochs are visible (documented tradeoff, same as a short binlog
        retention window)."""
        manifests = load_all_manifests(self.state_dir)
        floor = max((m.changelog_floor for m in manifests.values()),
                    default=0)
        if lo < floor:
            raise ValueError(
                f"changelog epochs below {floor} were pruned "
                f"(prune_changelog); pass lo >= {floor}, or bootstrap the "
                f"consumer from dataset_as_of({floor - 1}) — the retained "
                "floor checkpoint — then stream from there")
        ds = ray.data.from_items([{"bucket": b} for b in sorted(manifests)])
        return ds.map_batches(_ReadChangelog(self.state_dir, lo, hi),
                              batch_format="pyarrow", batch_size=2)

    def _require_retained_deltas(self, what: str) -> dict:
        """Load all manifests, refusing (loudly) any bucket whose per-epoch
        deltas can no longer reconstruct history: the ``discarded_deltas``
        flag (set by any compact-without-archive, even when retention is
        enabled later in the dir's life), with the no-changelog-dir
        heuristic kept as a fallback for manifests written before the flag
        existed. Shared by view_deltas and dataset_as_of so the guard can
        never silently diverge between them."""
        manifests = load_all_manifests(self.state_dir)
        for m in manifests.values():
            if m.discarded_deltas or (
                    m.base_file and not os.path.isdir(os.path.join(
                        self.state_dir, "changelog", f"bucket={m.bucket:05d}"))):
                raise ValueError(
                    f"bucket {m.bucket} was compacted without changelog "
                    f"retention; {what} need retain_changelog=True from "
                    "the state dir's first epoch")
        return manifests

    def view_deltas(self, hi: int | None = None) -> "ray.data.Dataset":
        """Incremental view maintenance over the changelog: per-(repo, epoch)
        increments ``(d_files, d_bytes)`` of the canonical downstream
        aggregate (live-file count, total content bytes per repo). A
        consumer folds the deltas for new epochs into its stored view
        instead of rescanning the table — the standard CDC-consumer pattern
        for keeping a derived table in sync.

        Pinned law (tests/test_view_deltas.py): cumulative fold of deltas
        for epochs <= E equals the same aggregate recomputed from
        :meth:`dataset_as_of` (E). Requires ``retain_changelog=True`` from
        the state dir's first epoch (same retention rule as as-of reads —
        the guard below reuses it). A snapshot-bootstrapped dir's initial
        load is an ordinary epoch-0 delta run, so its fold starts from zero
        and epoch 0 carries the whole snapshot's aggregate as deltas.

        Scale shape: one task per bucket reads only that bucket's retained
        delta runs (keys are bucket-complete, so every per-key predecessor
        is local), computes value-diffs vectorized after one (key, epoch)
        sort, and pre-aggregates to one row per (repo, epoch) — the only
        shuffle is the final groupby over O(repos × epochs) rows."""
        self._require_lww("view_deltas")
        manifests = self._require_retained_deltas("view deltas")
        from ray.data.aggregate import Sum
        ds = ray.data.from_items([{"bucket": b} for b in sorted(manifests)])
        deltas = ds.map_batches(_ViewDeltas(self.state_dir, hi),
                                batch_format="pyarrow", batch_size=2)
        return deltas.groupby(["repo", "epoch"]).aggregate(
            Sum("d_files", alias_name="d_files"),
            Sum("d_bytes", alias_name="d_bytes"))

    def dataset_as_of(self, epoch: int,
                      with_sha: bool = True) -> "ray.data.Dataset":
        """Time-travel read: the committed table AS OF ``epoch`` (inclusive)
        — the LWW merge of every retained per-epoch delta up to the cut,
        reconstructed bucket-parallel with no shuffle. Exact only for state
        dirs built with ``retain_changelog=True`` from their first epoch;
        raises if a compaction has already discarded deltas — detected by
        the manifest's ``discarded_deltas`` flag (set by any
        compact-without-archive, even when changelog retention is enabled
        later in the state dir's life), with the no-changelog-dir heuristic
        kept as a fallback for manifests written before the flag existed.
        After ``prune_changelog(B)`` the read stays exact for
        ``epoch >= B - 1`` (the floor checkpoint IS the state at B - 1)
        and refuses below."""
        manifests = self._require_retained_deltas("as-of reads")
        floor = max((m.changelog_floor for m in manifests.values()),
                    default=0)
        if epoch < floor - 1:
            raise ValueError(
                f"as-of epoch {epoch} is below the changelog retention "
                f"floor (epochs < {floor} were pruned; the earliest exact "
                f"cut is {floor - 1}, the floor checkpoint)")
        ds = ray.data.from_items([{"bucket": b} for b in sorted(manifests)])
        return ds.map_batches(_ReadBucketAsOf(self.state_dir, epoch, with_sha),
                              batch_format="pyarrow", batch_size=2)

    def final_table(self, with_sha: bool = True) -> pa.Table:
        """Driver-side materialization (tests / small results only)."""
        reader = _ReadBucket(self.state_dir, with_sha)
        buckets = sorted(load_all_manifests(self.state_dir))
        t = reader(pa.table({"bucket": pa.array(buckets, pa.int32())}))
        return t.sort_by([("repo", "ascending"), ("path", "ascending")]) if t.num_rows else t

    def lineage(self) -> dict[int, BucketManifest]:
        return load_all_manifests(self.state_dir)

    def lookup(self, keys: list[tuple[str, str]],
               with_sha: bool = False) -> pa.Table:
        """Point lookup on the committed state — the serving path (S6,
        reference userCode/groundwater/wells.py point fetch, applied to the
        engine's own LSM): hash each (repo, path) to its bucket and read
        ONLY those buckets, one Ray task per bucket, each merge-on-read
        restricted by parquet row-group predicate pushdown (state files are
        sorted by (repo, path), so ``repo IN ... AND path IN ...`` prunes
        most row groups before decode). At 10^5 buckets a k-key lookup
        touches <=k buckets and a few row groups — never the table.
        Requested keys that are absent or deleted are simply missing from
        the result. Works under both merge strategies (parts are filtered
        BEFORE the merge fold, which is key-local, so pre-filtering cannot
        change a requested key's outcome)."""
        from .merge import bucket_of_keys
        uniq = sorted(set(keys))
        if not uniq:
            return _ReadBucket(self.state_dir, with_sha)._empty()
        enc = pa.array([f"{len(r)}\x1f{r}\x1f{p}" for r, p in uniq])
        buckets = bucket_of_keys(enc, self.num_buckets, self.bucket_hash)
        by_bucket: dict[int, list[tuple[str, str]]] = {}
        for (r, p), b in zip(uniq, buckets):
            by_bucket.setdefault(int(b), []).append((r, p))
        state_dir, strategy = self.state_dir, self.merge_strategy

        @ray.remote
        def fetch(bucket: int, pairs: list[tuple[str, str]]):
            import pyarrow.parquet as pq
            m = load_manifest(state_dir, bucket)
            if m is None:
                return None
            repos = sorted({r for r, _ in pairs})
            paths = sorted({p for _, p in pairs})
            filt = [("repo", "in", repos), ("path", "in", paths)]

            def read(rel):
                return pq.read_table(os.path.join(state_dir, rel),
                                     filters=filt)
            parts = ([read(m.base_file)] if m.base_file else []) + \
                    [read(r) for r in m.runs]
            merged = (fold_patch_runs(parts) if strategy == "patch"
                      else merge_sorted_runs(parts))
            if merged is None:
                return None
            # the in-set filters cross-product; exact pair filter now
            from .merge import key_column
            want = pa.array([f"{len(r)}\x1f{r}\x1f{p}" for r, p in pairs])
            merged = merged.filter(pc.is_in(key_column(merged),
                                            value_set=want))
            return drop_tombstones(merged)

        out = [t for t in ray.get([fetch.remote(b, ps)
                                   for b, ps in sorted(by_bucket.items())])
               if t is not None and t.num_rows]
        reader = _ReadBucket(self.state_dir, with_sha)
        if not out:
            return reader._empty()
        t = pa.concat_tables(out, promote_options="permissive")
        if with_sha:
            t = t.append_column("sha256", sha256_hex(t["content"]))
        drop = [c for c in reader._dropped() if c in t.column_names]
        return (t.drop_columns(drop)
                 .sort_by([("repo", "ascending"), ("path", "ascending")]))

    def quarantine_dataset(self) -> "ray.data.Dataset":
        """The dead-letter table: every event replay routed away under
        ``quarantine=True`` (conformed event columns + ``_qreason``), one
        parquet file per epoch that quarantined anything. Empty Dataset
        (schema: just ``_qreason``) when nothing was ever quarantined."""
        qdir = os.path.join(self.state_dir, "quarantine")
        files = (sorted(os.path.join(qdir, f) for f in os.listdir(qdir)
                        if f.startswith("run-") and f.endswith(".parquet"))
                 if os.path.isdir(qdir) else [])
        if not files:
            return ray.data.from_arrow(
                pa.table({"_qreason": pa.array([], pa.string())}))
        return ray.data.read_parquet(files)
