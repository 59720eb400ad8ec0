"""Job-submission CLI — the engine's `ray job submit` entry point.

    ray job submit -- python -m oregonwaterdataportal_etl_ray.cli replay \
        --events-dir /data/changelog --state-dir /lake/state --epoch-size 64

Subcommands:
  replay   apply all batch files under --events-dir in order (resumes from
           the state dir's committed epoch lineage; safe to re-submit after
           a kill — committed epochs are skipped).
  tail     continuous WAL-tail mode: poll --events-dir for new batch files
           and apply them incrementally until idle --max-idle-polls polls.
  export   materialize the merged current-state table to partitioned Parquet.
  compact  fold outstanding LSM delta runs into each bucket's base file
           (makes manifest row counts exact).
  lineage  print per-bucket checkpoint lineage (last LSN, row counts, stats).
  reshard  re-partition committed state to a new bucket count (cluster
           resize); epoch lineage and file-set resume carry over.
  changelog  export the retained per-epoch change stream (op/epoch-tagged
           delta rows) to partitioned Parquet — the engine's downstream CDC
           feed. Complete across compactions only for state dirs written
           with --retain-changelog.

Owns the Ray session only when standalone (guarded init, per driver contract).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _init():
    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)


def _engine(args):
    from .cdc.engine import CdcEngine
    from .cdc.schema import EvolutionSpec
    renames = dict(kv.split("=", 1) for kv in (args.rename or []))
    # Retention is sticky: a dir ever written with --retain-changelog keeps
    # archiving on every later subcommand (compact/tail/...), flag or not —
    # otherwise one bare `compact` would unlink the deltas and permanently
    # break the changelog/as-of surface it advertises.
    retain = (getattr(args, "retain_changelog", False)
              or CdcEngine.retention_enabled(args.state_dir))
    # Bucket layout is likewise sticky: adopt the persisted count so a
    # subcommand that omits --num-buckets can never split keys across a
    # different bucket space (the engine refuses a true mismatch anyway;
    # this makes the flag optional rather than a footgun).
    nb = CdcEngine.persisted_num_buckets(args.state_dir) or args.num_buckets
    return CdcEngine(args.state_dir, num_buckets=nb,
                     evolution=EvolutionSpec(renames=renames) if renames else None,
                     compact_every=args.compact_every,
                     retain_changelog=retain,
                     compact_min_bytes=getattr(args, "compact_min_bytes", None),
                     quarantine=getattr(args, "quarantine", False),
                     merge_strategy=getattr(args, "merge_strategy", None))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="oregonwaterdataportal-etl-ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    rp = sub.add_parser("replay")
    rp.add_argument("--events-dir", required=True)
    rp.add_argument("--state-dir", required=True)
    rp.add_argument("--epoch-size", type=int, default=None,
                    help="batch files per epoch (default: all in one epoch)")
    rp.add_argument("--num-buckets", type=int, default=64)
    rp.add_argument("--compact-every", type=int, default=4)
    rp.add_argument("--rename", action="append", metavar="OLD=NEW",
                    help="schema-evolution alias, e.g. language=lang")
    rp.add_argument("--retain-changelog", action="store_true",
                    help="archive per-epoch delta runs under changelog/ at "
                         "compaction (enables the changelog subcommand and "
                         "time-travel reads) instead of unlinking them")
    rp.add_argument("--compact-min-bytes", type=int, default=None,
                    help="size-tiered compaction: also fold a bucket's runs "
                         "when their total bytes reach this threshold "
                         "(default: run-count trigger only)")
    rp.add_argument("--merge-strategy", choices=["lww", "patch"], default=None,
                    help="merge contract for a FRESH state dir: lww (whole-"
                         "row last-writer-wins, default) or patch (column-"
                         "level partial upserts via an 'op' column; see "
                         "cdc/patch.py). Existing dirs keep the strategy "
                         "they were built with")
    rp.add_argument("--quarantine", action="store_true",
                    help="route malformed events (null key/commit, "
                         "unparseable LSN) to the dead-letter table under "
                         "state-dir/quarantine/ instead of failing the run")

    bp = sub.add_parser("bootstrap", help="initial snapshot full-load: write "
                        "the current table state (parquet dir, one row per "
                        "key) directly as per-bucket epoch-0 delta runs, then apply "
                        "increments with replay (events at-or-below the cut "
                        "LSN are dropped as already-reflected)")
    bp.add_argument("--snapshot-dir", required=True)
    bp.add_argument("--state-dir", required=True)
    bp.add_argument("--as-of-lsn", type=int, default=None,
                    help="LSN the snapshot is consistent as of (default: the "
                         "snapshot's own max LSN)")
    bp.add_argument("--num-buckets", type=int, default=64)
    bp.add_argument("--compact-every", type=int, default=4)
    bp.add_argument("--rename", action="append", metavar="OLD=NEW")
    bp.add_argument("--retain-changelog", action="store_true",
                    help="archive per-epoch delta runs under changelog/ "
                         "(auto-detected from the state dir's marker; flag "
                         "needed only for dirs created before the marker)")

    xp = sub.add_parser("export")
    xp.add_argument("--state-dir", required=True)
    xp.add_argument("--out", required=True)
    xp.add_argument("--num-buckets", type=int, default=64)
    xp.add_argument("--compact-every", type=int, default=4)
    xp.add_argument("--rename", action="append", metavar="OLD=NEW")
    xp.add_argument("--no-sha", action="store_true")
    xp.add_argument("--resumable", action="store_true",
                    help="one part file per bucket, tmp+atomic-rename, "
                         "existing parts skipped — a killed export re-run "
                         "finishes only the missing partitions")

    tp = sub.add_parser("tail")
    tp.add_argument("--events-dir", required=True)
    tp.add_argument("--state-dir", required=True)
    tp.add_argument("--epoch-size", type=int, default=1)
    tp.add_argument("--poll-interval", type=float, default=5.0)
    tp.add_argument("--max-idle-polls", type=int, default=60)
    tp.add_argument("--num-buckets", type=int, default=64)
    tp.add_argument("--compact-every", type=int, default=4)
    tp.add_argument("--rename", action="append", metavar="OLD=NEW")
    tp.add_argument("--retain-changelog", action="store_true",
                    help="archive per-epoch delta runs under changelog/ "
                         "(auto-detected from the state dir's marker; flag "
                         "needed only for dirs created before the marker)")
    tp.add_argument("--compact-min-bytes", type=int, default=None,
                    help="size-tiered compaction: also fold a bucket's runs "
                         "when their total bytes reach this threshold — the "
                         "long-running tail mode is the primary consumer")
    tp.add_argument("--merge-strategy", choices=["lww", "patch"], default=None,
                    help="merge contract for a FRESH state dir (existing "
                         "dirs keep the strategy they were built with); "
                         "patch consumes partial-update streams with an "
                         "'op' column, e.g. stage-debezium --emit-op output")
    tp.add_argument("--quarantine", action="store_true",
                    help="route malformed events to the dead-letter table "
                         "under state-dir/quarantine/ instead of failing "
                         "the session")

    cp = sub.add_parser("compact")
    cp.add_argument("--state-dir", required=True)
    cp.add_argument("--num-buckets", type=int, default=64)
    cp.add_argument("--compact-every", type=int, default=4)
    cp.add_argument("--rename", action="append", metavar="OLD=NEW")
    cp.add_argument("--retain-changelog", action="store_true",
                    help="archive per-epoch delta runs under changelog/ "
                         "(auto-detected from the state dir's marker; flag "
                         "needed only for dirs created before the marker)")

    lp = sub.add_parser("lineage")
    lp.add_argument("--state-dir", required=True)
    lp.add_argument("--num-buckets", type=int, default=64)
    lp.add_argument("--compact-every", type=int, default=4)
    lp.add_argument("--rename", action="append", metavar="OLD=NEW")

    sp = sub.add_parser("reshard", help="re-partition state to a new bucket "
                        "count (cluster resize); lineage and resume carry over")
    sp.add_argument("--state-dir", required=True)
    sp.add_argument("--new-state-dir", required=True)
    sp.add_argument("--new-num-buckets", type=int, required=True)
    sp.add_argument("--num-buckets", type=int, default=64)
    sp.add_argument("--compact-every", type=int, default=4)
    sp.add_argument("--rename", action="append", metavar="OLD=NEW")

    kp = sub.add_parser("lookup", help="point lookup on committed state: "
                        "reads only the keys' buckets, row-group-pruned "
                        "(the serving path); prints one JSON row per live "
                        "key found")
    kp.add_argument("--state-dir", required=True)
    kp.add_argument("--key", action="append", nargs=2, required=True,
                    metavar=("REPO", "PATH"))
    kp.add_argument("--sha", action="store_true",
                    help="include the content sha256 per row")
    kp.add_argument("--num-buckets", type=int, default=64)
    kp.add_argument("--compact-every", type=int, default=4)
    kp.add_argument("--rename", action="append", metavar="OLD=NEW")

    dp = sub.add_parser("stage-debezium", help="convert Debezium envelope "
                        "JSONL files (before/after/op/source.lsn) to "
                        "canonical parquet change batches replay can consume "
                        "(file order and names preserved, so file-set resume "
                        "carries over)")
    dp.add_argument("--jsonl-dir", required=True)
    dp.add_argument("--out-dir", required=True)
    dp.add_argument("--key-cols", default="repo,path",
                    help="comma-separated primary-key columns")
    dp.add_argument("--value-cols", default="lang,content",
                    help="comma-separated value columns")
    dp.add_argument("--emit-op", action="store_true",
                    help="keep an explicit u/d op column (feed for "
                         "--merge-strategy patch); default encodes deletes "
                         "as null content (the lww tombstone)")

    pp = sub.add_parser("prune-changelog", help="bound changelog retention: "
                        "fold archived epochs below --before-epoch into a "
                        "per-bucket floor checkpoint and delete them; as-of "
                        "and changelog reads below the floor then refuse "
                        "loudly (run compact first if live runs predate the "
                        "cut)")
    pp.add_argument("--state-dir", required=True)
    pp.add_argument("--before-epoch", type=int, required=True,
                    help="prune archived epochs < this value")
    pp.add_argument("--num-buckets", type=int, default=64)
    pp.add_argument("--compact-every", type=int, default=4)
    pp.add_argument("--rename", action="append", metavar="OLD=NEW")

    gp = sub.add_parser("changelog", help="export the retained change stream "
                        "(op/epoch-tagged delta rows) to partitioned Parquet")
    gp.add_argument("--state-dir", required=True)
    gp.add_argument("--out", required=True)
    gp.add_argument("--lo", type=int, default=0, help="first epoch (incl.)")
    gp.add_argument("--hi", type=int, default=None, help="last epoch (incl.)")
    gp.add_argument("--as-of", type=int, default=None, metavar="EPOCH",
                    help="export the STATE as of this epoch instead of the "
                         "stream (time travel; needs retained changelog)")
    gp.add_argument("--view-deltas", action="store_true",
                    help="export per-(repo, epoch) aggregate increments "
                         "(d_files, d_bytes) for incremental view "
                         "maintenance instead of the row stream")
    gp.add_argument("--num-buckets", type=int, default=64)
    gp.add_argument("--compact-every", type=int, default=4)
    gp.add_argument("--rename", action="append", metavar="OLD=NEW")

    args = ap.parse_args(argv)
    _init()
    if args.cmd == "stage-debezium":
        from .sources.debezium import stage_debezium_jsonl
        jsonl = sorted(glob.glob(os.path.join(args.jsonl_dir, "*.jsonl")))
        if not jsonl:
            print(f"no .jsonl files under {args.jsonl_dir}", file=sys.stderr)
            return 2
        staged = stage_debezium_jsonl(
            jsonl, args.out_dir, args.key_cols.split(","),
            args.value_cols.split(","), emit_op=args.emit_op)
        print(json.dumps({"staged": len(staged), "out_dir": args.out_dir}))
        return 0
    eng = _engine(args)

    if args.cmd == "lookup":
        t = eng.lookup([tuple(k) for k in args.key], with_sha=args.sha)
        for row in t.to_pylist():
            print(json.dumps(row, default=str))
        return 0

    if args.cmd == "replay":
        files = sorted(glob.glob(os.path.join(args.events_dir, "*.parquet")))
        if not files:
            print(f"no .parquet batch files under {args.events_dir}", file=sys.stderr)
            return 2
        res = eng.replay(files, epoch_size=args.epoch_size)
        out = {
            "epochs": len(res.epochs), "applied": res.n_applied,
            "upserts": res.n_upserts, "deletes": res.n_deletes,
            "skipped_stale": res.n_skipped,
        }
        if args.quarantine:
            out["quarantined"] = res.n_quarantined
        print(json.dumps(out))
    elif args.cmd == "bootstrap":
        import ray
        snap = ray.data.read_parquet(sorted(
            glob.glob(os.path.join(args.snapshot_dir, "*.parquet"))))
        n = eng.bootstrap(snap, as_of_lsn=args.as_of_lsn)
        print(json.dumps({"live_rows": n,
                          "as_of_lsn": eng.bootstrap_lsn()}))
    elif args.cmd == "tail":
        res = eng.tail(args.events_dir, epoch_size=args.epoch_size,
                       poll_interval_s=args.poll_interval,
                       max_idle_polls=args.max_idle_polls)
        print(json.dumps({"epochs": len(res.epochs), "applied": res.n_applied,
                          "upserts": res.n_upserts, "deletes": res.n_deletes}))
    elif args.cmd == "compact":
        print(json.dumps({"buckets_compacted": eng.compact()}))
    elif args.cmd == "prune-changelog":
        st = eng.prune_changelog(args.before_epoch)
        print(json.dumps({**st, "floor": eng.changelog_floor()}))
    elif args.cmd == "reshard":
        new_eng = eng.reshard(args.new_state_dir, args.new_num_buckets)
        print(json.dumps({"new_state_dir": args.new_state_dir,
                          "new_num_buckets": args.new_num_buckets,
                          "buckets_written": len(new_eng.lineage())}))
    elif args.cmd == "changelog":
        if args.as_of is not None:
            ds, mode = eng.dataset_as_of(args.as_of), "as_of"
        elif getattr(args, "view_deltas", False):
            ds, mode = eng.view_deltas(hi=args.hi), "view_deltas"
        else:
            ds, mode = eng.changelog_dataset(lo=args.lo, hi=args.hi), "stream"
        ds.write_parquet(args.out)
        import ray
        n = ray.data.read_parquet(args.out).count()
        print(json.dumps({"out": args.out, "rows": n, "mode": mode}))
    elif args.cmd == "export":
        import ray
        if args.resumable:
            st = eng.export_partitioned(args.out, with_sha=not args.no_sha)
            n = ray.data.read_parquet(args.out).count()
            print(json.dumps({"out": args.out, "rows": n, **st}))
        else:
            ds = eng.final_dataset(with_sha=not args.no_sha)
            ds.write_parquet(args.out)
            # metadata-only count of the written files — never re-runs the merge
            n = ray.data.read_parquet(args.out).count()
            print(json.dumps({"out": args.out, "rows": n}))
    else:
        lineage = {b: {"epoch": m.epoch, "last_applied_lsn": m.last_applied_lsn,
                       "row_count": m.row_count, "runs": len(m.runs),
                       "stats": m.stats}
                   for b, m in sorted(eng.lineage().items())}
        print(json.dumps(lineage, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
