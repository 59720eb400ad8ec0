"""A/B the persisted bucket-hash recipes on the SAME event corpus.

The recipe is placement-defining persisted state (layout.json), so the
engine never switches mid-dir; this harness pre-stamps a fresh state dir
with each recipe and replays the same files through each, reporting wall
and the per-phase attribution bench.py records. Run standalone:

    PYTHONPATH=/root/repo python scripts/bench_hash_recipe.py [n_events]
"""
import json
import os
import shutil
import sys
import time

import ray


def run(recipe: int, files: list[str], num_buckets: int = 64) -> dict:
    from oregonwaterdataportal_etl_ray.cdc.engine import CdcEngine
    from oregonwaterdataportal_etl_ray.state.manifest import atomic_write_bytes

    root = "/dev/shm/graft_bench" if os.path.isdir("/dev/shm") else "/tmp/graft_bench"
    state = f"{root}/hashab-{recipe}-{os.getpid()}"
    # sweep stale hashab dirs from killed prior runs (tmpfs leftovers are
    # resident RAM — same hygiene as bench.run_cdc)
    if os.path.isdir(root):
        for name in os.listdir(root):
            if name.startswith("hashab-"):
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)
    shutil.rmtree(state, ignore_errors=True)
    os.makedirs(state)
    atomic_write_bytes(os.path.join(state, "layout.json"),
                       json.dumps({"num_buckets": num_buckets,
                                   "key_encoding": 2,
                                   "bucket_hash": recipe}).encode())
    os.sync()
    t0 = time.time()
    try:
        eng = CdcEngine(state, num_buckets=num_buckets, compact_every=4)
        assert eng.bucket_hash == recipe
        res = eng.replay(files, epoch_size=max(1, len(files) // 4))
        dt = time.time() - t0
        n = eng.final_dataset(with_sha=False).count()
    finally:
        shutil.rmtree(state, ignore_errors=True)
    return {"recipe": recipe, "sec": round(dt, 3), "final_rows": n,
            "merge_sec": round(sum(r.get("merge_sec", 0) for r in res.epochs), 3),
            "norm_wait_sec": round(
                sum(r.get("norm_wait_sec", 0) for r in res.epochs), 3)}


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import bench
    files = bench.ensure_events(n_events)
    bench._warmup_cluster()
    out = []
    # interleave so host drift hits both recipes evenly
    for recipe in (1, 2, 1, 2):
        out.append(run(recipe, files))
        print(json.dumps(out[-1]), flush=True)
    best = {r: min(o["sec"] for o in out if o["recipe"] == r) for r in (1, 2)}
    rows = {o["final_rows"] for o in out}
    print(json.dumps({"best_sec_siphash": best[1], "best_sec_poly": best[2],
                      "speedup": round(best[1] / best[2], 3),
                      "rows_identical": len(rows) == 1, "events": n_events}))
    ray.shutdown()


if __name__ == "__main__":
    main()
