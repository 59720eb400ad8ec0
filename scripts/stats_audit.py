#!/usr/bin/env python
"""Per-stage wall-time audit of the headline pipelines (``ds.stats()``).

Usage: python scripts/stats_audit.py [sf_dir] [query ...]

Prints Ray Data's operator-level execution stats for each named query (or a
default headline subset) so per-stage wall time is measured, not guessed:
a stage dominated by anything other than useful compute (actor ramp, tiny
blocks, schema churn) shows up directly here. Owns its Ray session
(standalone script, per the driver contract)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = ["cdc_current_state", "three_table_join", "minhash_near_dup",
           "q1_pricing_summary", "hourly_event_counts"]


def main() -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e
    qs = e.queries()
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"== {name}: unknown query", flush=True)
            continue
        t0 = time.time()
        res = fn(sf)
        stats = None
        if hasattr(res, "stats"):          # a (lazy) Dataset
            res = res.materialize()
            stats = res.stats()
        dt = time.time() - t0
        print(f"\n== {name} [{dt:.2f}s total] " + "=" * 40, flush=True)
        print(stats if stats else "(driver-side result — no Dataset stats)")
    ray.shutdown()


if __name__ == "__main__":
    main()
