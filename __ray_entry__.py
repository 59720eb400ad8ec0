"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``. ``queries()``
names map 1:1 to ``oracle_sql()`` names; SQL-inexpressible operators omit the
oracle entry (rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: CDC-style LWW current-state
    view of the event stream -> grouped aggregate (read -> map_batches ->
    bucketed LWW merge -> groupby)."""
    from oregonwaterdataportal_etl_ray.pipelines import flagship

    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """Oracle-backed queries first (the driver checks a bounded prefix of
    this dict; rows-only approximate families go last so every query with an
    oracle gets the full rows+schema+hash gate). Within the oracle-backed
    block, queries with no passing row in the latest CORRECTNESS_r*.json run
    first — round-robin verification so a bounded driver window still covers
    every oracle across rounds."""
    from oregonwaterdataportal_etl_ray.pipelines import ORACLE_SQL, QUERIES

    verified = _previously_verified()
    oracle_backed = [k for k in QUERIES if k in ORACLE_SQL]
    oracle_backed.sort(key=lambda k: k in verified)  # stable: unverified first
    ordered = {k: QUERIES[k] for k in oracle_backed}
    ordered.update({k: v for k, v in QUERIES.items() if k not in ORACLE_SQL})
    return ordered


def _previously_verified() -> set[str]:
    """Names with a fully-passing row in the newest CORRECTNESS_r*.json."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    # numeric round order: a lexicographic sort would pick r99 over r100
    files = sorted(
        glob.glob(os.path.join(here, "CORRECTNESS_r*.json")),
        key=lambda p: int("".join(c for c in os.path.basename(p)
                                  if c.isdigit()) or 0))
    if not files:
        return set()
    try:
        with open(files[-1]) as f:
            rows = json.load(f)
        return {name for name, r in rows.items()
                if r.get("rows_match") and r.get("schema_match")
                and r.get("hash_match")}
    except (OSError, ValueError, AttributeError):
        return set()


def oracle_sql() -> dict[str, str]:
    from oregonwaterdataportal_etl_ray.pipelines import ORACLE_SQL

    return dict(ORACLE_SQL)
