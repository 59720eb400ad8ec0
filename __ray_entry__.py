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
    block, queries are ordered by the round of their LAST fully-green
    CORRECTNESS_r*.json row, never-green first — round-robin verification
    so a bounded driver window re-verifies the stalest oracles each round
    and still covers every oracle across rounds."""
    from oregonwaterdataportal_etl_ray.pipelines import ORACLE_SQL, QUERIES

    last_green = _last_green_round()
    oracle_backed = [k for k in QUERIES if k in ORACLE_SQL]
    oracle_backed.sort(key=lambda k: last_green.get(k, -1))  # stable
    ordered = {k: QUERIES[k] for k in oracle_backed}
    ordered.update({k: v for k, v in QUERIES.items() if k not in ORACLE_SQL})
    return ordered


def _last_green_round() -> dict[str, int]:
    """name -> highest round number whose CORRECTNESS_r*.json has a
    fully-passing row for it (absent = never green)."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    out: dict[str, int] = {}
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        # numeric round id (a lexicographic compare would rank r9 over r10)
        rnd = int("".join(c for c in os.path.basename(p) if c.isdigit()) or 0)
        try:
            with open(p) as f:
                rows = json.load(f)
            for name, r in rows.items():
                if (r.get("rows_match") and r.get("schema_match")
                        and r.get("hash_match")):
                    out[name] = max(out.get(name, -1), rnd)
        except (OSError, ValueError, AttributeError):
            continue
    return out


def oracle_sql() -> dict[str, str]:
    from oregonwaterdataportal_etl_ray.pipelines import ORACLE_SQL

    return dict(ORACLE_SQL)
