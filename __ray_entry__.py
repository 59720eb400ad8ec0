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
    oracle gets the full rows+schema+hash gate)."""
    from oregonwaterdataportal_etl_ray.pipelines import ORACLE_SQL, QUERIES

    ordered = {k: v for k, v in QUERIES.items() if k in ORACLE_SQL}
    ordered.update({k: v for k, v in QUERIES.items() if k not in ORACLE_SQL})
    return ordered


def oracle_sql() -> dict[str, str]:
    from oregonwaterdataportal_etl_ray.pipelines import ORACLE_SQL

    return dict(ORACLE_SQL)
