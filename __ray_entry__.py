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
    from oregonwaterdataportal_etl_ray.pipelines import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from oregonwaterdataportal_etl_ray.pipelines import ORACLE_SQL

    return dict(ORACLE_SQL)
