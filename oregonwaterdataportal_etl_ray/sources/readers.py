"""Pruned Parquet readers.

Every reader passes ``columns=[...]`` so only needed columns leave storage
(the reference's upstream predicate pushdown,
/root/reference/userCode/groundwater/wells.py:287-344, generalized to
column/row-group pruning). ``small_table`` is the driver-side load for
broadcast sides (the ontology/station-list pattern)."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq

import ray


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               **kwargs) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                                 columns=columns, **kwargs)


def small_table(sf_dir: str, name: str, columns: list[str] | None = None) -> pd.DataFrame:
    """Driver-side read of a small side for broadcast (never for big tables)."""
    return pq.read_table(os.path.join(sf_dir, f"{name}.parquet"),
                         columns=columns).to_pandas()
