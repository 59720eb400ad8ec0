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


def load_key_set(path: str, col: str, filter_col: str | None = None,
                 filter_val=None):
    """Distinct sorted key array for semi/anti membership filters, with
    column (and optional equality-predicate) pushdown. Meant to run as
    ``ray.remote(load_key_set).remote(...)`` so the build happens in a Ray
    task and the driver holds only the ObjectRef — the fact-table side of
    an anti-join must never materialize on the driver. At key cardinalities
    past a broadcast array, swap the ref for a BloomFilter built the same
    way (stages/joins.py:BloomMembershipFilter).
    """
    import numpy as np
    import pyarrow.dataset as pads

    f = (pads.field(filter_col) == filter_val) if filter_col else None
    t = pads.dataset(path).to_table(columns=[col], filter=f)
    return np.sort(np.unique(t[col].to_numpy(zero_copy_only=False)))
