"""Generic vectorized per-batch kernels: arg-max/arg-min per key.

The reference's LWW comparator merge (``merge_paginated_well_response``,
/root/reference/userCode/groundwater/wells.py:347-378) and its
"first property wins" dedup (/root/reference/userCode/awqms/types.py:47-59)
are both instances of keep-one-row-per-key with an explicit order. These
kernels implement that vectorized over an Arrow table: dictionary-encode the
key, numpy lexsort on (order columns, key codes), take the boundary rows.

Used as the map-side combiner AND the post-shuffle reducer, so
``combine(blocks) == reduce(concat(blocks))`` (verified by hypothesis in
tests/test_merge_properties.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


# Sentinel no real cast-to-string value produces: fills NULL key components
# BEFORE dictionary-encoding so nulls form one well-defined group (SQL GROUP
# BY / PARTITION BY semantics) instead of NaN-poisoning the indices. Shared
# by every group-key encoder (here, dup_cluster_assign, source_token_budget).
_NULL_KEY = "\x00\x1e\x00"


def _key_codes(t: pa.Table, key_cols: list[str]) -> np.ndarray:
    """Dense int64 group code per row. NULL-key handling is explicit: each
    null component is filled with a sentinel BEFORE encoding, so (a) all-null
    keys form one well-defined group (SQL GROUP BY treats nulls as equal)
    instead of NaN indices silently casting to an undefined int, and (b) in
    composite keys (x, NULL) and (y, NULL) stay DISTINCT groups (the join
    kernel would otherwise null the whole composite when any part is null).
    Composite encoding is INJECTIVE: each component is length-prefixed (the
    same recipe as cdc.merge.key_column's v2 key), so keys whose values
    contain the separator byte — ('a\\x1fb', 'c') vs ('a', 'b\\x1fc') —
    stay distinct groups instead of silently merging."""
    _NULL = _NULL_KEY
    if len(key_cols) == 1:
        key = t.column(key_cols[0])
        if not pa.types.is_string(key.type):
            key = pc.cast(key, pa.string())
        key = pc.fill_null(key, _NULL)
    else:
        parts = []
        for c in key_cols:
            col = t.column(c)
            if not pa.types.is_string(col.type):
                col = pc.cast(col, pa.string())
            col = pc.fill_null(col, _NULL)
            parts.append(pc.binary_join_element_wise(
                pc.cast(pc.utf8_length(col), pa.string()), col, "\x1f"))
        key = pc.binary_join_element_wise(*parts, "\x1f")
    enc = pc.dictionary_encode(key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    return enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)


def _order_arrays(t: pa.Table, order_cols: list[str],
                  nulls_lose_for: str = "last") -> list[np.ndarray]:
    """Order columns as numpy arrays with EXPLICIT null semantics: a null
    order value LOSES to any real value in both kernels (an LWW row with a
    missing timestamp must never beat a real observation — the raw
    to_numpy path converted nullable ints to float64, where NaN lexsorts
    LAST i.e. GREATEST, silently inverting that; float64 also corrupts
    int64 order values past 2^53). ``nulls_lose_for``: "last" fills nulls
    with the type's minimum (keep_last takes the max), "first" with its
    maximum."""
    lose_min = nulls_lose_for == "last"
    out = []
    for c in order_cols:
        col = t.column(c)
        if pa.types.is_timestamp(col.type):
            col = pc.cast(col, pa.int64())
        if col.null_count:
            if pa.types.is_integer(col.type):
                info = np.iinfo(col.type.to_pandas_dtype())
                col = pc.fill_null(col, info.min if lose_min else info.max)
            elif pa.types.is_floating(col.type):
                col = pc.fill_null(col, -np.inf if lose_min else np.inf)
            else:
                # strings: "" sorts first; \U0010FFFF-run sorts after any
                # realistic value
                col = pc.fill_null(
                    col, "" if lose_min else "\U0010FFFF" * 8)
        out.append(col.to_numpy(zero_copy_only=False))
    return out


def keep_last_by(t: pa.Table, key_cols: list[str], order_cols: list[str]) -> pa.Table:
    """One row per key: the row with the lexicographically GREATEST order tuple."""
    if t.num_rows <= 1:
        return t
    codes = _key_codes(t, key_cols)
    orders = _order_arrays(t, order_cols, nulls_lose_for="last")
    # np.lexsort sorts by last key first -> pass (minor..major, codes last)
    sort_keys = tuple(reversed(orders)) + (codes,)
    order = np.lexsort(sort_keys)
    sorted_codes = codes[order]
    is_last = np.ones(len(order), dtype=bool)
    is_last[:-1] = sorted_codes[1:] != sorted_codes[:-1]
    return t.take(pa.array(order[is_last]))


def keep_first_by(t: pa.Table, key_cols: list[str], order_cols: list[str]) -> pa.Table:
    """One row per key: the row with the SMALLEST order tuple (first-wins dedup,
    reference userCode/awqms/types.py:47-59)."""
    if t.num_rows <= 1:
        return t
    codes = _key_codes(t, key_cols)
    orders = _order_arrays(t, order_cols, nulls_lose_for="first")
    sort_keys = tuple(reversed(orders)) + (codes,)
    order = np.lexsort(sort_keys)
    sorted_codes = codes[order]
    is_first = np.ones(len(order), dtype=bool)
    is_first[1:] = sorted_codes[1:] != sorted_codes[:-1]
    return t.take(pa.array(order[is_first]))
