"""Keyed window operators: lag (previous row per key) and gap sessionization.

The reference has no window functions, but its per-datastream watermark logic
is exactly "previous row per key" (/root/reference/userCode/wrd/dag.py:189-197
computes the next fetch window from the previous observation's time); these
generalize that to first-class operators.

Scale design: rows are bucketed by hash(key) so the groupby shuffle produces
ONE group per bucket (not one per key) — the per-group kernel is a single
vectorized lexsort over the bucket, never a Python loop per key. Partitioning
assumption: all rows of a key land in one bucket (guaranteed by the hash).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .partitioning import derived_num_buckets


def user_bucketer(key: str = "user_id", num_buckets: int | None = None):
    """Plan-time factory for the bucket-assignment map fn. The bucket count
    is resolved HERE (on the driver, once per job): resolving it inside the
    per-batch fn would re-read ``ray.cluster_resources()`` per task, and an
    autoscaling cluster could then hash the same key to different bucket
    counts in different batches, splitting one user across groups. Derives
    from cluster width (>= 2 buckets per CPU) unless pinned — a fixed
    constant would cap parallelism AND make one map_groups task materialize
    1/constant of the dataset at 100 TB."""
    num_buckets = num_buckets or derived_num_buckets()

    def add_user_bucket(t: pa.Table) -> pa.Table:
        ids = t.column(key).to_numpy(zero_copy_only=False)
        return t.append_column(
            "__bucket",
            pa.array((pd.util.hash_array(ids) % num_buckets).astype(np.int32)))
    return add_user_bucket


def _sorted_keys(t: pa.Table, key: str, ts: str, tiebreak: str):
    """Lexsort one bucket's rows by (key, ts, tiebreak). NULL timestamps
    order LAST (DuckDB's ORDER BY default for ASC) — NaT would otherwise
    cast to int64 min and make a user's null-ts rows their EARLIEST.
    NULL keys form ONE partition (SQL PARTITION BY semantics): the SORT
    runs on a sentinel-filled copy (np.lexsort raises TypeError on str/None
    compares), while the RETURNED key array keeps the original values —
    segment-boundary != comparisons handle None fine (None != None is
    False), and downstream output must carry NULL, not the sentinel."""
    kc = t.column(key)
    k = kc.to_numpy(zero_copy_only=False)
    if kc.null_count:
        from .kernels import _NULL_KEY
        import pyarrow.compute as pc
        k_sort = pc.fill_null(
            kc if pa.types.is_string(kc.type) else pc.cast(kc, pa.string()),
            _NULL_KEY).to_numpy(zero_copy_only=False)
    else:
        k_sort = k
    s = t.column(ts).to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    s = np.where(s == np.iinfo(np.int64).min, np.iinfo(np.int64).max, s)
    tb = t.column(tiebreak).to_numpy(zero_copy_only=False)
    order = np.lexsort((tb, s, k_sort))
    return order, k[order], s[order]


def lag_group(t: pa.Table) -> pa.Table:
    """map_groups kernel for one bucket: previous ``value`` per user in
    (ts, event_id) order, null at each user's first event (SQL LAG)."""
    order, ks, _ = _sorted_keys(t, "user_id", "ts", "event_id")
    v = t.column("value").to_numpy(zero_copy_only=False)[order]
    ev = t.column("event_id").to_numpy(zero_copy_only=False)[order]
    prev = np.roll(v, 1)
    first = np.ones(len(order), dtype=bool)
    first[1:] = ks[1:] != ks[:-1]
    prev_masked = pa.Array.from_pandas(pd.Series(prev).mask(first))
    return pa.table({
        "user_id": pa.array(ks), "event_id": pa.array(ev),
        "value": pa.array(v), "prev_value": prev_masked.cast(pa.float64()),
    })


def asof_prev_group(t: pa.Table, left_type: str = "click",
                    right_type: str = "view") -> pa.Table:
    """As-of join WITHIN one bucket: for each ``left_type`` event, the value
    of the user's most recent strictly-earlier ``right_type`` event.

    Both streams share the bucket (hash of user_id), so the as-of lookup is a
    vectorized segment-aware forward-fill over one lexsort — no per-key loop,
    no cross-bucket state. Partitioning assumption: all rows of a user are in
    this bucket.
    """
    order, ks, _ = _sorted_keys(t, "user_id", "ts", "event_id")
    et = t.column("event_type").to_numpy(zero_copy_only=False)[order]
    v = t.column("value").to_numpy(zero_copy_only=False)[order]
    ev = t.column("event_id").to_numpy(zero_copy_only=False)[order]
    # float64 coercion: an int value column with no nulls arrives as int64,
    # and np.isnan raises on integer arrays (nullable ints already surface
    # as float64 + NaN)
    v = v.astype(np.float64, copy=False)
    n = len(order)
    first = np.ones(n, dtype=bool)
    first[1:] = ks[1:] != ks[:-1]
    seg_start = np.maximum.accumulate(np.where(first, np.arange(n), 0))
    # running index of the latest NON-NULL right_type value seen so far
    # (IGNORE NULLS semantics: a null view value is transparent, the lookup
    # skips back to the previous non-null one), shifted one row back =>
    # "strictly earlier"; invalid if before segment
    idx = np.where((et == right_type) & ~np.isnan(v), np.arange(n), -1)
    cummax = np.maximum.accumulate(idx)
    prev = np.concatenate(([np.int64(-1)], cummax[:-1]))
    ok = prev >= seg_start
    out_val = np.where(ok, v[np.clip(prev, 0, n - 1)], np.nan)
    keep = et == left_type
    vals = pd.Series(out_val[keep]).mask(~ok[keep])
    return pa.table({
        "user_id": pa.array(ks[keep]),
        "event_id": pa.array(ev[keep]),
        "value": pa.array(v[keep]),
        "last_view_value": pa.Array.from_pandas(vals).cast(pa.float64()),
    })


def rolling_avg_group(t: pa.Table, window: int = 4) -> pa.Table:
    """Moving average of ``value`` over the trailing ``window`` rows per user
    (fewer at each user's start): cumsum difference with per-user clamping —
    one vectorized pass per bucket, no per-key loop. Nulls are excluded from
    both sum and count (SQL AVG semantics); an all-null window yields null."""
    order, ks, _ = _sorted_keys(t, "user_id", "ts", "event_id")
    v = t.column("value").to_numpy(zero_copy_only=False)[order]
    ev = t.column("event_id").to_numpy(zero_copy_only=False)[order]
    v = v.astype(np.float64, copy=False)   # same int-array isnan hazard
    n = len(order)
    first = np.ones(n, dtype=bool)
    first[1:] = ks[1:] != ks[:-1]
    seg_start = np.maximum.accumulate(np.where(first, np.arange(n), 0))
    notnull = ~np.isnan(v)
    csum = np.concatenate(([0.0], np.cumsum(np.where(notnull, v, 0.0))))
    ccnt = np.concatenate(([0], np.cumsum(notnull.astype(np.int64))))
    pos = np.arange(n)
    lo = np.maximum(pos - window + 1, seg_start)
    wcnt = ccnt[pos + 1] - ccnt[lo]
    with np.errstate(invalid="ignore"):
        avg = np.where(wcnt > 0, (csum[pos + 1] - csum[lo]) / np.maximum(wcnt, 1),
                       np.nan)
    # DuckDB-compatible half-away rounding (np.round is half-to-even)
    with np.errstate(invalid="ignore"):
        avg = np.sign(avg) * (np.floor(np.abs(avg) * 1e6 + 0.5) / 1e6)
    avg_arr = pa.Array.from_pandas(pd.Series(avg).mask(wcnt == 0))
    return pa.table({
        "user_id": pa.array(ks), "event_id": pa.array(ev),
        "avg4": avg_arr.cast(pa.float64()),
    })


def sessionize_group(t: pa.Table, gap_seconds: float = 1800.0) -> pa.Table:
    """Per-user session stats for one bucket: a new session starts when the
    gap since the user's previous event exceeds ``gap_seconds``."""
    order, ks, ss = _sorted_keys(t, "user_id", "ts", "event_id")
    gap = np.diff(ss, prepend=ss[:1]) / 1e6
    first = np.ones(len(order), dtype=bool)
    first[1:] = ks[1:] != ks[:-1]
    new_session = first | (gap > gap_seconds)
    new_session[first] = True
    # per-user reduction within the (key-sorted) bucket
    uniq, start_idx = np.unique(ks, return_index=True)
    n_sessions = np.add.reduceat(new_session.astype(np.int64), start_idx)
    n_events = np.diff(np.r_[start_idx, len(ks)])
    return pa.table({
        "user_id": pa.array(uniq),
        "n_sessions": pa.array(n_sessions, pa.int64()),
        "n_events": pa.array(n_events, pa.int64()),
    })


def global_row_number(ds, keys: list[str], out_col: str = "row_number",
                      return_total: bool = False):
    """GLOBAL (un-keyed) row numbering over a totally-ordered dataset — the
    primitive under whole-table window functions (ROW_NUMBER / NTILE /
    PERCENT_RANK over the full corpus, no PARTITION BY).

    At-scale shape: ONE sort exchange, then two block-aligned passes over the
    materialized result — pass 1 reduces every block to (first key, count)
    (one tiny row per block on the driver), the driver prefix-sums the counts
    in key order, and pass 2 adds each block's offset to an arange inside
    map_batches. No full-table collect; driver state is O(#blocks).

    Partitioning assumption (documented per the operator contract): ``keys``
    is a total order — every row's composite key is unique — so each sorted
    block's first key identifies the block unambiguously. Callers must
    include a unique tiebreak column (e.g. the row id) as the last key.

    ``return_total=True`` returns ``(dataset, n_total)`` — the row count is
    the offsets' final cumsum, already on the driver, so callers needing it
    (NTILE, PERCENT_RANK) skip a whole extra count() pass over the input.
    """
    sorted_ds = ds.sort(keys).materialize()

    def block_head(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({f"__k{i}": pa.array([], t[k].type)
                             for i, k in enumerate(keys)}
                            | {"__cnt": pa.array([], pa.int64())})
        return pa.table({f"__k{i}": t[k].slice(0, 1)
                         for i, k in enumerate(keys)}
                        | {"__cnt": pa.array([t.num_rows], pa.int64())})

    heads = sorted_ds.map_batches(block_head, batch_size=None,
                                  batch_format="pyarrow").to_pandas()
    kcols = [f"__k{i}" for i in range(len(keys))]
    heads = heads.sort_values(kcols, ignore_index=True)
    offsets = heads["__cnt"].cumsum().shift(fill_value=0)
    off_by_key = {tuple(row): int(off) for row, off in
                  zip(heads[kcols].itertuples(index=False), offsets)}

    def add_rn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t.append_column(out_col, pa.array([], pa.int64()))
        first = tuple(t[k][0].as_py() for k in keys)
        off = off_by_key[first]
        return t.append_column(
            out_col, pa.array(np.arange(off, off + t.num_rows), pa.int64()))

    out = sorted_ds.map_batches(add_rn, batch_size=None,
                                batch_format="pyarrow")
    if return_total:
        return out, int(heads["__cnt"].sum())
    return out


def ntile_of_row_numbers(rn: np.ndarray, n_total: int, k: int) -> np.ndarray:
    """SQL NTILE(k) from 0-based global row numbers: the first n%k tiles get
    ceil(n/k) rows, the rest floor(n/k) — vectorized."""
    q, r = divmod(n_total, k)
    big = r * (q + 1)
    in_big = rn < big
    tile = np.where(in_big, rn // max(q + 1, 1),
                    r + (rn - big) // max(q, 1))
    return (tile + 1).astype(np.int64)
