"""Column-level partial-update ("patch") merge kernels.

The LWW engine (cdc/merge.py) replaces whole rows; this module implements the
other standard CDC merge contract — the public Debezium partial-event /
Hudi partial-update-payload shape, where an upsert event may carry only the
columns that changed:

  - events carry an explicit ``op`` column: ``'u'`` (partial upsert: a null
    non-key column means UNCHANGED) or ``'d'`` (delete: resets the key; any
    column values on the delete row are ignored),
  - merging folds, per key, the last non-null value of each column since the
    key's last delete,
  - liveness: a key is live iff its folded ``content`` is non-null (keeps
    ``drop_tombstones`` semantics identical across strategies).

ORDERING ASSUMPTION (result-defining; documented per the engine's
partitioning-assumption rule): within an epoch, events fold by LSN, so
arbitrary intra-epoch disorder is fine; ACROSS epochs, per-key delivery must
be epoch-ordered (the standard per-key-ordered CDC delivery contract, e.g.
one Kafka partition per key). A folded run row keeps ONE lsn, not one per
column, so cross-epoch disorder within a key cannot be repaired at merge
time — the LWW strategy remains the right choice for sources that violate
per-key ordering.

Everything here is vectorized (lexsort + reduceat + Arrow take); no Python
row loops. Reference semantics anchor: the reference merges paginated
partial responses per well field-by-field in
/root/reference/userCode/groundwater/wells.py:347-378 (newest non-empty
field wins) — this module is that contract generalized to arbitrary columns
with explicit deletes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .merge import _encode_keys, key_column

RESET_COL = "_reset"

# columns that are never patch-folded values in engine state tables
_ENGINE_META = ("repo", "path", "bucket", "lsn", "op", RESET_COL, "__seq")


def _valid_np(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    v = pc.is_valid(col)
    if isinstance(v, pa.ChunkedArray):
        v = v.combine_chunks()
    return v.to_numpy(zero_copy_only=False)


def fold_patch(t: pa.Table, codes: np.ndarray, order: np.ndarray,
               reset: np.ndarray, value_cols: list[str],
               *, reset_carries_values: bool) -> pa.Table:
    """One folded row per key code: per ``value_cols`` column the last
    non-null value at-or-after the key's last reset row; every other column
    is carried from the key's last row in ``order``; ``_reset`` reports
    whether any reset occurred (so a later fold level knows to ignore
    earlier state for the key).

    ``reset_carries_values=False`` ignores values sitting ON a reset row
    (an event-stream delete carries nothing); ``True`` honors them (a
    committed absolute row — e.g. a compacted base — IS a reset that
    carries the full row).
    """
    n = t.num_rows
    if n == 0:
        out = t.drop_columns([RESET_COL]) if RESET_COL in t.column_names else t
        return out.append_column(RESET_COL, pa.array([], pa.bool_()))
    perm = np.lexsort((order, codes))
    cs = codes[perm]
    starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
    counts = np.diff(np.r_[starts, n])
    ends = starts + counts - 1
    pos = np.arange(n)
    rs = reset[perm]
    last_reset = np.maximum.reduceat(np.where(rs, pos, -1), starts)
    lr_row = np.repeat(last_reset, counts)
    last_idx = pa.array(perm[ends])
    cols: dict = {}
    for c in t.column_names:
        if c == RESET_COL:
            continue  # recomputed below
        col = t[c]
        if c in value_cols:
            ok = _valid_np(col)[perm] & (pos >= lr_row)
            if not reset_carries_values:
                ok &= ~rs
            win = np.maximum.reduceat(np.where(ok, pos, -1), starts)
            ia = pa.array(perm[np.maximum(win, 0)], mask=(win < 0))
            cols[c] = col.take(ia)
        else:
            cols[c] = col.take(last_idx)
    cols[RESET_COL] = pa.array(last_reset >= 0)
    return pa.table(cols)


def fold_epoch_events(group: pa.Table) -> pa.Table:
    """Fold one bucket's raw epoch events ((repo, path) key, ``op`` column,
    intra-epoch order = lsn) into one patch row per key with ``_reset``.
    The ``op`` column is consumed (replaced by ``_reset``)."""
    codes, _ = _encode_keys(key_column(group))
    lsn = group.column("lsn").to_numpy(zero_copy_only=False)
    op = group.column("op")
    if isinstance(op, pa.ChunkedArray):
        op = op.combine_chunks()
    reset = pc.equal(op, "d").to_numpy(zero_copy_only=False)
    t = group.drop_columns(["op"])
    value_cols = [c for c in t.column_names if c not in _ENGINE_META]
    return fold_patch(t, codes, lsn, reset, value_cols,
                      reset_carries_values=False)


def fold_patch_runs(parts: list[pa.Table]) -> pa.Table | None:
    """Fold committed patch-state parts ([base] + runs, EPOCH-ascending
    order) into one absolute row per key — the patch-strategy counterpart
    of merge.merge_sorted_runs. Each part has at most one row per key and a
    ``_reset`` column; later parts' non-null values win, a later ``_reset``
    row cuts off everything earlier. Schema evolution across epochs unifies
    permissively (a column absent from an old part reads as null =
    unchanged — exactly the patch contract)."""
    live = [p for p in parts if p is not None and p.num_rows]
    if not live:
        return None
    if len(live) == 1:
        return live[0]
    with_seq = [p.append_column("__seq", pa.array(
        np.full(p.num_rows, i, np.int64))) for i, p in enumerate(live)]
    t = pa.concat_tables(with_seq, promote_options="permissive")
    codes, uniq = _encode_keys(key_column(t))
    seq = t.column("__seq").to_numpy(zero_copy_only=False)
    # ORDERING GUARD: the patch contract requires per-key epoch-ordered
    # delivery (module docstring). A later part carrying an OLDER lsn for a
    # key (cross-epoch stale redelivery) would silently overwrite newer
    # column values — lww tolerates that, patch corrupts state — so detect
    # the regression and refuse loudly instead. Equal lsn across parts (a
    # verbatim duplicate) is benign and allowed. Vectorized: sort by
    # (key, part-seq), compare adjacent lsn within key runs.
    if "lsn" in t.column_names:
        lsn = t.column("lsn").to_numpy(zero_copy_only=False)
        gperm = np.lexsort((seq, codes))
        cs, ls = codes[gperm], lsn[gperm]
        regress = (cs[1:] == cs[:-1]) & (ls[1:] < ls[:-1])
        if regress.any():
            i = int(np.flatnonzero(regress)[0])
            key = uniq[int(cs[i + 1])].as_py()
            raise ValueError(
                f"patch ordering contract violated: key {key!r} regresses "
                f"from lsn {int(ls[i])} to {int(ls[i + 1])} in a LATER "
                "epoch part — per-key delivery must be epoch-ordered for "
                "merge_strategy='patch' (use 'lww' for sources with "
                "cross-epoch disorder)")
    reset_col = t.column(RESET_COL)
    if isinstance(reset_col, pa.ChunkedArray):
        reset_col = reset_col.combine_chunks()
    # permissive concat can null-pad _reset for parts written before the
    # column existed — treat absent as False (plain patch row)
    reset = pc.fill_null(reset_col, False).to_numpy(zero_copy_only=False)
    value_cols = [c for c in t.column_names if c not in _ENGINE_META]
    out = fold_patch(t.drop_columns(["__seq"]), codes, seq, reset, value_cols,
                     reset_carries_values=True)
    return out


def oracle_patch_replay(files: list[str]):
    """Single-process pandas oracle for the patch strategy: sequentially
    apply every event in (file order, lsn) order — the semantics the
    distributed fold must reproduce. Test-scale only (Python loop)."""
    import pandas as pd
    import pyarrow.parquet as pq

    state: dict = {}
    for ei, f in enumerate(files):
        df = pq.read_table(f).to_pandas()
        df["lsn"] = df["commit"].str[:12].astype("int64")
        value_cols = [c for c in df.columns
                      if c not in ("repo", "path", "commit", "op", "lsn")]
        for _, r in df.sort_values("lsn", kind="stable").iterrows():
            k = (r["repo"], r["path"])
            if r["op"] == "d":
                state[k] = {c: None for c in value_cols}
                state[k]["lsn"] = r["lsn"]
                state[k]["_reset"] = True
                continue
            cur = state.setdefault(
                k, {**{c: None for c in value_cols}, "_reset": False})
            for c in value_cols:
                if pd.notna(r[c]):
                    cur[c] = r[c]
            cur["lsn"] = r["lsn"]
    rows = [{"repo": k[0], "path": k[1], **v} for k, v in state.items()
            if v.get("content") is not None]
    return pd.DataFrame(rows).sort_values(["repo", "path"]).reset_index(drop=True)
