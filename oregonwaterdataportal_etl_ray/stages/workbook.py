"""One-source -> N-datasets parse (S10) and grouped nest-to-list (M6/J3 tail).

The reference parses one xlsx blob into THREE validated record sets
(`parse_xlsx_from_bytes` / `validated_xlsx`,
/root/reference/userCode/xlsx/lib.py:33-56: sheet-count assertion +
column-presence assertion per sheet) and then nests children under parents by
key — datastreams under things, observations under datastreams — raising on a
child whose parent is missing (/root/reference/userCode/xlsx/helpers.py:79-197).

Ray-Data-first equivalents:

* ``split_source`` — ONE tagged dataset (a ``sheet`` discriminator column,
  the generalization of a workbook's sheet names) fans out into N validated
  Datasets. The input is materialized once; each output is a zero-copy
  filtered view, so the source is read and parsed a single time no matter
  how many outputs consume it (the reference reads the blob once too).
* ``validate_sheet_columns`` — strict column-presence check against a
  declared schema (pydantic ``extra='forbid'`` analog).
* ``nest_children`` — per-parent ``list<struct>`` assembly: children
  hash-bucket by parent key, ONE vectorized ListArray build per bucket
  (offsets from key boundaries — no per-parent Python loop), then a
  hash join attaches parent columns. Partitioning assumption: all children
  of a parent land in one bucket (guaranteed by the key hash).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .partitioning import derived_join_partitions, derived_num_buckets


def validate_sheet_columns(ds, declared: list[str], sheet_name: str) -> None:
    """Strict column-presence validation (reference
    userCode/xlsx/lib.py:22-31): every declared column must exist."""
    have = set(ds.schema().names)
    missing = sorted(set(declared) - have)
    if missing:
        raise ValueError(
            f"sheet {sheet_name!r} validation failed: missing columns {missing}")


def split_source(ds, sheet_col: str, sheets: dict[str, list[str]],
                 strict_count: bool = True) -> dict:
    """One tagged Dataset -> {sheet_name: validated Dataset}.

    ``sheets`` maps each expected sheet name to its declared columns. With
    ``strict_count`` the distinct discriminator values must equal the
    declared sheet set exactly (the reference's 'must be 3 sheets' law,
    userCode/xlsx/lib.py:34)."""
    src = ds.materialize()  # read/parse ONCE; outputs are filtered views
    if strict_count:
        # distinct discriminator values via map-side per-block unique — the
        # final unique() then sees <= blocks x sheets rows instead of
        # shuffling the whole column
        found = set(src.select_columns([sheet_col])
                    .map_batches(lambda t: pa.table(
                        {sheet_col: pc.unique(t[sheet_col])}),
                        batch_format="pyarrow")
                    .unique(sheet_col))
        if found != set(sheets):
            raise ValueError(
                f"workbook must contain exactly sheets {sorted(sheets)}; "
                f"found {sorted(found)}")
    # filtered views keep the source schema, so one schema() call validates
    # every sheet without triggering per-view plan execution
    src_cols = src.schema().names
    out = {}
    for name, declared in sheets.items():
        missing = sorted(set(declared) - set(src_cols))
        if missing:
            raise ValueError(
                f"sheet {name!r} validation failed: missing columns {missing}")
        # batch-level equality filter (NOT an interpolated expr string — a
        # sheet name containing quotes/expression syntax must stay data)
        def _eq(t: pa.Table, _n=name) -> pa.Table:
            return t.filter(pc.equal(t[sheet_col], _n))
        view = src.map_batches(_eq, batch_format="pyarrow")
        out[name] = view.select_columns(
            [c for c in src_cols if c in declared])
    return out


def _cogroup_nest(t: pa.Table, parent_key: str, parent_cols: list[str],
                  child_cols: list[tuple[str, str]], order_cols: list[str],
                  list_col: str, on_orphan: str = "drop") -> pa.Table:
    """ONE bucket of unioned parent+child rows -> one row per matched parent
    with its parent columns and a sorted list<struct> of children. Fully
    vectorized: one sort, boundary offsets, one ListArray build, one
    searchsorted parent match — no per-parent Python loop.

    ``child_cols``: (stored_name, output_struct_field_name) pairs — stored
    names are disambiguated upstream so parent/child name collisions can't
    produce duplicate columns in the tagged union."""
    role = t["__role"].to_numpy(zero_copy_only=False)
    pt = t.filter(pa.array(role == 0))
    ct = t.filter(pa.array(role == 1))
    # NULL join keys: a null can't match any parent — honor on_orphan
    # instead of letting searchsorted raise TypeError on a None comparison.
    # Null-key PARENTS can't match either (inner semantics drop them).
    n_null_child = ct[parent_key].null_count
    if n_null_child:
        if on_orphan == "error":
            raise ValueError(
                f"orphan children: {n_null_child} child rows have a NULL "
                "parent key")
        ct = ct.filter(pc.is_valid(ct[parent_key]))
    if pt[parent_key].null_count:
        pt = pt.filter(pc.is_valid(pt[parent_key]))
    if pt.num_rows == 0 or ct.num_rows == 0:
        if on_orphan == "error" and ct.num_rows and pt.num_rows == 0:
            first = ct[parent_key][0].as_py()
            raise ValueError(
                f"orphan children: {ct.num_rows} child rows reference parent "
                f"keys absent from the parent set (first key: {first!r})")
        child_struct_t = pa.struct(
            [pa.field(out, t.schema.field(stored).type)
             for stored, out in child_cols])
        return pa.table(
            {parent_key: pa.array([], t.schema.field(parent_key).type),
             **{c: pa.array([], t.schema.field(c).type) for c in parent_cols},
             list_col: pa.array([], pa.list_(child_struct_t))})

    # sort children by (key, order_cols); build per-key list offsets
    sort_keys = [(parent_key, "ascending")] + \
                [(c, "ascending") for c in order_cols]
    ct = ct.sort_by(sort_keys)
    ck = ct[parent_key].to_numpy(zero_copy_only=False)
    new = np.ones(len(ck), dtype=bool)
    new[1:] = ck[1:] != ck[:-1]
    starts = np.flatnonzero(new)
    offsets = np.concatenate([starts, [len(ck)]]).astype(np.int32)
    child_struct = pa.StructArray.from_arrays(
        [ct[stored].combine_chunks() for stored, _ in child_cols],
        names=[out for _, out in child_cols])
    lists = pa.ListArray.from_arrays(pa.array(offsets), child_struct)
    nest_keys = ck[starts]

    # match each nested key to its parent row (parents sorted by key)
    pt = pt.sort_by([(parent_key, "ascending")])
    pk = pt[parent_key].to_numpy(zero_copy_only=False)
    pos = np.searchsorted(pk, nest_keys)
    pos_c = np.clip(pos, 0, len(pk) - 1)
    matched = pk[pos_c] == nest_keys
    if on_orphan == "error" and not matched.all():
        bad = nest_keys[~matched]
        raise ValueError(
            f"orphan children: {len(bad)} child groups reference parent keys "
            f"absent from the parent set (first key: {bad[0]!r})")
    sel = pa.array(pos_c[matched])
    keep_lists = lists.filter(pa.array(matched)) if not matched.all() else lists
    cols = {parent_key: pt[parent_key].take(sel)}
    for c in parent_cols:
        cols[c] = pt[c].take(sel)
    cols[list_col] = keep_lists
    return pa.table(cols)


def nest_children(parent_ds, child_ds, parent_key: str, child_key: str,
                  child_cols: list[str], order_cols: list[str] | None = None,
                  list_col: str = "children", num_buckets: int | None = None,
                  on_orphan: str = "drop"):
    """Join-and-nest: each parent row gains ``list_col`` = list<struct> of
    its children's ``child_cols`` (sorted by ``order_cols``). Parents
    without children are dropped (inner semantics — the reference only
    emits entities present in the workbook).

    ``on_orphan`` governs CHILDREN whose parent key is missing:
    ``"drop"`` (default) silently filters them — inner-join semantics,
    data loss if the upstream is corrupt; ``"error"`` raises with a count
    and the first offending key, mirroring the reference's fail-loud law
    (userCode/xlsx/helpers.py 'Associated thing ... not found').

    ONE exchange total: both sides union with a role tag and hash-bucket by
    the key, and each bucket co-groups, nests, and attaches parent columns
    in a single vectorized kernel. (Arrow's hash join cannot carry
    list<struct> payload columns, and a cogroup avoids shuffling the nested
    lists a second time anyway.)"""
    order_cols = order_cols or []
    num_buckets = num_buckets or derived_num_buckets()
    parent_cols = [c for c in parent_ds.schema().names if c != parent_key]
    _CP = "__c\x1f"   # internal child-column prefix (collision-proof)

    def tag(role: int, pad_cols):
        def fn(t: pa.Table) -> pa.Table:
            k = t[parent_key].to_numpy(zero_copy_only=False)
            b = (pd.util.hash_array(k) % num_buckets).astype(np.int32)
            t = t.append_column("__bucket", pa.array(b))
            t = t.append_column("__role", pa.array(np.full(len(k), role, np.int8)))
            for name, typ in pad_cols:
                t = t.append_column(name, pa.nulls(t.num_rows, typ))
            return t
        return fn

    child_renamed = child_ds if child_key == parent_key else \
        child_ds.rename_columns({child_key: parent_key})
    # prefix every child non-key column: a child column sharing a parent
    # column's name (e.g. both sides carrying 'name') would otherwise be
    # APPENDED as null padding next to the real column — duplicate fields
    # and corrupted nesting
    c_base = child_renamed.schema().base_schema
    child_renamed = child_renamed.rename_columns(
        {f.name: _CP + f.name for f in c_base if f.name != parent_key})
    p_schema = parent_ds.schema().base_schema
    c_schema = child_renamed.schema().base_schema
    pad_parent = [(f.name, f.type) for f in c_schema if f.name != parent_key]
    pad_child = [(f.name, f.type) for f in p_schema if f.name != parent_key]
    tagged_p = parent_ds.map_batches(tag(0, pad_parent), batch_format="pyarrow")
    tagged_c = child_renamed.map_batches(tag(1, pad_child), batch_format="pyarrow")
    # column order must agree for union
    col_order = [parent_key] + [n for n, _ in pad_parent] + \
                [n for n, _ in pad_child] + ["__bucket", "__role"]
    tagged_p = tagged_p.select_columns(col_order)
    tagged_c = tagged_c.select_columns(col_order)
    stored_child_cols = [(_CP + c, c) for c in child_cols]
    stored_order = [_CP + c for c in order_cols]
    return (tagged_p.union(tagged_c)
                    .groupby("__bucket")
                    .map_groups(
                        lambda g: _cogroup_nest(g, parent_key, parent_cols,
                                                stored_child_cols,
                                                stored_order,
                                                list_col, on_orphan),
                        batch_format="pyarrow"))
