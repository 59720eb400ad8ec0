"""Debezium-style JSON change-event envelope source adapter.

Connects the engine to the de-facto standard CDC wire format (the public
Debezium envelope: ``{"before": {...}|null, "after": {...}|null,
"op": "c|r|u|d", "source": {"lsn": N, "txId": ...}, "ts_ms": ...}``, one
JSON object per line) by converting envelope JSONL files into the engine's
canonical columnar change-event batches:

  - ``op`` c (create) / r (snapshot read) / u (update) map to upsert;
    d maps to delete,
  - row values come from ``after``; for deletes the KEY columns come from
    ``before`` (a Debezium delete has ``after: null``),
  - the version order comes from ``source.lsn`` — the ``commit`` string is
    ALWAYS synthesized as the canonical zero-padded 12-digit LSN prefix
    (the engine orders by ``int(commit[:12])``), with ``source.txId``
    appended as an opaque ``-<txId>`` suffix when present. A real
    Postgres txId like ``'569'`` is NOT a valid version order, so it is
    never carried verbatim; LSNs >= 10^12 (which would not fit the
    12-digit prefix) are rejected loudly.

Parsing is VECTORIZED end to end: ``pyarrow.json`` (the C++ block reader
behind ``ray.data.read_json``) materializes the envelopes as Arrow struct
columns, and the flatten below is pure ``pc.struct_field``/``if_else``
kernels — no per-row Python even though the wire format is JSON. Null
``before``/``after`` structs propagate nulls through ``struct_field``
exactly as the mapping needs.

Staging (``stage_debezium_jsonl``) writes one canonical parquet batch per
input JSONL file, preserving file order and names — the engine's
exactly-once resume predicate is FILE-SET based (cdc/engine.py
``_pending_files``), so the staged files plug into ``replay()``/``tail()``
unchanged. Reference anchor: the reference ingests paginated JSON API
responses and normalizes them to typed rows per its pydantic schemas
(/root/reference/userCode/wrd/lib.py:34-53, types.py:120-168); this module
is that normalize step for the standard CDC envelope, columnar.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray

# Debezium op codes that apply row state (snapshot reads included)
_UPSERT_OPS = ("c", "r", "u")


def flatten_envelopes(t: pa.Table, key_cols: list[str],
                      value_cols: list[str],
                      emit_op: bool = False) -> pa.Table:
    """Flatten one Arrow batch of parsed envelopes (struct columns
    ``before``/``after``/``op``/``source``) into canonical change events.

    ``emit_op=True`` keeps an explicit 'u'/'d' op column (feed for
    ``merge_strategy='patch'``); with ``emit_op=False`` (default, the LWW
    feed) a delete is encoded as null ``content`` — the engine's tombstone
    convention — and the op column is dropped.
    """
    op = t.column("op")
    ok = pc.fill_null(pc.is_in(op, value_set=pa.array(list(_UPSERT_OPS) + ["d"])),
                      False)
    n_bad = ok.length() - (pc.sum(ok).as_py() or 0)
    if n_bad:
        first = op.filter(pc.invert(ok))[0].as_py()
        raise ValueError(f"malformed Debezium envelopes: {n_bad} rows with "
                         f"op outside c/r/u/d (first: {first!r})")
    is_del = pc.equal(op, "d")
    after, before = t.column("after"), t.column("before")
    src = t.column("source")

    # a file with no deletes infers `before` as null-type (and an all-delete
    # file infers `after` as null-type) — struct_field would raise; treat a
    # null-typed side as all-null fields of the other side's type
    def field_type(name: str) -> pa.DataType:
        for side in (after, before):
            if pa.types.is_struct(side.type):
                i = side.type.get_field_index(name)
                if i >= 0:
                    return side.type.field(i).type
        return pa.string()

    def sf(col, name: str):
        if (not pa.types.is_struct(col.type)
                or col.type.get_field_index(name) < 0):
            return pa.nulls(t.num_rows, field_type(name))
        return pc.struct_field(col, name)
    lsn = (pc.struct_field(src, "lsn")
           if (pa.types.is_struct(src.type)
               and src.type.get_field_index("lsn") >= 0)
           else pa.nulls(t.num_rows, pa.int64()))
    if lsn.null_count:
        raise ValueError(
            f"malformed Debezium envelopes: {lsn.null_count} rows without "
            "source.lsn (the version order)")
    lsn = pc.cast(lsn, pa.int64())
    if t.num_rows and not pc.all(
            pc.and_(pc.greater_equal(lsn, 0),
                    pc.less(lsn, 10 ** 12))).as_py():
        bad = lsn.filter(pc.or_(pc.less(lsn, 0),
                                pc.greater_equal(lsn, 10 ** 12)))[0].as_py()
        raise ValueError(
            f"source.lsn {bad} does not fit the canonical 12-digit commit "
            "prefix (need 0 <= lsn < 10^12); rebase the source LSNs")
    # commit: ALWAYS the 12-digit LSN prefix (the engine's version order is
    # int(commit[:12])); txId is an opaque transaction label, appended as a
    # suffix — carrying it verbatim would mis-order merges for real txIds
    # (a Postgres '569' has no positional meaning in the first 12 chars)
    synth = pc.utf8_lpad(pc.cast(lsn, pa.string()), 12, "0")
    tx = (pc.struct_field(src, "txId")
          if (pa.types.is_struct(src.type)
              and src.type.get_field_index("txId") >= 0)
          else pa.nulls(t.num_rows, pa.string()))
    if pa.types.is_null(tx.type):
        commit = synth
    else:
        if not pa.types.is_string(tx.type):
            tx = pc.cast(tx, pa.string())
        commit = pc.if_else(
            pc.is_null(tx), synth,
            pc.binary_join_element_wise(synth, pc.fill_null(tx, ""), "-"))
    cols: dict = {}
    for k in key_cols:
        # delete envelopes carry the key in `before`
        cols[k] = pc.if_else(is_del, sf(before, k), sf(after, k))
    cols["commit"] = commit
    if emit_op:
        cols["op"] = pc.if_else(is_del, pa.scalar("d"), pa.scalar("u"))
    for v in value_cols:
        cols[v] = pc.if_else(is_del,
                             pa.scalar(None, field_type(v)),
                             sf(after, v))
    return pa.table(cols)


def stage_debezium_jsonl(jsonl_files: list[str], out_dir: str,
                         key_cols: list[str], value_cols: list[str],
                         emit_op: bool = False) -> list[str]:
    """Convert Debezium envelope JSONL files to canonical parquet change
    batches, one output file per input file (order- and name-preserving, so
    the engine's file-set resume contract carries over). Distributed: one
    Ray task per file; idempotent (tmp+atomic rename; an existing staged
    file is kept — its content is a deterministic function of the input)."""
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def stage(src: str, dst: str) -> str:
        if not os.path.exists(dst):
            import pyarrow.json as pj
            import pyarrow.parquet as pq
            flat = flatten_envelopes(pj.read_json(src), key_cols, value_cols,
                                     emit_op)
            tmp = dst + ".tmp"
            pq.write_table(flat, tmp)
            os.replace(tmp, dst)
        return dst

    outs = [os.path.join(
        out_dir, os.path.splitext(os.path.basename(f))[0] + ".parquet")
        for f in jsonl_files]
    if len(set(outs)) != len(outs):
        raise ValueError("input JSONL files must have distinct basenames "
                         "(staged batch names preserve them)")
    return ray.get([stage.remote(s, d) for s, d in zip(jsonl_files, outs)])
