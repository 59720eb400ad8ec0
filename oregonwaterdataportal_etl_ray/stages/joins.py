"""Join strategies, Ray-Data-first.

The reference only ever joins a big stream against a SMALL side — the
ontology dict (~280 rows, /root/reference/userCode/wrd/sta_generation.py:106-112),
a station-metadata record (/root/reference/userCode/wrd/dag.py:106-120), the
xlsx sheet dicts (/root/reference/userCode/xlsx/helpers.py:112-174), or a
sink-id set for anti-joins (/root/reference/userCode/awqms/dag.py:158-179).

At 100 TB those become:
  * BroadcastLookup — small side materialized ONCE on the driver, shipped via
    ``ray.put`` (one object-store copy per node, zero-copy reads), looked up
    vectorized inside every ``map_batches`` task. No shuffle at all.
  * broadcast_key_set — semi/anti joins as a broadcast membership filter
    (at larger small-sides swap the set for a Bloom filter; same shape).
  * Both-sides-large joins use ``Dataset.join`` (hash-partitioned) — see
    pipelines/queries.py:three_table_join for the partitioned variant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def put_lookup(df: pd.DataFrame, key: str) -> "ray.ObjectRef":
    """Driver-side: index a small table by key and put it in the object store."""
    return ray.put(df.set_index(key))


class BroadcastLookup:
    """map_batches actor stage: enrich a stream with columns from a small side.

    ``__init__`` resolves the object ref once per actor (the reference's
    build-once ontology-mapping pattern, /root/reference/userCode/ontology.py:331-382);
    ``__call__`` is a vectorized pandas reindex per batch.

    ``on_miss``: 'null' (left join, default), 'drop' (inner), 'error'
    (the reference's KeyError-on-miss contract,
    /root/reference/userCode/xlsx/helpers.py:112-118).
    """

    def __init__(self, lookup_ref, stream_key: str, take_cols: list[str],
                 on_miss: str = "null"):
        self.lookup = ray.get(lookup_ref) if isinstance(lookup_ref, ray.ObjectRef) else lookup_ref
        self.stream_key = stream_key
        self.take_cols = take_cols
        self.on_miss = on_miss
        # the lookup side's Arrow types, resolved once per actor: output
        # columns must keep them even when a batch has misses (see __call__)
        self._types = {c: pa.Array.from_pandas(self.lookup[c]).type
                       for c in take_cols}

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.stream_key).to_pandas()
        sub = self.lookup[self.take_cols].reindex(keys)
        # miss = key absent from the lookup INDEX — testing the first taken
        # column for NaN would conflate a present key whose value is
        # legitimately null with a genuinely missing key (dropping or
        # erroring on real data)
        if self.on_miss == "error":
            missing = ~keys.isin(self.lookup.index)
            if missing.any():
                raise KeyError(f"{int(missing.sum())} stream keys missing from lookup "
                               f"(first: {keys[missing.values].iloc[0]!r})")
        elif self.on_miss == "drop":
            keep = keys.isin(self.lookup.index).values
            batch = batch.filter(pa.array(keep))
            sub = sub[keep]
        # from_pandas=True: a miss must become a typed Arrow NULL, not a
        # float64 NaN — pandas reindex upcasts int64 columns with misses to
        # float64 whose NaN Arrow would store as a NON-null double (silent
        # dtype drift + IS NULL misses). Restore the lookup side's dtype.
        for c in self.take_cols:
            arr = pa.array(sub[c], from_pandas=True)
            if arr.type != self._types[c]:
                arr = arr.cast(self._types[c])
            batch = batch.append_column(c, arr)
        return batch


def broadcast_key_set(values) -> "ray.ObjectRef":
    """Driver-side: broadcast a key set for semi/anti membership filters."""
    return ray.put(np.sort(np.asarray(values)))


class BloomFilter:
    """Vectorized numpy Bloom filter for at-scale membership pre-filtering.

    When the semi/anti-join small side outgrows a broadcast array (billions
    of committed ids), broadcast this instead: m bits + k double-hashed
    probes per key (h1 + i*h2, splitmix64 mixing). Semantics:
      contains() False  => definitely NOT in the set (safe to drop for semi,
                           safe to keep for anti),
      contains() True   => maybe present — route to an exact check against
                           the sharded id store.
    """

    def __init__(self, n_items: int, fpp: float = 0.01):
        m = int(max(64, -n_items * np.log(fpp) / (np.log(2) ** 2)))
        self.m = (m + 63) // 64 * 64
        self.k = max(1, int(round(self.m / max(1, n_items) * np.log(2))))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)

    @staticmethod
    def _mix(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        x = v.astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h1 = x ^ (x >> np.uint64(31))
        h2 = (h1 >> np.uint64(17)) | np.uint64(1)  # odd => full-period stride
        return h1, h2

    def _positions(self, v: np.ndarray) -> np.ndarray:
        h1, h2 = self._mix(v)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) % np.uint64(self.m)  # (k, n)

    def add(self, values: np.ndarray) -> None:
        pos = self._positions(np.asarray(values)).reshape(-1)
        np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))

    def contains(self, values: np.ndarray) -> np.ndarray:
        pos = self._positions(np.asarray(values))
        word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0).astype(bool)


class BloomMembershipFilter:
    """map_batches stage: Bloom pre-filter + exact verify of 'maybe' rows.

    Exactness is preserved: Bloom negatives are decided immediately; Bloom
    positives are confirmed against the exact key set (which at scale would
    be a sharded lookup touched only for the small 'maybe' fraction)."""

    def __init__(self, bloom_ref, keys_ref, col: str, keep: bool):
        self.bloom = ray.get(bloom_ref) if isinstance(bloom_ref, ray.ObjectRef) else bloom_ref
        self.keys = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
        self.col = col
        self.keep = keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = batch.column(self.col).to_numpy(zero_copy_only=False)
        maybe = self.bloom.contains(vals)
        mask = maybe.copy()
        if maybe.any():  # exact check only for the maybe-present fraction
            mask[maybe] = np.isin(vals[maybe], self.keys)
        return batch.filter(pa.array(mask if self.keep else ~mask))


class MembershipFilter:
    """map_batches actor stage: semi (keep=True) / anti (keep=False) join
    against a broadcast sorted key array (np.isin is a vectorized merge)."""

    def __init__(self, keys_ref, col: str, keep: bool):
        self.keys = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
        self.col = col
        self.keep = keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = batch.column(self.col).to_numpy(zero_copy_only=False)
        mask = np.isin(vals, self.keys)
        return batch.filter(pa.array(mask if self.keep else ~mask))


def _arrow_schema(ds) -> pa.Schema:
    """A Dataset's schema as a real ``pa.Schema``. A pipeline whose last
    stage produced pandas blocks surfaces a PandasBlockSchema (plain
    names/types lists, numpy dtypes) — map it so schema-driven operators
    (the full-outer conform below) work on either block format; object
    dtype degrades to string."""
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base

    def at(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()
    return pa.schema([pa.field(n, at(t)) for n, t in zip(s.names, s.types)])


def bucketed_full_outer_join(left, right, left_on: str, right_on: str,
                             num_buckets: int | None = None,
                             right_combine=None):
    """FULL OUTER hash join as a composition (hash-bucket -> one shuffle ->
    per-bucket Acero join).

    Ray Data's native ``join(..., "full_outer")`` builds a schemaless empty
    table for a hash partition that received no rows from one input and
    Acero then rejects the key reference — guaranteed to bite whenever one
    side is sparse relative to the partition count. This composition is
    empty-side-safe: both sides are conformed to one tagged schema (missing
    columns as typed nulls), bucketed by ``hash(key) & (nb - 1)``, shuffled
    ONCE by bucket, and each bucket is joined with pyarrow's vectorized,
    type-preserving full-outer join (an empty side is just a typed empty
    table there). The key pair is coalesced into ``left_on``.

    Partitioning assumption (the standard hash-join contract): one bucket's
    rows from both sides fit a worker. ``num_buckets`` must be a power of
    two (the default, cluster-derived count is).

    ``right_combine``: optional per-bucket combiner applied to the right
    side before the join — the aggregate-then-join shape in ONE shuffle:
    ship map-side partial aggregates as the right input and fold them here
    (keys are bucket-complete), instead of paying a separate groupby
    exchange before the join's own.
    """
    import pyarrow.compute as pc

    from ..cdc.merge import bucket_of_keys
    from .partitioning import derived_num_buckets
    nb = num_buckets or derived_num_buckets()
    l_schema = _arrow_schema(left)
    r_schema = _arrow_schema(right)
    overlap = set(l_schema.names) & set(r_schema.names)
    if overlap:
        raise ValueError(f"column names must be disjoint, got {overlap}")
    all_fields = list(l_schema) + list(r_schema)

    def conform(side: int, key: str):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for f in all_fields:
                cols[f.name] = (t[f.name] if f.name in t.column_names
                                else pa.nulls(t.num_rows, f.type))
            k = t[key]
            if pa.types.is_integer(k.type):
                b = pc.cast(pc.bit_wise_and(k, nb - 1), pa.int32())
            else:
                b = pa.array(bucket_of_keys(pc.cast(k, pa.string()), nb),
                             pa.int32())
            cols["__side"] = pa.array(np.full(t.num_rows, side, np.int8))
            cols["__bucket"] = b
            return pa.table(cols)
        return fn

    tagged = left.map_batches(conform(0, left_on), batch_format="pyarrow") \
        .union(right.map_batches(conform(1, right_on), batch_format="pyarrow"))
    l_names, r_names = list(l_schema.names), list(r_schema.names)

    def merge_group(g: pa.Table) -> pa.Table:
        is_l = pc.equal(g["__side"], 0)
        l = g.filter(is_l).select(l_names)
        r = g.filter(pc.invert(is_l)).select(r_names)
        if right_combine is not None:
            r = right_combine(r).select(r_names)
        return l.join(r, keys=left_on, right_keys=right_on,
                      join_type="full outer")

    return tagged.groupby("__bucket").map_groups(merge_group,
                                                 batch_format="pyarrow")


def bucketed_anti_join(ds, ids, on: str, id_col: str | None = None,
                       num_buckets: int | None = None):
    """ANTI join without a broadcast: rows of ``ds`` whose ``ds[on]`` does
    NOT appear in ``ids[id_col]`` — the at-scale replacement for shipping a
    removal array to every task when the removal set is corpus-sized (e.g.
    a web-scale near-dup removal set). Both sides hash-bucket on the id
    (one shuffle each), a tagged union co-locates them, and each bucket
    filters vectorized with ``pc.is_in``. Integer ids required (the dedup
    pipelines' doc_id). Partitioning assumption: one bucket's rows from
    both sides fit a worker."""
    import numpy as np

    from .partitioning import derived_num_buckets
    id_col = id_col or on
    nb = num_buckets or derived_num_buckets()
    sch = _arrow_schema(ds)
    fields = [(n, t) for n, t in zip(sch.names, sch.types)]
    names = [n for n, _ in fields]
    gold = np.uint64(0x9E3779B97F4A7C15)

    def tag(side: int, key: str):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for n, ty in fields:
                if side == 0:
                    cols[n] = t[n]
                else:
                    cols[n] = (t[key] if n == on
                               else pa.nulls(t.num_rows, ty))
            v = cols[on].to_numpy(zero_copy_only=False).astype(np.uint64)
            cols["__b"] = pa.array(
                ((v * gold) & np.uint64(nb - 1)).astype(np.int32))
            cols["__side"] = pa.array(np.full(t.num_rows, side, np.int8))
            return pa.table(cols)
        return fn

    tagged = ds.map_batches(tag(0, on), batch_format="pyarrow") \
        .union(ids.map_batches(tag(1, id_col), batch_format="pyarrow"))

    def anti(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        is_l = pc.equal(g["__side"], 0)
        left = g.filter(is_l).select(names)
        drop = g.filter(pc.invert(is_l))[on]
        if len(drop) == 0:
            return left
        return left.filter(
            pc.invert(pc.fill_null(pc.is_in(left[on],
                                            value_set=drop.combine_chunks()
                                            if isinstance(drop, pa.ChunkedArray)
                                            else drop), False)))

    return tagged.groupby("__b").map_groups(anti, batch_format="pyarrow")
