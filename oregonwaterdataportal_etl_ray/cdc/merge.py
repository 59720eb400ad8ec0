"""LWW upsert-merge kernels — the engine's correctness core.

Semantics ported from the reference (SURVEY.md §2.8):
  - exact dedup by derived key: duplicate delivery is a no-op
    (/root/reference/userCode/wrd/dag.py:221-226, userCode/util.py:30-37),
  - LWW conflict resolution on key collision with an explicit version order
    (``merge_paginated_well_response``,
     /root/reference/userCode/groundwater/wells.py:347-378),
  - delete = tombstone (null ``content``),
  - out-of-order tolerance: correctness from keys + per-key version sort,
    never arrival order (/root/reference/userCode/wrd/test_frost.py:427-538).

Everything here is vectorized Arrow/numpy — no Python row loops:
  * ``reduce_lww``      — winner-per-key within one Arrow table (argmax LSN).
  * ``NormalizeEvents`` — map_batches stage (instance-based task pool — its
    state is tiny, so tasks beat an actor pool's ramp-up): schema
    conformance, LSN parse, bucket hash, watermark filter, partial LWW reduce.
    The partial reduce is the combiner that shrinks the shuffle: duplicate
    deliveries and intra-block overwrites collapse *before* the all-to-all
    exchange, so at 100 TB the shuffle moves ~unique-keys-per-block, not
    raw events.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .schema import EvolutionSpec, conform_batch

KEY_SEP = "\x1f"


def parse_lsn(commit: pa.ChunkedArray | pa.Array) -> pa.Array:
    """LSN = int(commit[:12]) (FIXTURES.md F1 commit form)."""
    return pc.cast(pc.utf8_slice_codeunits(commit, 0, 12), pa.int64())


def key_column(t: pa.Table) -> pa.Array:
    """Combined primary key, INJECTIVE encoding: ``len(repo) SEP repo SEP
    path`` (PK per BASELINE input_hint). A bare ``repo+SEP+path`` join is
    not injective when a key value itself contains the separator —
    ('a<SEP>b', 'c') and ('a', 'b<SEP>c') would share one key and
    LWW-collapse distinct files. The char-length prefix makes decoding
    positional, so equal encodings imply equal pairs. Key-encoding v2
    (persisted in layout.json; v1 dirs must be rebuilt — bucket placement
    differs)."""
    return pc.binary_join_element_wise(
        pc.cast(pc.utf8_length(t["repo"]), pa.string()),
        t["repo"], t["path"], KEY_SEP)


def _encode_keys(keys: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, pa.Array]:
    """Dictionary-encode a key column: (codes per row, unique key values).

    One C++ hash-table build shared by both bucketing and the LWW reduce —
    per-row Python-object hashing never happens; only the (much smaller)
    unique-key set is touched from Python.
    """
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    enc = pc.dictionary_encode(keys)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    return enc.indices.to_numpy(zero_copy_only=False).astype(np.int64), enc.dictionary


# Bucket-hash recipe versions. Bucket placement is PERSISTED state (a key
# re-hashing to a different bucket corrupts the LSM merge), so the recipe id
# lives in layout.json next to num_buckets/key_encoding and a state dir is
# always read and written with the recipe it was built with.
BUCKET_HASH_SIPHASH = 1   # pandas object-siphash (per-unique Python objects)
BUCKET_HASH_POLY = 2      # vectorized polynomial + splitmix64 over Arrow buffers
# Default = siphash. The poly recipe (v2) hashes per-BYTE polynomial terms
# and materializes ~24 bytes of uint64 scratch per key byte; at 32
# concurrent normalize workers that extra memory traffic is a measured
# ~1.7x replay regression on a bandwidth-saturated node (r04 A/B: best
# siphash 10.1s vs best poly 15.9s on the 20M-event replay), while the
# per-unique-object cost of siphash is amortized by dictionary-encoding.
# Recipes are placement-defining PERSISTED state (layout.json), so v2 dirs
# keep replaying under v2 byte-identically; only fresh dirs pick this up.
BUCKET_HASH_DEFAULT = BUCKET_HASH_SIPHASH

_POLY_P = np.uint64(0x100000001B3)            # FNV-1a 64 prime (public)
_POLY_P_INV = np.uint64(pow(0x100000001B3, -1, 2 ** 64))  # mod-2^64 inverse
_GOLD64 = np.uint64(0x9E3779B97F4A7C15)       # 2^64 / golden ratio


_POW_BLOCK = 1 << 12
_pow_small_tables: dict = {}

# Grow-only per-process scratch buffers: the hash's temporaries are MBs per
# batch, and freshly malloc'd buffers of that size go through mmap/munmap +
# first-touch page faults on every call — kernel work that serializes across
# a node's 32 concurrent normalize workers. Reusing one arena per worker
# process keeps the kernel out of the hot path entirely.
_scratch_bufs: dict = {}


def _scratch(name: str, n: int, dtype) -> np.ndarray:
    need = n * np.dtype(dtype).itemsize
    buf = _scratch_bufs.get(name)
    if buf is None or buf.nbytes < need:
        _scratch_bufs[name] = buf = np.empty(max(need, 1 << 20), np.uint8)
    return buf[:need].view(dtype)


def _POW_SMALL_CACHE(p: np.uint64) -> np.ndarray:
    """p^k mod 2^64 for k < 4096 (one tiny sequential accumulate, cached)."""
    key = int(p)
    tab = _pow_small_tables.get(key)
    if tab is None:
        tab = np.ones(_POW_BLOCK, dtype=np.uint64)
        tab[1:] = p
        np.multiply.accumulate(tab, out=tab)
        _pow_small_tables[key] = tab
    return tab


def _pow_blocks(p: np.uint64, hi: int) -> np.ndarray:
    """(p^4096)^m mod 2^64 for m in 0..hi>>12 (tiny sequential accumulate)."""
    small = _POW_SMALL_CACHE(p)
    nb = (max(hi - 1, 0) >> 12) + 1
    big = np.ones(nb, dtype=np.uint64)
    if nb > 1:
        # scalar uint64 wraparound warns; do the one scalar step in Python
        big[1:] = np.uint64((int(small[-1]) * int(p)) & 0xFFFFFFFFFFFFFFFF)
        np.multiply.accumulate(big, out=big)
    return big


def _blocked_pow(p: np.uint64, e: np.ndarray | int) -> np.ndarray:
    """p^e mod 2^64 for an array of exponents: two tiny sequential
    accumulates (p^k for k < 4096, and (p^4096)^m) + parallel gathers —
    avoids a full-length ``multiply.accumulate`` whose serial dependency
    chain would dominate at large buffers."""
    e = np.asarray(e, dtype=np.int64)
    hi = int(e.max()) if e.size else 0
    big = _pow_blocks(p, hi + 1)
    return big[e >> 12] * _POW_SMALL_CACHE(p)[e & (_POW_BLOCK - 1)]


def _poly_hash_strings(uniq: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a string/binary array: a
    little-endian polynomial over the raw utf-8 buffer (h = sum byte_i *
    P^i mod 2^64 within the row), length mixed in, splitmix64 finalizer
    (Steele et al., "Fast Splittable PRNGs", OOPSLA'14 — public mixing
    constants). Fully vectorized with NO per-row work: one global
    ascending power table (an outer-product broadcast, no gathers), one
    multiply, one reduceat for the segment sums, then a per-ROW rescale by
    P^-start (P is odd hence invertible mod 2^64) to shift each row's
    exponents back to zero. Pure numpy arithmetic with fixed constants:
    the same key maps to the same value on every node/process. Nulls hash
    like empty strings (deterministic; the normalize path rejects null
    keys before here)."""
    if isinstance(uniq, pa.ChunkedArray):
        uniq = uniq.combine_chunks()
    arr = pc.cast(uniq, pa.large_binary())
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint64)
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset:arr.offset + n + 1]
    raw = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[off[0]:off[-1]]
    starts = off - off[0]
    lens = np.diff(starts)
    G = len(raw)
    if G:
        # With T_j = byte_j * P^j (GLOBAL ascending exponent),
        # sum_{j in row} T_j == h_row * P^(start_row) — so one broadcast
        # power table + one multiply + one reduceat + an n-sized inverse
        # gather compute every row's polynomial. Measured ~2.5x faster
        # than the sequential cumsum/accumulate forms at 6.6 MB of keys.
        # All G-sized temporaries come from the per-process scratch arena.
        data = _scratch("ph_data", G, np.uint64)
        np.copyto(data, raw, casting="unsafe")
        big = _pow_blocks(_POLY_P, G)
        gflat = _scratch("ph_gpow", len(big) * _POW_BLOCK, np.uint64)
        np.multiply(big[:, None], _POW_SMALL_CACHE(_POLY_P)[None, :],
                    out=gflat.reshape(len(big), _POW_BLOCK))
        gpow = gflat[:G]                                        # P^j
        # terms live in a G+1 buffer with a zero sentinel so a trailing
        # empty row's start == G stays a VALID reduceat index (clipping it
        # instead would silently shorten the preceding row's segment)
        terms = _scratch("ph_terms", G + 1, np.uint64)
        terms[G] = 0
        np.multiply(data, gpow, out=terms[:G])
        seg = np.add.reduceat(terms[:G + 1], starts[:-1])
        if (lens == 0).any():
            # reduceat quirk: an empty segment returns terms[start], not 0
            seg = np.where(lens == 0, np.uint64(0), seg)
        h = seg * _blocked_pow(_POLY_P_INV, starts[:-1])
    else:
        h = np.zeros(n, dtype=np.uint64)
    h = h + lens.astype(np.uint64) * _GOLD64
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


def _hash_uniques(uniq: pa.Array, num_buckets: int,
                  recipe: int = BUCKET_HASH_DEFAULT) -> np.ndarray:
    """THE bucket-hash recipe — the single definition both bucketing call
    sites (bucket_of_keys, NormalizeEvents) share: if the recipe ever
    drifted between them, normalize and reshard would disagree on bucket
    placement (silent cross-bucket state corruption). ``recipe`` selects
    the persisted layout's version: v1 is the legacy pandas siphash (kept
    so pre-v2 state dirs stay resumable byte-identically), v2 the
    vectorized polynomial+splitmix hash over the Arrow buffers — no
    per-unique-key Python objects on the normalize hot path."""
    if recipe == BUCKET_HASH_SIPHASH:
        return (pd.util.hash_array(np.asarray(uniq.to_pylist(), dtype=object))
                % num_buckets).astype(np.int32)
    if recipe != BUCKET_HASH_POLY:
        raise ValueError(f"unknown bucket-hash recipe {recipe!r}")
    return (_poly_hash_strings(uniq) % np.uint64(num_buckets)).astype(np.int32)


def bucket_of_keys(keys: pa.Array | pa.ChunkedArray, num_buckets: int,
                   recipe: int = BUCKET_HASH_DEFAULT) -> np.ndarray:
    """Deterministic hash bucket per key (stable across processes/nodes).
    Hashing runs over the dictionary-encoded *unique* values only, then
    broadcasts via take."""
    codes, uniq = _encode_keys(keys)
    return _hash_uniques(uniq, num_buckets, recipe)[codes]


def _lww_mask(codes: np.ndarray, lsn: np.ndarray) -> np.ndarray | None:
    """Row indices of the winner (max LSN) per key code; None = all rows win."""
    if len(codes) <= 1:
        return None
    order = np.lexsort((lsn, codes))
    sorted_codes = codes[order]
    is_last = np.ones(len(order), dtype=bool)
    is_last[:-1] = sorted_codes[1:] != sorted_codes[:-1]
    if is_last.all():
        return None
    return order[is_last]


def reduce_lww(t: pa.Table) -> pa.Table:
    """Keep, per (repo, path), the single row with the greatest LSN.

    Requires an ``lsn`` column; the combined key is recomputed from
    (repo, path) — the shuffle and the persisted state never carry a
    redundant key column (it duplicated ~13% of every exchanged byte).
    Ties (duplicate delivery of the same commit) keep one arbitrary copy —
    the rows are verbatim identical. Vectorized: dictionary-encode the key,
    lexsort (key, lsn), take the last row of each key run.
    """
    if t.num_rows <= 1:
        return t
    codes, _ = _encode_keys(key_column(t))
    lsn = t.column("lsn").to_numpy(zero_copy_only=False)
    winners = _lww_mask(codes, lsn)
    if winners is None:
        return t
    return t.take(pa.array(np.sort(winners)))


class NormalizeEvents:
    """map_batches stage: conform -> lsn -> bucket -> filter -> combine.

    Setup (evolution spec, target schema, watermark table) happens once in
    ``__init__`` (the reference's build-once ontology-dict pattern,
    /root/reference/userCode/ontology.py:331-382); the engine passes an
    INSTANCE so Ray runs it as a task pool — full parallelism from the first
    batch. Per-batch work is pure Arrow kernels.

    ``watermarks``: OPTIONAL dict bucket -> last_applied_lsn. Rows with
    ``lsn <= watermark[bucket]`` are dropped — the strict half-open resume
    predicate (reference's +1-minute overlap law,
    /root/reference/userCode/wrd/dag.py:189-197). Only enable this for
    sources that guarantee non-overlapping delivery windows (no cross-epoch
    out-of-order rows); the default engine path instead relies on the
    idempotent LWW merge + retained tombstones, which is safe under
    arbitrary bounded disorder.
    """

    def __init__(self, target_schema: pa.Schema, num_buckets: int,
                 evolution: EvolutionSpec | None = None,
                 watermarks: dict[int, int] | None = None,
                 bucket_hash: int = BUCKET_HASH_DEFAULT,
                 quarantine: bool = False,
                 strategy: str = "lww"):
        self.target = target_schema
        self.num_buckets = num_buckets
        self.bucket_hash = bucket_hash
        # strategy="patch": events carry an ``op`` column ('u'/'d', see
        # cdc/patch.py) and the block-level LWW combine is SKIPPED — a
        # patch fold keeps one LSN per folded row, not per column, so two
        # block-partials of the same key cannot be re-merged correctly when
        # their LSNs interleave; the single full fold happens per bucket in
        # the merge stage instead. The shuffle therefore moves raw events
        # under patch (vs winners-per-block under lww) — the price of
        # column-level merge, documented in cdc/patch.py.
        self.strategy = strategy
        # quarantine=True: malformed rows (null key/commit components,
        # commits without a parseable LSN prefix) are ROUTED instead of
        # raised — they get lsn=-1, bucket=num_buckets (one past the real
        # buckets, so they ride the same single shuffle) and a ``_qreason``
        # column; the merge side writes them to the dead-letter table and
        # never lets them near the LSM state. Default stays fail-loud (the
        # reference's strict-validator law, M15).
        self.quarantine = quarantine
        self.evolution = evolution or EvolutionSpec()
        if watermarks:
            wm = np.zeros(num_buckets, dtype=np.int64)
            for b, v in watermarks.items():
                wm[b] = v
            self.wm = wm
        else:
            self.wm = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = conform_batch(batch, self.target, self.evolution)
        op_ok = None
        if self.strategy == "patch":
            # config error, not a data error: never quarantined
            if "op" not in t.column_names:
                raise ValueError(
                    "merge_strategy='patch' requires an 'op' column "
                    "('u' = partial upsert, 'd' = delete) in the change "
                    f"events; got columns {t.column_names}")
            op_ok = pc.fill_null(
                pc.is_in(t["op"], value_set=pa.array(["u", "d"])), False)
        quarantined: pa.Table | None = None
        if not self.quarantine:
            # Fail-loud validation (the reference's strict-validator law,
            # M15): null PK components or null/unparseable commits must
            # surface HERE with counts, not corrupt the merge — a null key
            # would dictionary-encode to an INT64_MIN code (IndexError in
            # bucketing, silent collapse in the reduce) and a null LSN
            # would WIN LWW (NaN sorts last in lexsort).
            bad = {c: t.column(c).null_count for c in ("repo", "path", "commit")
                   if t.column(c).null_count}
            if bad:
                raise ValueError(
                    f"malformed change events: null values in key/commit "
                    f"columns {bad} (of {t.num_rows} rows in batch)")
            # validate BEFORE casting: pc.cast raises an uncounted
            # ArrowInvalid on non-digits, and a short all-digit commit ('7')
            # would otherwise silently parse to a tiny LSN that loses every
            # LWW conflict — count-and-raise here instead (the M15 law)
            ok = pc.match_substring_regex(t["commit"], r"^[0-9]{12}")
            n_bad = ok.length() - pc.sum(ok).as_py()
            if n_bad:
                first = t["commit"].filter(pc.invert(ok))[0].as_py()
                raise ValueError(
                    f"malformed change events: {n_bad} commits without a "
                    f"12-digit LSN prefix (first: {first!r}) "
                    f"(of {t.num_rows} rows in batch)")
            if op_ok is not None:
                n_bad_op = op_ok.length() - (pc.sum(op_ok).as_py() or 0)
                if n_bad_op:
                    first = t["op"].filter(pc.invert(op_ok))[0].as_py()
                    raise ValueError(
                        f"malformed change events: {n_bad_op} rows with op "
                        f"outside {{'u','d'}} (first: {first!r}) "
                        f"(of {t.num_rows} rows in batch)")
        else:
            # Dead-letter routing: split the batch vectorized, never raise.
            # Same malformation classes the fail-loud path counts.
            nulls = pc.or_(pc.or_(pc.is_null(t["repo"]), pc.is_null(t["path"])),
                           pc.is_null(t["commit"]))
            ok = pc.fill_null(
                pc.match_substring_regex(t["commit"], r"^[0-9]{12}"), False)
            is_bad = pc.or_(nulls, pc.invert(ok))
            if op_ok is not None:
                is_bad = pc.or_(is_bad, pc.invert(op_ok))
            n_bad = pc.sum(pc.cast(is_bad, pa.int64())).as_py() or 0
            if n_bad:
                reasons = pc.if_else(
                    nulls, pa.scalar("null_key_or_commit"),
                    pc.if_else(pc.invert(ok),
                               pa.scalar("unparseable_lsn_prefix"),
                               pa.scalar("invalid_op")))
                bad_t = t.filter(is_bad)
                quarantined = (
                    bad_t
                    .append_column("lsn", pa.array(
                        np.full(n_bad, -1, np.int64)))
                    .append_column("bucket", pa.array(
                        np.full(n_bad, self.num_buckets, np.int32)))
                    .append_column("_qreason", reasons.filter(is_bad)))
                t = t.filter(pc.invert(is_bad))
        t = t.append_column("lsn", parse_lsn(t["commit"]))
        keys = key_column(t)
        # NOTE: the combined key is NOT appended as a column — it would
        # duplicate repo+path (~13% of every byte the shuffle and the LSM
        # state move); downstream recomputes it from (repo, path)
        # one dictionary-encode shared by bucketing AND the partial LWW reduce
        codes, uniq = _encode_keys(keys)
        buckets = _hash_uniques(uniq, self.num_buckets, self.bucket_hash)[codes]
        t = t.append_column("bucket", pa.array(buckets, pa.int32()))
        lsn = t.column("lsn").to_numpy(zero_copy_only=False)
        if self.wm is not None:
            keep = lsn > self.wm[buckets]
            if not keep.all():
                t = t.filter(pa.array(keep))
                codes, lsn = codes[keep], lsn[keep]
        if self.strategy != "patch":  # see __init__: patch folds per bucket
            winners = _lww_mask(codes, lsn)
            if winners is not None:
                t = t.take(pa.array(np.sort(winners)))
        if not self.quarantine:
            return t
        # dead-letter mode: every emitted row carries the (almost always
        # null) _qreason column so good and quarantined rows share one
        # schema through the single shuffle — a null string column costs
        # one validity bitmap, nothing more
        t = t.append_column("_qreason", pa.nulls(t.num_rows, pa.string()))
        if quarantined is None:
            return t
        return pa.concat_tables([t, quarantined]) if t.num_rows else quarantined


def merge_sorted_runs(tables: list[pa.Table]) -> pa.Table | None:
    """LWW-merge several winner tables for the same bucket (LSM merge-on-read).

    Each input already has one row per key; output again has one row per key
    with the globally greatest LSN. Tombstones (null content) are *kept* here —
    the caller decides whether to drop them (final read) or persist them
    (delta runs must keep tombstones so later compaction can delete base rows).
    """
    live = [t for t in tables if t is not None and t.num_rows]
    if not live:
        return None
    if len(live) == 1:
        return live[0]
    return reduce_lww(pa.concat_tables(live, promote_options="permissive"))


def drop_tombstones(t: pa.Table) -> pa.Table:
    return t.filter(pc.is_valid(t["content"]))
