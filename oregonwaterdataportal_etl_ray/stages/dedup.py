"""Deduplication operators for training-data pipelines.

Exact dedup generalizes the reference's derived-key dedup
(/root/reference/userCode/util.py:30-37 + userCode/wrd/dag.py:221-226);
near-dup (MinHash-LSH / SimHash / n-gram Jaccard) are the web-scale
extensions, built from the public literature: MinHash resemblance sketches
(Broder, "On the resemblance and containment of documents", SEQUENCES 1997),
banded LSH (Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets" ch. 3),
and SimHash random-hyperplane fingerprints (Charikar, "Similarity estimation
techniques from rounding algorithms", STOC 2002).

Scale shapes (100 TB):
  exact   : md5(content) in map_batches -> groupby(hash) -> keep-first.
            One shuffle keyed by content hash; combiner collapses per block.
  minhash : per-batch shingle+minhash (vectorized) -> EXPLODE to
            (band_id, band_hash, doc_id) -> groupby(band) -> pairs inside
            each bucket. The only shuffle moves (band, hash, id) triples —
            tiny vs the corpus. Candidate pairs are then verified with exact
            n-gram Jaccard in a second map stage (no shuffle).
  simhash : 64-bit simhash per doc; near-dup = hamming distance <= d within
            LSH bands of the simhash (same explode-groupby shape).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# shingling + minhash (vectorized per batch)
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1
_BASE = np.uint64(1099511628211)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit rolling hashes of all k-byte shingles (uint64). Texts shorter
    than k hash as ONE shingle of their zero-padded k bytes (deterministic —
    never Python's salted ``hash``). Per-doc reference for the batch kernels
    below; kept for tests and small ad-hoc use."""
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    if len(b) < k:
        b = np.concatenate([b, np.zeros(k - len(b), dtype=np.uint8)])
    acc = np.zeros(len(b) - k + 1, dtype=np.uint64)
    for i in range(k):
        acc = acc * _BASE + b[i:len(b) - k + 1 + i].astype(np.uint64)
    return np.unique(acc)


def _within(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated (the intra-segment index)."""
    if len(counts) == 0:                     # empty batch (e.g. a Ray probe)
        return np.empty(0, dtype=np.int64)
    total = int(counts.sum())
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def _batch_rolling_hashes(col, k: int, base: np.uint64,
                          pad_short: bool = True) -> tuple[np.ndarray, np.ndarray, int]:
    """Rolling k-byte hashes for EVERY document of a column in one
    vectorized pass: concatenate all texts' utf-8 bytes, run the k rolling
    passes once over the whole buffer, keep only positions whose window
    stays inside its own document. Within a document, positions appear in
    byte order. Returns (hashes, doc_index, n_docs) — hashes may contain
    per-doc duplicates (caller dedups if it must).

    ``pad_short``: documents shorter than k contribute one zero-padded
    k-byte hash (minhash/simhash semantics) or nothing (winnowing).

    This replaces the round-1 per-document Python loop (the single most
    expensive stage in the bench battery at 18 s / sf0.1)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = pc.cast(pc.fill_null(col, ""), pa.large_binary())
    n = len(arr)
    if n == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int64), 0)
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset:arr.offset + n + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[off[0]:off[-1]]
    starts = off - off[0]
    lens = np.diff(starts)

    # long docs (len >= k): every in-doc position
    vcounts = np.maximum(lens - k + 1, 0)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), vcounts)
    pos = starts[:-1][doc_idx] + _within(vcounts)
    L = len(data)
    if L >= k:
        acc = np.zeros(L - k + 1, dtype=np.uint64)
        for i in range(k):
            acc = acc * base + data[i:L - k + 1 + i].astype(np.uint64)
        hashes = acc[pos]
    else:
        hashes = np.empty(0, np.uint64)

    # short docs (len < k): one zero-padded k-byte hash each (optional)
    sidx = np.flatnonzero(lens < k)
    if pad_short and len(sidx):
        slens = lens[sidx]
        pad = np.zeros((len(sidx), k), dtype=np.uint8)
        w = _within(slens)
        pad[np.repeat(np.arange(len(sidx)), slens), w] = \
            data[np.repeat(starts[:-1][sidx], slens) + w]
        sacc = np.zeros(len(sidx), dtype=np.uint64)
        for i in range(k):
            sacc = sacc * base + pad[:, i].astype(np.uint64)
        hashes = np.concatenate([hashes, sacc])
        doc_idx = np.concatenate([doc_idx, sidx.astype(np.int64)])
    return hashes, doc_idx, n


def _batch_shingle_hashes(col, k: int) -> tuple[np.ndarray, np.ndarray, int]:
    return _batch_rolling_hashes(col, k, _BASE, pad_short=True)


class MinHasher:
    """Stateful map_batches stage: text -> num_perm minhash signature via
    one-permutation hashing (OPH).

    Classic minhash costs O(S * P) per document (an outer product of S
    shingles with P permutations); OPH hashes each shingle ONCE, buckets it
    into one of P bins by its top bits, and keeps the per-bin minimum —
    O(S + P) — then fills empty bins by rotation densification so the
    equal-bin fraction stays an unbiased Jaccard estimate (Shrivastava &
    Li, "Improved Densification of One Permutation Hashing", UAI 2014 —
    public paper). ``num_perm`` must be a power of two. Mixing constants are
    fixed, so every actor on every node produces identical signatures."""

    def __init__(self, num_perm: int = 64, k: int = 5, text_col: str = "text",
                 seed: int = 1234):
        assert num_perm & (num_perm - 1) == 0, "num_perm must be a power of 2"
        rng = np.random.default_rng(seed)
        self.mix_a = np.uint64(int(rng.integers(1, 2**63, dtype=np.uint64)) | 1)
        self.mix_b = np.uint64(int(rng.integers(0, 2**63, dtype=np.uint64)))
        self.num_perm = num_perm
        self.shift = np.uint64(64 - int(np.log2(num_perm)))
        self.k = k
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        """Per-document reference path (tests / ad-hoc); identical output to
        the batched ``__call__`` kernel."""
        sh = _shingle_hashes(text or "", self.k)  # (S,) unique uint64
        mixed = sh * self.mix_a + self.mix_b      # decorrelate bin vs value
        bins = (mixed >> self.shift).astype(np.int64)
        sig = np.full(self.num_perm, np.uint64(0xFFFFFFFFFFFFFFFF))
        np.minimum.at(sig, bins, mixed)
        return self._densify(sig[None, :])[0]

    def _densify(self, sig: np.ndarray) -> np.ndarray:
        """Rotation densification over an (N, P) signature matrix: each empty
        bin borrows the nearest filled bin to its left (circular), offset-
        mixed so borrowed values differ per bin. Rows with no filled bin at
        all become all-zero. Fully vectorized across documents."""
        n, p = sig.shape
        empty = sig == np.uint64(0xFFFFFFFFFFFFFFFF)
        if not empty.any():
            return sig
        idx = np.arange(p)
        filled_idx = np.where(empty, -1, idx[None, :])
        src = np.maximum.accumulate(filled_idx, axis=1)
        wrap = src < 0  # empties before the first filled bin wrap around
        if wrap.any():
            last = np.maximum.accumulate(
                np.concatenate([filled_idx, filled_idx], axis=1), axis=1)[:, p:]
            src = np.where(wrap, last, src)
        all_empty = src[:, -1] < 0
        srcc = np.clip(src, 0, p - 1)
        borrowed = np.take_along_axis(sig, srcc, axis=1) + \
            (idx[None, :] - srcc).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        sig = np.where(empty, borrowed, sig)
        if all_empty.any():
            sig[all_empty] = np.uint64(0)
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batched OPH: ONE set of rolling-hash passes over the whole batch's
        concatenated bytes, one scatter-min into (doc, bin)-flattened bins,
        one vectorized densification — no per-document Python loop."""
        hashes, doc_idx, n = _batch_shingle_hashes(batch[self.text_col], self.k)
        p = self.num_perm
        mixed = hashes * self.mix_a + self.mix_b
        flat_bins = doc_idx * p + (mixed >> self.shift).astype(np.int64)
        sig = np.full(n * p, np.uint64(0xFFFFFFFFFFFFFFFF))
        np.minimum.at(sig, flat_bins, mixed)
        sig = self._densify(sig.reshape(n, p))
        arr = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * p, p, dtype=np.int32)),
            pa.array(sig.reshape(-1), pa.uint64()))
        return batch.append_column("minhash", arr)


class BandExploder:
    """minhash signature -> (band_id, band_hash) rows for LSH bucketing.

    Emits num_bands rows per doc: the shuffle payload for the groupby."""

    def __init__(self, num_bands: int = 16, id_col: str = "doc_id"):
        self.num_bands = num_bands
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["minhash"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if n == 0:
            # reshape(0, -1) is ambiguous to numpy (raises); empty signature
            # blocks occur whenever an input fragment was empty
            return pa.table({
                self.id_col: pa.array([], batch[self.id_col].type),
                "band_id": pa.array([], pa.int32()),
                "band_hash": pa.array([], pa.uint64())})
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        sigs = flat.reshape(n, -1)                # (N, P) zero-copy view
        p = sigs.shape[1]
        rows_per = p // self.num_bands
        bands = sigs[:, :rows_per * self.num_bands].reshape(n, self.num_bands, rows_per)
        # hash each band slice to one uint64
        bh = bands[:, :, 0].copy()
        for r in range(1, rows_per):
            bh = bh * np.uint64(1000003) + bands[:, :, r]
        ids = np.repeat(batch[self.id_col].to_numpy(zero_copy_only=False), self.num_bands)
        band_id = np.tile(np.arange(self.num_bands, dtype=np.int32), n)
        return pa.table({
            self.id_col: pa.array(ids),
            "band_id": pa.array(band_id, pa.int32()),
            "band_hash": pa.array(bh.reshape(-1), pa.uint64()),
        })


def bucket_pairs(group: pa.Table, id_col: str = "doc_id", max_bucket: int = 200) -> pa.Table:
    """All id pairs inside ONE bucket (candidate dups) — a thin wrapper over
    :func:`pairs_in_partition` with a constant group key, so the two can
    never drift on the truncation policy (max_bucket smallest ids, the
    ``oversized`` flag). The partition kernel is the one the pipelines run;
    this single-bucket form remains for tests and ad-hoc use."""
    const = pa.array(np.zeros(group.num_rows, np.int32))
    t = pa.table({id_col: group[id_col], "__g": const})
    return pairs_in_partition(t, id_col=id_col, group_cols=("__g",),
                              max_bucket=max_bucket)


def _segment_pairs(seg_sizes: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized all-pairs (i < j) WITHIN each segment of a concatenated
    array: returns (row_a, row_b, pair_seg) as indices into the sorted rows.

    Decodes the triangular pair index p -> (i, j) in closed form
    (j = floor((1+sqrt(1+8p))/2), i = p - j(j-1)/2), so generating the pairs
    of thousands of tiny LSH buckets is a handful of numpy ops instead of one
    ``map_groups`` Python call per bucket (the round-1 bottleneck: ~80k
    bucket-groups made minhash_near_dup the slowest battery item)."""
    n_pairs = seg_sizes * (seg_sizes - 1) // 2
    total = int(n_pairs.sum())
    if total == 0:
        z = np.empty(0, np.int64)
        return z, z, z
    seg_starts = np.concatenate(([0], np.cumsum(seg_sizes)[:-1]))
    pair_seg = np.repeat(np.arange(len(seg_sizes), dtype=np.int64), n_pairs)
    p = _within(n_pairs)
    j = ((1.0 + np.sqrt(1.0 + 8.0 * p)) / 2.0).astype(np.int64)
    i = p - j * (j - 1) // 2
    base = seg_starts[pair_seg]
    return base + i, base + j, pair_seg


def pairs_in_partition(t: pa.Table, id_col: str = "doc_id",
                       group_cols: tuple = ("band_id", "band_hash"),
                       max_bucket: int = 200) -> pa.Table:
    """Candidate pairs for EVERY (band_id, band_hash) bucket inside one hash
    partition, fully vectorized. The caller hash-partitions the exploded
    band rows into a bounded number of partitions (one ``map_groups`` call
    each) so pair generation parallelizes without a per-bucket Python call.

    Buckets larger than ``max_bucket`` are truncated to their ``max_bucket``
    smallest ids and flagged ``oversized`` — a giant bucket means a
    degenerate band and quadratic pair-gen must be bounded."""
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "oversized": pa.array([], pa.bool_())})
    if t.num_rows < 2:
        return empty
    ids = t[id_col].to_numpy(zero_copy_only=False)
    keys = [t[c].to_numpy(zero_copy_only=False) for c in group_cols]
    order = np.lexsort((ids,) + tuple(reversed(keys)))
    ids = ids[order]
    keys = [k[order] for k in keys]
    new_seg = np.ones(len(ids), dtype=bool)
    new_seg[1:] = False
    for k in keys:
        new_seg[1:] |= k[1:] != k[:-1]
    # a doc may appear several times in one bucket (duplicate input rows);
    # pairs are over UNIQUE ids per bucket, so drop consecutive dups
    uniq = new_seg.copy()
    uniq[1:] |= ids[1:] != ids[:-1]
    if not uniq.all():
        ids, new_seg = ids[uniq], new_seg[uniq]
    seg_id = np.cumsum(new_seg) - 1
    sizes = np.bincount(seg_id)
    # truncate oversized buckets to their first max_bucket (smallest) ids
    keep = _within(sizes) < max_bucket
    if not keep.all():
        ids = ids[keep]
        seg_id = seg_id[keep]
        clipped = np.minimum(sizes, max_bucket)
    else:
        clipped = sizes
    over = sizes > max_bucket
    ra, rb, pseg = _segment_pairs(clipped)
    if not len(ra):
        return empty
    return pa.table({"id_a": pa.array(ids[ra], pa.int64()),
                     "id_b": pa.array(ids[rb], pa.int64()),
                     "oversized": pa.array(over[pseg])})


def simhash_pairs_in_partition(t: pa.Table, max_bucket: int = 50,
                               max_hamming: int = 8) -> pa.Table:
    """Hamming-verified near-dup pairs for every (band_id, band_key) bucket
    inside one hash partition (the simhash analog of
    :func:`pairs_in_partition`; the fingerprint travels with the row, so
    verification happens inline). Buckets above ``max_bucket`` unique docs
    are skipped entirely (degenerate band)."""
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int64())})
    if t.num_rows < 2:
        return empty
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    sh = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    band = t["band_id"].to_numpy(zero_copy_only=False)
    key = t["band_key"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, key, band))
    ids, sh, band, key = ids[order], sh[order], band[order], key[order]
    new_seg = np.ones(len(ids), dtype=bool)
    new_seg[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
    # unique ids per bucket (first occurrence's fingerprint wins)
    uniq = new_seg.copy()
    uniq[1:] |= ids[1:] != ids[:-1]
    if not uniq.all():
        ids, sh, new_seg = ids[uniq], sh[uniq], new_seg[uniq]
    seg_id = np.cumsum(new_seg) - 1
    sizes = np.bincount(seg_id)
    keep = (sizes >= 2) & (sizes <= max_bucket)
    row_keep = keep[seg_id]
    if not row_keep.all():
        ids, sh, seg_id = ids[row_keep], sh[row_keep], seg_id[row_keep]
        sizes = sizes[keep] if keep.any() else np.empty(0, np.int64)
        if not len(ids):
            return empty
    ra, rb, _ = _segment_pairs(sizes)
    if not len(ra):
        return empty
    d = hamming64(sh[ra], sh[rb]).astype(np.int64)
    ok = d <= max_hamming
    return pa.table({"id_a": pa.array(ids[ra[ok]], pa.int64()),
                     "id_b": pa.array(ids[rb[ok]], pa.int64()),
                     "hamming": pa.array(d[ok])})


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def exact_ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = set(_shingle_hashes(a, k).tolist()), set(_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def load_candidate_texts(path: str, ids) -> pa.Table:
    """Pushdown-read the candidate ids' (doc_id, text) rows. Meant to run as
    ``ray.remote(load_candidate_texts).remote(...)`` so the driver holds only
    an object ref, never the texts."""
    import pyarrow.dataset as pads
    return pads.dataset(path).to_table(
        columns=["doc_id", "text"],
        filter=pads.field("doc_id").isin(list(ids)))


class NgramPairVerifier:
    """map_batches actor stage: exact k-gram Jaccard for candidate pairs.

    The candidate-id texts (output-sized, bounded by the LSH design) are
    resolved once per actor from an object ref; their shingle-hash sets are
    built in ONE vectorized `_batch_rolling_hashes` pass and stored as
    sorted-unique uint64 arrays. Each batch of (id_a, id_b) pairs is then
    verified in ONE segment-sorted merge-count: concatenate every pair's
    two hash sets into a single arena tagged by pair index, lexsort once,
    and count adjacent duplicates per segment — |A ∩ B| is exactly the
    number of values appearing twice within a pair's segment (both inputs
    are unique). No per-pair Python; the only loop gathers array refs."""

    def __init__(self, texts_ref, k: int = 5):
        import ray
        t = ray.get(texts_ref) if isinstance(texts_ref, ray.ObjectRef) else texts_ref
        h, di, n = _batch_rolling_hashes(t["text"], k, _BASE, pad_short=True)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((h, di))
        h, di = h[order], di[order]
        if len(h):
            keep = np.ones(len(h), bool)
            keep[1:] = (h[1:] != h[:-1]) | (di[1:] != di[:-1])
            h, di = h[keep], di[keep]
        counts = np.bincount(di, minlength=n)
        starts = np.concatenate(([0], np.cumsum(counts)))
        self.sets = {int(ids[i]): h[starts[i]:starts[i + 1]] for i in range(n)}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ia = batch["id_a"].to_numpy(zero_copy_only=False)
        ib = batch["id_b"].to_numpy(zero_copy_only=False)
        # fail loud with the offending ids, not an opaque in-actor KeyError:
        # a pair referencing a doc absent from the pushdown-read text table
        # means the documents file changed between the memoized pair build
        # and this verify pass (same style as paginated.py's dead-page check)
        missing = sorted({int(x) for x in np.concatenate([ia, ib])
                          if int(x) not in self.sets})
        if missing:
            raise ValueError(
                f"candidate pairs reference doc_id(s) {missing[:10]} absent "
                "from the candidate text table — the documents file likely "
                "changed between the pair build and the verify pass")
        n = len(ia)
        if n == 0:
            return pa.table({"id_a": batch["id_a"], "id_b": batch["id_b"],
                             "jaccard": pa.array([], pa.float64())})
        arrs = [None] * (2 * n)
        arrs[0::2] = [self.sets[int(x)] for x in ia]
        arrs[1::2] = [self.sets[int(x)] for x in ib]
        la = np.fromiter((len(a) for a in arrs[0::2]), np.int64, n)
        lb = np.fromiter((len(b) for b in arrs[1::2]), np.int64, n)
        sizes = la + lb
        vals = (np.concatenate(arrs) if sizes.sum()
                else np.empty(0, np.uint64))
        seg = np.repeat(np.arange(n, dtype=np.int64), sizes)
        order = np.lexsort((vals, seg))
        v, s = vals[order], seg[order]
        dup = np.zeros(len(v), dtype=bool)
        if len(v) > 1:
            dup[1:] = (v[1:] == v[:-1]) & (s[1:] == s[:-1])
        inter = np.bincount(s[dup], minlength=n)
        union = sizes - inter
        # two empty sets: vacuous Jaccard of 1.0 (both texts shorter than
        # k and identical after padding is impossible here — sets are
        # non-empty for any text; keep the historical convention)
        jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        return pa.table({"id_a": batch["id_a"], "id_b": batch["id_b"],
                         "jaccard": pa.array(jac, pa.float64())})


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit simhash over k-byte shingles; near-dup = small hamming distance.

    The batch path dedups shingles per document (matching ``simhash``'s
    ``np.unique``), then counts each bit's votes with 64 segmented
    ``add.reduceat`` passes over the doc-sorted shingle array — vectorized
    across the whole batch, no per-document Python loop."""

    def __init__(self, k: int = 5, text_col: str = "text"):
        self.k = k
        self.text_col = text_col
        self.bit_masks = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        """Per-document reference path; identical output to ``__call__``."""
        sh = _shingle_hashes(text or "", self.k)
        bits = (sh[:, None] & self.bit_masks[None, :]) != 0  # (S, 64)
        votes = bits.sum(axis=0) * 2 - len(sh)               # +1/-1 vote sums
        return int(self.bit_masks[votes > 0].sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes, doc_idx, n = _batch_shingle_hashes(batch[self.text_col], self.k)
        # per-doc unique shingles: sort by (doc, hash), drop consecutive dups
        order = np.lexsort((hashes, doc_idx))
        h, d = hashes[order], doc_idx[order]
        keep = np.ones(len(h), dtype=bool)
        keep[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
        h, d = h[keep], d[keep]
        counts = np.bincount(d, minlength=n).astype(np.int64)   # unique/doc
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]]) if len(d) else \
            np.empty(0, np.int64)
        present = d[starts] if len(d) else np.empty(0, np.int64)
        out = np.zeros(n, dtype=np.uint64)
        for b in range(64):  # 64 vectorized passes, not N-doc loops
            bit = ((h >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
            votes = np.add.reduceat(bit, starts) if len(starts) else \
                np.empty(0, np.int64)
            hi = 2 * votes > counts[present]
            out[present[hi]] |= self.bit_masks[b]
        return batch.append_column("simhash", pa.array(out))


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


# ---------------------------------------------------------------------------
# at-scale fallbacks: distributed pair dedup + signature re-join
# ---------------------------------------------------------------------------
# The near-dup pipelines normally dedup their cross-band candidate pair set
# and fetch candidate signatures via a driver-sized pandas pass — correct
# while the pair set is "output-sized", but at a web-scale duplicate rate
# the candidate set is O(corpus) and the driver pass becomes an OOM. These
# helpers are the count-triggered fallback: the same semantics as
# drop_duplicates + signature lookup, expressed as ONE hash-partitioned
# shuffle each, no full set on any single node.

_PGOLD = np.uint64(0x9E3779B97F4A7C15)
_PMIX = np.uint64(0xBF58476D1CE4E5B9)


def dedup_pairs_distributed(pairs, num_parts: int | None = None):
    """First-wins dedup of a candidate-pair Dataset on (id_a, id_b): hash-
    partition the pairs (one shuffle of the pair rows only), then one
    vectorized lexsort+run-boundary pass per partition. Every column rides
    along (cross-band duplicates of a pair are verbatim-identical in the
    columns the pipelines keep: hamming/est are functions of the two full
    fingerprints, not the band)."""
    from .partitioning import derived_num_buckets
    nparts = num_parts or derived_num_buckets()

    def part(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((a * _PGOLD) ^ (b * _PMIX)) & np.uint64(nparts - 1)
        return t.append_column("__part", pa.array(h.astype(np.int32)))

    def uniq(g: pa.Table) -> pa.Table:
        a = g["id_a"].to_numpy(zero_copy_only=False)
        b = g["id_b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        first = np.ones(len(order), dtype=bool)
        first[1:] = ((a[order][1:] != a[order][:-1])
                     | (b[order][1:] != b[order][:-1]))
        return g.take(pa.array(order[first])).drop_columns(["__part"])

    return (pairs.map_batches(part, batch_format="pyarrow")
                 .groupby("__part")
                 .map_groups(uniq, batch_format="pyarrow"))


def _mh_matrix(col) -> np.ndarray:
    """(n, num_perm) uint64 matrix from a fixed-length list<uint64> column
    (zero-copy flatten + reshape, no per-row Python)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), np.uint64)
    vals = col.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    return vals.reshape(n, -1)


def attach_signature(pairs, sigs, key: str, out_col: str,
                     num_parts: int | None = None,
                     sig_key: str = "doc_id", sig_col: str = "minhash"):
    """Co-partitioned gather of ``sigs[sig_col]`` onto ``pairs[key]`` — the
    distributed replacement for the driver-side candidate-signature lookup.
    Both sides hash-bucket on the id (one shuffle each), a tagged union
    co-locates them, and each bucket does one vectorized
    argsort+searchsorted gather. Partitioning assumption (standard hash
    join): one bucket's rows from both sides fit a worker."""
    from .partitioning import derived_num_buckets
    nparts = num_parts or derived_num_buckets()
    p_sch = pairs.schema()
    p_fields = [(n, t) for n, t in zip(p_sch.names, p_sch.types)
                if n != "__part"]
    p_names = [n for n, _ in p_fields]
    s_sch = sigs.schema()
    sig_type = dict(zip(s_sch.names, s_sch.types))[sig_col]

    def tag(side: int, id_col: str):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for n, ty in p_fields:
                cols[n] = (t[n] if n in t.column_names
                           else pa.nulls(t.num_rows, ty))
            cols["__sig"] = (t[sig_col] if side == 1
                             else pa.nulls(t.num_rows, sig_type))
            cols["__sid"] = (t[sig_key] if side == 1
                             else pa.nulls(t.num_rows, pa.int64()))
            v = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
            cols["__b"] = pa.array(
                ((v * _PGOLD) & np.uint64(nparts - 1)).astype(np.int32))
            cols["__side"] = pa.array(np.full(t.num_rows, side, np.int8))
            return pa.table(cols)
        return fn

    tagged = pairs.map_batches(tag(0, key), batch_format="pyarrow") \
        .union(sigs.map_batches(tag(1, sig_key), batch_format="pyarrow"))

    def gather(g: pa.Table) -> pa.Table:
        is_p = pc.equal(g["__side"], 0)
        p = g.filter(is_p)
        s = g.filter(pc.invert(is_p))
        if p.num_rows == 0:
            return pa.table(
                {**{n: p[n] for n in p_names},
                 out_col: pa.chunked_array([], type=sig_type)})
        if s.num_rows == 0:
            raise ValueError(
                f"pair ids present with no co-partitioned signature rows "
                f"(bucket of {p.num_rows} pairs) — the signature dataset "
                "must cover every candidate id")
        sid = s["__sid"].to_numpy(zero_copy_only=False)
        order = np.argsort(sid, kind="stable")
        k = p[key].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sid[order], k)
        if (pos >= len(order)).any() or (sid[order][np.minimum(
                pos, len(order) - 1)] != k).any():
            raise ValueError("candidate id missing from signature dataset")
        sig = s["__sig"]
        if isinstance(sig, pa.ChunkedArray):
            sig = sig.combine_chunks()
        return pa.table({**{n: p[n] for n in p_names},
                         out_col: sig.take(pa.array(order[pos]))})

    return tagged.groupby("__b").map_groups(gather, batch_format="pyarrow")
