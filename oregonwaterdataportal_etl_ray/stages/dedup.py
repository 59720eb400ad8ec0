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


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit rolling hashes of all k-byte shingles (uint64)."""
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    if len(b) < k:
        return np.array([hash(text) & 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    base = np.uint64(1099511628211)
    acc = np.zeros(len(b) - k + 1, dtype=np.uint64)
    for i in range(k):
        acc = acc * base + b[i:len(b) - k + 1 + i].astype(np.uint64)
    return np.unique(acc)


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
        sh = _shingle_hashes(text or "", self.k)  # (S,) unique uint64
        mixed = sh * self.mix_a + self.mix_b      # decorrelate bin vs value
        bins = (mixed >> self.shift).astype(np.int64)
        sig = np.full(self.num_perm, np.uint64(0xFFFFFFFFFFFFFFFF))
        np.minimum.at(sig, bins, mixed)
        empty = sig == np.uint64(0xFFFFFFFFFFFFFFFF)
        if empty.any():
            if empty.all():
                return np.zeros(self.num_perm, dtype=np.uint64)
            # rotation densification: borrow the nearest filled bin to the
            # left (circular), offset-mixed so borrowed values differ per bin
            idx = np.arange(self.num_perm)
            filled_idx = np.where(empty, -1, idx)
            src = np.maximum.accumulate(filled_idx)
            wrap = src < 0  # empties before the first filled bin wrap around
            if wrap.any():
                last = np.maximum.accumulate(
                    np.concatenate([filled_idx, filled_idx]))[self.num_perm:]
                src = np.where(wrap, last, src)
            borrowed = sig[src] + (idx - src).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            sig = np.where(empty, borrowed, sig)
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(s) for s in batch[self.text_col].to_pylist()]
        arr = pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64()))
        return batch.append_column("minhash", arr)


class BandExploder:
    """minhash signature -> (band_id, band_hash) rows for LSH bucketing.

    Emits num_bands rows per doc: the shuffle payload for the groupby."""

    def __init__(self, num_bands: int = 16, id_col: str = "doc_id"):
        self.num_bands = num_bands
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = np.asarray(batch["minhash"].to_pylist(), dtype=np.uint64)  # (N, P)
        n, p = sigs.shape
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
    """All id pairs inside one (band_id, band_hash) bucket (candidate dups).

    Buckets larger than ``max_bucket`` are truncated (logged via the
    oversized flag) — at web scale a giant bucket means a degenerate band
    (e.g. empty docs) and quadratic pair-gen must be bounded."""
    ids = np.unique(group[id_col].to_numpy(zero_copy_only=False))
    if len(ids) < 2:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "oversized": pa.array([], pa.bool_())})
    over = len(ids) > max_bucket
    if over:
        ids = ids[:max_bucket]
    i, j = np.triu_indices(len(ids), k=1)
    return pa.table({"id_a": pa.array(ids[i], pa.int64()),
                     "id_b": pa.array(ids[j], pa.int64()),
                     "oversized": pa.array(np.full(len(i), over))})


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def exact_ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = set(_shingle_hashes(a, k).tolist()), set(_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit simhash over k-byte shingles; near-dup = small hamming distance."""

    def __init__(self, k: int = 5, text_col: str = "text"):
        self.k = k
        self.text_col = text_col
        self.bit_masks = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        sh = _shingle_hashes(text or "", self.k)
        bits = (sh[:, None] & self.bit_masks[None, :]) != 0  # (S, 64)
        votes = bits.sum(axis=0) * 2 - len(sh)               # +1/-1 vote sums
        return int(self.bit_masks[votes > 0].sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = [self.simhash(s) for s in batch[self.text_col].to_pylist()]
        return batch.append_column("simhash", pa.array(np.array(vals, dtype=np.uint64)))


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
