"""Mergeable quantile sketch (merging t-digest) — the at-scale reducer for
grouped percentiles.

Exact percentiles shuffle every row of a group to one task; the sketch path
computes bounded-size partial digests inside ``map_batches`` (the combiner)
and merges digests in a tiny ``groupby`` — the shuffle moves centroids, not
rows. Digest size is O(compression), independent of group size.

Design: the *merging* t-digest (Dunning & Ertl, "Computing Extremely Accurate
Quantiles Using t-Digests", arXiv:1902.04023 — public paper): centroids
sorted by mean; a pass merges adjacent centroids while the cluster's
cumulative-weight span stays within the k1 scale-function bound, which keeps
clusters small near q=0/1 (accurate tails) and large near the median.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _compress(means: np.ndarray, weights: np.ndarray,
              compression: float) -> tuple[np.ndarray, np.ndarray]:
    """One merging pass: greedy left-to-right under the k1 size bound."""
    if len(means) == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()
    out_m: list[float] = []
    out_w: list[float] = []
    # k1 scale: cluster may span until its q-width exceeds 4*sin step; use the
    # standard bound max_w(q) = 4*total*q*(1-q)/compression at cluster center
    cur_m, cur_w, cum = means[0], weights[0], 0.0
    for m, w in zip(means[1:], weights[1:]):
        q = (cum + cur_w / 2) / total
        limit = 4.0 * total * q * (1.0 - q) / compression
        if cur_w + w <= max(limit, 1.0):
            cur_m += (m - cur_m) * (w / (cur_w + w))
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cum += cur_w
            cur_m, cur_w = m, w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


class TDigest:
    def __init__(self, compression: float = 200.0,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None):
        self.compression = compression
        self.means = means if means is not None else np.empty(0)
        self.weights = weights if weights is not None else np.empty(0)

    def add(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        # vectorized pre-clustering: the raw values NEVER pass through the
        # scalar _compress loop (that would be one Python iteration per input
        # row in the hot combiner). Sort and cut into ~2*compression
        # equal-weight clusters via reduceat; the bounded centroid list then
        # goes through the scalar k1 merge.
        v.sort(kind="stable")
        k = min(len(v), max(1, int(2 * self.compression)))
        bounds = np.linspace(0, len(v), k + 1).astype(np.int64)
        starts = np.unique(bounds[:-1])
        counts = np.diff(np.r_[starts, len(v)]).astype(np.float64)
        sums = np.add.reduceat(v, starts)
        m = np.concatenate([self.means, sums / counts])
        w = np.concatenate([self.weights, counts])
        self.means, self.weights = _compress(m, w, self.compression)
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        m = np.concatenate([self.means, other.means])
        w = np.concatenate([self.weights, other.weights])
        self.means, self.weights = _compress(m, w, self.compression)
        return self

    def quantile(self, q: float) -> float:
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        w = self.weights
        total = w.sum()
        # centroid centers at cumulative midpoints
        centers = np.cumsum(w) - w / 2
        target = q * total
        return float(np.interp(target, centers, self.means))


def _group_codes(col) -> tuple[np.ndarray, "pa.Array"]:
    """(sortable int codes per row, original values) for a group-key column.
    np.argsort on an object array containing None raises TypeError; encode
    through Arrow instead so NULL is an ordinary group (SQL GROUP BY
    semantics), preserving original values (incl. null) for output."""
    import pyarrow.compute as pc
    c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    enc = pc.dictionary_encode(c)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    idx = enc.indices
    if idx.null_count:
        idx = pc.fill_null(idx, len(enc.dictionary))
    return idx.to_numpy(zero_copy_only=False).astype(np.int64), c


def digest_rows(t: pa.Table, group_col: str, value_col: str,
                compression: float = 200.0) -> pa.Table:
    """map_batches combiner: one serialized digest row per group per batch."""
    if not t.num_rows:
        # same hazard the hll_rows guard documents: np.r_[True, ...] on an
        # empty batch yields starts=[0] and the loop would index ks[0]
        return pa.table({group_col: pa.array([], t[group_col].type),
                         "d_means": pa.array([], pa.list_(pa.float64())),
                         "d_weights": pa.array([], pa.list_(pa.float64()))})
    codes, kvals = _group_codes(t[group_col])
    vals = t[value_col].to_numpy(zero_copy_only=False)
    order = np.argsort(codes, kind="stable")
    ks, vs = codes[order], vals[order]
    starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    ends = np.r_[starts[1:], len(ks)]
    rows_m, rows_w = [], []
    for s, e in zip(starts, ends):
        d = TDigest(compression).add(vs[s:e])
        rows_m.append(d.means.tolist())
        rows_w.append(d.weights.tolist())
    return pa.table({
        group_col: kvals.take(pa.array(order[starts])),
        "d_means": pa.array(rows_m, pa.list_(pa.float64())),
        "d_weights": pa.array(rows_w, pa.list_(pa.float64())),
    })


def merge_digest_group(g: pa.Table, group_col: str, quantiles: list[float],
                       compression: float = 200.0) -> pa.Table:
    """map_groups reducer: merge one group's partial digests, emit quantiles."""
    d = TDigest(compression)
    for m, w in zip(g["d_means"].to_pylist(), g["d_weights"].to_pylist()):
        d.merge(TDigest(compression, np.asarray(m), np.asarray(w)))
    out = {group_col: [g[group_col][0].as_py()]}
    for q in quantiles:
        out[f"p{round(q * 100)}"] = pa.array([d.quantile(q)], pa.float64())
    return pa.table(out)


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet, Meunier,
# "HyperLogLog: the analysis of a near-optimal cardinality estimation
# algorithm", AofA 2007 — public paper). Same at-scale shape as the t-digest:
# exact count(DISTINCT) shuffles every key; the sketch computes fixed-size
# (2^p byte) register partials inside map_batches and merges them with
# element-wise max in a tiny groupby — the shuffle moves registers, never
# keys. Standard error ~= 1.04 / sqrt(2^p) (p=12 -> ~1.6%).
# ---------------------------------------------------------------------------

HLL_P = 12


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized bit length of uint64 via frexp (exponent of the float64
    mantissa). Rounding can only mis-report values within 2^-53 relative of a
    power of two — deterministic for a fixed input set and far inside the
    sketch's error budget."""
    _, e = np.frexp(w.astype(np.float64))
    return e.astype(np.int64)


def hll_add(regs: np.ndarray, hashed: np.ndarray, p: int = HLL_P) -> None:
    """Fold a batch of 64-bit hashes into a 2^p uint8 register array."""
    idx = (hashed >> np.uint64(64 - p)).astype(np.int64)
    w = (hashed << np.uint64(p)).astype(np.uint64)
    # rho = #leading zeros of the remaining 64-p bits + 1; w == 0 (all-zero
    # suffix) gets the max rank 64 - p + 1
    rho = np.where(w == 0, 64 - p + 1, np.int64(64) - _bit_length_u64(w) + 1)
    np.maximum.at(regs, idx, rho.astype(np.uint8))


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected harmonic-mean estimate with the small-range
    linear-counting correction from the paper."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_rows(t: pa.Table, group_col: str, key_col: str,
             p: int = HLL_P) -> pa.Table:
    """map_batches combiner: one 2^p-byte register blob per group per batch."""
    import pandas as pd
    import pyarrow.compute as pc
    if t.num_rows == 0:
        # typed empty partial: a zero-row block (empty file / empty shuffle
        # partition) must not infer a null group column or index into ks[0]
        return pa.table({group_col: t[group_col].combine_chunks(),
                         "hll_regs": pa.array([], pa.binary())})
    # SQL COUNT(DISTINCT key) EXCLUDES null keys: drop them before hashing
    # (pd.util.hash_array would hash None to one deterministic value and
    # count it as a distinct member — off-by-one vs the oracle)
    if t[key_col].null_count:
        t = t.filter(pc.is_valid(t[key_col]))
        if t.num_rows == 0:
            return pa.table({group_col: t[group_col].combine_chunks(),
                             "hll_regs": pa.array([], pa.binary())})
    codes, kvals = _group_codes(t[group_col])
    hashed = pd.util.hash_array(t[key_col].to_numpy(zero_copy_only=False))
    order = np.argsort(codes, kind="stable")
    ks, hs = codes[order], hashed[order]
    starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    ends = np.r_[starts[1:], len(ks)]
    rows_r = []
    for s, e in zip(starts, ends):
        regs = np.zeros(1 << p, np.uint8)
        hll_add(regs, hs[s:e], p)
        rows_r.append(regs.tobytes())
    return pa.table({group_col: kvals.take(pa.array(order[starts])),
                     "hll_regs": pa.array(rows_r, pa.binary())})


def merge_hll_group(g: pa.Table, group_col: str, out_col: str,
                    p: int = HLL_P) -> pa.Table:
    """map_groups reducer: element-wise max over one group's register blobs."""
    regs = np.zeros(1 << p, np.uint8)
    for blob in g["hll_regs"].to_pylist():
        regs = np.maximum(regs, np.frombuffer(blob, np.uint8))
    return pa.table({group_col: [g[group_col][0].as_py()],
                     out_col: pa.array([int(round(hll_estimate(regs)))],
                                       pa.int64())})


# ---------------------------------------------------------------------------
# Misra-Gries heavy-hitter summary (Misra & Gries, "Finding repeated
# elements", Sci. Comput. Program. 1982; merge bound from Agarwal, Cormode,
# Huang, Phillips, Wei, Yi, "Mergeable Summaries", PODS 2012 — public
# papers). At-scale shape: each block is summarized to AT MOST k (token,
# lower-bound count) rows inside map_batches, so the shuffle moves <= k rows
# per block regardless of block vocabulary; summing lower bounds per token
# across blocks keeps the global undercount <= n_total / k (errors add,
# one n_b/k term per block).
# ---------------------------------------------------------------------------


def mg_trim(tokens: np.ndarray, counts: np.ndarray, k: int
            ) -> tuple[np.ndarray, np.ndarray]:
    """Reduce an exact (token, count) frequency table to a <= k-entry
    Misra-Gries summary: subtract the (k+1)-th largest count from every
    counter and keep the strictly positive ones. The subtracted value is at
    most n_block / k, which bounds each surviving counter's undercount."""
    if len(tokens) <= k:
        return tokens, counts
    kth = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    kept = counts > kth
    return tokens[kept], counts[kept] - kth


def mg_token_partial(t: pa.Table, text_col: str, k: int) -> pa.Table:
    """map_batches combiner: whitespace-tokenize the batch, count exactly
    (pa value_counts — an exact table is a zero-error MG summary), then trim
    to <= k entries so the partial's size is fixed no matter the batch."""
    import pyarrow.compute as pc
    # combine_chunks (not pa.chunked_array([...])) keeps the string type on a
    # zero-row batch — wrapping a 0-chunk ChunkedArray degrades to null type
    # and split_pattern_regex has no null kernel
    from .text import TRIM_CHARS
    trimmed = pc.utf8_trim(t[text_col].combine_chunks(), TRIM_CHARS)
    toks = pc.split_pattern_regex(
        trimmed.filter(pc.not_equal(trimmed, "")), r"\s+")
    vc = pc.list_flatten(toks).value_counts()
    tokens = vc.field("values").to_numpy(zero_copy_only=False)
    counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
    tokens, counts = mg_trim(tokens, counts, k)
    return pa.table({"token": pa.array(tokens, pa.string()),
                     "n_lower": pa.array(counts, pa.int64())})
