"""Text-analysis stages for large-scale training-data pipelines.

All pure-Arrow / numpy vectorized map_batches functions over the
``documents`` table (doc_id, text, lang, source, n_chars). Regexes that need
compiling live in class ``__init__`` (once per actor), mirroring the
reference's build-state-once pattern (/root/reference/userCode/ontology.py:331-382).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.kernels import md5_hex

# ---------------------------------------------------------------------------
# token counting / char classes — SQL-parity kernels (see oracle_sql)
# ---------------------------------------------------------------------------

# the explicit ASCII whitespace set both sides of the oracle gate trim:
# Arrow's utf8_trim_whitespace strips UNICODE whitespace (NBSP, U+0085...)
# that DuckDB's trim() never touches — parity needs one explicit set,
# mirrored in the SQL as trim(text, ' '||chr(9)||...)
TRIM_CHARS = " \t\n\r\x0c\x0b"


def token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count; empty/whitespace-only text counts 0."""
    trimmed = pc.utf8_trim(batch[text_col], TRIM_CHARS)
    n = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
    n = pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int32()), n)
    return batch.append_column("n_tokens", pc.cast(n, pa.int64()))


def char_classes(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Counts of alpha / digit / whitespace codepoints (quality-score inputs)."""
    t = batch[text_col]
    out = batch
    out = out.append_column("n_alpha", pc.cast(pc.count_substring_regex(t, "[A-Za-z]"), pa.int64()))
    out = out.append_column("n_digit", pc.cast(pc.count_substring_regex(t, "[0-9]"), pa.int64()))
    out = out.append_column("n_space", pc.cast(pc.count_substring_regex(t, r"\s"), pa.int64()))
    return out


def normalized_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Document fingerprint: md5 of whitespace-collapsed lowercased text."""
    norm = pc.utf8_lower(pc.replace_substring_regex(batch[text_col], r"\s+", " "))
    return batch.append_column("fingerprint", md5_hex(norm))


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

class QualityScore:
    """Heuristic document quality: length band + alpha ratio + stopword ratio.

    Integer component columns are emitted alongside the float score so the
    exact parts are oracle-checkable."""

    STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.stop_re = r"(?i)\b(?:" + "|".join(self.STOPWORDS) + r")\b"

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch[self.text_col]
        n_chars = pc.cast(pc.utf8_length(t), pa.int64())
        n_alpha = pc.cast(pc.count_substring_regex(t, "[A-Za-z]"), pa.int64())
        n_stop = pc.cast(pc.count_substring_regex(t, self.stop_re), pa.int64())
        nc = n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
        na = n_alpha.to_numpy(zero_copy_only=False).astype(np.float64)
        ns = n_stop.to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            alpha_ratio = np.where(nc > 0, na / nc, 0.0)
            stop_per_100 = np.where(nc > 0, 100.0 * ns / nc, 0.0)
        len_score = np.clip(nc / 1000.0, 0.0, 1.0)
        score = 0.4 * len_score + 0.4 * alpha_ratio + 0.2 * np.clip(stop_per_100 / 3.0, 0, 1)
        # round half-away-from-zero (= SQL ROUND), not np.round's half-even —
        # the oracle replicates this formula in DuckDB digit for digit
        r6 = lambda x: np.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731 (x >= 0 here)
        # NULL text must propagate as typed NULLs (SQL NULL arithmetic), not
        # as a non-null NaN score / 0.0 ratio — NaN orders and compares
        # differently from NULL and would silently break oracle parity
        valid = (~np.asarray(pc.is_null(t).combine_chunks()
                             if isinstance(t, pa.ChunkedArray)
                             else pc.is_null(t)))
        out = batch.append_column("n_stopwords", n_stop)
        out = out.append_column(
            "alpha_ratio", pa.array(r6(alpha_ratio), mask=~valid))
        out = out.append_column(
            "quality_score", pa.array(r6(score), mask=~valid))
        return out


# ---------------------------------------------------------------------------
# language ID (character n-gram heuristic — no external models available)
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": ("the ", " and ", " of ", " is ", " that "),
    "de": (" der ", " und ", " die ", " ist ", " nicht "),
    "fr": (" le ", " la ", " et ", " les ", " est "),
    "es": (" el ", " de ", " que ", " los ", " es "),
}


class LangId:
    """Marker-n-gram language scorer: argmax of per-language marker hits.

    Deterministic heuristic (ties -> 'en' by fixed language order); a real
    deployment would swap in fasttext inside the same actor shape."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.langs = list(_LANG_MARKERS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # null text scores 0 everywhere -> "unknown" (count_substring of a
        # null row is null; the float NaN it becomes would crash the int
        # accumulate below)
        t = pc.utf8_lower(pc.fill_null(batch[self.text_col], ""))
        scores = np.zeros((batch.num_rows, len(self.langs)), dtype=np.int64)
        for j, lang in enumerate(self.langs):
            for marker in _LANG_MARKERS[lang]:
                scores[:, j] += pc.count_substring(t, marker).to_numpy(zero_copy_only=False)
        pred = np.asarray(self.langs, dtype=object)[np.argmax(scores, axis=1)]
        pred = np.where(scores.max(axis=1) == 0, "unknown", pred)
        out = batch.append_column("lang_pred", pa.array(pred, pa.string()))
        return out.append_column("lang_score", pa.array(scores.max(axis=1)))


# ---------------------------------------------------------------------------
# rolling-hash shingle fingerprints (winnowing-style, for near-dup / plagiarism)
# ---------------------------------------------------------------------------

class RollingFingerprints:
    """k-gram rolling hashes + window minima (winnowing, Schleimer/Wilkerson/
    Aiken SIGMOD 2003). Emits one row per document with a sorted-unique
    list<uint64> fingerprint column. The batch path runs ONE rolling-hash
    pass over the batch's concatenated bytes and one sliding-window min with
    document-boundary masking — no per-document Python loop."""

    _BASE = np.uint64(1000003)

    def __init__(self, k: int = 8, window: int = 4, text_col: str = "text"):
        self.k = k
        self.window = window
        self.text_col = text_col

    def _fingerprint(self, s: str) -> list[int]:
        """Per-document reference path (tests); identical to ``__call__``."""
        k, w = self.k, self.window
        b = np.frombuffer(s.encode("utf-8", "ignore"), dtype=np.uint8)
        if len(b) < k:
            return []
        acc = np.zeros(len(b) - k + 1, dtype=np.uint64)
        for i in range(k):  # k is small (8): k vectorized passes, not a row loop
            acc = acc * self._BASE + b[i:len(b) - k + 1 + i].astype(np.uint64)
        h = acc
        if len(h) <= w:
            return [int(h.min())]
        mins = np.lib.stride_tricks.sliding_window_view(h, w).min(axis=1)
        return np.unique(mins).tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .dedup import _batch_rolling_hashes

        col = batch[self.text_col]
        # pad_short=False: winnowing emits NOTHING for docs shorter than k
        hashes, doc_idx, n = _batch_rolling_hashes(col, self.k, self._BASE,
                                                   pad_short=False)
        w = self.window
        out_vals: np.ndarray
        out_docs: np.ndarray
        if len(hashes) == 0:
            out_vals = np.empty(0, np.uint64)
            out_docs = np.empty(0, np.int64)
        else:
            counts = np.bincount(doc_idx, minlength=n)
            if len(hashes) >= w:
                sw = np.lib.stride_tricks.sliding_window_view(hashes, w).min(axis=1)
                valid = doc_idx[:len(sw)] == doc_idx[w - 1:]
                out_vals, out_docs = sw[valid], doc_idx[:len(sw)][valid]
            else:
                out_vals = np.empty(0, np.uint64)
                out_docs = np.empty(0, np.int64)
            # docs with 1..w positions contribute their global min instead
            small = (counts > 0) & (counts <= w)
            if small.any():
                mins = np.full(n, np.uint64(0xFFFFFFFFFFFFFFFF))
                np.minimum.at(mins, doc_idx, hashes)
                out_vals = np.concatenate([out_vals, mins[small]])
                out_docs = np.concatenate([out_docs, np.flatnonzero(small)])
        # sorted-unique per doc
        order = np.lexsort((out_vals, out_docs))
        v, d = out_vals[order], out_docs[order]
        keep = np.ones(len(v), dtype=bool)
        keep[1:] = (d[1:] != d[:-1]) | (v[1:] != v[:-1])
        v, d = v[keep], d[keep]
        per_doc = np.bincount(d, minlength=n) if len(d) else np.zeros(n, np.int64)
        offsets = np.concatenate(([0], np.cumsum(per_doc))).astype(np.int64)
        arr = pa.LargeListArray.from_arrays(pa.array(offsets),
                                            pa.array(v, pa.uint64()))
        return batch.append_column("fingerprints",
                                   arr.cast(pa.list_(pa.uint64())))


# ---------------------------------------------------------------------------
# token n-grams — benchmark decontamination kernel
# ---------------------------------------------------------------------------

def token_ngrams(col: "pa.ChunkedArray | pa.Array", n: int = 3
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized token n-grams over a string column: lowercase, trim, split
    on whitespace, join each run of ``n`` consecutive tokens with a single
    space. Returns ``(doc_idx, grams)`` — the row index each gram came from
    and the gram strings. Rows with fewer than ``n`` tokens (or blank text)
    emit nothing. Exactly mirrors the SQL
    ``array_to_string(t[i:i+n-1], ' ')`` oracle so contamination checks are
    hash-comparable.

    Used by the decontamination pipeline (cf. the training-set n-gram overlap
    filters described publicly in the GPT-3 and PaLM papers): the benchmark
    side is eval-suite-sized, so its gram set broadcasts; the training side
    streams through this kernel batch by batch and never shuffles."""
    row_map, flat, parents, starts = _tokenize_with_parents(col, n)
    if not len(starts):
        return np.empty(0, np.int64), np.empty(0, object)
    flat = flat.to_numpy(zero_copy_only=False)            # object array
    s = pd.Series(flat[starts], copy=False)
    for j in range(1, n):
        s = s + " " + pd.Series(flat[starts + j], copy=False)
    return row_map[parents[starts]], s.to_numpy()


def _tokenize_with_parents(col, n: int):
    """The ONE tokenize preamble both n-gram kernels share (lowercase, trim
    with TRIM_CHARS, whitespace split, per-token parent row, gram starts
    where all n tokens share a row). token_ngrams and token_ngram_hashes
    must stay hash-equal == string-equal — a drift between two copies of
    this step would silently break the decontamination oracle parity, so
    there are no copies. Returns (row_map, flat_tokens(Arrow), parents,
    gram_starts); gram_starts is empty when nothing qualifies."""
    trimmed = pc.utf8_trim(pc.utf8_lower(col), TRIM_CHARS)
    mask = pc.not_equal(trimmed, "")
    toks = pc.split_pattern_regex(trimmed.filter(mask) if hasattr(trimmed, "filter")
                                  else pc.filter(trimmed, mask), r"\s+")
    row_map = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()                                 # stays Arrow
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    if len(flat) < n:
        return row_map, flat, parents, np.empty(0, np.int64)
    # gram start positions where all n tokens share a parent row
    valid = parents[: len(parents) - n + 1] == parents[n - 1:]
    return row_map, flat, parents, np.flatnonzero(valid)


_GRAM_COMBINE = np.uint64(0x100000001B3)     # FNV-1a 64 prime (public)


def token_ngram_hashes(col: "pa.ChunkedArray | pa.Array", n: int = 3
                       ) -> tuple[np.ndarray, np.ndarray]:
    """``token_ngrams`` without ever materializing gram STRINGS: token
    hashes come from the vectorized polynomial hash over the Arrow token
    buffer (cdc.merge._poly_hash_strings — zero Python objects), and each
    gram's 64-bit fingerprint combines its n token hashes with a wraparound
    polynomial. Hash-equal == string-equal up to 64-bit collisions
    (birthday-bounded — the same accepted class as hot_ngram_flags'
    fingerprints; use ``token_ngrams`` when the actual strings must travel).
    Token boundaries are unambiguous by construction: distinct token
    sequences give distinct hash sequences, so no separator is needed.
    Tokenization is byte-for-byte token_ngrams' (the shared
    :func:`_tokenize_with_parents` preamble — a single definition, so the
    two kernels cannot drift apart and break the decontamination oracle's
    hash-equal == string-equal contract)."""
    from ..cdc.merge import _poly_hash_strings
    row_map, flat, parents, starts = _tokenize_with_parents(col, n)
    if not len(starts):
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    h = _poly_hash_strings(flat)
    g = h[starts].copy()
    for j in range(1, n):
        g *= _GRAM_COMBINE
        g += h[starts + j]
    return row_map[parents[starts]], g


# ---------------------------------------------------------------------------
# byte-bigram language model — perplexity quality filter
# ---------------------------------------------------------------------------

def byte_bigram_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """map_batches combiner for LM TRAINING: exact byte-bigram counts of one
    block as a sparse (gram, n) table. The gram id is ``b0*256 + b1`` —
    computed for every document in one vectorized pass (the shared
    rolling-hash kernel with base 256 IS the bigram id for k=2), so the
    shuffle that follows moves <= 65,536 rows per block, never the text.
    Used by the lm_perplexity pipeline (byte-LM perplexity filtering per the
    public CCNet / Gopher quality-filter descriptions)."""
    from .dedup import _batch_rolling_hashes
    ids, _, _ = _batch_rolling_hashes(batch[text_col], 2, np.uint64(256),
                                      pad_short=False)
    counts = np.bincount(ids.astype(np.int64), minlength=65536)
    gram = np.flatnonzero(counts)
    return pa.table({"gram": pa.array(gram.astype(np.int64), pa.int64()),
                     "n": pa.array(counts[gram], pa.int64())})


class BigramLmScorer:
    """Stateful map_batches stage: mean byte-bigram negative log-likelihood
    (bits per bigram) of each document under a broadcast count table —
    the train-once / broadcast / batch-score shape of an LM-based quality
    filter. ``counts_ref`` is the ObjectRef of a dense int64[65536] vector
    (built by ONE Ray task from the aggregated sparse counts — the driver
    never holds it); add-alpha smoothing keeps unseen bigrams finite.

    The per-document mean is one np.bincount(doc_idx, weights=logp) over the
    batch's concatenated bytes — no per-document Python loop. Documents with
    no bigram (len < 2 bytes) emit nothing."""

    def __init__(self, counts_ref, alpha: float = 0.5,
                 text_col: str = "text"):
        import ray
        counts = ray.get(counts_ref).astype(np.float64).reshape(256, 256)
        row = counts.sum(axis=1, keepdims=True)
        with np.errstate(divide="ignore"):
            self.nll_bits = -np.log2(
                (counts + alpha) / (row + alpha * 256)).ravel()
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .dedup import _batch_rolling_hashes
        ids, doc_idx, n = _batch_rolling_hashes(
            batch[self.text_col], 2, np.uint64(256), pad_short=False)
        per_doc = np.bincount(doc_idx, weights=self.nll_bits[ids.astype(np.int64)],
                              minlength=n)
        counts = np.bincount(doc_idx, minlength=n)
        keep = counts > 0
        bits = per_doc[keep] / counts[keep]
        out = batch.filter(pa.array(keep)).select(["doc_id"])
        # half-away rounding, stable across summation orders at 1e-6
        return out.append_column("nll_bits", pa.array(
            np.floor(bits * 1e6 + 0.5) / 1e6, pa.float64()))


class CompressionRatio:
    """zlib-compressibility quality signal (the publicly described
    Gopher/RefinedWeb-class heuristic: boilerplate and machine-generated
    repetition compress far better than natural prose, and near-random or
    binary-ish text barely compresses at all — both tails are junk
    candidates). Emits (doc_id, n_bytes, n_compressed, compression_ratio)
    with ratio = compressed/raw bytes, half-away-rounded to 6 digits.

    map_batches actor stage. The per-row ``zlib.compress`` call is the same
    unavoidable per-payload Python loop as the digest kernels — it
    compresses zero-copy memoryview slices of the column's utf-8 buffer
    (no per-row str materialization); ``level=1`` keeps it fast and the
    ranking is insensitive to the level."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 level: int = 1):
        self.text_col = text_col
        self.id_col = id_col
        self.level = level

    def __call__(self, t: pa.Table) -> pa.Table:
        import zlib

        from ..functions.kernels import payload_views, round_half_away
        off, data, valid = payload_views(t[self.text_col])
        if off is None:
            return pa.table({
                self.id_col: pa.array([], t[self.id_col].type),
                "n_bytes": pa.array([], pa.int64()),
                "n_compressed": pa.array([], pa.int64()),
                "compression_ratio": pa.array([], pa.float64())})
        n = len(off) - 1
        lvl = self.level
        # null text stays NULL in every feature column — an empty-payload
        # stand-in would score ratio 8.0 (zlib header overhead) and
        # misclassify null docs as incompressible junk
        if valid is not None:
            comp = np.array([len(zlib.compress(data[off[i]:off[i + 1]], lvl))
                             if valid[i] else -1 for i in range(n)], np.int64)
        else:
            comp = np.fromiter(
                (len(zlib.compress(data[off[i]:off[i + 1]], lvl))
                 for i in range(n)), dtype=np.int64, count=n)
        raw = (off[1:] - off[:-1]).astype(np.int64)
        with np.errstate(invalid="ignore"):
            ratio = round_half_away(comp / np.maximum(raw, 1), 6)
        mask = None if valid is None else ~valid
        return pa.table({
            self.id_col: t[self.id_col],
            "n_bytes": pa.array(np.ma.masked_array(raw, mask) if mask is not None else raw, pa.int64()),
            "n_compressed": pa.array(np.ma.masked_array(comp, mask) if mask is not None else comp, pa.int64()),
            "compression_ratio": pa.array(np.ma.masked_array(ratio, mask) if mask is not None else ratio, pa.float64())})
