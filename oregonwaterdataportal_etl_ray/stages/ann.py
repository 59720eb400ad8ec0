"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once via
``ray.put`` (one copy per node) and every map_batches task does one float32
matmul per batch. Scale path: LSH random-hyperplane bucketing so only
same-bucket candidates are scored (the shuffle moves (bucket, id) pairs, not
vectors)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _matrix(col) -> np.ndarray:
    """list<float> column -> (N, D) float32 matrix (zero-ish copy).

    Empty-safe: reshape(0, -1) is ambiguous to numpy (raises), and empty
    blocks DO occur (empty fragments, fully-filtered blocks), so derive the
    width from the list type's declared element count or return (0, 0)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float32, copy=False)
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), np.float32)
    return flat.reshape(n, -1)


@ray.remote
def load_embedding_dict(path: str, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> dict:
    """Load {ids, matrix} INSIDE a Ray task so the broadcast side lands in
    the object store directly — the driver never materializes the table.
    Downstream stages take the returned ObjectRef and ray.get it once per
    actor (zero-copy from the local plasma store)."""
    import pyarrow.parquet as pq
    t = pq.read_table(path, columns=[id_col, vec_col])
    return {"ids": t[id_col].to_numpy(zero_copy_only=False),
            "matrix": _matrix(t[vec_col])}


def read_query_vectors(path: str, predicate, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> pa.Table:
    """Row-group-pruned driver read of a SMALL query set (predicate pushed
    into the Parquet scan — never a full-table read)."""
    import pyarrow.dataset as pads
    return pads.dataset(path, format="parquet").to_table(
        columns=[id_col, vec_col], filter=predicate)


class BruteForceTopK:
    """map_batches actor stage: per-batch partial top-k against broadcast queries.

    Emits per (query, candidate-batch) partial top-k rows; a final small
    groupby(query).map_groups keeps the global top-k. The heavy matmul is
    distributed; the reduce handles only k*num_blocks rows."""

    def __init__(self, queries_ref, k: int = 5, id_col: str = "vec_id",
                 vec_col: str = "embedding", exclude_self: bool = True):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = q["ids"]                      # (Q,)
        qm = q["matrix"].astype(np.float32)       # (Q, D)
        self.qnorm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        self.exclude_self = exclude_self

    @staticmethod
    def _empty() -> pa.Table:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "cosine_sim": pa.array([], pa.float64())})

    def _partial_topk(self, sims: np.ndarray, ids: np.ndarray) -> pa.Table:
        """Shared masked-scores -> partial-top-k tail (exclude-self, k clamp,
        argpartition, finite filter) — one definition for the brute-force
        and IVF variants so tie/clamp/filter fixes can't diverge."""
        if self.exclude_self:
            sims[self.qids[:, None] == ids[None, :]] = -np.inf
        k = min(self.k, sims.shape[1])
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows_q = np.repeat(self.qids, k)
        rows_id = ids[part.reshape(-1)]
        rows_sim = np.take_along_axis(sims, part, axis=1).reshape(-1)
        keep = np.isfinite(rows_sim)
        return pa.table({
            "query_id": pa.array(rows_q[keep]),
            "neighbor_id": pa.array(rows_id[keep]),
            "cosine_sim": pa.array(rows_sim[keep].astype(np.float64)),
        })

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch[self.vec_col])          # (N, D)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:       # (0, 0) matrix can't matmul against (Q, D)
            return self._empty()
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = self.qnorm @ mn.T                  # (Q, N)
        return self._partial_topk(sims, ids)


def final_topk(group, k: int = 5):
    """map_groups reducer: global top-k per query from the partial top-ks.
    Deterministic tie-break: (-sim, neighbor_id)."""
    import pandas as pd  # noqa: F401
    g = group.sort_values(["cosine_sim", "neighbor_id"], ascending=[False, True]).head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g


class EmbedNearDup:
    """Embedding-cosine near-duplicate pairs (dedup family, SURVEY.md §2.8).

    The full normalized matrix is broadcast once (``ray.put``); each
    map_batches task emits pairs (id_a < id_b) whose cosine >= tau for ITS
    rows only — the N x N work is row-partitioned across the cluster, the
    reference side is read zero-copy from the object store. Scale path: for
    corpora whose matrix exceeds node RAM, bucket with HyperplaneLSH first
    and compare within buckets only."""

    def __init__(self, all_ref, tau: float = 0.4, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        a = ray.get(all_ref) if isinstance(all_ref, ray.ObjectRef) else all_ref
        self.all_ids = a["ids"]
        am = a["matrix"].astype(np.float64)
        self.all_norm = am / np.maximum(np.linalg.norm(am, axis=1, keepdims=True), 1e-30)
        self.tau = tau
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch[self.vec_col]).astype(np.float64)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:       # (0, 0) matrix can't matmul the broadcast side
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = mn @ self.all_norm.T               # (n_batch, N_all)
        hit = (sims >= self.tau) & (ids[:, None] < self.all_ids[None, :])
        r, c = np.nonzero(hit)
        return pa.table({
            "id_a": pa.array(ids[r], pa.int64()),
            "id_b": pa.array(self.all_ids[c], pa.int64()),
        })


class IVFIndex:
    """IVF (inverted-file) coarse quantizer for the ANN scale path.

    Centroids are trained once on the driver (a few Lloyd iterations over a
    deterministic sample) and broadcast; ``assign`` is a map_batches stage
    adding the nearest-centroid cell id; a query probes only its ``n_probe``
    closest cells, so the per-query candidate set shrinks by ~K/n_probe.
    Partitioning assumption: search co-locates rows by cell (filter or
    groupby on ``ivf_cell``)."""

    def __init__(self, sample: np.ndarray, n_cells: int = 16, iters: int = 4,
                 seed: int = 7):
        rng = np.random.default_rng(seed)
        x = sample.astype(np.float64)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        cent = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
        for _ in range(iters):
            assign = np.argmax(x @ cent.T, axis=1)
            for c in range(len(cent)):
                sel = x[assign == c]
                if len(sel):
                    v = sel.mean(axis=0)
                    cent[c] = v / max(np.linalg.norm(v), 1e-30)
        self.centroids = cent                     # (K, D), unit norm

    def cell_of(self, m: np.ndarray) -> np.ndarray:
        mn = m.astype(np.float64)
        mn = mn / np.maximum(np.linalg.norm(mn, axis=1, keepdims=True), 1e-30)
        return np.argmax(mn @ self.centroids.T, axis=1).astype(np.int32)

    def probe(self, q: np.ndarray, n_probe: int) -> np.ndarray:
        qn = q.astype(np.float64)
        qn = qn / np.maximum(np.linalg.norm(qn, axis=1, keepdims=True), 1e-30)
        sims = qn @ self.centroids.T
        return np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)


class IVFAssign:
    """map_batches stage: append the IVF cell id (broadcast centroids)."""

    def __init__(self, index_ref, vec_col: str = "embedding"):
        idx = ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        self.index = idx
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # (0, 0) matrix can't matmul the centroids
            return batch.append_column("ivf_cell",
                                       pa.array([], pa.int32()))
        cells = self.index.cell_of(_matrix(batch[self.vec_col]))
        return batch.append_column("ivf_cell", pa.array(cells))


class IVFTopK(BruteForceTopK):
    """Per-batch partial top-k that scores ONLY rows in each query's probed
    cells (requires ``ivf_cell`` from IVFAssign)."""

    def __init__(self, queries_ref, probes_ref, k: int = 5, **kw):
        super().__init__(queries_ref, k=k, **kw)
        p = ray.get(probes_ref) if isinstance(probes_ref, ray.ObjectRef) else probes_ref
        self.probes = p                           # (Q, n_probe) cell ids

    def __call__(self, batch: pa.Table) -> pa.Table:
        cells = batch["ivf_cell"].to_numpy(zero_copy_only=False)
        m = _matrix(batch[self.vec_col])
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return self._empty()
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = self.qnorm @ mn.T                  # (Q, N)
        probed = (cells[None, :, None] == self.probes[:, None, :]).any(axis=2)
        sims[~probed] = -np.inf
        return self._partial_topk(sims, ids)


class HyperplaneLSH:
    """Random-hyperplane LSH bucketing: vec -> int64 bucket of sign bits.

    Same fixed seed on every actor -> consistent buckets cluster-wide. ANN
    then only scores same-bucket (or few-probe) candidates."""

    def __init__(self, dim: int, n_planes: int = 16, seed: int = 99,
                 vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes)).astype(np.float32)
        self.weights = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # (0, 0) matrix can't matmul the planes
            return batch.append_column("lsh_bucket",
                                       pa.array([], pa.int64()))
        m = _matrix(batch[self.vec_col])
        bits = (m @ self.planes) > 0
        bucket = (bits.astype(np.uint64) * self.weights[None, :]).sum(axis=1)
        return batch.append_column("lsh_bucket", pa.array(bucket.astype(np.int64)))


class LSHBands:
    """Multi-table (banded) random-hyperplane LSH explode: each vector emits
    ``n_tables`` rows of (id, table_id, bucket), where bucket packs the sign
    bits of that table's ``planes_per_table`` hyperplanes.

    This is the 100 TB path for embedding near-dup at HIGH similarity
    thresholds: collision probability per table is p^b with
    p = 1 - theta/pi (Charikar, STOC 2002), so recall = 1 - (1 - p^b)^L.
    Defaults (b=8, L=12) give ~0.94 recall at cosine 0.85 while cutting the
    pair scan to same-bucket candidates. The shuffle moves only
    (id, table, bucket) triples — never the vectors; candidate vectors are
    re-fetched by id with predicate pushdown for exact verification.
    Fixed seed => identical buckets on every actor of every node."""

    def __init__(self, n_tables: int = 12, planes_per_table: int = 8,
                 seed: int = 42, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        self.n_tables = n_tables
        self.b = planes_per_table
        self.seed = seed
        self.id_col = id_col
        self.vec_col = vec_col
        self.planes: np.ndarray | None = None   # built on first batch (dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch[self.vec_col])
        if m.shape[0] == 0:
            # do NOT build (0, L*b) planes off an empty first batch — they
            # would be cached and crash every later non-empty batch's matmul
            return pa.table({
                self.id_col: pa.array([], batch[self.id_col].type),
                "table_id": pa.array([], pa.int32()),
                "bucket": pa.array([], pa.int64())})
        if self.planes is None:
            rng = np.random.default_rng(self.seed)
            self.planes = rng.standard_normal(
                (m.shape[1], self.n_tables * self.b)).astype(np.float32)
        bits = (m @ self.planes) > 0                    # (N, L*b)
        n = len(bits)
        w = (np.uint64(1) << np.arange(self.b, dtype=np.uint64))
        buckets = (bits.reshape(n, self.n_tables, self.b).astype(np.uint64)
                   * w[None, None, :]).sum(axis=2)      # (N, L)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            self.id_col: pa.array(np.repeat(ids, self.n_tables)),
            "table_id": pa.array(np.tile(np.arange(self.n_tables, dtype=np.int32), n)),
            "bucket": pa.array(buckets.reshape(-1).astype(np.int64)),
        })
