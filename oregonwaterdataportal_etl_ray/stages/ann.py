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
    """list<float> column -> (N, D) float32 matrix (zero-ish copy)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float32, copy=False)
    n = len(arr)
    return flat.reshape(n, -1)


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

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch[self.vec_col])          # (N, D)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = self.qnorm @ mn.T                  # (Q, N)
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


def final_topk(group, k: int = 5):
    """map_groups reducer: global top-k per query from the partial top-ks.
    Deterministic tie-break: (-sim, neighbor_id)."""
    import pandas as pd  # noqa: F401
    g = group.sort_values(["cosine_sim", "neighbor_id"], ascending=[False, True]).head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g


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
        m = _matrix(batch[self.vec_col])
        bits = (m @ self.planes) > 0
        bucket = (bits.astype(np.uint64) * self.weights[None, :]).sum(axis=1)
        return batch.append_column("lsh_bucket", pa.array(bucket.astype(np.int64)))
