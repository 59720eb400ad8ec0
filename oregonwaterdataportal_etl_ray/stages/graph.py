"""Distributed connected components over an edge Dataset (dedup clustering).

The canonical consumer is fuzzy deduplication: near-dup candidate pairs
(minhash/simhash/embedding-LSH) form an undirected graph whose connected
components are the duplicate clusters; the corpus keeps one canonical doc
(the min id) per cluster. The reference has no graph operator — this is part
of the beyond-reference LLM-data battery the brief asks for.

Algorithm: iterated per-partition contraction (a practical variant of
alternating star contraction, cf. Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14):

  1. hash-partition the edge list; inside each partition run a LOCAL
     union-find and emit a star ``(x, local_min)`` for every incident node;
  2. group stars by node: a node seen in k partitions has k candidate
     labels — all provably in one component — so emit the mapping
     ``x -> min(labels)`` plus ``(min, other)`` disagreement edges that
     carry cross-partition connectivity into the next round;
  3. compose the accumulated node->representative mapping through this
     round's label map (a bucketed hash join);
  4. recurse on the (dramatically smaller) disagreement edges until none
     remain.

Every partition-local component collapses in one round, so the round count
is O(log) in practice 2-3 — NOT graph-diameter rounds like plain hash-min
label propagation (a 1000-long duplicate chain converges in ~3 rounds, not
1000).

Scale shape (100 TB design):
  - CC runs over the PAIR list, never the corpus: near-dup pair sets are
    output-sized (bounded by the LSH design, orders smaller than the input
    table), so re-shuffling the contracted edge set per round is cheap
    relative to one corpus scan. Nodes incident to no edge are singletons
    and never enter the computation.
  - per round the exchanges move (int64, int64) rows only; round r's edge
    set is bounded by the number of multi-partition nodes of round r-1.
  - within a partition the union-find is a numpy path-halving loop over the
    partition's edges (output-sized); everything else is vectorized
    pandas/numpy. Nothing is gathered to the driver; convergence is a
    distributed ``count()`` on the next round's edge set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from .partitioning import derived_num_buckets

_MAP = 0   # (node, lbl) mapping row
_EDGE = 1  # (node=u, lbl=v) edge row


def _bucket(ids: np.ndarray, num_buckets: int) -> np.ndarray:
    # splitmix-style int mix so adjacent ids spread across buckets
    x = ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(31)
    return (x % np.uint64(num_buckets)).astype(np.int32)


def _union_find_labels(u: np.ndarray, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Local CC over one partition's edges: returns (nodes, min_label) with
    one row per distinct incident node. Path-halving union-find; the loop is
    over the PARTITION's edges (output-sized by construction)."""
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    iu, iv = inv[: len(u)], inv[len(u):]
    parent = np.arange(len(nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(iu.tolist(), iv.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by smaller NODE value so the root is the min id holder
            if nodes[ra] < nodes[rb]:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.array([find(i) for i in range(len(nodes))])
    return nodes, nodes[roots]


def _local_stars(group: pa.Table) -> pa.Table:
    u = group.column("u").to_numpy(zero_copy_only=False)
    v = group.column("v").to_numpy(zero_copy_only=False)
    nodes, lbls = _union_find_labels(u, v)
    return pa.table({"node": nodes, "lbl": lbls})


def _collapse_stars(group: pa.Table) -> pa.Table:
    """Group stars by node: emit the min-label mapping per node plus
    disagreement edges linking that node's other candidate labels."""
    df = group.to_pandas()
    g = df.groupby("node")["lbl"]
    mn = g.min()
    maps = pa.table({"node": mn.index.to_numpy(np.int64),
                     "lbl": mn.to_numpy(np.int64),
                     "kind": np.full(len(mn), _MAP, np.int8)})
    multi = df.merge(mn.rename("mn"), left_on="node", right_index=True)
    dis = multi[multi["lbl"] != multi["mn"]].drop_duplicates(["mn", "lbl"])
    if not len(dis):
        return maps
    edges = pa.table({"node": dis["mn"].to_numpy(np.int64),
                      "lbl": dis["lbl"].to_numpy(np.int64),
                      "kind": np.full(len(dis), _EDGE, np.int8)})
    return pa.concat_tables([maps, edges])


def _compose(group: pa.Table) -> pa.Table:
    """One rep-bucket: rewrite mapping reps through this round's label map.
    Int-preserving: Series.map + fillna would round-trip labels through
    float64 and corrupt ids >= 2^53 (hash-derived 64-bit doc ids are the
    normal case at corpus scale) — remap via searchsorted on int64."""
    df = group.to_pandas()
    lut = df[df["kind"] == _MAP]
    m = df[df["kind"] == _EDGE]  # here _EDGE tags accumulated-mapping rows
    keys = lut["node"].to_numpy(np.int64)
    vals = lut["lbl"].to_numpy(np.int64)
    order = np.argsort(keys, kind="stable")
    keys, vals = keys[order], vals[order]
    lbl = m["lbl"].to_numpy(np.int64)
    pos = np.searchsorted(keys, lbl)
    pos_c = np.minimum(pos, max(len(keys) - 1, 0))
    hit = (len(keys) > 0) & (keys[pos_c] == lbl) if len(keys) else \
        np.zeros(len(lbl), bool)
    new = np.where(hit, vals[pos_c] if len(keys) else 0, lbl)
    return pa.table({"node": m["node"].to_numpy(np.int64),
                     "component": new.astype(np.int64)})


def connected_components(edges: "ray.data.Dataset", src_col: str = "id_a",
                         dst_col: str = "id_b", max_iter: int = 20,
                         num_buckets: int | None = None,
                         local_cap: int = 2_000_000,
                         verbose: bool = False) -> "ray.data.Dataset":
    """Return a Dataset ``(node, component)`` where ``component`` is the
    minimum node id reachable from ``node`` in the undirected graph given by
    ``edges``. Only nodes incident to at least one edge appear (isolated
    nodes are trivially their own component — callers union them in if
    needed). Raises if not converged within ``max_iter`` rounds.

    ``local_cap`` is the per-partition edge budget: each round uses
    ``ceil(|E| / local_cap)`` partitions, so as contraction shrinks the edge
    set the partition count drops and the final rounds collapse whole
    residual graphs inside single union-find tasks (a chain that scattered
    across partitions early finishes in one task once it fits). Dup-graph
    shapes (stars, cliques, short chains) converge in 1-3 rounds; the
    ``max_iter`` guard catches pathological expanders rather than silently
    returning partial components.
    """
    nb = num_buckets or derived_num_buckets()

    def canon(t: pa.Table) -> pa.Table:
        a = t.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
        u, v = np.minimum(a, b), np.maximum(a, b)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({"u": u, "v": v})

    cur = edges.map_batches(canon, batch_format="pyarrow").materialize()

    n_total = cur.count()
    if n_total == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "component": pa.array([], pa.int64())}))
    if n_total <= local_cap:
        # Small-graph fast path — the COMMON dedup case: candidate pair
        # sets are output-sized and usually fit one partition's budget, so
        # one union-find task computes the exact CC directly. Skips the
        # iterated-contraction rounds' per-round shuffle fixed costs (~3
        # exchanges/round) that dominate wall time on tiny graphs; the
        # contraction loop below remains the scale path the cap documents.
        def solve(t: pa.Table) -> pa.Table:
            nodes, lbl = _union_find_labels(
                t.column("u").to_numpy(zero_copy_only=False),
                t.column("v").to_numpy(zero_copy_only=False))
            return pa.table({"node": pa.array(nodes, pa.int64()),
                             "component": pa.array(lbl, pa.int64())})
        return cur.repartition(1).map_batches(solve, batch_size=None,
                                              batch_format="pyarrow")

    def init_mapping(t: pa.Table) -> pa.Table:
        a = t.column("u").to_numpy(zero_copy_only=False)
        b = t.column("v").to_numpy(zero_copy_only=False)
        n = np.unique(np.concatenate([a, b]))
        return pa.table({"node": n, "part": _bucket(n, nb)})

    def uniq_nodes(g: pa.Table) -> pa.Table:
        n = np.unique(g.column("node").to_numpy(zero_copy_only=False))
        return pa.table({"node": n, "component": n})

    # accumulated node -> representative; starts as identity over incident
    # nodes of the CANONICAL edge set (self-loop-only nodes drop with their
    # edges). Block-level unique, then one vectorized unique per bucket —
    # never a per-node group.
    mapping = (cur.map_batches(init_mapping, batch_format="pyarrow")
                    .groupby("part")
                    .map_groups(uniq_nodes, batch_format="pyarrow")
                    .materialize())

    for rnd in range(max_iter):
        n_edges = cur.count()
        if verbose:
            print(f"[connected_components] round {rnd}: {n_edges} edges")
        if n_edges == 0:
            return mapping
        nparts = max(1, min(nb, -(-n_edges // local_cap)))
        stars = (cur.map_batches(
                    lambda t, p=nparts: t.append_column("part", pa.array(_bucket(
                        t.column("u").to_numpy(zero_copy_only=False), p))),
                    batch_format="pyarrow")
                    .groupby("part")
                    .map_groups(_local_stars, batch_format="pyarrow"))
        collapsed = (stars.map_batches(
                        lambda t: t.append_column("part", pa.array(_bucket(
                            t.column("node").to_numpy(zero_copy_only=False), nb))),
                        batch_format="pyarrow")
                          .groupby("part")
                          .map_groups(_collapse_stars, batch_format="pyarrow")
                          .materialize())
        round_map = collapsed.filter(expr=f"kind == {_MAP}")
        next_edges = collapsed.filter(expr=f"kind == {_EDGE}")

        # compose: mapping.component -> round_map[node].lbl where present
        def tag_map(t: pa.Table) -> pa.Table:
            n = t.column("node").to_numpy(zero_copy_only=False)
            return pa.table({"node": n,
                             "lbl": t.column("lbl").to_numpy(zero_copy_only=False),
                             "kind": np.full(len(n), _MAP, np.int8),
                             "part": _bucket(n, nb)})

        def tag_acc(t: pa.Table) -> pa.Table:
            rep = t.column("component").to_numpy(zero_copy_only=False)
            return pa.table({"node": t.column("node").to_numpy(zero_copy_only=False),
                             "lbl": rep,
                             "kind": np.full(len(rep), _EDGE, np.int8),
                             "part": _bucket(rep, nb)})

        mapping = (round_map.map_batches(tag_map, batch_format="pyarrow")
                   .union(mapping.map_batches(tag_acc, batch_format="pyarrow"))
                   .groupby("part")
                   .map_groups(_compose, batch_format="pyarrow")
                   .materialize())
        cur = next_edges.map_batches(
            lambda t: pa.table({"u": t.column("node"), "v": t.column("lbl")}),
            batch_format="pyarrow").materialize()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds")
