"""Cluster-derived partitioning knobs.

Round 1 hardcoded several parallelism constants (32 window buckets, 8 join
partitions) that would cap a real cluster: a bucket is the unit of
parallelism AND the amount of data one ``map_groups`` task materializes, so
at 100 TB a fixed 32 means 1/32 of the dataset per task and at most 32-way
parallelism. Everything now derives from ``ray.cluster_resources()`` — on a
multi-node cluster the CPU total is the cluster's, so bucket counts grow
with nodes exactly as they should.
"""

from __future__ import annotations

import ray


def cluster_cpus(default: int = 4) -> int:
    try:
        return max(1, int(ray.cluster_resources().get("CPU", default)))
    except Exception:  # Ray not initialised (pure-driver unit tests)
        return default


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def derived_num_buckets(cpus: int | None = None, per_cpu: int = 2,
                        floor: int = 32, cap: int = 65536) -> int:
    """Bucket count for hash-bucketed groupby shuffles (windows, keep-last,
    LSH pair partitions): a power of two (so integer keys can bucket with a
    bit-mask) of at least ``per_cpu`` buckets per cluster CPU — stragglers
    even out, no task materializes more than ~1/buckets of the data, and
    parallelism is never capped below the cluster width."""
    cpus = cluster_cpus() if cpus is None else cpus
    n = _next_pow2(max(floor, per_cpu * cpus))
    # honor the cap AFTER the pow2 round-up (and keep the result a power of
    # two — callers bucket with `& (n-1)`): halve until within the cap
    while n > cap and n > 1:
        n >>= 1
    return n


def derived_join_partitions(cpus: int | None = None,
                            floor: int = 8, cap: int = 4096) -> int:
    """Hash-join partition count for ``Dataset.join``.

    Each join materializes ``num_partitions`` long-lived aggregator ACTORS,
    so a chained two-join pipeline holds 2x this many actors concurrently —
    sizing it at cpus/4 leaves half the cluster for the read/map tasks
    feeding the joins (measured: 2 chained joins at num_partitions == CPUs
    on a 32-CPU node run 2x slower than cpus/4, and at 2x CPUs they
    oversubscribe into a stall). Grows linearly with the cluster, so a
    256-node cluster gets 256-way join parallelism, not a hardcoded 8."""
    cpus = cluster_cpus() if cpus is None else cpus
    return min(cap, max(floor, cpus // 4))
