"""Read-through cache fetch stage (T1/S1).

The reference front-loads every upstream HTTP read through a Redis
read-through cache with TTL, force-fetch override, and refetch-on-corrupt
(``RedisCache.get_or_fetch``, /root/reference/userCode/cache.py:30-85). The
Ray-native equivalent is an ACTOR-POOL ``map_batches`` stage: each actor
holds its own in-memory TTL cache (built once in ``__init__``, the
build-state-once pattern), misses are fetched in one BATCHED call, and the
stage emits a ``cache_hit`` column for observability.

Scale notes (100 TB): per-actor caches shard naturally with the pool; if the
upstream keys were bucket-shuffled first (e.g. the engine's key hash), each
key re-visits the same actor and the hit rate approaches a shared cache's
without any cross-node coordination. The fetch function is pluggable — a
real deployment passes an HTTP/S3 client closure; tests pass a counting
fake. This is the extension point a live connector plugs into; everything
else in the engine consumes the resulting Dataset unchanged.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from collections.abc import Callable, Sequence

import numpy as np
import pyarrow as pa


class TTLCache:
    """Tiny in-process TTL + LRU cache (monotonic clock; no background
    threads — expiry is checked on access, like Redis' lazy expiry)."""

    def __init__(self, ttl_s: float | None = None, max_entries: int = 100_000):
        self.ttl_s = ttl_s
        self.max_entries = max_entries
        self._d: OrderedDict[object, tuple[float, object]] = OrderedDict()

    def get(self, key):
        item = self._d.get(key)
        if item is None:
            return None, False
        ts, val = item
        if self.ttl_s is not None and time.monotonic() - ts > self.ttl_s:
            del self._d[key]
            return None, False
        self._d.move_to_end(key)
        return val, True

    def put(self, key, val) -> None:
        self._d[key] = (time.monotonic(), val)
        self._d.move_to_end(key)
        while len(self._d) > self.max_entries:
            self._d.popitem(last=False)


class CachedFetchStage:
    """map_batches actor stage: key column -> payload column through a
    per-actor read-through TTL cache.

    ``fetch_fn(keys: list) -> list`` is called ONCE per batch with only the
    missing keys (batched fetch — the reference fetches one URL at a time;
    at engine scale the upstream call must amortize). ``force_fetch``
    bypasses the cache for every key (reference parity). A fetched value of
    ``None`` is treated as corrupt/absent and is NOT cached, so the next
    access refetches (the reference's refetch-on-corrupt path)."""

    def __init__(self, fetch_fn: Callable[[Sequence], list], key_col: str,
                 out_col: str = "payload", ttl_s: float | None = None,
                 force_fetch: bool = False, max_entries: int = 100_000,
                 out_type: pa.DataType = pa.large_binary()):
        self.fetch_fn = fetch_fn
        self.key_col = key_col
        self.out_col = out_col
        self.force_fetch = force_fetch
        self.cache = TTLCache(ttl_s, max_entries)
        self.out_type = out_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_pylist()
        vals: list = [None] * len(keys)
        hit = np.zeros(len(keys), dtype=bool)
        missing_idx: list[int] = []
        if self.force_fetch:
            missing_idx = list(range(len(keys)))
        else:
            for i, k in enumerate(keys):
                v, ok = self.cache.get(k)
                if ok:
                    vals[i], hit[i] = v, True
                else:
                    missing_idx.append(i)
        if missing_idx:
            # one batched fetch for all misses, deduped by key
            need = list(dict.fromkeys(keys[i] for i in missing_idx))
            got = self.fetch_fn(need)
            if len(got) != len(need):
                raise ValueError(
                    f"fetch_fn returned {len(got)} values for {len(need)} keys"
                    " — the contract is one value per key (None = absent)")
            fetched = dict(zip(need, got))
            for i in missing_idx:
                v = fetched.get(keys[i])
                vals[i] = v
                if v is not None:           # corrupt/absent: never cached
                    self.cache.put(keys[i], v)
        out = batch.append_column(self.out_col, pa.array(vals, self.out_type))
        return out.append_column("cache_hit", pa.array(hit))
