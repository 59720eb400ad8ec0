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

For pools where keys are NOT co-partitioned, a ``SharedCache`` actor gives
the reference's process-SHARED semantics: each pool actor keeps its local
TTL cache as an L1 and consults the shared actor as an L2 before fetching,
then populates both. One upstream fetch per URL across the whole pool (two
actors racing the same cold key may both fetch — the same benign race a
Redis GET/SET read-through has). Lookups and fills are batched per
map_batches call, so the actor round-trip amortizes over the batch, and
values move through the object store, not the driver."""

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

    def get(self, key, max_age_s: float | None = None):
        """``max_age_s``: caller-scoped freshness bound, applied on top of
        the cache's own ttl_s (the effective limit is the stricter of the
        two) — lets one shared cache serve stages with different TTLs
        without the cache's default becoming the weakest link."""
        item = self._d.get(key)
        if item is None:
            return None, False
        ts, val = item
        limits = [t for t in (self.ttl_s, max_age_s) if t is not None]
        if limits and time.monotonic() - ts > min(limits):
            del self._d[key]
            return None, False
        self._d.move_to_end(key)
        return val, True

    def put(self, key, val, age_s: float = 0.0) -> None:
        """``age_s``: back-date the entry (an L2 hit promoted into L1 keeps
        its ORIGINAL age, or the stage's staleness bound would double to
        ~2x ttl: expire in L1 at t=ttl-eps, re-fetch from L2, re-stamp)."""
        self._d[key] = (time.monotonic() - age_s, val)
        self._d.move_to_end(key)
        while len(self._d) > self.max_entries:
            self._d.popitem(last=False)


class _SharedCacheImpl:
    """The shared L2 cache actor body (plain class; wrapped by ray.remote in
    :func:`shared_cache` so tests can also drive it in-process)."""

    def __init__(self, ttl_s: float | None = None, max_entries: int = 1_000_000):
        self.cache = TTLCache(ttl_s, max_entries)
        self.hits = 0
        self.misses = 0

    def get_many(self, keys: list, max_age_s: float | None = None) -> list:
        """``max_age_s``: the CALLING stage's ttl_s — enforced here per
        lookup so an L2 created with the default (no expiry) can never
        serve a stage entries older than that stage's own TTL (otherwise an
        L1-expired key would be re-served stale from the shared layer and
        re-promoted with a fresh TTL, unboundedly)."""
        now = time.monotonic()
        out = []
        for k in keys:
            v, ok = self.cache.get(k, max_age_s=max_age_s)
            if ok:
                age = now - self.cache._d[k][0]
                out.append((v, age))
                self.hits += 1
            else:
                out.append(None)
                self.misses += 1
        return out

    def put_many(self, keys: list, vals: list) -> None:
        for k, v in zip(keys, vals):
            if v is not None:               # corrupt/absent: never cached
                self.cache.put(k, v)

    def stats(self) -> dict:
        return {"hits": self.hits, "misses": self.misses,
                "entries": len(self.cache._d)}


def shared_cache(ttl_s: float | None = None, max_entries: int = 1_000_000,
                 **actor_opts):
    """Start the shared L2 cache actor (one per pipeline; pass its handle to
    every :class:`CachedFetchStage` in the pool). ``num_cpus=0`` by default
    so the cache never competes with pool actors for scheduling slots."""
    import ray
    opts = {"num_cpus": 0, **actor_opts}
    return ray.remote(_SharedCacheImpl).options(**opts).remote(
        ttl_s=ttl_s, max_entries=max_entries)


class CachedFetchStage:
    """map_batches actor stage: key column -> payload column through a
    per-actor read-through TTL cache.

    ``fetch_fn(keys: list) -> list`` is called ONCE per batch with only the
    missing keys (batched fetch — the reference fetches one URL at a time;
    at engine scale the upstream call must amortize). ``force_fetch``
    bypasses the cache for every key (reference parity). A fetched value of
    ``None`` is treated as corrupt/absent and is NOT cached, so the next
    access refetches (the reference's refetch-on-corrupt path).

    ``shared``: optional handle from :func:`shared_cache` — consulted as an
    L2 for keys missing from the local cache (ONE batched ``get_many`` per
    map_batches call) and populated with upstream fetches, so N pool actors
    share hits instead of paying N misses per URL."""

    def __init__(self, fetch_fn: Callable[[Sequence], list], key_col: str,
                 out_col: str = "payload", ttl_s: float | None = None,
                 force_fetch: bool = False, max_entries: int = 100_000,
                 out_type: pa.DataType = pa.large_binary(),
                 shared=None):
        self.fetch_fn = fetch_fn
        self.key_col = key_col
        self.out_col = out_col
        self.force_fetch = force_fetch
        self.cache = TTLCache(ttl_s, max_entries)
        self.out_type = out_type
        self.shared = shared

    def _shared_get(self, keys: list) -> list:
        import ray
        # pass OUR ttl as the freshness bound: the shared layer must never
        # serve this stage an entry older than the stage's own TTL
        return ray.get(self.shared.get_many.remote(
            keys, max_age_s=self.cache.ttl_s))

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
        if missing_idx and self.shared is not None and not self.force_fetch:
            # L2: one batched round-trip for the deduped local misses
            need = list(dict.fromkeys(keys[i] for i in missing_idx))
            l2 = dict(zip(need, self._shared_get(need)))
            still: list[int] = []
            for i in missing_idx:
                got = l2.get(keys[i])
                if got is not None:
                    v, age = got
                    vals[i], hit[i] = v, True
                    # promote into L1 at its ORIGINAL age, so the stage's
                    # ttl_s stays the total staleness bound (a fresh stamp
                    # would let the value live ~2x ttl across the layers)
                    self.cache.put(keys[i], v, age_s=age)
                else:
                    still.append(i)
            missing_idx = still
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
            if self.shared is not None:
                ok_keys = [k for k in need if fetched.get(k) is not None]
                if ok_keys:
                    # fire-and-forget fill; a racing reader just refetches
                    self.shared.put_many.remote(
                        ok_keys, [fetched[k] for k in ok_keys])
        out = batch.append_column(self.out_col, pa.array(vals, self.out_type))
        return out.append_column("cache_hit", pa.array(hit))
