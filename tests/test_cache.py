"""Read-through cache fetch stage (T1/S1; reference
userCode/cache.py:30-85 get_or_fetch semantics: hit, miss+store, TTL expiry,
force-fetch bypass, refetch-on-corrupt)."""

import time

import pyarrow as pa

from oregonwaterdataportal_etl_ray.stages.cache import CachedFetchStage, TTLCache


class CountingFetcher:
    def __init__(self, corrupt_keys=()):
        self.calls = []
        self.corrupt = set(corrupt_keys)

    def __call__(self, keys):
        self.calls.append(list(keys))
        return [None if k in self.corrupt else f"payload:{k}".encode()
                for k in keys]


def _batch(keys):
    return pa.table({"url": pa.array(keys)})


def test_cache_hits_and_batched_miss_fetch():
    f = CountingFetcher()
    stage = CachedFetchStage(f, key_col="url")
    out1 = stage(_batch(["a", "b", "a"]))
    assert out1["cache_hit"].to_pylist() == [False, False, False]
    assert f.calls == [["a", "b"]]                 # ONE batched, deduped fetch
    out2 = stage(_batch(["a", "b", "c"]))
    assert out2["cache_hit"].to_pylist() == [True, True, False]
    assert f.calls[-1] == ["c"]
    assert out2["payload"].to_pylist()[0] == b"payload:a"


def test_cache_ttl_expiry_refetches():
    f = CountingFetcher()
    stage = CachedFetchStage(f, key_col="url", ttl_s=0.05)
    stage(_batch(["a"]))
    time.sleep(0.08)
    out = stage(_batch(["a"]))
    assert out["cache_hit"].to_pylist() == [False]
    assert len(f.calls) == 2


def test_force_fetch_bypasses_cache():
    f = CountingFetcher()
    stage = CachedFetchStage(f, key_col="url", force_fetch=True)
    stage(_batch(["a"]))
    stage(_batch(["a"]))
    assert len(f.calls) == 2


def test_corrupt_value_not_cached():
    f = CountingFetcher(corrupt_keys={"bad"})
    stage = CachedFetchStage(f, key_col="url")
    out = stage(_batch(["bad", "ok"]))
    assert out["payload"].to_pylist() == [None, b"payload:ok"]
    out2 = stage(_batch(["bad", "ok"]))            # bad refetched, ok cached
    assert f.calls[-1] == ["bad"]
    assert out2["cache_hit"].to_pylist() == [False, True]


def test_ttl_cache_lru_eviction():
    c = TTLCache(max_entries=2)
    c.put("a", 1), c.put("b", 2), c.put("c", 3)
    assert c.get("a") == (None, False)             # evicted (oldest)
    assert c.get("c") == (3, True)


def test_cached_fetch_in_ray_pipeline(ray_session):
    """The stage drives as a real actor-pool map_batches stage.

    The fetch fn is defined INSIDE the test: a test-module-level class would
    be cloudpickled by reference, and Ray workers cannot import the tests
    package (the actor then dies in __init__ and restarts forever)."""
    import ray

    def fetch(keys):
        return [f"payload:{k}".encode() for k in keys]

    ds = ray.data.from_arrow(pa.table({"url": [f"k{i % 5}" for i in range(50)]}))
    out = ds.map_batches(CachedFetchStage,
                         fn_constructor_kwargs=dict(
                             fetch_fn=fetch, key_col="url"),
                         batch_format="pyarrow", batch_size=10,
                         concurrency=1).to_pandas()
    assert len(out) == 50
    assert out["payload"].notna().all()
    assert out["cache_hit"].sum() > 0              # later batches hit


def test_shared_cache_one_fetch_per_url_across_pool():
    """The reference's process-SHARED cache semantics (T1, Redis
    get_or_fetch): with a SharedCache L2, N pool actors pay ONE upstream
    fetch per URL total — the second actor's cold local cache hits the L2
    instead of refetching. Driven deterministically with two stage
    instances (simulating two pool actors) sharing one cache actor."""
    import ray

    from oregonwaterdataportal_etl_ray.stages.cache import shared_cache

    @ray.remote
    class FetchCounter:
        def __init__(self):
            self.per_key = {}

        def record(self, keys):
            for k in keys:
                self.per_key[k] = self.per_key.get(k, 0) + 1

        def counts(self):
            return self.per_key

    counter = FetchCounter.remote()

    def fetch(keys):
        ray.get(counter.record.remote(list(keys)))
        return [f"payload:{k}".encode() for k in keys]

    l2 = shared_cache()
    actor_a = CachedFetchStage(fetch, key_col="url", shared=l2)
    actor_b = CachedFetchStage(fetch, key_col="url", shared=l2)

    out_a = actor_a(_batch(["u1", "u2"]))
    assert out_a["cache_hit"].to_pylist() == [False, False]
    # the L2 fill is fire-and-forget; barrier on the actor before reading
    ray.get(l2.stats.remote())

    out_b = actor_b(_batch(["u1", "u2", "u3"]))
    # u1/u2 hit via the shared layer despite actor_b's cold local cache
    assert out_b["cache_hit"].to_pylist() == [True, True, False]
    assert out_b["payload"].to_pylist()[0] == b"payload:u1"
    ray.get(l2.stats.remote())
    assert ray.get(counter.counts.remote()) == {"u1": 1, "u2": 1, "u3": 1}

    # L1 promotion: a repeat on actor_b is local (no new fetches)
    out_b2 = actor_b(_batch(["u1", "u3"]))
    assert out_b2["cache_hit"].to_pylist() == [True, True]
    assert ray.get(counter.counts.remote()) == {"u1": 1, "u2": 1, "u3": 1}

    st = ray.get(l2.stats.remote())
    assert st["entries"] == 3 and st["hits"] >= 2


def test_shared_cache_in_ray_pipeline(ray_session):
    """Plumbing: the shared handle pickles into a real map_batches actor
    pool and total upstream fetches stay <= unique keys + the benign
    concurrent-cold-key race (two actors racing one cold key)."""
    import ray

    from oregonwaterdataportal_etl_ray.stages.cache import shared_cache

    @ray.remote
    class FetchCounter:
        def __init__(self):
            self.n = 0

        def record(self, k):
            self.n += k

        def total(self):
            return self.n

    counter = FetchCounter.remote()

    def fetch(keys):
        ray.get(counter.record.remote(len(keys)))
        return [f"p:{k}".encode() for k in keys]

    l2 = shared_cache()
    rows = [{"url": f"u{i % 10}"} for i in range(200)]
    ds = ray.data.from_items(rows).map_batches(
        CachedFetchStage,
        fn_constructor_kwargs=dict(fetch_fn=fetch, key_col="url", shared=l2),
        batch_format="pyarrow", batch_size=25, concurrency=2)
    out = ds.take_all()
    assert len(out) == 200
    assert all(r["payload"] == f"p:{r['url']}".encode() for r in out)
    # 10 unique keys; allow the 2-actor cold race but not per-batch misses
    assert ray.get(counter.total.remote()) <= 20


def test_shared_cache_honors_stage_ttl():
    """An L1-expired key must NOT be re-served stale from a shared L2 that
    was created without its own expiry: the stage passes its ttl_s as the
    L2 freshness bound, so the upstream refetches (the refetch-on-expiry
    contract survives the shared layer)."""
    import ray

    from oregonwaterdataportal_etl_ray.stages.cache import shared_cache

    calls = {"n": 0}

    def fetch(keys):
        calls["n"] += len(keys)
        return [f"v{calls['n']}:{k}".encode() for k in keys]

    l2 = shared_cache()                      # default: no expiry of its own
    stage = CachedFetchStage(fetch, key_col="url", ttl_s=0.05, shared=l2)
    first = stage(_batch(["u"]))["payload"].to_pylist()[0]
    ray.get(l2.stats.remote())               # barrier on the async L2 fill
    time.sleep(0.08)                         # expire the L1 entry
    out = stage(_batch(["u"]))
    assert out["cache_hit"].to_pylist() == [False]   # L2 did NOT serve stale
    assert out["payload"].to_pylist()[0] != first    # genuinely refetched
    assert calls["n"] == 2


def test_l2_promotion_preserves_entry_age():
    """The staleness bound stays ONE ttl across both layers: an L2 hit
    promoted into L1 keeps its ORIGINAL age (a fresh stamp would let the
    value live ~2x ttl: expire in L1, re-fetch from L2, restart the clock)."""
    import ray

    from oregonwaterdataportal_etl_ray.stages.cache import shared_cache

    calls = {"n": 0}

    def fetch(keys):
        calls["n"] += len(keys)
        return [f"v{calls['n']}".encode() for _ in keys]

    l2 = shared_cache()
    stage = CachedFetchStage(fetch, key_col="url", ttl_s=0.3, shared=l2)
    stage(_batch(["u"]))                      # t=0: fetched, both layers
    ray.get(l2.stats.remote())
    time.sleep(0.15)
    del stage.cache._d["u"]                   # force an L1 miss at t=0.15
    out = stage(_batch(["u"]))                # L2 hit, promoted at age 0.15
    assert out["cache_hit"].to_pylist() == [True] and calls["n"] == 1
    time.sleep(0.2)                           # t=0.35 > ttl from ORIGINAL t0
    out2 = stage(_batch(["u"]))
    assert out2["cache_hit"].to_pylist() == [False]   # truly refetched
    assert calls["n"] == 2
