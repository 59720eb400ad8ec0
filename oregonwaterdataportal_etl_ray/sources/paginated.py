"""Live-connector surface: count -> offset pages -> cached fetch -> parse.

This is the documented example the reference's paginated HTTP sources map
onto (ESRI feature pagination, reference userCode/groundwater/wells.py:287-344:
one ``returnCountOnly`` query, then ``resultOffset`` pages each fetched
through ``RedisCache.get_or_fetch``, then a merge of all pages). The
Ray-Data-first shape:

  1. ONE cheap ``count_fn()`` call on the driver (the returnCountOnly query);
  2. ``from_items(page_specs)`` — one row per page, the unit of parallelism;
  3. :class:`..stages.cache.CachedFetchStage` actor pool — per-actor
     read-through TTL cache, misses fetched in one batched call per input
     batch (``fetch_fn(page_keys) -> [payload bytes]`` is the pluggable
     connector: an HTTP client closure in deployment, a fake in tests);
  4. a task-pool parse stage — each page payload (e.g. a JSON feature
     collection) becomes rows of an ordinary Arrow block.

The result is a plain ``ray.data.Dataset`` the rest of the engine consumes
unchanged — e.g. written as an ordered batch-parquet file and replayed
through ``CdcEngine`` (see tests/test_paginated.py for the full drive).

Scale notes: page count derives from the upstream count, so read
parallelism scales with the source, not the cluster; payloads stay inside
tasks (never the driver); a dead page fetch raises inside its task and Ray
retries that task only. ``force_fetch`` mirrors the reference's weekly
cache-bypass refresh."""

from __future__ import annotations

import dataclasses
import json
import time
from collections.abc import Callable

import pyarrow as pa

import ray

from ..stages.cache import CachedFetchStage


@dataclasses.dataclass(frozen=True)
class RetryPolicy:
    """Retry/backoff shape for a live endpoint (the reference retries its
    HTTP reads through Dagster's run-level retries; a Ray pool actor owns
    its own bounded retry loop instead so one flaky page does not fail the
    whole stage). Exponential backoff with a deterministic schedule:
    delay_i = base_delay_s * multiplier**i, capped at max_delay_s."""
    max_attempts: int = 4
    base_delay_s: float = 0.5
    multiplier: float = 2.0
    max_delay_s: float = 30.0
    # exception types that mean "try again" (a real connector lists its
    # client's timeout/5xx classes); anything else propagates immediately
    retry_on: tuple = (ConnectionError, TimeoutError, OSError)

    def delays(self):
        d = self.base_delay_s
        for _ in range(self.max_attempts - 1):
            yield min(d, self.max_delay_s)
            d *= self.multiplier


class RateLimiter:
    """Token-bucket rate limiter (monotonic clock, no threads): at most
    ``rate_per_s`` acquisitions per second with bursts up to ``burst``.
    Lives inside ONE pool actor, so a pool of N actors approaches
    N * rate_per_s aggregate — size the pool to the endpoint's documented
    quota (the reference's AWQMS source is quota-limited the same way)."""

    def __init__(self, rate_per_s: float, burst: int = 1):
        if rate_per_s <= 0:
            raise ValueError("rate_per_s must be > 0")
        self.rate = rate_per_s
        self.capacity = float(max(1, burst))
        self.tokens = self.capacity
        self.t_last = time.monotonic()

    def acquire(self) -> None:
        now = time.monotonic()
        self.tokens = min(self.capacity,
                          self.tokens + (now - self.t_last) * self.rate)
        self.t_last = now
        if self.tokens < 1.0:
            wait = (1.0 - self.tokens) / self.rate
            time.sleep(wait)
            self.tokens = 0.0
            self.t_last = time.monotonic()
        else:
            self.tokens -= 1.0


def retrying_fetch(fetch_one: Callable[[str], bytes | None],
                   policy: RetryPolicy | None = None,
                   rate_per_s: float | None = None,
                   burst: int = 1) -> Callable[[list], list]:
    """The worked live-connector example: wrap a raw single-key fetch (an
    HTTP GET closure in deployment) into the batched, retrying, rate-limited
    ``fetch_fn`` that :class:`..stages.cache.CachedFetchStage` consumes.

    Per key: acquire a rate token, call ``fetch_one``, and on a retryable
    exception back off on the policy's schedule; attempts exhausted ->
    re-raise (the page's task fails loud and Ray retries THAT task). The
    wrapper is constructed lazily per actor (state initialised on first
    call), so each pool actor owns an independent limiter and no
    unpicklable client state crosses the actor boundary."""
    policy = policy or RetryPolicy()
    state: dict = {}

    def fetch_many(keys: list) -> list:
        limiter = state.get("limiter")
        if limiter is None and rate_per_s is not None:
            limiter = state["limiter"] = RateLimiter(rate_per_s, burst)
        out = []
        for k in keys:
            delays = policy.delays()
            while True:
                if limiter is not None:
                    limiter.acquire()
                try:
                    out.append(fetch_one(k))
                    break
                except policy.retry_on as exc:
                    try:
                        delay = next(delays)
                    except StopIteration:
                        raise RuntimeError(
                            f"fetch of {k!r} failed after "
                            f"{policy.max_attempts} attempts") from exc
                    time.sleep(delay)
        return out

    return fetch_many


def build_page_specs(total: int, page_size: int,
                     base_key: str = "") -> list[dict]:
    """One spec per page: offset/limit plus the cache key (the full request
    'URL'). Mirrors the reference's ``required_request_total`` loop."""
    if total < 0 or page_size <= 0:
        raise ValueError("total must be >= 0 and page_size > 0")
    n_pages = (total + page_size - 1) // page_size
    return [{"page_key": f"{base_key}offset={i * page_size}&limit={page_size}",
             "offset": i * page_size,
             "limit": page_size} for i in range(n_pages)]


def parse_json_records_page(payload: bytes,
                            record_path: str = "features") -> pa.Table:
    """Default page parser: a JSON object with a list of records under
    ``record_path`` (the ESRI response shape, minus the attributes nesting
    — pass a custom parser for other layouts)."""
    doc = json.loads(payload)
    records = doc[record_path]
    if not records:
        return pa.table({})
    return pa.Table.from_pylist(records)


def paginated_dataset(count_fn: Callable[[], int],
                      fetch_fn: Callable[[list], list],
                      page_size: int,
                      parse_page: Callable[[bytes], pa.Table] = parse_json_records_page,
                      base_key: str = "",
                      ttl_s: float | None = None,
                      force_fetch: bool = False,
                      concurrency=(1, 4),
                      schema: pa.Schema | None = None,
                      shared=None) -> "ray.data.Dataset":
    """Compose the full connector: count -> pages -> cached fetch -> parse.

    Returns a Dataset of parsed records (page payloads never leave their
    tasks). ``fetch_fn`` receives page-key strings and must return one
    payload (bytes) per key, in order — the CachedFetchStage contract.

    ``shared``: optional :func:`..stages.cache.shared_cache` handle — the
    whole pool then shares one L2, the reference's process-shared Redis
    semantics (one upstream fetch per page across all actors).

    ``schema``: the record schema, used to type a batch whose pages ALL
    parse to zero records (upstream count over-reports, trailing partial
    page). Without it such a batch cannot be typed — a 0-column block would
    silently give the Dataset inconsistent block schemas — so the parse
    task fails loud and asks for it."""
    total = count_fn()
    if total == 0:
        raise ValueError("upstream returned count=0 — nothing to fetch "
                         "(the reference fails loud here too)")
    specs = build_page_specs(total, page_size, base_key)
    pages = ray.data.from_items(specs)

    def parse_batch(batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        dead = [k for k, p in zip(batch["page_key"].to_pylist(), payloads)
                if p is None]
        if dead:
            # fail loud: CachedFetchStage passes a None (absent/corrupt)
            # payload through — silently dropping the page would lose
            # page_size rows with no signal
            raise ValueError(f"{len(dead)} page fetches returned no payload "
                             f"(first: {dead[0]!r})")
        tables = [t for t in map(parse_page, payloads) if t.num_rows]
        if not tables:
            if schema is not None:
                return schema.empty_table()
            raise ValueError(
                "a page batch parsed to zero records and no record schema "
                "was declared — pass schema= to paginated_dataset so empty "
                "batches stay schema-consistent with the rest of the stream")
        out = pa.concat_tables(tables, promote_options="permissive")
        if schema is not None:
            # cast EVERY batch, not just empty ones: per-page inference can
            # drift (an all-null field infers null type, key order varies),
            # and inconsistent block schemas break the Dataset downstream
            out = out.select(schema.names).cast(schema)
        return out

    fetched = pages.map_batches(
        CachedFetchStage,
        fn_constructor_kwargs=dict(fetch_fn=fetch_fn, key_col="page_key",
                                   ttl_s=ttl_s, force_fetch=force_fetch,
                                   shared=shared),
        batch_format="pyarrow", concurrency=concurrency)
    return fetched.map_batches(parse_batch, batch_format="pyarrow")
