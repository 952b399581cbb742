"""Web-fetch source plumbing (reference S6 analog, round 4).

The reference fetches search-result URLs over HTTP and caches parsed
pages in a keyed JSON store (``utils/databases/json_dir.py:18-138``,
``search_engine.py:186-190``).  This module reproduces every part of
that pipeline EXCEPT the network socket — transport is pluggable, and
the built-in :class:`LocalStoreTransport` serves bytes from a local
content directory (the "web" is a spooled page store), with a
deterministic transient-failure rule so the retry path is exercised and
oracle-mirrorable.  The Ray-side shape is the real one:

- fetching is an ACTOR-POOL ``map_batches`` stage — per-actor state
  (transport session, token-bucket rate limiter, cache handle) built
  once in ``__init__``;
- a per-url on-disk cache makes re-runs incremental (cache hits skip
  the transport entirely — the JSONDir resume contract);
- failures retry with bounded attempts and land as ``status='error'``
  rows, never exceptions (the extraction error-row convention).

At 100 TB the same stage fans out across the cluster with the cache on
shared storage; rate limiting is per-actor, so aggregate politeness =
rate x concurrency, sized by the caller.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pyarrow as pa


def url_key(url: str) -> str:
    """Stable file key for a url (sha256 prefix — no path/quoting issues)."""
    return hashlib.sha256(url.encode("utf-8")).hexdigest()[:24]


def spool_store(pages: "pa.Table", store_dir: str) -> int:
    """Write (url, html) rows into a content store — the fixture's 'web'.
    Idempotent: content-addressed by url key."""
    os.makedirs(store_dir, exist_ok=True)
    n = 0
    for url, html in zip(
        pages.column("url").to_pylist(), pages.column("html").to_pylist()
    ):
        path = os.path.join(store_dir, url_key(url) + ".html")
        if not os.path.exists(path):
            tmp = "{}.{}.tmp".format(path, os.getpid())  # per-writer tmp:
            with open(tmp, "wb") as f:  # concurrent spoolers never share it
                f.write(html)
            os.replace(tmp, path)
        n += 1
    return n


class LocalStoreTransport:
    """Deterministic transport: GET = read the store file.  Urls whose
    ``fail_mod``-th doc hash matches fail on the FIRST attempt (a
    simulated transient 5xx) so retry logic runs on a known subset."""

    def __init__(self, store_dir: str, *, fail_mod: int = 7):
        self.store_dir = store_dir
        self.fail_mod = fail_mod

    def should_fail_first(self, url: str) -> bool:
        tail = url.rsplit("/", 1)[-1]
        return tail.isdigit() and int(tail) % self.fail_mod == 0

    def get(self, url: str, attempt: int) -> bytes:
        if attempt == 1 and self.should_fail_first(url):
            raise ConnectionError("simulated transient failure: " + url)
        path = os.path.join(self.store_dir, url_key(url) + ".html")
        with open(path, "rb") as f:
            return f.read()


class UrllibTransport:
    """Real HTTP transport behind the same ``get(url, attempt)`` interface
    as :class:`LocalStoreTransport` — stdlib ``urllib`` with a browser-ish
    User-Agent (the reference fetches with a UA-headed ``urlopen``).

    DEFAULT-OFF in this sandbox: there is no network here, so nothing
    constructs it by default; off-sandbox users pass
    ``transport=UrllibTransport()`` to :class:`Fetcher`.  Politeness
    (token bucket) and retry budgets stay in the Fetcher — the transport
    only moves bytes."""

    def __init__(self, *, timeout: float = 10.0, user_agent: str | None = None):
        self.timeout = timeout
        self.user_agent = user_agent or "Mozilla/5.0 (compatible; ocr-ray/1.0)"

    def get(self, url: str, attempt: int) -> bytes:
        from urllib.request import Request, urlopen

        req = Request(url, headers={"User-Agent": self.user_agent})
        with urlopen(req, timeout=self.timeout) as resp:  # nosec: caller-supplied url
            return resp.read()


class TokenBucket:
    """Per-actor politeness limiter: ``rate`` requests/sec sustained,
    ``burst`` immediate.  rate=None disables (test/bench mode)."""

    def __init__(self, rate: float | None, burst: int = 8):
        self.rate, self.burst = rate, burst
        self.tokens = float(burst)
        self.last = time.monotonic()

    def acquire(self) -> None:
        if self.rate is None:
            return
        while True:
            now = time.monotonic()
            self.tokens = min(self.burst, self.tokens + (now - self.last) * self.rate)
            self.last = now
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return
            time.sleep((1.0 - self.tokens) / self.rate)


class Fetcher:
    """Actor-pool fetch stage: urls batch -> (url, html, n_attempts,
    status) with per-url disk cache and bounded retries."""

    def __init__(
        self,
        store_dir: str,
        cache_dir: str,
        *,
        rate: float | None = None,
        max_attempts: int = 3,
        transport=None,
    ):
        # pluggable transport: LocalStoreTransport by default (sandbox);
        # pass UrllibTransport() for the real network path off-sandbox
        self.transport = transport or LocalStoreTransport(store_dir)
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)
        self.limiter = TokenBucket(rate)
        self.max_attempts = max_attempts

    def _cache_path(self, url: str) -> str:
        return os.path.join(self.cache_dir, url_key(url) + ".json")

    def _fetch_one(self, url: str) -> dict:
        cpath = self._cache_path(url)
        if os.path.exists(cpath):
            with open(cpath) as f:
                rec = json.load(f)
            rec["html"] = bytes.fromhex(rec["html"])
            return rec
        err = ""
        for attempt in range(1, self.max_attempts + 1):
            self.limiter.acquire()
            try:
                html = self.transport.get(url, attempt)
                rec = {"html": html, "n_attempts": attempt, "status": "ok"}
                tmp = "{}.{}.tmp".format(cpath, os.getpid())
                with open(tmp, "w") as f:
                    json.dump(
                        {**rec, "html": html.hex()}, f
                    )
                os.replace(tmp, cpath)
                return rec
            except (ConnectionError, OSError) as exc:
                err = "{}: {}".format(type(exc).__name__, exc)
        return {"html": b"", "n_attempts": self.max_attempts, "status": err}

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        recs = [self._fetch_one(u) for u in urls]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array([r["html"] for r in recs], pa.binary()),
                "n_attempts": pa.array(
                    [r["n_attempts"] for r in recs], pa.int64()
                ),
                "status": pa.array(
                    ["ok" if r["status"] == "ok" else "error" for r in recs],
                    pa.string(),
                ),
            }
        )


def fetch_pages(
    urls_ds,
    store_dir: str,
    cache_dir: str,
    *,
    concurrency: int = 4,
    batch_size: int = 64,
    rate: float | None = None,
):
    """urls Dataset (column ``url``) -> fetched (url, html, n_attempts,
    status) via the actor pool."""
    return urls_ds.map_batches(
        Fetcher,
        fn_constructor_args=(store_dir, cache_dir),
        fn_constructor_kwargs={"rate": rate},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
