"""Live-HTTP fetch and expansion stages (opt-in ``CrawlConfig.fetch_mode=
'live'``; the offline fixture store stays the test/bench default).

Reference semantics honored:
- ``bolts/FetcherBolt.java:83-95``: pooled keep-alive HTTP client
  (``PoolingHttpClientConnectionManager`` maxTotal=24, maxPerRoute=10),
  30 s socket/connect timeouts, User-Agent set; the per-route connection
  cap doubles as a politeness mechanism (state/politeness.py carries the
  budget side).
- ``bolts/webpages/URLExpansionBolt.java:30,110-134``: ≤ 4 redirect hops,
  2 s timeout per hop, Location-header walk WITHOUT auto-redirect; more
  hops → expansion failure.
- ``bolts/FetcherBolt.java:194,214-221``: >300-char URLs skipped and
  non-``text/html`` rejected — enforced downstream by the shared
  ``fetch_and_extract_row`` filters, which this module feeds through a
  dict-like per-batch store facade so offline and live modes share one
  extraction path (trace parity by construction).

Implementation is stdlib-only (``http.client`` — aiohttp is not available
in this environment). Connections and fetch threads are WORKER-PROCESS
GLOBAL (module-level pool + lazily-built executors), so they persist
across ``map_batches`` calls and crawl rounds exactly like the reference's
long-lived per-bolt client — the stage functions stay stateless tasks
(worker reuse across rounds) while the expensive network state lives for
the life of the worker process. A server that closes per response
(HTTP/1.0, ``Connection: close``) degrades gracefully to one connection
per request; a stale kept-alive connection is retried once on a fresh
socket before the fetch is reported failed.
"""

from __future__ import annotations

import http.client
import threading
import urllib.parse

import pyarrow as pa

from ..functions.urls import MAX_REDIRECTS, host_of, route_of_host

FETCH_TIMEOUT_S = 30.0  # FetcherBolt.java:91-94
EXPAND_TIMEOUT_S = 2.0  # URLExpansionBolt.java:118
USER_AGENT = "mkfc-ray"
_MAX_BODY = 4 << 20  # 4 MiB body cap — bound worker memory per fetch
_EXPAND_BODY_CAP = 16 << 10  # expansion only needs headers; small drain keeps reuse
POOL_MAX_TOTAL = 24  # FetcherBolt.java:83-85 cm.setMaxTotal(24)
POOL_MAX_PER_ROUTE = 10  # cm.setDefaultMaxPerRoute(10)


class _ConnPool:
    """Keep-alive connection pool, keyed by (scheme, host, port), with the
    reference client's idle caps. Thread-safe; holds only IDLE connections
    (in-flight ones belong to their fetch thread), so max_total bounds the
    parked-socket footprint the way the reference's manager bounds leases."""

    def __init__(self, max_total: int = POOL_MAX_TOTAL, max_per_route: int = POOL_MAX_PER_ROUTE):
        self._lock = threading.Lock()
        self._idle: dict[tuple, list] = {}
        self._n_idle = 0
        self.max_total = max_total
        self.max_per_route = max_per_route
        self.reused = 0  # diagnostic counters (tested)
        self.opened = 0

    def acquire(self, scheme: str, host: str, port: int, timeout: float,
                fresh: bool = False):
        """→ (connection, was_reused). ``fresh=True`` bypasses the idle
        list entirely — the stale-keep-alive retry path must be guaranteed
        a new socket (any parked connection for the route may be equally
        stale when the server idle-closed its side)."""
        key = (scheme, host, port)
        with self._lock:
            lst = self._idle.get(key) if not fresh else None
            if lst:
                self._n_idle -= 1
                self.reused += 1
                conn = lst.pop()
                conn.timeout = timeout
                if conn.sock is not None:
                    conn.sock.settimeout(timeout)
                return conn, True
            self.opened += 1
        cls = (
            http.client.HTTPSConnection if scheme == "https" else http.client.HTTPConnection
        )
        return cls(host, port, timeout=timeout), False

    def drop_route(self, scheme: str, host: str, port: int) -> None:
        """Close and forget every parked connection for one route — called
        after a REUSED connection fails mid-request, because the server
        idle-closing its side typically invalidates the whole parked set,
        not just the one socket we happened to draw."""
        with self._lock:
            lst = self._idle.pop((scheme, host, port), None) or []
            self._n_idle -= len(lst)
        for c in lst:
            try:
                c.close()
            except Exception:
                pass

    def release(self, scheme: str, host: str, port: int, conn, reusable: bool) -> None:
        if reusable:
            key = (scheme, host, port)
            with self._lock:
                lst = self._idle.setdefault(key, [])
                if len(lst) < self.max_per_route and self._n_idle < self.max_total:
                    lst.append(conn)
                    self._n_idle += 1
                    return
        try:
            conn.close()
        except Exception:
            pass


_POOL = _ConnPool()

_EXECUTORS: dict[int, object] = {}
_EXEC_LOCK = threading.Lock()


def _executor(max_workers: int):
    """Worker-process-global fetch thread pool (the reference keeps 24
    fetcher threads alive per bolt — FetcherBolt.java:83-95); building one
    per batch would churn threads and drop keep-alive warm starts."""
    from concurrent.futures import ThreadPoolExecutor

    with _EXEC_LOCK:
        ex = _EXECUTORS.get(max_workers)
        if ex is None:
            ex = ThreadPoolExecutor(max_workers=max_workers, thread_name_prefix="mkfc-fetch")
            _EXECUTORS[max_workers] = ex
        return ex


def _single_request(url: str, timeout: float, body_cap: int = _MAX_BODY):
    """One pooled GET, redirects NOT followed →
    (status, content_type, body, location). (0, '', b'', None) on network
    failure. A reused connection that fails mid-request (stale keep-alive)
    is retried once on a fresh socket."""
    sp = urllib.parse.urlsplit(url)
    scheme = sp.scheme or "http"
    host = sp.hostname
    if not host:
        return 0, "", b"", None
    port = sp.port or (443 if scheme == "https" else 80)
    path = sp.path or "/"
    if sp.query:
        path += "?" + sp.query
    for _attempt in (0, 1):
        # attempt 1 exists only because a REUSED keep-alive socket went
        # stale — bypass the pool so the retry is guaranteed fresh (the
        # route's other parked sockets are likely just as stale)
        conn, reused = _POOL.acquire(
            scheme, host, port, timeout, fresh=(_attempt == 1)
        )
        try:
            conn.request(
                "GET", path, headers={"User-Agent": USER_AGENT, "Connection": "keep-alive"}
            )
            resp = conn.getresponse()
            body = resp.read(body_cap)
            overflow = resp.read(1)  # undrained tail → socket can't be reused
            ctype = resp.headers.get_content_type() if resp.headers else ""
            loc = resp.headers.get("Location") if resp.headers else None
            _POOL.release(
                scheme, host, port, conn, reusable=not overflow and not resp.will_close
            )
            return resp.status, ctype, body, loc
        except Exception:
            try:
                conn.close()
            except Exception:
                pass
            if not reused:  # a FRESH connection failed: real network error
                return 0, "", b"", None
            # a reused socket died mid-request: drop the route's parked
            # set (all equally suspect) and retry once on a fresh socket
            _POOL.drop_route(scheme, host, port)
    return 0, "", b"", None


def http_fetch(url: str, timeout: float = FETCH_TIMEOUT_S):
    """GET one URL → (status_code, content_type, body_bytes), following up
    to ``MAX_REDIRECTS`` Location hops (parity with the reference client's
    auto-redirect — by fetch time the expansion stage has already resolved
    redirects, so this only fires on residual/race redirects). Network/DNS
    failures → (0, '', b''); the caller maps non-200 to fetch_failed."""
    cur = url
    for _ in range(MAX_REDIRECTS + 1):
        status, ctype, body, loc = _single_request(cur, timeout)
        if 300 <= status < 400 and loc:
            cur = urllib.parse.urljoin(cur, loc)
            continue
        if status == 200:
            return status, ctype, body
        return status, "", b""
    return 0, "", b""


def live_expand_url(
    url: str, max_redirects: int = MAX_REDIRECTS, timeout: float = EXPAND_TIMEOUT_S
) -> tuple[str, str]:
    """Walk Location headers ≤ ``max_redirects`` hops (redirects NOT auto-
    followed). Returns (final_url, 'ok'|'expand_failed') — the same contract
    as the offline ``expand_url``. Network failure mid-walk keeps the
    current URL (reference drops silently, we keep auditability — see
    stages/expand.py docstring); only exceeding the hop budget while the
    server is STILL redirecting is an expansion failure
    (URLExpansionBolt.java:110-134)."""
    cur = url
    for _ in range(max_redirects):
        status, _, _, loc = _single_request(cur, timeout, body_cap=_EXPAND_BODY_CAP)
        if 300 <= status < 400 and loc:
            cur = urllib.parse.urljoin(cur, loc)
        else:
            return cur, "ok"  # terminal response or network failure → done
    status, _, _, loc = _single_request(cur, timeout, body_cap=_EXPAND_BODY_CAP)
    if 300 <= status < 400 and loc:
        return cur, "expand_failed"  # still redirecting after max hops
    return cur, "ok"


def make_live_expander(max_redirects: int = MAX_REDIRECTS, timeout: float = EXPAND_TIMEOUT_S, max_workers: int = 16):
    """Live counterpart of ``make_expander`` — identical output columns."""

    def expander(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        results = list(
            _executor(max_workers).map(
                lambda u: live_expand_url(u, max_redirects, timeout), urls
            )
        )
        expanded = [r[0] for r in results]
        statuses = [r[1] for r in results]
        hosts = [host_of(e) for e in expanded]
        routes = [route_of_host(h) for h in hosts]
        return (
            batch.append_column("expanded_url", pa.array(expanded, pa.string()))
            .append_column("expanded_host", pa.array(hosts, pa.string()))
            .append_column("route", pa.array(routes, pa.string()))
            .append_column("status", pa.array(statuses, pa.string()))
        )

    return expander


class _LiveStore:
    """dict-like facade over a per-batch prefetch so the shared
    ``fetch_and_extract_row`` filter chain applies unchanged."""

    def __init__(self, results: dict):
        self.results = results

    def get(self, url: str):
        return self.results.get(url)


def make_live_fetch_extract(timeout: float = FETCH_TIMEOUT_S, max_workers: int = 16):
    """Live counterpart of ``make_fetch_extract``: prefetch the batch's
    eligible URLs concurrently (only rows that pass status/route/length
    gates — an overlong or media-routed URL is never fetched), then run the
    shared extraction path."""
    from ..functions.urls import MAX_FETCH_URL_LEN
    from .fetch import _EXTRACT_FIELDS, fetch_and_extract_row

    def fetch_extract(batch: pa.Table) -> pa.Table:
        urls = batch["expanded_url"].to_pylist()
        routes = batch["route"].to_pylist()
        statuses = batch["status"].to_pylist()
        eligible = sorted(
            {
                u
                for u, rt, st in zip(urls, routes, statuses)
                if st == "ok" and rt != "media" and len(u) <= MAX_FETCH_URL_LEN
            }
        )
        fetched = list(
            _executor(max_workers).map(lambda u: http_fetch(u, timeout), eligible)
        )
        store = _LiveStore(dict(zip(eligible, fetched)))
        cols = {name: [] for name, _ in _EXTRACT_FIELDS}
        for u, rt, st in zip(urls, routes, statuses):
            r = fetch_and_extract_row(u, rt, st, store)
            for name, _ in _EXTRACT_FIELDS:
                cols[name].append(r[name])
        out = batch.drop_columns(["status"])
        for name, typ in _EXTRACT_FIELDS:
            out = out.append_column(name, pa.array(cols[name], typ))
        return out

    return fetch_extract


def fetch_robots(hosts: list[str], scheme: str = "http", timeout: float = EXPAND_TIMEOUT_S, agent: str = USER_AGENT):
    """Fetch-once-per-host robots.txt → RobotsCache (live mode). Hosts whose
    robots.txt is unreachable default to allow-all (RFC 9309 §2.3.1 treats
    unreachable-as-allow for 4xx; we extend that to network failure)."""
    from ..state.politeness import robots_cache_from_txt

    host_txt: dict[str, str] = {}
    for h in dict.fromkeys(hosts):
        code, _, body = http_fetch(f"{scheme}://{h}/robots.txt", timeout)
        if code == 200:
            host_txt[h] = body.decode("utf-8", "replace")
    return robots_cache_from_txt(host_txt, agent)
