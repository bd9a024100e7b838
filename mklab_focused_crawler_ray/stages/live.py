"""Live-HTTP fetch and expansion stages (opt-in ``CrawlConfig.fetch_mode=
'live'``; the offline fixture store stays the test/bench default).

Reference semantics honored:
- ``bolts/FetcherBolt.java:83-95``: pooled HTTP GET, 30 s socket/connect
  timeouts, User-Agent set; per-route connection cap is our politeness
  budget (state/politeness.py).
- ``bolts/webpages/URLExpansionBolt.java:30,110-134``: ≤ 4 redirect hops,
  2 s timeout per hop, Location-header walk WITHOUT auto-redirect; more
  hops → expansion failure.
- ``bolts/FetcherBolt.java:194,214-221``: >300-char URLs skipped and
  non-``text/html`` rejected — enforced downstream by the shared
  ``fetch_and_extract_row`` filters, which this module feeds through a
  dict-like per-batch store facade so offline and live modes share one
  extraction path (trace parity by construction).

Implementation is stdlib-only (``urllib`` — aiohttp is not available in
this environment) with a per-batch thread pool for the IO fan-out; the
stage factories mirror the offline factories' (input columns → output
columns) contract exactly.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.urls import MAX_REDIRECTS, host_of, route_of_host

FETCH_TIMEOUT_S = 30.0  # FetcherBolt.java:83-95
EXPAND_TIMEOUT_S = 2.0  # URLExpansionBolt.java:118
USER_AGENT = "mkfc-ray"
_MAX_BODY = 4 << 20  # 4 MiB body cap — bound worker memory per fetch


class _NoRedirect(Exception):
    def __init__(self, location: str, code: int):
        self.location = location
        self.code = code


def http_fetch(url: str, timeout: float = FETCH_TIMEOUT_S):
    """GET one URL → (status_code, content_type, body_bytes). Network/DNS
    failures → (0, '', b''); the caller maps non-200 to fetch_failed."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, headers={"User-Agent": USER_AGENT})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            ctype = resp.headers.get_content_type()
            body = resp.read(_MAX_BODY)
            return resp.status, ctype, body
    except urllib.error.HTTPError as e:
        return e.code, "", b""
    except Exception:
        return 0, "", b""


def live_expand_url(
    url: str, max_redirects: int = MAX_REDIRECTS, timeout: float = EXPAND_TIMEOUT_S
) -> tuple[str, str]:
    """Walk Location headers ≤ ``max_redirects`` hops (redirects NOT auto-
    followed). Returns (final_url, 'ok'|'expand_failed') — the same contract
    as the offline ``expand_url``."""
    import urllib.parse
    import urllib.request

    class Handler(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, req, fp, code, msg, headers, newurl):
            raise _NoRedirect(newurl, code)

    opener = urllib.request.build_opener(Handler)
    cur = url
    for _ in range(max_redirects):
        req = urllib.request.Request(cur, headers={"User-Agent": USER_AGENT})
        try:
            with opener.open(req, timeout=timeout) as resp:
                resp.read(0)
                return cur, "ok"  # non-redirect response → done
        except _NoRedirect as r:
            cur = urllib.parse.urljoin(cur, r.location)
        except Exception:
            # network failure during expansion: keep the current URL; the
            # fetch stage will record the failure (reference drops silently,
            # we keep auditability — stages/expand.py docstring)
            return cur, "ok"
    # still redirecting after max hops?
    req = urllib.request.Request(cur, headers={"User-Agent": USER_AGENT})
    try:
        with opener.open(req, timeout=timeout) as resp:
            resp.read(0)
            return cur, "ok"
    except _NoRedirect:
        return cur, "expand_failed"
    except Exception:
        return cur, "ok"


def make_live_expander(max_redirects: int = MAX_REDIRECTS, timeout: float = EXPAND_TIMEOUT_S, max_workers: int = 16):
    """Live counterpart of ``make_expander`` — identical output columns."""

    def expander(batch: pa.Table) -> pa.Table:
        from concurrent.futures import ThreadPoolExecutor

        urls = batch["url"].to_pylist()
        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            results = list(
                ex.map(lambda u: live_expand_url(u, max_redirects, timeout), urls)
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
        from concurrent.futures import ThreadPoolExecutor

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
        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            fetched = list(ex.map(lambda u: http_fetch(u, timeout), eligible))
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
