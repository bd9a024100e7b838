"""Live-HTTP crawl mode: against a local http.server fixture, the live
engine (urllib fetch + Location-walk expansion + live robots.txt) must
reproduce exactly the trace the offline fixture-store engine produces for
the same site."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

N_PAGES = 12


def _page_html(i: int, base: str) -> str:
    links = "".join(
        f'<a href="{base}/p/{j:04d}">l</a>' for j in (i * 3 + 1, i * 3 + 2, i * 3 + 3)
        if j < N_PAGES
    )
    # every page links one redirect alias and one disallowed path
    extra = f'<a href="{base}/r/{(i + 1) % N_PAGES:04d}">r</a><a href="{base}/private/x{i}">p</a>'
    body = " ".join(f"word{k}" for k in range(60))
    return (
        f"<html><head><title>Page {i}</title></head><body>"
        f'<div class="article"><p>{body}</p></div>{links}{extra}</body></html>'
    )


class _Handler(BaseHTTPRequestHandler):
    base = ""  # set after bind

    def do_GET(self):  # noqa: N802
        if self.path == "/robots.txt":
            body = b"User-agent: *\nDisallow: /private/\n"
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if self.path.startswith("/r/"):
            target = f"{self.base}/p/{self.path[3:]}"
            self.send_response(302)
            self.send_header("Location", target)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        if self.path.startswith("/p/"):
            i = int(self.path[3:])
            if i < N_PAGES:
                body = _page_html(i, self.base).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
        self.send_response(404)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def site():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    base = f"http://127.0.0.1:{srv.server_port}"
    _Handler.base = base
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield base
    srv.shutdown()


def _write_fixture(dirpath: str, base: str, with_store: bool) -> None:
    """Fixture dir for the site: seeds + url metadata always; the offline
    page/redirect/robots store only when ``with_store``."""
    import os

    os.makedirs(dirpath, exist_ok=True)
    host = base.split("//")[1]
    seeds = [f"{base}/p/0000", f"{base}/r/0001"]
    pq.write_table(
        pa.table(
            {
                "url": pa.array(seeds, pa.string()),
                "domain": pa.array([host] * len(seeds), pa.string()),
                "shares": pa.array([5, 3], pa.int64()),
                "date": pa.array([1_600_000_000_000_000] * len(seeds), pa.timestamp("us")),
            }
        ),
        f"{dirpath}/frontier_seed.parquet",
    )
    urls = [f"{base}/p/{i:04d}" for i in range(N_PAGES)] + [
        f"{base}/r/{i:04d}" for i in range(N_PAGES)
    ]
    pq.write_table(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "shares": pa.array(list(range(len(urls))), pa.int64()),
                "date": pa.array([1_600_000_000_000_000] * len(urls), pa.timestamp("us")),
            }
        ),
        f"{dirpath}/urls.parquet",
    )
    if not with_store:
        return
    purls = [f"{base}/p/{i:04d}" for i in range(N_PAGES)]
    pq.write_table(
        pa.table(
            {
                "url": pa.array(purls, pa.string()),
                "status_code": pa.array([200] * N_PAGES, pa.int32()),
                "content_type": pa.array(["text/html"] * N_PAGES, pa.string()),
                "html": pa.array(
                    [_page_html(i, base).encode() for i in range(N_PAGES)],
                    pa.binary(),
                ),
                "out_links": pa.array([[]] * N_PAGES, pa.list_(pa.string())),
                "image_ids": pa.array([[]] * N_PAGES, pa.list_(pa.string())),
            }
        ),
        f"{dirpath}/pages.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "src": pa.array([f"{base}/r/{i:04d}" for i in range(N_PAGES)], pa.string()),
                "dst": pa.array(purls, pa.string()),
            }
        ),
        f"{dirpath}/redirects.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "host": pa.array([host], pa.string()),
                "disallow_prefix": pa.array(["/private/"], pa.string()),
            }
        ),
        f"{dirpath}/robots.parquet",
    )


def _run(fixture_dir: str, out_dir: str, live: bool):
    from mklab_focused_crawler_ray.pipelines.config import CrawlConfig
    from mklab_focused_crawler_ray.pipelines.crawl import RayCrawler

    cfg = CrawlConfig(
        n_shards=2,
        per_host_budget=6,
        round_budget=10,
        max_rounds=4,
        fetch_mode="live" if live else "fixture",
        live_fetch_timeout_s=5.0,
        live_expand_timeout_s=5.0,
    )
    eng = RayCrawler(fixture_dir, cfg, out_dir=out_dir)
    try:
        res = eng.run(checkpoint_every=0)
    finally:
        eng.shutdown()
    return res


class _KAHandler(BaseHTTPRequestHandler):
    """HTTP/1.1 keep-alive server that counts TCP connections vs requests."""

    protocol_version = "HTTP/1.1"
    conn_count = 0
    req_count = 0

    def setup(self):
        type(self).conn_count += 1
        super().setup()

    def do_GET(self):  # noqa: N802
        type(self).req_count += 1
        if self.path.startswith("/redir"):
            self.send_response(302)
            self.send_header("Location", "/page")
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        if self.path.startswith("/loop"):
            self.send_response(302)
            self.send_header("Location", "/loop")
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        body = b"<html><body>ok</body></html>"
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


class _StaleHandler(BaseHTTPRequestHandler):
    """Advertises keep-alive (HTTP/1.1, no Connection header) but closes the
    socket after every response — the parked pool connection goes stale."""

    protocol_version = "HTTP/1.1"

    def do_GET(self):  # noqa: N802
        body = b"x"
        self.send_response(200)
        self.send_header("Content-Type", "text/plain")
        self.send_header("Content-Length", "1")
        self.end_headers()
        self.wfile.write(body)
        self.close_connection = True  # silent server-side close → stale conn

    def log_message(self, *a):
        pass


def _serve(handler):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_port}"


def test_http_fetch_reuses_keepalive_connections():
    """Sequential fetches against a keep-alive host ride ONE TCP connection
    (the reference's PoolingHttpClientConnectionManager behavior —
    FetcherBolt.java:83-85); round 2's urllib version opened one per
    request."""
    from mklab_focused_crawler_ray.stages import live

    srv, base = _serve(_KAHandler)
    _KAHandler.conn_count = 0
    _KAHandler.req_count = 0
    try:
        for i in range(8):
            st, ct, body = live.http_fetch(f"{base}/page?i={i}", timeout=5.0)
            assert st == 200 and ct == "text/html" and b"ok" in body
        assert _KAHandler.req_count == 8
        assert _KAHandler.conn_count == 1
    finally:
        srv.shutdown()


def test_http_fetch_follows_redirects_and_bounds_loops():
    from mklab_focused_crawler_ray.functions.urls import MAX_REDIRECTS
    from mklab_focused_crawler_ray.stages import live

    srv, base = _serve(_KAHandler)
    try:
        st, ct, body = live.http_fetch(f"{base}/redir", timeout=5.0)
        assert st == 200 and b"ok" in body  # Location followed to /page
        st, ct, body = live.http_fetch(f"{base}/loop", timeout=5.0)
        assert st == 0 and body == b""  # > MAX_REDIRECTS hops → failure
        assert MAX_REDIRECTS == 4
    finally:
        srv.shutdown()


def test_http_fetch_retries_stale_keepalive_once():
    from mklab_focused_crawler_ray.stages import live

    srv, base = _serve(_StaleHandler)
    try:
        for i in range(3):  # each fetch after the first acquires a stale conn
            st, _, body = live.http_fetch(f"{base}/p{i}", timeout=5.0)
            assert st == 200 and body == b"x"
    finally:
        srv.shutdown()


def test_conn_pool_caps_idle_connections():
    from mklab_focused_crawler_ray.stages.live import _ConnPool

    class FakeConn:
        closed = False
        sock = None

        def close(self):
            self.closed = True

    pool = _ConnPool(max_total=2, max_per_route=1)
    a, b, c = FakeConn(), FakeConn(), FakeConn()
    pool.release("http", "h1", 80, a, reusable=True)   # parked (route h1: 1)
    pool.release("http", "h1", 80, b, reusable=True)   # over per-route cap → closed
    pool.release("http", "h2", 80, c, reusable=True)   # parked (total: 2)
    d = FakeConn()
    pool.release("http", "h3", 80, d, reusable=True)   # over total cap → closed
    assert not a.closed and b.closed and not c.closed and d.closed
    got, reused = pool.acquire("http", "h1", 80, timeout=1.0)
    assert got is a and reused


def test_live_trace_equals_offline(ray_session, site, tmp_path):
    off_dir, live_dir = str(tmp_path / "off"), str(tmp_path / "live")
    _write_fixture(off_dir, site, with_store=True)
    _write_fixture(live_dir, site, with_store=False)
    off = _run(off_dir, str(tmp_path / "out_off"), live=False)
    liv = _run(live_dir, str(tmp_path / "out_live"), live=True)
    assert off["trace"] == liv["trace"]
    assert sorted(off["seen_hashes"]) == sorted(liv["seen_hashes"])
    assert len(off["trace"]) > 0
    # robots honored in both modes: no /private/ URL ever scheduled
    assert all("/private/" not in u for _, _, u in liv["trace"])
