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
