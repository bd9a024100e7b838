"""Committed golden run (SURVEY §5.4): the tiny-fixture crawl trace and
seen-set digest are pinned in tests/golden_trace_tiny.json. Both the
pure-python oracle AND the distributed engine must reproduce them — this
catches oracle+engine drifting together (a change that silently alters
semantics passes oracle-equality tests but fails the committed golden)."""

from __future__ import annotations

import hashlib
import json
import os

import pytest

from mklab_focused_crawler_ray.pipelines.config import CrawlConfig
from mklab_focused_crawler_ray.pipelines.oracle import CrawlOracle

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_trace_tiny.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


def _seen_sha(hashes) -> str:
    return hashlib.sha256(
        b"".join(int(h).to_bytes(8, "little") for h in hashes)
    ).hexdigest()


def test_oracle_reproduces_golden(tiny_tables, golden):
    cfg = CrawlConfig(**golden["config"])
    res = CrawlOracle(tiny_tables, cfg).run()
    assert [list(t) for t in res["trace"]] == golden["trace"]
    assert len(res["seen_hashes"]) == golden["n_seen"]
    assert _seen_sha(res["seen_hashes"]) == golden["seen_sha256"]


def test_engine_reproduces_golden(ray_session, tiny_fixture, golden, tmp_path):
    from mklab_focused_crawler_ray.pipelines.crawl import RayCrawler

    cfg = CrawlConfig(**golden["config"])
    eng = RayCrawler(tiny_fixture, cfg, out_dir=str(tmp_path / "out"))
    try:
        res = eng.run(checkpoint_every=0)
    finally:
        eng.shutdown()
    assert [list(t) for t in res["trace"]] == golden["trace"]
    assert _seen_sha(sorted(int(h) for h in res["seen_hashes"])) == golden["seen_sha256"]
