"""TTL recrawl conformance through the FULL engine (CrawlDecider
recrawl-after-expiry, utils/CrawlDecider.java:23-27): with a per-round
logical clock and a short seen-TTL, URLs rediscovered after expiry are
scheduled again, and the distributed engine's trace still equals the
pure-python oracle exactly."""

from __future__ import annotations

from collections import Counter

import numpy as np

from mklab_focused_crawler_ray.pipelines.config import CrawlConfig
from mklab_focused_crawler_ray.pipelines.oracle import CrawlOracle

CFG = dict(
    n_shards=3,
    per_host_budget=4,
    round_budget=30,
    max_rounds=8,
    seen_ttl_ms=1500,
    round_duration_ms=1000,  # TTL expires 2 rounds after a fetch
)


def test_ttl_recrawl_trace_matches_oracle(ray_session, tiny_fixture, tiny_tables, tmp_path):
    from mklab_focused_crawler_ray.pipelines.crawl import RayCrawler

    oracle = CrawlOracle(tiny_tables, CrawlConfig(**CFG)).run()
    # the scenario must actually exercise recrawls, else the test is vacuous
    url_counts = Counter(u for _, _, u in oracle["trace"])
    assert any(c >= 2 for c in url_counts.values()), (
        "fixture+config must produce at least one TTL-expired recrawl"
    )

    eng = RayCrawler(tiny_fixture, CrawlConfig(**CFG), out_dir=str(tmp_path / "out"))
    try:
        res = eng.run(checkpoint_every=0)
    finally:
        eng.shutdown()
    assert res["trace"] == oracle["trace"]
    assert np.array_equal(
        np.asarray(res["seen_hashes"], np.uint64),
        np.asarray(oracle["seen_hashes"], np.uint64),
    )


def test_frozen_clock_never_recrawls(tiny_tables):
    cfg = CrawlConfig(**{**CFG, "round_duration_ms": 0})
    oracle = CrawlOracle(tiny_tables, cfg).run()
    url_counts = Counter(u for _, _, u in oracle["trace"])
    assert all(c == 1 for c in url_counts.values())
