"""Robots crawl-delay driving the per-host budget: with the logical clock,
a host declaring ``Crawl-delay: D`` gets at most round_duration/D fetches
per round. Engine and oracle must agree exactly, and the cap must bind."""

from __future__ import annotations

from collections import Counter
from urllib.parse import urlsplit

import numpy as np
import pytest

from mklab_focused_crawler_ray.pipelines.config import CrawlConfig
from mklab_focused_crawler_ray.pipelines.oracle import CrawlOracle
from mklab_focused_crawler_ray.state.politeness import (
    effective_host_budget,
    robots_cache_from_txt,
)

CFG = dict(
    n_shards=3,
    per_host_budget=8,
    round_budget=60,
    max_rounds=4,
    round_duration_ms=10_000,
)


def _robots(tiny_tables, cfg):
    # pick the genuinely hottest host from an un-delayed baseline run so the
    # crawl-delay cap provably binds
    base = CrawlOracle(tiny_tables, cfg).run()
    per_round = Counter((r, urlsplit(u).hostname) for r, _, u in base["trace"])
    host_max: dict[str, int] = {}
    for (r, h), n in per_round.items():
        host_max[h] = max(host_max.get(h, 0), n)
    slow = max(host_max, key=lambda h: host_max[h])
    assert host_max[slow] > 2, "baseline must exceed the delayed cap"
    txt = {slow: "User-agent: *\nCrawl-delay: 5\n"}
    return robots_cache_from_txt(txt), slow


def test_effective_budget_math():
    assert effective_host_budget(10, None, 10_000) == 10
    assert effective_host_budget(10, 5.0, 10_000) == 2
    assert effective_host_budget(10, 0.5, 10_000) == 10  # capped by base
    assert effective_host_budget(10, 60.0, 10_000) == 1  # min 1 (progress)
    assert effective_host_budget(10, 5.0, 0) == 10  # frozen clock → ignore


def test_crawl_delay_budget_engine_matches_oracle(
    ray_session, tiny_fixture, tiny_tables, tmp_path
):
    from mklab_focused_crawler_ray.pipelines.crawl import RayCrawler

    cfg = CrawlConfig(**CFG)
    robots, slow = _robots(tiny_tables, cfg)
    oracle = CrawlOracle(tiny_tables, cfg, robots=robots).run()

    # the cap binds: the delayed host appears ≤2 times per round
    per_round = Counter(
        (r, urlsplit(u).hostname) for r, _, u in oracle["trace"]
    )
    slow_counts = [n for (r, h), n in per_round.items() if h == slow]
    assert slow_counts and max(slow_counts) <= 2

    eng = RayCrawler(
        tiny_fixture, cfg, out_dir=str(tmp_path / "out"), robots=robots
    )
    try:
        res = eng.run(checkpoint_every=0)
    finally:
        eng.shutdown()
    assert res["trace"] == oracle["trace"]
    assert np.array_equal(
        np.asarray(res["seen_hashes"], np.uint64),
        np.asarray(oracle["seen_hashes"], np.uint64),
    )
