"""North-rule conformance: the Ray engine's crawl ordering and final
URL-seen set must EXACTLY equal the pure-Python oracle under the same seed
list + politeness budget (BASELINE.json north_rule; SURVEY.md §5.2)."""

import numpy as np
import pytest

from mklab_focused_crawler_ray.pipelines.config import CrawlConfig
from mklab_focused_crawler_ray.pipelines.oracle import CrawlOracle


def _run_oracle(tiny_tables, cfg):
    return CrawlOracle(tiny_tables, cfg).run()


@pytest.mark.parametrize(
    "cfg",
    [
        CrawlConfig(n_shards=3, per_host_budget=5, round_budget=40, max_rounds=4),
        CrawlConfig(n_shards=1, per_host_budget=10, round_budget=60, max_rounds=3),
        CrawlConfig(
            n_shards=4, per_host_budget=3, round_budget=25, max_rounds=5, hot_threshold=10
        ),
    ],
    ids=["shards3", "shards1", "salted"],
)
def test_trace_and_seen_set_match_oracle(ray_session, tiny_fixture, tiny_tables, cfg, tmp_path):
    from mklab_focused_crawler_ray.pipelines.crawl import RayCrawler

    oracle = _run_oracle(tiny_tables, cfg)
    eng = RayCrawler(tiny_fixture, cfg, out_dir=str(tmp_path / "out"))
    try:
        res = eng.run(checkpoint_every=0)
    finally:
        eng.shutdown()

    assert res["trace"] == oracle["trace"], (
        f"trace diverged: engine {len(res['trace'])} rows vs oracle "
        f"{len(oracle['trace'])}; first diff at "
        f"{next((i for i, (a, b) in enumerate(zip(res['trace'], oracle['trace'])) if a != b), 'len')}"
    )
    eng_seen = np.asarray(res["seen_hashes"], dtype=np.uint64)
    ora_seen = np.asarray(oracle["seen_hashes"], dtype=np.uint64)
    assert np.array_equal(eng_seen, ora_seen)


def test_oracle_politeness_budget(tiny_tables):
    cfg = CrawlConfig(per_host_budget=2, round_budget=100, max_rounds=2)
    res = _run_oracle(tiny_tables, cfg)
    from collections import Counter
    from urllib.parse import urlsplit

    for rnd in range(2):
        hosts = Counter(
            urlsplit(u).hostname for r, _, u in res["trace"] if r == rnd
        )
        assert all(c <= 2 for c in hosts.values()), hosts


def test_oracle_order_is_score_desc(tiny_tables):
    cfg = CrawlConfig(per_host_budget=1000, round_budget=1000, max_rounds=1)
    oracle = CrawlOracle(tiny_tables, cfg)
    res = oracle.run()
    r0 = [u for r, _, u in res["trace"] if r == 0]
    # With politeness effectively off, round 0 must be every distinct,
    # robots-allowed seed in (score desc, url asc) order.
    assert len(r0) > 0
    # ranks strictly ordered by the recorded order — resort and compare
    scores = {}
    for u in r0:
        s, h, _ = (
            oracle.pending.get(u) or (None, None, None)
        )  # consumed — recompute via seeds not needed; order check via sortedness:
    # verify no later url has a strictly higher score than an earlier one by
    # recomputing scores from the seed table
    import pyarrow as pa

    seeds = {}
    t = oracle.seeds
    from mklab_focused_crawler_ray.pipelines.oracle import _score_one

    for u, s, d in zip(
        t["url"].to_pylist(),
        t["shares"].to_pylist(),
        t["date"].cast(pa.int64()).to_pylist(),
    ):
        seeds.setdefault(u, _score_one(int(s), int(d), cfg.now_ms))
    keys = [(-seeds[u], u) for u in r0]
    assert keys == sorted(keys)
