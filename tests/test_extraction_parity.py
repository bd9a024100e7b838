"""Extraction-content parity: for every URL the engine fetched, the round
output's (status, title, is_article, media ids, out-link count) must equal
the oracle's single-threaded extraction — the per-row invariant layer on
top of trace equality (ArticleExtractionBolt semantics: image filters,
alt→title fallback, Web#-hash media ids, .gif drop, thumbnail rule)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from mklab_focused_crawler_ray.pipelines.config import CrawlConfig
from mklab_focused_crawler_ray.pipelines.oracle import CrawlOracle

CFG = dict(n_shards=3, per_host_budget=5, round_budget=40, max_rounds=4)


def test_fetched_page_contents_match_oracle(ray_session, tiny_fixture, tiny_tables, tmp_path):
    from mklab_focused_crawler_ray.pipelines.crawl import RayCrawler

    cfg = CrawlConfig(**CFG)
    oracle = CrawlOracle(tiny_tables, cfg).run()
    by_url = {
        (p["round"], p["url"]): p for p in oracle["pages"]
    }

    out = str(tmp_path / "out")
    eng = RayCrawler(tiny_fixture, cfg, out_dir=out)
    try:
        eng.run(checkpoint_every=0)
    finally:
        eng.shutdown()

    n_checked = n_fetched = 0
    for d in sorted(os.listdir(out)):
        if not d.startswith("round="):
            continue
        for f in os.listdir(os.path.join(out, d)):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(out, d, f))
            for row in t.to_pylist():
                key = (row["round"], row["url"])
                o = by_url.get(key)
                assert o is not None, f"engine fetched unknown row {key}"
                assert row["status"] == o["status"], key
                n_checked += 1
                if row["status"] != "fetched":
                    continue
                n_fetched += 1
                assert row["title"] == o["title"], key
                assert row["text"] == o["text"], key
                assert bool(row["is_article"]) == bool(o["is_article"]), key
                assert (row["media_thumbnail"] or "") == (o["media_thumbnail"] or ""), key
                eng_media = [(m["media_id"], m["media_url"]) for m in (row["media"] or [])]
                ora_media = [(m["media_id"], m["media_url"]) for m in (o["media"] or [])]
                assert eng_media == ora_media, key
                assert len(row["out_links"] or []) == o["n_out_links"], key
    assert n_checked == len(oracle["pages"])
    assert n_fetched > 20, "scenario must include a substantial fetched set"
