"""Benchmark harness (driver contract).

Default: runs the headline crawl pipeline over a deterministic synthetic
frontier (generated once, cached under /tmp) plus every queries() pipeline
over $GRAFT_SF_DIR (default /root/testdata/sf0.1), and prints ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "crawl": {"fetched_pages_per_sec": ..., "frontier_ops_per_sec": ...}}

--scaling: runs the headline crawl twice in FRESH processes at
RAY_GRAFT_CPUS=8 and =32 on the same input and reports both throughputs plus
scaling efficiency (the sandbox stand-in for the north rule's N vs 4N
cluster sizes).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
FIXTURE_TIER = os.environ.get("GRAFT_CRAWL_TIER", "small")
FIXTURE_DIR = os.environ.get(
    "GRAFT_FIXTURE_DIR", f"/tmp/mkfc_fixtures/{FIXTURE_TIER}"
)

BENCH_QUERIES = [
    "ranker_scores",
    "top100_ranked",
    "event_type_counts",
    "windowed_counts",
    "token_counts",
    "token_idf",
    "exact_dedup_docs",
    "tokenset_dedup_groups",
    "doc_stats",
    "q1_lineitem",
    "revenue_by_priority",
    "embedding_top10",
    "simhash_docs",
    "langid_detect",
]


def run_crawl(num_cpus: int) -> dict:
    import shutil

    from mklab_focused_crawler_ray.fixtures.generate import generate_tier
    from mklab_focused_crawler_ray.pipelines.config import CrawlConfig
    from mklab_focused_crawler_ray.pipelines.crawl import RayCrawler

    generate_tier(FIXTURE_TIER, FIXTURE_DIR)
    out_dir = f"/tmp/mkfc_bench_out/{num_cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = CrawlConfig(
        n_shards=max(4, num_cpus // 4),
        per_host_budget=10,
        round_budget=2000,
        max_rounds=4,
        fetch_concurrency=max(2, num_cpus // 2),
        fetch_batch_size=256,
        hot_threshold=200,
    )
    t0 = time.time()
    crawler = RayCrawler(FIXTURE_DIR, cfg, out_dir=out_dir)
    res = crawler.run(checkpoint_every=0)
    dt = time.time() - t0
    crawler.shutdown()
    n_fetched = len(res["trace"])
    stats = res["shard_stats"]
    ops = sum(s["enqueued"] + s["scheduled"] + s["dup_pending"] + s["dup_seen"] for s in stats)
    return {
        "sec": dt,
        "pages": n_fetched,
        "fetched_pages_per_sec": round(n_fetched / dt, 1),
        "frontier_ops_per_sec": round(ops / dt, 1),
    }


def run_queries(sf_dir: str) -> dict:
    import ray

    from mklab_focused_crawler_ray.pipelines.queries import QUERIES

    out = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.time()
        res = fn(sf_dir)
        if isinstance(res, ray.data.Dataset):
            res = res.to_pandas()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    crawl = run_crawl(NUM_CPUS)
    queries = run_queries(SF_DIR)
    headline = crawl["sec"] + sum(queries.values())
    print(
        json.dumps(
            {
                "metric": "crawl+queries wall time (crawl fixture tier "
                f"{FIXTURE_TIER}; queries at {SF_DIR})",
                "value": round(headline, 3),
                "unit": "sec",
                "queries": queries,
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
                "crawl": crawl,
            }
        )
    )
    ray.shutdown()


def scaling() -> None:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # warm page cache / fixture generation once, untimed
    from mklab_focused_crawler_ray.fixtures.generate import generate_tier

    generate_tier(FIXTURE_TIER, FIXTURE_DIR)

    lo, hi = run(8), run(32)
    tp_lo = lo["crawl"]["fetched_pages_per_sec"]
    tp_hi = hi["crawl"]["fetched_pages_per_sec"]
    eff = (tp_hi / tp_lo) / (32 / 8)
    print(
        json.dumps(
            {
                "metric": "scaling efficiency (crawl pages/sec, 8 vs 32 cpus)",
                "cpus_lo": 8,
                "cpus_hi": 32,
                "pages_per_sec_lo": tp_lo,
                "pages_per_sec_hi": tp_hi,
                "sec_lo": lo["value"],
                "sec_hi": hi["value"],
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
