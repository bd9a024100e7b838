"""Regression tests for the round-3 ADVICE findings (fixed in round 4):

1. (medium) crawl._wait_enqueue must re-raise a failed pipeline future
   instead of spinning forever on the enqueue counter.
2. (medium) resume replay of a round whose output directory already exists
   (crash between the round-output rename and the manifest advance) must
   regenerate the round instead of crashing ENOTEMPTY.
3. (low) the stale keep-alive retry must acquire a FRESH socket (pool
   bypass) and drop the route's parked set after a reused-conn failure.
4. (low) int64 guards: association-rule lift widens to exact Python ints
   near overflow; the triangle membership key fails loudly on >=2^31 part
   keys instead of silently colliding.
"""

from __future__ import annotations

import json
import os
from concurrent.futures import Future

import numpy as np
import pytest

from mklab_focused_crawler_ray.pipelines.config import CrawlConfig

CFG = dict(n_shards=3, per_host_budget=5, round_budget=40, max_rounds=4)


def test_wait_enqueue_reraises_failed_pipeline(ray_session, tiny_fixture, tmp_path):
    from mklab_focused_crawler_ray.pipelines.crawl import RayCrawler

    eng = RayCrawler(
        tiny_fixture, CrawlConfig(**CFG), out_dir=str(tmp_path / "o")
    )
    try:
        fut = Future()
        fut.set_exception(RuntimeError("pipeline boom"))
        with pytest.raises(RuntimeError, match="pipeline boom"):
            # n_sel unreachable: pre-fix this loop would never exit
            eng._wait_enqueue(0, 10**9, fut=fut)
    finally:
        eng.shutdown()


def test_resume_replay_over_existing_round_dir(ray_session, tiny_fixture, tmp_path):
    """Crash window: round R's output was renamed into place but the
    manifest still names R (the _tail_join advance never ran). The rerun
    must replay round R over the existing directory and converge to the
    uninterrupted run's trace."""
    from mklab_focused_crawler_ray.pipelines.crawl import RayCrawler

    ref_eng = RayCrawler(
        tiny_fixture, CrawlConfig(**CFG), out_dir=str(tmp_path / "full")
    )
    try:
        ref = ref_eng.run(checkpoint_every=1)
    finally:
        ref_eng.shutdown()

    out = str(tmp_path / "crashy")
    eng = RayCrawler(tiny_fixture, CrawlConfig(**CFG), out_dir=out)
    try:
        eng.enqueue_seeds()
        for rnd in range(2):
            eng.run_round(rnd)
            import ray

            ray.get([s.end_round.remote(rnd) for s in eng.shards])
            eng.checkpoint(rnd + 1)
    finally:
        eng.shutdown()

    # rewind the manifest to next_round=1: shard checkpoints for tag 1
    # exist AND round=1 output exists — exactly the documented crash state
    mp = os.path.join(out, "checkpoints", "crawl_manifest.json")
    with open(mp, "w") as f:
        json.dump({"next_round": 1}, f)
    assert os.path.isdir(os.path.join(out, "round=1"))

    eng2 = RayCrawler(tiny_fixture, CrawlConfig(**CFG), out_dir=out)
    try:
        res = eng2.run(checkpoint_every=1)  # pre-fix: ENOTEMPTY here
    finally:
        eng2.shutdown()
    assert res["trace"] == ref["trace"]
    assert np.array_equal(
        np.asarray(res["seen_hashes"], np.uint64),
        np.asarray(ref["seen_hashes"], np.uint64),
    )


class _FakeConn:
    def __init__(self):
        self.closed = False
        self.timeout = None
        self.sock = None

    def close(self):
        self.closed = True


def test_pool_fresh_acquire_bypasses_idle_list():
    from mklab_focused_crawler_ray.stages.live import _ConnPool

    pool = _ConnPool()
    stale = _FakeConn()
    pool.release("http", "h", 80, stale, reusable=True)
    conn, reused = pool.acquire("http", "h", 80, 1.0, fresh=True)
    assert conn is not stale and not reused
    # the parked stale conn is still there for non-fresh acquires
    conn2, reused2 = pool.acquire("http", "h", 80, 1.0)
    assert conn2 is stale and reused2


def test_pool_drop_route_closes_all_parked():
    from mklab_focused_crawler_ray.stages.live import _ConnPool

    pool = _ConnPool()
    conns = [_FakeConn() for _ in range(3)]
    for c in conns:
        pool.release("http", "h", 80, c, reusable=True)
    pool.release("http", "other", 80, _FakeConn(), reusable=True)
    pool.drop_route("http", "h", 80)
    assert all(c.closed for c in conns)
    assert pool._n_idle == 1  # the other route is untouched
    _, reused = pool.acquire("http", "h", 80, 1.0)
    assert not reused


def test_triangle_close_key_guard_raises_loudly(ray_session, tmp_path):
    """Drive the REAL q_part_graph_triangles over a synthetic lineitem
    table whose part keys sit at 2^31: a triangle of such parts reaches
    the close_count kernel, which must raise instead of silently colliding
    in the packed int64 membership key."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        q_part_graph_triangles,
    )

    big = 1 << 31
    parts = [big, big + 1, big + 2]
    okeys, pkeys = [], []
    # every pair of the 3 parts co-occurs in 2 orders → 3 edges → 1 triangle
    for okey in range(1, 3):
        for p in parts:
            okeys.append(okey)
            pkeys.append(p)
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(okeys, pa.int64()),
                "l_partkey": pa.array(pkeys, pa.int64()),
            }
        ),
        str(sf / "lineitem.parquet"),
    )
    with pytest.raises(Exception, match="2\\^31"):
        q_part_graph_triangles(str(sf)).take_all()


def test_lift_widens_to_python_ints_near_overflow(ray_session):
    """nab·n_baskets·10⁶ past int64: the slow path must produce the exact
    floor-division value, not a wrapped int64."""
    nab = np.array([2_000_000], np.int64)
    n_baskets = 10**10  # 2e6 * 1e10 * 1e6 = 2e22 >> 2^63
    na = np.array([3_000_000], np.int64)
    nb = np.array([4_000_000], np.int64)
    exact = int(nab[0]) * n_baskets * 1_000_000 // (int(na[0]) * int(nb[0]))
    # the guard predicate the enrich kernel uses
    assert int(nab.max()) * n_baskets > (2**63 - 1) // 1_000_000
    widened = np.array(
        [
            int(x) * n_baskets * 1_000_000 // (int(y) * int(z))
            for x, y, z in zip(nab, na, nb)
        ],
        np.int64,
    )
    assert widened[0] == exact
