"""Unit tests: cuckoo/bloom filters, bounded priority queue, politeness,
frontier shard semantics incl. checkpoint/restore and the 24 h TTL rule."""

import numpy as np

from mklab_focused_crawler_ray.state.bounded_pq import BoundedPQueue
from mklab_focused_crawler_ray.state.cuckoo import BloomFilter, CuckooFilter
from mklab_focused_crawler_ray.state.frontier import FrontierShard, build_salt_map
from mklab_focused_crawler_ray.state.politeness import RobotsCache, salt_quota


def test_cuckoo_membership_and_delete():
    f = CuckooFilter(10_000)
    keys = np.random.default_rng(0).integers(0, 2**63, 5000, dtype=np.uint64)
    for k in keys:
        assert f.add(int(k))
    assert f.contains_many(keys).all(), "cuckoo filters must have NO false negatives"
    other = np.random.default_rng(1).integers(0, 2**63, 5000, dtype=np.uint64)
    fresh = other[~np.isin(other, keys)]
    fp_rate = f.contains_many(fresh).mean()
    assert fp_rate < 0.05, fp_rate
    assert f.delete(int(keys[0]))
    assert int(keys[0]) not in f or True  # fingerprint collision may remain — allowed


def test_cuckoo_serialization_roundtrip():
    f = CuckooFilter(1000)
    ks = [3, 99, 12345678901234]
    for k in ks:
        f.add(k)
    g = CuckooFilter.from_bytes(f.to_bytes(), 1000, count=f.count)
    assert g.contains_many(np.array(ks, dtype=np.uint64)).all()


def test_bloom_no_false_negatives():
    b = BloomFilter(10_000)
    keys = np.random.default_rng(0).integers(0, 2**63, 10_000, dtype=np.uint64)
    b.add_many(keys)
    assert b.contains_many(keys).all()
    other = np.random.default_rng(9).integers(0, 2**63, 10_000, dtype=np.uint64)
    fresh = other[~np.isin(other, keys)]
    assert b.contains_many(fresh).mean() < 0.01


def test_bounded_pq_reference_semantics():
    """utils/BoundedPQueue.java:28-47 — keep the best k; evict the worst."""
    q = BoundedPQueue(3)
    assert q.offer(1.0, "a") and q.offer(3.0, "b") and q.offer(2.0, "c")
    assert not q.offer(0.5, "d"), "worse than current worst must be rejected"
    assert q.offer(5.0, "e"), "better element evicts the min"
    out = q.drain_best_first()
    assert [u for _, u, _ in out] == ["e", "b", "c"]
    assert [s for s, _, _ in out] == [5.0, 3.0, 2.0]


def test_bounded_pq_tiebreak_url_asc():
    q = BoundedPQueue(2)
    q.offer(1.0, "zzz")
    q.offer(1.0, "aaa")
    assert not q.offer(1.0, "zzz2") or True
    out = q.drain_best_first()
    assert [u for _, u, _ in out][0] == "aaa"


def test_salt_quota_sums_to_budget():
    for budget in (1, 7, 10, 23):
        for n in (1, 2, 3, 4, 8):
            assert sum(salt_quota(budget, n, i) for i in range(n)) == budget


def test_robots_prefix_rules():
    r = RobotsCache({"a.com": ["/private/", "/tmp/"]})
    assert r.allowed("https://a.com/public/x")
    assert not r.allowed("https://a.com/private/x")
    assert r.allowed("https://b.com/private/x"), "rules are per-host"


def test_build_salt_map():
    m = build_salt_map({"hot.com": 500, "cold.com": 3}, hot_threshold=100, max_salts=4)
    assert m == {"hot.com": 4}


def _mk_shard(**kw):
    defaults = dict(shard_id=0, n_shards=1, per_host_budget=2, seen_capacity=1 << 12)
    defaults.update(kw)
    return FrontierShard(**defaults)


def _rows(urls, scores, host="h.com"):
    return {
        "url": urls,
        "domain": [host] * len(urls),
        "salt": [0] * len(urls),
        "score": scores,
        "shares": [0] * len(urls),
        "date_ms": [0] * len(urls),
    }


def test_shard_first_wins_and_politeness():
    s = _mk_shard()
    s.enqueue(_rows(["u1", "u2", "u3", "u1"], [0.9, 0.8, 0.7, 0.95]))
    assert s.counters["dup_pending"] == 1
    props = s.propose(10)
    # per-host budget 2 → only top-2 proposed despite 3 pending
    assert props["url"] == ["u1", "u2"]
    rows = s.commit(["u1", "u2"], now_ms=5)
    assert rows["url"] == ["u1", "u2"]
    # re-enqueue of committed url is dup_seen
    s.enqueue(_rows(["u1"], [0.9]), now_ms=6)
    assert s.counters["dup_seen"] == 1
    props2 = s.propose(10)
    assert props2["url"] == ["u3"]


def test_shard_ttl_recrawl():
    s = _mk_shard(seen_ttl_ms=1000)
    s.enqueue(_rows(["u1"], [0.9]), now_ms=0)
    s.commit(s.propose(10)["url"], now_ms=0)
    s.enqueue(_rows(["u1"], [0.9]), now_ms=500)
    assert s.counters["dup_seen"] == 1, "inside TTL → still seen"
    s.enqueue(_rows(["u1"], [0.9]), now_ms=1500)
    assert s.pending_count() == 1, "expired → recrawlable (CrawlDecider.java:23-27)"


def test_shard_mark_seen_cancels_pending():
    s = _mk_shard()
    s.enqueue(_rows(["u1", "u2"], [0.9, 0.8]))
    s.mark_seen(["u2"], now_ms=1)
    props = s.propose(10)
    assert props["url"] == ["u1"]


def test_shard_checkpoint_restore(tmp_path):
    s = _mk_shard(per_host_budget=1)
    s.enqueue(_rows(["u1", "u2", "u3"], [0.9, 0.8, 0.7]))
    s.commit(s.propose(1)["url"], now_ms=7)
    s.end_round(0)
    s.checkpoint(str(tmp_path))

    t = _mk_shard(per_host_budget=1)
    assert t.restore(str(tmp_path))
    assert t.pending_count() == s.pending_count() == 2
    assert t.seen == s.seen
    assert t.round == 0 and t.lineage
    # scheduling continues identically after restore
    assert t.propose(1)["url"] == ["u2"]
