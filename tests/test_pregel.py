"""Stationary-shard graph kernels (stages/pregel.py): BFS hop distances
and integer-HITS must equal single-process brute force on random graphs,
for any bucket/shard split."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from mklab_focused_crawler_ray.stages.pregel import (
    HITS_SCALE,
    bfs_hops,
    build_graph_layout,
    hits_scores,
)


def _random_graph(seed: int, n_nodes: int, n_edges: int):
    rng = np.random.default_rng(seed)
    urls = [f"http://site{seed}.test/p{i:04d}" for i in range(n_nodes)]
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    edges = [(urls[a], urls[b]) for a, b in zip(src, dst) if a != b]
    return urls, edges


def _layout(tmp_path, urls, edges, nb):
    import ray.data as rd

    e = pa.table(
        {
            "src": pa.array([a for a, _ in edges], pa.string()),
            "dst": pa.array([b for _, b in edges], pa.string()),
        }
    )
    n = pa.table({"url": pa.array(urls, pa.string())})
    return build_graph_layout(
        rd.from_arrow(e), rd.from_arrow(n), str(tmp_path / f"layout{nb}"), nb
    )


def _brute_bfs(urls, edges, seeds, hop_max):
    adj: dict[str, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    nodes = set(urls)
    dist = {}
    frontier = sorted(set(seeds) & nodes)
    for u in frontier:
        dist[u] = 0
    for hop in range(1, hop_max + 1):
        nxt = set()
        for u in frontier:
            nxt |= adj.get(u, set())
        frontier = sorted((nxt & nodes) - set(dist))
        for u in frontier:
            dist[u] = hop
    return dist


def _brute_hits(urls, edges, iters):
    hub = {u: HITS_SCALE for u in urls}
    auth = {}
    for _ in range(iters):
        raw = {}
        for a, b in edges:
            if a in hub:
                raw[b] = raw.get(b, 0) + hub[a]
        t = sum(raw.values())
        auth = {u: (v * HITS_SCALE // t if t > 0 else 0) for u, v in raw.items()}
        raw = {}
        for a, b in edges:
            if b in auth:
                raw[a] = raw.get(a, 0) + auth[b]
        t = sum(raw.values())
        hub = {u: (v * HITS_SCALE // t if t > 0 else 0) for u, v in raw.items()}
    return auth, hub


@pytest.mark.parametrize("seed,nb", [(3, 4), (5, 32)])
def test_bfs_matches_brute_force(ray_session, tmp_path, seed, nb):
    urls, edges = _random_graph(seed, 60, 150)
    seeds = urls[:5] + ["http://nowhere.test/x"]  # one non-page seed
    layout = _layout(tmp_path, urls, edges, nb)
    got = {
        r["url"]: int(r["hop"])
        for r in bfs_hops(layout, nb, np.array(seeds, object), 4)
        .to_pandas()
        .to_dict("records")
    }
    assert got == _brute_bfs(urls, edges, seeds, 4)


@pytest.mark.parametrize("seed,nb", [(7, 4), (11, 32)])
def test_hits_matches_brute_force(ray_session, tmp_path, seed, nb):
    urls, edges = _random_graph(seed, 50, 200)
    layout = _layout(tmp_path, urls, edges, nb)
    got = hits_scores(layout, nb, iters=3, top_k=20)
    auth, hub = _brute_hits(urls, edges, 3)
    all_urls = sorted(set(auth) | set(hub))
    rows = sorted(
        ((auth.get(u, 0), hub.get(u, 0), u) for u in all_urls),
        key=lambda r: (-r[0], r[2]),
    )[:20]
    want = [(u, a, h) for a, h, u in rows]
    have = list(
        zip(got["url"], got["auth_micro"].astype(int), got["hub_micro"].astype(int))
    )
    assert have == want


def _brute_pagerank(urls, edges, iters):
    rank = {u: 1_000_000 for u in urls}
    deg = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    for _ in range(iters):
        c = {u: 0 for u in urls}
        for a, b in edges:
            c[b] += rank[a] // deg[a]
        rank = {u: 150_000 + (85 * c[u]) // 100 for u in urls}
    return rank


@pytest.mark.parametrize("seed,nb", [(13, 4), (17, 32)])
def test_pagerank_matches_brute_force(ray_session, tmp_path, seed, nb):
    from mklab_focused_crawler_ray.stages.pregel import pagerank_top

    urls, edges = _random_graph(seed, 50, 220)
    layout = _layout(tmp_path, urls, edges, nb)
    got = pagerank_top(layout, nb, iters=5, top_k=20)
    rank = _brute_pagerank(urls, edges, 5)
    want = sorted(((-r, u) for u, r in rank.items()))[:20]
    want = [(u, -nr) for nr, u in want]
    have = list(zip(got["url"], got["rank_micro"].astype(int)))
    assert have == want
