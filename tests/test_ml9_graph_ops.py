"""Graph-scale crawl analytics (queries_ml9 + stages/cc.py): the star-
contraction CC kernel against union-find on adversarial random graphs
(long chains → multi-round convergence, self-loops, self-loop-only
nodes, duplicate edges), the hostgraph component query and personalized
PageRank against independent in-process references on the tiny fixture
(the SQL oracles bind the sf0.01 tier; these pin the tiny tier), and
the gamma audit's sign-split integer division at both extremes."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _union_find_labels(a, b) -> pd.DataFrame:
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a, b):
        rx, ry = find(str(x)), find(str(y))
        if rx != ry:
            parent[rx] = ry
    groups: dict[str, list[str]] = {}
    for n in set(map(str, a)) | set(map(str, b)):
        groups.setdefault(find(n), []).append(n)
    lab = {}
    for members in groups.values():
        m = min(members)
        for n in members:
            lab[n] = m
    return pd.DataFrame(sorted(lab.items()), columns=["node", "comp_rep"])


def _cc(edges_a, edges_b):
    import ray.data as rd

    from mklab_focused_crawler_ray.stages.cc import cc_star_components

    ds = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([str(x) for x in edges_a], pa.string()),
                "b": pa.array([str(x) for x in edges_b], pa.string()),
            }
        )
    )
    return (
        cc_star_components(ds)
        .to_pandas()
        .sort_values("node", kind="stable")
        .reset_index(drop=True)
    )


def test_cc_star_random_graphs(ray_session):
    for seed in (7, 21):
        rng = np.random.default_rng(seed)
        nodes = np.array([f"n{i:03d}" for i in range(150)])
        a = nodes[rng.integers(0, 150, 220)]
        b = nodes[rng.integers(0, 150, 220)]
        # self-loop-only node + duplicate edges + an explicit self-loop
        a = np.concatenate([a, ["z_solo", "n000", a[0]]])
        b = np.concatenate([b, ["z_solo", "n000", b[0]]])
        out = _cc(a, b)
        ref = _union_find_labels(a, b)
        pd.testing.assert_frame_equal(out, ref)


def test_cc_star_long_chain(ray_session):
    # path graph of 120 nodes: min-label needs many propagation rounds —
    # exercises the contraction loop's convergence detection, not just
    # one-round stars
    n = [f"c{i:04d}" for i in range(120)]
    out = _cc(n[:-1], n[1:])
    assert (out["comp_rep"] == "c0000").all()
    assert len(out) == 120


def test_cc_star_two_components_and_empty(ray_session):
    out = _cc(["b", "d", "x"], ["a", "b", "y"])
    lab = dict(zip(out["node"], out["comp_rep"]))
    assert lab == {"a": "a", "b": "a", "d": "a", "x": "x", "y": "x"}
    import ray.data as rd

    from mklab_focused_crawler_ray.stages.cc import cc_star_components

    empty = rd.from_arrow(
        pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string())})
    )
    assert cc_star_components(empty).count() == 0


def test_host_components_tiny_vs_union_find(ray_session, tiny_tables):
    import re

    from mklab_focused_crawler_ray.pipelines.queries_ml9 import q_host_components

    out = (
        q_host_components("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("host", kind="stable")
        .reset_index(drop=True)
    )
    pages = tiny_tables["pages"]
    host = lambda u: re.match(r"^https://([^/]+)", u).group(1)  # noqa: E731
    a, b = [], []
    for url, links in zip(
        pages["url"].to_pylist(), pages["out_links"].to_pylist()
    ):
        for l in links:
            a.append(host(url))
            b.append(host(l))
    ref = _union_find_labels(a, b).rename(columns={"node": "host"})
    pd.testing.assert_frame_equal(out, ref)


def test_pagerank_seeded_tiny_vs_numpy(ray_session, tiny_fixture):
    from mklab_focused_crawler_ray.pipelines.queries_ml9 import (
        PPR_ITERS,
        PPR_TOP,
        q_pagerank_seeded_top20,
    )

    out = q_pagerank_seeded_top20("/root/testdata/sf0.001").reset_index(drop=True)

    pages = pq.read_table(
        os.path.join(tiny_fixture, "pages.parquet"), columns=["url", "out_links"]
    )
    urls = np.array(pages["url"].to_pylist(), object).astype(str)
    node_ix = {u: i for i, u in enumerate(urls)}
    src, dst = [], []
    for u, links in zip(pages["url"].to_pylist(), pages["out_links"].to_pylist()):
        for l in links:
            if l in node_ix:  # internal edges only, multi-edges kept
                src.append(node_ix[u])
                dst.append(node_ix[l])
    src = np.array(src, np.int64)
    dst = np.array(dst, np.int64)
    deg = np.bincount(src, minlength=len(urls))
    seeds = set(
        pq.read_table(
            os.path.join(tiny_fixture, "frontier_seed.parquet"), columns=["url"]
        )["url"].to_pylist()
    )
    seed_mask = np.array([u in seeds for u in urls])
    r = np.where(seed_mask, 1_000_000, 0).astype(np.int64)
    for _ in range(PPR_ITERS):
        c = np.zeros(len(urls), np.int64)
        np.add.at(c, dst, r[src] // deg[src])
        r = np.where(seed_mask, 150_000, 0) + (85 * c) // 100
    order = np.lexsort((urls, -r))[:PPR_TOP]
    ref = pd.DataFrame({"url": urls[order], "rank_micro": r[order]})
    pd.testing.assert_frame_equal(out, ref.reset_index(drop=True))


def test_pagerank_seeded_differs_from_global(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_media import q_pagerank_top20
    from mklab_focused_crawler_ray.pipelines.queries_ml9 import (
        q_pagerank_seeded_top20,
    )

    seeded = q_pagerank_seeded_top20("/root/testdata/sf0.001")
    global_ = q_pagerank_top20("/root/testdata/sf0.001")
    assert not seeded.equals(global_)
    # teleport restricted to seeds → total seeded mass strictly below the
    # uniform-teleport mass over the same top rows
    assert seeded["rank_micro"].sum() < global_["rank_micro"].sum()


def _write_events(tmp_path, values, ts_ms):
    n = len(values)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(
                    (np.asarray(ts_ms, np.int64) * 1000), pa.timestamp("us")
                ),
                "user_id": pa.array([0] * n, pa.int64()),
                "event_type": pa.array(["t"] * n, pa.string()),
                "value": pa.array(np.asarray(values, np.float64), pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    return str(tmp_path)


BASE_MS = 1_706_000_000_000  # before queries.NOW_MS → positive ages


def test_host_cocitation_tiny_vs_brute(ray_session, tiny_tables):
    import re
    from collections import defaultdict
    from itertools import combinations

    from mklab_focused_crawler_ray.pipelines.queries_ml9 import (
        COCITE_MIN,
        q_host_cocitation_pairs,
    )

    out = (
        q_host_cocitation_pairs("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["host_a", "host_b"], kind="stable")
        .reset_index(drop=True)
    )
    pages = tiny_tables["pages"]
    host = lambda u: re.match(r"^https://([^/]+)", u).group(1)  # noqa: E731
    outs: dict[str, set] = defaultdict(set)
    for url, links in zip(pages["url"].to_pylist(), pages["out_links"].to_pylist()):
        s = host(url)
        for l in links:
            d = host(l)
            if d != s:
                outs[s].add(d)
    cnt: dict[tuple, int] = defaultdict(int)
    for s, ds in outs.items():
        for a, b in combinations(sorted(ds), 2):
            cnt[(a, b)] += 1
    ref = (
        pd.DataFrame(
            [(a, b, n) for (a, b), n in cnt.items() if n >= COCITE_MIN],
            columns=["host_a", "host_b", "n_common_sources"],
        )
        .sort_values(["host_a", "host_b"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref)


def test_host_fairness_tiny_vs_brute(ray_session, tiny_tables):
    import re
    from collections import Counter

    from mklab_focused_crawler_ray.pipelines.queries_ml9 import (
        q_host_fairness_index,
    )

    row = q_host_fairness_index("/root/testdata/sf0.001").to_pylist()[0]
    pages = tiny_tables["pages"]
    c = Counter(
        re.match(r"^https://([^/]+)", u).group(1)
        for u in pages["url"].to_pylist()
    )
    xs = list(c.values())
    total, sq = sum(xs), sum(x * x for x in xs)
    assert row["n_hosts"] == len(xs)
    assert row["n_pages"] == total
    assert row["fairness_micro"] == (total * total * 1_000_000) // (len(xs) * sq)
    assert 1_000_000 // len(xs) <= row["fairness_micro"] <= 1_000_000


def test_ann_recall_hits_vs_independent_exact(ray_session):
    import pyarrow.parquet as pq_

    from mklab_focused_crawler_ray.pipelines.queries_media import q_ann_ivf_top10
    from mklab_focused_crawler_ray.pipelines.queries_ml9 import q_ann_recall_at10

    sf = "/root/testdata/sf0.001"
    out = q_ann_recall_at10(sf).to_pandas().set_index("query_id")
    # independent exact top-10 (numpy, integer-micro cosine like the engine)
    t = pq_.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), np.int64)
    m = np.asarray(t["embedding"].to_pylist(), np.float64)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    exact = {}
    for q in range(5):
        qi = int(np.searchsorted(ids, q))
        cos = np.floor((mn @ mn[qi]) * 1_000_000 + 0.5).astype(np.int64)
        cand = np.lexsort((ids, -cos))
        top = [int(ids[i]) for i in cand if ids[i] != q][:10]
        exact[q] = set(top)
    ivf = q_ann_ivf_top10(sf)
    ivf = ivf.to_pandas() if hasattr(ivf, "to_pandas") else ivf
    for q in range(5):
        got = set(
            int(v) for qq, v in zip(ivf["query_id"], ivf["vec_id"]) if qq == q
        )
        hits = len(got & exact[q])
        assert out.loc[q, "n_hits"] == hits
        assert out.loc[q, "recall_micro"] == (hits * 1_000_000) // 10


def test_lap_var_stats_semantics():
    from mklab_focused_crawler_ray.stages.image import lap_var_stats

    flat = np.full((16, 16, 3), 128, np.uint8)
    assert lap_var_stats(flat) == (14 * 14, 0)  # constant image → 0

    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    _, v_sharp = lap_var_stats(noise)
    # 3×3 box blur of the same image must score strictly softer
    f = noise.astype(np.int64)
    blurred = (
        f[:-2, :-2] + f[:-2, 1:-1] + f[:-2, 2:]
        + f[1:-1, :-2] + f[1:-1, 1:-1] + f[1:-1, 2:]
        + f[2:, :-2] + f[2:, 1:-1] + f[2:, 2:]
    ) // 9
    _, v_soft = lap_var_stats(np.clip(blurred, 0, 255).astype(np.uint8))
    assert v_sharp > v_soft > 0

    tiny = np.zeros((2, 5, 3), np.uint8)  # no interior rows
    assert lap_var_stats(tiny) == (0, 0)


def test_exposure_stats_semantics():
    from mklab_focused_crawler_ray.stages.image import exposure_stats

    black = np.zeros((10, 10, 3), np.uint8)
    n, d, b = exposure_stats(black)
    assert (n, d, b) == (100, 100, 0)
    white = np.full((10, 10, 3), 255, np.uint8)
    n, d, b = exposure_stats(white)
    assert (n, d, b) == (100, 0, 100)
    mid = np.full((10, 10, 3), 128, np.uint8)
    assert exposure_stats(mid) == (100, 0, 0)


def test_color_stats_semantics():
    from mklab_focused_crawler_ray.stages.image import color_stats

    # solid mid-gray: zero chroma, every pixel in one bin (8,8,8) = 0x888
    flat = np.full((10, 10, 3), 0x88, np.uint8)
    n, c, db, dp = color_stats(flat)
    assert (n, c, db, dp) == (100, 0, 0x888, 1_000_000)

    # pure red: chroma 255 everywhere, dominant bin (15,0,0)
    red = np.zeros((4, 4, 3), np.uint8)
    red[..., 0] = 255
    assert color_stats(red) == (16, 255_000_000, 15 << 8, 1_000_000)

    # half red / half green: chroma still 255; tie on the two bins must
    # break to the LOWEST bin id — green (0,15,0) = 0x0F0 < red 0xF00
    half = np.zeros((2, 4, 3), np.uint8)
    half[0, :, 0] = 255
    half[1, :, 1] = 255
    n, c, db, dp = color_stats(half)
    assert (db, dp) == (15 << 4, 500_000)

    # brute-force equality on random pixels
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (9, 7, 3)).astype(np.uint8)
    n, c, db, dp = color_stats(img)
    px = img.reshape(-1, 3).astype(int)
    chroma = px.max(1) - px.min(1)
    assert n == 63 and c == (int(chroma.sum()) * 1_000_000) // 63
    from collections import Counter

    cnt = Counter(
        (p[0] >> 4) << 8 | (p[1] >> 4) << 4 | (p[2] >> 4) for p in px
    )
    best = min(sorted(cnt), key=lambda k: (-cnt[k], k))
    assert db == best and dp == (cnt[best] * 1_000_000) // 63

    assert color_stats(np.zeros((0, 5, 3), np.uint8)) == (0, 0, 0, 0)


def test_image_color_stats_flags_through_ray(ray_session):
    """The distributed query's flags replay the module thresholds and
    agree with the sequential signature table at the tiny tier."""
    import pandas as pd

    from mklab_focused_crawler_ray.pipelines.queries_media import (
        FLAT_MIN_PPM,
        GRAY_MAX_CHROMA_MICRO,
        color_signature_parquet,
        fixture_dir_for,
        q_image_color_stats,
    )

    got = (
        q_image_color_stats("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    sig = (
        pd.read_parquet(color_signature_parquet(fixture_dir_for("/root/testdata/sf0.001")))
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert got["image_id"].tolist() == sig["image_id"].tolist()
    for col in ["n_pixels", "chroma_mean_micro", "dominant_bin", "dominant_ppm"]:
        assert got[col].tolist() == sig[col].tolist()
    assert (
        got["is_gray"]
        == (sig["chroma_mean_micro"] < GRAY_MAX_CHROMA_MICRO)
    ).all()
    assert (got["is_flat"] == (sig["dominant_ppm"] > FLAT_MIN_PPM)).all()


def test_host_pagerank_weighted_tiny_vs_numpy(ray_session, tiny_tables):
    import re
    from collections import Counter

    from mklab_focused_crawler_ray.pipelines.queries_ml9 import (
        PPR_ITERS,
        q_host_pagerank_weighted,
    )

    out = (
        q_host_pagerank_weighted("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("host", kind="stable")
        .reset_index(drop=True)
    )
    pages = tiny_tables["pages"]
    host = lambda u: re.match(r"^https://([^/]+)", u).group(1)  # noqa: E731
    wc: Counter = Counter()
    hosts = set()
    for url, links in zip(pages["url"].to_pylist(), pages["out_links"].to_pylist()):
        s = host(url)
        hosts.add(s)
        for l in links:
            d = host(l)
            hosts.add(d)
            if d != s:
                wc[(s, d)] += 1
    hs = sorted(hosts)
    ix = {h: i for i, h in enumerate(hs)}
    import numpy as _np

    src = _np.array([ix[a] for a, _b in wc], _np.int64)
    dst = _np.array([ix[b] for _a, b in wc], _np.int64)
    w = _np.array(list(wc.values()), _np.int64)
    wsum = _np.zeros(len(hs), _np.int64)
    _np.add.at(wsum, src, w)
    r = _np.full(len(hs), 1_000_000, _np.int64)
    for _ in range(PPR_ITERS):
        c = _np.zeros(len(hs), _np.int64)
        _np.add.at(c, dst, (r[src] * w) // wsum[src])
        r = 150_000 + (85 * c) // 100
    ref = pd.DataFrame({"host": hs, "rank_micro": r})
    pd.testing.assert_frame_equal(out, ref)


def test_lang_mix_entropy_extremes(ray_session, tmp_path):
    from mklab_focused_crawler_ray.pipelines.queries_ml9 import (
        q_doc_lang_mix_entropy,
    )

    sf = _write_lang_docs(
        tmp_path,
        [
            ("en", "the cat and the dog of it"),       # monolingual → 0
            ("de", "the der and und"),                  # 50/50 en-de → 1 bit
            ("fr", "xyz qqq 123"),                      # no matches → 0, 0
        ],
    )
    out = q_doc_lang_mix_entropy(sf).to_pandas().set_index("doc_id")
    assert out.loc[0, "entropy_micro"] == 0 and out.loc[0, "n_matched"] > 0
    assert out.loc[1, "entropy_micro"] == 1_000_000  # H({1/2,1/2}) = 1 bit
    assert out.loc[2, "n_matched"] == 0 and out.loc[2, "entropy_micro"] == 0


def test_pagerank_convergence_decays_and_matches_numpy(ray_session, tiny_fixture):
    from mklab_focused_crawler_ray.pipelines.queries_ml9 import (
        PPR_ITERS,
        q_pagerank_convergence,
    )

    out = q_pagerank_convergence("/root/testdata/sf0.001").to_pandas()
    assert list(out["iter"]) == list(range(1, PPR_ITERS + 1))

    pages = pq.read_table(
        os.path.join(tiny_fixture, "pages.parquet"), columns=["url", "out_links"]
    )
    urls = np.array(pages["url"].to_pylist(), object).astype(str)
    node_ix = {u: i for i, u in enumerate(urls)}
    src, dst = [], []
    for u, links in zip(pages["url"].to_pylist(), pages["out_links"].to_pylist()):
        for l in links:
            if l in node_ix:
                src.append(node_ix[u])
                dst.append(node_ix[l])
    src = np.array(src, np.int64)
    dst = np.array(dst, np.int64)
    deg = np.bincount(src, minlength=len(urls))
    r = np.full(len(urls), 1_000_000, np.int64)
    ref = []
    for _ in range(PPR_ITERS):
        c = np.zeros(len(urls), np.int64)
        np.add.at(c, dst, r[src] // deg[src])
        new = 150_000 + (85 * c) // 100
        ref.append(int(np.abs(new - r).sum()))
        r = new
    assert list(out["l1_delta"]) == ref
    # geometric decay toward the fixed point (damping ~0.85 per step)
    d = out["l1_delta"].to_numpy()
    assert (d[1:] < d[:-1]).all()


def test_ann_recall_curve_monotone_and_exact_at_full_probe(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml9 import (
        RECALL_PROBES,
        q_ann_recall_curve,
    )

    out = q_ann_recall_curve("/root/testdata/sf0.001").to_pandas()
    assert list(out["nprobe"]) == list(RECALL_PROBES)
    r = out["recall_micro"].to_numpy()
    # probing more cells can only add candidates → recall non-decreasing
    assert (np.diff(r) >= 0).all()
    # nprobe == nlist probes every cell ≡ brute force → exact recall
    assert r[-1] == 1_000_000
    assert out["total_hits"].iloc[-1] == 50


def test_gamma_perfect_agreement(ray_session, tmp_path):
    from mklab_focused_crawler_ray.pipelines.queries_ml9 import q_ranker_rank_gamma

    sf = _write_events(tmp_path, [1.0, 2.0, 3.0, 4.0], BASE_MS + np.arange(4) * 1000)
    row = q_ranker_rank_gamma(sf).to_pylist()[0]
    assert row == {
        "n_top": 4,
        "concordant": 6,
        "discordant": 0,
        "gamma_micro": 1_000_000,
    }


def test_gamma_perfect_disagreement_sign_split(ray_session, tmp_path):
    from mklab_focused_crawler_ray.pipelines.queries_ml9 import q_ranker_rank_gamma

    # shares up while time goes down → every untied pair discordant; the
    # -1e6 result exercises the negative sign-split division branch
    sf = _write_events(tmp_path, [1.0, 2.0, 3.0], BASE_MS + np.array([3, 2, 1]) * 1000)
    row = q_ranker_rank_gamma(sf).to_pylist()[0]
    assert row["gamma_micro"] == -1_000_000
    assert row["concordant"] == 0 and row["discordant"] == 3


def _write_docs(tmp_path, rows):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["s"] * len(rows), pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_trigram_backoff_all_tiers(ray_session, tmp_path):
    """Crafted corpus forcing every stupid-backoff tier on held-out docs
    (ids 0/1/2 are train, 3 is held-out under the split hash), checked
    against a direct brute-force replay of the tier definitions."""
    import math
    import re
    from collections import Counter

    from mklab_focused_crawler_ray.pipelines.queries_ml9 import (
        q_doc_trigram_backoff,
    )

    train_texts = ["the cat sat on the mat", "the cat ran", "a dog sat"]
    # held-out doc: "the cat sat" (tier1: trained trigram), "cat sat down"
    # (c3=0 but bc="sat down"? not trained → check tier3 via unseen word),
    # "ran far away" (unseen everything), "on the mat" (tier1), "dog sat
    # on" (c3=0, bc="sat on" trained → tier2)
    held_text = "the cat sat on the mat zz dog sat on qq ran"
    rows = [(0, train_texts[0]), (1, train_texts[1]), (2, train_texts[2]),
            (3, held_text)]
    sf = _write_docs(tmp_path, rows)
    out = q_doc_trigram_backoff(sf).to_pandas()

    tok = lambda t: re.findall(r"[a-z0-9]+", t.lower())  # noqa: E731
    tr_tokens = [tok(t) for t in train_texts]
    c3: Counter = Counter()
    c2: Counter = Counter()
    c1: Counter = Counter()
    for tk in tr_tokens:
        c1.update(tk)
        c2.update(f"{tk[i]} {tk[i+1]}" for i in range(len(tk) - 1))
        c3.update(f"{tk[i]} {tk[i+1]} {tk[i+2]}" for i in range(len(tk) - 2))
    T, V = sum(c1.values()), len(c1)
    tk = tok(held_text)
    tiers_hit = set()
    lp_sum = 0
    for i in range(len(tk) - 2):
        a, b, c = tk[i], tk[i + 1], tk[i + 2]
        tri = f"{a} {b} {c}"
        if c3[tri] > 0:
            s = c3[tri] / c2[f"{a} {b}"]
            tiers_hit.add(1)
        elif c2[f"{b} {c}"] > 0:
            s = 0.4 * c2[f"{b} {c}"] / c1[b]
            tiers_hit.add(2)
        else:
            s = 0.16 * (c1[c] + 1.0) / float(T + V)
            tiers_hit.add(3)
        lp_sum += int(math.floor(math.log10(s) * 1_000_000 + 0.5))
    assert tiers_hit == {1, 2, 3}  # the corpus exercises every tier
    assert len(out) == 1
    assert out["doc_id"].iloc[0] == 3
    assert out["n_trigrams"].iloc[0] == len(tk) - 2
    assert out["logprob_micro"].iloc[0] == lp_sum


def test_levenshtein_matches_duckdb(ray_session):
    import duckdb

    from mklab_focused_crawler_ray.pipelines.queries_ml9 import _levenshtein

    rng = np.random.default_rng(11)
    alpha = list("abcde ")
    for _ in range(60):
        a = "".join(rng.choice(alpha, rng.integers(0, 9)))
        b = "".join(rng.choice(alpha, rng.integers(0, 9)))
        (d,) = duckdb.sql(
            "SELECT levenshtein(?, ?)", params=[a, b]
        ).fetchone()
        assert _levenshtein(a, b) == d, (a, b)


def _write_parts(tmp_path, names):
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(1, len(names) + 1), pa.int64()),
                "p_name": pa.array(names, pa.string()),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    return str(tmp_path)


def test_sorted_neighborhood_cross_bucket_pairs(ray_session, tmp_path):
    """Names straddling 2-char prefix boundaries (and single-row / empty
    prefixes) force the driver's rolling-tail stitch; checked against a
    brute-force global window over the full sorted order."""
    from mklab_focused_crawler_ray.pipelines.queries_ml9 import (
        SNM_MAXD,
        SNM_W,
        _levenshtein,
        q_sorted_neighborhood_pairs,
    )

    names = [
        "azure box",   # prefix az — last of its bucket
        "bzure box",   # prefix bz (1-row bucket) — dist 1 to both neighbors
        "czure box",   # prefix cz (1-row bucket) — spans TWO boundaries
        "azure boxx",
        "dzzz unrelated",
        "aaa first",
    ]
    sf = _write_parts(tmp_path, names)
    out = (
        q_sorted_neighborhood_pairs(sf)
        .to_pandas()
        .sort_values(["part_a", "part_b"], kind="stable")
        .reset_index(drop=True)
    )

    order = sorted(
        range(len(names)), key=lambda i: (names[i].lower(), i + 1)
    )
    ref = []
    for off in range(1, SNM_W):
        for i in range(len(order) - off):
            a, b = order[i], order[i + off]
            d = _levenshtein(names[a].lower(), names[b].lower())
            if d <= SNM_MAXD:
                ref.append((a + 1, b + 1, d))
    refdf = (
        pd.DataFrame(ref, columns=["part_a", "part_b", "dist"])
        .sort_values(["part_a", "part_b"], kind="stable")
        .reset_index(drop=True)
    )
    # the crafted names must actually exercise a cross-boundary pair
    assert any(
        names[a - 1][:2] != names[b - 1][:2] for a, b, _ in ref
    )
    pd.testing.assert_frame_equal(out, refdf)


def _write_lang_docs(tmp_path, rows):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[0] for r in rows], pa.string()),
                "source": pa.array(["s"] * len(rows), pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_lang_temperature_odds_reference_and_values(ray_session, tmp_path):
    import math

    from mklab_focused_crawler_ray.pipelines.queries_ml9 import (
        TEMP_ALPHA,
        q_lang_temperature_odds,
    )

    # en: 8 tokens, de: 8 tokens (tie → 'de' wins lang-asc), fr: 1 token
    sf = _write_lang_docs(
        tmp_path,
        [
            ("en", "a b c d e f g h"),
            ("de", "a b c d e f g h"),
            ("fr", "x"),
        ],
    )
    out = q_lang_temperature_odds(sf).to_pandas()
    row = dict(zip(out["lang"], out["odds_micro"]))
    assert row["de"] == 1_000_000  # the reference language
    assert row["en"] == 1_000_000  # tied token count → odds 1
    expect_fr = int(math.floor((1 / 8) ** TEMP_ALPHA * 1_000_000 + 0.5))
    assert row["fr"] == expect_fr
    # low-resource upweighting: odds far above the raw 1/8 proportion
    assert expect_fr > 125_000


def test_gamma_ties_excluded(ray_session, tmp_path):
    from mklab_focused_crawler_ray.pipelines.queries_ml9 import q_ranker_rank_gamma

    # two value-tied rows: their pair counts in neither C nor D
    sf = _write_events(tmp_path, [5.0, 5.0, 1.0], BASE_MS + np.array([1, 2, 3]) * 1000)
    row = q_ranker_rank_gamma(sf).to_pylist()[0]
    assert row["concordant"] + row["discordant"] == 2
    assert row["gamma_micro"] == -1_000_000


def test_event_value_ks_pairs_brute_force(ray_session, tmp_path):
    """Planted three-type events table: the distributed bucketed KS must
    equal a direct numpy sup-norm CDF gap, including a pair with an
    obvious planted shift and a pair of identical samples (ks_num 0)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from mklab_focused_crawler_ray.pipelines.queries_ml9 import (
        q_event_value_ks_pairs,
    )

    rng = np.random.default_rng(7)
    va = np.round(rng.uniform(0, 1, 300), 3)  # repeats → tied values
    vb = np.round(rng.uniform(0.5, 1.5, 200), 3)  # planted shift vs A
    vc = va.copy()  # identical to A → ks_num must be 0
    types = ["A"] * 300 + ["B"] * 200 + ["C"] * 300
    vals = np.concatenate([va, vb, vc])
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(800), pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array(vals, pa.float64()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = (
        q_event_value_ks_pairs(str(tmp_path))
        .to_pandas()
        .sort_values(["type_a", "type_b"])
        .reset_index(drop=True)
    )

    def brute(x, y):
        uv = np.unique(np.concatenate([x, y]))
        cx = np.searchsorted(np.sort(x), uv, side="right").astype(object)
        cy = np.searchsorted(np.sort(y), uv, side="right").astype(object)
        return int(np.abs(cx * len(y) - cy * len(x)).max())

    exp = []
    samples = {"A": va, "B": vb, "C": vc}
    for a, b in (("A", "B"), ("A", "C"), ("B", "C")):
        k = brute(samples[a], samples[b])
        na, nb = len(samples[a]), len(samples[b])
        exp.append((a, b, na, nb, k, (k * 1_000_000) // (na * nb)))
    expdf = pd.DataFrame(
        exp, columns=["type_a", "type_b", "n_a", "n_b", "ks_num", "ks_micro"]
    )
    pd.testing.assert_frame_equal(got, expdf, check_dtype=False)
    assert got.set_index(["type_a", "type_b"]).loc[("A", "C"), "ks_num"] == 0
    # the planted shift must dominate the identical pair
    g = got.set_index(["type_a", "type_b"])
    assert g.loc[("A", "B"), "ks_micro"] > 400_000


def test_unimax_allocation_planted_caps(ray_session, tmp_path):
    """Skewed planted sources: tiny sources must be capped (fully
    consumed), big ones waterfilled to a uniform level, remainder to the
    lexicographically-first uncapped sources; engine == DuckDB replay."""
    import duckdb

    from mklab_focused_crawler_ray.pipelines.queries_ml9 import (
        UNIMAX_BUDGET_PCT,
        _unimax_sql,
        q_unimax_allocation,
    )

    assert UNIMAX_BUDGET_PCT == 50
    # tokens per doc = words; plant: a=2, b=10, c=100, d=101 (total 213,
    # T=106: a capped at 2, b capped at 10, level for c,d = 47 each = 94
    # → 2+10+47+47=106, r=0; then tweak with e=1 to get a remainder case)
    docs = []
    for src, words in (("a", 2), ("b", 10), ("c", 100), ("d", 101), ("e", 1)):
        docs.append((src, " ".join(f"w{i}" for i in range(words))))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array([s for s, _ in docs], pa.string()),
            "n_chars": pa.array(
                [len(t) for _, t in docs], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    got = (
        q_unimax_allocation(str(tmp_path))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    # brute force: total=214, T=107; sorted by n: e=1,a=2,b=10,c=100,d=101
    # e,a,b capped (1+2+10=13); rem=94 over {c,d}: s=47 r=0 → c=47, d=47
    exp = pd.DataFrame(
        {
            "source": ["a", "b", "c", "d", "e"],
            "n_tokens": [2, 10, 100, 101, 1],
            "alloc_tokens": [2, 10, 47, 47, 1],
            "capped": [True, True, False, False, True],
        }
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got["alloc_tokens"].sum() == (214 * 50) // 100

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    sql = con.execute(_unimax_sql()).df().sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, sql, check_dtype=False)


def test_unimax_allocation_remainder_rule(ray_session, tmp_path):
    """Remainder goes +1 to the lexicographically-first uncapped sources."""
    # sources x=9, y=9, z=9; total 27, T=13: no caps (13 <= 9*3 at i=1?
    # pivot check: T - 0 = 13 <= 9*3 → level over all three: s=4 r=1 →
    # x=5, y=4, z=4
    docs = [(s, " ".join(f"w{i}" for i in range(9))) for s in ("x", "y", "z")]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array([s for s, _ in docs], pa.string()),
            "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    from mklab_focused_crawler_ray.pipelines.queries_ml9 import (
        q_unimax_allocation,
    )

    got = (
        q_unimax_allocation(str(tmp_path))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert got["alloc_tokens"].tolist() == [5, 4, 4]
    assert got["capped"].tolist() == [False, False, False]


def test_ann_matryoshka_recall_planted(ray_session, tmp_path):
    """Embeddings with zero tails beyond MRL_DIM: the truncated ranking
    is the full ranking, so every query's recall must be exactly 1.0 —
    pins the truncation slice, the tie-exact top-k, and the hit join."""
    from mklab_focused_crawler_ray.pipelines.queries_ml9 import (
        MRL_DIM,
        q_ann_matryoshka_recall,
    )

    rng = np.random.default_rng(31)
    n, d = 60, 64
    emb = np.zeros((n, d), np.float32)
    emb[:, :MRL_DIM] = rng.normal(size=(n, MRL_DIM)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "embedding": pa.array(
                    [e.tolist() for e in emb], pa.list_(pa.float32())
                ),
                "label": pa.array(np.zeros(n, np.int32), pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    got = q_ann_matryoshka_recall(str(tmp_path)).to_pandas()
    assert len(got) == 5
    assert (got["recall_micro"] == 1_000_000).all()
    assert (got["n_hits"] == 10).all()


def test_knn_hubness_invariants(ray_session):
    """Histogram mass = node count; edge mass = KNN_K · n (every node
    emits exactly K out-edges, so Σ in_degree·n_nodes = K·n)."""
    import pyarrow.parquet as pq_

    from mklab_focused_crawler_ray.pipelines.queries_ml4 import (
        KNN_K,
        q_knn_hubness_hist,
    )

    got = q_knn_hubness_hist("/root/testdata/sf0.001").to_pandas()
    n = pq_.read_metadata("/root/testdata/sf0.001/embeddings.parquet").num_rows
    assert int(got["n_nodes"].sum()) == n
    assert int((got["in_degree"] * got["n_nodes"]).sum()) == KNN_K * n
    assert got["in_degree"].is_monotonic_increasing


def test_kcenter_coreset_vs_numpy(ray_session):
    """Independent greedy farthest-point replay in numpy must reproduce
    the distributed selection exactly (ids, order, radii); the coverage
    radius must be non-increasing after the seed row."""
    from mklab_focused_crawler_ray.pipelines.queries import _micro
    from mklab_focused_crawler_ray.pipelines.queries_ml9 import (
        KCENTER_K,
        q_kcenter_coreset,
    )

    got = q_kcenter_coreset("/root/testdata/sf0.001").to_pandas()

    t = pq.read_table(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"],
    )
    ids = t["vec_id"].to_numpy().astype(np.int64)
    emb = np.stack([np.asarray(e, np.float64) for e in t["embedding"].to_pylist()])
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, emb = ids[order], emb[order]
    sel = [0]  # index of lowest vec_id after sort
    radii = [0]
    for _ in range(KCENTER_K - 1):
        cos = _micro(emb @ emb[sel].T)  # (n, |sel|)
        maxcos = cos.max(axis=1)
        mask = ~np.isin(np.arange(len(ids)), sel)
        cand = np.where(mask)[0]
        o = cand[np.lexsort((ids[cand], maxcos[cand]))[0]]
        sel.append(int(o))
        radii.append(1_000_000 - int(maxcos[o]))
    assert got["vec_id"].tolist() == ids[sel].tolist()
    assert got["min_dist_micro"].tolist() == radii
    assert (np.diff(got["min_dist_micro"].to_numpy()[1:]) <= 0).all()


def test_kmeans_purity_invariants_and_planted(ray_session, tmp_path):
    """Planted separable embeddings: purity must be 1.0 when clusters
    align with labels; majority ties must break to the smaller label."""
    from mklab_focused_crawler_ray.pipelines.queries_ml import KMEANS_K
    from mklab_focused_crawler_ray.pipelines.queries_ml9 import q_kmeans_purity

    assert KMEANS_K == 8
    # 8 orthogonal axis directions as both centroids (vec_id<8) and
    # members: vec i gets axis i%8 → every cluster pure, label = i%8
    n, d = 64, 64
    emb = np.zeros((n, d), np.float32)
    for i in range(n):
        emb[i, i % 8] = 1.0
        emb[i, 8 + (i % 8)] = 0.25  # off-axis but still nearest to axis
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "embedding": pa.array(
                    [e.tolist() for e in emb], pa.list_(pa.float32())
                ),
                "label": pa.array((np.arange(n) % 8).astype(np.int32), pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    got = q_kmeans_purity(str(tmp_path)).to_pandas()
    assert (got["purity_micro"] == 1_000_000).all()
    assert got["top_label"].tolist() == list(range(8))
    assert int(got["n_vecs"].sum()) == n

    # real fixture: mass conservation + purity in (0, 1]
    real = q_kmeans_purity("/root/testdata/sf0.001").to_pandas()
    assert int(real["n_vecs"].sum()) == 500
    assert ((real["purity_micro"] > 0) & (real["purity_micro"] <= 1_000_000)).all()
    assert (real["top_count"] <= real["n_vecs"]).all()


def test_dhash64_semantics():
    from mklab_focused_crawler_ray.stages.image import dhash64

    flat = np.full((32, 32, 3), 100, np.uint8)
    assert dhash64(flat) == 0  # no gradient anywhere

    # monotone left-to-right brightness ramp → every comparison true
    ramp = np.tile(
        np.linspace(0, 255, 36, dtype=np.uint8)[None, :, None], (16, 1, 3)
    )
    assert dhash64(ramp) == 0x7FFFFFFFFFFFFFFF  # all 63 usable bits set

    # brightness-shifted copy keeps the hash (gradients unchanged)
    rng = np.random.default_rng(3)
    img = rng.integers(30, 200, (40, 50, 3)).astype(np.uint8)
    assert dhash64(img) == dhash64(np.clip(img.astype(int) + 20, 0, 255).astype(np.uint8))

    # transpose changes gradients → different hash (sanity, not identity)
    assert dhash64(img) != dhash64(np.transpose(img, (1, 0, 2)))


def test_kmeans_nmi_planted_extremes(ray_session, tmp_path):
    """Perfectly-aligned planted clusters → NMI = 1.0 (within envelope
    rounding); label-independent assignment → MI ≈ 0."""
    from mklab_focused_crawler_ray.pipelines.queries_ml9 import q_kmeans_nmi

    n, d = 64, 64
    emb = np.zeros((n, d), np.float32)
    for i in range(n):
        emb[i, i % 8] = 1.0

    def write(labels):
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                    "embedding": pa.array(
                        [e.tolist() for e in emb], pa.list_(pa.float32())
                    ),
                    "label": pa.array(labels.astype(np.int32), pa.int32()),
                }
            ),
            str(tmp_path / "embeddings.parquet"),
        )
        return str(tmp_path)

    # aligned: label == cluster → H(label|cluster)=0, MI=H, NMI=1
    got = q_kmeans_nmi(write(np.arange(n) % 8)).to_pandas().iloc[0]
    assert got["h_within_micro"] == 0
    assert got["mi_micro"] == got["h_label_micro"]
    assert abs(got["nmi_micro"] - 1_000_000) <= 5  # envelope rounding

    # independent: one label for vectors of EVERY cluster equally
    # (labels cycle 0/1 orthogonally to the 8 clusters) → MI ≈ 0
    got = q_kmeans_nmi(write(np.arange(n) // 32)).to_pandas().iloc[0]
    assert abs(int(got["mi_micro"])) <= 5
    assert abs(int(got["nmi_micro"])) <= 20


def test_kmeans_ari_extremes_and_sklearn_formula(ray_session, tmp_path):
    """Aligned planted clusters → ARI = 1.0; label-independent →
    ARI ≈ 0 (can be slightly negative — the chance correction); and the
    integer formula must equal a float reference on the real fixture."""
    from mklab_focused_crawler_ray.pipelines.queries_ml9 import q_kmeans_ari

    n, d = 64, 64
    emb = np.zeros((n, d), np.float32)
    for i in range(n):
        emb[i, i % 8] = 1.0

    def write(labels):
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                    "embedding": pa.array(
                        [e.tolist() for e in emb], pa.list_(pa.float32())
                    ),
                    "label": pa.array(labels.astype(np.int32), pa.int32()),
                }
            ),
            str(tmp_path / "embeddings.parquet"),
        )
        return str(tmp_path)

    got = q_kmeans_ari(write(np.arange(n) % 8)).to_pandas().iloc[0]
    assert got["ari_micro"] == 1_000_000
    got = q_kmeans_ari(write(np.arange(n) // 32)).to_pandas().iloc[0]
    assert abs(int(got["ari_micro"])) < 50_000  # ≈ 0 under independence

    # float cross-check on the driver fixture (formula identity)
    r = q_kmeans_ari("/root/testdata/sf0.001").to_pandas().iloc[0]
    ix, a, b = (
        float(r["sum_pairs_both"]),
        float(r["sum_pairs_cluster"]),
        float(r["sum_pairs_label"]),
    )
    nn = int(r["n_vecs"])
    p = nn * (nn - 1) / 2
    expect = (ix - a * b / p) / ((a + b) / 2 - a * b / p)
    assert abs(r["ari_micro"] / 1e6 - expect) < 2e-6


def test_event_interarrival_expfit_brute_force(ray_session, tmp_path):
    """Planted Poisson arrivals must score a SMALL KS distance and
    planted perfectly-periodic arrivals a LARGE one; both must equal a
    direct numpy replay of the tie-exact one-sample statistic."""
    from mklab_focused_crawler_ray.pipelines.queries_ml9 import (
        q_event_interarrival_expfit,
    )

    rng = np.random.default_rng(13)
    base = 1_704_067_200_000_000
    pois = base + np.cumsum(
        rng.exponential(1_000_000, 400).astype(np.int64) + 1
    )
    peri = base + np.arange(300, dtype=np.int64) * 2_000_000
    ts = np.concatenate([pois, peri])
    types = ["pois"] * len(pois) + ["peri"] * len(peri)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(len(ts)), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array(np.zeros(len(ts)), pa.float64()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = (
        q_event_interarrival_expfit(str(tmp_path))
        .to_pandas()
        .set_index("event_type")
    )

    def brute(arr):
        v = np.sort(np.diff(np.sort(arr)))
        n, s = len(v), int(v.sum())
        uv = np.unique(v)
        le = np.searchsorted(v, uv, side="right")
        lt = np.searchsorted(v, uv, side="left")
        fm = np.floor(
            (1.0 - np.exp(-(uv.astype(np.float64) * n) / s)) * 1_000_000 + 0.5
        ).astype(np.int64)
        d = np.maximum(
            np.abs(le * 1_000_000 // n - fm), np.abs(lt * 1_000_000 // n - fm)
        )
        return n, s, int(d.max())

    for name, arr in (("pois", pois), ("peri", peri)):
        n, s, d = brute(arr)
        assert int(got.loc[name, "n_gaps"]) == n
        assert int(got.loc[name, "sum_gap_us"]) == s
        assert int(got.loc[name, "ks_micro"]) == d
    # Poisson fits (KS well under the 5% critical band for n≈400);
    # periodic arrivals are maximally non-exponential
    assert got.loc["pois", "ks_micro"] < 70_000
    assert got.loc["peri", "ks_micro"] > 300_000
