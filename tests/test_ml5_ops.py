"""Round-4 (cont.) operators: exact substring-duplication spans."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mklab_focused_crawler_ray.pipelines.queries_ml5 import (
    DUPSPAN_L,
    _doc_grams_u,
    q_substring_dup_spans,
)


def _write_docs(tmp_path, texts):
    tmp_path.joinpath("documents.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["s"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def _brute_spans(texts):
    """Reference implementation: explicit gram counting + interval merge."""
    from collections import Counter

    c = Counter()
    for t in texts:
        for i in range(len(t) - DUPSPAN_L + 1):
            c[t[i : i + DUPSPAN_L]] += 1
    out = []
    for d, t in enumerate(texts):
        pos = [
            i
            for i in range(len(t) - DUPSPAN_L + 1)
            if c[t[i : i + DUPSPAN_L]] >= 2
        ]
        if not pos:
            continue
        start, end = pos[0], pos[0] + DUPSPAN_L
        for p in pos[1:]:
            if p > end:  # gap: close the island
                out.append((d, start, end - start))
                start = p
            end = p + DUPSPAN_L
        out.append((d, start, end - start))
    return sorted(out)


def test_doc_grams_ascii_matches_generic():
    t = "the quick brown fox jumps over the lazy dog again and again"
    fast = _doc_grams_u(t)
    slow = np.array(
        [t[i : i + DUPSPAN_L] for i in range(len(t) - DUPSPAN_L + 1)],
        dtype=f"U{DUPSPAN_L}",
    )
    assert (fast == slow).all()


def test_doc_grams_short_and_nonascii():
    assert len(_doc_grams_u("short")) == 0
    t = "héllo wörld répeated text héllo wörld répeated text!"
    g = _doc_grams_u(t)  # generic path: char (not byte) positions
    assert g[0] == t[:DUPSPAN_L]
    assert len(g) == len(t) - DUPSPAN_L + 1


def test_substring_dup_spans_matches_brute_force(ray_session, tmp_path):
    rep = "A COMMON BOILER SENTENCE OF LENGTH WELL OVER L CHARS. "
    texts = [
        rep + "unique tail one with its own distinct words xyzzy",
        "different head material then " + rep + "and trailing junk qq",
        # self-repetition inside a single doc (no cross-doc copy):
        "zelf " + ("SELFREPEATED-BLOCK-0123456789 " * 3) + " end",
        "wholly unique document with nothing repeated at all anywhere",
        "tiny",
    ]
    sf = _write_docs(tmp_path, texts)
    got = (
        q_substring_dup_spans(sf)
        .to_pandas()
        .sort_values(["doc_id", "span_start"])
        .itertuples(index=False)
    )
    got = sorted((int(a), int(b), int(c)) for a, b, c in got)
    assert got == _brute_spans(texts)
    # doc 3 (unique) and doc 4 (too short) must not appear
    docs = {d for d, _, _ in got}
    assert 3 not in docs and 4 not in docs and 2 in docs


def test_touching_spans_merge(ray_session, tmp_path):
    # two copies of a long block → every interior gram duplicated →
    # ONE maximal span covering the whole block in each doc
    block = "0123456789" * 6  # 60 chars
    texts = [block + " left unique padding", "right unique padding " + block]
    sf = _write_docs(tmp_path, texts)
    df = q_substring_dup_spans(sf).to_pandas()
    assert len(df) == 2
    by_doc = {int(r.doc_id): (int(r.span_start), int(r.span_len)) for r in df.itertuples()}
    # NOTE: "0123456789"*6 is internally periodic, so duplicated grams
    # extend past the block only where the neighbouring text happens to
    # repeat — with unique padding the span is exactly the block
    assert by_doc[0][0] == 0 and by_doc[0][1] >= 60
    assert by_doc[1][1] >= 60


# -- seed_hop_distance ------------------------------------------------------


def test_seed_hop_distance_matches_python_bfs(ray_session):
    """Engine BFS vs a reference single-process BFS on the tiny fixture."""
    from collections import deque

    import pyarrow.parquet as pq2

    from mklab_focused_crawler_ray.pipelines.queries_ml5 import (
        HOP_MAX,
        q_seed_hop_distance,
    )
    from mklab_focused_crawler_ray.pipelines.queries_media import fixture_dir_for

    sf = "/root/testdata/sf0.001"  # maps to the tiny fixture tier
    fdir = fixture_dir_for(sf)
    pages = pq2.read_table(fdir + "/pages.parquet", columns=["url", "out_links"])
    urls = pages["url"].to_pylist()
    adj = dict(zip(urls, pages["out_links"].to_pylist()))
    seeds = set(
        pq2.read_table(fdir + "/frontier_seed.parquet", columns=["url"])["url"].to_pylist()
    ) & set(urls)

    dist = {u: 0 for u in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= HOP_MAX:
            continue
        for v in adj.get(u) or ():
            if v in adj and v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)

    got = q_seed_hop_distance(sf).to_pandas()
    got_map = dict(zip(got["url"], got["hop"].astype(int)))
    assert got_map == dist
    assert 0 in set(dist.values())  # seeds present


# -- hits_top20 -------------------------------------------------------------


def test_hits_top20_matches_python_reference(ray_session):
    """Integer HITS on the tiny fixture vs a dict-based reference."""
    from collections import defaultdict

    import pyarrow.parquet as pq2

    from mklab_focused_crawler_ray.pipelines.queries_ml5 import (
        HITS_ITERS,
        HITS_SCALE,
        HITS_TOP,
        q_hits_top20,
    )
    from mklab_focused_crawler_ray.pipelines.queries_media import fixture_dir_for

    sf = "/root/testdata/sf0.001"
    fdir = fixture_dir_for(sf)
    pages = pq2.read_table(fdir + "/pages.parquet", columns=["url", "out_links"])
    urls = pages["url"].to_pylist()
    nodeset = set(urls)
    edges = [
        (u, v)
        for u, links in zip(urls, pages["out_links"].to_pylist())
        for v in (links or ())
        if v in nodeset
    ]

    def half(scores, flip):
        raw = defaultdict(int)
        for s, d in edges:
            k, j = (d, s) if not flip else (s, d)
            raw[k] += scores.get(j, 0)
        tot = sum(raw.values())
        if tot <= 0:
            return {k: 0 for k in raw}
        return {k: v * HITS_SCALE // tot for k, v in raw.items()}

    hub = {u: HITS_SCALE for u in urls}
    for _ in range(HITS_ITERS):
        auth = half(hub, flip=False)  # authority ← Σ in-hub
        hub = half(auth, flip=True)  # hub ← Σ out-authority
    exp = sorted(
        ((u, auth.get(u, 0), hub.get(u, 0)) for u in urls),
        key=lambda r: (-r[1], r[0]),
    )[:HITS_TOP]

    got = q_hits_top20(sf)  # pandas since r5 (per-shard top-k merge)
    got_rows = [
        (r.url, int(r.auth_micro), int(r.hub_micro)) for r in got.itertuples()
    ]
    assert got_rows == exp


# -- bpe_merge_step ---------------------------------------------------------


def test_pair_counts_u16_respects_word_boundaries():
    from mklab_focused_crawler_ray.pipelines.queries_ml5 import _pair_counts_u16

    blob = np.frombuffer(b"ab ab", np.uint8)
    codes, cnt = _pair_counts_u16(blob)
    got = {chr(c >> 8) + chr(c & 255): int(n) for c, n in zip(codes, cnt)}
    assert got == {"ab": 2}  # 'b ' and ' a' masked out

    codes, cnt = _pair_counts_u16(np.frombuffer(b"aaa", np.uint8))
    got = {chr(c >> 8) + chr(c & 255): int(n) for c, n in zip(codes, cnt)}
    assert got == {"aa": 2}  # overlapping pair occurrences both count

    codes, cnt = _pair_counts_u16(np.frombuffer(b"x", np.uint8))
    assert len(codes) == 0


def test_bpe_merge_step_tiny_corpus(ray_session, tmp_path):
    from mklab_focused_crawler_ray.pipelines.queries_ml5 import (
        BPE_MERGE_MARK,
        q_bpe_merge_step,
    )

    # 'th' is the clear winner; after merging, '\x01e' pairs must surface
    texts = ["the thin thorn", "then the theme", "other than that"]
    sf = _write_docs(tmp_path, texts)
    out = q_bpe_merge_step(sf).to_pandas()
    pairs = dict(zip(out["pair"], out["n"].astype(int)))
    assert all(len(p) == 2 for p in pairs)
    assert "th" not in pairs  # fully merged away
    assert pairs[BPE_MERGE_MARK + "e"] == 5  # the, then, the, theme, other


# -- image_token_cost -------------------------------------------------------


def test_image_token_cost_totals(ray_session):
    import pyarrow.parquet as pq2

    from mklab_focused_crawler_ray.pipelines.queries_ml5 import (
        AR_TARGET_DIMS,
        VIT_PATCH,
        q_image_token_cost,
    )
    from mklab_focused_crawler_ray.pipelines.queries_media import _images

    sf = "/root/testdata/sf0.001"
    n_total = pq2.read_table(_images(sf), columns=["image_id"]).num_rows
    df = q_image_token_cost(sf).to_pandas()
    assert int(df["n_images"].sum()) == n_total
    # per-bucket vision tokens are exactly n_images × the bucket constant
    per = {
        (tw // VIT_PATCH) * (th // VIT_PATCH) + 1 for tw, th in AR_TARGET_DIMS
    }
    for r in df.itertuples():
        assert int(r.vision_tokens) % int(r.n_images) == 0
        assert int(r.vision_tokens) // int(r.n_images) in per


# -- curriculum_order -------------------------------------------------------


def test_curriculum_order_brute_force(ray_session, tmp_path):
    from mklab_focused_crawler_ray.functions.text import quality_features
    from mklab_focused_crawler_ray.pipelines.queries import _micro
    from mklab_focused_crawler_ray.pipelines.queries_ml5 import q_curriculum_order

    texts = [
        "a solid quality document with plenty of normal words in it",
        "short",
        "another decent length document of ordinary english words here",
        "x",
        "mid length words making a fine document overall",
        "tiny words",
    ]
    langs = ["en", "en", "de", "de", "fr", "fr"]
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    pq2.write_table(
        pa2.table(
            {
                "doc_id": pa2.array(range(len(texts)), pa2.int64()),
                "text": pa2.array(texts),
                "lang": pa2.array(langs),
                "source": pa2.array(["s"] * len(texts)),
                "n_chars": pa2.array([len(t) for t in texts], pa2.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    qm = _micro(np.array([quality_features(t)["quality"] for t in texts]))
    rows = sorted(zip(range(len(texts)), langs, qm), key=lambda r: (r[1], -r[2], r[0]))
    lang_rank, seen = {}, {}
    for d, lg, _ in rows:
        seen[lg] = seen.get(lg, 0) + 1
        lang_rank[d] = seen[lg]
    merged = sorted(range(len(texts)), key=lambda d: (lang_rank[d], langs[d]))
    global_ord = {d: i + 1 for i, d in enumerate(merged)}

    got = q_curriculum_order(str(tmp_path)).to_pandas()
    for r in got.itertuples():
        assert int(r.lang_rank) == lang_rank[int(r.doc_id)], r
        assert int(r.global_ord) == global_ord[int(r.doc_id)], r
    assert len(got) == len(texts)


# -- shard_assign_sources ---------------------------------------------------


def test_lpt_assign_kernel():
    from mklab_focused_crawler_ray.pipelines.queries_ml5 import _lpt_assign

    # weights pre-sorted desc; classic LPT: 8,7,6,5 over 2 shards → loads 13/13
    shard = _lpt_assign(np.array([8, 7, 6, 5], np.int64), 2)
    assert shard.tolist() == [0, 1, 1, 0]
    # ties pick the lowest shard index
    shard = _lpt_assign(np.array([1, 1, 1], np.int64), 4)
    assert shard.tolist() == [0, 1, 2]


def test_shard_assign_balances(ray_session, tmp_path):
    from mklab_focused_crawler_ray.pipelines.queries_ml5 import (
        LPT_SHARDS,
        q_shard_assign_sources,
    )

    texts = [f"doc body number {i} with some words" for i in range(40)]
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    pq2.write_table(
        pa2.table(
            {
                "doc_id": pa2.array(range(40), pa2.int64()),
                "text": pa2.array(texts),
                "lang": pa2.array(["en"] * 40),
                "source": pa2.array([f"s{i % 10}" for i in range(40)]),
                "n_chars": pa2.array([len(t) * (1 + i % 7) for i, t in enumerate(texts)], pa2.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = q_shard_assign_sources(str(tmp_path)).to_pandas()
    assert len(out) == 10
    assert set(out["shard"]) <= set(range(LPT_SHARDS))
    loads = out.groupby("shard")["w_chars"].sum()
    # LPT guarantee: max load ≤ (4/3 − 1/3K)·OPT ≤ 4/3 · total/K + max item
    assert loads.max() <= (out["w_chars"].sum() // LPT_SHARDS) * 4 // 3 + out["w_chars"].max()


# -- source_budget_docs -----------------------------------------------------


def test_source_budget_first_fit_overshoot(ray_session, tmp_path):
    from mklab_focused_crawler_ray.pipelines.queries_ml5 import (
        SRC_BUDGET_CHARS,
        _KNUTH_H,
        q_source_budget_docs,
    )

    import pyarrow as pa2
    import pyarrow.parquet as pq2

    # one source, 5 docs of 1500 chars: hash order decides which three
    # fit (0 + 1500 + 3000 < 4000 ⇒ kept; the third overshoots once)
    n = 5
    pq2.write_table(
        pa2.table(
            {
                "doc_id": pa2.array(range(n), pa2.int64()),
                "text": pa2.array(["x" * 1500] * n),
                "lang": pa2.array(["en"] * n),
                "source": pa2.array(["only"] * n),
                "n_chars": pa2.array([1500] * n, pa2.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = q_source_budget_docs(str(tmp_path)).to_pandas()
    hs = sorted(range(n), key=lambda d: ((d * _KNUTH_H) % (1 << 32), d))
    expect = hs[:3]  # cum_before 0, 1500, 3000 all < 4000; 4500 is not
    assert sorted(out["doc_id"].tolist()) == sorted(expect)
    assert out["cum_before"].max() == 3000 < SRC_BUDGET_CHARS


# -- simhash_docs sequential reference --------------------------------------


def test_simhash_reference_matches_engine(ray_session):
    import pyarrow.parquet as pq2

    from mklab_focused_crawler_ray.pipelines.queries import q_simhash_docs
    from mklab_focused_crawler_ray.pipelines.queries_ml5 import (
        simhash_reference_parquet,
    )

    sf = "/root/testdata/sf0.001"
    ref = pq2.read_table(simhash_reference_parquet(sf)).to_pandas()
    got = q_simhash_docs(sf).to_pandas()
    m = ref.merge(got, on="doc_id", suffixes=("_ref", "_eng"))
    assert len(m) == len(ref) == len(got)
    assert (m["simhash_ref"] == m["simhash_eng"]).all()


# -- substring_dup_stats ----------------------------------------------------


def test_substring_dup_stats_census(ray_session, tmp_path):
    from mklab_focused_crawler_ray.pipelines.queries_ml5 import (
        q_substring_dup_stats,
    )

    rep = "A COMMON BOILER SENTENCE OF LENGTH WELL OVER L CHARS. "
    texts = [
        rep + "unique tail one with its own distinct words xyzzy",
        "different head material then " + rep + "and trailing junk qq",
        "wholly unique document with nothing repeated at all anywhere",
    ]
    sf = _write_docs(tmp_path, texts)
    out = q_substring_dup_stats(sf).to_pandas().set_index("doc_id")
    assert len(out) == 3  # full census, including the clean doc
    assert out.loc[2, "n_spans"] == 0 and out.loc[2, "covered_chars"] == 0
    assert out.loc[2, "clean_chars"] == len(texts[2])
    for d in (0, 1):
        assert out.loc[d, "n_spans"] >= 1
        assert (
            out.loc[d, "clean_chars"]
            == len(texts[d]) - out.loc[d, "covered_chars"]
        )
        assert out.loc[d, "covered_chars"] >= len(rep)


# -- ann_pq_adc_topk --------------------------------------------------------


def test_ann_pq_adc_matches_brute_force(ray_session):
    """ADC distances from the engine == brute-force LUT replay in numpy."""
    import pyarrow.parquet as pq2

    from mklab_focused_crawler_ray.pipelines.queries_ml2 import _p
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        PQ_NCENTROIDS,
        PQ_QUANT,
        PQ_SUBDIM,
        PQ_SUBSPACES,
    )
    from mklab_focused_crawler_ray.pipelines.queries_ml5 import (
        PQ_ADC_K,
        PQ_ADC_NQ,
        q_ann_pq_adc_topk,
    )

    sf = "/root/testdata/sf0.001"
    tbl = pq2.read_table(_p(sf, "embeddings"), columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy().astype(np.int64)
    order = np.argsort(ids)
    vecs = np.floor(
        np.stack([np.asarray(v, np.float64) for v in tbl["embedding"].to_pylist()])[order]
        * PQ_QUANT
        + 0.5
    ).astype(np.int64)
    ids = ids[order]
    sub = vecs.reshape(len(vecs), PQ_SUBSPACES, PQ_SUBDIM)
    cb = sub[:PQ_NCENTROIDS]
    # brute: code per vector, then ADC per query
    d_vc = ((sub[:, None, :, :] - cb[None, :, :, :]) ** 2).sum(axis=3)  # (n, C, S)
    codes = d_vc.argmin(axis=1)  # (n, S)
    expect = {}
    for qi in range(PQ_ADC_NQ):
        lut = ((sub[qi][None, :, :] - cb[:, :, :]) ** 2).sum(axis=2)  # (C, S)
        ad = lut[codes, np.arange(PQ_SUBSPACES)[None, :]].sum(axis=1)
        mask = ids != qi
        pick = np.lexsort((ids[mask], ad[mask]))[:PQ_ADC_K]
        expect[qi] = list(zip(ids[mask][pick], ad[mask][pick]))

    got = q_ann_pq_adc_topk(sf).to_pandas()
    for qi, rows in expect.items():
        g = got[got["qid"] == qi].sort_values(["adist", "vec_id"])
        assert list(zip(g["vec_id"], g["adist"])) == rows


# -- image_pack_batches -----------------------------------------------------


def test_image_pack_batches_invariants(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml5 import (
        MM_CONTEXT_LEN,
        q_image_pack_batches,
    )

    df = q_image_pack_batches("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    for (_, _, _), g in df.groupby(["bucket_w", "bucket_h", "shard"]):
        for _, sg in g.groupby("seq_id"):
            sg = sg.sort_values("off_tokens")
            # offsets are the prefix sums of the packed chunk costs
            assert (
                sg["off_tokens"].to_numpy()
                == np.concatenate(([0], sg["n_tokens"].cumsum().to_numpy()[:-1]))
            ).all()
            used = int(sg["n_tokens"].sum())
            # a window only exceeds the context if it holds ONE oversize item
            assert used <= MM_CONTEXT_LEN or len(sg) == 1


# -- ann_ivfpq_topk ---------------------------------------------------------


def test_ann_ivfpq_subset_of_adc_with_probe_gate(ray_session):
    """IVF-PQ results == ADC results restricted to probed coarse cells."""
    import pyarrow.parquet as pq2

    from mklab_focused_crawler_ray.pipelines.queries_ml2 import _p
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import PQ_QUANT
    from mklab_focused_crawler_ray.pipelines.queries_ml5 import (
        IVFPQ_NLIST,
        IVFPQ_NPROBE,
        PQ_ADC_NQ,
        q_ann_ivfpq_topk,
        q_ann_pq_adc_topk,
    )

    sf = "/root/testdata/sf0.001"
    tbl = pq2.read_table(_p(sf, "embeddings"), columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy().astype(np.int64)
    order = np.argsort(ids)
    vecs = np.floor(
        np.stack([np.asarray(v, np.float64) for v in tbl["embedding"].to_pylist()])[order]
        * PQ_QUANT
        + 0.5
    ).astype(np.int64)
    ids = ids[order]
    coarse = vecs[:IVFPQ_NLIST]
    cd = ((vecs[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
    cell = cd.argmin(axis=1)
    cell_of = dict(zip(ids, cell))

    ivf = q_ann_ivfpq_topk(sf).to_pandas()
    adc = q_ann_pq_adc_topk(sf).to_pandas()
    for qi in range(PQ_ADC_NQ):
        probed = set(np.argsort(cd[qi], kind="stable")[:IVFPQ_NPROBE].tolist())
        g = ivf[ivf["qid"] == qi]
        # every returned vector's coarse cell is probed by the query
        assert all(cell_of[v] in probed for v in g["vec_id"])
        # and each result is at least as distant as the unrestricted ADC kth
        a = adc[adc["qid"] == qi]["adist"]
        assert g["adist"].min() >= a.min()


# -- doc_winnow_fingerprints ------------------------------------------------


def test_winnow_guarantee_shared_substring(ray_session, tmp_path):
    """MOSS guarantee: a shared substring of ≥ W+K−1 chars must yield at
    least one shared (fp) selection in both documents."""
    from mklab_focused_crawler_ray.pipelines.queries_ml5 import (
        WINNOW_K,
        WINNOW_W,
        q_doc_winnow_fingerprints,
    )

    shared = "THIS EXACT SHARED RUN IS WELL OVER TWENTYTHREE CHARS"
    assert len(shared) >= WINNOW_W + WINNOW_K - 1
    texts = [
        "prefix junk one " + shared + " suffix padding alpha",
        "totally different head " + shared + " other tail material",
        "no overlap at all in this third document body here",
    ]
    sf = _write_docs(tmp_path, texts)
    df = q_doc_winnow_fingerprints(sf).to_pandas()
    fp0 = set(df[df["doc_id"] == 0]["fp"])
    fp1 = set(df[df["doc_id"] == 1]["fp"])
    fp2 = set(df[df["doc_id"] == 2]["fp"])
    assert fp0 & fp1, "shared substring must share a fingerprint"
    assert not (fp0 & fp2) or len(fp0 & fp2) < len(fp0 & fp1)
    # density sanity: winnowing keeps ~2/(W+1) of positions
    n0 = len(texts[0]) - WINNOW_K + 1
    assert len(df[df["doc_id"] == 0]) <= n0
