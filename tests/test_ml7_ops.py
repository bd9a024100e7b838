"""Round-5 third-wave operators: vocabulary coverage curve, SRP embedding
near-dup pairs, per-source unigram KL, KMV distinct sketch, Zipf fits and
CCNet perplexity terciles — each checked against an independent
brute-force Python reference on tiny fixtures exercising the edges the
SQL oracles can't isolate (count ties, cutoffs beyond the vocabulary,
identical/orthogonal vectors, sub-K cardinalities, single-type sources,
NTILE remainders, and the portable negative floor division)."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mklab_focused_crawler_ray.pipelines.queries_ml7 import (
    COVERAGE_CUTOFFS,
    KMV_K,
    _kmv_hash,
    SRP_BAND_BITS,
    SRP_BITS,
    SRP_MULT,
    _srp_signs,
    q_ccnet_perplexity_buckets,
    q_embedding_srp_pairs,
    q_source_kmv_distinct,
    q_source_unigram_kl,
    q_vocab_coverage_curve,
    q_zipf_fit_sources,
)

TOKEN_RE = re.compile(r"[a-z0-9]+")


def _write_docs(tmp_path, texts, langs=None, sources=None):
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs or ["en"] * n, pa.string()),
                "source": pa.array(sources or ["s"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def _write_embeddings(tmp_path, vecs):
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * len(vecs), pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    return str(tmp_path)


# --------------------------------------------------------------------------
# vocabulary coverage curve
# --------------------------------------------------------------------------


def test_coverage_tie_order_and_cutoff_beyond_vocab(tmp_path, ray_session):
    # "bb" and "aa" tie at 3 occurrences — the rank-2 cut must take "aa"
    # (token asc) so covered_tokens at every cutoff is still exact
    sf = _write_docs(tmp_path, ["aa bb cc", "aa bb", "aa bb", "cc dd"])
    df = (
        q_vocab_coverage_curve(sf)
        .to_pandas()
        .sort_values("rank_cutoff")
        .reset_index(drop=True)
    )
    counts = Counter(
        w for t in ["aa bb cc", "aa bb", "aa bb", "cc dd"] for w in t.split()
    )
    total = sum(counts.values())
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(df["rank_cutoff"]) == list(COVERAGE_CUTOFFS)
    for _, row in df.iterrows():
        cut = int(row["rank_cutoff"])
        cov = sum(c for _, c in ranked[:cut])
        assert int(row["covered_tokens"]) == cov
        assert int(row["covered_types"]) == min(cut, len(ranked))
        assert int(row["total_tokens"]) == total
        assert int(row["coverage_ppm"]) == cov * 1_000_000 // total
    # every cutoff ≥ vocab size saturates at exactly 100%
    assert (df["coverage_ppm"].iloc[1:] == 1_000_000).all()


# --------------------------------------------------------------------------
# SRP embedding near-dup pairs
# --------------------------------------------------------------------------


def test_srp_sign_matrix_replays_the_modular_formula():
    s = _srp_signs(8)
    assert s.shape == (SRP_BITS, 8)
    for k in range(SRP_BITS):
        for d in range(8):
            i = k * 8 + d + 1
            expect = 1 if (i * SRP_MULT) % (1 << 64) < (1 << 63) else -1
            assert s[k, d] == expect
    # not degenerate: both signs appear
    assert (s == 1).any() and (s == -1).any()


def test_srp_identical_vectors_pair_at_full_ppm(tmp_path, ray_session):
    rng = np.random.default_rng(7)
    base = rng.normal(size=16)
    vecs = [base, base * 0.5, -base, rng.normal(size=16)]
    sf = _write_embeddings(tmp_path, vecs)
    df = q_embedding_srp_pairs(sf).to_pandas()
    pairs = {(int(a), int(b)): int(p) for a, b, p in df.itertuples(index=False)}
    # colinear positive pair: identical signature in every band, cos ≈ 1
    assert (0, 1) in pairs
    assert pairs[(0, 1)] >= 999_000
    # the antipode never passes the verify (cos = −1 → dot < 0)
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_srp_matches_brute_force_on_random_vectors(tmp_path, ray_session):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 12))
    sf = _write_embeddings(tmp_path, vecs)
    got = {
        (int(a), int(b), int(p))
        for a, b, p in q_embedding_srp_pairs(sf).to_pandas().itertuples(index=False)
    }
    # independent sequential replay of the whole contract
    emb = np.stack([np.asarray(v, np.float64) for v in vecs.astype(np.float32)])
    q = np.floor(emb * 1_000_000.0 + 0.5).astype(np.int64)
    signs = _srp_signs(12)
    bits = (q @ signs.T > 0).astype(np.int64)
    nb = SRP_BITS // SRP_BAND_BITS
    keys = np.zeros((len(vecs), nb), np.int64)
    for k in range(SRP_BITS):
        keys[:, k // SRP_BAND_BITS] |= bits[:, k] << (k % SRP_BAND_BITS)
    expect = set()
    for a in range(len(vecs)):
        for b in range(a + 1, len(vecs)):
            if not any(keys[a, j] == keys[b, j] for j in range(nb)):
                continue
            d = int((q[a].astype(object) * q[b].astype(object)).sum())
            na2 = int((q[a].astype(object) ** 2).sum())
            nb2 = int((q[b].astype(object) ** 2).sum())
            if d > 0 and 25 * d * d >= 4 * na2 * nb2:
                expect.add((a, b, d * d * 1_000_000 // (na2 * nb2)))
    assert got == expect


# --------------------------------------------------------------------------
# per-source unigram KL
# --------------------------------------------------------------------------


def _lp(c, t):
    return int(math.floor(math.log10(c / t) * 1_000_000 + 0.5))


def test_kl_matches_brute_force_two_sources(tmp_path, ray_session):
    texts = ["aa aa bb", "aa cc", "bb bb bb", "cc cc dd"]
    sources = ["s1", "s1", "s2", "s2"]
    sf = _write_docs(tmp_path, texts, sources=sources)
    df = q_source_unigram_kl(sf).to_pandas().set_index("source")
    per = {
        s: Counter(
            w
            for t, src in zip(texts, sources)
            if src == s
            for w in TOKEN_RE.findall(t)
        )
        for s in ("s1", "s2")
    }
    corpus = per["s1"] + per["s2"]
    t_all = sum(corpus.values())
    for s, cnt in per.items():
        ts = sum(cnt.values())
        acc = sum(
            c * (_lp(c, ts) - _lp(corpus[w], t_all)) for w, c in cnt.items()
        )
        kl = acc // ts if acc >= 0 else -((-acc + ts - 1) // ts)
        assert int(df.loc[s, "kl_micro"]) == kl
        assert int(df.loc[s, "n_tokens"]) == ts


def test_portable_negative_floor_identity():
    # the sign-split used by KL/zipf IS floor division for negatives
    for s in range(-100, 101):
        for t in (1, 2, 3, 7, 10):
            split = s // t if s >= 0 else -((-s + t - 1) // t)
            assert split == s // t  # Python // floors


# --------------------------------------------------------------------------
# KMV distinct sketch
# --------------------------------------------------------------------------


def test_kmv_exact_below_k_and_formula_above(tmp_path, ray_session):
    few = " ".join(f"w{i}" for i in range(10))  # 10 types < KMV_K
    many = " ".join(f"tok{i}" for i in range(200))  # 200 types > KMV_K
    sf = _write_docs(tmp_path, [few, many], sources=["small", "big"])
    df = q_source_kmv_distinct(sf).to_pandas().set_index("source")
    # below K the sketch is exact (distinct hashes == distinct tokens here)
    hashes_small = {_kmv_hash(f"w{i}") for i in range(10)}
    assert int(df.loc["small", "n_types"]) == 10
    assert int(df.loc["small", "kmv_estimate"]) == len(hashes_small)
    # above K: (K−1)·2³¹ // h_K over distinct hashes
    hs = sorted({_kmv_hash(f"tok{i}") for i in range(200)})
    expect = (KMV_K - 1) * (1 << 31) // max(hs[KMV_K - 1], 1)
    assert int(df.loc["big", "n_types"]) == 200
    assert int(df.loc["big", "kmv_estimate"]) == expect
    # sanity: the estimate lands within 3σ ≈ 3/√K of the truth
    assert abs(expect - 200) / 200 < 3 / math.sqrt(KMV_K)


def test_kmv_partial_kmin_merge_is_lossless():
    # k-min of a union == k-min of the union of per-part k-mins
    rng = np.random.default_rng(3)
    hashes = rng.integers(0, 1 << 31, size=500)
    parts = np.array_split(hashes, 7)
    merged = np.unique(
        np.concatenate([np.unique(p)[:KMV_K] for p in parts])
    )[:KMV_K]
    direct = np.unique(hashes)[:KMV_K]
    assert (merged == direct).all()


# --------------------------------------------------------------------------
# Zipf fit
# --------------------------------------------------------------------------


def test_zipf_brute_force_and_single_type_source_excluded(tmp_path, ray_session):
    texts = ["aa aa aa aa bb bb cc", "zz zz zz"]
    sf = _write_docs(tmp_path, texts, sources=["nat", "mono"])
    df = q_zipf_fit_sources(sf).to_pandas()
    assert set(df["source"]) == {"nat"}  # "mono" has one type → excluded
    cnt = sorted(Counter(texts[0].split()).items(), key=lambda kv: (-kv[1], kv[0]))
    n = len(cnt)
    x = [int(math.floor(math.log10(r) * 1e6 + 0.5)) for r in range(1, n + 1)]
    y = [int(math.floor(math.log10(c) * 1e6 + 0.5)) for _, c in cnt]
    sx, sy = sum(x), sum(y)
    sxy = sum(a * b for a, b in zip(x, y))
    sxx = sum(a * a for a in x)
    num = (sx * sy - n * sxy) * 1_000_000
    den = n * sxx - sx * sx
    expect = num // den if num >= 0 else -((-num + den - 1) // den)
    row = df.iloc[0]
    assert int(row["n_types"]) == n
    assert int(row["slope_neg_micro"]) == expect
    assert expect > 0  # decreasing curve → positive negated slope


# --------------------------------------------------------------------------
# CCNet perplexity terciles
# --------------------------------------------------------------------------


def test_ccnet_ntile_rule_matches_duckdb():
    import duckdb

    for n in range(1, 11):
        got = duckdb.sql(
            f"SELECT NTILE(3) OVER (ORDER BY i) AS b FROM range({n}) t(i) ORDER BY i"
        ).fetchall()
        sizes = Counter(b for (b,) in got)
        base, extra = divmod(n, 3)
        expect = {
            b: base + (1 if b <= extra else 0)
            for b in (1, 2, 3)
            if base + (1 if b <= extra else 0) > 0
        }
        assert dict(sizes) == expect, (n, sizes, expect)


def test_ccnet_buckets_exclude_short_docs_and_split_langs(tmp_path, ray_session):
    texts = [
        "aa bb cc dd",  # en, scored
        "aa aa bb",  # en, scored
        "cc dd ee ff gg",  # en, scored
        "zz",  # en, <2 tokens → no bigram row → excluded
        "bb cc",  # fr, scored
    ]
    langs = ["en", "en", "en", "en", "fr"]
    sf = _write_docs(tmp_path, texts, langs=langs)
    df = q_ccnet_perplexity_buckets(sf).to_pandas()
    en = df[df["lang"] == "en"].sort_values("bucket")
    fr = df[df["lang"] == "fr"]
    assert int(en["n_docs"].sum()) == 3  # the 1-token doc is gone
    assert list(en["bucket"]) == [1, 2, 3] and list(en["n_docs"]) == [1, 1, 1]
    assert len(fr) == 1 and int(fr["n_docs"].iloc[0]) == 1
    # bucket boundaries are monotone: head max ≤ next bucket min
    assert (
        en["ppt_max"].to_numpy()[:-1] <= en["ppt_min"].to_numpy()[1:]
    ).all()


# --------------------------------------------------------------------------
# MinHash Jaccard estimates
# --------------------------------------------------------------------------


def test_minhash_estimates_identical_and_disjoint(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml7 import (
        MINHASH_EST_K,
        MINHASH_P,
        _minhash_ab,
        q_minhash_jaccard_estimates,
    )

    texts = ["aa bb cc", "aa bb cc", "dd ee ff", "aa bb zz"]
    sf = _write_docs(tmp_path, texts)
    df = q_minhash_jaccard_estimates(sf).to_pandas()
    rows = {
        (int(a), int(b)): (int(t), int(e))
        for a, b, t, e in df.itertuples(index=False)
    }
    # identical docs: truth and every minhash component agree exactly
    assert rows[(0, 1)] == (1_000_000, 1_000_000)
    # disjoint docs: truth 0 (estimate may collide, bounded by 10⁶)
    assert rows[(0, 2)][0] == 0
    # partial overlap: truth = 2/4; estimate replays the affine-hash mins
    assert rows[(0, 3)][0] == 2 * 1_000_000 // 4
    sets = [
        {_kmv_hash(w) for w in t.split()} for t in texts
    ]
    sigs = [
        [min((a * x + b) % MINHASH_P for x in s) for a, b in
         (_minhash_ab(k) for k in range(MINHASH_EST_K))]
        for s in sets
    ]
    m = sum(1 for x, y in zip(sigs[0], sigs[3]) if x == y)
    assert rows[(0, 3)][1] == m * 1_000_000 // MINHASH_EST_K


# --------------------------------------------------------------------------
# event-rate anomalies
# --------------------------------------------------------------------------


def _write_events(tmp_path, rows):
    import datetime as dt

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [
                        dt.datetime(2024, 1, 1) + dt.timedelta(hours=h, minutes=m)
                        for h, m, _u, _t in rows
                    ],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([u for _h, _m, u, _t in rows], pa.int64()),
                "event_type": pa.array([t for *_x, t in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    return str(tmp_path)


def test_anomaly_flags_planted_spike_only(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml7 import (
        q_event_rate_anomalies,
    )

    # 10 quiet hours at 2 events each + one 40-event spike at hour 10
    rows = []
    for h in range(10):
        rows += [(h, 0, 1, "view"), (h, 30, 2, "view")]
    rows += [(10, m, 3, "view") for m in range(40)]
    sf = _write_events(tmp_path, rows)
    df = q_event_rate_anomalies(sf).to_pandas()
    assert len(df) == 1
    r = df.iloc[0]
    assert r["event_type"] == "view" and int(r["n_events"]) == 40
    # brute-force the integer z² inequality for the spike hour
    x = [2] * 10 + [40]
    n, s, q = len(x), sum(x), sum(v * v for v in x)
    assert (n * 40 - s) ** 2 > 9 * (n * q - s * s)
    assert (n * 2 - s) ** 2 <= 9 * (n * q - s * s)


# --------------------------------------------------------------------------
# user-activity Gini
# --------------------------------------------------------------------------


def test_gini_uniform_zero_and_concentrated_high(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml7 import (
        q_user_activity_gini,
    )

    rows = []
    # "flat": 4 users × 3 events each → gini 0
    for u in range(4):
        rows += [(u, i, u, "flat") for i in range(3)]
    # "skew": user 9 fires 9 events, users 10..12 one each
    rows += [(1, i, 9, "skew") for i in range(9)]
    rows += [(2, 0, 10, "skew"), (2, 1, 11, "skew"), (2, 2, 12, "skew")]
    sf = _write_events(tmp_path, rows)
    df = q_user_activity_gini(sf).to_pandas().set_index("event_type")
    assert int(df.loc["flat", "gini_ppm"]) == 0
    x = sorted([9, 1, 1, 1])
    n, tot = len(x), sum(x)
    num = sum((2 * (i + 1) - n - 1) * v for i, v in enumerate(x)) * 1_000_000
    assert int(df.loc["skew", "gini_ppm"]) == num // (n * tot)
    assert int(df.loc["skew", "n_users"]) == 4
    assert int(df.loc["skew", "n_events"]) == 12


# --------------------------------------------------------------------------
# int8 quantization error audit
# --------------------------------------------------------------------------


def test_int8_quant_error_brute_force_and_zero_vector(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml7 import (
        q_embedding_int8_quant_error,
    )

    vecs = [
        [0.5, -0.25, 0.125, 0.0],
        [0.0, 0.0, 0.0, 0.0],  # no direction → excluded
        [1.0, 1.0, 1.0, 1.0],
    ]
    sf = _write_embeddings(tmp_path, vecs)
    df = q_embedding_int8_quant_error(sf).to_pandas().set_index("vec_id")
    assert 1 not in df.index and set(df.index) == {0, 2}
    for vid in (0, 2):
        v = np.asarray(vecs[vid], np.float64)
        ma = np.abs(v).max()
        qm = np.floor(v * 1e6 + 0.5).astype(np.int64)
        q8 = np.floor(v * 127.0 / ma + 0.5).astype(np.int64)
        dot = int((qm * q8).sum())
        cos2 = dot * dot * 1_000_000 // (
            int((qm.astype(object) ** 2).sum()) * int((q8 * q8).sum())
        )
        assert int(df.loc[vid, "cos2_ppm"]) == cos2
        assert int(df.loc[vid, "maxabs_micro"]) == int(
            np.floor(ma * 1e6 + 0.5)
        )
    # a constant vector maps to a proportional int8 vector → cos² = 1;
    # the mixed vector pays real rounding (0.125·127/0.5 = 31.75 → 32)
    assert int(df.loc[2, "cos2_ppm"]) == 1_000_000
    assert 990_000 < int(df.loc[0, "cos2_ppm"]) < 1_000_000


# --------------------------------------------------------------------------
# winsorized mean
# --------------------------------------------------------------------------


def test_winsorized_mean_clamps_planted_outlier(tmp_path, ray_session):
    import datetime as dt

    from mklab_focused_crawler_ray.pipelines.queries_ml7 import (
        q_event_value_winsorized,
    )

    # 99 values of 1.00 and one 10⁷ outlier: the P95 cut clamps it to 100
    values = [1.0] * 99 + [10_000_000.0]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(100), pa.int64()),
                "ts": pa.array(
                    [dt.datetime(2024, 1, 1)] * 100, pa.timestamp("us")
                ),
                "user_id": pa.array([0] * 100, pa.int64()),
                "event_type": pa.array(["pay"] * 100, pa.string()),
                "value": pa.array(values, pa.float64()),
                "props": pa.array(["{}"] * 100, pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    df = q_event_value_winsorized(str(tmp_path)).to_pandas()
    r = df.iloc[0]
    # lo = hi = 100 cents (P5 and P95 both land on the 1.00 mass) → the
    # outlier contributes 100, not 10⁹ cents
    assert int(r["lo_cents"]) == 100 and int(r["hi_cents"]) == 100
    assert int(r["wmean_cents"]) == 100
    assert int(r["n"]) == 100


# --------------------------------------------------------------------------
# cross-source duplication matrix
# --------------------------------------------------------------------------


def test_dup_matrix_counts_planted_cross_source_pair(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml7 import (
        q_cross_source_dup_matrix,
    )

    dup = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [dup, dup, "totally different words here now", dup]
    sources = ["s1", "s2", "s1", "s2"]
    sf = _write_docs(tmp_path, texts, sources=sources)
    df = q_cross_source_dup_matrix(sf).to_pandas()
    cells = {
        (r.source_a, r.source_b): int(r.n_pairs)
        for r in df.itertuples(index=False)
    }
    # pairs among docs {0,1,3}: (0,1)=s1×s2, (0,3)=s1×s2, (1,3)=s2×s2
    assert cells == {("s1", "s2"): 2, ("s2", "s2"): 1}


# --------------------------------------------------------------------------
# token burstiness
# --------------------------------------------------------------------------


def test_burstiness_brute_force_with_concentrated_token(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml7 import (
        q_token_burstiness,
    )

    # "zz" appears 6× in ONE doc (bursty); "aa" once in each of 3 docs
    texts = ["zz zz zz zz zz zz aa", "aa bb", "aa bb"]
    sf = _write_docs(tmp_path, texts)
    df = q_token_burstiness(sf).to_pandas().set_index("token")
    assert int(df.loc["zz", "c"]) == 6 and int(df.loc["zz", "df"]) == 1
    assert int(df.loc["zz", "burst_micro"]) == 6_000_000
    assert int(df.loc["aa", "c"]) == 3 and int(df.loc["aa", "df"]) == 3
    assert int(df.loc["aa", "burst_micro"]) == 1_000_000
    # ordering contract: by (c desc, token asc)
    assert list(df.index) == ["zz", "aa", "bb"]


# --------------------------------------------------------------------------
# dup-cluster size histogram
# --------------------------------------------------------------------------


def test_cluster_hist_log2_buckets_from_planted_clusters(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml7 import (
        q_dup_cluster_size_hist,
    )

    d1 = "the quick brown fox jumps over the lazy dog again and again"
    d2 = "completely unrelated sentence about database engines and arrow"
    # a 2-cluster (bucket 1) and a 4-cluster (bucket 2), plus singletons
    # (docs with no near-dup pair never enter dup_clusters)
    texts = [d1, d1, d2, d2, d2, d2, "lone wolf text one", "other lone text"]
    sf = _write_docs(tmp_path, texts)
    df = (
        q_dup_cluster_size_hist(sf)
        .to_pandas()
        .set_index("size_log2")
        .sort_index()
    )
    assert list(df.index) == [1, 2]
    assert int(df.loc[1, "n_clusters"]) == 1 and int(df.loc[1, "n_docs"]) == 2
    assert int(df.loc[2, "n_clusters"]) == 1 and int(df.loc[2, "n_docs"]) == 4


# --------------------------------------------------------------------------
# per-dimension embedding stats
# --------------------------------------------------------------------------


def test_dim_stats_dead_and_live_dimensions(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml7 import (
        q_embedding_dim_stats,
    )

    # dim0 constant (dead: var 0), dim1 symmetric ±0.5 (mean 0),
    # dim2 negative-mean (sign-split floor path)
    vecs = [
        [0.25, 0.5, -0.5],
        [0.25, -0.5, -0.25],
        [0.25, 0.5, -0.75],
        [0.25, -0.5, -0.5],
    ]
    sf = _write_embeddings(tmp_path, vecs)
    df = q_embedding_dim_stats(sf).to_pandas().set_index("dim").sort_index()
    assert int(df.loc[0, "var_micro2"]) == 0
    assert int(df.loc[0, "mean_micro"]) == 250_000
    assert int(df.loc[1, "mean_micro"]) == 0
    vals = np.array([-500_000, -250_000, -750_000, -500_000], dtype=object)
    n, s, s2 = 4, int(vals.sum()), int((vals * vals).sum())
    expect_mean = s // n  # Python floor == the sign-split contract
    expect_var = (n * s2 - s * s) // (n * n)
    assert int(df.loc[2, "mean_micro"]) == expect_mean
    assert int(df.loc[2, "var_micro2"]) == expect_var
    assert (df["n_vecs"] == 4).all()


# --------------------------------------------------------------------------
# per-source doc-length histogram
# --------------------------------------------------------------------------


def test_doclen_hist_buckets_and_zero_token_exclusion(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml7 import (
        q_source_doclen_hist,
    )

    texts = [
        "one",  # 1 token  → bucket 0
        "two tokens",  # 2 → bucket 1
        "three of them here",  # 4 → bucket 2
        "a b c d e f g",  # 7 → bucket 2
        "",  # 0 tokens → excluded
    ]
    sf = _write_docs(tmp_path, texts)
    df = (
        q_source_doclen_hist(sf)
        .to_pandas()
        .set_index("len_log2")
        .sort_index()
    )
    assert list(df.index) == [0, 1, 2]
    assert int(df.loc[0, "n_docs"]) == 1 and int(df.loc[0, "n_tokens_total"]) == 1
    assert int(df.loc[1, "n_docs"]) == 1 and int(df.loc[1, "n_tokens_total"]) == 2
    assert int(df.loc[2, "n_docs"]) == 2 and int(df.loc[2, "n_tokens_total"]) == 11


# --------------------------------------------------------------------------
# quality-decile dup rate
# --------------------------------------------------------------------------


def test_quality_decile_dup_rate_counts_planted_dups(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml7 import (
        q_quality_decile_dup_rate,
    )

    dup = "copy paste copy paste copy paste copy paste copy paste"
    # the non-dup docs must share (almost) no char-5 shingles — distinct
    # character material per doc, not a common template
    distinct = [
        "zebra quilt jumbo flask wren",
        "ochre viper lurid gnash brisk",
        "plumb waxen fjord kudzu nymph",
        "squib molar tryst evoke dwarf",
        "girth ankle rupee shove claim",
        "toxic bagel proxy dunce whale",
        "vixen crumb slosh primp jaded",
        "khaki outdo blurb femur swoop",
    ]
    texts = [dup, dup] + distinct
    sf = _write_docs(tmp_path, texts)
    df = q_quality_decile_dup_rate(sf).to_pandas()
    # NTILE(10) over 10 docs → one doc per decile; exactly 2 dup members
    assert len(df) == 10 and (df["n_docs"] == 1).all()
    assert int(df["n_dup_docs"].sum()) == 2
    flagged = df[df["n_dup_docs"] == 1]
    assert (flagged["dup_rate_ppm"] == 1_000_000).all()


# --------------------------------------------------------------------------
# corpus information gain
# --------------------------------------------------------------------------


def test_info_gain_zero_for_identical_sources_positive_for_disjoint(
    tmp_path, ray_session
):
    from mklab_focused_crawler_ray.pipelines.queries_ml7 import (
        q_corpus_token_info_gain,
    )

    # identical token distributions → the source label explains nothing
    sf = _write_docs(
        tmp_path, ["aa bb cc", "aa bb cc"], sources=["s1", "s2"]
    )
    row = q_corpus_token_info_gain(sf).to_pandas().iloc[0]
    assert int(row["info_gain_micro"]) == 0
    assert int(row["h_corpus_micro"]) == int(row["h_within_micro"])

    # fully disjoint vocabularies → IG = H(corpus) − H(within), large
    sf2 = _write_docs(
        tmp_path, ["aa aa bb bb", "cc cc dd dd"], sources=["s1", "s2"]
    )
    row2 = q_corpus_token_info_gain(sf2).to_pandas().iloc[0]
    # corpus: 4 tokens uniform → H = log10(4); within: each source
    # 2-token uniform → H = log10(2); IG ≈ log10(2) ≈ 301030 µHartley
    assert abs(int(row2["h_corpus_micro"]) - 602060) <= 2
    assert abs(int(row2["h_within_micro"]) - 301030) <= 2
    assert abs(int(row2["info_gain_micro"]) - 301030) <= 4


# --------------------------------------------------------------------------
# SRP semantic clusters
# --------------------------------------------------------------------------


def test_srp_clusters_transitive_closure(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml7 import (
        q_srp_semantic_clusters,
    )

    rng = np.random.default_rng(5)
    base = rng.normal(size=16)
    # 0,1,2 colinear (pairwise cos 1 → all pairs found, one component);
    # 3 far away
    vecs = [base, base * 2.0, base * 0.5, rng.normal(size=16)]
    sf = _write_embeddings(tmp_path, vecs)
    df = q_srp_semantic_clusters(sf)
    got = {(int(r.vec_id), int(r.cluster_rep)) for r in df.itertuples(index=False)}
    assert got == {(0, 0), (1, 0), (2, 0)}


# --------------------------------------------------------------------------
# Jaccard threshold curve
# --------------------------------------------------------------------------


def test_jaccard_curve_monotone_and_brute_forced(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml7 import (
        JACCARD_CURVE_PPM,
        q_jaccard_threshold_curve,
    )

    d = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = d.replace("kappa", "lambda")  # high-but-not-1 jaccard
    texts = [d, d, near, "unrelated totally different words here"]
    sf = _write_docs(tmp_path, texts)
    df = (
        q_jaccard_threshold_curve(sf)
        .to_pandas()
        .sort_values("threshold_ppm")
        .reset_index(drop=True)
    )
    assert list(df["threshold_ppm"]) == list(JACCARD_CURVE_PPM)
    # counts never increase as the threshold tightens
    assert (np.diff(df["n_pairs"].to_numpy()) <= 0).all()
    assert (np.diff(df["n_docs_involved"].to_numpy()) <= 0).all()
    # at 0.9: only the exact-dup pair (0,1) survives → 2 docs
    top = df.iloc[-1]
    assert int(top["n_pairs"]) == 1 and int(top["n_docs_involved"]) == 2
    # at 0.5: (0,1), (0,2), (1,2) all pass → 3 docs
    bot = df.iloc[0]
    assert int(bot["n_pairs"]) == 3 and int(bot["n_docs_involved"]) == 3


# --------------------------------------------------------------------------
# multi-probe SRP
# --------------------------------------------------------------------------


def test_multiprobe_is_superset_and_matches_hamming1_brute_force(
    tmp_path, ray_session
):
    from mklab_focused_crawler_ray.pipelines.queries_ml7 import (
        q_embedding_srp_multiprobe_pairs,
    )

    rng = np.random.default_rng(13)
    vecs = rng.normal(size=(40, 12))
    sf = _write_embeddings(tmp_path, vecs)
    plain = {
        (int(a), int(b))
        for a, b, _p in q_embedding_srp_pairs(sf)
        .to_pandas()
        .itertuples(index=False)
    }
    multi_df = q_embedding_srp_multiprobe_pairs(sf).to_pandas()
    multi = {
        (int(a), int(b), int(p)) for a, b, p in multi_df.itertuples(index=False)
    }
    assert plain <= {(a, b) for a, b, _p in multi}
    # brute-force the hamming ≤ 1 contract
    emb = np.stack([np.asarray(v, np.float64) for v in vecs.astype(np.float32)])
    q = np.floor(emb * 1_000_000.0 + 0.5).astype(np.int64)
    signs = _srp_signs(12)
    bits = (q @ signs.T > 0).astype(np.int64)
    nb = SRP_BITS // SRP_BAND_BITS
    keys = np.zeros((len(vecs), nb), np.int64)
    for k in range(SRP_BITS):
        keys[:, k // SRP_BAND_BITS] |= bits[:, k] << (k % SRP_BAND_BITS)
    expect = set()
    for a in range(len(vecs)):
        for b in range(a + 1, len(vecs)):
            if not any(
                bin(int(keys[a, j]) ^ int(keys[b, j])).count("1") <= 1
                for j in range(nb)
            ):
                continue
            d = int((q[a].astype(object) * q[b].astype(object)).sum())
            na2 = int((q[a].astype(object) ** 2).sum())
            nb2 = int((q[b].astype(object) ** 2).sum())
            if d > 0 and 25 * d * d >= 4 * na2 * nb2:
                expect.add((a, b, d * d * 1_000_000 // (na2 * nb2)))
    assert multi == expect


# --------------------------------------------------------------------------
# k-anonymity audit
# --------------------------------------------------------------------------


def test_kanon_flags_small_groups(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml7 import (
        KANON_K,
        q_kanon_small_groups,
    )

    rows = [("BUILDING", 1)] * 7 + [("BUILDING", 2)] * 2 + [("AUTO", 1)]
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(len(rows)), pa.int64()),
                "c_name": pa.array([f"c{i}" for i in range(len(rows))], pa.string()),
                "c_nationkey": pa.array([n for _s, n in rows], pa.int32()),
                "c_acctbal": pa.array([0.0] * len(rows), pa.float64()),
                "c_mktsegment": pa.array([s for s, _n in rows], pa.string()),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    df = (
        q_kanon_small_groups(str(tmp_path))
        .to_pandas()
        .set_index(["c_mktsegment", "c_nationkey"])
    )
    assert KANON_K == 5
    assert int(df.loc[("BUILDING", 1), "n"]) == 7
    assert int(df.loc[("BUILDING", 1), "at_risk"]) == 0
    assert int(df.loc[("BUILDING", 2), "at_risk"]) == 1
    assert int(df.loc[("AUTO", 1), "at_risk"]) == 1


# --------------------------------------------------------------------------
# corpus datacard
# --------------------------------------------------------------------------


def test_datacard_composed_numbers(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml7 import (
        q_corpus_datacard,
    )

    dup = "copy paste copy paste copy paste copy paste copy paste"
    texts = [dup, dup, "zebra quilt jumbo flask wren", "ochre viper lurid gnash"]
    sf = _write_docs(
        tmp_path,
        texts,
        langs=["en", "en", "en", "fr"],
        sources=["s1", "s2", "s1", "s2"],
    )
    row = q_corpus_datacard(sf).to_pandas().iloc[0]
    assert int(row["n_docs"]) == 4
    assert int(row["n_tokens"]) == sum(len(t.split()) for t in texts)
    assert int(row["n_types"]) == len({w for t in texts for w in t.split()})
    assert int(row["n_langs"]) == 2 and int(row["n_sources"]) == 2
    assert int(row["top_lang_ppm"]) == 3 * 1_000_000 // 4
    # exactly the two planted dups participate in a near-dup pair
    assert int(row["dup_doc_ppm"]) == 2 * 1_000_000 // 4


# --------------------------------------------------------------------------
# power iteration
# --------------------------------------------------------------------------


def test_power_iteration_finds_planted_dominant_axis(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml7 import (
        POWER_ITERS,
        q_embedding_power_iteration,
    )

    rng = np.random.default_rng(17)
    # energy overwhelmingly along axis 2
    vecs = np.zeros((30, 8))
    vecs[:, 2] = rng.normal(scale=1.0, size=30)
    vecs += rng.normal(scale=0.01, size=(30, 8))
    sf = _write_embeddings(tmp_path, vecs)
    df = q_embedding_power_iteration(sf).to_pandas().set_index("dim")
    v = df["v_micro"].to_numpy(np.int64)
    assert abs(v[2]) == 1_000_000  # the max component is the planted axis
    assert (np.abs(np.delete(v, 2)) < 100_000).all()
    # exact integer replay of the whole contract
    qm = np.floor(vecs.astype(np.float32).astype(np.float64) * 1e6 + 0.5).astype(
        np.int64
    )
    S = (qm.T.astype(object) @ qm.astype(object)).tolist()
    vv = [1_000_000] * 8
    for _ in range(POWER_ITERS):
        w = [sum(S[i][j] * vv[j] for j in range(8)) for i in range(8)]
        m = max(abs(x) for x in w)
        vv = [
            (x * 1_000_000) // m if x >= 0 else -((-x * 1_000_000 + m - 1) // m)
            for x in w
        ]
    assert v.tolist() == vv


def test_top1_energy_near_one_for_rank1_cloud(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml7 import (
        q_embedding_top1_energy,
    )

    rng = np.random.default_rng(19)
    base = rng.normal(size=8)
    vecs = np.outer(rng.normal(size=25), base)  # exactly rank 1
    sf = _write_embeddings(tmp_path, vecs)
    row = q_embedding_top1_energy(sf).to_pandas().iloc[0]
    # a rank-1 cloud concentrates (numerically) all energy on v
    assert int(row["top1_energy_ppm"]) > 995_000
    assert int(row["trace"]) > 0 and int(row["rayleigh_lambda"]) > 0


# --------------------------------------------------------------------------
# Jensen–Shannon divergence
# --------------------------------------------------------------------------


def test_js_divergence_identical_zero_disjoint_log2(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml7 import (
        q_source_js_divergence,
    )

    sf = _write_docs(
        tmp_path,
        ["aa bb cc", "aa bb cc", "dd ee ff gg"],
        sources=["s1", "s2", "s3"],
    )
    df = (
        q_source_js_divergence(sf)
        .to_pandas()
        .set_index(["source_a", "source_b"])
    )
    # identical distributions → JS = 0 (up to the ±1 µ flooring envelope)
    assert abs(int(df.loc[("s1", "s2"), "js_micro"])) <= 1
    # fully disjoint vocabularies → JS = log10(2) ≈ 301030 µHartley
    for pair in (("s1", "s3"), ("s2", "s3")):
        assert abs(int(df.loc[pair, "js_micro"]) - 301030) <= 2
    # symmetric by construction and bounded by log10(2)
    assert (df["js_micro"] <= 301032).all() and (df["js_micro"] >= -1).all()
