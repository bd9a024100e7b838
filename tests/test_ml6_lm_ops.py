"""Bigram-LM document scoring and first-occurrence gram novelty
(pipelines/queries_ml6.py) vs independent brute-force references on tiny
corpora with the edge cases the sf-fixture oracles can't isolate (empty
docs, single-token docs, full-duplicate docs, repeated bigrams)."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np

from mklab_focused_crawler_ray.pipelines.queries_ml6 import (
    NOVEL_W,
    q_doc_bigram_logprob,
    q_doc_novel_grams,
)
from tests.test_ml6_ops import _write_docs

TOKEN_RE = re.compile(r"[a-z0-9]+")


def _brute_bigram_lp(texts):
    toks = [TOKEN_RE.findall(t.lower()) for t in texts]
    vocab = {w for tk in toks for w in tk}
    ctx: Counter = Counter()
    cb: Counter = Counter()
    for tk in toks:
        ctx.update(tk[:-1])
        cb.update(zip(tk[:-1], tk[1:]))
    lp = {
        g: int(
            math.floor(
                math.log10((c + 1.0) / (ctx[g[0]] + len(vocab))) * 1_000_000 + 0.5
            )
        )
        for g, c in cb.items()
    }
    out = {}
    for d, tk in enumerate(toks):
        if len(tk) < 2:
            continue
        grams = list(zip(tk[:-1], tk[1:]))
        out[d] = (len(grams), sum(lp[g] for g in grams))
    return out


def test_bigram_logprob_matches_brute_force(tmp_path, ray_session):
    texts = [
        "the cat sat on the mat",
        "the cat sat",  # shares bigrams with doc 0
        "",  # no tokens: excluded
        "single",  # one token, no bigrams: excluded
        "mat mat mat mat",  # repeated bigram within one doc
        "completely unrelated words here now",
    ]
    sf = _write_docs(tmp_path, texts)
    got = q_doc_bigram_logprob(sf).to_pandas().set_index("doc_id")
    want = _brute_bigram_lp(texts)
    assert set(got.index) == set(want)
    for d, (n, s) in want.items():
        assert (got.loc[d, "n_bigrams"], got.loc[d, "logprob_micro"]) == (n, s)
    # smoothing sanity: a unique bigram in a doc full of repeats scores
    # lower than the corpus-frequent 'the cat'
    assert got.loc[5, "logprob_micro"] < got.loc[1, "logprob_micro"]


def test_novel_grams_ownership_and_edges(tmp_path, ray_session):
    base = " ".join(f"w{i}" for i in range(12))  # 12 tokens → 5 grams @ W=8
    texts = [
        base,  # doc 0: owns all its grams
        base,  # doc 1: exact dup → zero novel
        base + " extra token0",  # doc 2: tail grams novel, head grams owned by 0
        "too short",  # <8 tokens: excluded
        " ".join(f"q{i}" for i in range(NOVEL_W)),  # exactly W tokens → 1 novel gram
    ]
    sf = _write_docs(tmp_path, texts)
    got = q_doc_novel_grams(sf).to_pandas().set_index("doc_id").sort_index()
    assert set(got.index) == {0, 1, 2, 4}
    n0 = 12 - NOVEL_W + 1
    assert got.loc[0].tolist() == [n0, n0, 1_000_000]
    assert got.loc[1].tolist() == [n0, 0, 0]
    # doc 2 has 14 tokens → 7 grams; the 5 grams of `base` are owned by
    # doc 0, the 2 grams touching the appended tokens are novel
    assert got.loc[2].tolist() == [7, 2, 2 * 1_000_000 // 7]
    assert got.loc[4].tolist() == [1, 1, 1_000_000]
    assert np.issubdtype(got["novel_ppm"].dtype, np.integer)


def test_containment_catches_subset_jaccard_misses(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml6 import (
        q_containment_dup_pairs,
    )

    quote = " ".join(f"s{i}" for i in range(10))  # 10 tokens → 8 word-3-grams
    texts = [
        quote,  # doc 0: fully contained in doc 1
        quote + " " + " ".join(f"t{i}" for i in range(40)),  # doc 1: superset
        "unrelated words entirely different content here",  # doc 2
        "",  # empty: excluded
    ]
    sf = _write_docs(tmp_path, texts)
    got = q_containment_dup_pairs(sf).to_pandas()
    rows = {(int(a), int(b)): int(p) for a, b, p in got.itertuples(index=False)}
    # 0 ⊂ 1 at containment 1.0; the reverse direction fails (1's grams
    # mostly absent from 0); symmetric Jaccard would be ~8/48 ≈ 0.17
    assert rows.get((0, 1)) == 1_000_000
    assert (1, 0) not in rows and (2, 0) not in rows and (0, 2) not in rows


def test_weighted_sample_favors_heavy_docs_and_is_deterministic(
    tmp_path, ray_session
):
    import math

    from mklab_focused_crawler_ray.pipelines.queries_ml6 import (
        WS_K,
        _WS_KNUTH,
        q_source_weighted_sample,
    )

    # 100 docs in one source: doc 0..49 tiny (w=1), 50..99 huge (w=10000).
    # A-ES with these weights picks essentially only huge docs.
    texts = ["x" * 1 for _ in range(50)] + ["y" * 10_000 for _ in range(50)]
    sf = _write_docs(tmp_path, texts)
    got = q_source_weighted_sample(sf).to_pandas()
    assert len(got) == WS_K
    assert (got["doc_id"] >= 50).mean() > 0.9  # weight dominates
    assert got["sample_rank"].tolist() == list(range(WS_K))
    # keys replay the documented arithmetic exactly
    for d, wk in zip(got["doc_id"], got["wkey"]):
        u = ((d * _WS_KNUTH) % (1 << 32) + 1.0) / (1 << 32)
        e = int(np.floor(-math.log(u) * 1_000_000))
        w = 1 if d < 50 else 10_000
        assert wk == e * 1_000_000 // w
    # deterministic across reruns
    again = q_source_weighted_sample(sf).to_pandas()
    assert got.equals(again)


def test_source_entropy_degenerate_and_uniform(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml6 import (
        q_source_token_entropy,
    )

    texts = ["aaa aaa aaa aaa", "b0 b1 b2 b3"]
    sf = _write_docs(tmp_path, texts, sources=["mono", "uni"])
    got = q_source_token_entropy(sf).to_pandas().set_index("source")
    # single-token source: H = 0 exactly
    assert got.loc["mono"].tolist() == [4, 1, 0]
    # uniform over 4 types: H = log10(4) ≈ 0.602060 Hartleys
    n_tok, n_types, ent = got.loc["uni"]
    assert (n_tok, n_types) == (4, 4)
    assert ent == int(np.floor(np.log10(0.25) * 1_000_000 + 0.5)) * -1


def test_curated_pack_manifest_invariants(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml4 import (
        PACK_CONTEXT_LEN,
        q_curated_pack_manifest,
    )

    df = q_curated_pack_manifest("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    # a packed sequence belongs to exactly one (split, part)
    key = df.groupby(["split", "part", "seq_id"])
    # placement never overflows the context window (oversize chunks alone)
    fits = df[df["n_chunk_tokens"] <= PACK_CONTEXT_LEN]
    assert (
        fits["off_tokens"] + fits["n_chunk_tokens"] <= PACK_CONTEXT_LEN
    ).all()
    # offsets within a sequence are strictly increasing contiguous sums
    for (_s, _p, _q), g in list(key)[:50]:
        g = g.sort_values(["doc_id", "chunk_idx"])
        offs = g["off_tokens"].to_numpy()
        toks = g["n_chunk_tokens"].to_numpy()
        assert (offs[1:] == (offs[:-1] + toks[:-1])).all()
    # every split present, and no doc appears in two splits
    assert df.groupby("doc_id")["split"].nunique().max() == 1


def test_cms_overestimate_invariant_and_merge(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml6 import (
        q_token_cms_estimates,
    )

    texts = ["alpha " * 30 + "beta " * 10 + "gamma", "alpha beta delta epsilon"]
    sf = _write_docs(tmp_path, texts)
    got = q_token_cms_estimates(sf).to_pandas()
    # one-sided error: a CMS never undercounts
    assert (got["cms_estimate"] >= got["true_count"]).all()
    # with a tiny vocab there are no collisions → estimates exact
    assert (got["cms_estimate"] == got["true_count"]).all()
    assert got.iloc[0]["token"] == "alpha" and got.iloc[0]["true_count"] == 31
