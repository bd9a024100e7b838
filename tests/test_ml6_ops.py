"""Round-4 (cont.) corpus-audit operators: BM25 top-k, OOV rate, source
vocabulary overlap, per-language tokenizer fertility — each checked
against an independent brute-force Python reference on a tiny fixture
with the edge cases the oracles can't isolate (empty docs, single-token
docs, unicode whitespace, zero-intersection source pairs)."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

from mklab_focused_crawler_ray.pipelines.queries_ml6 import (
    BM25_TERMS,
    BM25_TOPK,
    OOV_VOCAB_V,
    _bm25_idf_micro,
    q_bm25_topk,
    q_doc_oov_rate,
    q_lang_token_fertility,
    q_source_vocab_overlap,
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


def _brute_bm25(texts):
    toks = [TOKEN_RE.findall(t.lower()) for t in texts]
    n, total = len(texts), sum(len(tk) for tk in toks)
    df = {w: sum(1 for tk in toks if w in tk) for w in BM25_TERMS}
    idf = {w: _bm25_idf_micro(n, df[w]) for w in BM25_TERMS}
    out = []
    for d, tk in enumerate(toks):
        dl = len(tk)
        if not dl:
            continue
        c = Counter(tk)
        s = sum(
            (idf[w] * c[w] * 22 * total)
            // (10 * total * c[w] + 3 * total + 9 * dl * n)
            for w in BM25_TERMS
            if c[w]
        )
        if s > 0:
            out.append((s, d))
    out.sort(key=lambda x: (-x[0], x[1]))
    return out[:BM25_TOPK]


def test_bm25_matches_brute_force_with_empty_and_missing_term_docs(
    tmp_path, ray_session
):
    texts = [
        "table scan merge window hash table table",
        "",  # empty doc: excluded, must not divide by zero
        "window window window scan",
        "nothing relevant here at all",  # zero score: excluded
        "hash " * 50,  # long single-term doc: length normalization bites
        "table scan",  # short doc: favored by normalization
    ]
    sf = _write_docs(tmp_path, texts)
    got = q_bm25_topk(sf).to_pandas()
    want = _brute_bm25(texts)
    assert list(zip(got["score_micro"], got["doc_id"])) == want


def test_bm25_excludes_zero_scores_and_orders_desc(tmp_path, ray_session):
    texts = ["table"] + ["zzz unrelated"] * 5
    sf = _write_docs(tmp_path, texts)
    got = q_bm25_topk(sf).to_pandas()
    assert got["doc_id"].tolist() == [0]
    assert (got["score_micro"] > 0).all()


def test_oov_rate_edge_docs(tmp_path, ray_session):
    # >OOV_VOCAB_V distinct fillers with distinct counts so the top-V cut
    # is deterministic AND leaves a genuine OOV tail (w16..w19, 'common',
    # 'rareword' fall below the cut → nonzero n_oov rows)
    assert OOV_VOCAB_V == 16
    filler = " ".join(f"w{i:02d}" for i in range(20) for _ in range(20 - i))
    texts = [filler, "", "common", "rareword common w19 w00"]
    sf = _write_docs(tmp_path, texts)
    got = (
        q_doc_oov_rate(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # brute force
    cnt = Counter()
    per = [TOKEN_RE.findall(t.lower()) for t in texts]
    for tk in per:
        cnt.update(tk)
    vocab = set(
        w
        for w, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
            :OOV_VOCAB_V
        ]
    )
    for d, tk in enumerate(per):
        n = len(tk)
        oov = sum(1 for w in tk if w not in vocab)
        row = got.iloc[d]
        assert row["n_tokens"] == n
        assert row["n_oov"] == oov
        assert row["oov_ppm"] == ((oov * 1_000_000) // n if n else 0)


def test_source_overlap_zero_intersection_pair_omitted(tmp_path, ray_session):
    texts = ["aa bb cc", "bb cc dd", "xx yy"]
    sources = ["s1", "s2", "s3"]
    sf = _write_docs(tmp_path, texts, sources=sources)
    got = q_source_vocab_overlap(sf).to_pandas()
    pairs = {(r["src_a"], r["src_b"]): r for _, r in got.iterrows()}
    assert set(pairs) == {("s1", "s2")}  # s3 shares nothing
    r = pairs[("s1", "s2")]
    assert (r["n_inter"], r["n_union"]) == (2, 4)  # {bb,cc} / {aa,bb,cc,dd}
    assert r["jaccard_ppm"] == (2 * 1_000_000) // 4


def test_fertility_unicode_whitespace_and_multibyte(tmp_path, ray_session):
    # NBSP is a str.split separator; ü is 2 UTF-8 bytes; zh doc has zero
    # [a-z0-9] word tokens but two ws tokens
    texts = ["a b c", "fünf wörter", "中文 文本"]
    langs = ["en", "de", "zh"]
    sf = _write_docs(tmp_path, texts, langs=langs)
    got = q_lang_token_fertility(sf).to_pandas().set_index("lang")
    for lang, t in zip(langs, texts):
        row = got.loc[lang]
        nb = len(t.encode("utf-8"))
        nws = len(t.split())
        nw = len(TOKEN_RE.findall(t.lower()))
        assert row["n_docs"] == 1
        assert row["total_bytes"] == nb
        assert row["total_ws_tokens"] == nws
        assert row["total_words"] == nw
        assert row["bytes_per_token_ppm"] == (
            (nb * 1_000_000) // nws if nws else 0
        )


def test_fertility_empty_lang_group(tmp_path, ray_session):
    sf = _write_docs(tmp_path, ["", "word"], langs=["em", "en"])
    got = q_lang_token_fertility(sf).to_pandas().set_index("lang")
    assert got.loc["em"]["total_ws_tokens"] == 0
    assert got.loc["em"]["bytes_per_token_ppm"] == 0


def test_dsir_importance_brute_force(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml6 import (
        DSIR_TARGET_SOURCE,
        q_dsir_importance_docs,
    )

    texts = ["aa bb aa", "bb cc", "", "aa aa aa", "dd"]
    sources = [DSIR_TARGET_SOURCE, "other", DSIR_TARGET_SOURCE, "other", "other"]
    sf = _write_docs(tmp_path, texts, sources=sources)
    got = (
        q_dsir_importance_docs(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    per = [TOKEN_RE.findall(t.lower()) for t in texts]
    c_all, c_tgt = Counter(), Counter()
    for tk, s in zip(per, sources):
        c_all.update(tk)
        if s == DSIR_TARGET_SOURCE:
            c_tgt.update(tk)
    for d, tk in enumerate(per):
        imp = sum(((c_tgt[w] + 1) * 1_000_000) // (c_all[w] + 1) for w in tk)
        assert got.iloc[d]["n_tokens"] == len(tk)
        assert got.iloc[d]["imp_micro"] == imp


def _write_embeddings(tmp_path, vecs):
    import numpy as np

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [np.asarray(v, np.float32).tolist() for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * len(vecs), pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    return str(tmp_path)


def test_centroid_outliers_bottom_k_with_ties(tmp_path, ray_session):
    import numpy as np

    from mklab_focused_crawler_ray.pipelines.queries_ml6 import (
        q_embedding_centroid_outliers,
    )

    # 150 aligned vectors + 2 anti-aligned outliers + an exact tie pair:
    # k = (152+99)//100 = 2, and the tie must resolve by vec_id asc
    vecs = [[1.0, 0.0]] * 148 + [[0.0, 1.0], [0.0, 1.0], [-1.0, 0.0], [-1.0, 0.0]]
    sf = _write_embeddings(tmp_path, vecs)
    got = q_embedding_centroid_outliers(sf).to_pandas()
    mi = np.floor(np.array(vecs, np.float64) * 1_000_000.0 + 0.5).astype(np.int64)
    S = mi.sum(axis=0)
    dots = mi @ S
    k = (len(vecs) + 99) // 100
    order = np.lexsort((np.arange(len(vecs)), dots))[:k]
    assert got["vec_id"].tolist() == order.tolist()
    assert got["dot_sum"].tolist() == dots[order].tolist()
    assert len(got) == 2  # both anti-aligned vectors, ids 150 & 151


def test_langid_confusion_cells(tmp_path, ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml6 import q_langid_confusion

    texts = [
        "the cat and the dog",   # en-profile words → pred en
        "der hund und die katze",  # de-profile words → pred de
        "qqq www zzz",           # no profile hit → pred und
        "the und",               # 1 en vs 1 de hit: first profile wins → en
    ]
    langs = ["en", "de", "de", "fr"]
    sf = _write_docs(tmp_path, texts, langs=langs)
    got = q_langid_confusion(sf).to_pandas()
    cells = {(r["lang"], r["lang_pred"]): int(r["n_docs"]) for _, r in got.iterrows()}
    assert cells == {
        ("en", "en"): 1,
        ("de", "de"): 1,
        ("de", "und"): 1,
        ("fr", "en"): 1,
    }
