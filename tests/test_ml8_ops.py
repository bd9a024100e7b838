"""Round-5 continuation operators (queries_ml8): multi-step BPE training,
two Lloyd k-means iterations, and span-corruption planning — each checked
against an independent brute-force Python reference on tiny fixtures
exercising the edges the SQL oracles can't isolate (greedy overlapping
merges in symbol runs, merge pairs containing earlier marks, count
tie-breaks, empty clusters, assignment ties, negative component means,
zero-token documents, and adjacent masked triples merging into one
span)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mklab_focused_crawler_ray.pipelines.queries_ml8 import (
    BPE_TRAIN_STEPS,
    LLOYD_K,
    LLOYD_SSE_DIV,
    SPAN_GROUP,
    SPAN_THR,
    _K32,
    _M32,
    _quant_micro,
    q_bpe_train4,
    q_kmeans_lloyd2,
    q_span_mask_plan,
)

TOKEN_RE = re.compile(r"[a-z0-9]+")


def _write_docs(tmp_path, texts):
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
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
# bpe_train4
# --------------------------------------------------------------------------


def _brute_bpe(texts, steps):
    """Sequential reference: the same contract coded the slow way — per-word
    left-to-right replace, Counter over adjacent 2-char windows."""
    from collections import Counter

    words = []
    for t in texts:
        words.extend(TOKEN_RE.findall(t.lower()))
    merges, counts = [], []
    for s in range(steps):
        ws = list(words)
        for i, mp in enumerate(merges):
            ws = [w.replace(mp, chr(1 + i)) for w in ws]
        c: Counter = Counter()
        for w in ws:
            for i in range(len(w) - 1):
                c[w[i : i + 2]] += 1
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(top[0])
        counts.append(top[1])
    return merges, counts


def test_bpe_train4_matches_brute_force(tmp_path):
    # 'aaaa' exercises greedy overlap (2 non-overlapping 'aa' merges);
    # later steps merge pairs containing the chr(1) mark
    sf = _write_docs(
        tmp_path, ["aaaa aab aab", "xy xy xy aab", "aaaa xy baa", ""]
    )
    got = q_bpe_train4(sf).to_pandas()
    merges, counts = _brute_bpe(["aaaa aab aab", "xy xy xy aab", "aaaa xy baa", ""], BPE_TRAIN_STEPS)
    assert list(got["step"]) == [1, 2, 3, 4]
    assert list(got["pair"]) == merges
    assert list(got["n"]) == counts


def test_bpe_train4_tie_breaks_lexicographically_and_stops_when_dry(tmp_path):
    # 'ab' and 'cd' both appear exactly 3 times → 'ab' wins step 1; after
    # both merge every word is a single mark, the pair space is exhausted,
    # and the output stops early — exactly like the oracle's empty tN CTEs
    sf = _write_docs(tmp_path, ["ab cd ab cd", "ab cd"])
    got = q_bpe_train4(sf).to_pandas()
    assert list(got["pair"]) == ["ab", "cd"]
    assert list(got["n"]) == [3, 3]
    assert list(got["step"]) == [1, 2]


# --------------------------------------------------------------------------
# kmeans_lloyd2
# --------------------------------------------------------------------------


def _brute_lloyd2(vecs):
    e = _quant_micro(np.asarray(vecs, np.float64))
    c = e[:LLOYD_K].copy()
    # iteration 1
    d2 = ((e[:, None, :] - c[None, :, :]) ** 2).sum(2)
    a1 = np.argmin(d2, axis=1)
    n1 = np.bincount(a1, minlength=LLOYD_K)
    c1 = c.copy()
    for k in range(LLOYD_K):
        if n1[k]:
            c1[k] = np.floor_divide(e[a1 == k].sum(0), n1[k])
    # iteration 2
    d2 = ((e[:, None, :] - c1[None, :, :]) ** 2).sum(2)
    a2 = np.argmin(d2, axis=1)
    n2 = np.bincount(a2, minlength=LLOYD_K)
    sse = np.zeros(LLOYD_K, np.int64)
    for i, k in enumerate(a2):
        sse[k] += d2[i, k] // LLOYD_SSE_DIV
    return n1, n2, sse


def test_kmeans_lloyd2_matches_brute_force(tmp_path):
    rng = np.random.default_rng(7)
    vecs = rng.uniform(-0.6, 0.6, size=(40, 8))
    # duplicate init centroids 0 and 1 → every tied point goes to cid 0,
    # cluster 1 ends empty and must keep its previous centroid
    vecs[1] = vecs[0]
    sf = _write_embeddings(tmp_path, vecs)
    got = (
        q_kmeans_lloyd2(sf)
        .to_pandas()
        .sort_values("centroid_id")
        .reset_index(drop=True)
    )
    n1, n2, sse = _brute_lloyd2(vecs)
    assert list(got["n1"]) == list(n1)
    assert list(got["n2"]) == list(n2)
    assert list(got["sse_milli"]) == list(sse)
    assert got.loc[1, "n1"] == 0  # the planted empty cluster


def test_kmeans_lloyd2_negative_mean_floor(tmp_path):
    # all-negative cluster: component mean is negative → floor division
    # must round toward -inf on both engine and oracle paths
    vecs = np.full((LLOYD_K + 4, 4), 0.4)
    for k in range(LLOYD_K):
        vecs[k] = 0.1 * (k + 1)
    vecs[LLOYD_K:] = [[-0.31, -0.11, -0.077, -0.013]] * 4
    sf = _write_embeddings(tmp_path, vecs)
    got = q_kmeans_lloyd2(sf).to_pandas().sort_values("centroid_id")
    n1, n2, sse = _brute_lloyd2(vecs)
    assert list(got["n1"]) == list(n1)
    assert list(got["n2"]) == list(n2)
    assert list(got["sse_milli"]) == list(sse)


# --------------------------------------------------------------------------
# span_mask_plan
# --------------------------------------------------------------------------


def _mask_bit(doc_id, g):
    h1 = ((doc_id % _M32) * _K32) % _M32
    hs = (h1 + g) % _M32
    return ((hs * hs % _M32) * _K32) % _M32 < SPAN_THR


def _brute_span(doc_id, text):
    toks = TOKEN_RE.findall(text.lower())
    n = len(toks)
    groups = (n + SPAN_GROUP - 1) // SPAN_GROUP
    masked = [_mask_bit(doc_id, g) for g in range(groups)]
    n_masked = sum(
        (n - g * SPAN_GROUP if g == groups - 1 else SPAN_GROUP)
        for g in range(groups)
        if masked[g]
    )
    n_spans = sum(
        1 for g in range(groups) if masked[g] and (g == 0 or not masked[g - 1])
    )
    return n, n_masked, n_spans


def test_span_mask_plan_matches_brute_force(tmp_path):
    # enough docs that some have adjacent masked triples; includes an
    # empty doc and a 1-token doc (single partial group)
    texts = ["", "one"] + [
        " ".join(f"w{i}" for i in range(k)) for k in range(2, 40)
    ]
    sf = _write_docs(tmp_path, texts)
    got = (
        q_span_mask_plan(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for row, text in zip(got.itertuples(index=False), texts):
        n, m, s = _brute_span(row.doc_id, text)
        assert (row.n_tokens, row.n_masked, row.n_spans) == (n, m, s), row.doc_id
    assert got["n_masked"].sum() > 0  # the 15% gate actually fires
    assert (got["n_spans"] <= got["n_masked"]).all()


def test_span_mask_plan_merges_adjacent_groups(tmp_path):
    # find a doc_id with two adjacent masked groups among the first 500
    # ids at 30 tokens (10 groups) — guarantees the run-merge branch runs
    hit = None
    for d in range(500):
        masked = [_mask_bit(d, g) for g in range(10)]
        if any(a and b for a, b in zip(masked, masked[1:])):
            hit = (d, masked)
            break
    assert hit is not None, "no adjacent masked pair in 500 ids — contract drift?"
    d, masked = hit
    texts = ["pad"] * d + [" ".join(f"w{i}" for i in range(30))]
    sf = _write_docs(tmp_path, texts)
    got = q_span_mask_plan(sf).to_pandas()
    row = got[got["doc_id"] == d].iloc[0]
    n_spans = sum(
        1 for g in range(10) if masked[g] and (g == 0 or not masked[g - 1])
    )
    assert row["n_spans"] == n_spans
    assert row["n_spans"] < sum(masked)  # at least one merged run
