"""Deduplication suite: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Ray-Data-first shapes (ray_guide.md "Aggregation at scale"):
- exact: content-hash column (map_batches) → groupby(hash) → first
- MinHash+LSH: signature per doc (map_batches, seeds hoisted to __init__) →
  explode (band_id, band_key, doc_id) rows → groupby(band) → candidate
  pairs → exact-Jaccard verify → distinct pairs
- SimHash: 64-bit signature column; near-dup = Hamming ≤ k within
  band-prefix buckets
- embedding cosine: normalized-vector matmul within hash buckets

The reference has no content dedup (only the id-based StatusCheckBolt gate,
bolts/media/StatusCheckBolt.java:59-68); these are the training-data-scale
additions the build brief requires.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.text import char_shingles

from ..functions.hashing import (
    lsh_band_keys,
    minhash_seeds,
    minhash_signatures,
    token_hashes,
)

TOKEN_RE = re.compile(r"[a-z0-9]+")

NUM_PERM = 128
SHINGLE_K = 5  # char shingles (Broder-style) — robust on any vocabulary
BANDS = 32  # r=4 rows/band → LSH s-curve threshold ≈ (1/32)^(1/4) ≈ 0.42


def word_ngrams(text: str, n: int = 3) -> list[str]:
    """Word n-gram shingles over the lowercase token stream."""
    toks = TOKEN_RE.findall(text.lower())
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _features(text: str, shingle: str) -> set:
    """The MinHash'd feature space: 'char5' Broder shingles (default) or
    'word3' token 3-grams (n-gram Jaccard dedup)."""
    if shingle == "word3":
        return set(word_ngrams(text, 3))
    return set(char_shingles(text, SHINGLE_K))


class MinHashSignatures:
    """Actor-pool stage: doc → (doc_id, band_id, band_key) exploded rows.
    Permutation seeds are built once per actor in __init__."""

    def __init__(self, num_perm: int = NUM_PERM, bands: int = BANDS, shingle: str = "char5"):
        self.seeds = minhash_seeds(num_perm)
        self.bands = bands
        self.shingle = shingle

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import char_shingle_hashes, word_ngram_hashes

        texts = batch["text"].to_pylist()
        doc_ids = batch["doc_id"].to_numpy()
        # vectorized shingle hashing (the exact-Jaccard verify step still
        # uses the string feature sets via _features — hashes only drive
        # the LSH candidate generation)
        if self.shingle == "word3":
            thl = [word_ngram_hashes(t, 3) for t in texts]
        else:
            thl = [char_shingle_hashes(t, SHINGLE_K) for t in texts]
        sigs = minhash_signatures(thl, self.seeds)
        keys = lsh_band_keys(sigs, self.bands)  # (n_docs, bands)
        n = len(doc_ids)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids, self.bands), pa.int64()),
                "band_id": pa.array(np.tile(np.arange(self.bands), n), pa.int32()),
                "band_key": pa.array(keys.ravel().view(np.int64), pa.int64()),
            }
        )


def _pairs_from_group(g: pd.DataFrame) -> pd.DataFrame:
    ids = np.sort(g["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64)
    ii, jj = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"doc_a": ids[ii], "doc_b": ids[jj]})


def _token_set(text: str) -> set:
    """Char-shingle set — the MinHash'd feature space (unigram token sets
    are degenerate on small-vocabulary corpora: everything collides)."""
    return set(char_shingles(text, SHINGLE_K))


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def minhash_lsh_pairs(
    doc_parquet: str, threshold: float = 0.5, shingle: str = "char5"
) -> pa.Table:
    """Near-dup pairs (doc_a < doc_b, exact token-set Jaccard ≥ threshold)
    found via MinHash-LSH candidates. Candidate pairs are collected to the
    driver for verification — they are output-sized (bounded by true
    near-dup density × LSH false-positive rate), not input-sized; at 100 TB
    the verify step becomes a map_batches over the pair list joined against
    a doc-id-bucketed token-set store instead of a broadcast dict."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(doc_parquet, columns=["doc_id", "text"])
    # 1) signatures → exploded (band_id, band_key, doc_id); materialize once
    #    (reused by the hot-key scan and the candidate filter)
    sig = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"shingle": shingle},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 8),
    ).materialize()
    # 2) hot bands: (band_id, band_key) appearing >1 time. A groupby-count is
    #    cheap; per-group UDFs are NOT (≈ num_perm × n_docs mostly-singleton
    #    groups → one UDF call each dominated wall time in the map_groups
    #    formulation).
    from ray.data.aggregate import Count as _Count

    import pyarrow.compute as _pc

    hot = sig.groupby(["band_id", "band_key"]).aggregate(_Count(alias_name="n"))
    hot_pd = hot.map_batches(
        lambda b: b.filter(_pc.greater(b["n"], 1)), batch_format="pyarrow"
    ).to_pandas()
    if len(hot_pd) == 0:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "jaccard_micro": pa.array([], pa.int64()),
            }
        )
    import ray

    hot_keys = np.unique(
        (hot_pd["band_id"].to_numpy().astype(np.uint64) << np.uint64(48))
        ^ hot_pd["band_key"].to_numpy().view(np.uint64)
    )
    hot_ref = ray.put(hot_keys)

    def keep_hot(batch: pa.Table) -> pa.Table:
        keys = ray.get(hot_ref)
        combo = (
            batch["band_id"].to_numpy().astype(np.uint64) << np.uint64(48)
        ) ^ batch["band_key"].to_numpy().view(np.uint64)
        idx = np.searchsorted(keys, combo)
        idx_c = np.clip(idx, 0, len(keys) - 1)
        return batch.filter(pa.array(keys[idx_c] == combo))

    # 3) candidate rows are OUTPUT-sized now → collect and pair in pandas
    cand_pd = sig.map_batches(keep_hot, batch_format="pyarrow").to_pandas()
    pair_set: set[tuple[int, int]] = set()
    for (_, _), g in cand_pd.groupby(["band_id", "band_key"], sort=False):
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            continue
        ii, jj = np.triu_indices(len(ids), k=1)
        pair_set.update(zip(ids[ii].tolist(), ids[jj].tolist()))
    pairs = pd.DataFrame(
        sorted(pair_set), columns=["doc_a", "doc_b"]
    )
    if len(pairs) == 0:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "jaccard_micro": pa.array([], pa.int64()),
            }
        )
    involved = sorted(set(pairs["doc_a"]) | set(pairs["doc_b"]))
    import pyarrow.compute as pc

    tbl = pq.read_table(doc_parquet, columns=["doc_id", "text"])
    tbl = tbl.filter(pc.is_in(tbl["doc_id"], value_set=pa.array(involved)))
    toks = {
        int(d): _features(t, shingle)
        for d, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
    }
    jac = np.array(
        [
            jaccard(toks[int(a)], toks[int(b)])
            for a, b in zip(pairs["doc_a"], pairs["doc_b"])
        ]
    )
    keep = jac >= threshold
    return pa.table(
        {
            "doc_a": pa.array(pairs["doc_a"].to_numpy()[keep], pa.int64()),
            "doc_b": pa.array(pairs["doc_b"].to_numpy()[keep], pa.int64()),
            "jaccard_micro": pa.array(
                np.floor(jac[keep] * 1e6 + 0.5).astype(np.int64), pa.int64()
            ),
        }
    )


def brute_force_jaccard_pairs(
    texts: dict[int, str], threshold: float, shingle: str = "char5"
) -> set:
    """O(n²) oracle for tests."""
    ids = sorted(texts)
    sets = {i: _features(texts[i], shingle) for i in ids}
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if jaccard(sets[a], sets[b]) >= threshold:
                out.add((a, b))
    return out


def simhash_near_pairs(doc_parquet: str, max_hamming: int = 3) -> pa.Table:
    """SimHash near-dup pairs: bucket by each of 4 16-bit bands (any match →
    candidate; Hamming ≤ 3 guarantees ≥1 identical band by pigeonhole),
    verify Hamming ≤ max_hamming."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from ..functions.hashing import hamming64, simhash64

    def sigs(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        thl = [token_hashes(TOKEN_RE.findall(t.lower())) for t in texts]
        s = simhash64(thl)
        n = len(texts)
        bands = np.empty((n, 4), dtype=np.int64)
        for b in range(4):
            bands[:, b] = ((s >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(batch["doc_id"].to_numpy(), 4), pa.int64()),
                "simhash": pa.array(np.repeat(s.view(np.int64), 4), pa.int64()),
                "band_id": pa.array(np.tile(np.arange(4, dtype=np.int32), n), pa.int32()),
                "band_key": pa.array(bands.ravel(), pa.int64()),
            }
        )

    import pyarrow.compute as _pc
    import ray

    ds = rd.read_parquet(doc_parquet, columns=["doc_id", "text"])
    sig = ds.map_batches(
        sigs, batch_format="pyarrow", batch_size=512
    ).materialize()
    # hot-band design (see minhash_lsh_pairs): per-group UDFs over mostly-
    # singleton band groups dominate wall time; count → broadcast hot keys →
    # vectorized filter → output-sized pairing
    hot_pd = (
        sig.groupby(["band_id", "band_key"])
        .aggregate(Count(alias_name="n"))
        .map_batches(lambda b: b.filter(_pc.greater(b["n"], 1)), batch_format="pyarrow")
        .to_pandas()
    )
    if len(hot_pd) == 0:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    hot_keys = np.unique(
        (hot_pd["band_id"].to_numpy().astype(np.uint64) << np.uint64(48))
        ^ hot_pd["band_key"].to_numpy().view(np.uint64)
    )
    hot_ref = ray.put(hot_keys)

    def keep_hot(batch: pa.Table) -> pa.Table:
        keys = ray.get(hot_ref)
        combo = (
            batch["band_id"].to_numpy().astype(np.uint64) << np.uint64(48)
        ) ^ batch["band_key"].to_numpy().view(np.uint64)
        idx = np.clip(np.searchsorted(keys, combo), 0, len(keys) - 1)
        return batch.filter(pa.array(keys[idx] == combo))

    cand = sig.map_batches(keep_hot, batch_format="pyarrow").to_pandas()
    pair_set: set[tuple[int, int]] = set()
    sim_by_id: dict[int, int] = dict(
        zip(cand["doc_id"].astype(int), cand["simhash"].astype(np.int64))
    )
    for (_, _), g in cand.groupby(["band_id", "band_key"], sort=False):
        ids = np.sort(g["doc_id"].unique())
        ii, jj = np.triu_indices(len(ids), k=1)
        pair_set.update(zip(ids[ii].tolist(), ids[jj].tolist()))
    if not pair_set:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    pl = sorted(pair_set)
    a = np.array([p[0] for p in pl], np.int64)
    b = np.array([p[1] for p in pl], np.int64)
    ha = np.array([sim_by_id[int(x)] for x in a], np.int64).view(np.uint64)
    hb = np.array([sim_by_id[int(x)] for x in b], np.int64).view(np.uint64)
    hd = hamming64(ha, hb)
    keep = hd <= max_hamming
    return pa.table(
        {
            "doc_a": pa.array(a[keep], pa.int64()),
            "doc_b": pa.array(b[keep], pa.int64()),
        }
    )


def embedding_cosine_pairs(
    emb_parquet: str, threshold: float = 0.9, n_planes: int = 8
) -> pa.Table:
    """Embedding near-dup pairs via random-hyperplane LSH buckets + in-bucket
    exact cosine. Deterministic planes (seeded). Probe the bucket and its
    single-bit neighbors? No — multi-probe omitted; recall comes from using
    2 independent plane sets (documented approximation)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    rng = np.random.default_rng(1234)

    def make_stage(seed_offset: int):
        planes = np.random.default_rng(1234 + seed_offset).normal(size=(n_planes, 64))

        def bucketize(batch: pa.Table) -> pa.Table:
            vids = batch["vec_id"].to_numpy()
            emb = np.stack(
                [np.asarray(e, dtype=np.float64) for e in batch["embedding"].to_pylist()]
            )
            emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            bits = (emb @ planes.T) > 0
            key = np.zeros(len(vids), dtype=np.int64)
            for b in range(n_planes):
                key = (key << 1) | bits[:, b].astype(np.int64)
            out = pa.table(
                {
                    "vec_id": batch["vec_id"],
                    "bucket": pa.array(key + (seed_offset << 32), pa.int64()),
                    "norm_emb": pa.array(
                        [e.tolist() for e in emb], pa.list_(pa.float64())
                    ),
                }
            )
            return out

        return bucketize

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("vec_id").sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "cos_micro": []}).astype(np.int64)
        m = np.stack([np.asarray(e) for e in g["norm_emb"]])
        cos = m @ m.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = cos[ii, jj] >= threshold
        return pd.DataFrame(
            {
                "doc_a": ids[ii][keep],
                "doc_b": ids[jj][keep],
                "cos_micro": np.floor(cos[ii, jj][keep] * 1e6 + 0.5).astype(np.int64),
            }
        )

    ds = rd.read_parquet(emb_parquet, columns=["vec_id", "embedding"])
    branches = [
        ds.map_batches(make_stage(k), batch_format="pyarrow") for k in range(2)
    ]
    un = branches[0].union(branches[1])
    out = (
        un.groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="nb"))
    )
    t = out.to_pandas()
    if "doc_a" not in t.columns:
        t = pd.DataFrame({"doc_a": [], "doc_b": []})
    return pa.table(
        {
            "doc_a": pa.array(t["doc_a"], pa.int64()),
            "doc_b": pa.array(t["doc_b"], pa.int64()),
        }
    )
