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


def _token_set(text: str) -> set:
    """Char-shingle set — the MinHash'd feature space (unigram token sets
    are degenerate on small-vocabulary corpora: everything collides)."""
    return set(char_shingles(text, SHINGLE_K))


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


GROUP_CAP = 4096  # max distinct ids paired within one hot (band, key) group


def _log_overflow(kind: str, key, n: int, cap: int) -> None:
    """No-silent-caps rule: a capped group is dropped coverage — say so."""
    import logging

    logging.getLogger(__name__).warning(
        "%s: hot group %r has %d members > cap %d; pairing only the first "
        "%d ids (sorted) — %d members' pairs dropped",
        kind,
        key,
        n,
        cap,
        cap,
        n - cap,
    )


def _hot_candidate_rows(sig, group_cols: list[str]):
    """Shared hot-band machinery: count (band_id, band_key) groups, broadcast
    the >1-member keys as a sorted uint64 array, and return the vectorized-
    filtered candidate Dataset (None when no group is hot). A groupby-count
    is cheap; per-group UDFs over the ~input-sized mostly-singleton groups
    are NOT (measured 285 s vs 17 s at sf0.1)."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count

    hot_pd = (
        sig.groupby(group_cols)
        .aggregate(Count(alias_name="n"))
        .map_batches(lambda b: b.filter(pc.greater(b["n"], 1)), batch_format="pyarrow")
        .to_pandas()
    )
    if len(hot_pd) == 0:
        return None
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

    return sig.map_batches(keep_hot, batch_format="pyarrow")


def _empty_pairs_ds(with_jaccard: bool):
    import ray.data as rd

    cols = {
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
    }
    if with_jaccard:
        cols["jaccard_micro"] = pa.array([], pa.int64())
    return rd.from_arrow(pa.table(cols))


def _distinct_pairs(cand, kind: str, group_cap: int = GROUP_CAP):
    """Distributed candidate pairing: map_groups over the (output-sized) hot
    (band_id, band_key) groups with a skew cap, then a pair-keyed groupby to
    dedupe pairs found in multiple bands."""
    from ray.data.aggregate import Count

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) > group_cap:
            _log_overflow(
                kind,
                (int(g["band_id"].iloc[0]), int(g["band_key"].iloc[0])),
                len(ids),
                group_cap,
            )
            ids = ids[:group_cap]
        if len(ids) < 2:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype=np.int64),
                    "doc_b": pd.Series(dtype=np.int64),
                }
            )
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame(
            {"doc_a": ids[ii].astype(np.int64), "doc_b": ids[jj].astype(np.int64)}
        )

    return (
        cand.groupby(["band_id", "band_key"])
        .map_groups(band_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="nb"))
        .drop_columns(["nb"])
    )


def minhash_lsh_pairs(
    doc_parquet: str,
    threshold: float = 0.5,
    shingle: str = "char5",
    group_cap: int = GROUP_CAP,
):
    """Near-dup pairs (doc_a < doc_b, exact shingle-set Jaccard ≥ threshold)
    found via MinHash-LSH candidates. Returns a Dataset
    (doc_a, doc_b, jaccard_micro).

    Scale shape — every step distributed, no input-sized driver state:
    1. signatures → exploded (band_id, band_key, doc_id) rows (actor pool);
    2. hot-band count → broadcast hot keys → vectorized candidate filter;
    3. pairing as map_groups over the output-sized hot groups with a
       ``group_cap`` skew guard (overflow logged, never silent);
    4. exact-Jaccard verify as a doc-id cogroup join: a shingle store
       (doc_id → shingle set, built only for involved docs via a broadcast
       id set) unioned with exploded pair-member rows, grouped by doc_id to
       attach shingles, then grouped by pair to compute Jaccard.
    The only driver materialization is the distinct pair-id list (the
    output itself) used to build the involved-id broadcast."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(doc_parquet, columns=["doc_id", "text"])
    sig = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"shingle": shingle},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 8),
    ).materialize()
    cand = _hot_candidate_rows(sig, ["band_id", "band_key"])
    if cand is None:
        return _empty_pairs_ds(with_jaccard=True)
    pairs_pd = _distinct_pairs(cand, "minhash_lsh_pairs", group_cap).to_pandas()
    if len(pairs_pd) == 0:
        return _empty_pairs_ds(with_jaccard=True)
    doc_a = pairs_pd["doc_a"].to_numpy().astype(np.int64)
    doc_b = pairs_pd["doc_b"].to_numpy().astype(np.int64)
    involved = np.unique(np.concatenate([doc_a, doc_b]))
    inv_ref = ray.put(involved)

    class ShingleStore:
        """(doc_id, text) → (doc_id, -1, -1, shingles) for involved docs."""

        def __init__(self):
            self.involved = ray.get(inv_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy()
            idx = np.clip(
                np.searchsorted(self.involved, ids), 0, len(self.involved) - 1
            )
            m = self.involved[idx] == ids
            sh = [
                sorted(_features(t, shingle))
                for t, keep in zip(batch["text"].to_pylist(), m)
                if keep
            ]
            kept = ids[m].astype(np.int64)
            return pa.table(
                {
                    "doc_id": pa.array(kept, pa.int64()),
                    "doc_a": pa.array(np.full(len(kept), -1), pa.int64()),
                    "doc_b": pa.array(np.full(len(kept), -1), pa.int64()),
                    "shingles": pa.array(sh, pa.list_(pa.string())),
                }
            )

    store = ds.map_batches(ShingleStore, batch_format="pyarrow", concurrency=(1, 8))
    members = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.concatenate([doc_a, doc_b]), pa.int64()),
                "doc_a": pa.array(np.concatenate([doc_a, doc_a]), pa.int64()),
                "doc_b": pa.array(np.concatenate([doc_b, doc_b]), pa.int64()),
                "shingles": pa.array([[]] * (2 * len(doc_a)), pa.list_(pa.string())),
            }
        )
    )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        stores = g[g["doc_a"] < 0]
        mem = g[g["doc_a"] >= 0]
        if len(stores) == 0 or len(mem) == 0:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype=np.int64),
                    "doc_b": pd.Series(dtype=np.int64),
                    "shingles": pd.Series(dtype=object),
                }
            )
        sh = stores["shingles"].iloc[0]
        return pd.DataFrame(
            {
                "doc_a": mem["doc_a"].to_numpy(),
                "doc_b": mem["doc_b"].to_numpy(),
                "shingles": [sh] * len(mem),
            }
        )

    thr_micro = int(np.floor(threshold * 1e6 + 0.5))

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        sets = [set(s) for s in g["shingles"]]
        j = jaccard(sets[0], sets[1]) if len(sets) == 2 else 0.0
        return pd.DataFrame(
            {
                "doc_a": g["doc_a"].iloc[:1].to_numpy(),
                "doc_b": g["doc_b"].iloc[:1].to_numpy(),
                "jaccard_micro": np.array(
                    [int(np.floor(j * 1e6 + 0.5))], np.int64
                ),
            }
        )

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch["jaccard_micro"], thr_micro))

    return (
        store.union(members)
        .groupby("doc_id")
        .map_groups(attach, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .map_groups(verify, batch_format="pandas")
        .map_batches(keep, batch_format="pyarrow")
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


def simhash_near_pairs(
    doc_parquet: str, max_hamming: int = 3, group_cap: int = GROUP_CAP
):
    """SimHash near-dup pairs as a Dataset (doc_a, doc_b): bucket by each of
    4 16-bit bands (any match → candidate; Hamming ≤ 3 guarantees ≥1
    identical band by pigeonhole), verify Hamming ≤ max_hamming INSIDE the
    distributed band-group pairing (rows carry the signature, so no store
    join is needed), then dedupe pairs across bands with a pair-keyed
    groupby. Hot groups are skew-capped at ``group_cap`` with logged
    overflow."""
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

    ds = rd.read_parquet(doc_parquet, columns=["doc_id", "text"])
    sig = ds.map_batches(
        sigs, batch_format="pyarrow", batch_size=512
    ).materialize()
    cand = _hot_candidate_rows(sig, ["band_id", "band_key"])
    if cand is None:
        return _empty_pairs_ds(with_jaccard=False)

    def band_pairs_verified(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy().astype(np.int64)
        if len(ids) > group_cap:
            _log_overflow(
                "simhash_near_pairs",
                (int(g["band_id"].iloc[0]), int(g["band_key"].iloc[0])),
                len(ids),
                group_cap,
            )
            g = g.iloc[:group_cap]
            ids = ids[:group_cap]
        if len(ids) < 2:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype=np.int64),
                    "doc_b": pd.Series(dtype=np.int64),
                }
            )
        sims = g["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = hamming64(sims[ii], sims[jj]) <= max_hamming
        return pd.DataFrame(
            {"doc_a": ids[ii][keep], "doc_b": ids[jj][keep]}
        )

    return (
        cand.groupby(["band_id", "band_key"])
        .map_groups(band_pairs_verified, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="nb"))
        .drop_columns(["nb"])
    )


def embedding_cosine_pairs(
    emb_parquet: str,
    threshold: float = 0.9,
    n_planes: int = 8,
    bucket_cap: int = GROUP_CAP,
):
    """Embedding near-dup pairs (Dataset: doc_a, doc_b) via random-hyperplane
    LSH buckets + in-bucket exact cosine. Deterministic planes (seeded);
    recall comes from 2 independent plane sets (documented approximation —
    multi-probe omitted). Buckets beyond ``bucket_cap`` members are capped
    (sorted by vec_id) with logged dropped coverage, so one hot bucket
    (near-constant embeddings) can no longer become an unbounded O(n²)
    task."""
    import ray.data as rd
    from ray.data.aggregate import Count

    def make_stage(seed_offset: int):
        plane_cache: dict[int, np.ndarray] = {}

        def bucketize(batch: pa.Table) -> pa.Table:
            vids = batch["vec_id"].to_numpy()
            emb = np.stack(
                [np.asarray(e, dtype=np.float64) for e in batch["embedding"].to_pylist()]
            )
            emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            d = emb.shape[1]
            planes = plane_cache.get(d)
            if planes is None:
                # deterministic per (seed, dimension) — derived lazily so the
                # stage works for any embedding width
                planes = np.random.default_rng(1234 + seed_offset).normal(
                    size=(n_planes, d)
                )
                plane_cache[d] = planes
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
        if len(ids) > bucket_cap:
            _log_overflow(
                "embedding_cosine_pairs",
                int(g["bucket"].iloc[0]),
                len(ids),
                bucket_cap,
            )
            g = g.iloc[:bucket_cap]
            ids = ids[:bucket_cap]
        if len(ids) < 2:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype=np.int64),
                    "doc_b": pd.Series(dtype=np.int64),
                }
            )
        m = np.stack([np.asarray(e) for e in g["norm_emb"]])
        cos = m @ m.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = cos[ii, jj] >= threshold
        return pd.DataFrame(
            {
                "doc_a": ids[ii][keep].astype(np.int64),
                "doc_b": ids[jj][keep].astype(np.int64),
            }
        )

    ds = rd.read_parquet(emb_parquet, columns=["vec_id", "embedding"])
    branches = [
        ds.map_batches(make_stage(k), batch_format="pyarrow") for k in range(2)
    ]
    un = branches[0].union(branches[1])
    return (
        un.groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="nb"))
        .drop_columns(["nb"])
    )
