"""Sharded visual index actors — the VisualIndex service made explicit.

Reference semantics (``bolts/media/VisualIndexerBolt.java:167-171``):
``getSimilarImagesAndIndex(id, vector, 0.85)`` is a COMBINED
query-then-insert against one global index service: an image can only match
images indexed BEFORE it. ``ClustererBolt`` (``:135-193``) then joins the
nearest neighbor's cluster when similarity ≥ 0.75, else opens a new
cluster.

Ray-native design (SURVEY §2.5, §7.4):
- the index is K shard actors; a vector is INSERTED into its owner shard
  (hash of id) but QUERIED against every shard (a neighbor may live
  anywhere) — fan-out query, single-owner insert.
- order sensitivity is preserved by processing ids in sorted order inside
  :func:`index_and_cluster` (batch mode replays the stream order id-asc;
  SURVEY §7.4 "sequential per-shard application in id order").
- cluster ids are deterministic min-member ids, replacing the reference's
  ``UUID.randomUUID`` (``ClustererBolt.java:185``).

Each shard holds a normalized float32 matrix and answers cosine top-1 via
one matmul per query batch — brute force per shard; the ANN variants
(stages/ann.py) are the scale path for the query side.

Determinism: similarities are computed float32-normalized → float64 dot →
quantized to integer micro-units (1e-6) BEFORE any comparison, in both the
sharded engine and the sequential oracle. Without the quantization,
different BLAS paths (per-shard matmul vs scalar dot) round the same
mathematical value differently in the last float bits, so "exact ties"
(duplicate images) silently become unequal and the replay diverges from
the oracle. Ties then break by smallest id == earliest inserted.
"""

from __future__ import annotations

import numpy as np

INDEX_THRESHOLD = 0.85  # VisualIndexerBolt.java:167
CLUSTER_THRESHOLD = 0.75  # ClustererBolt.java:64,135


def _micro(x) -> np.ndarray:
    """Quantize similarity to int64 micro-units — the comparison domain."""
    return np.floor(np.asarray(x, np.float64) * 1_000_000.0 + 0.5).astype(
        np.int64
    )


class VisualIndexShard:
    """One index partition: insert(id, vec); query(vecs) → best (id, sim)."""

    def __init__(self, shard_id: int):
        self.shard_id = shard_id
        self.ids: list[str] = []
        self.vecs: np.ndarray | None = None  # (n, d) float32, L2-normalized

    def insert(self, ids: list[str], vecs: list[list[float]]) -> int:
        m = np.asarray(vecs, dtype=np.float32)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        m = m / n
        self.vecs = m if self.vecs is None else np.vstack([self.vecs, m])
        self.ids.extend(ids)
        return len(self.ids)

    def query(self, vecs: list[list[float]]) -> list[tuple[str, int]]:
        """Best match per query vector among vectors inserted SO FAR, as
        (id, sim_micro). argmax returns the FIRST max index and inserts are
        id-ascending, so within-shard ties resolve to the smallest id.
        Returns ('', -2_000_000) rows when the shard is empty."""
        if self.vecs is None or len(self.ids) == 0:
            return [("", -2_000_000)] * len(vecs)
        q = np.asarray(vecs, dtype=np.float32)
        n = np.linalg.norm(q, axis=1, keepdims=True)
        n[n == 0] = 1.0
        q = q / n
        sims = _micro(q.astype(np.float64) @ self.vecs.astype(np.float64).T)
        best = np.argmax(sims, axis=1)
        return [
            (self.ids[int(b)], int(sims[i, int(b)])) for i, b in enumerate(best)
        ]

    def size(self) -> int:
        return len(self.ids)


def make_index_shards(k: int):
    import ray

    Actor = ray.remote(num_cpus=0.05)(VisualIndexShard)
    return [Actor.remote(i) for i in range(k)]


def _owner(image_id: str, k: int) -> int:
    from ..functions.urls import url_hash64

    return int(url_hash64(image_id) % k)


def index_and_cluster_stream(
    chunks,
    shards,
    index_threshold: float = INDEX_THRESHOLD,
    cluster_threshold: float = CLUSTER_THRESHOLD,
):
    """Replay an (ids, vectors) chunk stream — ALREADY in globally ascending
    id order — through the sharded index: per chunk, query ALL shards
    (earlier-indexed only), pick the global best, then insert the chunk into
    its owner shards. Returns
    (nearest: dict id → (neighbor_id, sim) with sim ≥ index_threshold,
     clusters: dict id → cluster_id min-member-deterministic).

    Within a chunk, later ids may also match EARLIER IDS OF THE SAME CHUNK —
    handled with an in-chunk sequential pass so the result equals the pure
    one-at-a-time replay (order-sensitivity conformance, SURVEY §7.4).

    Streaming shape: only one chunk of vectors is resident on the driver at
    a time (the index lives in the shard actors); driver state is the
    output-sized nearest/clusters maps. ``chunks`` yields
    (list[str] ids, (n, d) array-like vectors)."""
    import ray

    nearest: dict[str, tuple[str, float]] = {}
    clusters: dict[str, str] = {}
    idx_t = int(_micro(index_threshold))
    clu_t = int(_micro(cluster_threshold))

    def _norm(v):
        a = np.asarray(v, dtype=np.float32)
        n = np.linalg.norm(a)
        return (a / n if n > 0 else a).astype(np.float64)

    k = len(shards)
    last_id: str | None = None
    for c_ids, c_vecs in chunks:
        if len(c_ids) == 0:
            continue
        if last_id is not None and c_ids[0] <= last_id:
            raise ValueError(
                "index_and_cluster_stream requires globally id-ascending chunks"
            )
        last_id = c_ids[-1]
        c_vecs = np.asarray(c_vecs, dtype=np.float32)
        # fan-out query against all shards (state = earlier chunks only)
        per_shard = ray.get([s.query.remote(c_vecs) for s in shards])
        best_prev = []
        for qi in range(len(c_ids)):
            # cross-shard pick: max micro-sim, ties broken by SMALLEST id —
            # replay inserts in id order, so smallest id == earliest
            # inserted, which is what sequential_oracle keeps on exact ties
            bid, bsim = "", -2_000_000
            for cand_id, cand_sim in (per_shard[si][qi] for si in range(k)):
                if cand_sim > bsim or (
                    cand_sim == bsim and cand_id and (not bid or cand_id < bid)
                ):
                    bid, bsim = cand_id, cand_sim
            best_prev.append((bid, bsim))
        # in-chunk sequential pass: earlier chunk members are also candidates
        # (their ids are > every shard-resident id, so strict '>' keeps the
        # earlier candidate on micro-ties, matching the oracle)
        c_norm = [_norm(v) for v in c_vecs]
        for qi in range(len(c_ids)):
            bid, bsim = best_prev[qi]
            for pj in range(qi):
                s = int(_micro(np.dot(c_norm[qi], c_norm[pj])))
                if s > bsim:
                    bid, bsim = c_ids[pj], s
            if bid and bsim >= idx_t:
                nearest[c_ids[qi]] = (bid, bsim / 1_000_000.0)
            # clustering decision (ClustererBolt: threshold 0.75 on the
            # nearest neighbor regardless of the 0.85 index gate)
            if bid and bsim >= clu_t:
                clusters[c_ids[qi]] = clusters.get(bid, bid)
            else:
                clusters[c_ids[qi]] = c_ids[qi]
        # insert chunk into owner shards
        per_owner: dict[int, tuple[list, list]] = {}
        for ci, cid in enumerate(c_ids):
            o = _owner(cid, k)
            dd = per_owner.setdefault(o, ([], []))
            dd[0].append(cid)
            dd[1].append(ci)
        ray.get(
            [
                shards[o].insert.remote(ii, c_vecs[np.asarray(sel)])
                for o, (ii, sel) in per_owner.items()
            ]
        )
    return nearest, clusters


def index_and_cluster(
    ids: list[str],
    vecs: list[list[float]],
    shards,
    index_threshold: float = INDEX_THRESHOLD,
    cluster_threshold: float = CLUSTER_THRESHOLD,
    chunk: int = 256,
):
    """In-memory convenience wrapper: sort (id, vector) pairs by id, chunk
    them, and delegate to :func:`index_and_cluster_stream`."""
    order = np.argsort(np.asarray(ids, dtype=object), kind="stable")

    def chunks():
        for start in range(0, len(order), chunk):
            sel = order[start : start + chunk]
            yield [ids[i] for i in sel], np.asarray(
                [vecs[i] for i in sel], dtype=np.float32
            )

    return index_and_cluster_stream(
        chunks(), shards, index_threshold, cluster_threshold
    )


def merge_partition_clusters(
    labels: dict[str, str], edges
) -> dict[str, str]:
    """Min-label union-find merge for the PARTITION-PARALLEL clustering
    variant: ``labels`` maps image id → per-partition replay cluster label;
    ``edges`` is an iterable of (id_a, id_b) cross-partition near-neighbor
    pairs (cosine ≥ cluster threshold). Components of the graph formed by
    per-partition clusters + cross edges are relabeled to their minimum
    member id — the same label rule the replay itself uses, so the merge is
    a no-op (bit-equal labels) whenever there are no cross edges."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        # min label wins as the root
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra

    for iid, lab in labels.items():
        union(iid, lab)
    for a, b in edges:
        union(labels[a], labels[b])
    return {iid: find(iid) for iid in labels}


def sequential_oracle(
    ids: list[str],
    vecs: list[list[float]],
    index_threshold: float = INDEX_THRESHOLD,
    cluster_threshold: float = CLUSTER_THRESHOLD,
):
    """Pure-python one-at-a-time replay — the conformance oracle. Uses the
    same float32-normalize → float64-dot → micro-quantize comparison domain
    as the sharded engine (see module docstring)."""
    nearest: dict[str, tuple[str, float]] = {}
    clusters: dict[str, str] = {}
    seen_ids: list[str] = []
    seen_vecs: list[np.ndarray] = []
    idx_t = int(_micro(index_threshold))
    clu_t = int(_micro(cluster_threshold))
    order = np.argsort(np.asarray(ids, dtype=object), kind="stable")
    for i in order:
        v = np.asarray(vecs[i], dtype=np.float32)
        n = np.linalg.norm(v)
        v = (v / n if n > 0 else v).astype(np.float64)
        bid, bsim = "", -2_000_000
        for sid, sv in zip(seen_ids, seen_vecs):
            s = int(_micro(np.dot(v, sv)))
            if s > bsim:
                bid, bsim = sid, s
        if bid and bsim >= idx_t:
            nearest[ids[i]] = (bid, bsim / 1_000_000.0)
        if bid and bsim >= clu_t:
            clusters[ids[i]] = clusters.get(bid, bid)
        else:
            clusters[ids[i]] = ids[i]
        seen_ids.append(ids[i])
        seen_vecs.append(v)
    return nearest, clusters
