"""Partition-parallel visual clustering (opt-in 100-TB variant):
equality vs the faithful sequential replay on partition-independent
inputs, plus unit coverage for the min-label union-find merge.

The exact-equality condition is the one the docstring states: whenever no
near-neighbor pair (cosine >= 0.75) crosses partitions, the parallel
result is bit-equal to the sequential replay. The test CONSTRUCTS such an
input: groups are formed inside one hash-partition each, with tight
within-group cosine and well-separated centers (asserted)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mklab_focused_crawler_ray.functions.urls import url_hash64_vec
from mklab_focused_crawler_ray.state.visual_index import (
    merge_partition_clusters,
    sequential_oracle,
)

N_PARTS = 4
DIM = 32


def test_merge_noop_without_edges():
    labels = {"a": "a", "b": "a", "c": "c", "d": "c", "e": "e"}
    assert merge_partition_clusters(labels, []) == labels


def test_merge_min_label_components():
    # two per-partition clusters bridged by one cross edge: the merged
    # component relabels to the minimum member id across BOTH clusters
    labels = {"b": "b", "c": "b", "a": "a", "d": "a", "z": "z"}
    merged = merge_partition_clusters(labels, [("c", "d")])
    assert merged == {"b": "a", "c": "a", "a": "a", "d": "a", "z": "z"}
    # edge inside one cluster is a no-op
    merged2 = merge_partition_clusters(labels, [("a", "d")])
    assert merged2 == labels


def _partition_of(ids: list[str]) -> np.ndarray:
    return (url_hash64_vec(ids) % np.uint64(N_PARTS)).astype(np.int64)


@pytest.fixture(scope="module")
def partition_independent_embeddings(tmp_path_factory):
    """60 ids grouped in threes WITHIN each hash partition, one
    well-separated center per group, tight noise per member — so no
    cosine>=0.75 pair crosses partitions (asserted)."""
    rng = np.random.default_rng(42)
    n = 60
    ids = [f"img{i:08d}" for i in range(n)]
    parts = _partition_of(ids)
    groups: list[list[int]] = []
    for p in range(N_PARTS):
        members = [i for i in range(n) if parts[i] == p]
        groups.extend(members[j : j + 3] for j in range(0, len(members), 3))

    centers = rng.normal(size=(len(groups), DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # centers must be mutually far below the 0.75 cluster threshold
    cc = centers @ centers.T
    np.fill_diagonal(cc, 0.0)
    assert float(np.abs(cc).max()) < 0.7

    vecs = np.zeros((n, DIM), dtype=np.float32)
    for g, members in enumerate(groups):
        for i in members:
            v = centers[g] + rng.normal(scale=0.02, size=DIM)
            vecs[i] = (v / np.linalg.norm(v)).astype(np.float32)
    # within-group pairs are comfortably above both thresholds
    for g, members in enumerate(groups):
        for i in members:
            for j in members:
                if i < j:
                    assert float(vecs[i] @ vecs[j]) > 0.95
    # and no >=0.75 pair crosses partitions (the exact-equality condition)
    sims = vecs @ vecs.T
    np.fill_diagonal(sims, 0.0)
    ia, ib = np.where(sims >= 0.75)
    assert np.all(parts[ia] == parts[ib])

    d = tmp_path_factory.mktemp("visual_par")
    path = os.path.join(str(d), "pseudo_embeddings.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(list(range(n)), pa.int64()),
                "embedding": pa.array(
                    [vecs[i].tolist() for i in range(n)],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        path,
    )
    return path, ids, vecs


def test_parallel_equals_sequential_when_partition_independent(
    ray_session, partition_independent_embeddings
):
    from mklab_focused_crawler_ray.pipelines.queries_media import (
        visual_clusters_parallel,
    )

    path, ids, vecs = partition_independent_embeddings
    out = visual_clusters_parallel(path, n_parts=N_PARTS)
    got = dict(
        zip(out["image_id"].to_pylist(), out["cluster_id"].to_pylist())
    )
    _nearest, expected = sequential_oracle(ids, vecs)
    assert got == expected
    # sanity: the input actually exercises multi-member clusters
    assert len(set(expected.values())) < len(ids)
