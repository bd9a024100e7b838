"""Sharded visual index conformance: the distributed combined
query-then-insert replay must equal the pure one-at-a-time oracle exactly
(order-sensitive semantics of getSimilarImagesAndIndex — SURVEY §7.4), and
cluster labels are deterministic min-member ids on the fixture dups."""

from __future__ import annotations

import os

import numpy as np
import pytest

from mklab_focused_crawler_ray.state.visual_index import (
    index_and_cluster,
    make_index_shards,
    sequential_oracle,
)


@pytest.fixture(scope="module")
def embeddings(tiny_fixture, ray_session):
    import pyarrow.parquet as pq

    from mklab_focused_crawler_ray.stages.image import embed_images

    p = os.path.join(tiny_fixture, "images.parquet")
    tbl = None
    import pyarrow as pa

    tbl = pa.concat_tables(
        list(embed_images(p).iter_batches(batch_format="pyarrow"))
    )
    return tbl["image_id"].to_pylist(), tbl["embedding"].to_pylist()


def test_sharded_replay_equals_sequential_oracle(ray_session, embeddings):
    ids, vecs = embeddings
    shards = make_index_shards(4)
    try:
        nearest, clusters = index_and_cluster(ids, vecs, shards, chunk=17)
    finally:
        import ray

        for s in shards:
            ray.kill(s)
    o_nearest, o_clusters = sequential_oracle(ids, vecs)
    assert set(nearest) == set(o_nearest)
    for k in o_nearest:
        assert nearest[k][0] == o_nearest[k][0], k
        assert abs(nearest[k][1] - o_nearest[k][1]) < 1e-5, k
    assert clusters == o_clusters


def test_clusters_group_planted_dups(ray_session, tiny_fixture, embeddings):
    import pyarrow.parquet as pq

    ids, vecs = embeddings
    _, clusters = sequential_oracle(ids, vecs)
    dm = pq.read_table(os.path.join(tiny_fixture, "images_dupmap.parquet"))
    vec_by_id = dict(zip(ids, vecs))
    for a, b in zip(dm["image_id"].to_pylist(), dm["dup_of"].to_pylist()):
        va = np.asarray(vec_by_id[a], np.float32)
        vb = np.asarray(vec_by_id[b], np.float32)
        cos = float(
            np.dot(va / np.linalg.norm(va), vb / np.linalg.norm(vb))
        )
        if cos >= 0.75:
            assert clusters[a] == clusters[b], (a, b, cos)
    # every cluster label is the minimum member id (deterministic labels)
    members: dict[str, list[str]] = {}
    for i, c in clusters.items():
        members.setdefault(c, []).append(i)
    for c, ms in members.items():
        assert c == min(ms)
