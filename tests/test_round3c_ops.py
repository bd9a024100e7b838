"""Property / reference checks for the round-3-continuation operators that
go beyond the DuckDB side-by-side gate: pure-python PageRank equality,
PERCENT_RANK vs pandas, and empty-gate schema stability (the inferred-null
block trap)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_pagerank_matches_pure_python(ray_session):
    """Engine PageRank == single-threaded dict/numpy reference on the tiny
    fixture graph (same integer update rule, same tie-break)."""
    import mklab_focused_crawler_ray.pipelines.queries_media as qm

    pages = pq.read_table(qm._pages_path(SF), columns=["url", "out_links"])
    urls = pages["url"].to_pylist()
    nodeset = set(urls)
    edges = []
    for u, links in zip(urls, pages["out_links"].to_pylist()):
        for v in links:
            if v in nodeset:
                edges.append((u, v))
    deg: dict[str, int] = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    r = {u: 1_000_000 for u in urls}
    for _ in range(qm.PR_ITERS):
        inbound: dict[str, int] = {}
        for u, v in edges:
            inbound[v] = inbound.get(v, 0) + r[u] // deg[u]
        r = {u: 150_000 + (85 * inbound.get(u, 0)) // 100 for u in urls}
    expect = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[: qm.PR_TOP]

    got = qm.q_pagerank_top20(SF)  # pandas since r5 (per-shard top-k merge)
    assert list(zip(got["url"], got["rank_micro"])) == expect


def test_percentile_rank_matches_pandas(ray_session):
    """prank_micro == floor(PERCENT_RANK()*1e6 + 0.5) computed by pandas."""
    import mklab_focused_crawler_ray.pipelines.queries_ml as qml

    got = (
        qml.q_order_price_percentile_rank(SF)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    orders = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    ).to_pandas()
    orders["cents"] = np.floor(orders["o_totalprice"] * 100 + 0.5).astype(np.int64)
    pr = orders.groupby("o_orderpriority")["cents"].rank(method="min") - 1
    n = orders.groupby("o_orderpriority")["cents"].transform("size")
    orders["prank_micro"] = np.floor(
        pr.to_numpy() * 1_000_000.0 / (n.to_numpy() - 1) + 0.5
    ).astype(np.int64)
    ref = orders.sort_values("o_orderkey").reset_index(drop=True)
    assert np.array_equal(
        got["prank_micro"].to_numpy(), ref["prank_micro"].to_numpy()
    )


def test_signature_empty_gate_schema(ray_session, monkeypatch):
    """A gate that empties every batch must still produce a typed, empty
    result (inferred-null blocks poison downstream unions)."""
    import mklab_focused_crawler_ray.pipelines.queries_ml as qml

    monkeypatch.setattr(qml, "SIG_VALUE_GATE", 1e18)
    ds = qml.q_user_event_signature(SF)
    # Dataset-level schema survives (the driver's schema check reads this);
    # ray's to_pandas() drops columns for 0-row datasets regardless
    schema = ds.schema()
    assert schema.names == ["user_id", "signature", "n_types"]
    assert ds.count() == 0


def test_reconciliation_totals(ray_session):
    """n_above ≤ n_orders per status and the status counts cover every
    order exactly once."""
    import mklab_focused_crawler_ray.pipelines.queries_ml as qml

    df = qml.q_order_reconciliation(SF).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderstatus"])
    assert int(df["n_orders"].sum()) == orders.num_rows
    assert (df["n_above"] <= df["n_orders"]).all()
    assert (df["n_above"] > 0).any()


def test_thumbnail_matches_reference(ray_session):
    """Actor-pool thumbnails byte-equal the single-threaded codec path.
    (Raw bytes come from the stage; the registered query now reports
    blake2b signatures, oracle-checked against the sequential path.)"""
    import mklab_focused_crawler_ray.pipelines.queries_media as qm
    from mklab_focused_crawler_ray.fixtures.codecs import decode, resize_area
    from mklab_focused_crawler_ray.stages.image import thumbnail_images

    got = (
        thumbnail_images(qm._images(SF))
        .to_pandas()
        .set_index("image_id")
        .sort_index()
    )
    src = pq.read_table(qm._images(SF), columns=["image_id", "bytes", "fmt"])
    for iid, blob, fmt in list(
        zip(
            src["image_id"].to_pylist(),
            src["bytes"].to_pylist(),
            src["fmt"].to_pylist(),
        )
    )[:25]:
        th = resize_area(decode(blob, fmt), 8, 8)
        ref = np.clip(np.floor(th + 0.5), 0, 255).astype(np.uint8).tobytes()
        assert got.loc[iid, "thumb"] == ref, iid
        assert got.loc[iid, "mean_r_x100"] == int(
            np.floor(th.reshape(-1, 3).mean(axis=0)[0] * 100 + 0.5)
        )


def test_page_image_join_conservation(ray_session):
    """Join output counts equal the number of (page, image) references whose
    image exists; pixel totals are positive."""
    import mklab_focused_crawler_ray.pipelines.queries_media as qm

    df = qm.q_page_image_join_stats(SF).to_pandas()
    pages = pq.read_table(qm._pages_path(SF), columns=["image_ids"])
    images = set(
        pq.read_table(qm._images(SF), columns=["image_id"])["image_id"].to_pylist()
    )
    refs = sum(
        1
        for ids in pages["image_ids"].to_pylist()
        for i in ids
        if i in images
    )
    assert int(df["n_images"].sum()) == refs
    assert (df["total_pixels"] > 0).all()
