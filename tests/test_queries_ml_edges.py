"""Edge-semantics tests for the queries_ml curation operators: window
clipping at segment starts, argmax tie-breaks, strict-inequality in the
correlated-aggregate join, anti-join/set-difference membership rules, and
rollup-level consistency. Full oracle equivalence runs in
tests/test_queries_oracle.py; these pin the hand-reasoned corner cases on
planted micro-tables."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _events_parquet(d: str, rows: list[tuple[int, int, int, str, float]]) -> None:
    """rows: (event_id, ms, user_id, event_type, value)."""
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64())
            .cast(pa.timestamp("ms"))
            .cast(pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))


def _to_df(res):
    import ray

    return res.to_pandas() if isinstance(res, ray.data.Dataset) else res


def test_rolling3_clips_at_user_start(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml import q_user_value_rolling3

    # user 1: four events 10,20,30,40 cents; user 2 interleaved in time
    rows = [
        (1, 1000, 1, "x", 0.10),
        (2, 2000, 1, "x", 0.20),
        (10, 2500, 2, "x", 9.99),
        (3, 3000, 1, "x", 0.30),
        (4, 4000, 1, "x", 0.40),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_user_value_rolling3(d)).sort_values("event_id")
    got = dict(zip(out["event_id"], out["roll3_cents"]))
    # windows: [10], [10,20], [10,20,30], [20,30,40]; user 2 isolated
    assert got == {1: 10, 2: 30, 3: 60, 4: 90, 10: 999}


def test_latest_event_tie_breaks_on_event_id(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml import q_latest_event_per_user

    rows = [
        (5, 1000, 1, "x", 0.0),
        (9, 1000, 1, "x", 0.0),  # same ms — larger event_id wins
        (7, 500, 1, "x", 0.0),
        (1, 9000, 2, "x", 0.0),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_latest_event_per_user(d)).sort_values("user_id")
    assert out["event_id"].tolist() == [9, 1]
    assert out["ms"].tolist() == [1000, 9000]


def test_hopping_single_event_covers_exactly_five_windows(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml import (
        HOP_WINDOWS,
        q_hopping_counts,
    )

    rows = [(1, 7 * 60_000, 1, "x", 0.0)]  # minute 7
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_hopping_counts(d)).sort_values("w")
    assert out["w"].tolist() == list(range(7 - HOP_WINDOWS + 1, 8))
    assert (out["n"] == 1).all()


def test_rollup_levels_are_consistent(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml import (
        DAY_MS,
        ROLLUP_ALL_DAY,
        ROLLUP_ALL_TYPE,
        q_event_rollup_counts,
    )

    rows = [
        (1, 0 * DAY_MS + 5, 1, "a", 0.0),
        (2, 0 * DAY_MS + 6, 1, "b", 0.0),
        (3, 1 * DAY_MS + 7, 1, "a", 0.0),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_event_rollup_counts(d))
    base = out[(out["day"] != ROLLUP_ALL_DAY) & (out["event_type"] != ROLLUP_ALL_TYPE)]
    day_lvl = out[(out["day"] != ROLLUP_ALL_DAY) & (out["event_type"] == ROLLUP_ALL_TYPE)]
    total = out[(out["day"] == ROLLUP_ALL_DAY) & (out["event_type"] == ROLLUP_ALL_TYPE)]
    assert base["n"].sum() == day_lvl["n"].sum() == int(total["n"].iloc[0]) == 3
    assert dict(zip(day_lvl["day"], day_lvl["n"])) == {0: 2, 1: 1}


def _orders_parquet(d: str, rows: list[tuple[int, int, float, str]]) -> None:
    """rows: (o_orderkey, o_custkey, o_totalprice, o_orderpriority)."""
    t = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
            "o_orderpriority": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "orders.parquet"))


def test_above_avg_is_strict(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml import q_orders_above_cust_avg

    rows = [
        # customer 1: equal prices — nothing strictly above the mean
        (1, 1, 50.0, "P"),
        (2, 1, 50.0, "P"),
        # customer 2: single order — its own mean, not above
        (3, 2, 10.0, "P"),
        # customer 3: 10 and 30 — only the 30 is above the 20 mean
        (4, 3, 10.0, "P"),
        (5, 3, 30.0, "Q"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_parquet(d, rows)
        out = _to_df(q_orders_above_cust_avg(d))
    assert dict(zip(out["o_orderpriority"], out["n_above"])) == {"Q": 1}


def test_set_difference_membership(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml import (
        SET_A_PRIO,
        SET_B_PRIO,
        q_custs_urgent_no_low,
    )

    rows = [
        (1, 1, 1.0, SET_A_PRIO),  # urgent only → kept
        (2, 2, 1.0, SET_A_PRIO),  # urgent AND low → dropped
        (3, 2, 1.0, SET_B_PRIO),
        (4, 3, 1.0, SET_B_PRIO),  # low only → not in A
        (5, 4, 1.0, "2-HIGH"),  # neither → not in A
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_parquet(d, rows)
        out = _to_df(q_custs_urgent_no_low(d))
    assert out["o_custkey"].tolist() == [1]


def test_anti_join_keeps_customers_without_any_orders(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml import (
        ANTI_PRIORITY,
        q_customers_without_urgent,
    )

    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3], pa.int64()),
            "c_mktsegment": pa.array(["S1", "S1", "S2"], pa.string()),
        }
    )
    rows = [
        (1, 1, 1.0, ANTI_PRIORITY),  # cust 1 has urgent → dropped
        (2, 2, 1.0, "5-LOW"),  # cust 2 only non-urgent → kept
        # cust 3 has no orders at all → kept
    ]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(cust, os.path.join(d, "customer.parquet"))
        _orders_parquet(d, rows)
        out = _to_df(q_customers_without_urgent(d))
    assert dict(zip(out["c_mktsegment"], out["n_customers"])) == {"S1": 1, "S2": 1}


def test_bucketed_kernels_survive_block_fragmentation(ray_session):
    """Shrinking target_max_block_size fragments every read into many tiny
    blocks — partial kernels then see single-digit-row batches and every
    bucket spans many blocks. Results must still equal the DuckDB oracle
    (catches carry/boundary bugs the default block layout never exercises)."""
    import duckdb
    import ray
    from ray.data import DataContext

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    qs, osql = e.queries(), e.oracle_sql()
    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 16 * 1024
    try:
        for name in (
            "user_value_rolling3",
            "latest_event_per_user",
            "orders_above_cust_avg",
            "daily_active_users",
            "event_rollup_counts",
        ):
            res = qs[name](sf)
            if isinstance(res, ray.data.Dataset):
                res = res.to_pandas()
            con = duckdb.connect()
            for t in ("events", "orders"):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
                )
            ora = con.execute(osql[name]).fetchdf()
            a = res[sorted(res.columns)].sort_values(
                sorted(res.columns), kind="stable"
            ).reset_index(drop=True)
            b = ora[sorted(ora.columns)].sort_values(
                sorted(ora.columns), kind="stable"
            ).reset_index(drop=True)
            assert len(a) == len(b), name
            for c in a.columns:
                x, y = a[c].to_numpy(), b[c].to_numpy()
                if x.dtype.kind in "iuf" or y.dtype.kind in "iuf":
                    assert np.array_equal(
                        x.astype(np.int64), y.astype(np.int64)
                    ), f"{name}.{c}"
                else:
                    assert (x.astype(str) == y.astype(str)).all(), f"{name}.{c}"
    finally:
        ctx.target_max_block_size = old


def test_hll_exact_at_small_n_and_close_at_large_n(ray_session):
    """HLL with 2^12 registers: linear counting makes small cardinalities
    exact; a 10k-distinct synthetic stream must estimate within 3%."""
    import duckdb

    from mklab_focused_crawler_ray.pipelines.queries_ml import q_approx_distinct_users

    sf = "/root/testdata/sf0.001"
    out = _to_df(q_approx_distinct_users(sf))
    exact = duckdb.sql(
        f"SELECT event_type, COUNT(DISTINCT user_id) AS n FROM "
        f"read_parquet('{sf}/events.parquet') GROUP BY 1"
    ).fetchdf()
    ex = dict(zip(exact["event_type"], exact["n"]))
    for t, est in zip(out["event_type"], out["est_users"]):
        assert est == ex[t], (t, est, ex[t])  # linear-counting regime: exact

    rows = [(i, 1000 + i, i * 7 + (i % 3), "x", 0.0) for i in range(30000)]
    # 10k distinct users (i*7+(i%3) collides: compute exact below)
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_approx_distinct_users(d))
        n_exact = duckdb.sql(
            f"SELECT COUNT(DISTINCT user_id) FROM read_parquet('{d}/events.parquet')"
        ).fetchone()[0]
    est = int(out["est_users"].iloc[0])
    assert abs(est - n_exact) / n_exact < 0.03, (est, n_exact)
