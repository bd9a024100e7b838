"""Edge-semantics tests for the queries_ml2 operators: heavy-hitter strict
threshold, gap-fill zero rows and spine bounds, mode tie-breaks, Q3 filter
edges, CUBE marginal consistency, budget allocator clamping, gap-stats
single-event exclusion, and the even-count median rule. Full oracle
equivalence runs in tests/test_queries_oracle.py; these pin hand-reasoned
corner cases on planted micro-tables."""

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


def _docs_parquet(d: str, texts: list[str], langs: list[str] | None = None) -> None:
    langs = langs or ["en"] * len(texts)
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(["t"] * len(texts), pa.string()),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(d, "documents.parquet"))


def _days_ts(days: int) -> int:
    return days * 86_400_000


def _tpch_parquet(
    d: str,
    customers: list[tuple[int, str]],
    orders: list[tuple[int, int, int]],
    lines: list[tuple[int, float, float, int]],
) -> None:
    """customers: (custkey, segment); orders: (orderkey, custkey, odays);
    lines: (orderkey, extendedprice, discount, shipdays)."""
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([c[0] for c in customers], pa.int64()),
                "c_name": pa.array(["c"] * len(customers), pa.string()),
                "c_nationkey": pa.array([0] * len(customers), pa.int64()),
                "c_acctbal": pa.array([0.0] * len(customers), pa.float64()),
                "c_mktsegment": pa.array([c[1] for c in customers], pa.string()),
            }
        ),
        os.path.join(d, "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
                "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(orders), pa.string()),
                "o_totalprice": pa.array([1.0] * len(orders), pa.float64()),
                "o_orderdate": pa.array(
                    [_days_ts(o[2]) for o in orders], pa.int64()
                )
                .cast(pa.timestamp("ms"))
                .cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * len(orders), pa.string()),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([l[0] for l in lines], pa.int64()),
                "l_partkey": pa.array([1] * len(lines), pa.int64()),
                "l_suppkey": pa.array([1] * len(lines), pa.int64()),
                "l_linenumber": pa.array(range(len(lines)), pa.int64()),
                "l_quantity": pa.array([1.0] * len(lines), pa.float64()),
                "l_extendedprice": pa.array([l[1] for l in lines], pa.float64()),
                "l_discount": pa.array([l[2] for l in lines], pa.float64()),
                "l_tax": pa.array([0.0] * len(lines), pa.float64()),
                "l_returnflag": pa.array(["N"] * len(lines), pa.string()),
                "l_linestatus": pa.array(["O"] * len(lines), pa.string()),
                "l_shipdate": pa.array([_days_ts(l[3]) for l in lines], pa.int64())
                .cast(pa.timestamp("ms"))
                .cast(pa.timestamp("us")),
            }
        ),
        os.path.join(d, "lineitem.parquet"),
    )


def _to_df(res):
    import pyarrow as _pa
    import ray

    if isinstance(res, (ray.data.Dataset, _pa.Table)):
        return res.to_pandas()
    return res


def test_heavy_hitter_threshold_is_strict(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml2 import (
        HH_K,
        q_heavy_hitter_tokens,
    )

    # 100 tokens total: "hot" appears 3 (3*50=150 > 100 → in), "edge"
    # appears exactly 2 (2*50=100 == 100 → strictly NOT in)
    filler = " ".join(f"w{i}" for i in range(95))
    with tempfile.TemporaryDirectory() as d:
        _docs_parquet(d, ["hot hot hot edge edge", filler])
        out = _to_df(q_heavy_hitter_tokens(d))
    assert HH_K == 50
    assert dict(zip(out["token"], out["n"])) == {"hot": 3}


def test_gapfill_zero_rows_and_bounds(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml2 import (
        q_events_hourly_gapfill,
    )

    h = 3_600_000
    rows = [
        (1, 0 * h, 1, "a", 0.0),
        (2, 3 * h, 1, "a", 0.0),  # hours 1,2 are gaps for a
        (3, 1 * h, 1, "b", 0.0),  # b exists only at hour 1 → 0,2,3 zero-filled
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_events_hourly_gapfill(d))
    assert len(out) == 8  # 2 types × hours [0,3]
    got = {(r.event_type, r.hour): r.n for r in out.itertuples()}
    assert got[("a", 0)] == 1 and got[("a", 3)] == 1
    assert got[("a", 1)] == 0 and got[("a", 2)] == 0
    assert got[("b", 1)] == 1 and got[("b", 0)] == 0
    assert got[("b", 2)] == 0 and got[("b", 3)] == 0


def test_user_top_event_tie_breaks_lexicographically(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml2 import q_user_top_event

    rows = [
        (1, 1000, 1, "zeta", 0.0),
        (2, 2000, 1, "zeta", 0.0),
        (3, 3000, 1, "alpha", 0.0),
        (4, 4000, 1, "alpha", 0.0),  # tie 2-2 → alpha wins
        (5, 5000, 2, "beta", 0.0),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_user_top_event(d)).sort_values("user_id")
    assert out["event_type"].tolist() == ["alpha", "beta"]
    assert out["n"].tolist() == [2, 1]


def test_q3_filters_and_revenue_exact(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml2 import (
        Q3_CUT_DAYS,
        q_q3_shipping_priority,
    )

    before, after = Q3_CUT_DAYS - 1, Q3_CUT_DAYS + 1
    customers = [(1, "BUILDING"), (2, "MACHINERY")]
    orders = [
        (10, 1, before),  # qualifies
        (11, 1, after),  # order too late → out
        (12, 2, before),  # wrong segment → out
    ]
    lines = [
        (10, 10.00, 0.10, after),  # counts: 1000c × 900000 = 9e8
        (10, 5.00, 0.00, before),  # shipped too early → excluded from rev
        (11, 99.0, 0.0, after),
        (12, 99.0, 0.0, after),
    ]
    with tempfile.TemporaryDirectory() as d:
        _tpch_parquet(d, customers, orders, lines)
        out = _to_df(q_q3_shipping_priority(d))
    assert out["l_orderkey"].tolist() == [10]
    assert out["o_days"].tolist() == [before]
    assert out["rev_u"].tolist() == [1000 * 900_000]


def test_cube_marginals_consistent(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml2 import (
        CUBE_ALL_TYPE,
        CUBE_ALL_WD,
        q_event_type_cube,
    )

    day = 86_400_000
    rows = [
        (1, 0 * day, 1, "a", 0.0),  # wd 0
        (2, 0 * day, 1, "a", 0.0),
        (3, 1 * day, 1, "a", 0.0),  # wd 1
        (4, 1 * day, 1, "b", 0.0),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_event_type_cube(d))
    got = {(r.event_type, r.wd): r.n for r in out.itertuples()}
    assert got[("a", 0)] == 2 and got[("a", 1)] == 1 and got[("b", 1)] == 1
    assert got[("a", CUBE_ALL_WD)] == 3 and got[("b", CUBE_ALL_WD)] == 1
    assert got[(CUBE_ALL_TYPE, 0)] == 2 and got[(CUBE_ALL_TYPE, 1)] == 2
    assert got[(CUBE_ALL_TYPE, CUBE_ALL_WD)] == 4
    assert len(got) == 3 + 2 + 2 + 1


def test_budget_allocator_clamps_small_lang(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml2 import q_lang_token_budget

    # en: 8 tokens, fr: 2 tokens → total 10, budget 5, share 2 per lang.
    # en allocates 2 (rate 250000 micro), fr allocates min(2,2)=2 (rate 1e6).
    with tempfile.TemporaryDirectory() as d:
        _docs_parquet(
            d,
            ["a b c d e f g h", "x y"],
            langs=["en", "fr"],
        )
        out = _to_df(q_lang_token_budget(d)).sort_values("lang")
    assert out["n_tokens"].tolist() == [8, 2]
    assert out["alloc_tokens"].tolist() == [2, 2]
    assert out["rate_micro"].tolist() == [250_000, 1_000_000]


def test_gap_stats_excludes_single_event_users(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml2 import q_user_gap_stats

    rows = [
        (1, 1000, 1, "x", 0.0),
        (2, 4000, 1, "x", 0.0),
        (3, 4000, 1, "x", 0.0),  # duplicate ts → gap 0
        (4, 9000, 1, "x", 0.0),
        (5, 1000, 2, "x", 0.0),  # single event → excluded
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_user_gap_stats(d))
    assert out["user_id"].tolist() == [1]
    assert out["n_gaps"].tolist() == [3]
    assert out["max_gap_ms"].tolist() == [5000]
    assert out["sum_gap_ms"].tolist() == [8000]


def test_median_even_count_picks_lower_cdf_point(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml2 import (
        q_event_value_median_by_type,
    )

    rows = [
        (1, 1000, 1, "a", 0.01),
        (2, 2000, 1, "a", 0.02),  # percentile_disc(0.5) of {1,2,3,4} → 2
        (3, 3000, 1, "a", 0.03),
        (4, 4000, 1, "a", 0.04),
        (5, 5000, 1, "b", 0.09),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_event_value_median_by_type(d)).sort_values("event_type")
    assert out["median_cents"].tolist() == [2, 9]


def _dims_parquet(d: str) -> None:
    """nation 0 in ASIA, nation 1 in EUROPE; suppliers 1→nation0, 2→nation1."""
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([0, 1], pa.int64()),
                "r_name": pa.array(["ASIA", "EUROPE"], pa.string()),
            }
        ),
        os.path.join(d, "region.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int64()),
                "n_name": pa.array(["N_ASIA", "N_EUR"], pa.string()),
                "n_regionkey": pa.array([0, 1], pa.int64()),
            }
        ),
        os.path.join(d, "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2], pa.int64()),
                "s_name": pa.array(["s1", "s2"], pa.string()),
                "s_nationkey": pa.array([0, 1], pa.int64()),
                "s_acctbal": pa.array([0.0, 0.0], pa.float64()),
            }
        ),
        os.path.join(d, "supplier.parquet"),
    )


def _tpch5_parquet(d: str, customers, orders, lines) -> None:
    """customers: (custkey, nationkey); orders: (orderkey, custkey, odays);
    lines: (orderkey, suppkey, extendedprice, discount)."""
    _dims_parquet(d)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([c[0] for c in customers], pa.int64()),
                "c_name": pa.array(["c"] * len(customers), pa.string()),
                "c_nationkey": pa.array([c[1] for c in customers], pa.int64()),
                "c_acctbal": pa.array([0.0] * len(customers), pa.float64()),
                "c_mktsegment": pa.array(["BUILDING"] * len(customers), pa.string()),
            }
        ),
        os.path.join(d, "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
                "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(orders), pa.string()),
                "o_totalprice": pa.array([1.0] * len(orders), pa.float64()),
                "o_orderdate": pa.array([_days_ts(o[2]) for o in orders], pa.int64())
                .cast(pa.timestamp("ms"))
                .cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * len(orders), pa.string()),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([l[0] for l in lines], pa.int64()),
                "l_partkey": pa.array([1] * len(lines), pa.int64()),
                "l_suppkey": pa.array([l[1] for l in lines], pa.int64()),
                "l_linenumber": pa.array(range(len(lines)), pa.int64()),
                "l_quantity": pa.array([1.0] * len(lines), pa.float64()),
                "l_extendedprice": pa.array([l[2] for l in lines], pa.float64()),
                "l_discount": pa.array([l[3] for l in lines], pa.float64()),
                "l_tax": pa.array([0.0] * len(lines), pa.float64()),
                "l_returnflag": pa.array(["N"] * len(lines), pa.string()),
                "l_linestatus": pa.array(["O"] * len(lines), pa.string()),
                "l_shipdate": pa.array([_days_ts(11000)] * len(lines), pa.int64())
                .cast(pa.timestamp("ms"))
                .cast(pa.timestamp("us")),
            }
        ),
        os.path.join(d, "lineitem.parquet"),
    )


def test_q5_requires_same_nation_region_and_window(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml2 import (
        Q5_HI_DAYS,
        Q5_LO_DAYS,
        q_q5_local_supplier_volume,
    )

    inside = (Q5_LO_DAYS + Q5_HI_DAYS) // 2
    customers = [(1, 0), (2, 1)]  # cust 1 in ASIA nation 0, cust 2 in EUROPE
    orders = [
        (10, 1, inside),  # qualifies
        (11, 1, Q5_HI_DAYS),  # outside window → out
        (12, 2, inside),  # EUROPE customer → region filter drops
    ]
    lines = [
        (10, 1, 10.00, 0.10),  # supplier nation 0 == cust nation 0 → in
        (10, 2, 99.0, 0.0),  # supplier nation 1 ≠ cust nation 0 → out
        (11, 1, 99.0, 0.0),
        (12, 2, 99.0, 0.0),  # same-nation but non-ASIA region → out
    ]
    with tempfile.TemporaryDirectory() as d:
        _tpch5_parquet(d, customers, orders, lines)
        out = _to_df(q_q5_local_supplier_volume(d))
    assert out["n_name"].tolist() == ["N_ASIA"]
    assert out["rev_u"].tolist() == [1000 * 900_000]


def test_salted_counts_equal_plain_counts(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml2 import (
        q_event_type_counts_salted,
    )

    rows = [(i, 1000 * i, 1, "hot" if i % 10 else "cold", 0.0) for i in range(200)]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_event_type_counts_salted(d)).sort_values("event_type")
    assert dict(zip(out["event_type"], out["n"])) == {"cold": 20, "hot": 180}


def test_trailing_window_clips_and_counts_zero_hours(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml2 import (
        q_events_daily_trailing,
    )

    h = 3_600_000
    # type a: events at hours 0 and 30 — hour 30's trailing-24 frame
    # (hours 7..30) contains only the hour-30 event (hour 0 aged out)
    rows = [(1, 0 * h, 1, "a", 0.0), (2, 30 * h, 1, "a", 0.0)]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_events_daily_trailing(d))
    got = {r.hour: (r.n, r.trail24) for r in out.itertuples()}
    assert len(out) == 31
    assert got[0] == (1, 1)
    assert got[10] == (0, 1)  # hour 0 still inside frame (rows 0..10)
    assert got[23] == (0, 1)  # last frame containing hour 0
    assert got[24] == (0, 0)  # hour 0 aged out, nothing since
    assert got[30] == (1, 1)


def test_pairwise_dot_matches_hand_computation(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml2 import q_label_pairwise_dot

    # label 0 quantized vectors: (1,2), (3,1), (1,1) → pair dots 5+3+4 = 12
    # label 1 single vector → 0 pairs, pair_dot 0
    embs = [[0.001, 0.002], [0.003, 0.001], [0.001, 0.001], [0.009, 0.009]]
    labels = [0, 0, 0, 1]
    t = pa.table(
        {
            "vec_id": pa.array(range(4), pa.int64()),
            "embedding": pa.array(embs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "embeddings.parquet"))
        out = _to_df(q_label_pairwise_dot(d)).sort_values("label")
    assert out["n_vecs"].tolist() == [3, 1]
    assert out["pair_dot"].tolist() == [12, 0]


def test_event_sequence_truncates_and_orders_by_ts_then_id(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml2 import (
        SEQ_K,
        q_user_event_sequence,
    )

    # user 1: SEQ_K+2 events; two share ms=5000 → event_id breaks the tie
    rows = [(i, 1000 * i, 1, f"t{i}", 0.0) for i in range(1, SEQ_K + 1)]
    rows += [(99, 5000, 1, "late_id", 0.0)]  # same ms as event 5, larger id
    rows += [(100, 999_999, 1, "tail", 0.0)]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_user_event_sequence(d))
    expected = ["t1", "t2", "t3", "t4", "t5", "late_id", "t6", "t7", "t8", "t9"]
    assert out["seq"].tolist() == [",".join(expected)]


def test_salted_join_handles_planted_hot_key(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml2 import (
        q_orders_join_nation_salted,
    )

    # one customer (nation 0) owns 500 orders — every salt shard must still
    # find the replicated build row, and totals must be exact
    _ = _dims_parquet  # nations N_ASIA / N_EUR
    customers = [(1, 0), (2, 1)]
    with tempfile.TemporaryDirectory() as d:
        _dims_parquet(d)
        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([c[0] for c in customers], pa.int64()),
                    "c_name": pa.array(["c"] * 2, pa.string()),
                    "c_nationkey": pa.array([c[1] for c in customers], pa.int64()),
                    "c_acctbal": pa.array([0.0] * 2, pa.float64()),
                    "c_mktsegment": pa.array(["BUILDING"] * 2, pa.string()),
                }
            ),
            os.path.join(d, "customer.parquet"),
        )
        n = 500
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array(range(n + 1), pa.int64()),
                    "o_custkey": pa.array([1] * n + [2], pa.int64()),
                    "o_orderstatus": pa.array(["O"] * (n + 1), pa.string()),
                    "o_totalprice": pa.array([1.25] * (n + 1), pa.float64()),
                    "o_orderdate": pa.array([0] * (n + 1), pa.int64())
                    .cast(pa.timestamp("ms"))
                    .cast(pa.timestamp("us")),
                    "o_orderpriority": pa.array(["1-URGENT"] * (n + 1), pa.string()),
                }
            ),
            os.path.join(d, "orders.parquet"),
        )
        out = _to_df(q_orders_join_nation_salted(d)).sort_values("n_name")
    assert out["n_name"].tolist() == ["N_ASIA", "N_EUR"]
    assert out["n_orders"].tolist() == [500, 1]
    assert out["total_cents"].tolist() == [500 * 125, 125]


def test_funnel_window_boundaries(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml2 import (
        FUNNEL_MS,
        q_funnel_users,
    )

    w = FUNNEL_MS
    rows = [
        # user 1: click exactly at view + W → inside (<=)
        (1, 10_000, 1, "view", 0.0),
        (2, 10_000 + w, 1, "click", 0.0),
        # user 2: click at the same ms as the view → NOT strictly after
        (3, 10_000, 2, "view", 0.0),
        (4, 10_000, 2, "click", 0.0),
        # user 3: click one ms past the window → out
        (5, 10_000, 3, "view", 0.0),
        (6, 10_000 + w + 1, 3, "click", 0.0),
        # user 4: click BEFORE the view → out
        (7, 50_000, 4, "click", 0.0),
        (8, 60_000, 4, "view", 0.0),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_funnel_users(d))
    assert out["user_id"].tolist() == [1]


def test_orphan_orders_detected(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml2 import (
        q_orders_without_lineitem,
    )

    customers = [(1, "BUILDING")]
    orders = [(10, 1, 10000), (11, 1, 10000), (12, 1, 10000)]
    lines = [(10, 1.0, 0.0, 10000), (12, 1.0, 0.0, 10000)]
    with tempfile.TemporaryDirectory() as d:
        _tpch_parquet(d, customers, orders, lines)
        out = _to_df(q_orders_without_lineitem(d))
    assert out["o_orderkey"].tolist() == [11]


def test_retention_cohort_counts_distinct_user_days(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml2 import (
        q_user_retention_cohort,
    )

    day = 86_400_000
    rows = [
        (1, 5 * day, 1, "x", 0.0),  # user 1: cohort day 5
        (2, 5 * day + 1, 1, "x", 0.0),  # same day → one distinct (user, day)
        (3, 7 * day, 1, "x", 0.0),  # offset 2
        (4, 6 * day, 2, "x", 0.0),  # user 2: cohort day 6
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_user_retention_cohort(d))
    got = {(r.cohort_day, r.offset_day): r.n_users for r in out.itertuples()}
    assert got == {(5, 0): 1, (5, 2): 1, (6, 0): 1}


def test_label_dim_argmax_tie_breaks_to_smallest_dim(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml2 import q_label_dim_argmax

    # label 0: sums per dim = (3, 3) → tie → dim 0 wins
    embs = [[0.001, 0.002], [0.002, 0.001]]
    t = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array(embs, pa.list_(pa.float32())),
            "label": pa.array([0, 0], pa.int64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "embeddings.parquet"))
        out = _to_df(q_label_dim_argmax(d))
    assert out["dim"].tolist() == [0]
    assert out["s"].tolist() == [3]


def test_sampled_docs_respect_budget_rates(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml2 import (
        SAMPLE_HASH_MOD,
        SAMPLE_HASH_MULT,
        q_lang_sampled_docs,
    )

    # en: 8 tokens → rate 250000; fr: 2 tokens → rate 1e6 (always kept)
    with tempfile.TemporaryDirectory() as d:
        _docs_parquet(d, ["a b c d e f g h", "x y"], langs=["en", "fr"])
        out = _to_df(q_lang_sampled_docs(d))
    expected = []
    for doc_id, lang, rate in [(0, "en", 250_000), (1, "fr", 1_000_000)]:
        if (doc_id * SAMPLE_HASH_MULT) % SAMPLE_HASH_MOD % 1_000_000 < rate:
            expected.append((doc_id, lang))
    assert sorted(zip(out["doc_id"], out["lang"])) == expected
    assert (1, "fr") in expected  # rate 1e6 keeps unconditionally


def test_unpivot_round_trips_pivot_with_zero_cells(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml2 import (
        q_event_weekday_unpivot,
    )

    day = 86_400_000
    rows = [
        (1, 0 * day, 1, "a", 0.0),  # wd 0
        (2, 0 * day, 1, "a", 0.0),
        (3, 1 * day, 1, "b", 0.0),  # wd 1
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_event_weekday_unpivot(d))
    got = {(r.event_type, r.wd): r.n for r in out.itertuples()}
    assert len(got) == 14  # 2 types × 7 weekdays, zeros explicit
    assert got[("a", 0)] == 2 and got[("b", 1)] == 1
    assert got[("a", 1)] == 0 and got[("b", 0)] == 0
    assert sum(got.values()) == 3
