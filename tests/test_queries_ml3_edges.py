"""Edge-semantics tests for the queries_ml3 operators: ED-1 blocking
completeness (substitution/insert/delete, no ED-2 leakage, multi-variant
dedup), split determinism and stratification, postings AND intersection,
negative-sampling self-collision drop, skew-profile rank/cumshare
arithmetic, and chunk-dedup window boundaries. Full oracle equivalence
runs in tests/test_queries_oracle.py; these pin hand-reasoned corner
cases on planted micro-tables."""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from tests.test_queries_ml2_edges import _docs_parquet, _events_parquet, _to_df


def _part_parquet(d: str, names: list[str]) -> None:
    t = pa.table(
        {
            "p_partkey": pa.array(range(len(names)), pa.int64()),
            "p_name": pa.array(names, pa.string()),
            "p_brand": pa.array(["B"] * len(names), pa.string()),
            "p_type": pa.array(["T"] * len(names), pa.string()),
            "p_size": pa.array([1] * len(names), pa.int32()),
            "p_retailprice": pa.array([1.0] * len(names), pa.float64()),
        }
    )
    pq.write_table(t, os.path.join(d, "part.parquet"))


def _emb_parquet(d: str, n: int) -> None:
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([[0.0, 0.0]] * n, pa.list_(pa.float32())),
            "label": pa.array([0] * n, pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(d, "embeddings.parquet"))


def test_ed1_join_finds_sub_ins_del_and_rejects_ed2(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        q_part_name_typo_pairs,
    )

    names = [
        "widget",  # base
        "wadget",  # substitution → ED 1
        "widgets",  # insertion at end → ED 1
        "idget",  # deletion at front → ED 1
        "wadgets",  # ED 2 from widget (sub+ins) but ED 1 from wadget/widgets
        "bolt",  # far away
    ]
    with tempfile.TemporaryDirectory() as d:
        _part_parquet(d, names)
        out = _to_df(q_part_name_typo_pairs(d))
    pairs = set(zip(out["name_a"], out["name_b"]))
    expected = {
        ("wadget", "widget"),
        ("widget", "widgets"),
        ("idget", "widget"),
        ("wadget", "wadgets"),
        ("wadgets", "widgets"),
    }
    assert pairs == expected  # no ED-2 pair, no duplicate rows
    assert len(out) == len(pairs)


def test_ed1_duplicate_names_yield_no_self_pairs(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        q_part_name_typo_pairs,
    )

    with tempfile.TemporaryDirectory() as d:
        _part_parquet(d, ["aa", "aa", "ab"])  # duplicate rows of the same name
        out = _to_df(q_part_name_typo_pairs(d))
    assert set(zip(out["name_a"], out["name_b"])) == {("aa", "ab")}


def test_split_assign_deterministic_and_stratified(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        SPLIT_MULT,
        SPLIT_TRAIN_PCT,
        SPLIT_VAL_PCT,
        q_doc_split_assign,
    )

    texts = [f"doc {i}" for i in range(200)]
    langs = ["en" if i % 2 == 0 else "fr" for i in range(200)]
    with tempfile.TemporaryDirectory() as d:
        _docs_parquet(d, texts, langs=langs)
        out = _to_df(q_doc_split_assign(d))
    # replay the hash: per-(lang, split) counts must match exactly
    expected: dict[tuple[str, str], int] = {}
    for i, lang in enumerate(langs):
        h = (i * SPLIT_MULT) % (1 << 32) % 100
        s = "train" if h < SPLIT_TRAIN_PCT else ("val" if h < SPLIT_VAL_PCT else "test")
        expected[(lang, s)] = expected.get((lang, s), 0) + 1
    got = {(r.lang, r.split): r.n_docs for r in out.itertuples()}
    assert got == expected
    assert int(out["n_docs"].sum()) == 200


def test_negatives_drop_self_collision(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        NEG_K,
        NEG_MULT,
        q_contrastive_negatives,
    )

    n = 7
    with tempfile.TemporaryDirectory() as d:
        _emb_parquet(d, n)
        out = _to_df(q_contrastive_negatives(d))
    got = {(r.vec_id, r.j): r.neg_id for r in out.itertuples()}
    expected = {}
    for v in range(n):
        for j in range(1, NEG_K + 1):
            neg = (v * NEG_MULT + j) % n
            if neg != v:
                expected[(v, j)] = neg
    assert got == expected


def test_skew_profile_rank_and_cumshare(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import q_key_skew_profile

    rows = (
        [(i, 1000 + i, 1, "hot", 0.0) for i in range(6)]
        + [(10 + i, 2000 + i, 1, "warm", 0.0) for i in range(3)]
        + [(20, 3000, 1, "cold", 0.0)]
    )
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_key_skew_profile(d)).sort_values("rnk").reset_index(drop=True)
    assert out["event_type"].tolist() == ["hot", "warm", "cold"]
    assert out["n"].tolist() == [6, 3, 1]
    assert out["share_ppm"].tolist() == [600_000, 300_000, 100_000]
    assert out["cum_ppm"].tolist() == [600_000, 900_000, 1_000_000]


def test_chunk_dedup_counts_occurrences_and_distinct_docs(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries import CHUNK_W
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        q_chunk_dedup_groups,
    )

    assert CHUNK_W == 32  # the ML3 oracle SQL hardcodes the 32-token window
    base = " ".join(f"w{i}" for i in range(CHUNK_W))  # exactly one window
    other = " ".join(f"x{i}" for i in range(CHUNK_W))
    # doc0 repeats `base` twice (2 occurrences in ONE doc); doc1 has it once;
    # doc2 is all-unique
    with tempfile.TemporaryDirectory() as d:
        _docs_parquet(d, [f"{base} {base}", f"{base} tail", other])
        out = _to_df(q_chunk_dedup_groups(d))
    assert len(out) == 1
    row = out.iloc[0]
    assert row["chunk"] == base
    assert row["n_occ"] == 3 and row["n_docs"] == 2


def test_postings_and_query_intersects_rarest_terms(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        q_postings_and_query,
    )

    # vocabulary counts: "common" everywhere; "rare1"/"rare2" the 2 rarest;
    # only doc 0 contains both
    texts = [
        "common rare1 rare2",
        "common rare1 filler filler",
        "common rare2 filler filler",
        "common filler filler filler filler",
    ]
    # the index cache dir is content-fingerprinted (abs path + size +
    # mtime), so a fresh temp corpus never reuses another tier's postings
    with tempfile.TemporaryDirectory() as d:
        _docs_parquet(d, texts)
        out = _to_df(q_postings_and_query(d))
    assert out["doc_id"].tolist() == [0]


# --------------------------------------------------------------------------
# wave-6 operators (bloom semi-join, secondary sort, chi2, constraint audit)
# --------------------------------------------------------------------------


def _orders_lines_parquet(d, orders, lines):
    """orders: (orderkey, priority, totalprice, odays);
    lines: (orderkey, returnflag, quantity, discount)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.test_queries_ml2_edges import _days_ts

    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
                "o_custkey": pa.array([1] * len(orders), pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(orders), pa.string()),
                "o_totalprice": pa.array([o[2] for o in orders], pa.float64()),
                "o_orderdate": pa.array([_days_ts(o[3]) for o in orders], pa.int64())
                .cast(pa.timestamp("ms"))
                .cast(pa.timestamp("us")),
                "o_orderpriority": pa.array([o[1] for o in orders], pa.string()),
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
                "l_quantity": pa.array([float(l[2]) for l in lines], pa.float64()),
                "l_extendedprice": pa.array([1.0] * len(lines), pa.float64()),
                "l_discount": pa.array([float(l[3]) for l in lines], pa.float64()),
                "l_tax": pa.array([0.0] * len(lines), pa.float64()),
                "l_returnflag": pa.array([l[1] for l in lines], pa.string()),
                "l_linestatus": pa.array(["O"] * len(lines), pa.string()),
                "l_shipdate": pa.array([_days_ts(1)] * len(lines), pa.int64())
                .cast(pa.timestamp("ms"))
                .cast(pa.timestamp("us")),
            }
        ),
        os.path.join(d, "lineitem.parquet"),
    )


def test_bloom_filter_has_no_false_negatives_and_verify_removes_fps():
    import numpy as np

    from mklab_focused_crawler_ray.functions.bloom import bloom_contains, make_bloom

    keys = np.arange(0, 1000, 2, dtype=np.int64)  # evens
    words, m = make_bloom(keys, bits_per_key=16)
    assert bloom_contains(words, m, keys).all()  # FN-free always
    # a deliberately undersized filter MUST show false positives (that's
    # what the exact verify stage downstream exists to remove)
    tiny_words, tiny_m = make_bloom(keys, bits_per_key=1)
    odds = np.arange(1, 1000, 2, dtype=np.int64)
    assert bloom_contains(tiny_words, tiny_m, keys).all()
    assert bloom_contains(tiny_words, tiny_m, odds).any()
    # the right-sized filter keeps the FP tail small on non-members
    fp = bloom_contains(words, m, odds).mean()
    assert fp < 0.01


def test_bloom_semijoin_exact_per_flag(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        q_bloom_semijoin_lines,
    )

    orders = [
        (1, "3-MEDIUM", 10.0, 1),
        (2, "1-URGENT", 10.0, 1),
        (3, "3-MEDIUM", 10.0, 1),
    ]
    lines = [
        (1, "A", 2, 0.0),
        (1, "R", 3, 0.0),
        (2, "A", 100, 0.0),  # non-medium order: excluded
        (3, "A", 5, 0.0),
        (4, "R", 7, 0.0),  # orphan key: excluded
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_lines_parquet(d, orders, lines)
        out = _to_df(q_bloom_semijoin_lines(d))
    got = {r.l_returnflag: (r.n_lines, r.sum_qty) for r in out.itertuples()}
    assert got == {"A": (2, 7), "R": (1, 3)}


def test_event_ordinals_checksum_orders_ties_by_event_id(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        ORD_BUCKETS,
        q_user_event_ordinals,
    )

    # one user → one bucket; two events share a timestamp → event_id breaks
    # the tie, and the position-weighted checksum detects any other order
    rows = [
        (7, 2000, 1, "x", 0.0),  # ordinal 3
        (5, 1000, 1, "x", 0.0),  # ts tie with 6 → ordinal 1 (smaller id)
        (6, 1000, 1, "x", 0.0),  # ordinal 2
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_user_event_ordinals(d))
    assert len(out) == 1
    row = out.iloc[0]
    assert row["bucket"] == 1 % ORD_BUCKETS
    assert row["n_rows"] == 3
    assert row["ord_checksum"] == 1 * 5 + 2 * 6 + 3 * 7


def test_chi2_contingency_hand_computed(ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mklab_focused_crawler_ray.pipelines.queries_ml3 import q_lang_source_chi2

    # 2×2 table: en/a=30, en/b=10, fr/a=10, fr/b=30 → total 80
    langs = ["en"] * 40 + ["fr"] * 40
    sources = ["a"] * 30 + ["b"] * 10 + ["a"] * 10 + ["b"] * 30
    t = pa.table(
        {
            "doc_id": pa.array(range(80), pa.int64()),
            "text": pa.array(["w"] * 80, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([1] * 80, pa.int64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        out = _to_df(q_lang_source_chi2(d))
    got = {(r.lang, r.source): (r.n, r.contrib_micro) for r in out.itertuples()}
    # every cell: row=40, col=40, total=80; dev = n*80 - 1600
    # en/a: dev=800 → 800*800//1600*1e6//80 = 400*1e6//80 = 5_000_000
    assert got == {
        ("en", "a"): (30, 5_000_000),
        ("en", "b"): (10, 5_000_000),
        ("fr", "a"): (10, 5_000_000),
        ("fr", "b"): (30, 5_000_000),
    }


def test_constraint_audit_reports_explicit_zeros(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        q_orders_constraint_audit,
    )

    # epoch day 11324 = 2001-01-02 (late); violations planted for 3 of the
    # 5 checks; discount & quantity stay clean → must still appear as 0
    orders = [
        (1, "1-URGENT", 400_000.0, 11_324),  # late + over price cap
        (2, "1-URGENT", 10.0, 100),
    ]
    lines = [
        (1, "N", 10, 0.05),
        (9, "N", 10, 0.05),  # orphan (no order 9)
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_lines_parquet(d, orders, lines)
        out = _to_df(q_orders_constraint_audit(d))
    got = dict(zip(out["check_name"], out["n_violations"]))
    assert got == {
        "late_order_date": 1,
        "price_above_cap": 1,
        "discount_above_cap": 0,
        "quantity_above_cap": 0,
        "orphan_lineitem": 1,
    }


# --------------------------------------------------------------------------
# wave-7 operators (OLS trend, z-order, percent-of-parent, incremental)
# --------------------------------------------------------------------------


def test_trend_slope_sufficient_stats_hand_computed(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        TREND_X0,
        q_type_value_trend,
    )

    day = 86_400_000
    # y = 2x + 1 exactly (cents): slope_num/slope_den must equal 2
    pts = [(0, 1.0), (1, 3.0), (2, 5.0)]  # (day offset from X0, value dollars?)
    rows = [
        (i, (TREND_X0 + dx) * day, 1, "x", v / 100.0 * 100.0)  # value in units
        for i, (dx, v) in enumerate(pts)
    ]
    # value column is dollars; cents y = floor(v*100+0.5): use v so cents = 2x+1
    rows = [(i, (TREND_X0 + dx) * day, 1, "x", (2 * dx + 1) / 100.0) for i, (dx, _) in enumerate(pts)]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_type_value_trend(d))
    r = out.iloc[0]
    # n=3, x=(0,1,2), y=(1,3,5): num = 3*13 - 3*9 = 12, den = 3*5 - 9 = 6
    assert (r["n"], r["slope_num"], r["slope_den"]) == (3, 12, 6)
    assert r["slope_num"] / r["slope_den"] == 2.0


def test_zorder_interleaves_user_and_day_bits(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        q_user_day_zorder_profile,
    )

    day = 86_400_000
    # user 0b0011=3, day 0b0101=5 → z interleave (u even bits, d odd bits):
    # bits: u0=1→b0, d0=1→b1, u1=1→b2, d1=0→b3, u2=0→b4, d2=1→b5, u3=0, d3=0
    # z = 1 + 2 + 4 + 0 + 0 + 32 = 39
    rows = [(1, 5 * day, 3, "x", 0.0), (2, 5 * day + 1, 3, "x", 0.0)]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_user_day_zorder_profile(d))
    assert out["z"].tolist() == [39]
    assert out["n_events"].tolist() == [2]
    assert out["n_users"].tolist() == [1]


def test_nation_region_share_sums_to_million_per_region(ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        q_nation_region_share,
    )
    from tests.test_queries_ml2_edges import _days_ts

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "r_regionkey": pa.array([0, 1], pa.int64()),
                    "r_name": pa.array(["R0", "R1"], pa.string()),
                }
            ),
            os.path.join(d, "region.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "n_nationkey": pa.array([0, 1, 2], pa.int64()),
                    "n_name": pa.array(["N0", "N1", "N2"], pa.string()),
                    "n_regionkey": pa.array([0, 0, 1], pa.int64()),
                }
            ),
            os.path.join(d, "nation.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([10, 11, 12], pa.int64()),
                    "c_name": pa.array(["c"] * 3, pa.string()),
                    "c_nationkey": pa.array([0, 1, 2], pa.int64()),
                    "c_acctbal": pa.array([0.0] * 3, pa.float64()),
                    "c_mktsegment": pa.array(["s"] * 3, pa.string()),
                }
            ),
            os.path.join(d, "customer.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
                    "o_custkey": pa.array([10, 11, 11, 12], pa.int64()),
                    "o_orderstatus": pa.array(["O"] * 4, pa.string()),
                    "o_totalprice": pa.array([10.0, 20.0, 10.0, 7.0], pa.float64()),
                    "o_orderdate": pa.array([_days_ts(1)] * 4, pa.int64())
                    .cast(pa.timestamp("ms"))
                    .cast(pa.timestamp("us")),
                    "o_orderpriority": pa.array(["1-URGENT"] * 4, pa.string()),
                }
            ),
            os.path.join(d, "orders.parquet"),
        )
        out = _to_df(q_nation_region_share(d))
    got = {r.n_name: (r.r_name, r.rev_cents, r.share_ppm) for r in out.itertuples()}
    # R0: N0=1000c, N1=3000c (total 4000) → shares 250000 / 750000
    # R1: N2=700c alone → 1000000
    assert got == {
        "N0": ("R0", 1000, 250_000),
        "N1": ("R0", 3000, 750_000),
        "N2": ("R1", 700, 1_000_000),
    }


def test_incremental_merge_splits_base_and_delta(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        q_event_counts_incremental,
    )

    rows = [
        (10, 1000, 1, "a", 0.0),  # delta (id % 10 == 0)
        (11, 1001, 1, "a", 0.0),  # base
        (12, 1002, 1, "a", 0.0),  # base
        (20, 1003, 1, "b", 0.0),  # delta
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_event_counts_incremental(d))
    got = {r.event_type: (r.n_base, r.n_delta, r.n_total) for r in out.itertuples()}
    assert got == {"a": (2, 1, 3), "b": (0, 1, 1)}


# --------------------------------------------------------------------------
# wave-8 operators (watermark lateness, sliding-window distinct, PQ codes)
# --------------------------------------------------------------------------


def test_late_events_counted_against_running_watermark(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        ARRIVAL_MULT,
        q_user_late_events,
    )

    # choose event ids and replay the hash to know the arrival order, then
    # plant timestamps so exactly one event is late in that order
    ids = [1, 2, 3, 4]
    arrival = sorted(ids, key=lambda e: ((e * ARRIVAL_MULT) % (1 << 32), e))
    # timestamps increase with arrival EXCEPT the last arrival, which gets
    # a time earlier than the watermark → exactly 1 late event
    ms_by_id = {}
    for i, e in enumerate(arrival[:-1]):
        ms_by_id[e] = 1000 + i * 1000
    ms_by_id[arrival[-1]] = 500  # before everything → late
    rows = [(e, ms_by_id[e], 1, "x", 0.0) for e in ids]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_user_late_events(d))
    assert len(out) == 1
    assert (out.iloc[0]["n_events"], out.iloc[0]["n_late"]) == (4, 1)


def test_wau_counts_trailing_window_distinct_users(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import q_wau_by_day

    day = 86_400_000
    rows = [
        (1, 0 * day, 1, "x", 0.0),  # user 1 on day 0
        (2, 3 * day, 2, "x", 0.0),  # user 2 on day 3
        (3, 3 * day, 1, "x", 0.0),  # user 1 again on day 3
        (4, 20 * day, 3, "x", 0.0),  # user 3 far away (outside any window)
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_wau_by_day(d))
    got = dict(zip(out["day"], out["wau"]))
    # anchors = active days {0, 3, 20}; window 7 days trailing:
    # day 0 → {u1}; day 3 → {u1 (day0 & day3), u2}; day 20 → {u3}
    assert got == {0: 1, 3: 2, 20: 1}


def test_pq_codes_assign_nearest_subspace_centroid(ray_session):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        PQ_NCENTROIDS,
        PQ_SUBDIM,
        PQ_SUBSPACES,
        q_embedding_pq_codes,
    )

    dim = PQ_SUBSPACES * PQ_SUBDIM
    rng = np.random.RandomState(7)
    base = rng.rand(PQ_NCENTROIDS, dim).astype(np.float32)
    # vector 8 = centroid 5's vector with tiny noise in subspace 0 only →
    # codes (5,5,5,5); vector 9 = centroid 2 exactly → (2,2,2,2)
    v8 = base[5].copy()
    v8[:PQ_SUBDIM] += 0.01
    v9 = base[2].copy()
    embs = np.vstack([base, v8[None, :], v9[None, :]])
    t = pa.table(
        {
            "vec_id": pa.array(range(len(embs)), pa.int64()),
            "embedding": pa.array([list(map(float, e)) for e in embs], pa.list_(pa.float32())),
            "label": pa.array([0] * len(embs), pa.int64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "embeddings.parquet"))
        out = _to_df(q_embedding_pq_codes(d)).set_index("vec_id")
    for c in range(PQ_NCENTROIDS):  # each centroid codes to itself
        assert out.loc[c].tolist() == [c] * PQ_SUBSPACES
    assert out.loc[8].tolist() == [5, 5, 5, 5]
    assert out.loc[9].tolist() == [2, 2, 2, 2]


# --------------------------------------------------------------------------
# wave-9 operators (skyline, gaps-and-islands, Markov transitions)
# --------------------------------------------------------------------------


def test_pareto_frontier_keeps_nondominated_and_both_dim_ties(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        q_orders_pareto_frontier,
    )

    # (key, priority, price, day): frontier on (price max, day min)
    orders = [
        (1, "1-URGENT", 100.0, 5),  # dominated by 3 (higher price, earlier)
        (2, "1-URGENT", 300.0, 10),  # frontier (highest price overall)
        (3, "1-URGENT", 200.0, 2),  # frontier (earliest among price>=200)
        (4, "1-URGENT", 200.0, 2),  # exact tie with 3 on both dims → kept
        (5, "1-URGENT", 50.0, 1),  # frontier (earliest day)
        (6, "1-URGENT", 50.0, 3),  # dominated by 5 (same price, later)
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_lines_parquet(d, orders, [(1, "N", 1, 0.0)])
        out = _to_df(q_orders_pareto_frontier(d))
    assert sorted(out["o_orderkey"]) == [2, 3, 4, 5]


def test_longest_streak_splits_on_gaps(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        q_user_longest_streak,
    )

    day = 86_400_000
    # user 1: days 1,2,3, 5,6 → longest 3, active 5; user 2: day 9 → 1,1
    rows = [
        (1, 1 * day, 1, "x", 0.0),
        (2, 2 * day, 1, "x", 0.0),
        (3, 2 * day + 5, 1, "x", 0.0),  # same day dedup
        (4, 3 * day, 1, "x", 0.0),
        (5, 5 * day, 1, "x", 0.0),
        (6, 6 * day, 1, "x", 0.0),
        (7, 9 * day, 2, "x", 0.0),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_user_longest_streak(d))
    got = {r.user_id: (r.longest_streak, r.n_active_days) for r in out.itertuples()}
    assert got == {1: (3, 5), 2: (1, 1)}


def test_markov_counts_consecutive_transitions_per_user(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import q_event_type_markov

    rows = [
        (1, 1000, 1, "a", 0.0),
        (2, 2000, 1, "b", 0.0),  # a→b
        (3, 3000, 1, "a", 0.0),  # b→a
        (4, 1000, 2, "a", 0.0),
        (5, 2000, 2, "b", 0.0),  # a→b (user 2)
        (6, 1000, 3, "c", 0.0),  # single event: no transition
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_event_type_markov(d))
    got = {(r.prev_type, r.next_type): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 2, ("b", "a"): 1}


def test_markov_ts_tie_broken_by_event_id(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import q_event_type_markov

    rows = [
        (2, 1000, 1, "b", 0.0),  # same ts → event_id order: 1 then 2
        (1, 1000, 1, "a", 0.0),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_event_type_markov(d))
    got = {(r.prev_type, r.next_type): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 1}


# --------------------------------------------------------------------------
# wave-10 operators (k-means M-step, reciprocal-rank fusion)
# --------------------------------------------------------------------------


def test_mstep_sums_equal_cluster_members(ray_session):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        MSTEP_K,
        MSTEP_QUANT,
        q_kmeans_mstep_centroids,
    )

    dim = 4
    rng = np.random.RandomState(3)
    # 8 well-separated centroids + 4 extra points near centroid 2
    base = np.eye(MSTEP_K, dim + MSTEP_K)[:, : dim + 0]  # not square; build manually
    base = rng.rand(MSTEP_K, dim).astype(np.float64) + np.arange(MSTEP_K)[:, None] * 10
    extras = base[2] + rng.rand(4, dim) * 0.01
    embs = np.vstack([base, extras])
    t = pa.table(
        {
            "vec_id": pa.array(range(len(embs)), pa.int64()),
            "embedding": pa.array(
                [list(map(float, e)) for e in embs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(embs), pa.int64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "embeddings.parquet"))
        out = _to_df(q_kmeans_mstep_centroids(d))
    assert len(out) == MSTEP_K * dim
    # cluster 2 holds centroid 2 plus the 4 extras: n == 5 on every dim and
    # s_kilo equals the quantized float32 component sums of its members
    c2 = out[out["centroid_id"] == 2].sort_values("dim")
    assert c2["n"].tolist() == [5] * dim
    members = np.vstack([embs[2:3].astype(np.float32), extras.astype(np.float32)])
    expected = np.floor(members.astype(np.float64) * MSTEP_QUANT + 0.5).sum(0)
    assert c2["s_kilo"].tolist() == [int(x) for x in expected]
    # every vector lands in exactly one cluster
    assert int(out[out["dim"] == 0]["n"].sum()) == len(embs)


def test_rrf_fusion_scores_truncated_lists(ray_session):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        FUSE_TOP,
        RRF_K0,
        q_ann_rrf_fusion,
    )

    # 1-D embeddings: cosine of any positive 1-D vector with the query is
    # exactly 1 (ties → id order); L2 orders by distance to the query value.
    vals = [10.0, 11.0, 9.0, 30.0, 10.5]
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vals)), pa.int64()),
            "embedding": pa.array([[v] for v in vals], pa.list_(pa.float32())),
            "label": pa.array([0] * len(vals), pa.int64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "embeddings.parquet"))
        out = _to_df(q_ann_rrf_fusion(d))
    # cosine ranks (all cos=1, ties by id): 0,1,2,3,4 → ranks 1..5
    # l2 to 10.0: id0=0 < id4=0.25k < id2,id1 (1k) < id3 → l2 order 0,4,2?,1?,3
    # l2 kilo2: id1 (1000)^2, id2 (1000)^2 tie → id order: 1 then 2
    cos_rank = {i: i + 1 for i in range(5)}
    l2_order = [0, 4, 1, 2, 3]
    l2_rank = {v: i + 1 for i, v in enumerate(l2_order)}
    expected = {
        i: 1_000_000 // (RRF_K0 + cos_rank[i]) + 1_000_000 // (RRF_K0 + l2_rank[i])
        for i in range(5)
    }
    got = dict(zip(out["vec_id"], out["rrf_micro"]))
    assert len(out) == min(FUSE_TOP, 5)
    assert got == {
        k: v
        for k, v in sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[
            : min(FUSE_TOP, 5)
        ]
    }


def test_band_pairs_counts_each_pair_once_across_bins(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        BAND_DELTA,
        q_event_value_band_pairs,
    )

    assert BAND_DELTA == 10
    # cents: 5, 9, 15, 19, 30 (values in dollars: /100)
    # same-bin pair (5,9); cross-bin pairs (5,15) (9,15) (9,19) (15,19);
    # (5,19)=14>10 excluded; 30 pairs with nothing (min Δ=11); also an
    # exact duplicate pair (30,30) within band
    cents = [5, 9, 15, 19, 30, 30]
    rows = [(i, 1000 + i, 1, "x", c / 100.0) for i, c in enumerate(cents)]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_event_value_band_pairs(d))
    assert len(out) == 1
    assert out.iloc[0]["n_pairs"] == 6  # (5,9)(5,15)(9,15)(9,19)(15,19)(30,30)


def test_quantile_sample_is_exact_below_k_and_merge_order_free(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        QSK_K,
        q_type_value_quantile_sample,
    )

    # fewer events than K → the "sample" IS the population: quantiles exact
    cents = list(range(0, 101))  # values 0.00..1.00 dollars
    rows = [(i, 1000 + i, 1, "x", c / 100.0) for i, c in enumerate(cents)]
    assert len(rows) < QSK_K
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_type_value_quantile_sample(d))
    r = out.iloc[0]
    # m=101: idx25 = 100*25//100 = 25 → cents 25; idx50 = 50; idx75 = 75
    assert (r["n_sample"], r["p25_cents"], r["p50_cents"], r["p75_cents"]) == (
        101, 25, 50, 75,
    )


def test_quantile_sample_rank_error_bounded(ray_session):
    import numpy as np

    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        QSK_K,
        q_type_value_quantile_sample,
    )

    # 20k values uniform on [0, 100): sampled p50 must sit within ~5 rank
    # percentage points of the true median (binomial tail at K=256)
    rng = np.random.RandomState(11)
    vals = rng.rand(20_000) * 100.0
    rows = [(i, 1000 + i, 1, "x", float(v)) for i, v in enumerate(vals)]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_type_value_quantile_sample(d))
    r = out.iloc[0]
    assert r["n_sample"] == QSK_K
    true = np.floor(np.sort(vals * 100.0 + 0.5))
    for col, p in (("p25_cents", 25), ("p50_cents", 50), ("p75_cents", 75)):
        est_rank = np.searchsorted(true, r[col]) / len(true) * 100
        assert abs(est_rank - p) < 10, (col, est_rank)


def test_jsonl_and_csv_sources_round_trip_counts(ray_session):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        q_customer_csv_segments,
        q_events_jsonl_counts,
    )

    rows = [(1, 1000, 1, "a", 0.0), (2, 2000, 1, "a", 0.0), (3, 3000, 2, "b", 0.0)]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([1, 2, 3], pa.int64()),
                    "c_name": pa.array(["x"] * 3, pa.string()),
                    "c_nationkey": pa.array([0] * 3, pa.int64()),
                    "c_acctbal": pa.array([1.005, 2.0, 3.5], pa.float64()),
                    "c_mktsegment": pa.array(["S1", "S1", "S2"], pa.string()),
                }
            ),
            os.path.join(d, "customer.parquet"),
        )
        ej = _to_df(q_events_jsonl_counts(d))
        cs = _to_df(q_customer_csv_segments(d))
    assert dict(zip(ej["event_type"], ej["n"])) == {"a": 2, "b": 1}
    got = {r.c_mktsegment: (r.n_customers, r.bal_cents) for r in cs.itertuples()}
    # 1.005*100+0.5 floor = 101 (float 100.49999... guard: must match numpy)
    exp_s1 = int(np.floor(1.005 * 100 + 0.5)) + 200
    assert got == {"S1": (2, exp_s1), "S2": (1, 350)}


def test_order_size_histogram_preserves_zero_bucket(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        q_order_size_histogram,
    )

    orders = [(1, "1-URGENT", 1.0, 1), (2, "1-URGENT", 1.0, 1), (3, "1-URGENT", 1.0, 1)]
    lines = [
        (1, "N", 1, 0.0),
        (1, "N", 1, 0.0),  # order 1: 2 lines
        (2, "N", 1, 0.0),  # order 2: 1 line; order 3: ZERO lines
        (9, "N", 1, 0.0),  # orphan line (no order) must not create a bucket
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_lines_parquet(d, orders, lines)
        out = _to_df(q_order_size_histogram(d))
    got = dict(zip(out["n_lines"], out["n_orders"]))
    assert got == {0: 1, 1: 1, 2: 1}


def test_ohlc_open_close_follow_time_then_id_order(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import q_value_daily_ohlc

    day = 86_400_000
    rows = [
        (5, 1 * day + 100, 1, "x", 3.00),  # ts tie with id 4 → id 4 opens
        (4, 1 * day + 100, 1, "x", 1.00),  # open (smaller id at same ts)
        (6, 1 * day + 500, 1, "x", 9.00),  # high
        (7, 1 * day + 900, 1, "x", 0.50),  # low + close (latest ts)
        (8, 2 * day, 1, "x", 2.00),  # separate bar
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_value_daily_ohlc(d)).sort_values("day").reset_index(drop=True)
    b1 = out.iloc[0]
    assert (b1["open_cents"], b1["high_cents"], b1["low_cents"], b1["close_cents"]) == (
        100, 900, 50, 50,
    )
    b2 = out.iloc[1]
    assert (b2["open_cents"], b2["close_cents"]) == (200, 200)


def test_activity_union_merges_two_sources(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        q_activity_union_daily,
    )

    day = 86_400_000
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, [(1, 3 * day, 1, "x", 0.0), (2, 3 * day, 1, "x", 0.0)])
        _orders_lines_parquet(
            d, [(1, "1-URGENT", 1.0, 3), (2, "1-URGENT", 1.0, 4)], [(1, "N", 1, 0.0)]
        )
        out = _to_df(q_activity_union_daily(d))
    got = {(r.src, r.day): r.n for r in out.itertuples()}
    assert got == {("events", 3): 2, ("orders", 3): 1, ("orders", 4): 1}


def test_relational_division_requires_full_domain(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        q_custs_all_priorities,
    )

    # domain = {A, B}; cust 1 covers both, cust 2 only A (twice), cust 3 only B
    orders = [
        (1, "A", 1.0, 1),
        (2, "B", 1.0, 1),
        (3, "A", 1.0, 1),
        (4, "A", 1.0, 1),
        (5, "B", 1.0, 1),
    ]
    # map orderkey→custkey via _orders_lines_parquet's fixed custkey=1; need
    # custom orders with distinct custkeys — write directly
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.test_queries_ml2_edges import _days_ts

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                    "o_custkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
                    "o_orderstatus": pa.array(["O"] * 5, pa.string()),
                    "o_totalprice": pa.array([1.0] * 5, pa.float64()),
                    "o_orderdate": pa.array([_days_ts(1)] * 5, pa.int64())
                    .cast(pa.timestamp("ms"))
                    .cast(pa.timestamp("us")),
                    "o_orderpriority": pa.array(["A", "B", "A", "A", "B"], pa.string()),
                }
            ),
            os.path.join(d, "orders.parquet"),
        )
        out = _to_df(q_custs_all_priorities(d))
    assert out["o_custkey"].tolist() == [1]


def test_mad_folds_histogram_around_exact_median(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        q_event_value_mad_by_type,
    )

    # cents: 100, 200, 200, 300, 900 → median 200 (disc), residuals
    # {100, 0, 0, 100, 700} → sorted {0,0,100,100,700} → disc-0.5 = 100
    vals = [1.00, 2.00, 2.00, 3.00, 9.00]
    rows = [(i, 1000 + i, 1, "x", v) for i, v in enumerate(vals)]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, rows)
        out = _to_df(q_event_value_mad_by_type(d))
    r = out.iloc[0]
    assert (r["median_cents"], r["mad_cents"]) == (200, 100)


def test_daily_delta_first_day_zero_and_diffs_consecutive(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        q_revenue_daily_delta,
    )

    orders = [
        (1, "1-URGENT", 10.0, 1),
        (2, "1-URGENT", 5.0, 1),  # day 1: 1500 cents
        (3, "1-URGENT", 20.0, 3),  # day 3: 2000 → delta +500
        (4, "1-URGENT", 7.0, 4),  # day 4: 700 → delta -1300
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_lines_parquet(d, orders, [(1, "N", 1, 0.0)])
        out = _to_df(q_revenue_daily_delta(d)).sort_values("day").reset_index(drop=True)
    assert out["revenue_cents"].tolist() == [1500, 2000, 700]
    assert out["delta_cents"].tolist() == [0, 500, -1300]


def test_decile_profile_matches_ntile_with_remainder_and_ties(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        q_order_price_decile_profile,
    )

    # 23 orders (remainder 3 → first 3 deciles get 3 rows) with heavy ties
    prices = [1.0] * 7 + [2.0] * 9 + [5.0] * 7
    orders = [(i, "1-URGENT", p, 1) for i, p in enumerate(prices)]
    with tempfile.TemporaryDirectory() as d:
        _orders_lines_parquet(d, orders, [(0, "N", 1, 0.0)])
        out = _to_df(q_order_price_decile_profile(d)).sort_values("tile")
    assert out["n_orders"].tolist() == [3, 3, 3, 2, 2, 2, 2, 2, 2, 2]
    assert int(out["n_orders"].sum()) == 23
    # tie-invariant sums: total must equal the exact population sum
    assert int(out["sum_cents"].sum()) == 7 * 100 + 9 * 200 + 7 * 500
    # first decile = three cheapest (all 100s); last = two 500s
    assert out["sum_cents"].tolist()[0] == 300
    assert out["sum_cents"].tolist()[-1] == 1000


def test_pair_support_counts_distinct_orders_and_filters(ray_session):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        BASKET_MIN_SUPPORT,
        q_part_pair_support,
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    assert BASKET_MIN_SUPPORT == 3
    # orders 1-3 each contain parts {10, 20} (pair support 3, order 1 has a
    # duplicate line that must NOT double-count); order 4 has {10, 30}
    # (support 1 → filtered)
    rows = [
        (1, 10), (1, 20), (1, 10),
        (2, 10), (2, 20),
        (3, 20), (3, 10),
        (4, 10), (4, 30),
    ]
    t = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_suppkey": pa.array([1] * len(rows), pa.int64()),
            "l_linenumber": pa.array(range(len(rows)), pa.int64()),
            "l_quantity": pa.array([1.0] * len(rows), pa.float64()),
            "l_extendedprice": pa.array([1.0] * len(rows), pa.float64()),
            "l_discount": pa.array([0.0] * len(rows), pa.float64()),
            "l_tax": pa.array([0.0] * len(rows), pa.float64()),
            "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
            "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
            "l_shipdate": pa.array([0] * len(rows), pa.int64())
            .cast(pa.timestamp("ms"))
            .cast(pa.timestamp("us")),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "lineitem.parquet"))
        out = _to_df(q_part_pair_support(d))
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["part_a"], r["part_b"], r["n_orders"]) == (10, 20, 3)


def test_pair_lift_integer_arithmetic(ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mklab_focused_crawler_ray.pipelines.queries_ml3 import q_part_pair_lift

    # 4 baskets: {10,20} ×3 and {30} alone → pair (10,20): n_ab=3,
    # n_a=n_b=3, baskets=4 → conf = 1e6, lift = 3*4*1e6 // 9 = 1333333
    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 20), (4, 30)]
    t = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_suppkey": pa.array([1] * len(rows), pa.int64()),
            "l_linenumber": pa.array(range(len(rows)), pa.int64()),
            "l_quantity": pa.array([1.0] * len(rows), pa.float64()),
            "l_extendedprice": pa.array([1.0] * len(rows), pa.float64()),
            "l_discount": pa.array([0.0] * len(rows), pa.float64()),
            "l_tax": pa.array([0.0] * len(rows), pa.float64()),
            "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
            "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
            "l_shipdate": pa.array([0] * len(rows), pa.int64())
            .cast(pa.timestamp("ms"))
            .cast(pa.timestamp("us")),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "lineitem.parquet"))
        out = _to_df(q_part_pair_lift(d))
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["part_a"], r["part_b"], r["n_orders"]) == (10, 20, 3)
    assert r["conf_ppm"] == 1_000_000
    assert r["lift_micro"] == 3 * 4 * 1_000_000 // 9


def test_triangle_count_on_planted_graph(ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        q_part_graph_triangles,
    )

    # baskets engineered so the support-2 graph is exactly the triangle
    # {1,2,3} plus a dangling edge (3,4): each edge appears in 2 baskets
    baskets = {
        1: [1, 2], 2: [1, 2],
        3: [2, 3], 4: [2, 3],
        5: [1, 3], 6: [1, 3],
        7: [3, 4], 8: [3, 4],
    }
    rows = [(o, p) for o, ps in baskets.items() for p in ps]
    t = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_suppkey": pa.array([1] * len(rows), pa.int64()),
            "l_linenumber": pa.array(range(len(rows)), pa.int64()),
            "l_quantity": pa.array([1.0] * len(rows), pa.float64()),
            "l_extendedprice": pa.array([1.0] * len(rows), pa.float64()),
            "l_discount": pa.array([0.0] * len(rows), pa.float64()),
            "l_tax": pa.array([0.0] * len(rows), pa.float64()),
            "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
            "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
            "l_shipdate": pa.array([0] * len(rows), pa.int64())
            .cast(pa.timestamp("ms"))
            .cast(pa.timestamp("us")),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "lineitem.parquet"))
        out = _to_df(q_part_graph_triangles(d))
    assert out["n_triangles"].tolist() == [1]
