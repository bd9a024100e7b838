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
