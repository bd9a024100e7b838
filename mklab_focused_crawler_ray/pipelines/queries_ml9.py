"""Graph-scale crawl analytics (round 5, continuation wave 9): hostgraph
connected components via distributed star contraction, personalized
(seed-restart) PageRank over the stationary edge shards, and the
rank-agreement audit between the ranker's two score factors.

The CC kernel (stages/cc.py) is the sharded path ``queries.cc_min_label``
documented for the beyond-pair-budget regime — this wave gives it a
first-class oracled query surface. Personalized PageRank reuses the
pregel stationary layout (stages/pregel.py) shared by pagerank_top20 /
hits_top20 / seed_hop_distance: the loop-invariant edges never
re-shuffle; only the seed mask and teleport base change. The gamma audit
is the BoundedPQueue top-k discipline (partial per-block top-k, global
merge) followed by an output-bounded driver reduction.

House oracle discipline (ml6/ml7/ml8): integer micro units; DuckDB ``//``
truncates toward zero, so negative quotients sign-split on the engine
side; iterative oracles unroll a fixed round count (min-label propagation
with pointer jumping — l(l(u)) — so ``CC_ORACLE_ROUNDS`` rounds cover any
component diameter ≤ ~2^rounds, far beyond the fixture hostgraphs, and
the engine's exact convergence is what the equality check pins).

Reference: MKLab-ITI/mklab-focused-crawler has no graph analytics (link
handling ends at URLExpansionBolt.java:62-81; ranking is
RankerBolt.java:78-92's two-factor score); all three operators are
build-brief crawl-scheduler / curation additions.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .queries_ml2 import _p

CC_ORACLE_ROUNDS = 10  # pointer-jumped min-label rounds unrolled in SQL
PPR_ITERS = 5  # same fixed-point count as pagerank_top20 (PR_ITERS)
PPR_TOP = 20
GAMMA_TOP = 100  # BoundedPQueue capacity (RankerBolt._queue top-k)


# --------------------------------------------------------------------------
# hostgraph connected components (distributed star contraction)
# --------------------------------------------------------------------------


def q_host_components(sf_dir: str):
    """WEAKLY CONNECTED COMPONENTS of the hostgraph: one row per host
    appearing in any host-level link (``host_link_matrix``'s rollup of
    the page out-link graph), labelled with the lexicographically
    smallest host of its component — the link-island / spam-farm
    partition a crawl scheduler assigns budgets over.

    Scale shape: the edge rollup is host_link_matrix's partial-count
    shuffle (host×host-bounded); components run as alternating
    large-star / small-star contraction (stages/cc.py — Kiveris et al.
    2014), each half-round ONE node-hash-bucketed shuffle over the
    CONTRACTING edge set, vectorized inside buckets, converged when the
    order-independent edge fingerprint repeats. Nothing node- or
    edge-shaped transits the driver (the probe is one scalar pair per
    round). The same kernel applies unchanged to the page-level graph —
    the hostgraph is simply the bounded surface the oracle can replay."""
    from ..stages.cc import cc_star_components
    from .queries_crawl import q_host_link_matrix

    def to_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"a": batch["src_host"], "b": batch["dst_host"]})

    edges = q_host_link_matrix(sf_dir).map_batches(
        to_edges, batch_format="pyarrow"
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"host": batch["node"], "comp_rep": batch["comp_rep"]})

    return cc_star_components(edges).map_batches(rename, batch_format="pyarrow")


def _host_cc_sql(pages: str, rounds: int = CC_ORACLE_ROUNDS) -> str:
    """Unrolled min-label propagation WITH pointer jumping (l ← least of
    own label, neighborhood min, l(l(u))), so ``rounds`` rounds converge
    for any diameter the fixtures (or any realistic hostgraph) can
    reach; the engine side converges exactly, so a non-converged oracle
    fails loudly in the sweep rather than silently agreeing."""
    host = "regexp_extract({col}, '^https://([^/]+).*$', 1)"
    # MATERIALIZED hints are load-bearing (same as the curated_pack_manifest
    # oracle): without them DuckDB inlines `e` into every unrolled round and
    # re-opens the parquet per inline — fd exhaustion, not just wasted scans
    parts = [
        "he AS MATERIALIZED (SELECT "
        + host.format(col="url")
        + " AS a, "
        + host.format(col="unnest(out_links)")
        + f" AS b FROM read_parquet('{pages}'))",
        "nodes AS MATERIALIZED (SELECT DISTINCT u FROM "
        "(SELECT a AS u FROM he UNION ALL SELECT b FROM he))",
        "e AS MATERIALIZED (SELECT DISTINCT a, b FROM "
        "(SELECT a, b FROM he WHERE a != b "
        "UNION ALL SELECT b AS a, a AS b FROM he WHERE a != b))",
        "l0 AS (SELECT u, u AS l FROM nodes)",
    ]
    for k in range(1, rounds + 1):
        p = f"l{k - 1}"
        parts.append(
            f"l{k} AS MATERIALIZED "
            "(SELECT n.u, least(p.l, COALESCE(nb.m, p.l), pj.l) AS l "
            f"FROM nodes n JOIN {p} p ON p.u = n.u "
            f"LEFT JOIN (SELECT e.a AS u, MIN(p2.l) AS m FROM e "
            f"JOIN {p} p2 ON p2.u = e.b GROUP BY e.a) nb ON nb.u = n.u "
            f"JOIN {p} pj ON pj.u = p.l)"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT u AS host, l AS comp_rep FROM l{rounds}"
    )


# --------------------------------------------------------------------------
# personalized PageRank (random walk with restart at the seed frontier)
# --------------------------------------------------------------------------


def q_pagerank_seeded_top20(sf_dir: str):
    """PERSONALIZED PageRank: the teleport mass restarts ONLY at the
    frontier-seed urls (rank₀ = 1.0 micro at seeds, 0 elsewhere; update =
    seed·150000 + 85·inbound // 100), top-``PPR_TOP`` pages after
    ``PPR_ITERS`` synchronous iterations — "importance as seen from the
    crawl's entry points", the focused-crawl counterpart of the global
    pagerank_top20 (a focused crawler cares about authority RELATIVE to
    its seed topic, not global authority).

    Scale shape: identical to pagerank_top20 — the STATIONARY edge shards
    (stages/pregel.py) materialize once per pages fingerprint and are
    shared with BFS/HITS; per iteration one locally-combined emit + one
    node-shaped exchange; seeds are frontier-bounded and broadcast to
    shards once (searchsorted own-node mask). Integer arithmetic
    throughout — the unrolled-CTE oracle replays it bit-for-bit."""
    import pyarrow.parquet as pq_

    from ..stages.pregel import pagerank_top
    from .queries_media import fixture_dir_for
    from .queries_ml5 import _graph_layout

    seeds_path = os.path.join(fixture_dir_for(sf_dir), "frontier_seed.parquet")
    seeds = pq_.read_table(seeds_path, columns=["url"])["url"].to_pylist()
    layout, nb = _graph_layout(sf_dir)
    return pagerank_top(
        layout, nb, PPR_ITERS, PPR_TOP, seeds=np.array(seeds, object)
    )


def _ppr_sql(pages: str, seeds: str, iters: int, top: int) -> str:
    """oracles_ext._pagerank_sql with the seed-restart teleport: all-BIGINT
    unrolled iterations, so summation order cannot perturb the result."""
    seed_pred = f"url IN (SELECT url FROM read_parquet('{seeds}'))"
    parts = [
        f"nodes AS (SELECT url FROM read_parquet('{pages}'))",
        f"e0 AS (SELECT url AS src, unnest(out_links) AS dst FROM read_parquet('{pages}'))",
        "e AS (SELECT src, dst FROM e0 WHERE dst IN (SELECT url FROM nodes))",
        "deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1)",
        f"r0 AS (SELECT url, CAST(CASE WHEN {seed_pred} THEN 1000000 ELSE 0 END "
        "AS BIGINT) AS r FROM nodes)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"r{k} AS (SELECT n.url, "
            f"CAST((CASE WHEN n.{seed_pred} THEN 150000 ELSE 0 END) "
            f"+ (85 * COALESCE(s{k}.c, 0)) // 100 AS BIGINT) AS r "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS url, SUM(r.r // deg.d) AS c "
            f"FROM e JOIN r{k - 1} r ON r.url = e.src "
            f"JOIN deg ON deg.src = e.src GROUP BY 1) s{k} ON s{k}.url = n.url)"
        )
    return (
        "WITH " + ", ".join(parts) + f" SELECT url, r AS rank_micro FROM r{iters} "
        f"ORDER BY rank_micro DESC, url ASC LIMIT {top}"
    )


# --------------------------------------------------------------------------
# rank-agreement audit: Goodman–Kruskal gamma between the ranker's factors
# --------------------------------------------------------------------------


def q_ranker_rank_gamma(sf_dir: str):
    """RANK-AGREEMENT AUDIT over the ranker's top-``GAMMA_TOP`` events:
    Goodman–Kruskal gamma between the shares ordering (``value``) and the
    recency ordering (``ts``) — gamma = (C − D) / (C + D) over the
    untied pairs, in micro units. Answers "do the ranker's two factors
    agree on the head of the queue, or is the composite score doing real
    arbitration?" (RankerBolt.java:78-92 multiplies exactly these two
    factors). Gamma (not tau-b) keeps the arithmetic integer-exact — no
    square root, and DuckDB's ``//`` / the sign-split floor agree.

    Scale shape: the top-k is the BoundedPQueue discipline (per-block
    partial top-k, then a global (score desc, id asc) merge of ≤ k ×
    blocks rows); the pair scan is k²-bounded driver work on the final
    100 rows — output-bounded by construction, never corpus-shaped."""
    import ray.data as rd

    from .queries import _score_batch

    def with_factors(batch: pa.Table) -> pa.Table:
        scored = _score_batch(batch)
        ms = batch["ts"].cast(pa.int64()).to_numpy() // 1000
        return pa.table(
            {
                "event_id": batch["event_id"],
                "score_micro": scored["score_micro"],
                "value": batch["value"],
                "ms": pa.array(ms, pa.int64()),
            }
        )

    def partial_topk(batch: pa.Table) -> pa.Table:
        sm = batch["score_micro"].to_numpy()
        ev = batch["event_id"].to_numpy()
        order = np.lexsort((ev, -sm))[:GAMMA_TOP]
        return batch.take(pa.array(order))

    top = (
        rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "ts", "value"])
        .map_batches(with_factors, batch_format="pyarrow")
        .map_batches(partial_topk, batch_format="pyarrow")
        .sort(["score_micro", "event_id"], descending=[True, False])
        .limit(GAMMA_TOP)
        .to_pandas()
    )
    v = top["value"].to_numpy(np.float64)
    m = top["ms"].to_numpy(np.int64)
    dv = np.sign(v[:, None] - v[None, :])
    dm = np.sign((m[:, None] - m[None, :]).astype(np.float64))
    prod = np.triu(dv * dm, k=1)
    c = int((prod > 0).sum())
    d = int((prod < 0).sum())
    num = (c - d) * 1_000_000
    den = c + d
    # DuckDB // truncates toward zero — sign-split to match
    g = 0 if den == 0 else (num // den if num >= 0 else -((-num) // den))
    return pa.table(
        {
            "n_top": pa.array([len(top)], pa.int64()),
            "concordant": pa.array([c], pa.int64()),
            "discordant": pa.array([d], pa.int64()),
            "gamma_micro": pa.array([g], pa.int64()),
        }
    )


def _gamma_sql() -> str:
    from .queries import AVG_TIME_DIFF_MS, NOW_MS

    score = (
        "(1 - EXP(-0.05*value) + 1)/2 * "
        f"(EXP(-(({NOW_MS} - epoch_ms(ts))/{AVG_TIME_DIFF_MS})) + 1)/2"
    )
    return (
        "WITH s AS (SELECT event_id, value, epoch_ms(ts) AS ms, "
        f"CAST(FLOOR(({score})*1000000 + 0.5) AS BIGINT) AS score_micro "
        "FROM events ORDER BY score_micro DESC, event_id ASC "
        f"LIMIT {GAMMA_TOP}), "
        "p AS (SELECT "
        "CASE WHEN (a.value - b.value)*(a.ms - b.ms) > 0 THEN 1 ELSE 0 END AS c, "
        "CASE WHEN (a.value - b.value)*(a.ms - b.ms) < 0 THEN 1 ELSE 0 END AS d "
        "FROM s a JOIN s b ON a.event_id < b.event_id) "
        "SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_top, "
        "CAST(COALESCE(SUM(c), 0) AS BIGINT) AS concordant, "
        "CAST(COALESCE(SUM(d), 0) AS BIGINT) AS discordant, "
        "CAST(CASE WHEN COALESCE(SUM(c), 0) + COALESCE(SUM(d), 0) = 0 THEN 0 "
        "ELSE ((SUM(c) - SUM(d))*1000000) // (SUM(c) + SUM(d)) END AS BIGINT) "
        "AS gamma_micro FROM p"
    )


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

ML9_QUERIES = {
    "host_components": q_host_components,
    "pagerank_seeded_top20": q_pagerank_seeded_top20,
    "ranker_rank_gamma": q_ranker_rank_gamma,
}


def build_ml9_oracles() -> dict[str, str]:
    """Fixture-path oracles bind the sf0.01 ('small') tier like
    build_crawl_oracles — the driver gate runs there; the tiny tier is
    pinned by tests/test_ml9_graph_ops.py against in-process references."""
    from .queries_media import fixture_dir_for

    fdir = fixture_dir_for("/root/testdata/sf0.01")
    pages = os.path.join(fdir, "pages.parquet")
    seeds = os.path.join(fdir, "frontier_seed.parquet")
    return {
        "host_components": _host_cc_sql(pages),
        "pagerank_seeded_top20": _ppr_sql(pages, seeds, PPR_ITERS, PPR_TOP),
        "ranker_rank_gamma": _gamma_sql(),
    }
