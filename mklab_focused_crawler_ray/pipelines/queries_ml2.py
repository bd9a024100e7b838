"""Second wave of large-scale curation / analytics operators: exact
two-pass heavy hitters, zero-filled time-series (date-spine gap fill),
per-key mode (most-frequent value with deterministic tie-break), a
two-hop shuffle join (TPC-H Q3 shape), CUBE aggregation, a data-mixing
token-budget allocator, per-user inter-event gap statistics, and exact
per-group medians by bounded-key counting.

Reference lineage (semantics, not code): the heavy-hitter pass is the
batch form of the rolling term counters in
``bolts/metrics/ItemsCounterBolt.java:60-107`` (top terms over a stream);
the mode/gap operators generalize the per-user aggregation the
``RankerBolt`` family applies per item. Everything else is curation
machinery the build brief lists as first-class.

All eight queries are SQL-checked: integer units end-to-end (counts,
epoch hours/days, price cents, micro-rates) so Ray and DuckDB agree
bit-for-bit, and column names match the oracle exactly.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa

# tokenization shared with the heavy-hitter / budget oracles:
# regexp_extract_all(lower(text), '[a-z0-9]+')
_TOK2_RE = re.compile(r"[a-z0-9]+")

HH_K = 50  # heavy hitter threshold: tokens with count*HH_K > total tokens
GAPFILL_HOUR_US = 3_600_000_000  # gap-fill granularity (µs per hour)
MODE_BUCKETS = 64  # user-hash shuffle cardinality for mode / gap stats
Q3_SEGMENT = "BUILDING"  # TPC-H Q3 constants
Q3_CUT_DAYS = 10227  # 1998-01-01 as epoch days
Q3_TOPK = 10
CUBE_ALL_TYPE = "ALL"  # CUBE sentinels (SQL NULLs are avoided on purpose:
CUBE_ALL_WD = -1  # the driver compare treats NULL/NaN inconsistently)
BUDGET_FRAC_NUM, BUDGET_FRAC_DEN = 1, 2  # global budget = total_tokens // 2


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _ms(batch: pa.Table, col: str = "ts") -> np.ndarray:
    """Timestamp column → int64 epoch ms with an EXPLICIT unit cast (fixture
    files are timestamp[ms], driver tables timestamp[us] — never rely on the
    storage unit)."""
    import pyarrow.compute as pc

    return pc.cast(
        pc.cast(batch[col], pa.timestamp("ms"), safe=False), pa.int64()
    ).to_numpy()


# --------------------------------------------------------------------------
# exact heavy hitters (two-pass candidate + recount)
# --------------------------------------------------------------------------


def q_heavy_hitter_tokens(sf_dir: str):
    """EXACT distributed heavy hitters: every token whose corpus count
    exceeds total/HH_K, with its exact count — no approximation.

    Scale recipe (two passes, never a full token shuffle):
      pass 1  per-batch local filter: a token with global count > N/K must
              have count_b > N_b/K in at least one batch (pigeonhole), so
              the union of per-batch local heavy hitters is a provably
              complete candidate set of ≤ K tokens per batch. Only
              candidates and per-batch token totals leave the workers.
      pass 2  exact recount of the (broadcast, sorted) candidate array via
              searchsorted — shuffle volume is O(candidates × blocks) —
              then a final filter against the exact global total.
    This is the classic MG-style exact top-frequency pattern; at 100 TB the
    driver only ever holds the candidate union (≤ K × blocks tokens)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = _p(sf_dir, "documents")

    def local_hh(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for txt in batch["text"].to_pylist():
            toks.extend(_TOK2_RE.findall(txt.lower()))
        if not toks:
            return pa.table(
                {"token": pa.array([], pa.string()), "pn": pa.array([], pa.int64())}
            )
        u, c = np.unique(np.asarray(toks, object), return_counts=True)
        keep = c.astype(np.int64) * HH_K > len(toks)
        # one sentinel row carries the batch's token total (token="")
        return pa.table(
            {
                "token": pa.array(list(u[keep]) + [""], pa.string()),
                "pn": pa.array(
                    np.r_[c[keep].astype(np.int64), np.int64(len(toks))], pa.int64()
                ),
            }
        )

    # pass 1: candidate union + exact N (both tiny) — this is the ONE
    # driver-side collect, bounded at K tokens per block by construction
    p1 = (
        rd.read_parquet(docs, columns=["text"])
        .map_batches(local_hh, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("pn", alias_name="n"))
        .to_pandas()
    )
    total = int(p1.loc[p1["token"] == "", "n"].iloc[0])
    cand = np.sort(p1.loc[p1["token"] != "", "token"].to_numpy(object))
    cand_ref = ray.put(cand)

    def recount(batch: pa.Table) -> pa.Table:
        cset = ray.get(cand_ref)
        toks: list[str] = []
        for txt in batch["text"].to_pylist():
            toks.extend(_TOK2_RE.findall(txt.lower()))
        arr = np.asarray(toks, object)
        pos = np.searchsorted(cset, arr)
        ok = (pos < len(cset)) & (cset[np.minimum(pos, len(cset) - 1)] == arr)
        u, c = np.unique(arr[ok], return_counts=True)
        return pa.table(
            {
                "token": pa.array(list(u), pa.string()),
                "pn": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    def final_filter(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy()
        return batch.filter(pa.array(n * HH_K > total))

    return (
        rd.read_parquet(docs, columns=["text"])
        .map_batches(recount, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("pn", alias_name="n"))
        .map_batches(final_filter, batch_format="pyarrow")
    )


# --------------------------------------------------------------------------
# date-spine gap fill
# --------------------------------------------------------------------------


def q_events_hourly_gapfill(sf_dir: str):
    """Zero-filled hourly time series per event type (date-spine gap fill):
    every (event_type, hour) cell in the [global min hour, global max hour]
    range, with n = 0 where no events occurred — the shape a training-run
    monitor or rate-limiter table needs.

    Scale shape: counts collapse map-side per (type, hour) — the shuffle
    key space is |types| × hours, bounded by the calendar, not the event
    stream — and the spine fill runs over the AGGREGATED histogram, which
    IS the query output (output-sized, vectorized numpy)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        hour = _ms(batch) // 3_600_000
        base = (
            pd.DataFrame({"hour": hour, "event_type": batch["event_type"].to_pylist()})
            .groupby(["hour", "event_type"], sort=False)
            .size()
            .reset_index(name="pn")
        )
        base["pn"] = base["pn"].astype(np.int64)
        return pa.Table.from_pandas(
            base[["event_type", "hour", "pn"]], preserve_index=False
        )

    def gapfill(batch: pa.Table) -> pa.Table:
        # runs on the aggregated histogram (output-sized): build the full
        # type × hour spine and scatter the observed counts into it
        et = np.asarray(batch["event_type"].to_pylist(), object)
        hr = batch["hour"].to_numpy().astype(np.int64)
        n = batch["n"].to_numpy().astype(np.int64)
        types = np.unique(et)
        lo, hi = int(hr.min()), int(hr.max())
        span = hi - lo + 1
        grid = np.zeros((len(types), span), np.int64)
        ti = np.searchsorted(types, et)
        grid[ti, hr - lo] = n
        return pa.table(
            {
                "event_type": pa.array(np.repeat(types, span), pa.string()),
                "hour": pa.array(np.tile(np.arange(lo, hi + 1), len(types)), pa.int64()),
                "n": pa.array(grid.ravel(), pa.int64()),
            }
        )

    return (
        rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("pn", alias_name="n"))
        .repartition(1)
        .map_batches(gapfill, batch_format="pyarrow", batch_size=None)
    )


# --------------------------------------------------------------------------
# per-key mode (most frequent value)
# --------------------------------------------------------------------------


def q_user_top_event(sf_dir: str):
    """MODE per key: each user's most frequent event type (ties broken by
    lexicographically smallest type) with its exact count.

    Scale shape: per-batch partial counts collapse each batch to one row
    per (user, type) seen; users hash-bucket into MODE_BUCKETS groups
    (fixed shuffle cardinality); each bucket sums partials and resolves
    every user's argmax in one vectorized lexsort pass."""
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        base = (
            pd.DataFrame(
                {
                    "user_id": batch["user_id"].to_numpy(),
                    "event_type": batch["event_type"].to_pylist(),
                }
            )
            .groupby(["user_id", "event_type"], sort=False)
            .size()
            .reset_index(name="pn")
        )
        base["bucket"] = (base["user_id"] % MODE_BUCKETS).astype(np.int64)
        base["pn"] = base["pn"].astype(np.int64)
        base["user_id"] = base["user_id"].astype(np.int64)
        return pa.Table.from_pandas(
            base[["bucket", "user_id", "event_type", "pn"]], preserve_index=False
        )

    def resolve(g) -> pa.Table:
        agg = (
            g.groupby(["user_id", "event_type"], sort=False, as_index=False)["pn"]
            .sum()
        )
        uid = agg["user_id"].to_numpy(np.int64)
        n = agg["pn"].to_numpy(np.int64)
        et = agg["event_type"].to_numpy(object)
        # rank types desc so that within equal (uid, n) the LAST row of the
        # sort order carries the lexicographically smallest type
        tcodes = np.unique(et, return_inverse=True)[1]
        order = np.lexsort((-tcodes, n, uid))
        uid, n, et = uid[order], n[order], et[order]
        last = np.r_[uid[1:] != uid[:-1], True]
        return pa.table(
            {
                "user_id": pa.array(uid[last], pa.int64()),
                "event_type": pa.array(list(et[last]), pa.string()),
                "n": pa.array(n[last], pa.int64()),
            }
        )

    return (
        rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# TPC-H Q3 shape: two-hop shuffle join + grouped top-k
# --------------------------------------------------------------------------


def q_q3_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape — customer ⋈ orders ⋈ lineitem with selective filters
    on every table and a grouped top-K by revenue: the canonical two-hop
    SHUFFLE JOIN (custkey hop, then orderkey hop) where no side is small
    enough to broadcast at cluster scale.

    Scale shape: each hop hash-buckets BOTH sides on the hop key into
    MODE_BUCKETS groups and semi-joins inside the bucket (vectorized
    np.isin); lineitem revenue is pre-aggregated per (batch, orderkey)
    before the shuffle (combiner), so the orderkey hop moves partial sums,
    not line items; the final top-K is per-block partial-topk → sort →
    limit. Revenue is exact integer: cents × (1e6 − discount_micro); at
    true 100-TB row counts this unit pair would need a 128-bit sum —
    documented tradeoff for bit-exact oracle equality at fixture scale."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def prep_cust(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = batch.filter(pc.equal(batch["c_mktsegment"], Q3_SEGMENT))[
            "c_custkey"
        ].to_numpy()
        return pa.table(
            {
                "bucket": pa.array(key % MODE_BUCKETS, pa.int64()),
                "key": pa.array(key, pa.int64()),
                "okey": pa.array(np.zeros(len(key), np.int64), pa.int64()),
                "odays": pa.array(np.zeros(len(key), np.int64), pa.int64()),
                "side": pa.array(np.zeros(len(key), np.int64), pa.int64()),
            }
        )

    def prep_orders(batch: pa.Table) -> pa.Table:
        odays = _ms(batch, "o_orderdate") // 86_400_000
        m = odays < Q3_CUT_DAYS
        key = batch["o_custkey"].to_numpy()[m]
        return pa.table(
            {
                "bucket": pa.array(key % MODE_BUCKETS, pa.int64()),
                "key": pa.array(key, pa.int64()),
                "okey": pa.array(batch["o_orderkey"].to_numpy()[m], pa.int64()),
                "odays": pa.array(odays[m], pa.int64()),
                "side": pa.array(np.ones(int(m.sum()), np.int64), pa.int64()),
            }
        )

    def hop1(g) -> pa.Table:
        side = g["side"].to_numpy()
        build = np.unique(g["key"].to_numpy()[side == 0])
        probe = g[side == 1]
        keep = probe[np.isin(probe["key"].to_numpy(), build)]
        okey = keep["okey"].to_numpy(np.int64)
        return pa.table(
            {
                "bucket": pa.array(okey % MODE_BUCKETS, pa.int64()),
                "okey": pa.array(okey, pa.int64()),
                "odays": pa.array(keep["odays"].to_numpy(np.int64), pa.int64()),
                "rev_u": pa.array(np.zeros(len(okey), np.int64), pa.int64()),
                "side": pa.array(np.zeros(len(okey), np.int64), pa.int64()),
            }
        )

    def prep_line(batch: pa.Table) -> pa.Table:
        import pandas as pd

        sdays = _ms(batch, "l_shipdate") // 86_400_000
        m = sdays > Q3_CUT_DAYS
        okey = batch["l_orderkey"].to_numpy()[m]
        cents = np.floor(
            batch["l_extendedprice"].to_numpy()[m] * 100 + 0.5
        ).astype(np.int64)
        disc_u = np.floor(
            batch["l_discount"].to_numpy()[m] * 1_000_000 + 0.5
        ).astype(np.int64)
        rev = cents * (1_000_000 - disc_u)
        agg = (
            pd.DataFrame({"okey": okey, "rev_u": rev})
            .groupby("okey", sort=False, as_index=False)["rev_u"]
            .sum()
        )
        k = agg["okey"].to_numpy(np.int64)
        return pa.table(
            {
                "bucket": pa.array(k % MODE_BUCKETS, pa.int64()),
                "okey": pa.array(k, pa.int64()),
                "odays": pa.array(np.zeros(len(k), np.int64), pa.int64()),
                "rev_u": pa.array(agg["rev_u"].to_numpy(np.int64), pa.int64()),
                "side": pa.array(np.ones(len(k), np.int64), pa.int64()),
            }
        )

    def hop2(g) -> pa.Table:
        import pandas as pd

        side = g["side"].to_numpy()
        orders = g[side == 0]
        lines = g[side == 1]
        omap = dict(
            zip(
                orders["okey"].to_numpy(np.int64),
                orders["odays"].to_numpy(np.int64),
            )
        )
        keep = lines[np.isin(lines["okey"].to_numpy(), orders["okey"].to_numpy())]
        agg = (
            keep.groupby("okey", sort=False, as_index=False)["rev_u"].sum()
            if len(keep)
            else pd.DataFrame({"okey": [], "rev_u": []})
        )
        k = agg["okey"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "l_orderkey": pa.array(k, pa.int64()),
                "o_days": pa.array(
                    np.asarray([omap[x] for x in k], np.int64), pa.int64()
                ),
                "rev_u": pa.array(agg["rev_u"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def partial_topk(batch: pa.Table) -> pa.Table:
        rev = batch["rev_u"].to_numpy()
        ok = batch["l_orderkey"].to_numpy()
        order = np.lexsort((ok, -rev))[:Q3_TOPK]
        return batch.take(pa.array(order))

    cust = rd.read_parquet(
        _p(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).map_batches(prep_cust, batch_format="pyarrow")
    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(prep_orders, batch_format="pyarrow")
    stage1 = (
        cust.union(orders).groupby("bucket").map_groups(hop1, batch_format="pandas")
    )
    lines = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(prep_line, batch_format="pyarrow")
    return (
        stage1.union(lines)
        .groupby("bucket")
        .map_groups(hop2, batch_format="pandas")
        .map_batches(partial_topk, batch_format="pyarrow")
        .sort(["rev_u", "l_orderkey"], descending=[True, False])
        .limit(Q3_TOPK)
    )


# --------------------------------------------------------------------------
# CUBE aggregation
# --------------------------------------------------------------------------


def q_event_type_cube(sf_dir: str):
    """CUBE aggregation in ONE shuffle: counts at every granularity of
    (event_type, weekday) — (t, w), (t, ALL), (ALL, w), (ALL, ALL) — with
    all four levels expanded map-side, so the shuffle key space stays
    |types+1| × 8 regardless of input size. Sentinels ('ALL' / -1) stand in
    for SQL CUBE's NULLs (the driver compare treats NULLs inconsistently)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        wd = (_ms(batch) // 86_400_000 % 7).astype(np.int64)
        base = (
            pd.DataFrame({"event_type": batch["event_type"].to_pylist(), "wd": wd})
            .groupby(["event_type", "wd"], sort=False)
            .size()
            .reset_index(name="pn")
        )
        t_lvl = base.groupby("event_type", sort=False, as_index=False)["pn"].sum()
        t_lvl["wd"] = CUBE_ALL_WD
        w_lvl = base.groupby("wd", sort=False, as_index=False)["pn"].sum()
        w_lvl["event_type"] = CUBE_ALL_TYPE
        all_lvl = pd.DataFrame(
            {"event_type": [CUBE_ALL_TYPE], "wd": [CUBE_ALL_WD], "pn": [base["pn"].sum()]}
        )
        out = pd.concat([base, t_lvl, w_lvl, all_lvl], ignore_index=True)
        out["pn"] = out["pn"].astype(np.int64)
        out["wd"] = out["wd"].astype(np.int64)
        return pa.Table.from_pandas(
            out[["event_type", "wd", "pn"]], preserve_index=False
        )

    return (
        rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "wd"])
        .aggregate(Sum("pn", alias_name="n"))
    )


# --------------------------------------------------------------------------
# data-mixing token budget
# --------------------------------------------------------------------------


def q_lang_token_budget(sf_dir: str):
    """Data-mixing allocator: given a global token budget of
    total_tokens × BUDGET_FRAC split equally across languages, compute each
    language's exact token count, its allocated tokens
    min(share, available), and the integer-micro sampling rate a downstream
    sampler would apply — the DoReMi-style mixture bookkeeping step.

    Scale shape: per-batch token counts collapse to one row per language
    before the shuffle; the allocator itself runs on the |langs|-row
    aggregate (one tiny task). All arithmetic is integer (floor), so the
    DuckDB oracle matches bit-for-bit."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        counts = [
            len(_TOK2_RE.findall(t.lower())) for t in batch["text"].to_pylist()
        ]
        agg = (
            pd.DataFrame({"lang": batch["lang"].to_pylist(), "pn": counts})
            .groupby("lang", sort=False, as_index=False)["pn"]
            .sum()
        )
        agg["pn"] = agg["pn"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def allocate(batch: pa.Table) -> pa.Table:
        n = batch["n_tokens"].to_numpy().astype(np.int64)
        total = int(n.sum())
        share = total * BUDGET_FRAC_NUM // BUDGET_FRAC_DEN // len(n)
        alloc = np.minimum(n, share)
        rate = alloc * 1_000_000 // n
        return pa.table(
            {
                "lang": batch["lang"],
                "n_tokens": pa.array(n, pa.int64()),
                "alloc_tokens": pa.array(alloc, pa.int64()),
                "rate_micro": pa.array(rate, pa.int64()),
            }
        )

    return (
        rd.read_parquet(_p(sf_dir, "documents"), columns=["lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("pn", alias_name="n_tokens"))
        .repartition(1)
        .map_batches(allocate, batch_format="pyarrow", batch_size=None)
    )


# --------------------------------------------------------------------------
# per-user inter-event gap statistics
# --------------------------------------------------------------------------


def q_user_gap_stats(sf_dir: str):
    """Per-user inter-event GAP statistics (LAG-diff aggregate): for every
    user with ≥ 2 events, the number of gaps, the maximum gap and the total
    gap time in ms — the think-time profile sessionization builds on.

    Scale shape: events shuffle ONCE bucketed by hash(user) (fixed
    cardinality, same shape as sessionization); each bucket lexsorts its
    users' timestamps and computes all gap aggregates in one vectorized
    np.diff + reduceat pass. Gaps depend only on sorted timestamps, so
    tie order between equal timestamps cannot change the result."""
    import ray.data as rd

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy()
        return pa.table(
            {
                "bucket": pa.array(uid % MODE_BUCKETS, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "ms": pa.array(_ms(batch), pa.int64()),
            }
        )

    def resolve(g) -> pa.Table:
        uid = g["user_id"].to_numpy(np.int64)
        ms = g["ms"].to_numpy(np.int64)
        order = np.lexsort((ms, uid))
        uid, ms = uid[order], ms[order]
        starts = np.r_[0, np.flatnonzero(uid[1:] != uid[:-1]) + 1]
        counts = np.diff(np.r_[starts, len(uid)])
        d = np.diff(ms)
        d[starts[1:] - 1] = 0  # zero out cross-user diffs
        users = uid[starts]
        keep = counts >= 2
        gap_sum = np.add.reduceat(np.r_[d, 0], starts)  # pad so last start works
        gap_max = np.maximum.reduceat(np.r_[d, 0], starts)
        # reduceat over padded d: each user's slice includes the zeroed
        # boundary diff, which never raises max (gaps ≥ 0) nor the sum
        return pa.table(
            {
                "user_id": pa.array(users[keep], pa.int64()),
                "n_gaps": pa.array(counts[keep] - 1, pa.int64()),
                "max_gap_ms": pa.array(gap_max[keep], pa.int64()),
                "sum_gap_ms": pa.array(gap_sum[keep], pa.int64()),
            }
        )

    return (
        rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# exact per-group median by bounded-key counting
# --------------------------------------------------------------------------


def q_event_value_median_by_type(sf_dir: str):
    """EXACT per-group median (percentile_disc 0.5) of event value per
    event type, by bounded-key counting: values quantize to exact cents, so
    per-(type, cents) counts are a bounded histogram; the median is read
    off the cumulative histogram — no per-group sort of raw rows, ever.

    Scale shape: the shuffle moves (type, cents) partial counts (key space
    = |types| × value domain, independent of row count); the final
    cumulative-select runs per type over its histogram rows (|types| tiny
    groups of bounded size — the one place map_groups-per-key is safe)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        cents = np.floor(batch["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        agg = (
            pd.DataFrame({"event_type": batch["event_type"].to_pylist(), "cents": cents})
            .groupby(["event_type", "cents"], sort=False)
            .size()
            .reset_index(name="pn")
        )
        agg["pn"] = agg["pn"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def pick_median(g) -> pa.Table:
        cents = g["cents"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        order = np.argsort(cents, kind="stable")
        cents, n = cents[order], n[order]
        cum = np.cumsum(n)
        total = cum[-1]
        # percentile_disc(0.5): first value whose CDF reaches 0.5
        i = int(np.searchsorted(cum * 2, total))
        return pa.table(
            {
                "event_type": pa.array([g["event_type"].iloc[0]], pa.string()),
                "median_cents": pa.array([cents[i]], pa.int64()),
            }
        )

    return (
        rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Sum("pn", alias_name="n"))
        .groupby("event_type")
        .map_groups(pick_median, batch_format="pandas")
    )


ML2_QUERIES = {
    "heavy_hitter_tokens": q_heavy_hitter_tokens,
    "events_hourly_gapfill": q_events_hourly_gapfill,
    "user_top_event": q_user_top_event,
    "q3_shipping_priority": q_q3_shipping_priority,
    "event_type_cube": q_event_type_cube,
    "lang_token_budget": q_lang_token_budget,
    "user_gap_stats": q_user_gap_stats,
    "event_value_median_by_type": q_event_value_median_by_type,
}

_TOK2_SQL = "regexp_extract_all(lower(text), '[a-z0-9]+')"

ML2_ORACLE_SQL = {
    "heavy_hitter_tokens": (
        f"WITH uni AS (SELECT UNNEST({_TOK2_SQL}) AS token FROM documents), "
        "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM uni), "
        "c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM uni GROUP BY 1) "
        f"SELECT token, n FROM c CROSS JOIN tot WHERE n * {HH_K} > t"
    ),
    "events_hourly_gapfill": (
        "WITH e AS (SELECT event_type, "
        "CAST(FLOOR(epoch_us(ts)/3600000000.0) AS BIGINT) AS hour FROM events), "
        "b AS (SELECT MIN(hour) AS lo, MAX(hour) AS hi FROM e), "
        "spine AS (SELECT t.event_type, gs.hour FROM "
        "(SELECT DISTINCT event_type FROM e) t CROSS JOIN "
        "(SELECT UNNEST(generate_series(lo, hi)) AS hour FROM b) gs), "
        "c AS (SELECT event_type, hour, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM e GROUP BY 1, 2) "
        "SELECT s.event_type, s.hour, CAST(COALESCE(c.n, 0) AS BIGINT) AS n "
        "FROM spine s LEFT JOIN c ON s.event_type = c.event_type "
        "AND s.hour = c.hour"
    ),
    "user_top_event": (
        "WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM events GROUP BY 1, 2) "
        "SELECT user_id, event_type, n FROM c "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id "
        "ORDER BY n DESC, event_type ASC) = 1"
    ),
    "q3_shipping_priority": (
        "WITH l AS (SELECT l_orderkey, "
        "CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) * "
        "(1000000 - CAST(FLOOR(l_discount*1000000 + 0.5) AS BIGINT))) AS BIGINT) "
        "AS rev_u FROM lineitem "
        f"WHERE CAST(FLOOR(epoch_us(l_shipdate)/86400000000.0) AS BIGINT) > {Q3_CUT_DAYS} "
        "GROUP BY 1) "
        "SELECT o_orderkey AS l_orderkey, "
        "CAST(FLOOR(epoch_us(o_orderdate)/86400000000.0) AS BIGINT) AS o_days, "
        "l.rev_u AS rev_u "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN l ON l.l_orderkey = o_orderkey "
        f"WHERE c_mktsegment = '{Q3_SEGMENT}' "
        f"AND CAST(FLOOR(epoch_us(o_orderdate)/86400000000.0) AS BIGINT) < {Q3_CUT_DAYS} "
        f"ORDER BY rev_u DESC, l_orderkey ASC LIMIT {Q3_TOPK}"
    ),
    "event_type_cube": (
        "WITH e AS (SELECT event_type, "
        "CAST(FLOOR(epoch_us(ts)/86400000000.0) AS BIGINT) % 7 AS wd FROM events) "
        f"SELECT COALESCE(event_type, '{CUBE_ALL_TYPE}') AS event_type, "
        f"CAST(COALESCE(wd, {CUBE_ALL_WD}) AS BIGINT) AS wd, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY CUBE (event_type, wd)"
    ),
    "lang_token_budget": (
        f"WITH d AS (SELECT lang, CAST(len({_TOK2_SQL}) AS BIGINT) AS c "
        "FROM documents), "
        "g AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens FROM d GROUP BY 1), "
        "t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total, "
        "CAST(COUNT(*) AS BIGINT) AS nl FROM g) "
        "SELECT lang, n_tokens, "
        f"CAST(LEAST(n_tokens, total * {BUDGET_FRAC_NUM} // {BUDGET_FRAC_DEN} // nl) "
        "AS BIGINT) AS alloc_tokens, "
        f"CAST(LEAST(n_tokens, total * {BUDGET_FRAC_NUM} // {BUDGET_FRAC_DEN} // nl) "
        "* 1000000 // n_tokens AS BIGINT) AS rate_micro "
        "FROM g CROSS JOIN t"
    ),
    "user_gap_stats": (
        "WITH o AS (SELECT user_id, epoch_ms(ts) AS ms, "
        "epoch_ms(ts) - LAG(epoch_ms(ts)) OVER "
        "(PARTITION BY user_id ORDER BY epoch_ms(ts)) AS gap FROM events) "
        "SELECT user_id, CAST(COUNT(gap) AS BIGINT) AS n_gaps, "
        "CAST(MAX(gap) AS BIGINT) AS max_gap_ms, "
        "CAST(SUM(gap) AS BIGINT) AS sum_gap_ms "
        "FROM o GROUP BY 1 HAVING COUNT(gap) >= 1"
    ),
    "event_value_median_by_type": (
        "WITH e AS (SELECT event_type, "
        "CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents FROM events) "
        "SELECT event_type, "
        "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT) "
        "AS median_cents FROM e GROUP BY 1"
    ),
}
