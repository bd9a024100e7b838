"""Training-data / analytics operators beyond the reference's own bolts —
the large-scale curation primitives the build brief lists as first-class:
distributed anti-join, exact distinct counts with pre-shuffle dedup,
per-key rolling-window aggregates, one k-means assignment sweep over the
embedding column, per-document TF-IDF top terms, and exact integer vector
norm statistics.

Reference lineage (semantics, not code): grouped counting mirrors
``bolts/metrics/MediaCounterBolt.java:66-106``; the IDF vocabulary mirrors
``EventDetectionBolt``'s windowed document frequencies (see
``functions/vocabulary.py``); the centroid-assignment sweep is the batch
form of the IVF coarse quantizer in ``stages/ann.py`` (itself modeled on
``bolts/media/VisualIndexerBolt.java``'s nearest-neighbor service).

Every query here except the HyperLogLog sketch is SQL-checked: integer
units end-to-end (cents / micro) so Ray and DuckDB agree bit-for-bit,
column names identical on both sides. The sketch is deterministic but not
SQL-expressible; its accuracy is pinned by pytest instead.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..scale import derive_buckets


def _p(sf_dir: str, table: str) -> str:
    # local copy of queries._p — a top-level import would be circular
    # (queries imports this module to register ML_QUERIES)
    return os.path.join(sf_dir, f"{table}.parquet")

KMEANS_K = 8  # centroids = embeddings with vec_id < K (deterministic init)
TFIDF_TOP = 3  # terms kept per document
ANTI_PRIORITY = "1-URGENT"  # anti-join predicate on the orders side
DAY_MS = 86_400_000


def q_customers_without_urgent(sf_dir: str):
    """Distributed ANTI-JOIN: customers with NO '1-URGENT' order, counted
    per market segment.

    Scale shape: both sides hash-bucket on the join key into
    ``join_buckets`` groups (fixed shuffle cardinality — never a per-key
    group), the orders side is pre-deduped per batch so the shuffle moves
    distinct keys only, and each bucket anti-joins in one vectorized
    ``np.isin`` pass. No broadcast: unlike the §2.10 broadcast lookups the
    build side here is O(|customers|), which does not fit one worker at
    cluster scale."""
    join_buckets = derive_buckets(sf_dir, "customer", "orders", floor=64)
    import ray.data as rd
    from ray.data.aggregate import Sum

    def prep_cust(batch: pa.Table) -> pa.Table:
        key = batch["c_custkey"].to_numpy()
        return pa.table(
            {
                "bucket": pa.array(key % join_buckets, pa.int64()),
                "key": pa.array(key, pa.int64()),
                "seg": batch["c_mktsegment"],
                "side": pa.array(np.zeros(len(key), np.int64), pa.int64()),
            }
        )

    def prep_orders(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.equal(batch["o_orderpriority"], ANTI_PRIORITY)
        key = np.unique(batch.filter(m)["o_custkey"].to_numpy())
        return pa.table(
            {
                "bucket": pa.array(key % join_buckets, pa.int64()),
                "key": pa.array(key, pa.int64()),
                "seg": pa.array([""] * len(key), pa.string()),
                "side": pa.array(np.ones(len(key), np.int64), pa.int64()),
            }
        )

    def anti(g) -> pa.Table:
        # Arrow output with an explicit schema: a pandas return would carry
        # object-dtype string columns (size-estimation noise, and the empty
        # block would lose the schema — known empty-map_groups trap)
        side = g["side"].to_numpy()
        probe = g[side == 0]
        build = np.unique(g["key"].to_numpy()[side == 1])
        keep = probe[~np.isin(probe["key"].to_numpy(), build)]
        part = keep.groupby("seg", sort=False).size().reset_index(name="pn")
        return pa.table(
            {
                "c_mktsegment": pa.array(part["seg"].tolist(), pa.string()),
                "pn": pa.array(part["pn"].to_numpy(np.int64), pa.int64()),
            }
        )

    cust = rd.read_parquet(
        _p(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).map_batches(prep_cust, batch_format="pyarrow")
    urgent = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey", "o_orderpriority"]
    ).map_batches(prep_orders, batch_format="pyarrow")
    return (
        cust.union(urgent)
        .groupby("bucket")
        .map_groups(anti, batch_format="pandas")
        .groupby("c_mktsegment")
        .aggregate(Sum("pn", alias_name="n_customers"))
    )


def q_orders_join_nation(sf_dir: str):
    """Distributed SHUFFLE HASH JOIN (no broadcast side): orders ⋈ customer
    co-partitioned by hash(custkey) into ``join_buckets`` groups, each
    bucket joined in one vectorized searchsorted pass, partial-aggregated
    to per-nation sufficient statistics before the tiny final groupby.
    The §2.10 broadcast joins assume the build side fits one worker; this
    is the complementary shape for two large sides (both stream through
    the same fixed-cardinality shuffle — never per-key groups). The nation
    id → name map IS tiny, so it rides along as a broadcast lookup."""
    join_buckets = derive_buckets(sf_dir, "nation", "customer", "orders", floor=64)
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    nat = pq.read_table(_p(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    nk = nat["n_nationkey"].to_numpy().astype(np.int64)
    norder = np.argsort(nk, kind="stable")
    nat_ref = ray.put(
        (nk[norder], [nat["n_name"].to_pylist()[i] for i in norder])
    )

    def prep_cust(batch: pa.Table) -> pa.Table:
        key = batch["c_custkey"].to_numpy()
        return pa.table(
            {
                "bucket": pa.array(key % join_buckets, pa.int64()),
                "key": pa.array(key, pa.int64()),
                "nat": pa.array(
                    batch["c_nationkey"].to_numpy().astype(np.int64), pa.int64()
                ),
                "cents": pa.array(np.zeros(len(key), np.int64), pa.int64()),
                "side": pa.array(np.zeros(len(key), np.int64), pa.int64()),
            }
        )

    def prep_orders(batch: pa.Table) -> pa.Table:
        key = batch["o_custkey"].to_numpy()
        cents = np.floor(batch["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        return pa.table(
            {
                "bucket": pa.array(key % join_buckets, pa.int64()),
                "key": pa.array(key, pa.int64()),
                "nat": pa.array(np.full(len(key), -1, np.int64), pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "side": pa.array(np.ones(len(key), np.int64), pa.int64()),
            }
        )

    def join(g) -> pa.Table:
        nk, names = ray.get(nat_ref)
        side = g["side"].to_numpy()
        bk = g["key"].to_numpy(np.int64)[side == 0]
        bn = g["nat"].to_numpy(np.int64)[side == 0]
        order = np.argsort(bk, kind="stable")
        bk, bn = bk[order], bn[order]
        pk = g["key"].to_numpy(np.int64)[side == 1]
        pc = g["cents"].to_numpy(np.int64)[side == 1]
        idx = np.clip(np.searchsorted(bk, pk), 0, max(len(bk) - 1, 0))
        found = (bk[idx] == pk) if len(bk) else np.zeros(len(pk), bool)
        # nation key → position in the (sorted) broadcast map — keys need
        # not be consecutive
        pos = np.searchsorted(nk, bn[idx[found]])
        cnt = np.bincount(pos, minlength=len(nk))
        sums = np.bincount(pos, weights=pc[found], minlength=len(nk))
        keep = cnt > 0
        return pa.table(
            {
                "n_name": pa.array([names[i] for i in np.flatnonzero(keep)], pa.string()),
                "pn": pa.array(cnt[keep].astype(np.int64), pa.int64()),
                "ps": pa.array(sums[keep].astype(np.int64), pa.int64()),
            }
        )

    cust = rd.read_parquet(
        _p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    ).map_batches(prep_cust, batch_format="pyarrow")
    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    ).map_batches(prep_orders, batch_format="pyarrow")
    return (
        cust.union(orders)
        .groupby("bucket")
        .map_groups(join, batch_format="pandas")
        .groupby("n_name")
        .aggregate(Sum("pn", alias_name="n_orders"), Sum("ps", alias_name="total_cents"))
    )


HOP_WINDOWS = 5  # each 1-minute slot contributes to this many hopping windows


def q_hopping_counts(sf_dir: str):
    """Hopping-window counts (5-minute windows advancing by 1 minute): the
    overlapping-window generalization of ``windowed_counts``'s tumbling
    windows and the reference counter bolts' sliding slots. Each event
    explodes to its ``HOP_WINDOWS`` member windows VECTORIZED (repeat/tile,
    no per-row Python), partially counted per batch, then one bounded
    groupby — shuffle volume is O(distinct (window, type)), not rows×5."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def explode(batch: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        ms = pc.cast(
            pc.cast(batch["ts"], pa.timestamp("ms"), safe=False), pa.int64()
        ).to_numpy()
        m = ms // 60_000
        w = np.repeat(m, HOP_WINDOWS) - np.tile(
            np.arange(HOP_WINDOWS, dtype=np.int64), len(m)
        )
        et = np.repeat(np.asarray(batch["event_type"].to_pylist(), object), HOP_WINDOWS)
        g = (
            pd.DataFrame({"w": w, "event_type": et})
            .groupby(["w", "event_type"], sort=False)
            .size()
            .reset_index(name="pn")
        )
        g["pn"] = g["pn"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby(["w", "event_type"])
        .aggregate(Sum("pn", alias_name="n"))
    )


def q_daily_active_users(sf_dir: str):
    """Exact distinct-user counts per (day, event_type) with dedup BEFORE
    the shuffle: each batch collapses to its distinct (day, type, user)
    triples, the first groupby dedups globally (shuffle bounded by distinct
    triples, not rows), then a per-batch partial count feeds the tiny final
    (day, type) aggregate. The COUNT(DISTINCT) analogue of the partial-agg
    rule every counter query here follows."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    def prep(batch: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        ms = pc.cast(
            pc.cast(batch["ts"], pa.timestamp("ms"), safe=False), pa.int64()
        ).to_numpy()
        df = pd.DataFrame(
            {
                "day": ms // DAY_MS,
                "event_type": batch["event_type"].to_pylist(),
                "user_id": batch["user_id"].to_numpy(),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        g = (
            batch.select(["day", "event_type"])
            .to_pandas()
            .groupby(["day", "event_type"], sort=False)
            .size()
            .reset_index(name="pn")
        )
        g["pn"] = g["pn"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "event_type", "user_id"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["day", "event_type", "user_id"])
        .aggregate(Count(alias_name="dupes"))
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Sum("pn", alias_name="n_users"))
    )


def q_user_value_rolling3(sf_dir: str):
    """Per-user rolling-window aggregate (ROWS BETWEEN 2 PRECEDING AND
    CURRENT ROW over (ms, event_id) order): the sliding-count semantics of
    the reference's counter bolts, exact in integer cents.

    Scale shape: users hash-bucket into ``join_buckets`` groups (fixed
    shuffle cardinality); each bucket computes ALL its users' windows in
    one vectorized pass — lexsort, per-user segment starts, prefix sums,
    then ``cum[i] - cum[max(i-2, seg_start)]`` with no per-row Python."""
    join_buckets = derive_buckets(sf_dir, "events", floor=64)
    import ray.data as rd

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        uid = batch["user_id"].to_numpy()
        ms = pc.cast(
            pc.cast(batch["ts"], pa.timestamp("ms"), safe=False), pa.int64()
        )
        cents = np.floor(batch["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(uid % join_buckets, pa.int64()),
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ms": ms,
                "cents": pa.array(cents, pa.int64()),
            }
        )

    def roll(g) -> "pd.DataFrame":
        import pandas as pd

        uid = g["user_id"].to_numpy(np.int64)
        ms = g["ms"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        order = np.lexsort((eid, ms, uid))
        uid, eid, cents = uid[order], eid[order], cents[order]
        n = len(uid)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        first = np.repeat(starts, np.diff(np.r_[starts, n]))
        cum0 = np.r_[0, np.cumsum(cents)]
        lo = np.maximum(np.arange(n) - 2, first)
        return pd.DataFrame(
            {
                "event_id": eid,
                "user_id": uid,
                "roll3_cents": cum0[np.arange(n) + 1] - cum0[lo],
            }
        )

    return (
        rd.read_parquet(
            _p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
        )
        .map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(roll, batch_format="pandas")
    )


def q_kmeans_assign(sf_dir: str):
    """One k-means assignment sweep: every embedding goes to its
    micro-cosine-nearest of ``KMEANS_K`` fixed centroids (deterministic
    init: the vectors with ``vec_id < K``; ties → smallest centroid id),
    reduced to per-centroid (n, sum cos_micro) — the E-step + sufficient
    statistics of distributed k-means, and the coarse quantizer shape of
    ``stages/ann.ivf_topk``.

    Scale shape: the K×D centroid matrix is tiny — ``ray.put`` once,
    zero-copy matmul per batch; each batch emits K partial rows, so the
    shuffle moves O(num_blocks · K), never the vectors."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.ann import _batch_embeddings, _micro, _normalize

    cent_tbl = pq.read_table(
        _p(sf_dir, "embeddings"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", KMEANS_K)],
    )
    order = np.argsort(cent_tbl["vec_id"].to_numpy(), kind="stable")
    cmat = _normalize(
        np.asarray(cent_tbl["embedding"].to_pylist(), dtype=np.float64)[order]
    )
    cent_ref = ray.put(cmat)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        mat = _normalize(_batch_embeddings(batch))
        cm = _micro(mat @ c.T)  # (B, K) int64
        best = np.argmax(cm, axis=1)  # first max = smallest centroid id
        bc = np.bincount(best, minlength=KMEANS_K)
        sums = np.bincount(best, weights=cm[np.arange(len(best)), best], minlength=KMEANS_K)
        return pa.table(
            {
                "centroid_id": pa.array(np.arange(KMEANS_K, dtype=np.int64), pa.int64()),
                "pn": pa.array(bc.astype(np.int64), pa.int64()),
                "ps": pa.array(sums.astype(np.int64), pa.int64()),
            }
        )

    return (
        rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
        .map_batches(assign, batch_format="pyarrow")
        .groupby("centroid_id")
        .aggregate(Sum("pn", alias_name="n"), Sum("ps", alias_name="sum_cos_micro"))
    )


def q_tfidf_top_terms(sf_dir: str):
    """Per-document top-``TFIDF_TOP`` terms by tf·idf, EXACT in integers:
    score = tf × idf_micro (both int64), ties → term ascending. The
    document-side batch scoring against a broadcast IDF vocabulary is the
    batch form of ``EventDetectionBolt``'s per-item IDF weighting
    (``functions/vocabulary.py``).

    Scale shape: document frequencies come from a per-batch set-of-terms
    partial + one vocabulary-bounded groupby; the resulting (token →
    idf_micro) map is vocabulary-sized, broadcast once via ``ray.put``, and
    the scoring pass is embarrassingly parallel (no second shuffle). At
    open-vocabulary scale, cap the vocabulary to the top-V df terms first —
    terms outside the map score 0 by construction here."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .queries import TOKEN_RE

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    n_docs = docs.count()

    def df_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            c.update(set(TOKEN_RE.findall(t.lower())))
        return pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "pdf": pa.array(np.fromiter(c.values(), np.int64, len(c)), pa.int64()),
            }
        )

    df_tbl = (
        docs.map_batches(df_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("pdf", alias_name="df"))
        .to_pandas()
    )
    idf = {
        t: int(np.floor(np.log10(n_docs / float(d)) * 1_000_000 + 0.5))
        for t, d in zip(df_tbl["token"], df_tbl["df"])
    }
    idf_ref = ray.put(idf)

    def score(batch: pa.Table) -> pa.Table:
        from collections import Counter

        idf_map = ray.get(idf_ref)
        out_d, out_t, out_tf, out_s, out_r = [], [], [], [], []
        for did, txt in zip(batch["doc_id"].to_numpy(), batch["text"].to_pylist()):
            tf = Counter(TOKEN_RE.findall(txt.lower()))
            if not tf:
                continue
            scored = sorted(
                ((-c * idf_map[t], t, c) for t, c in tf.items())
            )[:TFIDF_TOP]
            for r, (neg_s, t, c) in enumerate(scored):
                out_d.append(did)
                out_t.append(t)
                out_tf.append(c)
                out_s.append(-neg_s)
                out_r.append(r)
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "token": pa.array(out_t, pa.string()),
                "tf": pa.array(out_tf, pa.int64()),
                "score": pa.array(out_s, pa.int64()),
                "rank": pa.array(out_r, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def q_orders_above_cust_avg(sf_dir: str):
    """Correlated-aggregate join, EXACT without division: orders priced
    above their own customer's average order value, counted per priority.
    The comparison ``cents_i × count > sum_cents`` is pure int64 algebra,
    so Ray and the oracle agree bit-for-bit (no float mean).

    Scale shape: pass 1 is a bounded per-customer aggregate (partial sums
    per batch first); pass 2 re-joins orders to their own aggregate with
    the same co-partitioned bucket shuffle as ``q_orders_join_nation`` —
    the windowed ``AVG OVER (PARTITION BY)`` pattern without a per-key
    group or a broadcast of a customer-sized side."""
    join_buckets = derive_buckets(sf_dir, "orders", floor=64)
    import ray.data as rd
    from ray.data.aggregate import Sum

    def prep_orders(batch: pa.Table) -> pa.Table:
        import pandas as pd

        key = batch["o_custkey"].to_numpy()
        cents = np.floor(batch["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        g = (
            pd.DataFrame({"o_custkey": key, "cents": cents, "one": 1})
            .groupby("o_custkey", sort=False, as_index=False)
            .agg(pc=("one", "sum"), ps=("cents", "sum"))
        )
        g["pc"] = g["pc"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        rd.read_parquet(_p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
        .map_batches(prep_orders, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("pc", alias_name="cnt"), Sum("ps", alias_name="s"))
    )

    def prep_agg(batch: pa.Table) -> pa.Table:
        key = batch["o_custkey"].to_numpy()
        return pa.table(
            {
                "bucket": pa.array(key % join_buckets, pa.int64()),
                "key": pa.array(key, pa.int64()),
                "cnt": batch["cnt"],
                "s": batch["s"],
                "cents": pa.array(np.zeros(len(key), np.int64), pa.int64()),
                "prio": pa.array([""] * len(key), pa.string()),
                "side": pa.array(np.zeros(len(key), np.int64), pa.int64()),
            }
        )

    def prep_probe(batch: pa.Table) -> pa.Table:
        key = batch["o_custkey"].to_numpy()
        z = np.zeros(len(key), np.int64)
        cents = np.floor(batch["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        return pa.table(
            {
                "bucket": pa.array(key % join_buckets, pa.int64()),
                "key": pa.array(key, pa.int64()),
                "cnt": pa.array(z, pa.int64()),
                "s": pa.array(z, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "prio": batch["o_orderpriority"],
                "side": pa.array(np.ones(len(key), np.int64), pa.int64()),
            }
        )

    def above(g) -> pa.Table:
        side = g["side"].to_numpy()
        bk = g["key"].to_numpy(np.int64)[side == 0]
        order = np.argsort(bk, kind="stable")
        bk = bk[order]
        bc = g["cnt"].to_numpy(np.int64)[side == 0][order]
        bs = g["s"].to_numpy(np.int64)[side == 0][order]
        probe = g[side == 1]
        pk = probe["key"].to_numpy(np.int64)
        idx = np.searchsorted(bk, pk)  # aggregate row exists for every order
        keep = probe["cents"].to_numpy(np.int64) * bc[idx] > bs[idx]
        part = (
            probe[keep]
            .groupby("prio", sort=False)
            .size()
            .reset_index(name="pn")
        )
        return pa.table(
            {
                "o_orderpriority": pa.array(part["prio"].tolist(), pa.string()),
                "pn": pa.array(part["pn"].to_numpy(np.int64), pa.int64()),
            }
        )

    probe = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_custkey", "o_totalprice", "o_orderpriority"],
    ).map_batches(prep_probe, batch_format="pyarrow")
    return (
        agg.map_batches(prep_agg, batch_format="pyarrow")
        .union(probe)
        .groupby("bucket")
        .map_groups(above, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("pn", alias_name="n_above"))
    )


def q_latest_event_per_user(sf_dir: str):
    """ARGMAX per key: each user's latest event (greatest (ms, event_id)),
    the MongoDbSpout ``sort(desc).limit(1)``-per-key pattern. Per-batch
    partials keep ONE candidate row per user (vectorized lexsort +
    take-last), users hash-bucket into ``join_buckets`` groups, and each
    bucket resolves all its users in one vectorized pass — shuffle volume
    is O(users × blocks-containing-them), never the event stream."""
    join_buckets = derive_buckets(sf_dir, "events", floor=64)
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        uid = batch["user_id"].to_numpy()
        ms = pc.cast(
            pc.cast(batch["ts"], pa.timestamp("ms"), safe=False), pa.int64()
        ).to_numpy()
        eid = batch["event_id"].to_numpy()
        order = np.lexsort((eid, ms, uid))
        uid, ms, eid = uid[order], ms[order], eid[order]
        last = np.r_[uid[1:] != uid[:-1], True]  # last row of each user run
        return pa.table(
            {
                "bucket": pa.array(uid[last] % join_buckets, pa.int64()),
                "user_id": pa.array(uid[last], pa.int64()),
                "event_id": pa.array(eid[last], pa.int64()),
                "ms": pa.array(ms[last], pa.int64()),
            }
        )

    def resolve(g) -> pa.Table:
        uid = g["user_id"].to_numpy(np.int64)
        ms = g["ms"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, ms, uid))
        uid, ms, eid = uid[order], ms[order], eid[order]
        last = np.r_[uid[1:] != uid[:-1], True]
        return pa.table(
            {
                "user_id": pa.array(uid[last], pa.int64()),
                "event_id": pa.array(eid[last], pa.int64()),
                "ms": pa.array(ms[last], pa.int64()),
            }
        )

    return (
        rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
    )


ROLLUP_ALL_DAY = -1  # sentinel for the day-rollup level
ROLLUP_ALL_TYPE = "ALL"  # sentinel for the type-rollup level


def q_event_rollup_counts(sf_dir: str):
    """Multi-level ROLLUP aggregation in ONE shuffle: counts at
    (day, type), (day, ALL) and (ALL, ALL) granularity, with every rollup
    level expanded map-side in the combiner — each batch emits its partial
    rows for all three levels, so the shuffle sees the same bounded key
    space as a single-level groupby and no second pass over the data is
    needed. Sentinels (-1 / 'ALL') stand in for SQL ROLLUP's NULLs."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        ms = pc.cast(
            pc.cast(batch["ts"], pa.timestamp("ms"), safe=False), pa.int64()
        ).to_numpy()
        base = (
            pd.DataFrame(
                {"day": ms // DAY_MS, "event_type": batch["event_type"].to_pylist()}
            )
            .groupby(["day", "event_type"], sort=False)
            .size()
            .reset_index(name="pn")
        )
        day_lvl = base.groupby("day", sort=False, as_index=False)["pn"].sum()
        day_lvl["event_type"] = ROLLUP_ALL_TYPE
        all_lvl = pd.DataFrame(
            {
                "day": [ROLLUP_ALL_DAY],
                "event_type": [ROLLUP_ALL_TYPE],
                "pn": [base["pn"].sum()],
            }
        )
        out = pd.concat([base, day_lvl, all_lvl], ignore_index=True)
        out["pn"] = out["pn"].astype(np.int64)
        out["day"] = out["day"].astype(np.int64)
        return pa.Table.from_pandas(
            out[["day", "event_type", "pn"]], preserve_index=False
        )

    return (
        rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Sum("pn", alias_name="n"))
    )


SET_A_PRIO = "1-URGENT"  # set difference: customers with an A-priority order ...
SET_B_PRIO = "5-LOW"  # ... and no B-priority order


def q_custs_urgent_no_low(sf_dir: str):
    """Distributed SET DIFFERENCE (EXCEPT): customers who placed at least
    one URGENT order and no LOW order. Per-batch dedup collapses rows to
    one (custkey, saw_a, saw_b) partial, the groupby shuffle is bounded by
    distinct keys, and the difference is a vectorized filter over the
    aggregate — the same first-wins/seen-gate algebra as the frontier's
    StatusCheck anti-join, expressed over the driver tables."""
    import ray.data as rd
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        et = np.asarray(batch["o_orderpriority"].to_pylist(), object)
        keep = (et == SET_A_PRIO) | (et == SET_B_PRIO)
        df = pd.DataFrame(
            {
                "o_custkey": batch["o_custkey"].to_numpy()[keep],
                "a": (et[keep] == SET_A_PRIO).astype(np.int64),
                "b": (et[keep] == SET_B_PRIO).astype(np.int64),
            }
        )
        g = df.groupby("o_custkey", sort=False, as_index=False).max()
        g["a"] = g["a"].astype(np.int64)
        g["b"] = g["b"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def diff(batch: pa.Table) -> pa.Table:
        a = batch["saw_a"].to_numpy()
        b = batch["saw_b"].to_numpy()
        k = np.flatnonzero((a > 0) & (b == 0))
        return pa.table(
            {"o_custkey": pa.array(batch["o_custkey"].to_numpy()[k], pa.int64())}
        )

    return (
        rd.read_parquet(_p(sf_dir, "orders"), columns=["o_custkey", "o_orderpriority"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Max("a", alias_name="saw_a"), Max("b", alias_name="saw_b"))
        .map_batches(diff, batch_format="pyarrow")
    )


OVERLAP_BUCKET_MS = 4 * 3_600_000  # time-range partition for the interval join


def q_session_overlap_pairs(sf_dir: str):
    """Distributed INTERVAL (range-overlap) JOIN: all pairs of user
    sessions that overlap in time, with their exact overlap length — the
    "range join" custom operator from the build brief, self-joined over
    the sessionization operator's own output.

    Scale recipe: sessions explode to every fixed time-range bucket they
    touch; each bucket sort-sweeps its intervals in one vectorized pass
    (sorted starts + searchsorted ends + multi-range gather); a pair is
    emitted ONLY in the bucket containing the later interval's start, so
    cross-bucket duplicates never exist and no dedup shuffle is needed.
    Shuffle volume is O(intervals × buckets-touched + pairs)."""
    import ray.data as rd

    sessions = q_user_sessions_sessions(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        st = batch["start_ms"].to_numpy(zero_copy_only=False)
        en = batch["end_ms"].to_numpy(zero_copy_only=False)
        b0 = st // OVERLAP_BUCKET_MS
        c = (en // OVERLAP_BUCKET_MS - b0 + 1).astype(np.int64)
        ends = np.cumsum(c)
        offs = np.arange(ends[-1] if len(c) else 0) - np.repeat(ends - c, c)
        rep = np.repeat(np.arange(len(st)), c)
        return pa.table(
            {
                "bucket": pa.array(b0[rep] + offs, pa.int64()),
                "user_id": pa.array(
                    batch["user_id"].to_numpy(zero_copy_only=False)[rep], pa.int64()
                ),
                "session_idx": pa.array(
                    batch["session_idx"].to_numpy(zero_copy_only=False)[rep],
                    pa.int64(),
                ),
                "st": pa.array(st[rep], pa.int64()),
                "en": pa.array(en[rep], pa.int64()),
            }
        )

    def sweep(g) -> pa.Table:
        bucket = np.int64(g["bucket"].iloc[0])
        st = g["st"].to_numpy(np.int64)
        en = g["en"].to_numpy(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        sx = g["session_idx"].to_numpy(np.int64)
        order = np.lexsort((sx, uid, st))
        st, en, uid, sx = st[order], en[order], uid[order], sx[order]
        n = len(st)
        hi = np.searchsorted(st, en, side="right")  # last j with st_j <= en_i
        c = np.maximum(hi - np.arange(n) - 1, 0)
        ends = np.cumsum(c)
        total = int(ends[-1]) if n else 0
        offs = np.arange(total) - np.repeat(ends - c, c)
        i = np.repeat(np.arange(n), c)
        j = i + 1 + offs
        # attribute each pair to the later start's bucket (exactly once
        # globally); overlap is guaranteed by st_j <= en_i given st_j >= st_i
        keep = st[j] // OVERLAP_BUCKET_MS == bucket
        i, j = i[keep], j[keep]
        return pa.table(
            {
                "user_a": pa.array(uid[i], pa.int64()),
                "sidx_a": pa.array(sx[i], pa.int64()),
                "user_b": pa.array(uid[j], pa.int64()),
                "sidx_b": pa.array(sx[j], pa.int64()),
                "overlap_ms": pa.array(np.minimum(en[i], en[j]) - st[j], pa.int64()),
            }
        )

    def canonical(batch: pa.Table) -> pa.Table:
        # (user, sidx)-lexicographic pair order, independent of start-time
        # tie-breaks inside the sweep
        ua, sa = batch["user_a"].to_numpy(), batch["sidx_a"].to_numpy()
        ub, sb = batch["user_b"].to_numpy(), batch["sidx_b"].to_numpy()
        swap = (ua > ub) | ((ua == ub) & (sa > sb))
        return pa.table(
            {
                "user_a": pa.array(np.where(swap, ub, ua), pa.int64()),
                "sidx_a": pa.array(np.where(swap, sb, sa), pa.int64()),
                "user_b": pa.array(np.where(swap, ua, ub), pa.int64()),
                "sidx_b": pa.array(np.where(swap, sa, sb), pa.int64()),
                "overlap_ms": batch["overlap_ms"],
            }
        )

    return (
        sessions.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pandas")
        .map_batches(canonical, batch_format="pyarrow")
    )


def q_user_sessions_sessions(sf_dir: str):
    """The sessionization operator's output as the interval-join input
    (thin alias so q_session_overlap_pairs composes the registered op)."""
    from .queries import q_user_sessions

    return q_user_sessions(sf_dir)


HLL_P = 12  # 2^12 registers; 64-12=52 rho bits — exact in float64 log2


def q_approx_distinct_users(sf_dir: str):
    """HyperLogLog distinct-user estimate per event_type — the mergeable
    sketch for distinct counts too large for ``q_daily_active_users``'s
    exact path (where the distinct-triple shuffle itself is the cost).

    Deterministic (splitmix64-mixed ids, fixed registers) but not
    SQL-expressible, so rows-only: accuracy and exactness-at-small-n are
    pinned by pytest against COUNT(DISTINCT). Scale shape: each batch
    emits its non-zero (type, register, rho) cells, the shuffle moves at
    most 2^{p} cells per (type, block), Max-merges them (register-wise max
    IS the HLL merge), and a per-type finisher applies the standard
    bias-corrected estimate with the linear-counting small range."""
    import ray.data as rd
    from ray.data.aggregate import Max

    from ..functions.hashing import mix64

    m = 1 << HLL_P
    rho_bits = 64 - HLL_P

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        h = mix64(batch["user_id"].to_numpy().astype(np.uint64))
        idx = (h >> np.uint64(rho_bits)).astype(np.int64)
        w = (h & np.uint64((1 << rho_bits) - 1)).astype(np.float64)
        rho = np.where(
            w > 0, rho_bits - np.floor(np.log2(np.maximum(w, 1.0))), rho_bits + 1
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {"event_type": batch["event_type"].to_pylist(), "reg": idx, "rho": rho}
            )
            .groupby(["event_type", "reg"], sort=False, as_index=False)["rho"]
            .max()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def estimate(g) -> "pd.DataFrame":
        import pandas as pd

        regs = np.zeros(m, np.int64)
        regs[g["reg"].to_numpy(np.int64)] = g["rho"].to_numpy(np.int64)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
        zeros = int((regs == 0).sum())
        if e <= 2.5 * m and zeros > 0:
            e = m * np.log(m / zeros)
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "est_users": [np.int64(np.floor(e + 0.5))],
            }
        )

    return (
        rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "reg"])
        .aggregate(Max("rho", alias_name="rho"))
        .groupby("event_type")
        .map_groups(estimate, batch_format="pandas")
    )


QUARTILE_QS = (25, 50, 75)  # equi-depth edges per event_type


def q_value_quartile_counts(sf_dir: str):
    """Equi-depth (quantile) bucketing: each event lands in its per-type
    value QUARTILE, where the edges are the EXACT p25/p50/p75 under the
    same integer-ceil rank rule as ``q_event_value_quantiles``; quartile =
    number of edges strictly below the value. Two bounded passes: the
    histogram shuffle that computes edges (driver holds one tiny row per
    event_type — an aggregate, never the data), then a broadcast-edge
    assignment with per-batch partial counts. This is the scale recipe for
    NTILE-style bucketing without a global sort."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    def hist_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        cents = np.floor(batch["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        g = (
            pd.DataFrame({"event_type": batch["event_type"].to_pylist(), "cents": cents})
            .groupby(["event_type", "cents"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        g["cnt"] = g["cnt"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def edges_of(g) -> "pd.DataFrame":
        import pandas as pd

        g = g.sort_values("cents", kind="stable")
        c = g["cnt"].to_numpy(np.int64)
        v = g["cents"].to_numpy(np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        row = {"event_type": g["event_type"].iloc[0]}
        for q in QUARTILE_QS:
            rank = -(-q * n // 100)
            row[f"e{q}"] = v[np.searchsorted(cum, rank)]
        return pd.DataFrame([row])

    edges = (
        rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "value"])
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .groupby("event_type")
        .map_groups(edges_of, batch_format="pandas")
        .to_pandas()
    )
    emap = {
        r["event_type"]: np.array([r[f"e{q}"] for q in QUARTILE_QS], np.int64)
        for _, r in edges.iterrows()
    }
    emap_ref = ray.put(emap)

    def assign(batch: pa.Table) -> pa.Table:
        import pandas as pd

        em = ray.get(emap_ref)
        cents = np.floor(batch["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        types = np.asarray(batch["event_type"].to_pylist(), object)
        quart = np.zeros(len(cents), np.int64)
        for t in np.unique(types):
            m = types == t
            e = em[t]
            quart[m] = (cents[m][:, None] > e[None, :]).sum(axis=1)
        g = (
            pd.DataFrame({"event_type": types, "quartile": quart})
            .groupby(["event_type", "quartile"], sort=False)
            .size()
            .reset_index(name="pn")
        )
        g["pn"] = g["pn"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "value"])
        .map_batches(assign, batch_format="pyarrow")
        .groupby(["event_type", "quartile"])
        .aggregate(Sum("pn", alias_name="n"))
    )


def q_doc_unigram_logprob(sf_dir: str):
    """Unigram language-model scoring: per document, the summed corpus
    log10-probability of its token stream (micro-int units) — the
    perplexity-proxy quality signal LLM curation pipelines run next to the
    heuristic quality score. Same broadcast-vocabulary shape as
    ``q_tfidf_top_terms``: one vocabulary-bounded count shuffle builds the
    LM, then scoring streams embarrassingly parallel."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .queries import TOKEN_RE

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def tf_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            c.update(TOKEN_RE.findall(t.lower()))
        return pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "pc": pa.array(np.fromiter(c.values(), np.int64, len(c)), pa.int64()),
            }
        )

    counts = (
        docs.map_batches(tf_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("pc", alias_name="c"))
        .to_pandas()
    )
    total = float(counts["c"].sum())
    lp = {
        t: int(np.floor(np.log10(float(c) / total) * 1_000_000 + 0.5))
        for t, c in zip(counts["token"], counts["c"])
    }
    lp_ref = ray.put(lp)

    def score(batch: pa.Table) -> pa.Table:
        lpm = ray.get(lp_ref)
        ids, ntok, lps = [], [], []
        for did, txt in zip(batch["doc_id"].to_numpy(), batch["text"].to_pylist()):
            toks = TOKEN_RE.findall(txt.lower())
            if not toks:
                continue
            ids.append(did)
            ntok.append(len(toks))
            lps.append(sum(lpm[t] for t in toks))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(ntok, pa.int64()),
                "logprob_micro": pa.array(lps, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def q_embedding_norm_stats(sf_dir: str):
    """Per-label vector-norm statistics in EXACT integer arithmetic: each
    float is micro-quantized to int64 first, then the squared-norm sum is
    pure integer math on both sides (no float-summation-order drift —
    the reason this reports Σ‖v‖² in micro² units rather than a mean of
    float norms). Partial sums per batch; the shuffle moves one row per
    (block, label)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.ann import _batch_embeddings

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        mat = _batch_embeddings(batch)
        mi = np.floor(mat * 1_000_000.0 + 0.5).astype(np.int64)
        ss = (mi * mi).sum(axis=1)
        g = (
            pd.DataFrame({"label": batch["label"].to_numpy(), "ss": ss, "one": 1})
            .groupby("label", sort=False)
            .agg(pn=("one", "sum"), ps=("ss", "sum"))
            .reset_index()
        )
        g["pn"] = g["pn"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        rd.read_parquet(_p(sf_dir, "embeddings"), columns=["embedding", "label"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("pn", alias_name="n"), Sum("ps", alias_name="sumsq_micro2"))
    )


SIG_VALUE_GATE = 90.0  # signature gate: high-value events only (non-degenerate)


def q_revenue_running_by_date(sf_dir: str):
    """GLOBAL running (cumulative) revenue by order day — the prefix-sum
    window ``SUM(...) OVER (ORDER BY day)`` Ray Data has no native operator
    for.

    Scale shape: the rows collapse map-side into a per-day cents histogram
    (one partial row per day per block), the shuffle moves only the
    histogram, and the prefix sum runs over the aggregated per-day table —
    whose cardinality is bounded by the calendar (a few thousand rows for
    decades of data), so one vectorized cumsum task is the right plan at
    any corpus size."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        day = (
            batch["o_orderdate"].cast(pa.int64()).to_numpy() // 86_400_000_000
        ).astype(np.int64)
        cents = np.floor(batch["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        t = pa.table(
            {
                "day": pa.array(day, pa.int64()),
                "pc": pa.array(cents, pa.int64()),
            }
        )
        g = t.group_by("day").aggregate([("pc", "sum")])
        return g.select(["day", "pc_sum"]).rename_columns(["day", "pc"])

    def add_g(batch: pa.Table) -> pa.Table:
        return batch.append_column("g", pa.array(np.zeros(len(batch), np.int64)))

    def finish(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        g = g.sort_values("day", kind="stable")
        return pd.DataFrame(
            {
                "day": g["day"].to_numpy(np.int64),
                "revenue_cents": g["revenue_cents"].to_numpy(np.int64),
                "running_cents": np.cumsum(g["revenue_cents"].to_numpy(np.int64)),
            }
        )

    return (
        rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("pc", alias_name="revenue_cents"))
        .map_batches(add_g, batch_format="pyarrow")
        .groupby("g")
        .map_groups(finish, batch_format="pandas")
        .select_columns(["day", "revenue_cents", "running_cents"])
    )


def q_urgent_lineitem_semijoin(sf_dir: str):
    """Fact-table SEMI-JOIN via a broadcast key set: lineitem rows whose
    order is '1-URGENT', counted and summed (cents) per return flag.

    Scale shape: the build side is the FILTERED order-key column only —
    read once with column+predicate pushdown, sorted, ``ray.put`` once,
    probed zero-copy in every task with one ``searchsorted`` pass (the
    §2.10 broadcast-lookup discipline). At 100 TB the sorted-key array
    swaps for a bloom filter with identical pipeline shape — the probe
    side never shuffles either way."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    import pyarrow.compute as pc

    orders = pq.read_table(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderpriority"],
        filters=[("o_orderpriority", "=", ANTI_PRIORITY)],
    )
    keys = np.sort(orders["o_orderkey"].to_numpy())
    side = ray.put(keys)

    def probe(batch: pa.Table) -> pa.Table:
        k = ray.get(side)
        ok = batch["l_orderkey"].to_numpy()
        idx = np.clip(np.searchsorted(k, ok), 0, max(len(k) - 1, 0))
        found = (k[idx] == ok) if len(k) else np.zeros(len(ok), bool)
        b = batch.filter(pa.array(found))
        cents = np.floor(b["l_extendedprice"].to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        t = pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "pn": pa.array(np.ones(len(b), np.int64)),
                "pc": pa.array(cents, pa.int64()),
            }
        )
        g = t.group_by("l_returnflag").aggregate([("pn", "sum"), ("pc", "sum")])
        return g.select(["l_returnflag", "pn_sum", "pc_sum"]).rename_columns(
            ["l_returnflag", "pn", "pc"]
        )

    return (
        rd.read_parquet(
            _p(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_returnflag"]
        )
        .map_batches(probe, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Sum("pn", alias_name="n_items"), Sum("pc", alias_name="revenue_cents"))
    )


def q_user_event_signature(sf_dir: str):
    """SET-VALUED aggregate: each user's sorted distinct high-value event
    types joined with '|' (plus the type count) — the string_agg(DISTINCT
    ... ORDER BY ...) shape used for behavioral cohort keys.

    Scale shape: batches pre-dedupe (user, type) pairs map-side, the
    distinct-pair relation (bounded by |users| × |event types|) shuffles
    once into ``sig_buckets`` hash buckets — fixed cardinality, never a
    per-user group — and each bucket builds its signatures in one
    vectorized pandas groupby-join pass."""
    sig_buckets = derive_buckets(sf_dir, "events", floor=64)
    import ray.data as rd
    from ray.data.aggregate import Count

    def pairs(batch: pa.Table) -> pa.Table:
        import pandas as pd

        keep = batch["value"].to_numpy() >= SIG_VALUE_GATE
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy()[keep],
                "event_type": np.asarray(batch["event_type"].to_pylist(), object)[
                    keep
                ],
            }
        ).drop_duplicates()
        # typed Arrow output even when the gate empties the batch — an
        # inferred-null schema from one empty block poisons the union
        return pa.table(
            {
                "user_id": pa.array(df["user_id"].to_numpy(np.int64), pa.int64()),
                "event_type": pa.array(df["event_type"].tolist(), pa.string()),
            }
        )

    def bucketize(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy()
        return pa.table(
            {
                "bucket": pa.array(u % sig_buckets, pa.int64()),
                "user_id": batch["user_id"],
                "event_type": batch["event_type"],
            }
        )

    def finish(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["user_id", "event_type"], kind="stable")
        out = g.groupby("user_id", sort=True)["event_type"].agg(
            signature="|".join, n_types="size"
        )
        out = out.reset_index()
        out["n_types"] = out["n_types"].astype(np.int64)
        return out

    # zero-row typed anchor: if the gate empties the corpus, map_groups is
    # never called and the result would otherwise carry NO schema
    anchor = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "signature": pa.array([], pa.string()),
                "n_types": pa.array([], pa.int64()),
            }
        )
    )
    return (
        rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type", "value"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(finish, batch_format="pandas")
        .select_columns(["user_id", "signature", "n_types"])
        .union(anchor)
    )


def q_event_weekday_pivot(sf_dir: str):
    """PIVOT (long → wide crosstab): one row per event type with seven
    day-of-week count columns (wd0..wd6, day = epoch-day mod 7 — a pure
    function both engines compute identically).

    Scale shape: counts collapse map-side per (type, wd); the pivot runs
    over the aggregated histogram (|types| × 7 rows), one tiny task."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        wd = (
            batch["ts"].cast(pa.int64()).to_numpy() // 86_400_000_000 % 7
        ).astype(np.int64)
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "wd": pa.array(wd, pa.int64()),
                "pn": pa.array(np.ones(len(batch), np.int64)),
            }
        )
        g = t.group_by(["event_type", "wd"]).aggregate([("pn", "sum")])
        return g.select(["event_type", "wd", "pn_sum"]).rename_columns(
            ["event_type", "wd", "pn"]
        )

    def widen(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        row = {"event_type": g["event_type"].iloc[0]}
        cnt = dict(zip(g["wd"].to_numpy(np.int64), g["n"].to_numpy(np.int64)))
        for d in range(7):
            row[f"wd{d}"] = np.int64(cnt.get(d, 0))
        return pd.DataFrame([row])

    return (
        rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "wd"])
        .aggregate(Sum("pn", alias_name="n"))
        .groupby("event_type")
        .map_groups(widen, batch_format="pandas")
    )


def q_user_acquisition_curve(sf_dir: str):
    """RUNNING COUNT(DISTINCT) per partition key: for each event type, new
    users per day (first time a user performs that type) and the cumulative
    distinct-user curve — the growth metric every event pipeline reports.
    Composition of two scale-safe primitives: argmin-per-key (per-batch
    partial min over (type, user), one user-bounded shuffle) followed by a
    per-(type, day) histogram with a per-type prefix-sum finisher
    (calendar-bounded groups)."""
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    def first_partial(batch: pa.Table) -> pa.Table:
        day = (batch["ts"].cast(pa.int64()).to_numpy() // 86_400_000_000).astype(
            np.int64
        )
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "user_id": batch["user_id"],
                "pday": pa.array(day, pa.int64()),
            }
        )
        g = t.group_by(["event_type", "user_id"]).aggregate([("pday", "min")])
        return g.select(["event_type", "user_id", "pday_min"]).rename_columns(
            ["event_type", "user_id", "pday"]
        )

    def day_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "day": batch["day"],
                "pn": pa.array(np.ones(len(batch), np.int64)),
            }
        )
        g = t.group_by(["event_type", "day"]).aggregate([("pn", "sum")])
        return g.select(["event_type", "day", "pn_sum"]).rename_columns(
            ["event_type", "day", "pn"]
        )

    def finish(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        g = g.sort_values("day", kind="stable")
        n = g["new_users"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "event_type": g["event_type"].to_numpy(object),
                "day": g["day"].to_numpy(np.int64),
                "new_users": n,
                "cum_users": np.cumsum(n),
            }
        )

    return (
        rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "user_id", "ts"])
        .map_batches(first_partial, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Min("pday", alias_name="day"))
        .map_batches(day_partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Sum("pn", alias_name="new_users"))
        .groupby("event_type")
        .map_groups(finish, batch_format="pandas")
        .select_columns(["event_type", "day", "new_users", "cum_users"])
    )


CKSUM_MOD = 1_000_000_007  # per-row hash modulus (keeps batch partials in int64)
CKSUM_BUCKETS = 64


def q_orders_partition_checksums(sf_dir: str):
    """PARTITION CHECKSUMS for cross-engine data validation: per
    hash-bucket, the row count and an order-independent polynomial checksum
    ``SUM((key*31 + cents) % p) % p`` — the ingest-integrity sweep run
    after replicating a table between engines (here literally checked
    against DuckDB computing the same polynomial).

    Scale shape: pure map-side partials (one row per bucket per block);
    per-batch partial sums stay within int64 (terms < 1e9, batch ≤ 4096
    rows); at extreme row counts the merge re-reduces partials mod p."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        key = batch["o_orderkey"].to_numpy()
        cents = np.floor(batch["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        term = (key * 31 + cents) % CKSUM_MOD
        t = pa.table(
            {
                "bucket": pa.array(key % CKSUM_BUCKETS, pa.int64()),
                "pn": pa.array(np.ones(len(key), np.int64)),
                "ps": pa.array(term, pa.int64()),
            }
        )
        g = t.group_by("bucket").aggregate([("pn", "sum"), ("ps", "sum")])
        return g.select(["bucket", "pn_sum", "ps_sum"]).rename_columns(
            ["bucket", "pn", "ps"]
        )

    def final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": batch["bucket"],
                "n_rows": batch["n_rows"],
                "checksum": pa.array(
                    batch["raw"].to_numpy() % CKSUM_MOD, pa.int64()
                ),
            }
        )

    return (
        rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("pn", alias_name="n_rows"), Sum("ps", alias_name="raw"))
        .map_batches(final, batch_format="pyarrow")
    )


PMI_MIN_COUNT = 5  # collocation support floor
PMI_TOP = 20  # bigrams kept


def q_order_price_percentile_rank(sf_dir: str):
    """GLOBAL per-partition window WITHOUT sorting the fact table:
    ``PERCENT_RANK() OVER (PARTITION BY priority ORDER BY price)`` for
    every order, via a broadcast cumulative histogram.

    Scale shape: one histogram shuffle (bounded by distinct (priority,
    cents) values — price domains are bounded, rows are not), the
    cumulative table broadcasts once via ``ray.put``, and ranking streams
    embarrassingly parallel with a single ``searchsorted`` per batch. The
    fact table is never sorted and never shuffled."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    def hist_partial(batch: pa.Table) -> pa.Table:
        cents = np.floor(batch["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        t = pa.table(
            {
                "prio": batch["o_orderpriority"],
                "cents": pa.array(cents, pa.int64()),
                "pc": pa.array(np.ones(len(batch), np.int64)),
            }
        )
        g = t.group_by(["prio", "cents"]).aggregate([("pc", "sum")])
        return g.select(["prio", "cents", "pc_sum"]).rename_columns(
            ["prio", "cents", "pc"]
        )

    hist = (
        rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderpriority", "o_totalprice"])
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["prio", "cents"])
        .aggregate(Sum("pc", alias_name="c"))
        .to_pandas()  # bounded by the price domain, not the row count
    )
    cum = {}
    for prio, g in hist.groupby("prio"):
        g = g.sort_values("cents", kind="stable")
        c = g["c"].to_numpy(np.int64)
        cum[prio] = (
            g["cents"].to_numpy(np.int64),
            np.concatenate(([0], np.cumsum(c)[:-1])),  # count strictly below
            int(c.sum()),
        )
    side = ray.put(cum)

    def rank(batch: pa.Table) -> pa.Table:
        m = ray.get(side)
        cents = np.floor(batch["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        prio = np.asarray(batch["o_orderpriority"].to_pylist(), object)
        out = np.empty(len(cents), np.int64)
        for p in np.unique(prio):
            vals, below, n = m[p]
            sel = prio == p
            cb = below[np.searchsorted(vals, cents[sel])]
            # identical double expression to PERCENT_RANK()'s
            # (rank-1)*1000000.0/(n-1)
            out[sel] = np.floor(
                cb.astype(np.float64) * 1_000_000.0 / (n - 1) + 0.5
            ).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_orderpriority": batch["o_orderpriority"],
                "prank_micro": pa.array(out, pa.int64()),
            }
        )

    return rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    ).map_batches(rank, batch_format="pyarrow")


def q_order_reconciliation(sf_dir: str):
    """CO-GROUP reconciliation audit of two large tables: per order status,
    how many orders' summed lineitem price (cents) exceeds the order's
    stored total — the cross-table integrity sweep a warehouse runs after
    ingest (both sides too big to broadcast).

    Scale shape: lineitem pre-aggregates per orderkey INSIDE each batch,
    both sides co-partition by hash(orderkey) into ``join_buckets`` fixed
    buckets, each bucket reconciles all its orders in one vectorized
    pandas-groupby + searchsorted pass, and only (status, count, count)
    sufficient statistics leave the bucket."""
    join_buckets = derive_buckets(sf_dir, "lineitem", "orders", floor=64)
    import ray.data as rd
    from ray.data.aggregate import Sum

    def prep_li(batch: pa.Table) -> pa.Table:
        key = batch["l_orderkey"].to_numpy()
        cents = np.floor(batch["l_extendedprice"].to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        t = pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "licents": pa.array(cents, pa.int64()),
            }
        )
        g = t.group_by("key").aggregate([("licents", "sum")])
        key2 = g["key"].to_numpy()
        return pa.table(
            {
                "bucket": pa.array(key2 % join_buckets, pa.int64()),
                "key": pa.array(key2, pa.int64()),
                "licents": g["licents_sum"],
                "ocents": pa.array(np.zeros(len(key2), np.int64), pa.int64()),
                "status": pa.array([""] * len(key2), pa.string()),
                "side": pa.array(np.zeros(len(key2), np.int64), pa.int64()),
            }
        )

    def prep_orders(batch: pa.Table) -> pa.Table:
        key = batch["o_orderkey"].to_numpy()
        cents = np.floor(batch["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        return pa.table(
            {
                "bucket": pa.array(key % join_buckets, pa.int64()),
                "key": pa.array(key, pa.int64()),
                "licents": pa.array(np.zeros(len(key), np.int64), pa.int64()),
                "ocents": pa.array(cents, pa.int64()),
                "status": batch["o_orderstatus"],
                "side": pa.array(np.ones(len(key), np.int64), pa.int64()),
            }
        )

    def reconcile(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        li = g[g["side"] == 0]
        s = li.groupby("key", sort=True)["licents"].sum()
        lk, lv = s.index.to_numpy(np.int64), s.to_numpy(np.int64)
        o = g[g["side"] == 1]
        ok = o["key"].to_numpy(np.int64)
        idx = np.clip(np.searchsorted(lk, ok), 0, max(len(lk) - 1, 0))
        found = (lk[idx] == ok) if len(lk) else np.zeros(len(ok), bool)
        lisum = np.where(found, lv[idx] if len(lk) else 0, 0)
        above = lisum > o["ocents"].to_numpy(np.int64)
        out = (
            pd.DataFrame({"o_orderstatus": o["status"].to_numpy(object), "above": above})
            .groupby("o_orderstatus", sort=True)["above"]
            .agg(pn="size", pa="sum")
            .reset_index()
        )
        out["pn"] = out["pn"].astype(np.int64)
        out["pa"] = out["pa"].astype(np.int64)
        return out

    li = rd.read_parquet(
        _p(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice"]
    ).map_batches(prep_li, batch_format="pyarrow")
    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice", "o_orderstatus"]
    ).map_batches(prep_orders, batch_format="pyarrow")
    return (
        li.union(orders)
        .groupby("bucket")
        .map_groups(reconcile, batch_format="pandas")
        .groupby("o_orderstatus")
        .aggregate(Sum("pn", alias_name="n_orders"), Sum("pa", alias_name="n_above"))
    )


def q_bigram_pmi(sf_dir: str):
    """COLLOCATION MINING: the ``PMI_TOP`` adjacent-token bigrams with the
    highest pointwise mutual information (log10, micro-int) over the
    document corpus, support ≥ ``PMI_MIN_COUNT``.

    Scale shape: unigram and bigram counts collapse map-side per batch
    (vocabulary-bounded shuffles — the classic word-count discipline); the
    unigram LM broadcasts once and PMI scores stream over the aggregated
    bigram histogram with a bounded top-k at the end. The double-precision
    expression is written identically on both engines so FLOOR(x*1e6+0.5)
    agrees bit-for-bit."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .queries import TOKEN_RE

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["text"])

    def uni_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            c.update(TOKEN_RE.findall(t.lower()))
        return pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "pc": pa.array(np.fromiter(c.values(), np.int64, len(c)), pa.int64()),
            }
        )

    def bi_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            tk = TOKEN_RE.findall(t.lower())
            c.update(f"{a} {b}" for a, b in zip(tk, tk[1:]))
        return pa.table(
            {
                "bigram": pa.array(list(c.keys()), pa.string()),
                "pc": pa.array(np.fromiter(c.values(), np.int64, len(c)), pa.int64()),
            }
        )

    uni = (
        docs.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("pc", alias_name="c"))
        .to_pandas()  # vocabulary-bounded
    )
    total = int(uni["c"].sum())
    uni_ref = ray.put(dict(zip(uni["token"], uni["c"].to_numpy(np.int64))))

    bi = (
        docs.map_batches(bi_partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("pc", alias_name="n"))
    )
    btotal = int(bi.sum("n"))

    def pmi(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        um = ray.get(uni_ref)
        b = batch.filter(pc.greater_equal(batch["n"], PMI_MIN_COUNT))
        grams = b["bigram"].to_pylist()
        n = b["n"].to_numpy().astype(np.float64)
        ca = np.array([um[g.split(" ", 1)[0]] for g in grams], np.float64)
        cb = np.array([um[g.split(" ", 1)[1]] for g in grams], np.float64)
        # identical double expression to the oracle:
        # LOG10(CAST(n AS DOUBLE)*T*T/(CAST(B AS DOUBLE)*ca*cb))
        val = np.log10(n * float(total) * float(total) / (float(btotal) * ca * cb))
        return pa.table(
            {
                "bigram": b["bigram"],
                "n": b["n"],
                "pmi_micro": pa.array(
                    np.floor(val * 1_000_000.0 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        bi.map_batches(pmi, batch_format="pyarrow")
        .sort(["pmi_micro", "bigram"], descending=[True, False])
        .limit(PMI_TOP)
    )


ML_QUERIES = {
    "customers_without_urgent": q_customers_without_urgent,
    "orders_join_nation": q_orders_join_nation,
    "hopping_counts": q_hopping_counts,
    "daily_active_users": q_daily_active_users,
    "approx_distinct_users": q_approx_distinct_users,
    "session_overlap_pairs": q_session_overlap_pairs,
    "user_value_rolling3": q_user_value_rolling3,
    "kmeans_assign": q_kmeans_assign,
    "value_quartile_counts": q_value_quartile_counts,
    "event_rollup_counts": q_event_rollup_counts,
    "orders_above_cust_avg": q_orders_above_cust_avg,
    "latest_event_per_user": q_latest_event_per_user,
    "custs_urgent_no_low": q_custs_urgent_no_low,
    "doc_unigram_logprob": q_doc_unigram_logprob,
    "tfidf_top_terms": q_tfidf_top_terms,
    "embedding_norm_stats": q_embedding_norm_stats,
    "revenue_running_by_date": q_revenue_running_by_date,
    "urgent_lineitem_semijoin": q_urgent_lineitem_semijoin,
    "user_event_signature": q_user_event_signature,
    "event_weekday_pivot": q_event_weekday_pivot,
    "order_price_percentile_rank": q_order_price_percentile_rank,
    "order_reconciliation": q_order_reconciliation,
    "bigram_pmi": q_bigram_pmi,
    "user_acquisition_curve": q_user_acquisition_curve,
    "orders_partition_checksums": q_orders_partition_checksums,
}

_TOK_SQL_ML = "regexp_extract_all(lower(text), '[a-z0-9]+')"

ML_ORACLE_SQL = {
    "orders_join_nation": (
        "SELECT n_name, COUNT(*) AS n_orders, "
        "CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
    ),
    "hopping_counts": (
        "WITH e AS (SELECT CAST(FLOOR(epoch_ms(ts)/60000.0) AS BIGINT) AS m, event_type "
        "FROM events), "
        f"h AS (SELECT m - CAST(k AS BIGINT) AS w, event_type FROM e "
        f"CROSS JOIN range({HOP_WINDOWS}) r(k)) "
        "SELECT w, event_type, COUNT(*) AS n FROM h GROUP BY 1, 2"
    ),
    "customers_without_urgent": (
        "SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer c "
        "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        f"AND o.o_orderpriority = '{ANTI_PRIORITY}') GROUP BY c_mktsegment"
    ),
    "daily_active_users": (
        f"SELECT CAST(FLOOR(epoch_ms(ts)/{DAY_MS}.0) AS BIGINT) AS day, event_type, "
        "COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY 1, 2"
    ),
    "user_value_rolling3": (
        "WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms, "
        "CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents FROM events) "
        "SELECT event_id, user_id, CAST(SUM(cents) OVER (PARTITION BY user_id "
        "ORDER BY ms, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS roll3_cents FROM e"
    ),
    "orders_above_cust_avg": (
        "WITH a AS (SELECT o_custkey, COUNT(*) AS cnt, "
        "SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS s "
        "FROM orders GROUP BY 1) "
        "SELECT o_orderpriority, COUNT(*) AS n_above FROM orders "
        "JOIN a USING (o_custkey) "
        "WHERE CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) * cnt > s "
        "GROUP BY 1"
    ),
    "latest_event_per_user": (
        "WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events) "
        "SELECT user_id, event_id, ms FROM e "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id "
        "ORDER BY ms DESC, event_id DESC) = 1"
    ),
    "event_rollup_counts": (
        f"WITH e AS (SELECT CAST(FLOOR(epoch_ms(ts)/{DAY_MS}.0) AS BIGINT) AS day, "
        "event_type FROM events) "
        f"SELECT COALESCE(day, {ROLLUP_ALL_DAY}) AS day, "
        f"COALESCE(event_type, '{ROLLUP_ALL_TYPE}') AS event_type, COUNT(*) AS n "
        "FROM e GROUP BY ROLLUP (day, event_type)"
    ),
    "custs_urgent_no_low": (
        f"SELECT o_custkey FROM orders WHERE o_orderpriority = '{SET_A_PRIO}' "
        "EXCEPT "
        f"SELECT o_custkey FROM orders WHERE o_orderpriority = '{SET_B_PRIO}'"
    ),
    "value_quartile_counts": (
        "WITH c AS (SELECT event_type, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents "
        "FROM events), "
        "n AS (SELECT event_type, COUNT(*) AS n FROM c GROUP BY 1), "
        "r AS (SELECT event_type, cents, "
        "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rk FROM c), "
        "e AS (SELECT r.event_type, "
        + ", ".join(
            f"MIN(CASE WHEN rk >= ({q} * n.n + 99) // 100 THEN cents END) AS e{q}"
            for q in QUARTILE_QS
        )
        + " FROM r JOIN n USING (event_type) GROUP BY r.event_type) "
        "SELECT c.event_type, CAST(("
        + " + ".join(f"CASE WHEN cents > e{q} THEN 1 ELSE 0 END" for q in QUARTILE_QS)
        + ") AS BIGINT) AS quartile, COUNT(*) AS n "
        "FROM c JOIN e USING (event_type) GROUP BY 1, 2"
    ),
    "doc_unigram_logprob": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK_SQL_ML}) AS token FROM documents), "
        "tot AS (SELECT COUNT(*) AS t FROM tok), "
        "uc AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY 1), "
        "lp AS (SELECT token, "
        "CAST(FLOOR(LOG10(CAST(c AS DOUBLE)/t.t)*1000000 + 0.5) AS BIGINT) AS lp "
        "FROM uc CROSS JOIN tot t) "
        "SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(lp.lp) AS BIGINT) AS logprob_micro "
        "FROM tok JOIN lp USING (token) GROUP BY doc_id"
    ),
    "kmeans_assign": (
        "WITH c AS (SELECT vec_id AS centroid_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce "
        f"FROM embeddings WHERE vec_id < {KMEANS_K}), "
        "v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve "
        "FROM embeddings), "
        "s AS (SELECT v.vec_id, c.centroid_id, "
        "CAST(FLOOR(list_cosine_similarity(c.ce, v.ve)*1000000 + 0.5) AS BIGINT) AS cm "
        "FROM v CROSS JOIN c), "
        "a AS (SELECT vec_id, centroid_id, cm FROM s "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cm DESC, centroid_id ASC) = 1) "
        "SELECT centroid_id, COUNT(*) AS n, CAST(SUM(cm) AS BIGINT) AS sum_cos_micro "
        "FROM a GROUP BY centroid_id"
    ),
    "tfidf_top_terms": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK_SQL_ML}) AS token FROM documents), "
        "tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2), "
        "df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1), "
        "n AS (SELECT COUNT(*) AS n FROM documents), "
        "s AS (SELECT tf.doc_id, tf.token, tf.tf, tf.tf * "
        "CAST(FLOOR(LOG10(n.n/CAST(df.df AS DOUBLE))*1000000 + 0.5) AS BIGINT) AS score "
        "FROM tf JOIN df USING (token) CROSS JOIN n) "
        "SELECT doc_id, token, tf, score, "
        "CAST(ROW_NUMBER() OVER w - 1 AS BIGINT) AS rank FROM s "
        "WINDOW w AS (PARTITION BY doc_id ORDER BY score DESC, token ASC) "
        f"QUALIFY ROW_NUMBER() OVER w <= {TFIDF_TOP}"
    ),
    "embedding_norm_stats": (
        "WITH m AS (SELECT CAST(label AS BIGINT) AS label, "
        "list_transform(embedding, "
        "x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT)) AS mi "
        "FROM embeddings) "
        "SELECT label, COUNT(*) AS n, "
        "CAST(SUM(list_sum(list_transform(mi, x -> x*x))) AS BIGINT) AS sumsq_micro2 "
        "FROM m GROUP BY label"
    ),
    "revenue_running_by_date": (
        "WITH d AS (SELECT CAST(FLOOR(epoch_us(o_orderdate)/86400000000.0) AS BIGINT) AS day, "
        "CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents "
        "FROM orders GROUP BY 1) "
        "SELECT day, revenue_cents, "
        "CAST(SUM(revenue_cents) OVER (ORDER BY day) AS BIGINT) AS running_cents FROM d"
    ),
    "urgent_lineitem_semijoin": (
        "SELECT l_returnflag, COUNT(*) AS n_items, "
        "CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        f"WHERE o_orderpriority = '{ANTI_PRIORITY}' GROUP BY 1"
    ),
    "user_event_signature": (
        "SELECT user_id, "
        "string_agg(DISTINCT event_type, '|' ORDER BY event_type) AS signature, "
        "COUNT(DISTINCT event_type) AS n_types FROM events "
        f"WHERE value >= {SIG_VALUE_GATE} GROUP BY user_id"
    ),
    "event_weekday_pivot": (
        "WITH e AS (SELECT event_type, "
        "CAST(FLOOR(epoch_us(ts)/86400000000.0) AS BIGINT) % 7 AS wd FROM events) "
        "SELECT event_type, "
        + ", ".join(
            f"CAST(SUM(CASE WHEN wd = {d} THEN 1 ELSE 0 END) AS BIGINT) AS wd{d}"
            for d in range(7)
        )
        + " FROM e GROUP BY event_type"
    ),
    "order_price_percentile_rank": (
        "WITH e AS (SELECT o_orderkey, o_orderpriority, "
        "CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents FROM orders) "
        "SELECT o_orderkey, o_orderpriority, "
        "CAST(FLOOR((RANK() OVER (PARTITION BY o_orderpriority ORDER BY cents) - 1) "
        "* 1000000.0 / (COUNT(*) OVER (PARTITION BY o_orderpriority) - 1) + 0.5) "
        "AS BIGINT) AS prank_micro FROM e"
    ),
    "order_reconciliation": (
        "WITH li AS (SELECT l_orderkey, "
        "CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS s "
        "FROM lineitem GROUP BY 1) "
        "SELECT o_orderstatus, COUNT(*) AS n_orders, "
        "CAST(SUM(CASE WHEN COALESCE(li.s, 0) > "
        "CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_above FROM orders LEFT JOIN li ON l_orderkey = o_orderkey GROUP BY 1"
    ),
    "bigram_pmi": (
        "WITH tok AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS tk "
        "FROM documents), "
        "uni AS (SELECT unnest(tk) AS token FROM tok), "
        "uc AS (SELECT token, COUNT(*) AS c FROM uni GROUP BY 1), "
        "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM uni), "
        "bi AS (SELECT unnest(list_transform(range(1, len(tk)), "
        "i -> tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT)+1])) AS bigram "
        "FROM tok WHERE len(tk) >= 2), "
        "bc AS (SELECT bigram, COUNT(*) AS n FROM bi GROUP BY 1), "
        "btot AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM bi) "
        "SELECT bigram, n, "
        "CAST(FLOOR(LOG10(CAST(n AS DOUBLE)*t*t/(CAST(b AS DOUBLE)*ca.c*cb.c))"
        "*1000000 + 0.5) AS BIGINT) AS pmi_micro "
        "FROM bc CROSS JOIN tot CROSS JOIN btot "
        "JOIN uc ca ON ca.token = split_part(bigram, ' ', 1) "
        "JOIN uc cb ON cb.token = split_part(bigram, ' ', 2) "
        f"WHERE n >= {PMI_MIN_COUNT} "
        f"ORDER BY pmi_micro DESC, bigram ASC LIMIT {PMI_TOP}"
    ),
    "orders_partition_checksums": (
        "WITH e AS (SELECT o_orderkey AS k, "
        "CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents FROM orders) "
        f"SELECT k % {CKSUM_BUCKETS} AS bucket, COUNT(*) AS n_rows, "
        f"CAST(SUM((k*31 + cents) % {CKSUM_MOD}) % {CKSUM_MOD} AS BIGINT) AS checksum "
        "FROM e GROUP BY 1"
    ),
    "user_acquisition_curve": (
        "WITH f AS (SELECT event_type, user_id, "
        "MIN(CAST(FLOOR(epoch_us(ts)/86400000000.0) AS BIGINT)) AS day "
        "FROM events GROUP BY 1, 2), "
        "d AS (SELECT event_type, day, COUNT(*) AS new_users FROM f GROUP BY 1, 2) "
        "SELECT event_type, day, new_users, "
        "CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) "
        "AS cum_users FROM d"
    ),
}
