"""Ray-Data-native crawl engine: the round loop (SURVEY.md §3.4, §7.1).

Each crawl round:
1. ``propose``/``commit`` against the sharded frontier actors (state/frontier)
   — global order (score desc, url asc) under per-host politeness quotas.
2. The selected rows become a per-round ``ray.data.Dataset``:
   from_arrow → Expander (redirect expansion + routing; broadcast map) →
   [driver-side expanded-URL dedup against the owning shards — exact,
   order-sensitive within the round] → FetchExtract actor pool (offline
   fetch join + article/image extraction over Arrow batches) →
   EnqueueLinks (discovered URLs scored + routed + enqueued into shards
   from inside the stage — link volume never lands on the driver) →
   write_parquet (one directory per round → resumable output).
3. Shards checkpoint (pending + seen + manifest w/ lineage) every round; a
   killed run restores shard state and skips rounds whose output directory
   is already complete — no re-fetching.

Conformance: the trace (round, rank, url) and the final seen-set must equal
pipelines/oracle.CrawlOracle exactly (tests/test_crawl_trace.py).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.scoring import webpage_score
from ..functions.urls import host_of, url_hash64, url_hash64_vec
from ..state.frontier import FrontierShard, build_salt_map, route
from ..state.politeness import RobotsCache
from ..stages.expand import Expander
from ..stages.fetch import FetchExtract
from .config import CrawlConfig


class EnqueueLinks:
    """map_batches sink-stage: discovered out_links are scored (universe
    metadata via broadcast numpy lookup arrays), routed by
    (registered_domain, salt) and enqueued into the frontier shard actors
    directly from the worker — the driver never sees the link stream.
    Enqueue order across tasks is irrelevant: a URL's score derives from the
    URL alone, and the shard's first-wins dedup is order-insensitive for the
    final pending/seen state (oracle equivalence argument in
    pipelines/oracle.py)."""

    def __init__(self, shards, meta_ref, salt_map, n_shards, now_ms):
        import ray

        self.shards = shards
        self.sorted_hashes, self.shares, self.dates = ray.get(meta_ref)
        self.salt_map = salt_map
        self.n_shards = n_shards
        self.now_ms = now_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        links: list[str] = []
        for cell in batch["out_links"]:
            links.extend(cell.as_py() or [])
        if links:
            # de-dup within the batch (cheap pre-filter; shards dedup exactly)
            links = list(dict.fromkeys(links))
            h = url_hash64_vec(links)
            idx = np.searchsorted(self.sorted_hashes, h)
            idx_c = np.clip(idx, 0, max(0, len(self.sorted_hashes) - 1))
            found = (
                (self.sorted_hashes[idx_c] == h)
                if len(self.sorted_hashes)
                else np.zeros(len(links), bool)
            )
            shares = np.where(found, self.shares[idx_c], 0).astype(np.int64)
            dates = np.where(found, self.dates[idx_c], self.now_ms).astype(np.int64)
            scores = webpage_score(shares, dates, self.now_ms)
            per_shard: dict[int, dict] = {}
            for i, u in enumerate(links):
                host = host_of(u)
                shard, salt = route(u, host, self.n_shards, self.salt_map)
                d = per_shard.setdefault(
                    shard,
                    {"url": [], "domain": [], "salt": [], "score": [], "shares": [], "date_ms": []},
                )
                d["url"].append(u)
                d["domain"].append(host)
                d["salt"].append(salt)
                d["score"].append(float(scores[i]))
                d["shares"].append(int(shares[i]))
                d["date_ms"].append(int(dates[i]))
            ray.get(
                [
                    self.shards[s].enqueue.remote(rows, self.now_ms)
                    for s, rows in per_shard.items()
                ]
            )
        return batch


class RayCrawler:
    def __init__(
        self,
        fixture_dir: str,
        cfg: CrawlConfig,
        out_dir: str,
        checkpoint_dir: str | None = None,
    ):
        import ray

        self.cfg = cfg
        self.out_dir = out_dir
        self.checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "checkpoints")
        os.makedirs(self.out_dir, exist_ok=True)
        os.makedirs(self.checkpoint_dir, exist_ok=True)

        self.seeds = pq.read_table(os.path.join(fixture_dir, "frontier_seed.parquet"))
        redirects = pq.read_table(os.path.join(fixture_dir, "redirects.parquet"))
        self.redirect_map_ref = ray.put(
            dict(zip(redirects["src"].to_pylist(), redirects["dst"].to_pylist()))
        )
        pages = pq.read_table(os.path.join(fixture_dir, "pages.parquet"))
        # offline page store (broadcast). At 100 TB this becomes a
        # hash-partitioned Lance store + bucketed join — see stages/fetch.py.
        self.page_store_ref = ray.put(
            {
                u: (sc, ct, html)
                for u, sc, ct, html in zip(
                    pages["url"].to_pylist(),
                    pages["status_code"].to_pylist(),
                    pages["content_type"].to_pylist(),
                    pages["html"].to_pylist(),
                )
            }
        )
        uni = pq.read_table(
            os.path.join(fixture_dir, "urls.parquet"), columns=["url", "shares", "date"]
        )
        h = url_hash64_vec(uni["url"].to_pylist())
        order = np.argsort(h, kind="stable")
        self.meta_ref = ray.put(
            (
                h[order],
                uni["shares"].to_numpy()[order].astype(np.int64),
                uni["date"].cast(pa.int64()).to_numpy()[order],
            )
        )
        rob = pq.read_table(os.path.join(fixture_dir, "robots.parquet"))
        robots = RobotsCache.from_table(
            rob["host"].to_pylist(), rob["disallow_prefix"].to_pylist()
        )
        counts: dict[str, int] = {}
        for d in self.seeds["domain"].to_pylist():
            counts[d] = counts.get(d, 0) + 1
        self.salt_map = build_salt_map(counts, cfg.hot_threshold, cfg.max_salts)

        Actor = ray.remote(num_cpus=0.25)(FrontierShard)
        self.shards = [
            Actor.remote(
                i,
                cfg.n_shards,
                salt_map=self.salt_map,
                per_host_budget=cfg.per_host_budget,
                seen_ttl_ms=cfg.seen_ttl_ms,
                seen_capacity=cfg.seen_capacity,
                robots=robots,
            )
            for i in range(cfg.n_shards)
        ]
        self.trace: list[tuple[int, int, str]] = []
        self.start_round = 0

    # -- seed / resume ----------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.checkpoint_dir, "crawl_manifest.json")

    def maybe_resume(self) -> bool:
        """Restore shard state + completed-round count from the checkpoint.
        Returns True when resuming (seeds must NOT be re-enqueued)."""
        import ray

        mp = self._manifest_path()
        if not os.path.exists(mp):
            return False
        with open(mp) as f:
            m = json.load(f)
        ok = ray.get([s.restore.remote(self.checkpoint_dir) for s in self.shards])
        if not all(ok):
            return False
        self.start_round = m["next_round"]
        self.trace = [tuple(t) for t in m.get("trace", [])]
        return True

    def enqueue_seeds(self) -> None:
        import ray

        urls = self.seeds["url"].to_pylist()
        domains = self.seeds["domain"].to_pylist()
        shares = self.seeds["shares"].to_numpy().astype(np.int64)
        dates = self.seeds["date"].cast(pa.int64()).to_numpy()
        scores = webpage_score(shares, dates, self.cfg.now_ms)
        per_shard: dict[int, dict] = {}
        for i, u in enumerate(urls):
            shard, salt = route(u, domains[i], self.cfg.n_shards, self.salt_map)
            d = per_shard.setdefault(
                shard,
                {"url": [], "domain": [], "salt": [], "score": [], "shares": [], "date_ms": []},
            )
            d["url"].append(u)
            d["domain"].append(domains[i])
            d["salt"].append(salt)
            d["score"].append(float(scores[i]))
            d["shares"].append(int(shares[i]))
            d["date_ms"].append(int(dates[i]))
        ray.get(
            [
                self.shards[s].enqueue.remote(rows, self.cfg.now_ms)
                for s, rows in per_shard.items()
            ]
        )

    # -- one round --------------------------------------------------------
    def run_round(self, rnd: int) -> int:
        import ray
        import ray.data as rd

        cfg = self.cfg
        now = cfg.now_ms
        proposals = ray.get([s.propose.remote(cfg.round_budget) for s in self.shards])
        merged = []  # (score, url, shard_idx)
        for si, props in enumerate(proposals):
            for score, url, domain, salt in props:
                merged.append((score, url, si))
        merged.sort(key=lambda t: (-t[0], t[1]))
        selected = merged[: cfg.round_budget]
        per_shard_sel: dict[int, list[str]] = {i: [] for i in range(cfg.n_shards)}
        for score, url, si in selected:
            per_shard_sel[si].append(url)
        committed = ray.get(
            [
                self.shards[si].commit.remote(urls, now)
                for si, urls in per_shard_sel.items()
            ]
        )
        if not selected:
            return 0
        rows_by_url = {r["url"]: r for rows in committed for r in rows}
        rank_of = {}
        for rank, (score, url, si) in enumerate(selected):
            self.trace.append((rnd, rank, url))
            rank_of[url] = rank

        tbl = pa.table(
            {
                "round": pa.array([rnd] * len(selected), pa.int32()),
                "rank": pa.array([rank_of[u] for _, u, _ in selected], pa.int32()),
                "url": pa.array([u for _, u, _ in selected], pa.string()),
                "host": pa.array(
                    [rows_by_url[u]["domain"] for _, u, _ in selected], pa.string()
                ),
                "score": pa.array([s for s, _, _ in selected], pa.float64()),
                "shares": pa.array(
                    [rows_by_url[u]["shares"] for _, u, _ in selected], pa.int64()
                ),
                "date_ms": pa.array(
                    [rows_by_url[u]["date_ms"] for _, u, _ in selected], pa.int64()
                ),
            }
        )

        # expansion (small control-plane stage; budget rows only)
        ds = rd.from_arrow(tbl)
        exp = (
            ds.map_batches(
                Expander,
                fn_constructor_kwargs={"redirect_map_ref": self.redirect_map_ref},
                batch_format="pyarrow",
                batch_size=4096,
                concurrency=2,
            )
            .select_columns(["rank", "url", "expanded_url", "expanded_host", "route", "status"])
            .to_pandas()
            .sort_values("rank")
        )

        # exact order-sensitive dedup of expanded targets (within-round,
        # against shard seen-state): ask owning shards for membership of the
        # changed targets, then apply first-wins sequentially in rank order.
        changed = exp[(exp["status"] == "ok") & (exp["expanded_url"] != exp["url"])]
        shard_of_target = {}
        per_shard_check: dict[int, list[str]] = {}
        for u in changed["expanded_url"]:
            s, _ = route(u, host_of(u), cfg.n_shards, self.salt_map)
            shard_of_target[u] = s
            per_shard_check.setdefault(s, []).append(u)
        seen_flags: dict[str, bool] = {}
        if per_shard_check:
            results = ray.get(
                [
                    self.shards[s].contains_urls.remote(us, now)
                    for s, us in per_shard_check.items()
                ]
            )
            for (s, us), flags in zip(per_shard_check.items(), results):
                for u, fl in zip(us, flags):
                    seen_flags[u] = bool(fl)
        newly: set[str] = set()
        statuses = exp["status"].tolist()
        mark_per_shard: dict[int, list[str]] = {}
        for i, (rank, url, eurl, st) in enumerate(
            zip(exp["rank"], exp["url"], exp["expanded_url"], exp["status"])
        ):
            if st != "ok" or eurl == url:
                continue
            if seen_flags.get(eurl, False) or eurl in newly:
                statuses[i] = "dup_after_expand"
            else:
                newly.add(eurl)
                mark_per_shard.setdefault(shard_of_target[eurl], []).append(eurl)
        if mark_per_shard:
            ray.get(
                [
                    self.shards[s].mark_seen.remote(us, now)
                    for s, us in mark_per_shard.items()
                ]
            )
        exp["status"] = statuses

        tbl2 = pa.Table.from_pandas(
            exp.merge(
                tbl.to_pandas()[["rank", "host", "score", "shares", "date_ms", "round"]],
                on="rank",
            ),
            preserve_index=False,
        )

        # fetch + extract + enqueue discovered links + write round output
        ds2 = (
            rd.from_arrow(tbl2)
            .map_batches(
                FetchExtract,
                fn_constructor_kwargs={"page_store_ref": self.page_store_ref},
                batch_format="pyarrow",
                batch_size=cfg.fetch_batch_size,
                concurrency=cfg.fetch_concurrency,
            )
            .map_batches(
                EnqueueLinks,
                fn_constructor_kwargs={
                    "shards": self.shards,
                    "meta_ref": self.meta_ref,
                    "salt_map": self.salt_map,
                    "n_shards": cfg.n_shards,
                    "now_ms": now,
                },
                batch_format="pyarrow",
                batch_size=cfg.fetch_batch_size,
                concurrency=2,
            )
        )
        round_dir = os.path.join(self.out_dir, f"round={rnd}")
        tmp_dir = round_dir + ".tmp"
        if os.path.exists(tmp_dir):
            import shutil

            shutil.rmtree(tmp_dir)
        ds2.write_parquet(tmp_dir)
        os.rename(tmp_dir, round_dir)
        return len(selected)

    # -- full crawl -------------------------------------------------------
    def run(self, checkpoint_every: int = 1) -> dict:
        import ray

        resumed = self.maybe_resume()
        if not resumed:
            self.enqueue_seeds()
        for rnd in range(self.start_round, self.cfg.max_rounds):
            n = self.run_round(rnd)
            ray.get([s.end_round.remote(rnd) for s in self.shards])
            if checkpoint_every and (rnd % checkpoint_every == 0):
                self.checkpoint(rnd + 1)
            if n == 0:
                break
        return self.result()

    def checkpoint(self, next_round: int) -> None:
        import ray

        ray.get([s.checkpoint.remote(self.checkpoint_dir) for s in self.shards])
        with open(self._manifest_path() + ".tmp", "w") as f:
            json.dump({"next_round": next_round, "trace": self.trace}, f)
        os.replace(self._manifest_path() + ".tmp", self._manifest_path())

    def result(self) -> dict:
        import ray

        seen_parts = ray.get([s.seen_hashes.remote() for s in self.shards])
        seen = np.sort(np.concatenate(seen_parts)) if seen_parts else np.array([], np.uint64)
        stats = ray.get([s.stats.remote() for s in self.shards])
        return {"trace": self.trace, "seen_hashes": seen, "shard_stats": stats}

    def shutdown(self) -> None:
        import ray

        for s in self.shards:
            ray.kill(s)
