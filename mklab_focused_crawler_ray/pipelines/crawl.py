"""Ray-Data-native crawl engine: the round loop (SURVEY.md §3.4, §7.1).

Each crawl round:
1. ``propose``/``commit`` against the sharded frontier actors (state/frontier)
   — global order (score desc, url asc) under per-host politeness quotas.
2. The selected rows become a per-round ``ray.data.Dataset``:
   from_arrow → expander (redirect expansion + routing; broadcast map) →
   [driver-side expanded-URL dedup against the owning shards — exact,
   order-sensitive within the round] → fetch_extract task stage (offline
   fetch join against a zero-copy broadcast Arrow page store +
   article/image extraction over Arrow batches) →
   enqueue_links (discovered URLs scored + routed + enqueued into shards
   from inside the stage — link volume never lands on the driver) →
   write_parquet (one directory per round → resumable output).
   All three stages are TASK-based (plain functions over broadcast
   ObjectRefs), not per-round actor pools: actor spawn latency every round
   dominated wall time and inverted scaling in the pool design.
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
from ..state.frontier import FrontierShard, build_salt_map, route, route_many
from ..state.politeness import RobotsCache
from ..stages.expand import make_expander
from ..stages.fetch import build_page_store, make_fetch_extract
from .config import CrawlConfig


import ray as _ray


@_ray.remote
def _expand_task(expander_fn, tbl_slice: pa.Table) -> pa.Table:
    return expander_fn(tbl_slice)


def make_enqueue_links(shards, meta_ref, salt_map, n_shards, now_ms, score_now_ms=None):
    """Task-based map_batches sink-stage factory: discovered out_links are
    scored (universe metadata via broadcast zero-copy numpy lookup arrays),
    routed by (registered_domain, salt) and enqueued into the frontier shard
    actors directly from the worker — the driver never sees the link stream.
    Enqueue order across tasks is irrelevant: a URL's score derives from the
    URL alone, and the shard's first-wins dedup is order-insensitive for the
    final pending/seen state (oracle equivalence argument in
    pipelines/oracle.py)."""

    def enqueue_links(batch: pa.Table) -> pa.Table:
        import ray

        sorted_hashes, meta_shares, meta_dates = ray.get(meta_ref)
        links: list[str] = []
        for cell in batch["out_links"]:
            links.extend(cell.as_py() or [])
        if links:
            # de-dup within the batch (cheap pre-filter; shards dedup exactly)
            links = list(dict.fromkeys(links))
            h = url_hash64_vec(links)
            idx = np.searchsorted(sorted_hashes, h)
            idx_c = np.clip(idx, 0, max(0, len(sorted_hashes) - 1))
            found = (
                (sorted_hashes[idx_c] == h)
                if len(sorted_hashes)
                else np.zeros(len(links), bool)
            )
            # score clock stays FIXED (reproducible ordering); now_ms is the
            # advancing logical clock used only for seen-TTL bookkeeping
            sn = score_now_ms if score_now_ms is not None else now_ms
            shares = np.where(found, meta_shares[idx_c], 0).astype(np.int64)
            dates = np.where(found, meta_dates[idx_c], sn).astype(np.int64)
            scores = webpage_score(shares, dates, sn)
            hosts = [host_of(u) for u in links]
            shard_arr, salt_arr, _ = route_many(links, hosts, n_shards, salt_map)
            links_np = np.asarray(links, dtype=object)
            hosts_np = np.asarray(hosts, dtype=object)
            futs = []
            for s in np.unique(shard_arr):
                m = shard_arr == s
                rows = {
                    "url": links_np[m].tolist(),
                    "domain": hosts_np[m].tolist(),
                    "salt": salt_arr[m].tolist(),
                    "score": scores[m].tolist(),
                    "shares": shares[m].tolist(),
                    "date_ms": dates[m].tolist(),
                }
                futs.append(shards[int(s)].enqueue.remote(rows, now_ms))
            ray.get(futs)
        return batch

    return enqueue_links


class RayCrawler:
    def __init__(
        self,
        fixture_dir: str,
        cfg: CrawlConfig,
        out_dir: str,
        checkpoint_dir: str | None = None,
        robots: RobotsCache | None = None,
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
        if cfg.embed_media:
            from ..stages.visual import build_image_store

            images = pq.read_table(
                os.path.join(fixture_dir, "images.parquet"),
                columns=["image_id", "bytes", "fmt"],
            )
            self.image_store_ref = ray.put(build_image_store(images))
        else:
            self.image_store_ref = None
        pages = pq.read_table(os.path.join(fixture_dir, "pages.parquet"))
        # offline page store (broadcast, zero-copy: sorted url-hash numpy
        # index + Arrow table). At 100 TB this becomes a hash-partitioned
        # Lance store + bucketed join — see stages/fetch.py.
        self.page_store_ref = ray.put(build_page_store(pages))
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
        if robots is None:
            rob = pq.read_table(os.path.join(fixture_dir, "robots.parquet"))
            robots = RobotsCache.from_table(
                rob["host"].to_pylist(), rob["disallow_prefix"].to_pylist()
            )
        counts: dict[str, int] = {}
        for d in self.seeds["domain"].to_pylist():
            counts[d] = counts.get(d, 0) + 1
        self.salt_map = build_salt_map(counts, cfg.hot_threshold, cfg.max_salts)

        # tiny num_cpus: shard actors are control-plane (RPC-driven python
        # state); reserving real CPU slots starves map tasks on small nodes
        Actor = ray.remote(num_cpus=0.05)(FrontierShard)
        self.shards = [
            Actor.remote(
                i,
                cfg.n_shards,
                salt_map=self.salt_map,
                per_host_budget=cfg.per_host_budget,
                seen_ttl_ms=cfg.seen_ttl_ms,
                seen_capacity=cfg.seen_capacity,
                robots=robots,
                round_duration_ms=cfg.round_duration_ms,
            )
            for i in range(cfg.n_shards)
        ]
        self.trace: list[tuple[int, int, str]] = []
        self.start_round = 0
        # media-seen gate state (cfg.media_dedup): sorted uint64 id-hashes
        # of media embedded in completed rounds
        self.media_seen = np.empty(0, dtype=np.uint64)
        # cumulative wall-time per phase (control = propose/commit/merge/
        # expand/dedup barriers; pipeline = fetch+extract+embed+enqueue+write)
        self.phase_times = {"control": 0.0, "pipeline": 0.0}

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
        ms_path = os.path.join(self.checkpoint_dir, "media_seen.npy")
        if os.path.exists(ms_path):
            self.media_seen = np.load(ms_path)
        return True

    def enqueue_seeds(self) -> None:
        import ray

        urls = self.seeds["url"].to_pylist()
        domains = self.seeds["domain"].to_pylist()
        shares = self.seeds["shares"].to_numpy().astype(np.int64)
        dates = self.seeds["date"].cast(pa.int64()).to_numpy()
        scores = webpage_score(shares, dates, self.cfg.now_ms)
        shard_arr, salt_arr, _ = route_many(
            urls, domains, self.cfg.n_shards, self.salt_map
        )
        urls_np = np.asarray(urls, dtype=object)
        domains_np = np.asarray(domains, dtype=object)
        futs = []
        for s in np.unique(shard_arr):
            m = shard_arr == s
            rows = {
                "url": urls_np[m].tolist(),
                "domain": domains_np[m].tolist(),
                "salt": salt_arr[m].tolist(),
                "score": scores[m].tolist(),
                "shares": shares[m].tolist(),
                "date_ms": dates[m].tolist(),
            }
            futs.append(self.shards[int(s)].enqueue.remote(rows, self.cfg.now_ms))
        ray.get(futs)

    # -- one round --------------------------------------------------------
    def run_round(self, rnd: int) -> int:
        import time as _time

        import ray
        import ray.data as rd

        cfg = self.cfg
        now = cfg.now_ms + rnd * cfg.round_duration_ms  # logical clock
        _t0 = _time.time()
        proposals = ray.get([s.propose.remote(cfg.round_budget) for s in self.shards])
        # Arrow-native merge of shard proposals (driver-side python sort of
        # O(budget × shards) tuples was a serial bottleneck at large rounds)
        p_scores, p_urls, p_shards = [], [], []
        for si, props in enumerate(proposals):
            for score, url, domain, salt in props:
                p_scores.append(score)
                p_urls.append(url)
                p_shards.append(si)
        merged_tbl = pa.table(
            {
                "score": pa.array(p_scores, pa.float64()),
                "url": pa.array(p_urls, pa.string()),
                "shard": pa.array(p_shards, pa.int32()),
            }
        ).sort_by([("score", "descending"), ("url", "ascending")])
        merged_tbl = merged_tbl.slice(0, cfg.round_budget)
        selected = list(
            zip(
                merged_tbl["score"].to_pylist(),
                merged_tbl["url"].to_pylist(),
                merged_tbl["shard"].to_pylist(),
            )
        )
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
        # committed shards return columns; index url → (domain, shares, date)
        rows_by_url = {}
        for cols in committed:
            for u, d, sh_, dm in zip(
                cols["url"], cols["domain"], cols["shares"], cols["date_ms"]
            ):
                rows_by_url[u] = (d, sh_, dm)
        rank_of = {}
        for rank, (score, url, si) in enumerate(selected):
            self.trace.append((rnd, rank, url))
            rank_of[url] = rank

        meta = [rows_by_url[u] for _, u, _ in selected]
        tbl = pa.table(
            {
                "round": pa.array([rnd] * len(selected), pa.int32()),
                "rank": pa.array([rank_of[u] for _, u, _ in selected], pa.int32()),
                "url": pa.array([u for _, u, _ in selected], pa.string()),
                "host": pa.array([m[0] for m in meta], pa.string()),
                "score": pa.array([s for s, _, _ in selected], pa.float64()),
                "shares": pa.array([m[1] for m in meta], pa.int64()),
                "date_ms": pa.array([m[2] for m in meta], pa.int64()),
            }
        )

        # expansion — raw Ray tasks over table slices, NOT a Dataset: this is
        # a budget-row control-plane stage sandwiched between two driver
        # barriers (the order-sensitive dedup below), and a per-round Dataset
        # executor spin-up (~0.5 s) dominated the stage's actual work
        # (SURVEY §2 note: raw tasks only where the Dataset API genuinely
        # doesn't fit — this barrier is that case).
        n_slices = max(1, min(8, len(tbl) // 4096))
        expander_fn = make_expander(self.redirect_map_ref)
        slice_refs = [
            _expand_task.remote(expander_fn, tbl.slice(i * len(tbl) // n_slices,
                                                       (i + 1) * len(tbl) // n_slices - i * len(tbl) // n_slices))
            for i in range(n_slices)
        ]
        exp = (
            pa.concat_tables(ray.get(slice_refs))
            .select(["rank", "url", "expanded_url", "expanded_host", "route", "status"])
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

        self.phase_times["control"] += _time.time() - _t0
        _t0 = _time.time()
        # fetch + extract + enqueue discovered links + write round output
        # from_arrow yields ONE block — split it so the fetch stage fans out
        # (tasks are per block; batch_size alone does not create parallelism)
        n_blocks = max(
            1,
            min(
                -(-len(tbl2) // cfg.fetch_batch_size),  # ceil
                cfg.fetch_concurrency * 4,
            ),
        )
        ds2 = rd.from_arrow(tbl2, override_num_blocks=n_blocks).map_batches(
            make_fetch_extract(self.page_store_ref),
            batch_format="pyarrow",
            batch_size=cfg.fetch_batch_size,
        )
        if self.image_store_ref is not None:
            from ..stages.visual import make_media_embed

            seen_ref = (
                ray.put(self.media_seen) if cfg.media_dedup else None
            )
            ds2 = ds2.map_batches(
                make_media_embed(self.image_store_ref, media_seen_ref=seen_ref),
                batch_format="pyarrow",
                batch_size=cfg.fetch_batch_size,
            )
        ds2 = (
            ds2
            .map_batches(
                make_enqueue_links(
                    self.shards, self.meta_ref, self.salt_map, cfg.n_shards, now,
                    score_now_ms=cfg.now_ms,
                ),
                batch_format="pyarrow",
                batch_size=cfg.fetch_batch_size,
            )
        )
        round_dir = os.path.join(self.out_dir, f"round={rnd}")
        tmp_dir = round_dir + ".tmp"
        if os.path.exists(tmp_dir):
            import shutil

            shutil.rmtree(tmp_dir)
        ds2.write_parquet(tmp_dir)
        os.rename(tmp_dir, round_dir)
        if cfg.media_dedup and self.image_store_ref is not None:
            new_ids: set[str] = set()
            for f in os.listdir(round_dir):
                if f.endswith(".parquet"):
                    t = pq.read_table(
                        os.path.join(round_dir, f), columns=["media_image_ids"]
                    )
                    for cell in t["media_image_ids"]:
                        new_ids.update(cell.as_py() or [])
            if new_ids:
                h = url_hash64_vec(sorted(new_ids))
                self.media_seen = np.unique(
                    np.concatenate([self.media_seen, h])
                )
        self.phase_times["pipeline"] += _time.time() - _t0
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
        ms_path = os.path.join(self.checkpoint_dir, "media_seen.npy")
        np.save(ms_path + ".tmp.npy", self.media_seen)
        os.replace(ms_path + ".tmp.npy", ms_path)
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
