"""Pure-Python single-threaded crawl oracle (SURVEY.md §5.2).

Independent reimplementation of the crawl semantics — plain dicts, one
global greedy scheduler — that the distributed Ray engine must match
EXACTLY on (a) per-round crawl ordering and (b) the final URL-seen set,
under the same seed list + politeness budget (north rule). It reuses only
the deterministic per-row pure functions (score formula, redirect
expansion, fetch/extract row semantics, hashing) and none of the sharded
frontier machinery.

Selection rule (provably what the sharded propose/commit protocol computes):
iterate pending URLs in (score desc, url asc) order; select a URL iff its
(host, salt) count this round is below salt_quota(per_host_budget,
n_salts(host), salt) and the global round budget is not exhausted.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.scoring import webpage_score
from ..functions.urls import host_of, route_of_host, url_hash64
from ..state.frontier import build_salt_map, n_salts_for, salt_of
from ..state.politeness import RobotsCache, salt_quota
from ..stages.expand import expand_url
from ..stages.fetch import fetch_and_extract_row
from .config import CrawlConfig

import numpy as np


def _score_one(shares: int, date_ms: int, now_ms: int) -> float:
    return float(webpage_score(np.array([shares]), np.array([date_ms]), now_ms)[0])


class CrawlOracle:
    def __init__(
        self,
        fixture: dict[str, pa.Table],
        config: CrawlConfig,
        robots: RobotsCache | None = None,
    ):
        self.cfg = config
        self.seeds = fixture["frontier_seed"]
        self.redirects = dict(
            zip(
                fixture["redirects"]["src"].to_pylist(),
                fixture["redirects"]["dst"].to_pylist(),
            )
        )
        pages = fixture["pages"]
        self.page_store = {
            u: (sc, ct, html)
            for u, sc, ct, html in zip(
                pages["url"].to_pylist(),
                pages["status_code"].to_pylist(),
                pages["content_type"].to_pylist(),
                pages["html"].to_pylist(),
            )
        }
        uni = fixture["urls"]
        self.meta = {
            u: (int(s), int(d))
            for u, s, d in zip(
                uni["url"].to_pylist(),
                uni["shares"].to_pylist(),
                uni["date"].cast(pa.int64()).to_pylist(),
            )
        }
        if robots is not None:
            self.robots = robots
        else:
            rob = fixture["robots"]
            self.robots = RobotsCache.from_table(
                rob["host"].to_pylist(), rob["disallow_prefix"].to_pylist()
            )
        # static salt map from the seed host distribution (same rule as engine)
        counts: dict[str, int] = {}
        for d in self.seeds["domain"].to_pylist():
            counts[d] = counts.get(d, 0) + 1
        self.salt_map = build_salt_map(counts, config.hot_threshold, config.max_salts)

        self.pending: dict[str, tuple[float, str, int]] = {}  # url -> (score, host, salt)
        self.seen: dict[int, int] = {}  # url_hash -> seen_at_ms
        self.trace: list[tuple[int, int, str]] = []
        self.fetched_pages: list[dict] = []
        self.counters = {
            "enqueued": 0,
            "dup_pending": 0,
            "dup_seen": 0,
            "robots_denied": 0,
            "scheduled": 0,
        }

    # -- helpers ----------------------------------------------------------
    def _is_seen(self, h: int, now_ms: int) -> bool:
        at = self.seen.get(h)
        if at is None:
            return False
        if self.cfg.seen_ttl_ms is not None and now_ms - at >= self.cfg.seen_ttl_ms:
            return False
        return True

    def _enqueue(self, url: str, shares: int, date_ms: int, now_ms: int) -> None:
        if url in self.pending:
            self.counters["dup_pending"] += 1
            return
        if self._is_seen(url_hash64(url), now_ms):
            self.counters["dup_seen"] += 1
            return
        if not self.robots.allowed(url):
            self.counters["robots_denied"] += 1
            return
        host = host_of(url)
        ns = n_salts_for(host, self.salt_map)
        salt = salt_of(url_hash64(url), ns)
        score = _score_one(shares, date_ms, self.cfg.now_ms)
        self.pending[url] = (score, host, salt)
        self.counters["enqueued"] += 1

    def _enqueue_known(self, url: str, now_ms: int) -> None:
        shares, date_ms = self.meta.get(url, (0, self.cfg.now_ms))
        self._enqueue(url, shares, date_ms, now_ms)

    # -- rounds -----------------------------------------------------------
    def run(self) -> dict:
        cfg = self.cfg
        now = cfg.now_ms
        # seed enqueue, in seed-row order
        for u, s, d in zip(
            self.seeds["url"].to_pylist(),
            self.seeds["shares"].to_pylist(),
            self.seeds["date"].cast(pa.int64()).to_pylist(),
        ):
            self._enqueue(u, int(s), int(d), now)

        for rnd in range(cfg.max_rounds):
            now = cfg.now_ms + rnd * cfg.round_duration_ms  # logical clock
            if not self.pending:
                break
            order = sorted(self.pending.items(), key=lambda kv: (-kv[1][0], kv[0]))
            host_counts: dict[tuple[str, int], int] = {}
            selected: list[str] = []
            for url, (score, host, salt) in order:
                if len(selected) >= cfg.round_budget:
                    break
                from ..state.politeness import effective_host_budget

                host_budget = effective_host_budget(
                    cfg.per_host_budget,
                    self.robots.crawl_delay(host),
                    cfg.round_duration_ms,
                )
                quota = salt_quota(
                    host_budget, n_salts_for(host, self.salt_map), salt
                )
                key = (host, salt)
                if host_counts.get(key, 0) >= quota:
                    continue
                host_counts[key] = host_counts.get(key, 0) + 1
                selected.append(url)
            # commit: mark seen, record trace
            for rank, url in enumerate(selected):
                del self.pending[url]
                self.seen[url_hash64(url)] = now
                self.trace.append((rnd, rank, url))
                self.counters["scheduled"] += 1
            # process
            discovered: list[str] = []
            for url in selected:
                expanded, st = expand_url(url, self.redirects)
                if expanded != url and st == "ok":
                    eh = url_hash64(expanded)
                    if self._is_seen(eh, now):
                        self.fetched_pages.append(
                            {"round": rnd, "url": url, "status": "dup_after_expand"}
                        )
                        continue
                    self.seen[eh] = now
                    # first-wins across redirect aliases: cancel the target
                    # if it is independently pending (mirrors shard mark_seen)
                    self.pending.pop(expanded, None)
                host = host_of(expanded)
                r = fetch_and_extract_row(
                    expanded, route_of_host(host), st, self.page_store
                )
                self.fetched_pages.append(
                    {
                        "round": rnd,
                        "url": url,
                        "expanded_url": expanded,
                        "status": r["status"],
                        "title": r["title"],
                        "text": r["text"],
                        "is_article": r["is_article"],
                        "media_thumbnail": r["media_thumbnail"],
                        "media": r["media"],
                        "n_out_links": len(r["out_links"]),
                    }
                )
                discovered.extend(r["out_links"])
            for u in discovered:
                self._enqueue_known(u, now)

        seen_hashes = sorted(self.seen.keys())
        return {
            "trace": self.trace,
            "seen_hashes": seen_hashes,
            "pages": self.fetched_pages,
            "counters": self.counters,
            "salt_map": self.salt_map,
        }
