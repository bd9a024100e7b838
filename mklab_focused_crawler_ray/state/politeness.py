"""Per-host politeness + robots.txt rules.

The reference's only politeness mechanism is an HTTP connection cap of 10
per route (bolts/FetcherBolt.java:83-85, ``maxPerRoute=10``); it has no
robots.txt handling (SURVEY.md §2.11). The north rule adds both. We model
politeness as a per-host token budget per crawl round (default 10, mirroring
maxPerRoute): a host's URLs beyond the budget deterministically defer to the
next round. Robots rules are prefix-disallow per host, checked at
enqueue-time; disallowed URLs are counted and never enter the frontier.
"""

from __future__ import annotations

from urllib.parse import urlsplit

DEFAULT_PER_HOST_BUDGET = 10  # mirrors maxPerRoute=10, FetcherBolt.java:85


class RobotsCache:
    """Host → list of disallowed path prefixes. In live mode this would be a
    fetch-once-per-host cache with TTL; in offline/synthetic mode rules come
    from the fixture ``robots`` table."""

    def __init__(self, rules: dict[str, list[str]] | None = None):
        self.rules = {h: list(ps) for h, ps in (rules or {}).items()}
        # optional richer per-host RobotsRules (Allow overrides, crawl-delay)
        # populated by robots_cache_from_txt
        self.full_rules: dict[str, "RobotsRules"] = {}

    @classmethod
    def from_table(cls, hosts, prefixes) -> "RobotsCache":
        rules: dict[str, list[str]] = {}
        for h, p in zip(hosts, prefixes):
            rules.setdefault(h, []).append(p)
        return cls(rules)

    def crawl_delay(self, host: str) -> float | None:
        fr = self.full_rules.get(host)
        return fr.crawl_delay if fr is not None else None

    def allowed(self, url: str) -> bool:
        try:
            parts = urlsplit(url)
        except ValueError:
            return False
        host = parts.hostname or ""
        fr = self.full_rules.get(host)
        if fr is not None:
            return fr.allowed(parts.path)
        for prefix in self.rules.get(host, ()):
            if parts.path.startswith(prefix):
                return False
        return True

    def allowed_many(self, urls, hosts) -> list[bool]:
        """Bulk :meth:`allowed` for the frontier hot path. ``hosts`` are the
        callers' already-known per-URL hosts: URLs whose host has NO rules
        short-circuit to allowed without any URL parsing."""
        if not self.rules and not self.full_rules:
            return [True] * len(urls)
        out = []
        has_rules_cache: dict[str, bool] = {}
        for u, h in zip(urls, hosts):
            hr = has_rules_cache.get(h)
            if hr is None:
                hr = h in self.full_rules or h in self.rules
                has_rules_cache[h] = hr
            out.append(self.allowed(u) if hr else True)
        return out


def parse_robots_txt(text: str, agent: str = "mkfc-ray") -> "RobotsRules":
    """RFC 9309-flavored robots.txt parser (public spec): groups of
    ``User-agent`` lines followed by ``Allow``/``Disallow`` rules; the group
    whose user-agent token is the LONGEST case-insensitive substring match
    of our agent wins, with ``*`` as fallback; per-URL decision is
    longest-path-match between the group's allow and disallow rules, allow
    winning ties; empty ``Disallow:`` means allow-all; ``Crawl-delay`` is
    captured per group (non-standard but ubiquitous)."""
    groups: list[dict] = []
    cur: dict | None = None
    expecting_rules = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if cur is None or expecting_rules:
                cur = {"agents": [], "allow": [], "disallow": [], "crawl_delay": None}
                groups.append(cur)
                expecting_rules = False
            cur["agents"].append(value.lower())
        elif cur is not None and field in ("allow", "disallow"):
            expecting_rules = True
            if field == "disallow" and value == "":
                continue  # empty Disallow = allow everything
            cur[field].append(value)
        elif cur is not None and field == "crawl-delay":
            expecting_rules = True
            try:
                cur["crawl_delay"] = float(value)
            except ValueError:
                pass
    # pick the most specific matching group
    al = agent.lower()
    best: dict | None = None
    best_len = -1
    for g in groups:
        for a in g["agents"]:
            if a == "*":
                match_len = 0
            elif a in al:
                match_len = len(a)
            else:
                continue
            if match_len > best_len:
                best, best_len = g, match_len
    if best is None:
        return RobotsRules([], [], None)
    return RobotsRules(best["allow"], best["disallow"], best["crawl_delay"])


def _rule_matcher(rule: str):
    """RFC 9309 §2.2.3 pattern: ``*`` matches any run of characters and a
    trailing ``$`` anchors at end-of-path; everything else is literal.
    Returns a compiled match-from-start regex."""
    import re

    if rule.endswith("$"):
        body, anchor = rule[:-1], "$"
    else:
        body, anchor = rule, ""
    pattern = ".*".join(re.escape(part) for part in body.split("*"))
    return re.compile(pattern + anchor)


class RobotsRules:
    """One agent group's rules with longest-path-match evaluation.

    ``*`` / ``$`` wildcards are honored per RFC 9309 (rule precedence is
    still by raw rule-string length, allow winning exact ties)."""

    def __init__(self, allow: list[str], disallow: list[str], crawl_delay: float | None):
        self.allow = list(allow)
        self.disallow = list(disallow)
        self.crawl_delay = crawl_delay
        self._compiled = [
            (len(r), _rule_matcher(r), True) for r in self.allow
        ] + [(len(r), _rule_matcher(r), False) for r in self.disallow]

    def allowed(self, path: str) -> bool:
        if not path:
            path = "/"
        best_rule_allow = True  # no match → allowed
        best_len = -1
        for rule_len, rx, is_allow in self._compiled:
            if rx.match(path) is not None and rule_len >= best_len:
                # allow wins exact-length ties (RFC 9309 §2.2.2)
                if rule_len > best_len or is_allow:
                    best_rule_allow = is_allow
                    best_len = rule_len
        return best_rule_allow

    def disallow_prefixes(self) -> list[str]:
        """Literal disallow values — only a valid prefix fast-path when no
        rule contains ``*``/``$`` (RobotsCache.allowed prefers the full
        rules whenever they exist, so this is fixture-table-only)."""
        return list(self.disallow)


def effective_host_budget(
    base_budget: int, crawl_delay_s: float | None, round_duration_ms: int
) -> int:
    """Per-host per-round budget honoring robots crawl-delay: with a
    round_duration_ms logical clock, a host asking for ``crawl-delay: D``
    seconds gets at most ``round_duration_ms / (D*1000)`` fetches per round
    (min 1 so progress is guaranteed), capped by the configured budget."""
    if not crawl_delay_s or crawl_delay_s <= 0 or round_duration_ms <= 0:
        if crawl_delay_s and crawl_delay_s > 0 and round_duration_ms <= 0:
            import warnings

            warnings.warn(
                "robots crawl-delay present but round_duration_ms=0: "
                "delay is a no-op; set CrawlConfig.round_duration_ms",
                stacklevel=2,
            )
        return base_budget
    return min(base_budget, max(1, int(round_duration_ms / (crawl_delay_s * 1000.0))))


def robots_cache_from_txt(
    host_to_txt: dict[str, str], agent: str = "mkfc-ray"
) -> RobotsCache:
    """Build the frontier's RobotsCache from raw robots.txt bodies. The
    cache keeps the full rules object so Allow overrides work; hosts with
    unparsable/empty robots default to allow-all."""
    cache = RobotsCache()
    cache.full_rules = {
        h: parse_robots_txt(t, agent) for h, t in host_to_txt.items()
    }
    # keep the prefix table too (fast path for simple fixture rules)
    cache.rules = {
        h: r.disallow_prefixes() for h, r in cache.full_rules.items()
    }
    return cache


def salt_quota(budget: int, n_salts: int, salt: int) -> int:
    """Split a per-host round budget exactly across ``n_salts`` sub-queues:
    quota_i = budget//n + (1 if i < budget%n else 0); the quotas sum to the
    budget so salting never exceeds the host's politeness cap."""
    base, rem = divmod(budget, n_salts)
    return base + (1 if salt < rem else 0)
