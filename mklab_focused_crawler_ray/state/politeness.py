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

    @classmethod
    def from_table(cls, hosts, prefixes) -> "RobotsCache":
        rules: dict[str, list[str]] = {}
        for h, p in zip(hosts, prefixes):
            rules.setdefault(h, []).append(p)
        return cls(rules)

    def allowed(self, url: str) -> bool:
        try:
            parts = urlsplit(url)
        except ValueError:
            return False
        host = parts.hostname or ""
        for prefix in self.rules.get(host, ()):
            if parts.path.startswith(prefix):
                return False
        return True


def salt_quota(budget: int, n_salts: int, salt: int) -> int:
    """Split a per-host round budget exactly across ``n_salts`` sub-queues:
    quota_i = budget//n + (1 if i < budget%n else 0); the quotas sum to the
    budget so salting never exceeds the host's politeness cap."""
    base, rem = divmod(budget, n_salts)
    return base + (1 if salt < rem else 0)
