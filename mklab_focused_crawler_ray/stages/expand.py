"""URL expansion + media/webpage routing (the URLExpansionBolt port).

Reference semantics (bolts/webpages/URLExpansionBolt.java):
- follow at most 4 redirect hops (:30; live mode reads Location headers with
  a 2 s timeout, :110-134); more hops → expansion failure. The reference
  silently drops failures (:85-98); we keep the row with
  ``status='expand_failed'`` (SURVEY §4: auditability).
- sets expanded_url + domain (host of the expanded URL, :62-71)
- routes by host: the 6-host social set → 'media', else 'webpage' (:42-47,76-81)

Offline/synthetic mode (this sandbox): expansion is a lookup against the
fixture redirect map, broadcast once via ``ray.put`` and resolved inside the
stage — a pure vectorizable function, no network.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.urls import MAX_REDIRECTS, host_of, route_of_host


def expand_url(url: str, redirect_map: dict[str, str]) -> tuple[str, str]:
    """Follow ≤4 hops. Returns (expanded_url, status): status is 'ok' or
    'expand_failed' (too many redirects → the reference's failure path)."""
    cur = url
    for _ in range(MAX_REDIRECTS):
        nxt = redirect_map.get(cur)
        if nxt is None:
            return cur, "ok"
        cur = nxt
    if cur in redirect_map:
        return cur, "expand_failed"
    return cur, "ok"


def make_expander(redirect_map_ref):
    """Task-based ``map_batches`` stage factory (the round loop uses this —
    no per-round actor spawn; the redirect map is small, so the per-task
    ``ray.get`` is cheap and worker-local after the first task)."""

    def expander(batch: pa.Table) -> pa.Table:
        import ray

        redirects: dict[str, str] = ray.get(redirect_map_ref)
        urls = batch["url"].to_pylist()
        expanded, hosts, routes, statuses = [], [], [], []
        for u in urls:
            e, st = expand_url(u, redirects)
            h = host_of(e)
            expanded.append(e)
            hosts.append(h)
            routes.append(route_of_host(h))
            statuses.append(st)
        return (
            batch.append_column("expanded_url", pa.array(expanded, pa.string()))
            .append_column("expanded_host", pa.array(hosts, pa.string()))
            .append_column("route", pa.array(routes, pa.string()))
            .append_column("status", pa.array(statuses, pa.string()))
        )

    return expander
