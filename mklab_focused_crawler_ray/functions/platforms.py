"""Platform media-URL regex dispatch — MediaExtractionBolt port.

The seven compiled patterns and their capture-group semantics follow
``bolts/webpages/MediaExtractionBolt.java:40-46`` verbatim (including the
unescaped ``?`` quirks in the youtube/facebook patterns, which Java regex
treats as optional preceding char — reproduced faithfully here since Python
``re`` has the same semantics for ``h?`` style tokens; the practical effect
is the patterns match with or without the literal ``?``).

At HEAD every platform Retriever registration is commented out
(``:60-76``), so extraction yields the media id + platform only and the
item passes through — we mirror that: :func:`match_platform` returns
``(platform, media_id)`` or ``None``; the retriever hook stays a no-op.
"""

from __future__ import annotations

import re

PLATFORM_PATTERNS: list[tuple[str, re.Pattern]] = [
    ("instagram", re.compile(r"https*://instagram\.com/p/([\w\-]+)/")),
    (
        "youtube",
        re.compile(r"https*://www\.youtube\.com/watch?.*v=([a-zA-Z0-9_\-]+)(&.+=.+)*"),
    ),
    ("vimeo", re.compile(r"https*://vimeo\.com/([0-9]+)/*$")),
    ("twitpic", re.compile(r"https*://twitpic\.com/([A-Za-z0-9]+)/*.*$")),
    (
        "dailymotion",
        re.compile(r"https*://www\.dailymotion\.com/video/([A-Za-z0-9]+)_.*$"),
    ),
    (
        "facebook",
        re.compile(r"https*://www\.facebook\.com/photo\.php?.*fbid=([a-zA-Z0-9_\-]+)(&.+=.+)*"),
    ),
    (
        "flickr",
        re.compile(r"https*://flickr\.com/photos/([A-Za-z0-9@]+)/([A-Za-z0-9@]+)/*.*$"),
    ),
]


def match_platform(url: str) -> tuple[str, str] | None:
    """(platform, media_id) for a recognized platform URL, else None —
    MediaExtractionBolt.java:83-98 dispatch order."""
    for name, pat in PLATFORM_PATTERNS:
        m = pat.match(url)
        if m:
            return name, m.group(1)
    return None


def extract_platform_batch(urls: list[str]) -> tuple[list[str], list[str]]:
    """Vectorized-ish helper: parallel lists (platform, media_id); empty
    strings where no platform matched (row passes through unchanged, the
    reference's null-retriever path, MediaExtractionBolt.java:100-117)."""
    plats, ids = [], []
    for u in urls:
        m = match_platform(u)
        if m is None:
            plats.append("")
            ids.append("")
        else:
            plats.append(m[0])
            ids.append(m[1])
    return plats, ids


class Retriever:
    """Per-platform media/user enrichment hook — the interface
    ``MediaExtractionBolt.java:172-197`` dispatches to (every registration
    is commented out at reference HEAD, ``:60-76``, so the default registry
    is empty and extraction passes items through unchanged).

    A deployment registers callables keyed by platform name; each receives
    ``(platform, media_id, url)`` and returns an enrichment dict (merged
    into the row) or None (pass-through). Designed to be held INSIDE an
    actor-pool stage: construct once in ``__init__`` (API clients live
    there), call per batch."""

    def __init__(self, registry: dict | None = None, user_registry: dict | None = None):
        self.registry = dict(registry or {})  # platform → media callable
        self.user_registry = dict(user_registry or {})  # platform → user callable

    def enrich(self, platform: str, media_id: str, url: str) -> dict | None:
        fn = self.registry.get(platform)
        if fn is None:
            return None  # null-retriever pass-through (reference HEAD)
        return fn(platform, media_id, url)

    def enrich_batch(self, plats: list[str], ids: list[str], urls: list[str]):
        return [self.enrich(p, m, u) for p, m, u in zip(plats, ids, urls)]

    def get_stream_user(self, platform: str, user_id) -> dict | None:
        """``retriever.getStreamUser(userid)`` — per-platform user lookup
        (``MediaExtractionBolt.java:183``)."""
        fn = self.user_registry.get(platform)
        return None if fn is None else fn(user_id)

    def resolve_user(self, platform: str, item: dict) -> dict | None:
        """``MediaExtractionBolt.java:181-190``: a media item that already
        carries both ``user`` and ``user_id`` passes through; otherwise the
        user is looked up via :meth:`get_stream_user`, and an item whose
        user cannot be resolved is DROPPED (the reference throws → null).
        The surviving item's (user, user_id) are set from the lookup —
        ``MediaUpdaterBolt`` then first-wins-inserts that user into the
        StreamUsers side table (pipelines/queries_media.py
        ``q_media_stream_users``)."""
        if item.get("user") is not None and item.get("user_id") is not None:
            return item
        user = self.get_stream_user(platform, item.get("user_id"))
        if user is None:
            return None
        out = dict(item)
        out["user"] = user
        out["user_id"] = user.get("id")
        return out
