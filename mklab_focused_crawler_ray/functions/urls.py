"""URL utilities: domain extraction, routing, stable url hashing.

Reference semantics:
- domain = ``new URL(url).getHost()`` (bolts/webpages/URLExpansionBolt.java:67-68)
- social-media routing set (URLExpansionBolt.java:42-47): traffic to these 6
  hosts goes to the "media" stream, everything else to "webpage"
  (URLExpansionBolt.java:76-81).
- max 4 redirect hops (URLExpansionBolt.java:30); failures silently dropped
  (we keep a status column instead of dropping rows — SURVEY §4).
- fetcher skips URLs longer than 300 chars (bolts/FetcherBolt.java:194);
  extraction drops media URLs longer than 500 chars
  (ArticleExtractionBolt.java:70,427-428).
"""

from __future__ import annotations

from urllib.parse import urlsplit

import numpy as np

SOCIAL_MEDIA_HOSTS = frozenset(
    {
        "vimeo.com",
        "instagram.com",
        "www.youtube.com",
        "twitpic.com",
        "dailymotion.com",
        "www.facebook.com",
    }
)  # URLExpansionBolt.java:42-47

MAX_REDIRECTS = 4  # URLExpansionBolt.java:30
MAX_FETCH_URL_LEN = 300  # FetcherBolt.java:194
MAX_MEDIA_URL_LEN = 500  # ArticleExtractionBolt.java:70

# Multi-label public suffixes we recognise for "registered domain" purposes.
# (The reference has no registered-domain logic at all — partitioning by
# registered domain is a north-rule addition; this tiny suffix set covers the
# synthetic corpus and common real cases without a full PSL dependency.)
_TWO_LABEL_SUFFIXES = frozenset(
    {"co.uk", "ac.uk", "gov.uk", "co.jp", "com.au", "com.br", "co.in", "org.uk"}
)


def host_of(url: str) -> str:
    """Hostname of a URL ('' on parse failure) — URL.getHost() semantics."""
    try:
        return urlsplit(url).hostname or ""
    except ValueError:
        return ""


def registered_domain(host: str) -> str:
    """eTLD+1-ish registered domain — the frontier/politeness partition key.

    ``www.a.example.com`` → ``example.com``; ``a.b.co.uk`` → ``b.co.uk``.
    """
    if not host:
        return ""
    parts = host.lower().split(".")
    if len(parts) <= 2:
        return host.lower()
    if ".".join(parts[-2:]) in _TWO_LABEL_SUFFIXES:
        return ".".join(parts[-3:])
    return ".".join(parts[-2:])


def url_hash64(url: str) -> int:
    """Stable unsigned 64-bit hash of a URL (FNV-1a). Keys the seen-set."""
    h = 0xCBF29CE484222325
    for b in url.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def url_hash64_vec(urls) -> np.ndarray:
    """Vectorized FNV-1a over a list of strings → uint64 ndarray."""
    strs = list(urls)
    n = len(strs)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    bufs = [np.frombuffer(s.encode("utf-8"), dtype=np.uint8) for s in strs]
    lengths = np.array([len(b) for b in bufs], dtype=np.int64)
    maxlen = int(lengths.max(initial=0))
    mat = np.zeros((n, maxlen), dtype=np.uint64)
    for i, b in enumerate(bufs):
        mat[i, : len(b)] = b
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            active = j < lengths
            nh = (h ^ mat[:, j]) * prime
            h = np.where(active, nh, h)
    return h


def route_of_host(host: str) -> str:
    """"media" when host is in the reference's hard-coded social set, else
    "webpage" — URLExpansionBolt.java:76-81."""
    return "media" if host in SOCIAL_MEDIA_HOSTS else "webpage"
