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
    """Vectorized FNV-1a over strings → uint64 ndarray. Runs over the Arrow
    string buffers (one contiguous uint8 view + offsets) so the cost is
    O(total bytes) of numpy work with no per-row Python objects."""
    import pyarrow as pa

    if isinstance(urls, (pa.Array, pa.ChunkedArray)):
        arr = (
            urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls
        ).cast(pa.large_string())
    else:
        urls = list(urls)
        if len(urls) == 0:
            return np.empty(0, dtype=np.uint64)
        arr = pa.array(urls, pa.large_string())
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    starts = offsets[:-1]
    lengths = offsets[1:] - starts
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    maxlen = int(lengths.max(initial=0))
    idx_all = np.arange(n)
    with np.errstate(over="ignore"):
        j = 0
        active = idx_all
        while j < maxlen:
            active = active[lengths[active] > j]
            b = data[starts[active] + j].astype(np.uint64)
            h[active] = (h[active] ^ b) * prime
            j += 1
    return h


def route_of_host(host: str) -> str:
    """"media" when host is in the reference's hard-coded social set, else
    "webpage" — URLExpansionBolt.java:76-81."""
    return "media" if host in SOCIAL_MEDIA_HOSTS else "webpage"
