"""Java-``String.hashCode``-compatible hashing.

The reference builds media ids as ``"Web#" + (url.hashCode() & 0x7FFFFFFF)``
(reference: bolts/webpages/ArticleExtractionBolt.java:448-450). To keep
extraction outputs byte-comparable we reproduce Java's hash exactly:

    h = s[0]*31^(n-1) + s[1]*31^(n-2) + ... + s[n-1]   (int32 overflow)

Vectorized per string with numpy Horner over UTF-16 code units (Java hashes
UTF-16 chars; for BMP-only strings these equal the code points).
"""

from __future__ import annotations

import numpy as np

_U32 = np.uint32(0xFFFFFFFF)


def java_string_hashcode(s: str) -> int:
    """Exact Java String.hashCode() as a signed 32-bit int."""
    h = np.uint32(0)
    thirty_one = np.uint32(31)
    # UTF-16 code units, matching Java's char[] view of the string.
    units = np.frombuffer(s.encode("utf-16-le"), dtype="<u2").astype(np.uint32)
    with np.errstate(over="ignore"):
        for c in units:
            h = h * thirty_one + c
    return int(np.int32(h))


def web_media_id(url: str) -> str:
    """``"Web#" + (hashCode & 0x7FFFFFFF)`` — the reference's content-image id
    (ArticleExtractionBolt.java:448-450)."""
    return "Web#%d" % (java_string_hashcode(url) & 0x7FFFFFFF)


def java_hashcodes(strings) -> np.ndarray:
    """Vectorized Java hashCode for an iterable of strings → int32 ndarray.

    Packs all strings into one flat uint32 array and runs one Horner pass per
    distinct length group, so the per-string Python overhead is O(1).
    """
    strs = list(strings)
    n = len(strs)
    out = np.zeros(n, dtype=np.int32)
    if n == 0:
        return out
    units_list = [
        np.frombuffer(s.encode("utf-16-le"), dtype="<u2").astype(np.uint32)
        for s in strs
    ]
    lengths = np.array([len(u) for u in units_list], dtype=np.int64)
    maxlen = int(lengths.max(initial=0))
    if maxlen == 0:
        return out
    # Right-align into (n, maxlen): h = sum(c_i * 31^(n-1-i)); right-aligned
    # padding with zeros contributes nothing when we multiply-accumulate
    # left-to-right starting from the first real char — use left-aligned pad
    # with per-row final multiply instead: simpler is a masked Horner.
    mat = np.zeros((n, maxlen), dtype=np.uint32)
    for i, u in enumerate(units_list):
        mat[i, : len(u)] = u
    h = np.zeros(n, dtype=np.uint32)
    thirty_one = np.uint32(31)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            active = j < lengths
            h = np.where(active, h * thirty_one + mat[:, j], h)
    return h.astype(np.int32)


def web_media_ids(urls) -> list[str]:
    hashes = java_hashcodes(urls).astype(np.int64) & 0x7FFFFFFF
    return ["Web#%d" % v for v in hashes]
