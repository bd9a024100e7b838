"""Vectorized Bloom filter over int64 keys — the broadcast pre-filter a
100-TB semi-join uses when the build-side key set is too large to ship as
an exact sorted array (the scale path the ``urgent_lineitem_semijoin``
docstring promises; reference lineage: the cuckoo/bloom URL-seen gate of
``bolts/StatusCheckBolt.java`` generalized to join pre-filtering).

Design: ``k`` independent hash positions per key derived from one
splitmix64-style avalanche (numpy uint64 arithmetic, fully vectorized —
no per-row Python), bit array packed into uint64 words so a filter for
10^9 keys at 16 bits/key is ~2 GB: `ray.put` once, zero-copy view in
every probe task. False negatives are impossible; false positives are
removed by the exact verify stage downstream.
"""

from __future__ import annotations

import numpy as np

# splitmix64 constants (public domain PRNG finalizer — standard avalanche)
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer on uint64 lanes, salted per hash index."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(salt) * _SM_GAMMA
        z = (z ^ (z >> np.uint64(30))) * _SM_M1
        z = (z ^ (z >> np.uint64(27))) * _SM_M2
        return z ^ (z >> np.uint64(31))


def bloom_m_bits(n_keys: int, bits_per_key: int = 16) -> int:
    """Bit-array size for ``n_keys``: the power of two ≥ bits_per_key × n
    (a power of two so the position mask is a single AND). Exposed so a
    DISTRIBUTED build can fix m up front (from a metadata row count) and
    OR per-block partial bitmaps together."""
    return 1 << int(np.ceil(np.log2(max(64, bits_per_key * max(1, n_keys)))))


def bloom_add(words: np.ndarray, m: int, keys: np.ndarray, k: int = 4) -> None:
    """Set the k bit positions of each key in an existing m-bit filter
    (in place). Partial bitmaps built this way with the same m compose by
    bitwise OR — the map-side half of a distributed bloom build."""
    x = keys.astype(np.int64).view(np.uint64)
    for i in range(k):
        pos = _mix(x, i + 1) & np.uint64(m - 1)
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))


def make_bloom(keys: np.ndarray, bits_per_key: int = 16, k: int = 4) -> tuple[np.ndarray, int]:
    """Build the filter → (uint64 word array, m_bits)."""
    m = bloom_m_bits(len(keys), bits_per_key)
    words = np.zeros(m // 64, dtype=np.uint64)
    bloom_add(words, m, keys, k)
    return words, m


def bloom_contains(words: np.ndarray, m: int, keys: np.ndarray, k: int = 4) -> np.ndarray:
    """Vectorized membership test → bool mask (no false negatives)."""
    x = keys.astype(np.int64).view(np.uint64)
    out = np.ones(len(keys), dtype=bool)
    for i in range(k):
        pos = _mix(x, i + 1) & np.uint64(m - 1)
        bit = (words[(pos >> np.uint64(6)).astype(np.int64)]
               >> (pos & np.uint64(63))) & np.uint64(1)
        out &= bit.astype(bool)
    return out
