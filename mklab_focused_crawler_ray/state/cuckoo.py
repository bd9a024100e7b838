"""Cuckoo filter (with a Bloom filter fallback) for the URL-seen set.

The reference keeps an EXACT seen-set in a Redis hash
(bolts/media/StatusCheckBolt.java:59-68). The north rule requires a
cuckoo-filter seen-set with bloom fallback at 10^10-URL scale. Because the
final URL-seen set must match the oracle EXACTLY, shards pair the cuckoo
filter (fast membership, no false negatives) with a partition-local exact
ledger: a cuckoo hit is verified against the ledger so false positives never
change behavior (SURVEY.md §7.4). The filter is still load-bearing — it is
the O(1) first-pass gate that at scale avoids touching the (spilled) ledger
for the overwhelmingly-common miss case.

Implementation: standard 2-choice cuckoo hashing with 4-slot buckets and
16-bit fingerprints (Fan et al., "Cuckoo Filter: Practically Better Than
Bloom", CoNEXT 2014), numpy-backed, serializable for checkpoints.
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import mix64

_FP_BITS = 16
_SLOTS = 4
_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 7):
        # buckets sized to next power of two of capacity/SLOTS at ~95% load
        n_buckets = 1
        while n_buckets * _SLOTS * 0.95 < capacity:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.seed = seed
        self.table = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)  # 0 = empty
        self.count = 0
        self._rng = np.random.default_rng(seed)  # deterministic kick choice

    # -- hashing ----------------------------------------------------------
    def _fp_and_index(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = mix64(np.asarray(keys, dtype=np.uint64) ^ np.uint64(self.seed))
        fp = (h & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # reserve 0 for empty
        i1 = ((h >> np.uint64(16)) % np.uint64(self.n_buckets)).astype(np.int64)
        return fp, i1

    def _alt_index(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # i2 = i XOR hash(fp) — the partial-key cuckoo displacement rule
        fh = mix64(fp.astype(np.uint64) ^ np.uint64(0x5BD1E995))
        return (np.asarray(i, np.uint64) ^ (fh % np.uint64(self.n_buckets))).astype(
            np.int64
        ) % self.n_buckets

    # -- single-key ops ---------------------------------------------------
    def add(self, key: int) -> bool:
        fp_a, i1_a = self._fp_and_index(np.array([key], dtype=np.uint64))
        fp, i1 = int(fp_a[0]), int(i1_a[0])
        i2 = int(self._alt_index(np.array([i1]), np.array([fp], dtype=np.uint16))[0])
        for idx in (i1, i2):
            row = self.table[idx]
            empty = np.where(row == 0)[0]
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        # displace
        idx = i1 if int(self._rng.integers(0, 2)) == 0 else i2
        cur = np.uint16(fp)
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(0, _SLOTS))
            cur, self.table[idx, slot] = self.table[idx, slot], cur
            idx = int(
                self._alt_index(np.array([idx]), np.array([cur], dtype=np.uint16))[0]
            )
            row = self.table[idx]
            empty = np.where(row == 0)[0]
            if empty.size:
                row[empty[0]] = cur
                self.count += 1
                return True
        return False  # table full — caller falls back (bloom / resize)

    def __contains__(self, key: int) -> bool:
        return bool(self.contains_many(np.array([key], dtype=np.uint64))[0])

    # -- vectorized membership (the hot path) -----------------------------
    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        fp, i1 = self._fp_and_index(keys)
        i2 = self._alt_index(i1, fp)
        r1 = self.table[i1]  # (n, SLOTS)
        r2 = self.table[i2]
        return ((r1 == fp[:, None]) | (r2 == fp[:, None])).any(axis=1)

    def delete(self, key: int) -> bool:
        fp_a, i1_a = self._fp_and_index(np.array([key], dtype=np.uint64))
        fp, i1 = int(fp_a[0]), int(i1_a[0])
        i2 = int(self._alt_index(np.array([i1]), np.array([fp], dtype=np.uint16))[0])
        for idx in (i1, i2):
            row = self.table[idx]
            hit = np.where(row == fp)[0]
            if hit.size:
                row[hit[0]] = 0
                self.count -= 1
                return True
        return False

    # -- checkpoint -------------------------------------------------------
    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, capacity: int, seed: int = 7, count: int = 0):
        f = cls(capacity, seed)
        f.table = np.frombuffer(data, dtype=np.uint16).reshape(f.n_buckets, _SLOTS).copy()
        f.count = count
        return f


class BloomFilter:
    """Plain k-hash Bloom filter — the documented fallback when the cuckoo
    filter rejects inserts at extreme load (no deletes, no false negatives)."""

    def __init__(self, capacity: int, fp_rate: float = 1e-3, seed: int = 7):
        m = max(64, int(-capacity * np.log(fp_rate) / (np.log(2) ** 2)))
        self.m = 1 << int(np.ceil(np.log2(m)))
        self.k = max(1, int(round(self.m / max(1, capacity) * np.log(2))))
        self.seed = seed
        self.bits = np.zeros(self.m // 8, dtype=np.uint8)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        h1 = mix64(keys ^ np.uint64(self.seed))
        h2 = mix64(h1 ^ np.uint64(0x9E3779B97F4A7C15))
        i = np.arange(self.k, dtype=np.uint64)
        with np.errstate(over="ignore"):
            pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.m)
        return pos.astype(np.int64)

    def add_many(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(keys)
        got = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return got.all(axis=1).astype(bool)

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()
