"""Scale-derived shuffle-bucket cardinality.

Every bucketed co-group in the query layer (hash joins, pair counting,
keyed merges, PageRank iterations, …) routes rows through ``key % NB``
before a ``groupby(bucket).map_groups`` finisher. Round 3 shipped NB as
~15 fixed module constants (64 / 1024 / …) — correct and measured-fast at
test scale, but a fixed NB means per-bucket payload grows linearly with
the corpus: at 100 TB a 64-bucket co-group hands ~1.5 TB to ONE task and
caps shuffle parallelism at 64 regardless of cluster size (VERDICT r3,
"What's wrong" #1).

``derive_buckets`` replaces the constants: NB = clamp(floor,
est_input_parquet_bytes // TARGET_PARQUET_BYTES_PER_BUCKET, cap).

- ``floor`` is each site's round-3 measured value (64, or 1024 for the
  basket miner), so behavior and bench numbers at sf0.001–sf0.1 are
  byte-identical to round 3 — the derivation only kicks in past ~1 GiB of
  input per bucket-floor.
- ``TARGET_PARQUET_BYTES_PER_BUCKET`` is 16 MiB of *compressed parquet*;
  with the ~4× decode expansion typical of these tables that lands each
  map_groups task at ~64 MiB of in-memory payload — small enough for any
  worker heap, large enough to amortize per-group overhead (the measured
  singleton-group trap).
- ``MKFC_SHUFFLE_BUCKETS`` overrides everything (one knob for a known
  cluster size, and the test handle for bucket-count-invariance sweeps).

The kernels themselves are bucket-count-invariant (their outputs never
depend on NB, only their partitioning does) — pinned by the oracle sweep
run under two different MKFC_SHUFFLE_BUCKETS overrides and by
tests/test_bucket_invariance.py.
"""

from __future__ import annotations

import os

TARGET_PARQUET_BYTES_PER_BUCKET = 16 << 20  # ~64 MiB decoded per task
BUCKET_CAP = 1 << 20  # runaway backstop; 1M buckets ≈ 16 TiB parquet input
_OVERRIDE_ENV = "MKFC_SHUFFLE_BUCKETS"


def _path_bytes(p: str) -> int:
    if os.path.isdir(p):
        total = 0
        for root, _dirs, files in os.walk(p):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if f.endswith(".parquet")
            )
        return total
    if os.path.exists(p):
        return os.path.getsize(p)
    return 0


def est_table_bytes(sf_dir: str, *tables: str) -> int:
    """On-disk parquet bytes of the named tables — one os.stat per file,
    driver-side, at query-build time (never per batch)."""
    return sum(
        _path_bytes(os.path.join(sf_dir, f"{t}.parquet")) for t in tables
    )


def derive_buckets(
    sf_dir: str,
    *tables: str,
    floor: int,
    bytes_per_bucket: int = TARGET_PARQUET_BYTES_PER_BUCKET,
) -> int:
    """Shuffle-bucket cardinality for a co-group whose payload is
    proportional to the given input tables. See module docstring."""
    override = os.environ.get(_OVERRIDE_ENV)
    if override:
        return max(1, int(override))
    est = est_table_bytes(sf_dir, *tables)
    return int(min(BUCKET_CAP, max(floor, est // bytes_per_bucket)))


def derive_buckets_for_paths(
    *paths: str,
    floor: int,
    bytes_per_bucket: int = TARGET_PARQUET_BYTES_PER_BUCKET,
) -> int:
    """Same derivation for inputs addressed by explicit parquet paths
    (the image-fixture queries, which map sf_dir → a fixture tier dir)."""
    override = os.environ.get(_OVERRIDE_ENV)
    if override:
        return max(1, int(override))
    est = sum(_path_bytes(p) for p in paths)
    return int(min(BUCKET_CAP, max(floor, est // bytes_per_bucket)))
