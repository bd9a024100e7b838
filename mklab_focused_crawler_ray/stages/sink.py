"""Keyed-merge sinks — the updater/indexer bolt family re-expressed.

Reference semantics:
- ``WebPagesUpdaterBolt`` upserts by ``url`` (bolts/webpages/
  WebPagesUpdaterBolt.java:70-92); ``MediaUpdaterBolt`` upserts by ``id``
  (bolts/media/MediaUpdaterBolt.java:83-126). Both are last-write-wins
  keyed merges into an external store.
- ``TextIndexerBolt`` et al. are batched bulk writes (:44,66-102) — Ray
  Data's ``write_parquet`` already writes one file per block, so the
  batching is inherent.

Ray-native design: hash-bucket the key into ``n_buckets`` partitions so
(a) the upsert dedup shuffles by bucket, not globally, and (b) merge-on-
read prunes to one bucket per key lookup. Output layout::

    out_dir/bucket=K/*.parquet        one directory per bucket → resumable

``keyed_merge_write`` = dedup within the incoming dataset (last-wins by
``version_col``, or max key order) then partitioned write.
``read_upserted`` = read N such generations and collapse to the latest row
per key — merge-on-read compaction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.urls import url_hash64_vec


def _with_bucket(key: str, n_buckets: int):
    def add_bucket(batch: pa.Table) -> pa.Table:
        kh = url_hash64_vec(batch[key].cast(pa.string()).to_pylist())
        return batch.append_column(
            "bucket", pa.array((kh % np.uint64(n_buckets)).astype(np.int64), pa.int64())
        )

    return add_bucket


def _row_digest(g: pd.DataFrame) -> pd.Series:
    """Deterministic per-row content hash — the secondary tie-break so rows
    that tie on the version column resolve the same way in every run
    (block-arrival order is nondeterministic across distributed runs)."""
    import hashlib

    return pd.Series(
        [
            int.from_bytes(
                hashlib.md5(
                    "|".join(str(v) for v in row).encode()
                ).digest()[:8],
                "big",
            )
            for row in g.itertuples(index=False)
        ],
        index=g.index,
        dtype=np.uint64,
    )


def _latest_per_key(key: str, version_col: str | None):
    def latest(g: pd.DataFrame) -> pd.DataFrame:
        order = [version_col] if version_col is not None else []
        g = g.assign(_digest=_row_digest(g)).sort_values(
            order + ["_digest"], kind="stable"
        )
        return g.tail(1).drop(columns=["_digest"])

    return latest


def keyed_merge_write(
    ds,
    key: str,
    out_dir: str,
    version_col: str | None = None,
    n_buckets: int = 16,
) -> str:
    """Upsert-shaped write: last-wins dedup per key (within this dataset)
    then parquet partitioned by key-hash bucket."""
    deduped = (
        ds.map_batches(_with_bucket(key, n_buckets), batch_format="pyarrow")
        .groupby(key)
        .map_groups(_latest_per_key(key, version_col), batch_format="pandas")
    )
    deduped.write_parquet(out_dir, partition_cols=["bucket"])
    return out_dir


def read_upserted(
    dirs: list[str], key: str, version_col: str | None = None
):
    """Merge-on-read across generations (earlier dirs = older): the latest
    row per key wins. ``dirs`` order supplies recency when ``version_col``
    is None (a ``_gen`` column is injected from the ordering)."""
    import ray.data as rd

    gens = []
    for gen, d in enumerate(dirs):
        ds = rd.read_parquet(d)
        ds = ds.map_batches(
            lambda b, g=gen: b.append_column(
                "_gen", pa.array([g] * len(b), pa.int64())
            ),
            batch_format="pyarrow",
        )
        gens.append(ds)
    merged = gens[0]
    for ds in gens[1:]:
        merged = merged.union(ds)
    vcol = version_col or "_gen"

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(_digest=_row_digest(g)).sort_values(
            [vcol, "_digest"], kind="stable"
        )
        return g.tail(1).drop(columns=["_digest"])

    return (
        merged.groupby(key)
        .map_groups(latest, batch_format="pandas")
        .drop_columns(["_gen"])
    )
