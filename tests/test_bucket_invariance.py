"""Bucket-count invariance (VERDICT r3 'What's wrong' #1 → 'Next round' #1).

Every bucketed co-group now derives its shuffle cardinality from input
size via scale.derive_buckets (floored at the round-3 measured values,
overridable with MKFC_SHUFFLE_BUCKETS). The kernels must be
bucket-count-INVARIANT: the query output never depends on how many
buckets the shuffle used. These tests pin that property by running
representative bucketed queries at two adversarial cardinalities (1 and
a prime) and comparing to the default.

The full-registry version of this check is the oracle sweep run under
MKFC_SHUFFLE_BUCKETS overrides (scripts/oracle_sweep.py; recorded in
BASELINE.md) — these tests keep a fast in-suite witness.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from mklab_focused_crawler_ray import scale

SF = "/root/testdata/sf0.001"

# one query per bucketed-kernel family: sessionization, shuffle-hash join,
# per-user mode, basket pair mining, bucketed co-group share, chunk dedup
CASES = [
    ("queries", "q_user_sessions"),
    ("queries_ml", "q_orders_join_nation"),
    ("queries_ml2", "q_user_top_event"),
    ("queries_ml3", "q_part_pair_support"),
    ("queries_ml3", "q_nation_region_share"),
    ("queries_ml3", "q_chunk_dedup_groups"),
]


def _run(mod_name: str, fn_name: str) -> pd.DataFrame:
    import importlib

    mod = importlib.import_module(
        f"mklab_focused_crawler_ray.pipelines.{mod_name}"
    )
    res = getattr(mod, fn_name)(SF)
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("mod_name,fn_name", CASES)
def test_output_invariant_across_bucket_counts(ray_session, mod_name, fn_name):
    old = os.environ.pop("MKFC_SHUFFLE_BUCKETS", None)
    try:
        base = _run(mod_name, fn_name)
        for nb in ("1", "13"):
            os.environ["MKFC_SHUFFLE_BUCKETS"] = nb
            got = _run(mod_name, fn_name)
            pd.testing.assert_frame_equal(got, base)
    finally:
        os.environ.pop("MKFC_SHUFFLE_BUCKETS", None)
        if old is not None:
            os.environ["MKFC_SHUFFLE_BUCKETS"] = old


def test_derive_buckets_floor_and_derivation(tmp_path):
    # empty dir → floor
    assert scale.derive_buckets(str(tmp_path), "lineitem", floor=64) == 64
    # synthetic big file → derived count
    p = tmp_path / "lineitem.parquet"
    p.write_bytes(b"\0" * (5 * scale.TARGET_PARQUET_BYTES_PER_BUCKET))
    assert scale.derive_buckets(str(tmp_path), "lineitem", floor=2) == 5
    # floor wins when derived is smaller
    assert scale.derive_buckets(str(tmp_path), "lineitem", floor=64) == 64
    # cap bounds runaway derivation
    assert (
        scale.derive_buckets(
            str(tmp_path), "lineitem", floor=2, bytes_per_bucket=1
        )
        == scale.BUCKET_CAP
    )


def test_derive_buckets_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv("MKFC_SHUFFLE_BUCKETS", "97")
    assert scale.derive_buckets(str(tmp_path), "lineitem", floor=64) == 97
    assert scale.derive_buckets_for_paths(str(tmp_path), floor=64) == 97


def test_derive_buckets_for_paths_sums_dir_and_file(tmp_path):
    d = tmp_path / "shard.parquet"
    d.mkdir()
    (d / "part0.parquet").write_bytes(b"\0" * scale.TARGET_PARQUET_BYTES_PER_BUCKET)
    f = tmp_path / "solo.parquet"
    f.write_bytes(b"\0" * (2 * scale.TARGET_PARQUET_BYTES_PER_BUCKET))
    assert scale.derive_buckets_for_paths(str(d), str(f), floor=1) == 3
