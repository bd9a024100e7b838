"""Property-based and fragmentation-invariance tests for the queries_ml3
kernels: the `_ed1` verifier against a reference DP edit distance, the
Bloom filter's no-false-negative guarantee under arbitrary key sets, the
Morton interleave's bijectivity on its bit range, and block-fragmentation
invariance (heavily split inputs must give bit-identical results) for the
bucketed wave-5..8 operators."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st


# --------------------------------------------------------------------------
# _ed1 vs reference DP edit distance
# --------------------------------------------------------------------------


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="abc", min_size=0, max_size=6),
    st.text(alphabet="abc", min_size=0, max_size=6),
)
def test_ed1_matches_dp_levenshtein(a, b):
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import _ed1

    if a == b:
        return  # _ed1's contract: inputs are distinct
    assert _ed1(a, b) == (_levenshtein(a, b) == 1)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcd", min_size=1, max_size=8), st.data())
def test_ed1_blocking_is_complete(base, data):
    """Any string within one edit of `base` must share a deletion variant
    with it — the invariant the SymSpell blocking relies on."""
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import _ed1

    op = data.draw(st.sampled_from(["sub", "ins", "del"]))
    i = data.draw(st.integers(0, max(0, len(base) - 1)))
    c = data.draw(st.sampled_from("abcd"))
    if op == "sub":
        other = base[:i] + c + base[i + 1 :]
    elif op == "ins":
        other = base[:i] + c + base[i:]
    else:
        other = base[:i] + base[i + 1 :]
    if other == base:
        return
    assert _ed1(base, other)
    va = {base} | {base[: k] + base[k + 1 :] for k in range(len(base))}
    vb = {other} | {other[: k] + other[k + 1 :] for k in range(len(other))}
    assert va & vb, "ED-1 pair must share a ≤1-deletion variant"


# --------------------------------------------------------------------------
# Bloom filter properties
# --------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(-(2**62), 2**62), min_size=0, max_size=300, unique=True)
)
def test_bloom_never_false_negative(keys):
    from mklab_focused_crawler_ray.functions.bloom import bloom_contains, make_bloom

    arr = np.array(keys, dtype=np.int64) if keys else np.zeros(0, np.int64)
    words, m = make_bloom(arr, bits_per_key=8)
    if len(arr):
        assert bloom_contains(words, m, arr).all()


# --------------------------------------------------------------------------
# Morton interleave bijectivity
# --------------------------------------------------------------------------


def test_morton_interleave_is_bijective_on_4bit_pairs():
    from mklab_focused_crawler_ray.pipelines.queries_ml3 import Z_BITS

    seen = {}
    for u in range(1 << Z_BITS):
        for d in range(1 << Z_BITS):
            z = 0
            for i in range(Z_BITS):
                z |= ((u >> i) & 1) << (2 * i)
                z |= ((d >> i) & 1) << (2 * i + 1)
            assert z not in seen
            seen[z] = (u, d)
    assert len(seen) == 1 << (2 * Z_BITS)
    assert min(seen) == 0 and max(seen) == (1 << (2 * Z_BITS)) - 1


# --------------------------------------------------------------------------
# fragmentation invariance: split inputs must not change results
# --------------------------------------------------------------------------


def _frag_copy(src_dir: str, dst_dir: str, table: str, n_files: int) -> None:
    """Rewrite one table as n tiny row-group-fragmented files (a directory
    of shards) so the Ray read produces many small blocks."""
    t = pq.read_table(os.path.join(src_dir, f"{table}.parquet"))
    os.makedirs(os.path.join(dst_dir, f"{table}.parquet"), exist_ok=True)
    n = len(t)
    step = max(1, n // n_files)
    for i, lo in enumerate(range(0, n, step)):
        pq.write_table(
            t.slice(lo, step),
            os.path.join(dst_dir, f"{table}.parquet", f"part-{i:03d}.parquet"),
            row_group_size=max(1, step // 4),
        )


def _link_tables(src_dir: str, dst_dir: str, skip: set) -> None:
    for f in os.listdir(src_dir):
        if f.endswith(".parquet") and f.split(".")[0] not in skip:
            os.symlink(os.path.join(src_dir, f), os.path.join(dst_dir, f))


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def test_wave_ops_invariant_under_block_fragmentation(ray_session):
    """part_name_typo_pairs / bloom_semijoin_lines / user_late_events /
    wau_by_day must return bit-identical results when their input tables
    are split into many small files (different block boundaries exercise
    every per-batch partial path)."""
    import pandas as pd

    from mklab_focused_crawler_ray.pipelines.queries_ml3 import (
        q_bloom_semijoin_lines,
        q_part_name_typo_pairs,
        q_user_late_events,
        q_wau_by_day,
    )

    sf = "/root/testdata/sf0.001"
    with tempfile.TemporaryDirectory() as d:
        _frag_copy(sf, d, "part", 16)
        _frag_copy(sf, d, "events", 16)
        _frag_copy(sf, d, "lineitem", 16)
        _frag_copy(sf, d, "orders", 16)
        _link_tables(sf, d, {"part", "events", "lineitem", "orders"})
        for q in (
            q_part_name_typo_pairs,
            q_bloom_semijoin_lines,
            q_user_late_events,
            q_wau_by_day,
        ):
            base = _canon(q(sf).to_pandas())
            frag = _canon(q(d).to_pandas())
            pd.testing.assert_frame_equal(base, frag)
