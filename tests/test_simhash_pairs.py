"""SimHash near-dup pairs: the banded hot-key pipeline must equal the
O(n²) brute-force Hamming comparison exactly (band blocking is lossless
for Hamming ≤ 3 by pigeonhole over 4×16-bit bands)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from mklab_focused_crawler_ray.functions.hashing import (
    hamming64,
    simhash64,
    token_hashes,
)
from mklab_focused_crawler_ray.stages.dedup import TOKEN_RE, simhash_near_pairs

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_simhash_pairs_equal_brute_force(ray_session):
    got_df = simhash_near_pairs(DOCS, max_hamming=3).to_pandas()
    got = {
        tuple(sorted((int(a), int(b))))
        for a, b in zip(got_df["doc_a"], got_df["doc_b"])
    }

    t = pq.read_table(DOCS, columns=["doc_id", "text"])
    ids = t["doc_id"].to_numpy()
    sigs = simhash64(
        [token_hashes(TOKEN_RE.findall(x.lower())) for x in t["text"].to_pylist()]
    )
    ii, jj = np.triu_indices(len(ids), k=1)
    hd = hamming64(sigs[ii], sigs[jj])
    keep = hd <= 3
    expected = {
        tuple(sorted((int(a), int(b))))
        for a, b in zip(ids[ii][keep], ids[jj][keep])
    }
    assert got == expected
    assert expected, "fixture must contain simhash near-dups"
