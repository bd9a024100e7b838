"""Sequence packing + PII scrub (VERDICT r3 'Next round' #3, #4)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mklab_focused_crawler_ray.pipelines.queries_ml4 import (
    PACK_CONTEXT_LEN,
    _pack_next_fit,
    q_doc_pack_sequences,
    q_doc_pii_scrub,
)


# -- pack kernel edges -----------------------------------------------------


def test_pack_exact_fit_closes_window():
    # 80 = exact fit; the next chunk starts a fresh window at offset 0
    seq, off = _pack_next_fit(np.array([50, 30, 10], np.int64), 80)
    assert seq.tolist() == [0, 0, 1]
    assert off.tolist() == [0, 50, 0]


def test_pack_oversize_chunk_gets_own_window():
    # a 100-token chunk in an 80-token context: own window, placed at 0;
    # the follower must NOT share it
    seq, off = _pack_next_fit(np.array([10, 100, 5], np.int64), 80)
    assert seq.tolist() == [0, 1, 2]
    assert off.tolist() == [0, 0, 0]


def test_pack_oversize_first_chunk():
    seq, off = _pack_next_fit(np.array([200, 1], np.int64), 80)
    assert seq.tolist() == [0, 1]
    assert off.tolist() == [0, 0]


def test_pack_empty_stream():
    seq, off = _pack_next_fit(np.zeros(0, np.int64), 80)
    assert len(seq) == 0 and len(off) == 0


def test_pack_never_overflows_context():
    rng = np.random.default_rng(5)
    n = rng.integers(1, PACK_CONTEXT_LEN + 1, size=500).astype(np.int64)
    seq, off = _pack_next_fit(n, PACK_CONTEXT_LEN)
    # per-window token sums never exceed the context
    import pandas as pd

    s = pd.DataFrame({"seq": seq, "n": n}).groupby("seq")["n"].sum()
    assert (s <= PACK_CONTEXT_LEN).all()
    # offsets are the exclusive running sum within each window
    d = pd.DataFrame({"seq": seq, "n": n, "off": off})
    exp = d.groupby("seq")["n"].cumsum() - d["n"]
    assert (d["off"] == exp).all()


# -- end-to-end edges ------------------------------------------------------


def test_pack_sequences_empty_doc_absent(ray_session, tmp_path):
    """A document with no tokens yields no chunks and therefore no
    placement rows (matching the oracle's WHERE len(tk) > 0)."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["", "alpha beta gamma"], pa.string()),
            }
        ),
        str(sf / "documents.parquet"),
    )
    out = q_doc_pack_sequences(str(sf)).to_pandas()
    assert set(out["doc_id"]) == {2}
    assert (out["seq_id"] == 0).all() and (out["off_tokens"] == 0).all()


def test_pii_scrub_stage_order(ray_session, tmp_path):
    """A phone's digits are redacted BEFORE the digit-run pass: doc 15
    (×3 and ×5) gets an email + a phone; the phone digits must count once
    as a phone, zero times as an id run."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([15, 1], pa.int64()),
                "text": pa.array(["hello world", "plain"], pa.string()),
            }
        ),
        str(sf / "documents.parquet"),
    )
    out = (
        q_doc_pii_scrub(str(sf))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[15, "n_emails"] == 1
    assert out.loc[15, "n_phones"] == 1
    assert out.loc[15, "n_idnums"] == 0  # phone digits already gone
    assert out.loc[1, "n_redactions"] == 0
    # redacted text length: 'hello world' + '<EMAIL>'/'<PHONE>' markers
    assert out.loc[1, "clean_len"] == len("plain")
