"""lang_quality_batch must be bit-identical to the per-row
detect_language / quality_features heuristics — same floats, same argmax
tie-breaks, exact Unicode char classes via the unique-codepoint table."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from mklab_focused_crawler_ray.functions.text import (
    detect_language,
    lang_quality_batch,
    quality_features,
)


def _check(texts):
    got = lang_quality_batch(texts)
    for i, t in enumerate(texts):
        q = quality_features(t)
        assert got["lang"][i] == detect_language(t), (i, t[:40])
        assert got["quality"][i] == q["quality"], (i, t[:40])
        assert got["n_words"][i] == q["n_words"]
        assert got["n_chars"][i] == q["n_chars"]


def test_fixture_corpus_exact(ray_session):
    texts = (
        pq.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["text"]
        )["text"]
        .to_pylist()
    )
    _check(texts)


def test_edge_cases():
    _check(
        [
            "",
            " ",
            "the and of to in is that it was for",  # pure en profile
            "der die das und ist nicht",  # de profile
            "le la les et de des",  # fr vs es tie surface ('de', 'la')
            "el la los las y de",  # es
            "il la di che e un",  # it
            "de la",  # multi-profile tie → first profile order wins
            "zzz qqq xxx",  # no profile hit → und
            "héllo Wörld ¡π漢 'tis can't _under_score 123",
            "a" * 5000,
            "!!!???...,,,;;;:::",
            "word " * 9,  # n_words < 10 boundary
            "word " * 10,
        ]
    )


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",), max_codepoint=0x2FFFF
            ),
            max_size=200,
        ),
        max_size=8,
    )
)
def test_property_equivalence(texts):
    _check(texts)
