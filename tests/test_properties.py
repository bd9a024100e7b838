"""Property-based tests (hypothesis) for the pure kernels the engine's
correctness hangs on: hashing consistency, MinHash/Jaccard estimation,
popcount, cuckoo no-false-negatives under churn, codec round-trips on
arbitrary images, and bounded-top-k vs sorted truth."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mklab_focused_crawler_ray.functions.hashing import (
    char_shingle_hashes,
    hamming64,
    minhash_seeds,
    minhash_signature,
    popcount64,
    word_ngram_hashes,
)
from mklab_focused_crawler_ray.functions.urls import url_hash64, url_hash64_vec

TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=400
)


@given(st.lists(TEXT, min_size=0, max_size=50))
@settings(max_examples=50, deadline=None)
def test_url_hash_vec_matches_scalar(strs):
    v = url_hash64_vec(strs)
    s = np.array([url_hash64(x) for x in strs], dtype=np.uint64)
    assert np.array_equal(v, s)


@given(TEXT)
@settings(max_examples=50, deadline=None)
def test_char_shingle_hashes_deterministic_and_sorted(text):
    a = char_shingle_hashes(text, 5)
    b = char_shingle_hashes(text, 5)
    assert np.array_equal(a, b)
    assert np.array_equal(a, np.sort(a))  # np.unique output is sorted


@given(TEXT, TEXT)
@settings(max_examples=30, deadline=None)
def test_word_ngram_hashes_equal_texts_equal_hashes(a, b):
    ha, hb = word_ngram_hashes(a), word_ngram_hashes(b)
    if a.lower() == b.lower():
        assert np.array_equal(ha, hb)


@given(st.sets(st.integers(min_value=0, max_value=2**63), min_size=1, max_size=200))
@settings(max_examples=30, deadline=None)
def test_minhash_identical_sets_identical_sigs(vals):
    seeds = minhash_seeds(64)
    h = np.array(sorted(vals), dtype=np.uint64)
    s1 = minhash_signature(h, seeds)
    s2 = minhash_signature(np.random.default_rng(0).permutation(h), seeds)
    assert np.array_equal(s1, s2)  # order-invariant


@given(
    st.sets(st.integers(min_value=0, max_value=2**20), min_size=20, max_size=300),
    st.sets(st.integers(min_value=0, max_value=2**20), min_size=20, max_size=300),
)
@settings(max_examples=20, deadline=None)
def test_minhash_estimates_jaccard(a, b):
    """Signature agreement rate ≈ true Jaccard within a loose bound."""
    seeds = minhash_seeds(256)
    from mklab_focused_crawler_ray.functions.hashing import mix64

    ha = mix64(np.array(sorted(a), dtype=np.uint64))
    hb = mix64(np.array(sorted(b), dtype=np.uint64))
    sa = minhash_signature(ha, seeds)
    sb = minhash_signature(hb, seeds)
    est = float(np.mean(sa == sb))
    true = len(a & b) / len(a | b)
    assert abs(est - true) < 0.18  # 256 perms → σ ≈ sqrt(J(1-J)/256) ≤ 0.032


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=64))
@settings(max_examples=50, deadline=None)
def test_popcount_matches_python(vals):
    arr = np.array(vals, dtype=np.uint64)
    got = popcount64(arr)
    assert [int(g) for g in got] == [bin(v).count("1") for v in vals]
    assert int(hamming64(arr, arr).max()) == 0


@given(st.sets(st.integers(min_value=0, max_value=2**60), min_size=1, max_size=500))
@settings(max_examples=20, deadline=None)
def test_cuckoo_no_false_negatives(keys):
    from mklab_focused_crawler_ray.state.cuckoo import CuckooFilter

    cf = CuckooFilter(1 << 11)
    inserted = []
    for k in keys:
        if cf.add(int(k)):
            inserted.append(int(k))
    for k in inserted:
        assert int(k) in cf, "cuckoo filters must never false-negative"


@given(
    st.lists(
        st.tuples(st.floats(0, 1, allow_nan=False), st.text(min_size=1, max_size=8)),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=10),
)
@settings(max_examples=30, deadline=None)
def test_bounded_pq_equals_sorted_topk(items, k):
    from mklab_focused_crawler_ray.state.bounded_pq import BoundedPQueue

    pq = BoundedPQueue(k)
    for score, url in items:
        pq.offer(score, url)
    got = [(s, u) for s, u, _ in pq.drain_best_first()]  # (score desc, url asc)
    truth = sorted(items, key=lambda t: (-t[0], t[1]))[:k]
    assert got == truth


@settings(max_examples=10, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_codec_roundtrips_random_images(w, h, seed):
    from mklab_focused_crawler_ray.fixtures.codecs import (
        bmp_decode,
        bmp_encode,
        png_decode,
        png_encode,
        psnr,
        q6_decode,
        q6_encode,
    )

    rgb = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(rgb)), rgb)
    assert np.array_equal(bmp_decode(bmp_encode(rgb)), rgb)
    rt = q6_decode(q6_encode(rgb))
    assert rt.shape == rgb.shape  # lossy: shape-exact; PSNR checked on
    # photo-like fixtures (random noise is the worst case for a DCT codec)


def test_oph_signature_permutation_invariant():
    """One-permutation MinHash is a function of the SET: order must not
    matter, and identical sets give identical signatures."""
    import numpy as np

    from mklab_focused_crawler_ray.functions.hashing import (
        oph_signatures,
        token_hashes,
    )

    h = token_hashes([f"tok{i}" for i in range(300)])
    s1 = oph_signatures([h], 128)
    s2 = oph_signatures([np.random.default_rng(0).permutation(h)], 128)
    assert np.array_equal(s1, s2)


def test_oph_bin_agreement_tracks_jaccard():
    """Bin-agreement fraction estimates Jaccard (loose check: high-overlap
    pair scores far above low-overlap pair)."""
    import numpy as np

    from mklab_focused_crawler_ray.functions.hashing import (
        oph_signatures,
        token_hashes,
    )

    base = [f"t{i}" for i in range(400)]
    near = base[:360] + [f"x{i}" for i in range(40)]   # J ≈ 0.82/1.18 ≈ 0.7
    far = [f"y{i}" for i in range(400)]                # J = 0
    hb, hn, hf = (token_hashes(x) for x in (base, near, far))
    sb, sn, sf = oph_signatures([hb, hn, hf], 128)
    agree_near = float(np.mean(sb == sn))
    agree_far = float(np.mean(sb == sf))
    assert agree_near > 0.5
    assert agree_far < 0.1


def test_oph_empty_and_sparse_sets():
    import numpy as np

    from mklab_focused_crawler_ray.functions.hashing import oph_signatures

    sent = np.iinfo(np.uint64).max
    s = oph_signatures([np.empty(0, np.uint64)], 128)
    assert (s == sent).all(), "empty set must match nothing"
    # a 1-element set densifies every bin deterministically, without the
    # raw value aliasing into all 128 bins
    one = np.array([12345678901234567], np.uint64)
    s1 = oph_signatures([one], 128)
    s2 = oph_signatures([one], 128)
    assert np.array_equal(s1, s2)
    assert (s1 != sent).all()
    assert len(np.unique(s1)) > 100, "densified bins must differ by index"


def test_bpeish_token_count_sane():
    from mklab_focused_crawler_ray.functions.text import (
        count_tokens_bpeish,
        count_tokens_ws,
    )

    t = "The quick brown fox can't stop, won't stop (42 times)."
    assert count_tokens_bpeish(t) >= count_tokens_ws(t)
    assert count_tokens_bpeish("") == 0
    # contractions split into word + suffix pieces, GPT-2-style
    assert count_tokens_bpeish("can't") == 2


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs"),
                whitelist_characters=" \t\n\r  ",
            ),
            max_size=80,
        ),
        max_size=32,
    )
)
def test_ws_token_count_arrow_matches_scalar(texts):
    import pyarrow as pa

    from mklab_focused_crawler_ray.functions.text import (
        count_tokens_ws,
        count_tokens_ws_arrow,
    )

    got = count_tokens_ws_arrow(pa.array(texts, pa.string())).to_pylist()
    assert got == [count_tokens_ws(t) for t in texts]
