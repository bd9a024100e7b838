"""Text kernels: tokenization, n-gram shingles, language-ID heuristic,
quality scoring, token counting, rolling-hash fingerprints.

Tokenization mirrors the reference's Lucene StandardTokenizer + StopFilter +
LowerCaseFilter + optional ShingleFilter chain
(bolts/items/TokenizationBolt.java:126-154) with a compiled-regex word
tokenizer, a fixed stopword set, and n-gram shingling. The four modes
(ALL/NE/TAGS/POS, TokenizationBolt.java:70-119) map to which column feeds the
tokenizer.

Language-ID / quality / token-count / fingerprint are the training-data-
pipeline additions (no reference counterpart): heuristic n-gram language
detection, length/punct/stopword quality features, whitespace + BPE-ish
token counts, and a Rabin-Karp rolling-hash document fingerprint.
"""

from __future__ import annotations

import re

import numpy as np

WORD_RE = re.compile(r"[A-Za-z0-9_]+(?:'[A-Za-z]+)?", re.UNICODE)

# Lucene EnglishAnalyzer's default stop set (public, stable, 33 words).
STOPWORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

_BPEISH_RE = re.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"""
)


def tokenize(text: str, *, lowercase: bool = True, drop_stopwords: bool = True) -> list[str]:
    """StandardTokenizer-ish word tokens; stop-filter then lowercase, matching
    the reference chain order (StopFilter before LowerCaseFilter,
    TokenizationBolt.java:136-152 — stopwords there are lowercase so the
    practical effect equals lowercase-then-stop for ASCII; we lowercase first
    for vectorized simplicity and document the equivalence)."""
    toks = WORD_RE.findall(text)
    if lowercase:
        toks = [t.lower() for t in toks]
    if drop_stopwords:
        toks = [t for t in toks if t not in STOPWORDS]
    return toks


def shingles(tokens: list[str], n: int) -> list[str]:
    """Word n-gram shingles joined by '_' (ShingleFilter semantics:
    TokenizationBolt.java:141-148 uses separator '_' via setTokenSeparator)."""
    if n <= 1 or len(tokens) < n:
        return list(tokens) if n <= 1 else []
    return ["_".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def char_shingles(text: str, k: int = 5) -> list[str]:
    """Character k-shingles over the normalized text (for MinHash dedup)."""
    s = " ".join(text.lower().split())
    if len(s) < k:
        return [s] if s else []
    return [s[i : i + k] for i in range(len(s) - k + 1)]


# --- language-ID heuristic -------------------------------------------------
# Tiny trigram/stopword profile scorer. Profiles are hand-picked
# high-frequency function words per language — enough to separate the
# synthetic corpus's language mix deterministically.
_LANG_PROFILES: dict[str, frozenset] = {
    "en": frozenset("the and of to in is that it was for on are with as".split()),
    "de": frozenset("der die das und ist nicht ein eine zu den von mit im".split()),
    "fr": frozenset("le la les et de des un une est pas que pour dans".split()),
    "es": frozenset("el la los las y de que en un una es no por con".split()),
    "it": frozenset("il la di che e un una per non sono con del".split()),
}


def detect_language(text: str) -> str:
    """Best-scoring stopword-profile language; 'und' (undetermined) when no
    profile matches any token."""
    toks = [t.lower() for t in WORD_RE.findall(text)]
    if not toks:
        return "und"
    best_lang, best = "und", 0
    for lang, prof in _LANG_PROFILES.items():
        score = sum(1 for t in toks if t in prof)
        if score > best:
            best_lang, best = lang, score
    return best_lang


# --- quality features ------------------------------------------------------


def quality_features(text: str) -> dict:
    """Length / punctuation / stopword / word-length features, with a single
    [0,1] quality score (heuristic gate in the spirit of the reference's
    Boilerpipe SimpleEstimator.isLowQuality gate,
    ArticleExtractionBolt.java:296-322)."""
    n_chars = len(text)
    words = WORD_RE.findall(text)
    n_words = len(words)
    mean_wl = float(np.mean([len(w) for w in words])) if words else 0.0
    n_punct = sum(1 for c in text if c in ".,;:!?\"'()[]{}")
    punct_ratio = n_punct / max(1, n_chars)
    lower = [w.lower() for w in words]
    stop_ratio = sum(1 for w in lower if w in STOPWORDS) / max(1, n_words)
    alpha_ratio = sum(c.isalpha() for c in text) / max(1, n_chars)
    score = 1.0
    if n_words < 10:
        score *= n_words / 10.0
    if not (3.0 <= mean_wl <= 10.0):
        score *= 0.5
    if stop_ratio < 0.05:
        score *= 0.5
    if alpha_ratio < 0.5:
        score *= 0.5
    if punct_ratio > 0.2:
        score *= 0.5
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "alpha_ratio": alpha_ratio,
        "quality": score,
    }


def count_tokens_ws(text: str) -> int:
    """Whitespace token count."""
    return len(text.split())


# RE2's \s is ASCII-only, but str.split() splits on CPython's Unicode
# whitespace set — spell that set out explicitly so the Arrow kernel counts
# exactly the same runs (verified exhaustively over every codepoint
# < 0x20000 plus a hypothesis property test).
_NONWS_RUN_RE2 = (
    r"[^\t-\r\x1c-\x1f \x{0085}\x{00A0}\x{1680}"
    r"\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]+"
)


def count_tokens_ws_arrow(col) -> "pa.Array":
    """Vectorized ``count_tokens_ws`` over a pyarrow string array: count
    non-whitespace runs, which equals ``len(text.split())`` exactly."""
    import pyarrow as pa
    import pyarrow.compute as pc

    return pc.cast(pc.count_substring_regex(col, _NONWS_RUN_RE2), pa.int64())


def count_tokens_bpeish(text: str) -> int:
    """GPT-2-style pre-tokenizer regex piece count (BPE-ish proxy)."""
    return len(_BPEISH_RE.findall(text))


# --- rolling-hash fingerprint ---------------------------------------------
_RK_BASE = 257
_RK_MOD = (1 << 61) - 1


def rabin_karp_fingerprints(text: str, k: int = 16, keep: int = 8) -> list[int]:
    """Winnowing-style document fingerprint: rolling Rabin-Karp hashes of
    k-byte windows, keep the ``keep`` smallest (sorted) — a compact
    order-insensitive signature for containment detection."""
    data = text.encode("utf-8")
    n = len(data)
    if n == 0:
        return []
    if n <= k:
        h = 0
        for b in data:
            h = (h * _RK_BASE + b) % _RK_MOD
        return [h]
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    # vectorized rolling hash via cumulative polynomial trick in python ints
    # (mod 2^61-1 exceeds float precision); windows are O(n) with a loop but
    # each step is O(1) — fine for documents up to ~1 MB.
    pow_k = pow(_RK_BASE, k - 1, _RK_MOD)
    h = 0
    out = []
    for i in range(n):
        h = (h * _RK_BASE + int(arr[i])) % _RK_MOD
        if i >= k - 1:
            out.append(h)
            h = (h - int(arr[i - k + 1]) * pow_k) % _RK_MOD
    out.sort()
    return out[:keep]
