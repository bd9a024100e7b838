"""Extended DuckDB oracles for queries whose inputs are the deterministic
fixture tables (items/urls under the image+web fixture) or whose semantics
need heavier SQL (brute-force set-similarity joins).

The driver's correctness gate runs queries AND oracle SQL at sf0.01, whose
fixture tier is "small"; fixture-backed oracles therefore read
``{fixture_root}/small/*.parquet`` via absolute-path ``read_parquet``
(``oracle_sql()`` ensures the fixture exists before handing out the SQL).

Every SQL string mirrors its Ray pipeline's exact semantics — same regexes
(RE2-compatible), same rounding (integer micro units via
``FLOOR(x*1e6+0.5)``), same tie-breaks — and each pairing is verified
locally by tests/test_queries_oracle.py with the driver's comparison shape.

Reference lineage is carried by the Ray pipelines these mirror
(pipelines/queries_media.py, stages/nlp.py, functions/platforms.py).
"""

from __future__ import annotations

import os

# Lucene EnglishAnalyzer stop set — functions/text.py STOPWORDS
_STOP_SQL = (
    "['a','an','and','are','as','at','be','but','by','for','if','in','into',"
    "'is','it','no','not','of','on','or','such','that','the','their','then',"
    "'there','these','they','this','to','was','will','with']"
)

# functions/text.py WORD_RE (RE2-compatible; group 0 extraction).
# The apostrophe is doubled — this string is spliced into SQL literals.
_WORD_PAT = "[A-Za-z0-9_]+(''[A-Za-z]+)?"

# stages/nlp.py ENTITY_RE
_ENT_PAT = r"\b([A-Z][A-Za-z]*)_(Person|Location|Organization)\b"

# functions/platforms.py PLATFORM_PATTERNS — dispatch order preserved,
# anchored with ^ (Python re.match semantics). Quirky optional-'h' tokens
# (watch? / php?) reproduced verbatim; RE2 treats them identically.
_PLATFORMS = [
    ("instagram", r"^https*://instagram\.com/p/([\w\-]+)/"),
    ("youtube", r"^https*://www\.youtube\.com/watch?.*v=([a-zA-Z0-9_\-]+)(&.+=.+)*"),
    ("vimeo", r"^https*://vimeo\.com/([0-9]+)/*$"),
    ("twitpic", r"^https*://twitpic\.com/([A-Za-z0-9]+)/*.*$"),
    ("dailymotion", r"^https*://www\.dailymotion\.com/video/([A-Za-z0-9]+)_.*$"),
    ("facebook", r"^https*://www\.facebook\.com/photo\.php?.*fbid=([a-zA-Z0-9_\-]+)(&.+=.+)*"),
    ("flickr", r"^https*://flickr\.com/photos/([A-Za-z0-9@]+)/([A-Za-z0-9@]+)/*.*$"),
]

# functions/text.py _LANG_PROFILES (iteration order = tie-break order)
_LANG_PROFILES = [
    ("en", "the and of to in is that it was for on are with as"),
    ("de", "der die das und ist nicht ein eine zu den von mit im"),
    ("fr", "le la les et de des un une est pas que pour dans"),
    ("es", "el la los las y de que en un una es no por con"),
    ("it", "il la di che e un una per non sono con del"),
]

# stages/nlp.py _POS_SUFFIX_RULES with the len(low) > len(suf)+1 guard
_POS_CASE = """CASE
  WHEN regexp_matches(w, '^[0-9]') THEN 'CD'
  WHEN length(lw) > 4 AND lw LIKE '%ing' THEN 'VBG'
  WHEN length(lw) > 3 AND lw LIKE '%ed' THEN 'VBD'
  WHEN length(lw) > 3 AND lw LIKE '%ly' THEN 'RB'
  WHEN length(lw) > 5 AND lw LIKE '%tion' THEN 'NN'
  WHEN length(lw) > 5 AND lw LIKE '%ness' THEN 'NN'
  WHEN length(lw) > 5 AND lw LIKE '%ment' THEN 'NN'
  WHEN length(lw) > 4 AND lw LIKE '%ous' THEN 'JJ'
  WHEN length(lw) > 4 AND lw LIKE '%ful' THEN 'JJ'
  WHEN length(lw) > 4 AND lw LIKE '%ive' THEN 'JJ'
  WHEN length(lw) > 4 AND lw LIKE '%est' THEN 'JJS'
  WHEN length(lw) > 3 AND lw LIKE '%er' THEN 'NN'
  WHEN length(lw) > 2 AND lw LIKE '%s' THEN 'NNS'
  WHEN regexp_matches(w, '^[A-Z]') THEN 'NNP'
  ELSE 'NN' END"""


def _fixture_small_dir() -> str:
    root = os.environ.get("GRAFT_FIXTURE_ROOT", "/tmp/mkfc_fixtures")
    return os.path.join(root, "small")


def ensure_small_fixture() -> str:
    """Generate (idempotent, cached) the small fixture tier so fixture-path
    oracle SQL can read it; returns the directory."""
    from ..fixtures.generate import generate_tier

    return generate_tier("small", _fixture_small_dir())


def _platform_sql(urls_path: str) -> str:
    plat_case = "CASE " + " ".join(
        f"WHEN regexp_matches(url, '{pat}') THEN '{name}'"
        for name, pat in _PLATFORMS
    ) + " ELSE '' END"
    id_case = "CASE " + " ".join(
        f"WHEN regexp_matches(url, '{pat}') THEN regexp_extract(url, '{pat}', 1)"
        for name, pat in _PLATFORMS
    ) + " ELSE '' END"
    return (
        f"SELECT url, {plat_case} AS platform, {id_case} AS media_id "
        f"FROM read_parquet('{urls_path}')"
    )


def _langid_sql() -> str:
    cnts = ", ".join(
        "len(list_filter(toks, t -> list_contains(["
        + ",".join(f"'{w}'" for w in words.split())
        + f"], t))) AS c_{lang}"
        for lang, words in _LANG_PROFILES
    )
    m = "greatest(" + ", ".join(f"c_{lang}" for lang, _ in _LANG_PROFILES) + ")"
    pick = "CASE WHEN {m} = 0 THEN 'und' ".format(m=m) + " ".join(
        f"WHEN c_{lang} = {m} THEN '{lang}'" for lang, _ in _LANG_PROFILES
    ) + " ELSE 'und' END"
    return (
        "WITH t AS (SELECT doc_id, "
        f"list_transform(regexp_extract_all(text, '{_WORD_PAT}'), x -> lower(x)) AS toks "
        "FROM documents), "
        f"c AS (SELECT doc_id, {cnts} FROM t) "
        f"SELECT doc_id, {pick} AS lang_pred FROM c"
    )


def _jaccard_pairs_sql(shingle_cte: str, threshold_num: int, threshold_den: int) -> str:
    """Brute-force set-Jaccard self-join over a distinct (doc_id, s) shingle
    relation. Threshold check in exact integer arithmetic:
    i/(na+nb-i) >= num/den  ⟺  i*den >= num*(na+nb-i)."""
    return (
        f"WITH {shingle_cte}, "
        "d AS (SELECT DISTINCT doc_id, s FROM sh), "
        "sz AS (SELECT doc_id, COUNT(*) AS n FROM d GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i "
        "FROM d a JOIN d b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) "
        "SELECT doc_a, doc_b, "
        "CAST(FLOOR(CAST(i AS DOUBLE)/(sa.n + sb.n - i)*1000000 + 0.5) AS BIGINT) AS jaccard_micro "
        "FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b "
        f"WHERE i * {threshold_den} >= {threshold_num} * (sa.n + sb.n - i)"
    )


_CHAR5_CTE = (
    "norm AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS s0 "
    "FROM documents), "
    "sh AS (SELECT doc_id, unnest(CASE WHEN length(s0) < 5 THEN "
    "(CASE WHEN length(s0) > 0 THEN [s0] ELSE [] END) "
    "ELSE list_transform(range(1, length(s0) - 3), i -> substring(s0, CAST(i AS INT), 5)) END) AS s "
    "FROM norm)"
)

_WORD3_CTE = (
    "toks AS (SELECT doc_id, regexpt AS tk FROM (SELECT doc_id, "
    "regexp_extract_all(lower(text), '[a-z0-9]+') AS regexpt FROM documents)), "
    "sh AS (SELECT doc_id, unnest(CASE WHEN len(tk) < 3 THEN "
    "(CASE WHEN len(tk) > 0 THEN [array_to_string(tk, ' ')] ELSE [] END) "
    "ELSE list_transform(range(1, len(tk) - 1), i -> "
    "tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT)+1] || ' ' || tk[CAST(i AS INT)+2]) END) AS s "
    "FROM toks)"
)


def build_extended_oracles() -> dict[str, str]:
    fdir = _fixture_small_dir()
    items = os.path.join(fdir, "items.parquet")
    urls = os.path.join(fdir, "urls.parquet")
    items_rel = f"read_parquet('{items}')"

    sql: dict[str, str] = {}

    # ItemsRankerBolt shares-score + bounded top-k (stages/nlp.items_ranked)
    sql["items_top100"] = (
        "SELECT id, CAST(FLOOR((1 - EXP(-0.05*shares) + 1)/2*1000000 + 0.5) AS BIGINT) AS score_micro "
        f"FROM {items_rel} ORDER BY score_micro DESC, id ASC LIMIT 100"
    )

    # ItemsCounterBolt tag counts (duplicate tags within an item count each)
    sql["items_tag_counts"] = (
        "SELECT tag, COUNT(*) AS n FROM "
        f"(SELECT unnest(tags) AS tag FROM {items_rel}) GROUP BY tag"
    )

    # Deserialization roundtrip: identity on valid rows (injected malformed
    # rows are dropped by the parser)
    sql["items_json_roundtrip"] = (
        f"SELECT id, title, user_id, CAST(shares AS BIGINT) AS shares FROM {items_rel}"
    )

    # MediaExtractionBolt regex dispatch
    sql["platform_media_extract"] = _platform_sql(urls)

    # language-ID stopword-profile argmax (first-profile-wins ties)
    sql["langid_detect"] = _langid_sql()

    # TokenizationBolt ALL + bigram shingles ('_' separator)
    sql["items_bigrams"] = (
        "WITH t AS (SELECT id, list_filter(list_transform("
        f"regexp_extract_all(title, '{_WORD_PAT}'), x -> lower(x)), "
        f"x -> NOT list_contains({_STOP_SQL}, x)) AS tk FROM {items_rel}) "
        "SELECT id, CASE WHEN len(tk) < 2 THEN '' ELSE array_to_string("
        "list_transform(range(1, len(tk)), i -> tk[CAST(i AS INT)] || '_' || tk[CAST(i AS INT)+1]), ' ') END AS tokens "
        "FROM t"
    )

    # TokenizationBolt NE mode: entity names lowered, deduped by
    # (type, lower(name)) keeping first-occurrence order
    sql["items_ne_tokens"] = (
        f"WITH m AS (SELECT id, unnest(regexp_extract_all(title, '{_ENT_PAT}')) AS mention, "
        f"generate_subscripts(regexp_extract_all(title, '{_ENT_PAT}'), 1) AS pos FROM {items_rel}), "
        "d AS (SELECT id, lower(split_part(mention, '_', 1)) AS tok, "
        "split_part(mention, '_', 2) AS typ, MIN(pos) AS p FROM m GROUP BY 1, 2, 3), "
        "agg AS (SELECT id, array_to_string(list(tok ORDER BY p), ' ') AS tokens FROM d GROUP BY id) "
        f"SELECT i.id, COALESCE(a.tokens, '') AS tokens FROM {items_rel} i LEFT JOIN agg a USING (id)"
    )

    # EntityExtractionBolt exploded (id, name, type, count, ord): dedupe by
    # (type, lower(name)), count mentions, ord = first-occurrence rank.
    # name = the FIRST mention's original casing (Python dict keeps the
    # first-inserted value for the key).
    sql["items_entities"] = (
        f"WITH m AS (SELECT id, unnest(regexp_extract_all(title, '{_ENT_PAT}')) AS mention, "
        f"generate_subscripts(regexp_extract_all(title, '{_ENT_PAT}'), 1) AS pos FROM {items_rel}), "
        "p AS (SELECT id, split_part(mention, '_', 1) AS name0, "
        "upper(split_part(mention, '_', 2)) AS type, lower(split_part(mention, '_', 1)) AS lname, pos FROM m), "
        "d AS (SELECT id, lname, \"type\", MIN(pos) AS p, COUNT(*) AS \"count\", "
        "MIN_BY(name0, pos) AS name FROM p GROUP BY 1, 2, 3) "
        "SELECT id, name, \"type\", CAST(\"count\" AS BIGINT) AS \"count\", "
        "CAST(ROW_NUMBER() OVER (PARTITION BY id ORDER BY p) - 1 AS BIGINT) AS ord FROM d"
    )

    # TokenizationBolt POS mode: 'word#tag' with the suffix-rule tagger
    sql["items_pos_tokens"] = (
        f"WITH w AS (SELECT id, unnest(regexp_extract_all(title, '{_WORD_PAT}')) AS w, "
        f"generate_subscripts(regexp_extract_all(title, '{_WORD_PAT}'), 1) AS pos FROM {items_rel}), "
        "f AS (SELECT id, pos, w, lower(w) AS lw FROM w "
        f"WHERE NOT list_contains({_STOP_SQL}, lower(w))), "
        f"tok AS (SELECT id, pos, lw || '#' || {_POS_CASE} AS t FROM f), "
        "agg AS (SELECT id, array_to_string(list(t ORDER BY pos), ' ') AS tokens FROM tok GROUP BY id) "
        f"SELECT i.id, COALESCE(a.tokens, '') AS tokens FROM {items_rel} i LEFT JOIN agg a USING (id)"
    )

    # brute-force set-similarity joins (exact truth the LSH pipelines must
    # reproduce — verify is exact, and banding recall is 1.0 on this corpus,
    # verified by tests/test_queries_oracle.py at the driver's scale)
    sql["minhash_dup_pairs"] = _jaccard_pairs_sql(_CHAR5_CTE, 1, 2)
    sql["ngram_jaccard_pairs"] = _jaccard_pairs_sql(_WORD3_CTE, 1, 2)

    # embedding-cosine near-dup brute force (threshold 0.95)
    sql["embedding_dup_pairs"] = (
        "WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings) "
        "SELECT a.vec_id AS doc_a, b.vec_id AS doc_b FROM v a JOIN v b ON a.vec_id < b.vec_id "
        "WHERE list_cosine_similarity(a.e, b.e) >= 0.95"
    )

    return sql
