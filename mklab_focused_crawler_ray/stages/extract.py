"""Article + content-image extraction (the ArticleExtractionBolt port).

Reference semantics preserved exactly (bolts/webpages/ArticleExtractionBolt.java):
- main-content extraction + low-quality gate → ``is_article``
  (:296-322; Boilerpipe ARTICLE_EXTRACTOR + SimpleEstimator.isLowQuality —
  content = <p> blocks inside the selected article container; the gate is
  SimpleEstimator parity: before/after word-count + words-per-block
  thresholds over whole-document vs extracted text blocks, see
  ``is_low_quality``)
- content-image rules (:392-472):
  * images must carry parseable width+height (:405-416)
  * size filter w≥200 && h≥200 && w·h≥40000 (minDim/minArea, :68-69,419-420)
  * src resolved against the base URL; resolved URLs >500 chars dropped (:70,427-428)
  * ``.gif`` dropped (:430-431)
  * missing alt → page title fallback (:438-443)
  * media id = "Web#" + (Java url.hashCode() & 0x7FFFFFFF) (:448-450)
  * first surviving image becomes the page's media_thumbnail (:333-336)
  * child MediaItem carries page_url/reference/shares/description=title (:455-468)

Implemented as a single ``map_batches`` kernel over Arrow batches: per-row
DOM parse (stages/html_extract — tolerant stdlib html.parser tree + a
Boilerpipe-ish content-block heuristic; the extraction FILTERS below are
the reference-exact part and stay here). Emits ONE pages row per input row
plus exploded media child rows — flat-map-style (more rows out than in), as
two separate outputs via the 'explode' helpers.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from ..functions.javahash import web_media_id
from .html_extract import extract_structure

MIN_DIM = 200  # ArticleExtractionBolt.java:68
MIN_AREA = 200 * 200  # ArticleExtractionBolt.java:69
MAX_MEDIA_URL = 500  # ArticleExtractionBolt.java:70
# SimpleEstimator.isLowQuality thresholds (boilerpipe
# estimators/SimpleEstimator.java, public source): low quality iff
#   words(before) < 90  OR  words(after) < 70  OR  avgWordsPerBlock(after) < 25
# where "before" is the whole raw document's text blocks and "after" is the
# extracted article content (ArticleExtractionBolt.java:296-322 computes
# TextDocumentStatistics on both sides of the extractor).
MIN_WORDS_BEFORE = 90
MIN_WORDS_AFTER = 70
MIN_AVG_WORDS_PER_BLOCK = 25

_WORD_RE = re.compile(r"\S+")


def is_low_quality(blocks_before: list[str], blocks_after: list[str]) -> bool:
    """Boilerpipe SimpleEstimator parity over our DOM text blocks:
    ``blocks_before`` = every text block of the raw document (Boilerpipe's
    dsBefore with contentOnly=false), ``blocks_after`` = the content
    container's paragraphs (what survives the extractor)."""
    words_before = sum(len(_WORD_RE.findall(b)) for b in blocks_before)
    if words_before < MIN_WORDS_BEFORE:
        return True
    after_counts = [len(_WORD_RE.findall(b)) for b in blocks_after if b]
    words_after = sum(after_counts)
    if words_after < MIN_WORDS_AFTER:
        return True
    if words_after / max(1, len(after_counts)) < MIN_AVG_WORDS_PER_BLOCK:
        return True
    return False


def parse_page(url: str, html: str) -> dict:
    """Extract one page → dict(title, text, is_article, out_links, media:[...]).

    ``media`` rows mirror the reference MediaItem fields built at
    ArticleExtractionBolt.java:445-468; images are CONTENT-gated (inside the
    selected article container — utils/ImageExtractor.java:126-144).
    """
    doc = extract_structure(html)
    title = doc["title"]
    text = "\n".join(doc["paras"])
    is_article = not is_low_quality(doc["blocks"], doc["paras"])
    media = []
    for attrs in doc["imgs"]:
        src = attrs.get("src")
        if not src:
            continue
        w_s, h_s = attrs.get("width"), attrs.get("height")
        try:
            w, h = int(w_s), int(h_s)  # type: ignore[arg-type]
        except (TypeError, ValueError):
            continue  # unparseable dims → drop (:405-416)
        if w < MIN_DIM or h < MIN_DIM or w * h < MIN_AREA:
            continue  # size filter (:419-420)
        resolved = urljoin(url, src)
        if len(resolved) > MAX_MEDIA_URL:
            continue  # overlong (:427-428)
        if resolved.lower().endswith(".gif"):
            continue  # .gif (:430-431)
        alt = attrs.get("alt") or title  # alt → title fallback (:438-443)
        media.append(
            {
                "media_id": web_media_id(resolved),
                "media_url": resolved,
                "width": w,
                "height": h,
                "alt": alt,
                "page_url": url,
                "description": title,
            }
        )
    out_links = [urljoin(url, href) for href in doc["hrefs"]]
    return {
        "title": title,
        "text": text,
        "is_article": is_article,
        "out_links": out_links,
        "media": media,
        "media_thumbnail": media[0]["media_url"] if media else None,
    }


MEDIA_STRUCT = None  # set lazily in stages/fetch.py (pyarrow struct type)
