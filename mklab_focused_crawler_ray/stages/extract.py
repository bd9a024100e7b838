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


def extract_all_images(url: str, html: str, shares: int = 0) -> list[dict]:
    """Whole-document <img> walk — ArticleExtractionBolt.extractAllImages
    (ArticleExtractionBolt.java:475-549; DEAD CODE at reference HEAD — the
    call at :379 is commented out — implemented for completeness, unit-
    tested, not wired into any topology, matching the reference).

    Faithful quirks, in reference order:
      * missing/empty width or height attr → skip (:491-492);
      * NON-NUMERIC width/height → the parse error is logged and execution
        FALLS THROUGH (no ``continue`` in the catch, :501-503), so such an
        image bypasses the size filter entirely (w=h=-1 fall-through);
      * numeric dims below MIN_DIM/MIN_AREA → skip (:498-499);
      * resolved url longer than MAX_MEDIA_URL or ending .gif → skip
        (:509-514);
      * Jsoup ``attr`` returns "" for a missing alt, so the reference's
        ``alt == null → title`` fallback (:520-522) is unreachable; we
        mirror that (empty alt stays empty);
      * id = "Web#" + (javaHashCode(url.trim()) & 0x7FFFFFFF), type=image,
        thumbnail=url, description=page title (:524-539).
    """
    from .html_extract import first_tag, iter_nodes, node_text, parse_dom

    root = parse_dom(html)
    tnode = first_tag(root, "title")
    title = node_text(tnode).strip() if tnode is not None else ""
    out: list[dict] = []
    for n in iter_nodes(root):
        if n.tag != "img":
            continue
        src = n.attrs.get("src")
        if not src:
            continue
        w_s, h_s = n.attrs.get("width", ""), n.attrs.get("height", "")
        if w_s == "" or h_s == "":
            continue  # missing dims (:491-492)
        try:
            w, h = int(w_s), int(h_s)
            if w < MIN_DIM or h < MIN_DIM or w * h < MIN_AREA:
                continue  # size filter (:498-499)
        except ValueError:
            w, h = -1, -1  # logged fall-through, NOT filtered (:501-503)
        resolved = urljoin(url, src)
        if len(resolved) > MAX_MEDIA_URL:
            continue  # overlong (:509-510)
        if resolved.lower().endswith(".gif"):
            continue  # .gif (:512-513)
        out.append(
            {
                "media_id": web_media_id(resolved),
                "media_url": resolved,
                "type": "image",
                "width": w,
                "height": h,
                "alt": n.attrs.get("alt", "").strip(),
                "page_url": url,
                "description": title,
                "shares": int(shares),
            }
        )
    return out


def extract_videos(
    url: str, html: str, shares: int = 0, reference_bug_compatible: bool = False
) -> list[dict]:
    """<object data=...> video walk — ArticleExtractionBolt.extractVideos
    (ArticleExtractionBolt.java:552-596; DEAD CODE at reference HEAD, and
    ALSO buggy there: the built MediaItem is never added to the returned
    list, so the reference method always returns []). We implement the
    evident intent (return the extracted items); pass
    ``reference_bug_compatible=True`` for the bug-faithful empty result.

    Semantics per the reference: every <object> element's ``data`` attr
    (skipped when missing/empty, :566-570), id =
    "Web#{pageHash}_{videoHash}" with both hashes javaHashCode & 0x7FFFFFFF
    (:557, :575-576), type=video, thumbnail=data url, pageUrl=base, shares.
    """
    from ..functions.javahash import java_string_hashcode
    from .html_extract import iter_nodes, parse_dom

    page_hash = java_string_hashcode(url) & 0x7FFFFFFF
    out: list[dict] = []
    for n in iter_nodes(parse_dom(html)):
        if n.tag != "object":
            continue
        data = n.attrs.get("data")
        if not data:
            continue
        resolved = urljoin(url, data)
        vid_hash = java_string_hashcode(resolved) & 0x7FFFFFFF
        out.append(
            {
                "media_id": f"Web#{page_hash}_{vid_hash}",
                "media_url": resolved,
                "type": "video",
                "thumbnail": resolved,
                "page_url": url,
                "shares": int(shares),
            }
        )
    return [] if reference_bug_compatible else out
