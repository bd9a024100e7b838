"""Boilerpipe-parity quality gate goldens (SimpleEstimator.isLowQuality).

The reference computes TextDocumentStatistics before and after the article
extractor and gates on SimpleEstimator (ArticleExtractionBolt.java:296-322);
the public boilerpipe estimator is: low quality iff words(before) < 90 OR
words(after) < 70 OR avg words-per-block(after) < 25. These goldens pin
``is_article`` over non-fixture page shapes a real crawl meets, so the gate
is exercised where the old word-count stand-in and the estimator disagree.
"""

from __future__ import annotations

from mklab_focused_crawler_ray.stages.extract import is_low_quality, parse_page


def _para(n: int, seed: str) -> str:
    return " ".join(f"{seed}{i}" for i in range(n))


# -- threshold unit goldens (exact boundary behavior) ----------------------

def test_before_threshold_boundary():
    after = [_para(35, "w"), _para(35, "v")]  # 70 words, avg 35
    assert is_low_quality([_para(89, "b")], after) is True
    assert is_low_quality([_para(90, "b")], after) is False


def test_after_threshold_boundary():
    before = [_para(200, "b")]
    assert is_low_quality(before, [_para(69, "w")]) is True
    assert is_low_quality(before, [_para(70, "w")]) is False


def test_avg_words_per_block_boundary():
    before = [_para(200, "b")]
    assert is_low_quality(before, [_para(24, "w")] * 3) is True  # avg 24
    assert is_low_quality(before, [_para(25, "w")] * 3) is False  # avg 25


# -- page-shape goldens ----------------------------------------------------

NEWS_ARTICLE = (
    "<html><head><title>Quake hits region</title></head><body>"
    '<div class="nav"><a href="/">home</a> <a href="/world">world</a></div>'
    '<div class="article">'
    f"<p>{_para(40, 'lead')}</p>"
    f"<p>{_para(38, 'body')}</p>"
    f"<p>{_para(36, 'tail')}</p>"
    "</div>"
    f'<div class="comments"><p>{_para(6, "spam")}</p></div>'
    "</body></html>"
)


def test_golden_news_article_is_article():
    got = parse_page("http://news.example/quake", NEWS_ARTICLE)
    assert got["is_article"] is True


LINK_LISTING = (
    "<html><head><title>Section index</title></head><body>"
    '<div id="main">'
    + "".join(
        f'<p><a href="/story/{i}">{_para(11, f"headline{i}_")}</a></p>'
        for i in range(12)
    )
    + "</div></body></html>"
)


def test_golden_link_listing_is_not_article():
    # plenty of total words (132 > 90, > 70 extracted) but short fragmented
    # blocks: avg words-per-block 11 < 25 → listing pages are not articles.
    # The old n_words >= 40 stand-in called this an article.
    got = parse_page("http://news.example/section", LINK_LISTING)
    assert got["is_article"] is False


STUB_PAGE = (
    "<html><head><title>404-ish stub</title></head><body>"
    f"<div class=\"article\"><p>{_para(30, 'sorry')}</p></div>"
    "</body></html>"
)


def test_golden_stub_page_is_not_article():
    # whole page is 30 words < 90 before-threshold
    got = parse_page("http://news.example/gone", STUB_PAGE)
    assert got["is_article"] is False


BOILERPLATE_HEAVY = (
    "<html><head><title>Teaser</title></head><body>"
    f"<div class=\"legal\">{_para(120, 'tos')}</div>"
    f"<div class=\"article\"><p>{_para(15, 'teaser')}</p></div>"
    "</body></html>"
)


def test_golden_boilerplate_heavy_teaser_is_not_article():
    # the raw page clears the before-threshold on legal boilerplate alone,
    # but the extracted article is a 15-word teaser < 70 → not an article
    got = parse_page("http://news.example/teaser", BOILERPLATE_HEAVY)
    assert got["is_article"] is False
