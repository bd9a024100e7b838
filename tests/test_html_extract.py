"""Real-HTML extraction goldens: the DOM walk must handle markup the old
fixture-regex parser could not — unquoted attributes, nested divs, script/
style noise, missing article class (heuristic content selection), stray end
tags — while keeping the reference-exact downstream filters."""

from __future__ import annotations

from mklab_focused_crawler_ray.stages.extract import parse_page
from mklab_focused_crawler_ray.stages.html_extract import extract_structure

MESSY = """<HTML><head><TITLE> Messy &amp; Proud </TITLE>
<script>var x = "<p>not content</p>";</script>
<style>.a { content: "<img src=x>"; }</style>
</head>
<body>
<div class=nav><a href=/home>home</a> <a href='/about'>about</a></div>
<div class="wrapper outer">
  <div class="article body">
    <p>First paragraph with enough words to talk about the weather and the
    news of the day in a long rambling fashion that clears the gate, since
    the estimator now demands ninety words across the page, seventy in the
    extracted article and twenty five per block on average before it will
    call anything an article at all.</p>
    <p>Second <b>bold</b> paragraph continues the article body text here
    with more words to pad the count beyond the low quality cutoff, going
    on at considerable length about nothing in particular purely so that
    this block also averages comfortably past the per block word floor the
    quality estimator enforces.</p>
    <img src=/imgs/big.jpg width=300 height=250 alt="hero image">
    <img src="/imgs/tiny.png" width=10 height=10>
    <img src="/imgs/anim.gif" width=400 height=400>
    <img src="/imgs/nodims.jpg">
  </div>
</div>
<div class="comments"><p>short spam</p></div>
</body></html>"""


def test_messy_html_extraction():
    got = parse_page("http://ex.com/a/b", MESSY)
    assert got["title"] == "Messy & Proud"
    # both paragraphs, bold inline text preserved, comments div excluded
    assert "First paragraph" in got["text"]
    assert "Second bold paragraph" in got["text"]
    assert "short spam" not in got["text"]
    assert got["is_article"]
    # filters: only big.jpg survives (size gate, .gif gate, missing dims)
    assert [m["media_url"] for m in got["media"]] == ["http://ex.com/imgs/big.jpg"]
    assert got["media"][0]["alt"] == "hero image"
    # out_links resolved against base; both nav styles parsed
    assert got["out_links"] == ["http://ex.com/home", "http://ex.com/about"]


def test_heuristic_content_selection_without_article_class():
    html = """<html><head><title>T</title></head><body>
    <div id="sidebar"><p><a href="/x">one link paragraph</a></p></div>
    <div id="main">
      <p>The actual long content of this page lives here and goes on for a
      good number of words so its score dominates everything else on page.</p>
      <p>More real content text in a second paragraph of the main block.</p>
      <img src="/c.jpg" width="500" height="400">
    </div>
    </body></html>"""
    got = parse_page("http://h.com/", html)
    assert "actual long content" in got["text"]
    assert "one link paragraph" not in got["text"]
    # content gate: the image inside the selected block survives
    assert [m["media_url"] for m in got["media"]] == ["http://h.com/c.jpg"]


def test_link_density_penalizes_nav_blocks():
    s = extract_structure(
        """<html><body>
        <div><p><a href="/1">aaa</a> <a href="/2">bbb</a> <a href="/3">ccc</a></p></div>
        <div><p>plain prose text of a similar length to the links above</p></div>
        </body></html>"""
    )
    assert s["paras"] == ["plain prose text of a similar length to the links above"]


def test_stray_and_unclosed_tags_do_not_crash():
    html = "<html><body></section><div class=article><p>words " * 3 + "</html>"
    got = parse_page("http://x.com/", html)
    assert "words" in got["text"]


def test_alt_fallback_to_title():
    html = (
        "<html><head><title>Page Title</title></head><body>"
        '<div class="article"><p>text</p>'
        '<img src="/i.jpg" width=250 height=250></div></body></html>'
    )
    got = parse_page("http://x.com/", html)
    assert got["media"][0]["alt"] == "Page Title"


def test_script_content_never_leaks():
    s = extract_structure(
        "<html><body><div class=article><p>real</p>"
        "<script>document.write('<p>fake</p>')</script></div></body></html>"
    )
    assert s["paras"] == ["real"]
