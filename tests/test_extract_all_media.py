"""extractAllImages / extractVideos parity (ArticleExtractionBolt.java:
475-549 and :552-596 — both DEAD CODE at reference HEAD; implemented for
completeness with the reference's quirks pinned here)."""

from __future__ import annotations

from mklab_focused_crawler_ray.functions.javahash import java_string_hashcode
from mklab_focused_crawler_ray.stages.extract import (
    extract_all_images,
    extract_videos,
)

BASE = "http://news.example.test/story/1"

HTML = """
<html><head><title>Big Story</title></head><body>
<div class="article">
  <img src="/a.jpg" width="300" height="250" alt="in content">
  <p>text</p>
</div>
<div class="sidebar">
  <img src="/b.jpg" width="640" height="480" alt="outside content">
  <img src="/c.jpg" width="20" height="20" alt="too small">
  <img src="/d.jpg" alt="no dims">
  <img src="/e.jpg" width="60%" height="480" alt="percent dims">
  <img src="/f.gif" width="300" height="300" alt="gif">
  <img src="/g.jpg" width="300" height="300">
</div>
<object data="/movie.mp4" width="640" height="480"></object>
<object width="1" height="1"></object>
<object data=""></object>
</body></html>
"""


def test_all_images_walks_whole_document_with_reference_filters():
    rows = extract_all_images(BASE, HTML, shares=7)
    urls = [r["media_url"] for r in rows]
    # in-content AND out-of-content both present (whole-document walk)
    assert "http://news.example.test/a.jpg" in urls
    assert "http://news.example.test/b.jpg" in urls
    # too-small filtered; missing dims filtered; .gif filtered
    assert "http://news.example.test/c.jpg" not in urls
    assert "http://news.example.test/d.jpg" not in urls
    assert "http://news.example.test/f.gif" not in urls
    # NON-NUMERIC dims fall through the size filter (reference has no
    # continue in the catch — ArticleExtractionBolt.java:501-503)
    e = [r for r in rows if r["media_url"].endswith("/e.jpg")]
    assert len(e) == 1 and e[0]["width"] == -1 and e[0]["height"] == -1
    # Jsoup attr() gives "" for missing alt → the null-fallback is dead;
    # empty alt stays empty (not replaced by the title)
    g = [r for r in rows if r["media_url"].endswith("/g.jpg")]
    assert g[0]["alt"] == ""
    # id scheme + carried fields
    a = [r for r in rows if r["media_url"].endswith("/a.jpg")][0]
    h = java_string_hashcode("http://news.example.test/a.jpg") & 0x7FFFFFFF
    assert a["media_id"] == f"Web#{h}"
    assert a["description"] == "Big Story" and a["shares"] == 7
    assert all(r["type"] == "image" for r in rows)


def test_videos_object_walk_and_reference_bug_flag():
    rows = extract_videos(BASE, HTML, shares=3)
    assert len(rows) == 1  # objects without data / empty data are skipped
    v = rows[0]
    assert v["media_url"] == "http://news.example.test/movie.mp4"
    ph = java_string_hashcode(BASE) & 0x7FFFFFFF
    vh = java_string_hashcode("http://news.example.test/movie.mp4") & 0x7FFFFFFF
    assert v["media_id"] == f"Web#{ph}_{vh}"
    assert v["type"] == "video" and v["thumbnail"] == v["media_url"]
    assert v["shares"] == 3
    # the reference method never adds to its list → always returns []
    assert extract_videos(BASE, HTML, reference_bug_compatible=True) == []


def test_empty_and_malformed_html():
    assert extract_all_images(BASE, "", 0) == []
    assert extract_videos(BASE, "", 0) == []
    assert extract_videos(BASE, "<object data='/x.mp4'", 0) in ([], [
        {
            "media_id": extract_videos(BASE, "<object data='/x.mp4'>", 0)[0][
                "media_id"
            ],
            "media_url": "http://news.example.test/x.mp4",
            "type": "video",
            "thumbnail": "http://news.example.test/x.mp4",
            "page_url": BASE,
            "shares": 0,
        }
    ])
