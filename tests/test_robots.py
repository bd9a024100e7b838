"""robots.txt parsing (RFC 9309 semantics): group selection by
most-specific user-agent, longest-path-match with Allow winning ties,
empty Disallow, crawl-delay capture, and integration with RobotsCache."""

from __future__ import annotations

from mklab_focused_crawler_ray.state.politeness import (
    RobotsCache,
    parse_robots_txt,
    robots_cache_from_txt,
)

ROBOTS = """
# example robots file
User-agent: googlebot
Disallow: /google-only/

User-agent: *
Disallow: /private/
Disallow: /tmp
Allow: /private/public/
Crawl-delay: 2.5

User-agent: mkfc-ray
User-agent: otherbot
Disallow: /ray-only/
Allow: /
"""


def test_group_selection_most_specific_agent():
    # our agent matches the 'mkfc-ray' group, not '*' and not googlebot
    r = parse_robots_txt(ROBOTS, agent="mkfc-ray")
    assert not r.allowed("/ray-only/x")
    assert r.allowed("/private/anything")  # '*' group's rules don't apply
    # an unknown agent falls back to '*'
    g = parse_robots_txt(ROBOTS, agent="someone-else")
    assert not g.allowed("/private/x")
    assert g.allowed("/public/x")
    assert g.crawl_delay == 2.5


def test_longest_match_allow_wins():
    g = parse_robots_txt(ROBOTS, agent="someone-else")
    # Allow /private/public/ is longer than Disallow /private/
    assert g.allowed("/private/public/doc.html")
    assert not g.allowed("/private/secret")
    assert not g.allowed("/tmpfile")  # prefix match, no trailing slash


def test_empty_disallow_allows_everything():
    g = parse_robots_txt("User-agent: *\nDisallow:\n", agent="x")
    assert g.allowed("/anything")
    assert g.disallow_prefixes() == []


def test_allow_tie_prefers_allow():
    txt = "User-agent: *\nDisallow: /a/\nAllow: /a/\n"
    g = parse_robots_txt(txt, agent="x")
    assert g.allowed("/a/x")  # RFC 9309: allow wins equal-length ties


def test_cache_integration_with_full_rules():
    cache = robots_cache_from_txt(
        {"example.com": ROBOTS}, agent="someone-else"
    )
    assert isinstance(cache, RobotsCache)
    assert not cache.allowed("https://example.com/private/x")
    assert cache.allowed("https://example.com/private/public/y")
    assert cache.allowed("https://other.com/private/x")  # unknown host → allow


def test_prefix_fallback_unchanged():
    cache = RobotsCache.from_table(["h.com"], ["/private/"])
    assert not cache.allowed("https://h.com/private/a")
    assert cache.allowed("https://h.com/pub")
