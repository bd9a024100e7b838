"""Real-HTML DOM extraction — Boilerpipe-grade stand-in on stdlib only.

The round-1 extractor was a fixture-dialect regex (quoted attributes,
``<div class="article">`` only); this module replaces the parse with a
tolerant ``html.parser`` DOM walk plus a content-block heuristic in the
spirit of Boilerpipe's ARTICLE_EXTRACTOR (ArticleExtractionBolt.java:296-322)
and the ImageExtractor content gate (utils/ImageExtractor.java:126-144):

- tree building tolerates unquoted/sloppy attributes, unclosed tags, nested
  divs, and skips <script>/<style> text;
- content container selection: an element whose ``class`` contains
  ``article`` wins outright (the reference runs an *article* extractor);
  otherwise the block element with the highest Boilerpipe-ish score
  ``text_len × (1 − link_density)`` over its <p> descendants; pages with no
  such block fall back to <body>;
- "content images" are <img> nodes INSIDE the chosen container — the DOM
  equivalent of the reference's content-bitset position gate;
- every downstream filter constant (size / area / url length / .gif / alt
  fallback / Java-hashCode media id) is unchanged and lives in
  stages/extract.py.

No third-party HTML library exists in this environment (lxml/selectolax
unavailable), so the parser is stdlib ``html.parser`` — the per-page work
is one linear parse plus small tree walks, vectorization-friendly at the
map_batches level (one kernel call per Arrow batch).
"""

from __future__ import annotations

from html.parser import HTMLParser

_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_BLOCK_TAGS = frozenset(["div", "article", "section", "main", "td", "body"])


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict, parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # Node or str (text)
        self.parent = parent


class TreeBuilder(HTMLParser):
    """Tolerant DOM builder: mismatched end tags pop to the nearest matching
    open tag (or are ignored), void elements never push, script/style text
    is dropped."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs}, self.cur)
        self.cur.children.append(node)
        if tag in _VOID:
            return
        self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(
            Node(tag, {k: (v if v is not None else "") for k, v in attrs}, self.cur)
        )

    def handle_endtag(self, tag):
        if tag in _VOID:
            return
        node = self.cur
        while node is not self.root and node.tag != tag:
            node = node.parent
        if node is self.root:
            return  # stray end tag — ignore
        self.cur = node.parent or self.root

    def _in_skip(self) -> bool:
        # skip state derives from the OPEN-ANCESTOR chain, not a counter: a
        # mismatched end tag that pops past an unclosed <script> must not
        # leave text suppression stuck on (ADVICE r2, low)
        n = self.cur
        while n is not None:
            if n.tag in ("script", "style"):
                return True
            n = n.parent
        return False

    def handle_data(self, data):
        if data and not self._in_skip():
            self.cur.children.append(data)


def parse_dom(html: str) -> Node:
    tb = TreeBuilder()
    tb.feed(html)
    tb.close()
    return tb.root


def iter_nodes(node: Node):
    """Depth-first document-order iterator over element nodes."""
    for c in node.children:
        if isinstance(c, Node):
            yield c
            yield from iter_nodes(c)


def node_text(node: Node) -> str:
    """Concatenated descendant text."""
    parts: list[str] = []

    def walk(n: Node):
        for c in n.children:
            if isinstance(c, Node):
                walk(c)
            else:
                parts.append(c)

    walk(node)
    return "".join(parts)


def first_tag(root: Node, tag: str) -> Node | None:
    for n in iter_nodes(root):
        if n.tag == tag:
            return n
    return None


def _link_text_len(node: Node) -> int:
    total = 0
    for n in iter_nodes(node):
        if n.tag == "a":
            total += len(node_text(n).strip())
    return total


def _para_text_len(node: Node) -> int:
    return sum(
        len(node_text(p).strip()) for p in iter_nodes(node) if p.tag == "p"
    )


def _depth(n: Node) -> int:
    d = 0
    while n.parent is not None:
        n, d = n.parent, d + 1
    return d


def select_content_node(root: Node) -> Node | None:
    """The content container. Priority: class contains 'article' (first in
    document order) → best Boilerpipe-ish block score → <body> fallback.

    An ancestor's score always includes its descendants' text, so raw argmax
    degenerates to <body>; instead, pick the DEEPEST block whose score is
    within 90% of the maximum — the smallest container that still holds the
    bulk of the content (Boilerpipe's densest-block idea)."""
    scored: list[tuple[float, int, Node]] = []
    for n in iter_nodes(root):
        if n.tag not in _BLOCK_TAGS:
            continue
        cls = n.attrs.get("class", "")
        if "article" in cls.split() or n.tag == "article":
            return n
        ptext = _para_text_len(n)
        if ptext == 0:
            continue
        total = len(node_text(n).strip()) or 1
        link_density = min(1.0, _link_text_len(n) / total)
        scored.append((ptext * (1.0 - link_density), _depth(n), n))
    if not scored:
        return first_tag(root, "body")
    best_score = max(s for s, _, _ in scored)
    _, _, node = max(
        (t for t in scored if t[0] >= 0.9 * best_score),
        key=lambda t: t[1],
    )
    return node


_SEGMENT_TAGS = _BLOCK_TAGS | frozenset(
    ["p", "li", "ul", "ol", "table", "tr", "blockquote", "pre",
     "h1", "h2", "h3", "h4", "h5", "h6", "br", "header", "footer",
     "nav", "aside", "form"]
)


def text_blocks(root: Node) -> list[str]:
    """Segment the WHOLE document into text blocks the way Boilerpipe's SAX
    input does: a block is a maximal text run not crossing a block-level tag
    boundary (inline tags like <a>/<b>/<span> do not split). These are the
    'before' blocks for the quality estimator — computed on the raw DOM,
    independent of content-container selection."""
    blocks: list[str] = []
    buf: list[str] = []

    def flush():
        if buf:
            t = " ".join("".join(buf).split())
            if t:
                blocks.append(t)
            buf.clear()

    def walk(n: Node):
        for c in n.children:
            if isinstance(c, Node):
                if c.tag in _SEGMENT_TAGS:
                    flush()
                    walk(c)
                    flush()
                else:
                    walk(c)
            else:
                buf.append(c)

    walk(root)
    flush()
    return blocks


def extract_structure(html: str) -> dict:
    """One-pass DOM extraction: title, paragraph texts of the content
    container, whole-document text blocks (for the quality estimator),
    content-gated <img> attr dicts, all out-link hrefs (document order)."""
    root = parse_dom(html)
    tnode = first_tag(root, "title")
    title = node_text(tnode).strip() if tnode is not None else ""
    content = select_content_node(root)
    paras: list[str] = []
    imgs: list[dict] = []
    if content is not None:
        for n in iter_nodes(content):
            if n.tag == "p":
                paras.append(node_text(n).strip())
            elif n.tag == "img":
                imgs.append(n.attrs)
        if not paras:
            # container without <p> structure: its own normalized text
            own = node_text(content).strip()
            if own:
                paras = [own]
    hrefs = [
        n.attrs["href"]
        for n in iter_nodes(root)
        if n.tag == "a" and n.attrs.get("href")
    ]
    return {
        "title": title,
        "paras": paras,
        "blocks": text_blocks(root),
        "imgs": imgs,
        "hrefs": hrefs,
    }
