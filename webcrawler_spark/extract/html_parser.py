"""Minimal HTML5-subset tree parser for extraction parity.

The reference parses with golang.org/x/net/html (full WHATWG algorithm,
fetcher.go:181-198). This sandbox has no HTML5-spec parser (no lxml /
html5lib / selectolax), so we build a tree on top of ``html.parser`` with the
subset of HTML5 tree-construction behavior the extractor observes
(SURVEY.md section 1.3):

- entity decoding in text and attribute values (convert_charrefs), with raw
  text elements (script/style) left undecoded — matching x/net/html;
- RCDATA elements (title/textarea): tags literal, entities decoded;
- noscript treated as raw text (x/net/html default: scripting enabled) and
  its content suppressed — its single text child would be excluded by the
  immediate-parent rule anyway, and elements inside it never fire handlers;
- void elements never take children;
- adjacent character data merged into one text node (x/net/html addText),
  with comment nodes kept in the tree as merge barriers;
- a handful of implied-end-tag rules (p/li/dt/dd/tr/td/th/option) so common
  unclosed markup nests like an HTML5 parser would.

Out-of-scope (documented divergences, avoided in fixtures): foster
parenting in tables, implied <html>/<head>/<body> synthesis (the extractor's
observable defaults are reproduced downstream), adoption-agency reparenting,
template content fragments.
"""

from __future__ import annotations

import html as _htmllib
from html.parser import HTMLParser

DOCUMENT = "document"
ELEMENT = "element"
TEXT = "text"
COMMENT = "comment"

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# html.parser raw-text (no entity decoding); title/textarea are RCDATA so we
# decode their entities after the fact.
_CDATA_ELEMENTS = ("script", "style", "title", "textarea")
_RCDATA_DECODE = frozenset({"title", "textarea"})
_SUPPRESS = frozenset({"noscript"})

# element -> set of open tags it implicitly closes when it starts
_IMPLIED_END = {
    "p": {"p"},
    "li": {"li"},
    "dt": {"dt", "dd"},
    "dd": {"dt", "dd"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "option": {"option"},
}


class Node:
    """Tree node mirroring the fields the extractor reads from html.Node."""

    __slots__ = ("type", "data", "attrs", "parent", "children")

    def __init__(self, type_: str, data: str = "", attrs=None):
        self.type = type_
        self.data = data  # tag name (lowercase) for elements, text for text
        self.attrs: list[tuple[str, str]] = attrs or []
        self.parent: Node | None = None
        self.children: list[Node] = []

    def append(self, child: "Node") -> None:
        child.parent = self
        self.children.append(child)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Node({self.type!r}, {self.data!r}, kids={len(self.children)})"


class _TreeBuilder(HTMLParser):
    CDATA_CONTENT_ELEMENTS = _CDATA_ELEMENTS

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node(DOCUMENT)
        self.stack: list[Node] = [self.root]
        self._suppress_depth = 0

    # -- helpers -----------------------------------------------------------
    @property
    def _top(self) -> Node:
        return self.stack[-1]

    def _add_text(self, data: str) -> None:
        if not data:
            return
        parent = self._top
        # x/net/html addText: merge into a preceding text-node sibling
        if parent.children and parent.children[-1].type == TEXT:
            parent.children[-1].data += data
        else:
            parent.append(Node(TEXT, data))

    # -- tag events --------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if self._suppress_depth:
            if tag in _SUPPRESS:
                self._suppress_depth += 1
            return
        closes = _IMPLIED_END.get(tag)
        if closes and self._top.type == ELEMENT and self._top.data in closes:
            self.stack.pop()
        node = Node(ELEMENT, tag, [(k, v if v is not None else "") for k, v in attrs])
        self._top.append(node)
        if tag in _SUPPRESS:
            self._suppress_depth = 1
            return
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        # HTML5: the trailing slash is ignored for non-void elements — the
        # element stays open (x/net/html behavior); for void it's moot.
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        if self._suppress_depth:
            if tag in _SUPPRESS:
                self._suppress_depth -= 1
            return
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].type == ELEMENT and self.stack[i].data == tag:
                node = self.stack[i]
                if tag in _RCDATA_DECODE:
                    for child in node.children:
                        if child.type == TEXT:
                            child.data = _htmllib.unescape(child.data)
                del self.stack[i:]
                return
        # unmatched end tag: ignored

    # -- data events -------------------------------------------------------
    def handle_data(self, data: str) -> None:
        if self._suppress_depth:
            return
        self._add_text(data)

    def handle_comment(self, data: str) -> None:
        if self._suppress_depth:
            return
        self._top.append(Node(COMMENT, data))

    def handle_decl(self, decl: str) -> None:  # <!DOCTYPE ...> — ignored
        pass

    def handle_pi(self, data: str) -> None:  # processing instruction — ignored
        pass

    def unknown_decl(self, data: str) -> None:
        pass


def parse_html(content: str) -> Node:
    """Parse HTML into a document tree. Never raises on malformed markup
    (mirrors x/net/html, whose Parse effectively never errors)."""
    builder = _TreeBuilder()
    builder.feed(content)
    builder.close()
    return builder.root


def iter_preorder(root: Node):
    """Explicit-stack pre-order DFS, children pushed last-to-first — the
    exact traversal of the reference (extractor.go:58-75)."""
    stack = [root]
    while stack:
        node = stack.pop()
        yield node
        stack.extend(reversed(node.children))
