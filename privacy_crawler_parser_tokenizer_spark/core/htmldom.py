"""Minimal HTML DOM built on the stdlib ``html.parser.HTMLParser``.

The reference pipeline parses HTML with BeautifulSoup's ``html.parser``
tree builder (reference: src/parser-tokenizer.py:276, src/crawler.py:101,
src/verification/verify.py:96).  bs4 is not available here, and a port
would miss the point anyway — this module defines the *canonical* DOM
semantics for the whole engine: the same parser is used by the
sequential oracle and inside the Arrow UDFs, so the distributed plans
are bit-identical to the oracle by construction.

Implements only what the engine needs:
  * tag tree with text / comment nodes,
  * void elements and a small set of HTML5 implied-end-tag rules,
  * ``find_all`` (DFS document order, optional ``recursive=False``),
  * ``get_text`` / ``stripped_strings`` (bs4-compatible shapes),
  * ``string`` property (bs4 single-string semantics,
    reference: src/crawler.py:106 uses ``link.string``),
  * ``decompose`` (reference: src/verification/verify.py:80-81).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# When tag K is opened and the innermost open element is in IMPLIED_END[K],
# that element is closed first (subset of the HTML5 tree-construction
# rules; enough for real-world policy pages).
_P_CLOSERS = frozenset(
    "p h1 h2 h3 h4 h5 h6 ul ol li div table blockquote pre section article "
    "aside main nav header footer form address fieldset figure hr dl".split()
)
IMPLIED_END: dict[str, frozenset] = {
    "li": frozenset(["li"]),
    "option": frozenset(["option"]),
    "tr": frozenset(["tr", "td", "th"]),
    "td": frozenset(["td", "th"]),
    "th": frozenset(["td", "th"]),
    "dd": frozenset(["dd", "dt"]),
    "dt": frozenset(["dd", "dt"]),
}
for _t in _P_CLOSERS:
    IMPLIED_END[_t] = IMPLIED_END.get(_t, frozenset()) | frozenset(["p"])

_WS_RE = re.compile(r"\s+")


class TextNode:
    __slots__ = ("text", "parent")

    def __init__(self, text: str, parent: "Node | None" = None):
        self.text = text
        self.parent = parent

    def __repr__(self):  # pragma: no cover
        return f"TextNode({self.text!r})"


class CommentNode:
    __slots__ = ("text", "parent")

    def __init__(self, text: str, parent: "Node | None" = None):
        self.text = text
        self.parent = parent

    def __repr__(self):  # pragma: no cover
        return f"CommentNode({self.text!r})"


class Node:
    """An element node. ``name == "[document]"`` for the root."""

    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: dict | None = None,
                 parent: "Node | None" = None):
        self.name = name
        self.attrs = attrs or {}
        self.children: list = []
        self.parent = parent

    # -- tree navigation ------------------------------------------------
    def child_tags(self):
        """Direct element children (comments/text skipped) in order."""
        return [c for c in self.children if isinstance(c, Node)]

    def find_all(self, names, recursive: bool = True):
        """All descendant (or child) elements matching ``names``.

        ``names`` may be a string, an iterable of strings, or a compiled
        regex-like object with ``.match``.  DFS pre-order = document order.
        """
        if isinstance(names, str):
            pred = lambda n: n == names  # noqa: E731
        elif hasattr(names, "match"):
            pred = lambda n: bool(names.match(n))  # noqa: E731
        else:
            nameset = frozenset(names)
            pred = lambda n: n in nameset  # noqa: E731

        out: list[Node] = []
        if recursive:
            stack = list(reversed(self.children))
            while stack:
                c = stack.pop()
                if isinstance(c, Node):
                    if pred(c.name):
                        out.append(c)
                    stack.extend(reversed(c.children))
        else:
            for c in self.children:
                if isinstance(c, Node) and pred(c.name):
                    out.append(c)
        return out

    # -- text extraction ------------------------------------------------
    def get_text(self, separator: str = "") -> str:
        """Concatenated descendant text (comments excluded)."""
        parts: list[str] = []
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, TextNode):
                parts.append(c.text)
            elif isinstance(c, Node):
                stack.extend(reversed(c.children))
        return separator.join(parts)

    def stripped_strings(self):
        """Yield each descendant text node stripped, skipping empties
        (bs4 ``.stripped_strings``, used by strip_text:
        reference src/verification/verify.py:104)."""
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, TextNode):
                s = c.text.strip()
                if s:
                    yield _WS_RE.sub(" ", s)
            elif isinstance(c, Node):
                stack.extend(reversed(c.children))

    @property
    def string(self):
        """bs4 ``.string``: the single text child (recursing through a
        single element child), else None."""
        node = self
        while True:
            kids = [c for c in node.children if not isinstance(c, CommentNode)]
            if len(kids) != 1:
                return None
            (only,) = kids
            if isinstance(only, TextNode):
                return only.text
            node = only

    # -- mutation ---------------------------------------------------------
    def decompose_all(self, names) -> None:
        """Remove every descendant element whose name is in ``names``
        (reference remove_bad_tags, src/verification/verify.py:70-82)."""
        nameset = frozenset(names)

        def _prune(node: Node):
            kept = []
            for c in node.children:
                if isinstance(c, Node):
                    if c.name in nameset:
                        continue
                    _prune(c)
                kept.append(c)
            node.children = kept

        _prune(self)

    def __repr__(self):  # pragma: no cover
        return f"<{self.name} children={len(self.children)}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack: list[Node] = [self.root]

    # implied end tags ---------------------------------------------------
    def _implied_close(self, tag: str):
        closers = IMPLIED_END.get(tag)
        if not closers:
            return
        while len(self.stack) > 1 and self.stack[-1].name in closers:
            self.stack.pop()

    def handle_starttag(self, tag, attrs):
        self._implied_close(tag)
        node = Node(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._implied_close(tag)
        node = Node(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore (lenient, like html.parser builders)

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(TextNode(data, self.stack[-1]))

    def handle_comment(self, data):
        self.stack[-1].children.append(CommentNode(data, self.stack[-1]))


def parse_html(html) -> Node:
    """Parse an HTML string (or bytes) into a DOM; lenient, never raises
    on malformed markup (mirrors bs4 ``html.parser`` leniency)."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        pass  # keep whatever tree was built; caller gates on emptiness
    return builder.root
