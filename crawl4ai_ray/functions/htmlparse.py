"""Minimal DOM built on the stdlib ``html.parser``.

The reference engine parses with lxml (C extension,
``crawl4ai/content_scraping_strategy.py:615-1010``); lxml is not
available in this environment, so the extract kernel builds a small
tree with ``html.parser`` instead. The tree supports exactly what the
scrape/markdown/pruning stages need: tag/attrs/children traversal,
text content, removal, and serialization.

Entity handling: ``convert_charrefs=True`` (the default) decodes
entities in text nodes, matching lxml's ``.text_content()`` behavior,
so escaped document text round-trips byte-identically.
"""

from __future__ import annotations

from html import escape
from html.parser import HTMLParser
from typing import Iterator, Optional

VOID_TAGS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

# Tags whose raw content is CDATA-like (parser emits it as data)
RAW_TEXT_TAGS = frozenset({"script", "style"})


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: Optional[dict] = None, parent=None):
        self.tag = tag  # "#text" for text nodes, "#comment" for comments
        self.attrs = attrs or {}
        self.children: list = []  # Node or str (text)
        self.parent = parent

    # -- construction -----------------------------------------------------
    def add_text(self, data: str) -> None:
        self.children.append(data)

    def add_child(self, node: "Node") -> "Node":
        node.parent = self
        self.children.append(node)
        return node

    # -- queries ----------------------------------------------------------
    def get(self, key: str, default: str = "") -> str:
        # valueless attributes (<a title>) parse as None; lxml — whose
        # semantics the extract kernel mirrors — yields "" for them
        v = self.attrs.get(key)
        return default if v is None else v

    def iter(self, tag: Optional[str] = None) -> Iterator["Node"]:
        """Depth-first pre-order over element nodes (document order)."""
        for c in self.children:
            if isinstance(c, Node):
                if tag is None or c.tag == tag:
                    yield c
                yield from c.iter(tag)

    def collect(self, tags: tuple) -> dict:
        """One pre-order walk collecting nodes for several tags at once
        (the extract kernel's walks fused: link/media/table/para scans
        each cost a full traversal otherwise)."""
        out: dict = {t: [] for t in tags}
        stack = [self]
        while stack:
            node = stack.pop()
            if node is not self and node.tag in out:
                out[node.tag].append(node)
            kids = node.children
            for i in range(len(kids) - 1, -1, -1):
                c = kids[i]
                if isinstance(c, Node):
                    stack.append(c)
        return out

    def find(self, tag: str) -> Optional["Node"]:
        for n in self.iter(tag):
            return n
        return None

    def text_content(self) -> str:
        """All descendant text concatenated (entities already decoded)."""
        parts: list[str] = []
        self._collect_text(parts)
        return "".join(parts)

    def _collect_text(self, parts: list) -> None:
        for c in self.children:
            if isinstance(c, str):
                parts.append(c)
            elif c.tag not in ("#comment",):
                c._collect_text(parts)

    def classes(self) -> list[str]:
        return self.get("class", "").split()

    def has_ancestor(self, tags: frozenset) -> bool:
        p = self.parent
        while p is not None:
            if p.tag in tags:
                return True
            p = p.parent
        return False

    # -- mutation ---------------------------------------------------------
    def remove(self) -> None:
        if self.parent is not None:
            self.parent.children = [c for c in self.parent.children if c is not self]
            self.parent = None

    def remove_children(self, pred) -> None:
        """Recursively drop element children matching pred."""
        kept = []
        for c in self.children:
            if isinstance(c, Node):
                if pred(c):
                    c.parent = None
                    continue
                c.remove_children(pred)
            kept.append(c)
        self.children = kept

    # -- serialization ----------------------------------------------------
    def serialize(self) -> str:
        out: list[str] = []
        self._serialize_into(out)
        return "".join(out)

    def _serialize_into(self, out: list) -> None:
        if self.tag == "#text":
            return
        if self.tag == "#comment":
            return
        if self.tag == "#root":
            for c in self.children:
                if isinstance(c, str):
                    out.append(escape(c, quote=False))
                else:
                    c._serialize_into(out)
            return
        attrs = "".join(
            f' {k}' if v is None else f' {k}="{escape(str(v), quote=True)}"'
            for k, v in self.attrs.items()
        )
        raw = self.tag in RAW_TEXT_TAGS
        out.append(f"<{self.tag}{attrs}>")
        if self.tag in VOID_TAGS:
            return
        for c in self.children:
            if isinstance(c, str):
                out.append(c if raw else escape(c, quote=False))
            else:
                c._serialize_into(out)
        out.append(f"</{self.tag}>")


# Element-nesting cap: pages deeper than this keep their content but
# lose further structure (children attach at the cap level). Browsers
# apply similar caps; every tree walker here recurses, so depth must
# stay well under Python's recursion limit.
MAX_TREE_DEPTH = 240


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs))
        self.stack[-1].add_child(node)
        if tag not in VOID_TAGS and len(self.stack) < MAX_TREE_DEPTH:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].add_child(Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        # pop to the nearest matching open tag; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].add_text(data)

    def handle_comment(self, data):
        node = Node("#comment")
        node.add_text(data)
        self.stack[-1].add_child(node)


def parse_html(html: str | bytes) -> Node:
    """Parse HTML into a Node tree (root is a '#root' container)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root
