"""Small CSS selector engine for the stdlib Node DOM.

Supports the subset real-world extraction schemas use (the reference
delegates to BeautifulSoup/cssselect — unavailable here):

* type, ``*``, ``.class``, ``#id``
* attribute tests ``[attr]``, ``[attr=v]``, ``[attr*=v]``, ``[attr^=v]``,
  ``[attr$=v]`` (quoted or bare values)
* compound selectors (``div.item#main[data-x=1]``)
* combinators: descendant (whitespace) and child (``>``)
* selector lists (``a, b``) — document-order, deduplicated
* ``:nth-of-type(n)`` (1-based integer)

Used by ``stages/json_extract.py`` (JsonCssExtractionStrategy).
"""

from __future__ import annotations

import re
from typing import List, Optional

from .htmlparse import Node

_TOKEN_RE = re.compile(
    r"""
    (?P<tag>\*|[a-zA-Z][\w-]*)
  | \.(?P<cls>[\w-]+)
  | \#(?P<id>[\w-]+)
  | \[(?P<attr>[\w-]+)(?:(?P<op>[*^$]?=)(?P<q>['"]?)(?P<val>[^\]'"]*)(?P=q))?\]
  | :nth-of-type\((?P<nth>\d+)\)
    """,
    re.X,
)


class _Simple:
    __slots__ = ("tag", "classes", "id", "attrs", "nth")

    def __init__(self):
        self.tag: Optional[str] = None
        self.classes: List[str] = []
        self.id: Optional[str] = None
        self.attrs: List[tuple] = []  # (name, op, value)
        self.nth: Optional[int] = None

    def matches(self, node: Node) -> bool:
        if node.tag.startswith("#"):
            return False
        if self.tag and self.tag != "*" and node.tag != self.tag:
            return False
        if self.id and node.get("id") != self.id:
            return False
        if self.classes:
            ncls = node.classes()
            if any(c not in ncls for c in self.classes):
                return False
        for name, op, val in self.attrs:
            got = node.attrs.get(name)
            if got is None:
                return False
            if op is None:
                continue
            got = str(got)
            if op == "=" and got != val:
                return False
            if op == "*=" and val not in got:
                return False
            if op == "^=" and not got.startswith(val):
                return False
            if op == "$=" and not got.endswith(val):
                return False
        if self.nth is not None:
            parent = node.parent
            if parent is None:
                return False
            same = [
                c for c in parent.children if isinstance(c, Node) and c.tag == node.tag
            ]
            if node not in same or same.index(node) + 1 != self.nth:
                return False
        return True


def _parse_compound(s: str) -> _Simple:
    simple = _Simple()
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise ValueError(f"unsupported selector fragment: {s[pos:]!r}")
        if m.group("tag"):
            simple.tag = m.group("tag")
        elif m.group("cls"):
            simple.classes.append(m.group("cls"))
        elif m.group("id"):
            simple.id = m.group("id")
        elif m.group("attr"):
            op = m.group("op") or None
            simple.attrs.append((m.group("attr"), op, m.group("val")))
        elif m.group("nth"):
            simple.nth = int(m.group("nth"))
        pos = m.end()
    return simple


def _parse_sequence(selector: str) -> List[tuple]:
    """-> [(combinator, _Simple)] where combinator in {' ', '>'}"""
    parts = re.split(r"\s*(>)\s*|\s+", selector.strip())
    seq: List[tuple] = []
    comb = " "
    for p in parts:
        if p is None or p == "":
            continue
        if p == ">":
            comb = ">"
            continue
        seq.append((comb, _parse_compound(p)))
        comb = " "
    return seq


def _descendants(node: Node):
    yield from node.iter()


def _children(node: Node):
    for c in node.children:
        if isinstance(c, Node):
            yield c


def select(root: Node, selector: str) -> List[Node]:
    """All elements under ``root`` matching the selector list, in
    document order."""
    results: List[Node] = []
    seen: set = set()
    for sel in selector.split(","):
        sel = sel.strip()
        if not sel:
            continue
        seq = _parse_sequence(sel)
        if not seq:
            continue
        current = [root]
        for comb, simple in seq:
            nxt: List[Node] = []
            gen = _descendants if comb == " " else _children
            for base in current:
                for cand in gen(base):
                    if simple.matches(cand):
                        nxt.append(cand)
            current = nxt
        for n in current:
            if id(n) not in seen:
                seen.add(id(n))
                results.append(n)
    # document order
    order: dict = {}

    def index_tree(n: Node, counter=[0]):
        for c in n.children:
            if isinstance(c, Node):
                order[id(c)] = counter[0]
                counter[0] += 1
                index_tree(c, counter)

    index_tree(root)
    results.sort(key=lambda n: order.get(id(n), -1))
    return results
