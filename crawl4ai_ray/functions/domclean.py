"""cleaned_html pruning passes of the reference scrape kernel.

Implements, over this repo's stdlib Node tree, the tree-mutation
passes ``LXMLWebScrapingStrategy._scrap`` applies before serializing
``cleaned_html`` (reference ``content_scraping_strategy.py``):

* ``remove_empty_elements_fast`` (:517-575) — bottom-up removal of
  childless low-word elements, skipping structural/void tags and
  anything inside ``pre``/``code``;
* ``remove_unwanted_attributes_fast`` (:577-612) — keep only
  ``IMPORTANT_ATTRS`` (config.py:51) and optionally ``data-*``;
* mermaid-SVG replacement with fenced code blocks (:728-790);
* script removal with tail-text preservation (:799-815) — tails are
  sibling strings in this tree so survival is structural, but the walk
  mirrors the reference's element set;
* ``only_text`` flattening over ``ONLY_TEXT_ELIGIBLE_TAGS``
  (config.py:52-74, kernel :861-869);
* base64 image src cleanup (:871-874);
* css_selector / target_elements content subsetting (:705-729) via the
  repo CSS engine — selected nodes are deep-copied into a fresh
  ``<div>`` exactly as the reference wraps them.
"""

from __future__ import annotations

import re
from typing import Optional

from .cssselect import select
from .htmlparse import Node

# reference config.py:51
IMPORTANT_ATTRS = frozenset(
    {"src", "href", "alt", "title", "width", "height", "class", "id", "rowspan", "colspan"}
)

# reference config.py:52-74
ONLY_TEXT_ELIGIBLE_TAGS = frozenset(
    {
        "b", "i", "u", "span", "del", "ins", "sub", "sup", "strong", "em",
        "code", "kbd", "var", "s", "q", "abbr", "cite", "dfn", "time",
        "small", "mark",
    }
)

# reference content_scraping_strategy.py:529-539
_EMPTY_BYPASS_TAGS = frozenset(
    {"a", "img", "br", "hr", "input", "meta", "link", "source", "track", "wbr", "tr", "td", "th"}
)

BASE64_SRC = re.compile(r'data:image/[^;]+;base64,([^"]+)')


def clone_node(node: Node) -> Node:
    """Deep copy (reference uses copy.deepcopy on lxml elements)."""
    dup = Node(node.tag, dict(node.attrs))
    for c in node.children:
        if isinstance(c, Node):
            dup.add_child(clone_node(c))
        else:
            dup.children.append(c)
    return dup


def _post_order(node: Node, out: list) -> None:
    for c in node.children:
        if isinstance(c, Node):
            _post_order(c, out)
            out.append(c)


def remove_empty_elements(root: Node, word_count_threshold: int = 5) -> Node:
    """Bottom-up single pass dropping element nodes with fewer than
    ``word_count_threshold`` words and no element children; structural
    and void tags are kept, as is anything under pre/code where
    whitespace-only spans are significant."""
    nodes: list[Node] = []
    _post_order(root, nodes)
    for el in nodes:  # post-order == reference's reversed(descendants)
        if el.tag in _EMPTY_BYPASS_TAGS or el.tag in ("#comment", "#text"):
            continue
        if el.has_ancestor(frozenset({"pre", "code"})):
            continue
        if any(isinstance(c, Node) for c in el.children):
            continue
        if len(el.text_content().strip().split()) < word_count_threshold:
            # sibling text ("tails") lives in the parent's child list in
            # this tree model, so removal preserves it by construction
            el.remove()
    return root


def remove_unwanted_attributes(
    root: Node,
    important_attrs: Optional[frozenset] = None,
    keep_data_attributes: bool = False,
) -> Node:
    keep = IMPORTANT_ATTRS if important_attrs is None else important_attrs
    stack = [root]
    while stack:
        el = stack.pop()
        if el.tag not in ("#comment", "#text"):
            if el.attrs:
                el.attrs = {
                    k: v
                    for k, v in el.attrs.items()
                    if k in keep
                    or (keep_data_attributes and k.startswith("data-"))
                }
            stack.extend(c for c in el.children if isinstance(c, Node))
    return root


def replace_mermaid_svgs(root: Node) -> None:
    """Rewrite ``<svg id="mermaid-*">`` into a mermaid code fence (or a
    plain span inside pre) carrying the diagram's visible labels."""
    for svg in list(root.iter("svg")):
        if not svg.get("id", "").startswith("mermaid-"):
            continue
        diagram_type = svg.get("aria-roledescription", "diagram")
        labels: list[str] = []
        seen: set[str] = set()
        for el in select(svg, ".nodeLabel") + select(svg, ".label span") + select(
            svg, ".edgeLabel span"
        ):
            text = el.text_content().strip()
            if text and text not in seen:
                seen.add(text)
                labels.append(text)
        if not labels:
            for el in svg.iter():
                if el.tag in ("text", "tspan"):
                    direct = "".join(
                        c for c in el.children if isinstance(c, str)
                    ).strip()
                    if direct and direct not in seen:
                        seen.add(direct)
                        labels.append(direct)
        if not labels:
            continue
        if svg.has_ancestor(frozenset({"pre"})):
            placeholder = Node("span")
            placeholder.add_text("\n".join(labels))
        else:
            placeholder = Node("pre", {"data-language": "mermaid"})
            code = Node("code", {"class": "language-mermaid"})
            code.add_text(f"%% {diagram_type} diagram\n" + "\n".join(labels))
            placeholder.add_child(code)
        _replace(svg, placeholder)


def _replace(old: Node, new: Node) -> None:
    parent = old.parent
    if parent is None:
        return
    new.parent = parent
    parent.children = [new if c is old else c for c in parent.children]
    old.parent = None


def strip_to_text(root: Node) -> None:
    """``only_text`` mode: replace inline formatting elements that have
    direct text with a span of their full text content
    (kernel :861-869)."""
    for tag in ONLY_TEXT_ELIGIBLE_TAGS:
        for el in list(root.iter(tag)):
            if any(isinstance(c, str) and c for c in el.children):
                span = Node("span")
                span.add_text(el.text_content())
                _replace(el, span)


def clean_base64_images(root: Node) -> None:
    for img in root.iter("img"):
        src = img.get("src", "")
        if src and BASE64_SRC.match(src):
            img.attrs["src"] = BASE64_SRC.sub("", src)


def remove_tags(root: Node, tags) -> None:
    """Delete whole subtrees for the given tag names (sibling text is
    preserved by the child-list model — matches the reference's
    tail-reattaching script removal)."""
    tagset = frozenset(tags)
    if tagset:
        root.remove_children(lambda n: n.tag in tagset)


def remove_selector(root: Node, selector: str) -> None:
    """Delete every node matched by a CSS selector group."""
    if not selector:
        return
    try:
        victims = select(root, selector)
    except Exception:
        return
    for el in victims:
        el.remove()


def remove_comments(root: Node) -> None:
    root.remove_children(lambda n: n.tag == "#comment")


def subset_content(
    root: Node,
    css_selector: Optional[str] = None,
    target_elements: Optional[list] = None,
) -> Node:
    """Pick the cleaned_html serialization root (kernel :705-729):
    ``css_selector`` wraps deep copies of its matches in a div (falling
    back to the whole body when nothing matches); ``target_elements``
    then re-selects within that content element.  Link/media walks are
    unaffected — they always run over the full body, as in the
    reference."""
    content: Optional[Node] = None
    if css_selector:
        try:
            matched = select(root, css_selector)
        except Exception:
            matched = []
        if matched:
            content = Node("div")
            for el in matched:
                content.add_child(clone_node(el))
        else:
            content = root
    if target_elements:
        source = content if content is not None else root
        gathered: list[Node] = []
        for sel in target_elements:
            try:
                gathered.extend(select(source, sel))
            except Exception:
                continue
        content = Node("div")
        for el in gathered:
            content.add_child(clone_node(el))
    return content if content is not None else root
