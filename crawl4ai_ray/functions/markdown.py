"""HTML -> Markdown generation over the stdlib DOM.

Models the reference's ``DefaultMarkdownGenerator``
(``crawl4ai/markdown_generation_strategy.py:148-260``) and its
vendored html2text engine (``crawl4ai/html2text/__init__.py``) with
the reference's default options: ``body_width=0`` (no wrapping),
``single_line_break=True`` (blocks separated by one newline),
``mark_code=True`` (fenced code blocks). The engine here is written
from scratch for the Node tree; byte-parity with html2text cannot be
verified in this sandbox (no html2text/lxml installed), so parity is
pinned instead by committed golden fixtures over the synthetic corpus.

Citations (``convert_links_to_citations``,
markdown_generation_strategy.py:82-146): markdown links are rewritten
to ``text⟨n⟩`` markers with a References section, numbering links in
first-appearance order and deduplicating by resolved URL.
"""

from __future__ import annotations

import re
from typing import Optional
from urllib.parse import urljoin

from .htmlparse import Node, parse_html

_SKIP_TAGS = frozenset({"script", "style", "head", "title", "meta", "link", "#comment", "noscript"})
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "article", "section", "main", "header", "footer", "nav",
        "aside", "ul", "ol", "li", "table", "tr", "blockquote", "pre",
        "figure", "figcaption", "h1", "h2", "h3", "h4", "h5", "h6", "hr", "form",
    }
)
_WS_RE = re.compile(r"[ \t\r\n]+")

_LINK_RE = re.compile(r"!?\[([^\]]*)\]\(([^)\s]+)(?:\s+\"[^\"]*\")?\)")


class MarkdownResult:
    __slots__ = (
        "raw_markdown",
        "markdown_with_citations",
        "references_markdown",
        "fit_markdown",
        "fit_html",
    )

    def __init__(self, raw, cits, refs, fit_md="", fit_html=""):
        self.raw_markdown = raw
        self.markdown_with_citations = cits
        self.references_markdown = refs
        self.fit_markdown = fit_md
        self.fit_html = fit_html


def _inline(node: Node, out: list) -> None:
    for c in node.children:
        if isinstance(c, str):
            out.append(_WS_RE.sub(" ", c))
            continue
        t = c.tag
        if t in _SKIP_TAGS:
            continue
        if t == "br":
            out.append("\n")
        elif t == "img":
            alt = c.get("alt", "")
            src = c.get("src", "")
            if src:
                out.append(f"![{alt}]({src})")
        elif t == "a":
            href = c.get("href", "")
            inner: list = []
            _inline(c, inner)
            text = "".join(inner).strip()
            title = c.get("title", "")
            if href:
                tpart = f' "{title}"' if title else ""
                out.append(f"[{text}]({href}{tpart})")
            else:
                out.append(text)
        elif t in ("strong", "b"):
            inner = []
            _inline(c, inner)
            s = "".join(inner).strip()
            if s:
                out.append(f"**{s}**")
        elif t in ("em", "i"):
            inner = []
            _inline(c, inner)
            s = "".join(inner).strip()
            if s:
                out.append(f"*{s}*")
        elif t == "code":
            out.append(f"`{c.text_content()}`")
        else:
            _inline(c, out)


def _table_markdown(tbl: Node, blocks: list) -> None:
    rows: list[list[str]] = []
    for tr in tbl.iter("tr"):
        cells = [
            _WS_RE.sub(" ", cell.text_content()).strip()
            for cell in tr.children
            if isinstance(cell, Node) and cell.tag in ("td", "th")
        ]
        if cells:
            rows.append(cells)
    if not rows:
        return
    cap = tbl.find("caption")
    if cap is not None:
        blocks.append(_WS_RE.sub(" ", cap.text_content()).strip())
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    header, body = rows[0], rows[1:]
    lines = ["| " + " | ".join(header) + " |", "|" + "---|" * width]
    for r in body:
        lines.append("| " + " | ".join(r) + " |")
    blocks.append("\n".join(lines))


def _walk_blocks(node: Node, blocks: list, list_depth: int = 0, ordered: bool = False):
    for c in node.children:
        if isinstance(c, str):
            s = _WS_RE.sub(" ", c).strip()
            if s:
                blocks.append(s)
            continue
        t = c.tag
        if t in _SKIP_TAGS:
            continue
        if t in ("h1", "h2", "h3", "h4", "h5", "h6"):
            inner: list = []
            _inline(c, inner)
            s = "".join(inner).strip()
            if s:
                blocks.append("#" * int(t[1]) + " " + s)
        elif t == "p":
            inner = []
            _inline(c, inner)
            s = "".join(inner).strip()
            if s:
                blocks.append(s)
        elif t == "pre":
            lang = c.get("data-language", "")
            code = c.text_content().rstrip("\n")
            blocks.append(f"```{lang}\n{code}\n```")
        elif t == "blockquote":
            inner_blocks: list = []
            _walk_blocks(c, inner_blocks)
            for b in inner_blocks:
                blocks.append("\n".join("> " + line for line in b.split("\n")))
        elif t in ("ul", "ol"):
            _walk_list(c, blocks, list_depth, ordered=(t == "ol"))
        elif t == "table":
            _table_markdown(c, blocks)
        elif t == "hr":
            blocks.append("* * *")
        elif t in _BLOCK_TAGS:
            _walk_blocks(c, blocks, list_depth, ordered)
        else:
            # inline element floating at block level: render as paragraph
            inner = []
            _inline(c, inner)
            s = "".join(inner).strip()
            if s:
                blocks.append(s)


def _walk_list(node: Node, blocks: list, depth: int, ordered: bool) -> None:
    idx = 0
    items: list[str] = []
    for c in node.children:
        if not isinstance(c, Node) or c.tag != "li":
            continue
        idx += 1
        inner: list = []
        _inline(c, inner)
        text = "".join(inner).strip()
        sub: list = []
        for g in c.children:
            if isinstance(g, Node) and g.tag in ("ul", "ol"):
                _walk_list(g, sub, depth + 1, g.tag == "ol")
        marker = f"{idx}. " if ordered else "* "
        items.append("  " * depth + marker + text)
        items.extend(sub)
    if items:
        blocks.append("\n".join(items))


def tree_to_markdown(root: Node) -> str:
    """Render a Node tree to markdown (single-newline block joins,
    mirroring the reference's ``single_line_break=True`` default)."""
    body = root.find("body") or root
    blocks: list = []
    _walk_blocks(body, blocks)
    md = "\n".join(b for b in blocks if b)
    # reference post-fix: dedent accidentally indented fences
    # (markdown_generation_strategy.py:214)
    md = md.replace("    ```", "```")
    return md


def html_to_markdown(html: str | bytes) -> str:
    return tree_to_markdown(parse_html(html))


def convert_links_to_citations(markdown: str, base_url: str = "") -> tuple[str, str]:
    """Rewrite ``[text](url)`` to ``text⟨n⟩`` + References section
    (reference: markdown_generation_strategy.py:82-146)."""
    url_index: dict[str, int] = {}
    url_text: dict[str, str] = {}

    def repl(m: re.Match) -> str:
        text, url = m.group(1), m.group(2)
        is_image = m.group(0).startswith("!")
        resolved = urljoin(base_url, url) if base_url else url
        if resolved not in url_index:
            url_index[resolved] = len(url_index) + 1
            url_text[resolved] = text
        n = url_index[resolved]
        if is_image:
            return f"![{text}⟨{n}⟩]"
        return f"{text}⟨{n}⟩"

    cited = _LINK_RE.sub(repl, markdown)
    refs = ["", "⟨ References ⟩", ""]
    for u, n in url_index.items():
        refs.append(f"⟨{n}⟩ {u}")
    return cited, "\n".join(refs)


def generate_markdown(
    html: str | bytes,
    base_url: str = "",
    content_filter=None,
) -> MarkdownResult:
    """Full markdown result: raw + citations (+ fit via filter).

    ``content_filter`` is a callable ``tree -> list[html str]`` (the
    PruningContentFilter protocol); filtered fragments are wrapped in
    a div and re-converted, as the reference does
    (markdown_generation_strategy.py:236-239).
    """
    tree = parse_html(html)
    raw = tree_to_markdown(tree)
    cited, refs = convert_links_to_citations(raw, base_url)
    fit_md, fit_html = "", ""
    if content_filter is not None:
        fragments = content_filter(tree)
        fit_html = "<div>" + "\n".join(fragments) + "</div>"
        fit_md = html_to_markdown(fit_html)
    return MarkdownResult(raw, cited, refs, fit_md, fit_html)
