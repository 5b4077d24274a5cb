"""HTML -> Markdown generation (reference ``DefaultMarkdownGenerator``).

Byte-parity surface (pinned by ``tests/golden/markdown_goldens.parquet``,
generated from the reference's own engine — see
tests/golden/gen_markdown_goldens.py):

* raw markdown — ``CustomHTML2Text`` semantics via
  :mod:`crawl4ai_ray.functions.md_engine` under the reference defaults
  (``markdown_generation_strategy.py:180-191``: body_width=0,
  single_line_break, mark_code) plus the ``"    ```" -> "```"`` dedent
  post-fix (:214);
* citations — ``convert_links_to_citations``
  (markdown_generation_strategy.py:82-146): ``text⟨n⟩`` markers,
  first-appearance numbering keyed by the *resolved* URL, a
  ``## References`` section with ``⟨n⟩ url: title - text`` lines;
* fit markdown — filter fragments each wrapped in ``<div>..</div>``,
  newline-joined, converted by the *same emitter instance* as the raw
  pass (:236-243 reuses ``h``).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from .md_engine import MarkdownEmitter, emit_markdown

# Markdown link/image syntax accepted by the reference's citation pass
# (markdown_generation_strategy.py:11) — one level of balanced nested
# brackets in the text, balanced parens in the target, optional title.
MD_LINK_SYNTAX = re.compile(
    r'!?\[((?:[^\[\]]|\[(?:[^\[\]]|\[[^\]]*\])*\])*)\]'
    r'\(((?:[^()\s]|\([^()]*\))*)(?:\s+"([^"]*)")?\)'
)

_ABSOLUTE_PREFIXES = ("http://", "https://", "mailto:")


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


def _resolve_citation_url(base_url: str, url: str) -> str:
    """Reference ``fast_urljoin`` (markdown_generation_strategy.py:14-22)
    — note the deliberate quirk that a root-relative path is appended to
    the *full* base string, not the origin."""
    if url.startswith(("http://", "https://", "mailto:", "//")):
        return url
    if url.startswith("/"):
        return (base_url[:-1] if base_url.endswith("/") else base_url) + url
    return urljoin(base_url, url)


def convert_links_to_citations(markdown: str, base_url: str = "") -> tuple[str, str]:
    """Rewrite ``[text](url)`` / ``![alt](url)`` into ``text⟨n⟩`` /
    ``![alt⟨n⟩]`` markers plus a references section."""
    numbered: dict[str, tuple[int, str]] = {}
    resolved_cache: dict[str, str] = {}
    pieces: list[str] = []
    cursor = 0

    for m in MD_LINK_SYNTAX.finditer(markdown):
        pieces.append(markdown[cursor : m.start()])
        text, url, title = m.groups()
        if base_url and not url.startswith(_ABSOLUTE_PREFIXES):
            if url not in resolved_cache:
                resolved_cache[url] = _resolve_citation_url(base_url, url)
            url = resolved_cache[url]
        if url not in numbered:
            desc = []
            if title:
                desc.append(title)
            if text and text != title:
                desc.append(text)
            numbered[url] = (
                len(numbered) + 1,
                ": " + " - ".join(desc) if desc else "",
            )
        num = numbered[url][0]
        if m.group(0).startswith("!"):
            pieces.append(f"![{text}⟨{num}⟩]")
        else:
            pieces.append(f"{text}⟨{num}⟩")
        cursor = m.end()
    pieces.append(markdown[cursor:])

    refs = ["\n\n## References\n\n"]
    refs.extend(
        f"⟨{num}⟩ {url}{desc}\n"
        for url, (num, desc) in sorted(numbered.items(), key=lambda kv: kv[1][0])
    )
    return "".join(pieces), "".join(refs)


def html_to_markdown(html: str | bytes, base_url: str = "", **options) -> str:
    """Raw-markdown half of ``generate_markdown`` (no citations/fit)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    return emit_markdown(html, baseurl=base_url, **options).replace("    ```", "```")


def tree_to_markdown(tree) -> str:
    """Convert an htmlparse Node tree (serialize + emit; the reference
    likewise re-parses the serialized cleaned_html string)."""
    return html_to_markdown(tree.serialize())


def generate_markdown(
    html: str | bytes,
    base_url: str = "",
    content_filter=None,
    citations: bool = True,
    html2text_options: dict | None = None,
) -> MarkdownResult:
    """Full markdown result: raw + citations (+ fit via filter).

    ``content_filter`` is a callable ``html str -> list[html str]``
    (the RelevantContentFilter.filter_content protocol); fragments are
    each wrapped in a div, newline-joined and re-converted with the
    same emitter (markdown_generation_strategy.py:236-243).
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")

    emitter = MarkdownEmitter(baseurl=base_url)
    opts = dict(
        body_width=0,
        ignore_emphasis=False,
        ignore_links=False,
        ignore_images=False,
        protect_links=False,
        single_line_break=True,
        mark_code=True,
        escape_snob=False,
    )
    if html2text_options:
        opts.update(html2text_options)
    emitter.update_params(**opts)

    try:
        raw = emitter.convert(html).replace("    ```", "```")
    except Exception as e:
        # reference containment (markdown_generation_strategy.py:211-213)
        raw = f"Error converting HTML to markdown: {str(e)}"

    cited, refs = (raw, "")
    if citations:
        try:
            cited, refs = convert_links_to_citations(raw, base_url)
        except Exception as e:
            cited, refs = raw, f"Error generating citations: {str(e)}"

    fit_md, fit_html = "", ""
    if content_filter is not None:
        try:
            if hasattr(content_filter, "filter_content"):
                # reference RelevantContentFilter protocol
                fragments = content_filter.filter_content(html)
            else:
                fragments = content_filter(html)
            fit_html = "\n".join("<div>{}</div>".format(s) for s in fragments)
            fit_md = emitter.convert(fit_html)
        except Exception as e:
            fit_md = f"Error generating fit markdown: {str(e)}"
            fit_html = ""
    return MarkdownResult(raw, cited, refs, fit_md, fit_html)
