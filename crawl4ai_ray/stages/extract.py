"""The extraction kernel — the hot `map_batches` stage of the crawl.

Reproduces the semantics of the reference's scrape+markdown chain
(``LXMLWebScrapingStrategy._scrap``,
crawl4ai/content_scraping_strategy.py:615-1010; ``_process_element``
:231-378; ``process_image`` :410-515; metadata
crawl4ai/utils.py:1497-1580; markdown chain
crawl4ai/async_webcrawler.py:715-971) as a **pure function**
``(url, html) -> row`` with no I/O. The function is wrapped by
``ExtractBatch`` for zero-copy Arrow ``map_batches``.

Scale notes: stateless task stage; the per-page cost is the stdlib
HTML parse (the reference uses lxml/C — not available here). Batches
stay Arrow end-to-end; heavy input column is ``html: large_binary``.
"""

from __future__ import annotations

import json
from typing import Optional

import pyarrow as pa

from ..functions.htmlparse import Node, parse_html
from ..functions.markdown import generate_markdown, tree_to_markdown
from ..functions.urls import get_base_domain, is_external_url, normalize_url

# reference: content_scraping_strategy removes these outright
_STRIP_TAGS = frozenset({"script", "style", "link", "meta", "noscript", "#comment"})
# boilerplate containers excluded from the text/fit path — the
# reference PruningContentFilter's excluded tag set minus the ones
# already stripped (content_filter_strategy.py:101-111)
BOILERPLATE_TAGS = frozenset({"nav", "footer", "header", "aside", "form", "iframe"})
_IMG_FORMATS = (".jpg", ".jpeg", ".png", ".gif", ".webp", ".avif", ".svg")
IMAGE_SCORE_THRESHOLD = 2  # reference: crawl4ai/config.py:95


def extract_metadata(tree: Node) -> dict:
    """Title/description/keywords/author + og:/twitter:/article: meta
    (reference: utils.py:1497-1580)."""
    meta: dict = {}
    head = tree.find("head") or tree
    title_el = head.find("title")
    meta["title"] = title_el.text_content().strip() if title_el is not None else None
    for m in head.iter("meta"):
        name = (m.get("name") or "").lower()
        prop = (m.get("property") or "").lower()
        content = m.get("content") or ""
        if name == "description":
            meta.setdefault("description", content)
        elif name == "keywords":
            meta.setdefault("keywords", content)
        elif name == "author":
            meta.setdefault("author", content)
        if prop.startswith(("og:", "twitter:", "article:")) or name.startswith(
            ("og:", "twitter:", "article:")
        ):
            meta[prop or name] = content
    if not meta.get("title"):
        meta["title"] = meta.get("og:title") or meta.get("twitter:title")
    if "description" not in meta:
        meta["description"] = meta.get("og:description") or ""
    return meta


def _extract_links(tree: Node, url: str, base_domain: str):
    """Link walk (reference: content_scraping_strategy.py:245-312).

    Hrefs normalized with the full ``normalize_url``; first occurrence
    wins (dict keyed by normalized href, insertion-ordered) — this
    order defines frontier discovery order downstream.
    """
    base_el = tree.find("base")
    if base_el is not None:
        bh = base_el.get("href", "").strip()
        if bh:
            url = bh
    internal: dict = {}
    external: dict = {}
    for a in tree.iter("a"):
        href = a.get("href", "").strip()
        if not href:
            continue
        normalized = normalize_url(href, url)
        if normalized is None:
            continue
        data = {
            "href": normalized,
            "text": a.text_content().strip(),
            "title": a.get("title", "").strip(),
            "base_domain": base_domain,
        }
        if is_external_url(normalized, base_domain):
            data["base_domain"] = get_base_domain(normalized)
            external.setdefault(normalized, data)
        else:
            internal.setdefault(normalized, data)
    return list(internal.values()), list(external.values())


def _score_image(img: Node, idx: int, total: int) -> int:
    """Image usefulness score (reference:
    content_scraping_strategy.py:410-515; threshold config.py:95)."""
    score = 0

    def _dim(attr: str) -> int:
        try:
            return int(str(img.get(attr, "0")).rstrip("px") or 0)
        except ValueError:
            return 0

    if _dim("width") > 150:
        score += 1
    if _dim("height") > 150:
        score += 1
    if img.get("alt", ""):
        score += 1
    if total and idx < total * 0.5:
        score += 1
    src = img.get("src", "").lower()
    if any(src.split("?")[0].endswith(f) for f in _IMG_FORMATS):
        score += 1
    if img.get("srcset") or img.get("data-src"):
        score += 1
    return score


def _extract_media(tree: Node) -> list[dict]:
    imgs = list(tree.iter("img"))
    total = len(imgs)
    out = []
    for idx, img in enumerate(imgs):
        score = _score_image(img, idx, total)
        if score >= IMAGE_SCORE_THRESHOLD:
            out.append(
                {
                    "src": img.get("src", ""),
                    "alt": img.get("alt", ""),
                    "score": score,
                    "type": "image",
                    "width": img.get("width", ""),
                }
            )
    return out


def _extract_tables(tree: Node) -> list[dict]:
    """Data-table extraction with the reference's layout-vs-data
    scoring threshold spirit (table_extraction.py:66-296): headers
    from thead/th, rows aligned to header width."""
    tables = []
    for tbl in tree.iter("table"):
        score = 0
        if tbl.find("thead") is not None:
            score += 2
        if tbl.find("tbody") is not None:
            score += 1
        if tbl.find("th") is not None:
            score += 2
        if tbl.find("caption") is not None:
            score += 2
        if tbl.get("role") == "presentation":
            score -= 3
        rows_all = []
        for tr in tbl.iter("tr"):
            cells = [
                c.text_content().strip()
                for c in tr.children
                if isinstance(c, Node) and c.tag in ("td", "th")
            ]
            if cells:
                rows_all.append(cells)
        if len(rows_all) >= 2 and len(rows_all[0]) >= 2:
            score += 2
        if score < 7:
            continue
        headers = rows_all[0] if rows_all else []
        body = rows_all[1:]
        width = len(headers)
        body = [r[:width] + [""] * max(0, width - len(r)) for r in body]
        cap = tbl.find("caption")
        tables.append(
            {
                "headers": headers,
                "rows": body,
                "caption": cap.text_content().strip() if cap is not None else "",
                "row_count": len(body),
                "column_count": width,
            }
        )
    return tables


def extract_article_text(tree: Node) -> str:
    """Boilerplate-free text: join of ``<p>`` blocks outside
    nav/header/footer/aside containers with a blank-line separator.

    This is the column under the byte-identity invariant: for corpus
    pages it must equal the source document text exactly
    (``split('\\n\\n')`` + escape round-trips are exact inverses).
    """
    paras = []
    for p in tree.iter("p"):
        if p.has_ancestor(BOILERPLATE_TAGS):
            continue
        paras.append(p.text_content())
    return "\n\n".join(paras)


def _clean_tree(tree: Node, excluded_tags: frozenset = frozenset()) -> None:
    strip = _STRIP_TAGS | excluded_tags
    tree.remove_children(lambda n: n.tag in strip)


def scrape_page(
    url: str,
    html: bytes | str,
    *,
    excluded_tags: tuple = (),
    with_citations: bool = True,
    with_fit: bool = True,
    with_fit_html: bool = True,
    fit_html_mode: str = "fast",
    fit_strategy: str = "boilerplate",
) -> dict:
    """The pure extract kernel: one page in, one result row out."""
    try:
        tree = parse_html(html)
    except Exception as e:  # malformed beyond recovery
        return {
            "url": url,
            "success": False,
            "error_message": f"parse error: {e}",
            "head_fingerprint": "",
            "fit_html": "",
            "cleaned_html": "",
            "text": "",
            "raw_markdown": "",
            "markdown_with_citations": "",
            "references_markdown": "",
            "fit_markdown": "",
            "title": "",
            "metadata": "{}",
            "links_internal": [],
            "links_external": [],
            "images": [],
            "tables": [],
        }

    base_domain = get_base_domain(url)
    metadata = extract_metadata(tree)
    internal, external = _extract_links(tree, url, base_domain)
    images = _extract_media(tree)
    tables = _extract_tables(tree)
    text = extract_article_text(tree)

    # cache-validation fingerprint over the raw head
    # (utils.py:2847-2905; column on fetch_result per SURVEY §1.3)
    from ..functions.page_utils import compute_head_fingerprint

    if isinstance(html, (bytes, bytearray, memoryview)):
        _raw = bytes(html).decode("utf-8", "replace")
    else:
        _raw = html
    m_head = _raw[: _raw.find("</head>") + 7] if "</head>" in _raw[:65536] else _raw[:4096]
    head_fingerprint = compute_head_fingerprint(m_head)

    _clean_tree(tree, frozenset(excluded_tags))
    cleaned_html = tree.serialize()
    # reference chain: markdown is generated from the serialized
    # cleaned_html string (content_source="cleaned_html",
    # markdown_generation_strategy.py:148-243), re-tokenized by the
    # byte-parity engine — same double-parse the reference pays.
    content_filter = None
    if with_fit and fit_strategy == "pruning":
        from .content_filters import PruningContentFilter

        content_filter = lambda _html: PruningContentFilter().filter_tree(tree)  # noqa: E731
    md = generate_markdown(
        cleaned_html, base_url=url, content_filter=content_filter,
        citations=with_citations,
    )
    raw_md = md.raw_markdown
    cited, refs = (md.markdown_with_citations, md.references_markdown) if with_citations else ("", "")
    fit_md = md.fit_markdown
    if with_fit and fit_strategy != "pruning":
        tree.remove_children(lambda n: n.tag in BOILERPLATE_TAGS)
        fit_md = tree_to_markdown(tree)

    fit_html = ""
    if with_fit_html:
        from ..functions.page_utils import preprocess_html_for_schema, preprocess_tree_for_schema

        if fit_html_mode == "exact":
            # reference call site parses the raw page again
            # (async_webcrawler.py:816) — 2x parse cost
            fit_html = preprocess_html_for_schema(
                _raw, text_threshold=500, max_size=300_000
            )
        else:
            # fast path: reuse the already-parsed tree (post fit_md, so
            # boilerplate tags are already gone — a documented deviation
            # that avoids a second full HTML parse in the hot stage)
            fit_html = preprocess_tree_for_schema(
                tree, text_threshold=500, max_size=300_000
            )

    return {
        "url": url,
        "success": True,
        "error_message": "",
        "head_fingerprint": head_fingerprint,
        "fit_html": fit_html,
        "cleaned_html": cleaned_html,
        "text": text,
        "raw_markdown": raw_md,
        "markdown_with_citations": cited,
        "references_markdown": refs,
        "fit_markdown": fit_md,
        "title": metadata.get("title") or "",
        "metadata": json.dumps(metadata, ensure_ascii=False, sort_keys=True),
        "links_internal": internal,
        "links_external": external,
        "images": images,
        "tables": tables,
    }


LINK_TYPE = pa.list_(
    pa.struct(
        [
            ("href", pa.string()),
            ("text", pa.string()),
            ("title", pa.string()),
            ("base_domain", pa.string()),
        ]
    )
)
IMAGE_TYPE = pa.list_(
    pa.struct(
        [
            ("src", pa.string()),
            ("alt", pa.string()),
            ("score", pa.int32()),
            ("type", pa.string()),
            ("width", pa.string()),
        ]
    )
)
TABLE_TYPE = pa.list_(
    pa.struct(
        [
            ("headers", pa.list_(pa.string())),
            ("rows", pa.list_(pa.list_(pa.string()))),
            ("caption", pa.string()),
            ("row_count", pa.int32()),
            ("column_count", pa.int32()),
        ]
    )
)

RESULT_FIELDS = [
    ("url", pa.string()),
    ("success", pa.bool_()),
    ("error_message", pa.string()),
    ("head_fingerprint", pa.string()),
    ("fit_html", pa.string()),
    ("cleaned_html", pa.string()),
    ("text", pa.string()),
    ("raw_markdown", pa.string()),
    ("markdown_with_citations", pa.string()),
    ("references_markdown", pa.string()),
    ("fit_markdown", pa.string()),
    ("title", pa.string()),
    ("metadata", pa.string()),
    ("links_internal", LINK_TYPE),
    ("links_external", LINK_TYPE),
    ("images", IMAGE_TYPE),
    ("tables", TABLE_TYPE),
]
RESULT_SCHEMA = pa.schema(RESULT_FIELDS)


def _link_field(d: dict) -> dict:
    return {
        "href": d["href"],
        "text": d["text"],
        "title": d["title"],
        "base_domain": d["base_domain"],
    }


def extract_batch(batch: pa.Table, **opts) -> pa.Table:
    """Arrow-in/Arrow-out extract stage. Expects columns
    ``url: string`` and ``html: binary``; emits RESULT_SCHEMA plus any
    pass-through columns present (status_code, depth, ...)."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    rows = [scrape_page(u, h if h is not None else b"", **opts) for u, h in zip(urls, htmls)]

    cols: dict[str, list] = {name: [] for name, _ in RESULT_FIELDS}
    for r in rows:
        for name, _ in RESULT_FIELDS:
            v = r[name]
            if name in ("links_internal", "links_external"):
                v = [_link_field(d) for d in v]
            cols[name].append(v)
    arrays = [pa.array(cols[name], type=typ) for name, typ in RESULT_FIELDS]
    out = pa.Table.from_arrays(arrays, schema=RESULT_SCHEMA)
    # pass through non-conflicting input columns (depth, parent, order keys)
    for name in batch.column_names:
        if name not in ("url", "html", "text", "lang") and name not in out.column_names:
            out = out.append_column(name, batch.column(name))
    return out


class ExtractBatch:
    """Actor-pool form for `map_batches` — precompiles nothing today
    but keeps the stateful seam (models, schemas) the reference's
    strategy classes have (extraction_strategy.py:86-148)."""

    def __init__(self, **opts):
        self.opts = opts

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_batch(batch, **self.opts)
