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
from ..functions.markdown import generate_markdown, tree_to_markdown  # noqa: F401 (public seam)
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


def _parse_srcset(s: str) -> list[dict]:
    """srcset attribute parser (reference content_scraping_strategy.py:42-59)."""
    variants = []
    for part in (s or "").split(","):
        bits = part.strip().split()
        if bits:
            width = (
                bits[1].rstrip("w").split(".")[0]
                if len(bits) > 1 and bits[1].endswith("w")
                else None
            )
            variants.append({"url": bits[0], "width": width})
    return variants


def _closest_useful_text(el: Node, min_words: int = 1) -> Optional[str]:
    """Nearest ancestor whose leading text has >= min_words words
    (reference find_closest_parent_with_useful_text :379-394)."""
    cur = el
    while cur is not None:
        # lxml ``current.text`` = text before the first element child;
        # truthy whitespace counts, matching the reference check
        lead = (
            cur.children[0]
            if cur.children and isinstance(cur.children[0], str)
            else None
        )
        if lead and len(cur.text_content().split()) >= min_words:
            return cur.text_content().strip()
        cur = cur.parent
    return None


def _walk_links(
    tree: Node,
    url: str,
    base_domain: str,
    *,
    exclude_domains: frozenset = frozenset(),
    exclude_external_links: bool = False,
    score_links: bool = False,
    page_context: Optional[dict] = None,
    nodes: Optional[dict] = None,
):
    """Link walk (reference _process_element,
    content_scraping_strategy.py:245-312): first occurrence of each
    normalized href wins (defines frontier discovery order); excluded
    external links are DELETED from the tree so cleaned_html and
    markdown no longer carry them."""
    if nodes is None:
        nodes = tree.collect(("base", "a"))
    base_list = nodes.get("base", [])
    base_el = base_list[0] if base_list else None
    if base_el is not None:
        bh = base_el.get("href", "").strip()
        if bh:
            url = bh
    internal: dict = {}
    external: dict = {}
    for a in nodes["a"]:
        href = a.get("href", "").strip()
        if not href:
            continue
        try:
            normalized = normalize_url(href, url)
        except Exception:
            # reference wraps each link ("Error processing link",
            # _process_element :310-312) — malformed hrefs are skipped
            continue
        if normalized is None:
            continue
        data = {
            "href": normalized,
            "text": a.text_content().strip(),
            "title": a.get("title", "").strip(),
            "base_domain": base_domain,
            "intrinsic_score": 0.0,
        }
        if score_links and page_context is not None:
            from ..functions.page_utils import calculate_link_intrinsic_score

            try:
                data["intrinsic_score"] = float(
                    calculate_link_intrinsic_score(
                        link_text=data["text"],
                        url=normalized,
                        title_attr=data["title"],
                        class_attr=a.get("class", ""),
                        rel_attr=a.get("rel", ""),
                        page_context=page_context,
                    )
                )
            except Exception:
                data["intrinsic_score"] = 0.0
        if is_external_url(normalized, base_domain):
            link_domain = get_base_domain(normalized)
            data["base_domain"] = link_domain
            if exclude_external_links or link_domain in exclude_domains:
                a.remove()
                continue
            external.setdefault(normalized, data)
        else:
            internal.setdefault(normalized, data)
    return list(internal.values()), list(external.values())


_ICONISH = ("button", "icon", "logo")
_IMG_FORMAT_NAMES = ("jpg", "jpeg", "png", "webp", "avif", "gif")


def _process_image(img: Node, idx: int, total: int, *, image_score_threshold: int) -> Optional[list[dict]]:
    """Full image scoring + variant collection (reference
    process_image, content_scraping_strategy.py:410-515)."""
    style = img.get("style", "")
    alt = img.get("alt", "")
    src = img.get("src", "")
    data_src = img.get("data-src", "")
    srcset = img.get("srcset", "")
    data_srcset = img.get("data-srcset", "")

    if "display:none" in style:
        return None
    parent = img.parent
    if parent is not None and parent.tag in ("button", "input"):
        return None
    if parent is not None and any(
        any(mark in cls for mark in _ICONISH) for cls in parent.classes()
    ):
        return None
    if (src and any(mark in src for mark in _ICONISH)) or (
        alt and any(mark in alt for mark in _ICONISH)
    ):
        return None

    score = 0
    width = img.get("width")
    if width and width.isdigit() and int(width) > 150:
        score += 1
    height = img.get("height")
    if height and height.isdigit() and int(height) > 150:
        score += 1
    if alt:
        score += 1
    score += int(total > 0 and idx / total < 0.5)

    detected_format = None
    for candidate in (src, data_src, srcset, data_srcset):
        if candidate:
            hits = [f for f in _IMG_FORMAT_NAMES if f in candidate.lower()]
            if hits:
                detected_format = hits[0]
                score += 1
                break
    if srcset or data_srcset:
        score += 1
    in_picture = img.has_ancestor(frozenset({"picture"}))
    if in_picture:
        score += 1

    if score <= image_score_threshold:
        return None

    seen_urls: set[str] = set()
    variants: list[dict] = []
    base_info = {
        "alt": alt,
        "desc": _closest_useful_text(img),
        "score": score,
        "type": "image",
        "group_id": idx,
        "format": detected_format,
    }

    def add_variant(vsrc: str, vwidth: Optional[str] = None) -> None:
        if vsrc and not vsrc.startswith("data:") and vsrc not in seen_urls:
            seen_urls.add(vsrc)
            variants.append({**base_info, "src": vsrc, "width": vwidth})

    add_variant(src)
    add_variant(data_src)
    for srcset_attr in (srcset, data_srcset):
        for v in _parse_srcset(srcset_attr):
            add_variant(v["url"], v["width"])
    if in_picture:
        pic = img.parent
        while pic is not None and pic.tag != "picture":
            pic = pic.parent
        if pic is not None:
            for source in pic.iter("source"):
                for v in _parse_srcset(source.get("srcset", "")):
                    add_variant(v["url"], v["width"])
    for attr, value in img.attrs.items():
        if (
            attr.startswith("data-")
            and ("src" in attr or "srcset" in attr)
            and value
            and "http" in value
        ):
            add_variant(value)
    return variants or None


def _walk_media(
    tree: Node,
    base_domain: str,
    *,
    exclude_domains: frozenset = frozenset(),
    exclude_external_images: bool = False,
    image_score_threshold: int = IMAGE_SCORE_THRESHOLD,
    nodes: Optional[dict] = None,
) -> dict:
    """Image/video/audio walk with domain exclusions and <source>
    variants (reference _process_element :315-362)."""
    if nodes is None:
        nodes = tree.collect(("img", "video", "audio"))
    media: dict = {"images": [], "videos": [], "audios": []}
    imgs = nodes["img"]
    total = len(imgs)
    for idx, img in enumerate(imgs):
        src = img.get("src") or ""
        img_domain = get_base_domain(src)
        if (img_domain and img_domain in exclude_domains) or (
            exclude_external_images and is_external_url(src, base_domain)
        ):
            img.remove()
            continue
        try:
            variants = _process_image(
                img, idx, total, image_score_threshold=image_score_threshold
            )
        except Exception:
            variants = None  # reference: "Error processing image" -> skip
        if variants:
            media["images"].extend(variants)
    for media_tag, key in (("video", "videos"), ("audio", "audios")):
        for elem in nodes[media_tag]:
            info = {
                "src": elem.get("src") or None,
                "alt": elem.get("alt") or None,
                "type": media_tag,
                "description": _closest_useful_text(elem),
            }
            media[key].append(info)
            for source in elem.iter("source"):
                s = source.get("src")
                if s:
                    media[key].append({**info, "src": s})
    return media


def _table_score(tbl: Node) -> float:
    """Data-vs-layout table score (reference
    DefaultTableExtraction.is_data_table, table_extraction.py:132-211):
    structure (+thead/tbody/th), nested-table and presentation-role
    penalties, column-count variance, caption/summary, text-to-tag
    density, data-* attribute bonus, size bonus."""
    score = 0.0
    has_thead = tbl.find("thead") is not None
    if has_thead:
        score += 2
    if tbl.find("tbody") is not None:
        score += 1
    th_count = sum(1 for _ in tbl.iter("th"))
    trs = list(tbl.iter("tr"))
    if th_count > 0:
        score += 2
        first_tr_th = bool(trs) and any(
            isinstance(c, Node) and c.tag == "th" for c in trs[0].children
        )
        if has_thead or first_tr_th:
            score += 1
    if tbl.find("table") is not None:  # nested table
        score -= 3
    if tbl.get("role", "").lower() in ("presentation", "none"):
        score -= 3
    if not trs:
        return float("-inf")
    col_counts = [
        sum(1 for c in tr.iter() if c.tag in ("td", "th")) for tr in trs
    ]
    avg_cols = sum(col_counts) / len(col_counts)
    variance = sum((c - avg_cols) ** 2 for c in col_counts) / len(col_counts)
    if variance < 1:
        score += 2
    if tbl.find("caption") is not None:
        score += 2
    if tbl.get("summary"):
        score += 1
    total_text = sum(
        len(cell.text_content().strip())
        for tr in trs
        for cell in tr.iter()
        if cell.tag in ("td", "th")
    )
    total_tags = sum(1 for _ in tbl.iter())
    text_ratio = total_text / (total_tags + 1e-5)
    if text_ratio > 20:
        score += 3
    elif text_ratio > 10:
        score += 2
    score += 0.5 * sum(1 for a in tbl.attrs if a.startswith("data-"))
    if len(trs) >= 2 and avg_cols >= 2:
        score += 2
    return score


def _extract_one_table(tbl: Node) -> dict:
    """Structured extraction with colspan duplication (reference
    extract_table_data, table_extraction.py:213-296)."""
    cap_el = tbl.find("caption")
    caption = ""
    if cap_el is not None:
        direct = next((c for c in cap_el.children if isinstance(c, str)), None)
        caption = direct.strip() if direct else ""
    summary = tbl.get("summary", "").strip()

    def _span(cell: Node) -> int:
        return int(cell.get("colspan", "1") or 1)

    headers: list[str] = []
    thead = tbl.find("thead")
    thead_tr = thead.find("tr") if thead is not None else None
    trs = list(tbl.iter("tr"))
    if thead_tr is not None:
        for cell in thead_tr.iter("th"):
            headers.extend([cell.text_content().strip()] * _span(cell))
    elif trs:
        for cell in trs[0].iter():
            if cell.tag in ("th", "td"):
                headers.extend([cell.text_content().strip()] * _span(cell))

    rows: list[list[str]] = []
    for tr in trs:
        if tr.has_ancestor(frozenset({"thead"})):
            continue
        row_data: list[str] = []
        for cell in tr.iter("td"):
            row_data.extend([cell.text_content().strip()] * _span(cell))
        if row_data:
            rows.append(row_data)

    max_columns = len(headers) if headers else (
        max(len(r) for r in rows) if rows else 0
    )
    aligned = [r[:max_columns] + [""] * (max_columns - len(r)) for r in rows]
    if not headers and max_columns > 0:
        headers = [f"Column {i + 1}" for i in range(max_columns)]

    first_tr_th = bool(trs) and any(
        isinstance(c, Node) and c.tag == "th" for c in trs[0].children
    )
    return {
        "headers": headers,
        "rows": aligned,
        "caption": caption,
        "summary": summary,
        "row_count": len(aligned),
        "column_count": max_columns,
        "has_headers": thead_tr is not None or first_tr_th,
    }


def _extract_tables(
    tree: Node,
    score_threshold: float = 7,
    min_rows: int = 0,
    min_cols: int = 0,
    nodes: Optional[dict] = None,
) -> list[dict]:
    tables = []
    table_nodes = nodes["table"] if nodes is not None else tree.iter("table")
    for tbl in table_nodes:
        try:
            if _table_score(tbl) < score_threshold:
                continue
            data = _extract_one_table(tbl)
            if min_rows > 0 and data["row_count"] < min_rows:
                continue
            if min_cols > 0 and data["column_count"] < min_cols:
                continue
            tables.append(data)
        except Exception:
            continue  # reference skips tables whose extraction throws
    return tables


def extract_article_text(tree: Node, nodes: Optional[dict] = None) -> str:
    """Boilerplate-free text: join of ``<p>`` blocks outside
    nav/header/footer/aside containers with a blank-line separator.

    This is the column under the byte-identity invariant: for corpus
    pages it must equal the source document text exactly
    (``split('\\n\\n')`` + escape round-trips are exact inverses).
    """
    paras = []
    p_nodes = nodes["p"] if nodes is not None else tree.iter("p")
    for p in p_nodes:
        if p.has_ancestor(BOILERPLATE_TAGS):
            continue
        paras.append(p.text_content())
    return "\n\n".join(paras)


def _clean_tree(tree: Node, excluded_tags: frozenset = frozenset()) -> None:
    strip = _STRIP_TAGS | excluded_tags
    tree.remove_children(lambda n: n.tag in strip)


_EMPTY_ROW_KEYS = (
    "fit_html", "cleaned_html", "text", "raw_markdown",
    "markdown_with_citations", "references_markdown", "fit_markdown",
    "title",
)

# reference config.py:75-85
SOCIAL_MEDIA_DOMAINS = (
    "facebook.com", "twitter.com", "x.com", "linkedin.com", "instagram.com",
    "pinterest.com", "tiktok.com", "snapchat.com", "reddit.com",
)


def scrape_page(
    url: str,
    html: bytes | str,
    *,
    excluded_tags: tuple = (),
    excluded_selector: str = "",
    css_selector: Optional[str] = None,
    target_elements: Optional[list] = None,
    exclude_external_links: bool = False,
    exclude_social_media_links: bool = False,
    exclude_domains: tuple = (),
    exclude_external_images: bool = False,
    exclude_all_images: bool = False,
    remove_forms: bool = False,
    remove_comments: bool = False,
    only_text: bool = False,
    keep_data_attributes: bool = False,
    image_score_threshold: int = IMAGE_SCORE_THRESHOLD,
    score_links: bool = False,
    with_citations: bool = True,
    # fit markdown requires an explicit opt-in, matching the reference:
    # DefaultMarkdownGenerator only produces fit_markdown when a
    # content_filter is configured (markdown_generation_strategy.py:230)
    with_fit: bool = False,
    with_fit_html: bool = True,
    fit_html_mode: str = "fast",
    fit_strategy: str = "boilerplate",
) -> dict:
    """The pure extract kernel: one page in, one result row out.

    Pass order mirrors the reference ``_scrap``
    (content_scraping_strategy.py:615-1010): early removals
    (images/comments/excluded tags+selector) -> metadata ->
    css_selector/target_elements content subsetting -> mermaid-SVG
    replacement -> style/script strip (tail-preserving) ->
    link/media walk with domain exclusions -> tables -> only_text ->
    base64 cleanup -> empty-element pruning -> attribute pruning ->
    serialize cleaned_html -> markdown chain.
    """
    from ..functions import domclean

    try:
        tree = parse_html(html)
    except Exception as e:  # malformed beyond recovery
        row = {
            "url": url,
            "success": False,
            "error_message": f"parse error: {e}",
            "head_fingerprint": "",
            "metadata": "{}",
            "links_internal": [],
            "links_external": [],
            "images": [],
            "videos": [],
            "audios": [],
            "tables": [],
        }
        row.update({k: "" for k in _EMPTY_ROW_KEYS})
        return row

    base_domain = get_base_domain(url)

    page_context = None
    if score_links:
        from ..functions.page_utils import extract_page_context

        title_el = tree.find("title")
        headlines = " ".join(
            h.text_content().strip()
            for tag in ("h1", "h2", "h3")
            for h in tree.iter(tag)
            if h.text_content().strip()
        )
        meta_desc = next(
            (
                m.get("content", "")
                for m in tree.iter("meta")
                if (m.get("name") or "").lower() == "description"
            ),
            "",
        )
        try:
            page_context = extract_page_context(
                title_el.text_content() if title_el is not None else "",
                headlines,
                meta_desc,
                url,
            )
        except Exception:
            page_context = {}

    # early removals (kernel :663-696)
    if exclude_all_images:
        domclean.remove_tags(tree, ("img",))
    if remove_comments:
        domclean.remove_comments(tree)
    excluded = frozenset(excluded_tags)
    if excluded:
        domclean.remove_tags(tree, excluded)
    if excluded_selector:
        domclean.remove_selector(tree, excluded_selector)

    metadata = extract_metadata(tree)

    # content subsetting deep-copies at selection time (kernel
    # :705-729), so when css_selector/target_elements match, later
    # passes that mutate the main tree (mermaid, script strip, empty/
    # attribute pruning) do NOT touch the serialized copy — the
    # reference behaves identically.
    content_root = domclean.subset_content(
        tree, css_selector=css_selector, target_elements=target_elements
    )

    domclean.replace_mermaid_svgs(tree)

    # style/link/meta/noscript + script removal (tail text survives
    # structurally in this tree model, kernel :792-815)
    domclean.remove_tags(tree, ("style", "link", "meta", "noscript", "script"))

    domains = set(exclude_domains)
    if exclude_social_media_links:
        domains.update(SOCIAL_MEDIA_DOMAINS)
    if remove_forms:
        domclean.remove_tags(tree, ("form",))

    # single fused traversal replaces six per-tag walks
    tag_nodes = tree.collect(("base", "a", "img", "video", "audio", "table", "p"))
    internal, external = _walk_links(
        tree,
        url,
        base_domain,
        exclude_domains=frozenset(domains),
        exclude_external_links=exclude_external_links,
        score_links=score_links,
        page_context=page_context,
        nodes=tag_nodes,
    )
    media = _walk_media(
        tree,
        base_domain,
        exclude_domains=frozenset(domains),
        exclude_external_images=exclude_external_images,
        image_score_threshold=image_score_threshold,
        nodes=tag_nodes,
    )
    images = media["images"]
    videos = media["videos"]
    audios = media["audios"]
    tables = [] if "table" in excluded else _extract_tables(tree, nodes=tag_nodes)
    text = extract_article_text(tree, nodes=tag_nodes)

    if only_text:
        domclean.strip_to_text(tree)
    domclean.clean_base64_images(tree)

    # cache-validation fingerprint over the raw head
    # (utils.py:2847-2905; column on fetch_result per SURVEY §1.3)
    from ..functions.page_utils import compute_head_fingerprint

    if isinstance(html, (bytes, bytearray, memoryview)):
        _raw = bytes(html).decode("utf-8", "replace")
    else:
        _raw = html
    m_head = _raw[: _raw.find("</head>") + 7] if "</head>" in _raw[:65536] else _raw[:4096]
    head_fingerprint = compute_head_fingerprint(m_head)

    # final cleaned_html pruning (kernel :876-892): drop childless
    # zero-word elements, then strip every attribute outside
    # IMPORTANT_ATTRS (+ data-* when requested)
    domclean.remove_empty_elements(tree, 1)
    domclean.remove_unwanted_attributes(
        tree, keep_data_attributes=keep_data_attributes
    )
    cleaned_html = content_root.serialize().strip()
    # reference chain: markdown is generated from cleaned_html
    # (content_source="cleaned_html",
    # markdown_generation_strategy.py:148-243).  The emitter replays
    # the pruned tree's events directly — byte-equivalent to
    # re-tokenizing the serialized string (convert_tree docstring) but
    # without the second parse the reference pays.
    from ..functions.markdown import convert_links_to_citations
    from ..functions.md_engine import MarkdownEmitter

    emitter = MarkdownEmitter(baseurl=url)
    emitter.update_params(
        body_width=0, single_line_break=True, mark_code=True,
    )
    try:
        raw_md = emitter.convert_tree(content_root).replace("    ```", "```")
    except Exception as e:
        # reference generate_markdown error containment (:211-213)
        raw_md = f"Error converting HTML to markdown: {str(e)}"
    cited, refs = ("", "")
    if with_citations:
        try:
            cited, refs = convert_links_to_citations(raw_md, url)
        except Exception as e:
            cited, refs = raw_md, f"Error generating citations: {str(e)}"
    fit_md = ""
    if with_fit:
        try:
            if fit_strategy == "pruning":
                from .content_filters import PruningContentFilter

                fragments = PruningContentFilter().filter_tree(tree)
                fit_html_str = "\n".join("<div>{}</div>".format(s) for s in fragments)
                fit_md = emitter.convert(fit_html_str)
            else:
                tree.remove_children(lambda n: n.tag in BOILERPLATE_TAGS)
                fit_md = emitter.convert_tree(tree)
        except Exception as e:
            fit_md = f"Error generating fit markdown: {str(e)}"

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
        "videos": videos,
        "audios": audios,
        "tables": tables,
    }


LINK_TYPE = pa.list_(
    pa.struct(
        [
            ("href", pa.string()),
            ("text", pa.string()),
            ("title", pa.string()),
            ("base_domain", pa.string()),
            ("intrinsic_score", pa.float64()),
        ]
    )
)
IMAGE_TYPE = pa.list_(
    pa.struct(
        [
            ("src", pa.string()),
            ("alt", pa.string()),
            ("desc", pa.string()),
            ("score", pa.int32()),
            ("type", pa.string()),
            ("group_id", pa.int32()),
            ("format", pa.string()),
            ("width", pa.string()),
        ]
    )
)
AV_TYPE = pa.list_(
    pa.struct(
        [
            ("src", pa.string()),
            ("alt", pa.string()),
            ("type", pa.string()),
            ("description", pa.string()),
        ]
    )
)
TABLE_TYPE = pa.list_(
    pa.struct(
        [
            ("headers", pa.list_(pa.string())),
            ("rows", pa.list_(pa.list_(pa.string()))),
            ("caption", pa.string()),
            ("summary", pa.string()),
            ("row_count", pa.int32()),
            ("column_count", pa.int32()),
            ("has_headers", pa.bool_()),
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
    ("videos", AV_TYPE),
    ("audios", AV_TYPE),
    ("tables", TABLE_TYPE),
]
RESULT_SCHEMA = pa.schema(RESULT_FIELDS)


def _link_field(d: dict) -> dict:
    return {
        "href": d["href"],
        "text": d["text"],
        "title": d["title"],
        "base_domain": d["base_domain"],
        "intrinsic_score": d.get("intrinsic_score", 0.0),
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


PREFETCH_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("success", pa.bool_()),
        ("error_message", pa.string()),
        ("title", pa.string()),
        ("links_internal", LINK_TYPE),
        ("links_external", LINK_TYPE),
    ]
)


def prefetch_batch(batch: pa.Table) -> pa.Table:
    """Prefetch-mode kernel (reference ``prefetch=True``,
    README.md:697-701: skip markdown/extraction/media — URL discovery
    only). Runs the SAME DOM link walk as the full kernel, so a
    prefetch crawl's frontier, seen set and crawl order are identical
    to a full crawl's; everything else (markdown, media, tables,
    cleaned_html, fit) is skipped for a ~2.5x lighter page cost."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    o_url, o_succ, o_err, o_title, o_int, o_ext = [], [], [], [], [], []
    for u, h in zip(urls, htmls):
        try:
            tree = parse_html(h if h is not None else b"")
            base_domain = get_base_domain(u)
            title_el = tree.find("title")
            nodes = tree.collect(("base", "a"))
            internal, external = _walk_links(tree, u, base_domain, nodes=nodes)
            o_url.append(u)
            o_succ.append(True)
            o_err.append("")
            o_title.append(title_el.text_content().strip() if title_el is not None else "")
            o_int.append([_link_field(d) for d in internal])
            o_ext.append([_link_field(d) for d in external])
        except Exception as e:
            o_url.append(u)
            o_succ.append(False)
            o_err.append(f"prefetch parse error: {e}")
            o_title.append("")
            o_int.append([])
            o_ext.append([])
    out = pa.Table.from_arrays(
        [
            pa.array(o_url, pa.string()),
            pa.array(o_succ, pa.bool_()),
            pa.array(o_err, pa.string()),
            pa.array(o_title, pa.string()),
            pa.array(o_int, LINK_TYPE),
            pa.array(o_ext, LINK_TYPE),
        ],
        schema=PREFETCH_SCHEMA,
    )
    # pass through input columns (order, depth, host, status_code...)
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
