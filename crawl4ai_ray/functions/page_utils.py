"""Per-page utility kernels: fit_html preprocessing, head
fingerprinting, prefetch link extraction, link intrinsic scoring.

Models (crawl4ai/utils.py):

* ``preprocess_html_for_schema``  -> utils.py:3084-3227 — the
  ``fit_html`` column: drop head/script/style/svg/media tags, keep
  only structural attributes (id/class/name/type/value/data-*),
  truncate long text (>threshold -> '...') and attribute values,
  remove duplicate siblings by (tag, class, text-hash) signature,
  cap total size. The reference calls it with text_threshold=500,
  max_size=300_000 (async_webcrawler.py:816).
* ``compute_head_fingerprint``    -> utils.py:2847-2905 — 64-bit hex
  hash over title + 7 head meta signals for cache validation
  (blake2b-64 stands in for xxh64; same signal set and join rule).
* ``quick_extract_links``         -> utils.py:2416-2477 — prefetch
  mode: anchors only, skip #/javascript:/mailto:/tel:, deep-crawl
  normalization, seen-set dedup, text truncated to 200 chars,
  internal/external split anchored to the page origin.
* ``extract_page_context`` / ``calculate_link_intrinsic_score``
  -> utils.py:3299-3456 — 0-10 link quality score from attributes,
  url shape, text quality and page-term overlap.
"""

from __future__ import annotations

import re
from typing import Optional
from urllib.parse import urljoin

from .hashing import content_hash, hash64
from .htmlparse import Node, parse_html
from .urls import get_base_domain, is_external_url, normalize_url_for_deep_crawl

_SCHEMA_DROP_TAGS = frozenset(
    {"head", "script", "style", "noscript", "iframe", "canvas", "svg",
     "video", "audio", "source", "track", "map", "area", "#comment"}
)
_SCHEMA_KEEP_ATTRS = frozenset({"id", "class", "name", "type", "value"})


def preprocess_html_for_schema(
    html_content: str | bytes,
    text_threshold: int = 100,
    attr_value_threshold: int = 200,
    max_size: int = 100000,
) -> str:
    """Structure-preserving page reduction (the fit_html column)."""
    try:
        tree = parse_html(html_content)
        return preprocess_tree_for_schema(
            tree, text_threshold, attr_value_threshold, max_size
        )
    except Exception:
        if isinstance(html_content, (bytes, bytearray)):
            html_content = bytes(html_content).decode("utf-8", "replace")
        return html_content[:max_size] if len(html_content) > max_size else html_content


def preprocess_tree_for_schema(
    tree: Node,
    text_threshold: int = 100,
    attr_value_threshold: int = 200,
    max_size: int = 100000,
) -> str:
    """Tree-in variant of ``preprocess_html_for_schema`` — lets the
    extract kernel reuse its already-parsed (and further mutated) tree
    instead of re-parsing the raw page. MUTATES the tree."""
    try:
        tree.remove_children(lambda n: n.tag in _SCHEMA_DROP_TAGS)

        def clean(node: Node) -> None:
            for key in list(node.attrs):
                if key in _SCHEMA_KEEP_ATTRS or key.startswith("data-"):
                    val = str(node.attrs[key] or "")
                    if len(val) > attr_value_threshold:
                        node.attrs[key] = val[:attr_value_threshold] + "..."
                else:
                    node.attrs.pop(key)
            new_children = []
            for c in node.children:
                if isinstance(c, str):
                    s = c.strip()
                    if len(s) > text_threshold:
                        c = s[:text_threshold] + "..."
                    new_children.append(c)
                else:
                    clean(c)
                    new_children.append(c)
            node.children = new_children

        clean(tree)

        # duplicate-sibling removal by (tag, class, text-hash)
        seen: set = set()

        def dedupe(node: Node) -> None:
            kept = []
            for c in node.children:
                if isinstance(c, Node) and c.get("class"):
                    sig = (c.tag, c.get("class"), hash64(c.text_content()))
                    if sig in seen:
                        continue
                    seen.add(sig)
                kept.append(c)
            node.children = kept
            for c in node.children:
                if isinstance(c, Node):
                    dedupe(c)

        dedupe(tree)
        result = tree.serialize()
        if len(result) > max_size:
            return result[:max_size] + "..."
        return result
    except Exception:
        if isinstance(html_content, (bytes, bytearray)):
            html_content = bytes(html_content).decode("utf-8", "replace")
        return html_content[:max_size] if len(html_content) > max_size else html_content


_HEAD_META_SIGNALS = [
    ("name", "description"),
    ("name", "last-modified"),
    ("property", "og:title"),
    ("property", "og:description"),
    ("property", "og:image"),
    ("property", "og:updated_time"),
    ("property", "article:modified_time"),
]
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.DOTALL)


def compute_head_fingerprint(head_html: str) -> str:
    """Hash of title + meta change-signals (cache validation)."""
    if not head_html:
        return ""
    low = head_html.lower()
    signals = []
    m = _TITLE_RE.search(low)
    if m:
        signals.append(m.group(1).strip())
    for attr_type, attr_value in _HEAD_META_SIGNALS:
        esc = re.escape(attr_value)
        for pattern in (
            rf'<meta[^>]*{attr_type}=["\']{esc}["\'][^>]*content=["\']([^"\']*)["\']',
            rf'<meta[^>]*content=["\']([^"\']*)["\'][^>]*{attr_type}=["\']{esc}["\']',
        ):
            m = re.search(pattern, low)
            if m:
                signals.append(m.group(1).strip())
                break
    if not signals:
        return ""
    return content_hash("|".join(signals))


_SKIP_HREF_PREFIXES = ("#", "javascript:", "mailto:", "tel:")


def quick_extract_links(html: str | bytes, base_url: str) -> dict:
    """Prefetch-mode fast link extraction (anchors only)."""
    try:
        tree = parse_html(html)
    except Exception:
        return {"internal": [], "external": []}
    base_domain = get_base_domain(base_url)
    base_el = tree.find("base")
    if base_el is not None:
        bh = (base_el.get("href") or "").strip()
        if bh:
            base_url = urljoin(base_url, bh)
    internal, external = [], []
    seen: set = set()
    for a in tree.iter("a"):
        href = a.get("href", "").strip()
        if not href or href.startswith(_SKIP_HREF_PREFIXES):
            continue
        normalized = normalize_url_for_deep_crawl(href, base_url)
        if not normalized or normalized in seen:
            continue
        seen.add(normalized)
        data = {"href": normalized, "text": a.text_content().strip()[:200]}
        (external if is_external_url(normalized, base_domain) else internal).append(data)
    return {"internal": internal, "external": external}


_STRIP_PUNCT = '.,!?;:"()[]{}'


def extract_page_context(
    page_title: str, headlines_text: str, meta_description: str, base_url: str
) -> dict:
    """Once-per-page term context for link scoring."""
    from urllib.parse import urlparse

    context = {
        "terms": set(),
        "headlines": headlines_text or "",
        "meta_description": meta_description or "",
        "domain": "",
        "is_docs_site": False,
    }
    try:
        parsed = urlparse(base_url)
        context["domain"] = parsed.netloc.lower()
        context["is_docs_site"] = any(
            ind in context["domain"] for ind in ("docs.", "api.", "developer.", "reference.")
        )
        all_text = (
            (page_title or "") + " " + context["headlines"] + " " + context["meta_description"]
        ).lower()
        context["terms"] = {
            w.strip(_STRIP_PUNCT)
            for w in all_text.split()
            if len(w.strip(_STRIP_PUNCT)) > 2
        }
    except Exception:
        pass
    return context


def calculate_link_intrinsic_score(
    link_text: str,
    url: str,
    title_attr: str = "",
    class_attr: str = "",
    rel_attr: str = "",
    page_context: Optional[dict] = None,
) -> float:
    """0-10 link quality score (utils.py:3344-3456 semantics)."""
    page_context = page_context or {}
    score = 0.0
    try:
        if title_attr and len(title_attr.strip()) > 3:
            score += 1.0
        cls = (class_attr or "").lower()
        if any(k in cls for k in ("nav", "menu", "primary", "main", "important")):
            score += 1.5
        if any(k in cls for k in ("ad", "sponsor", "track", "promo", "banner")):
            score -= 1.0
        rel = (rel_attr or "").lower()
        if any(k in rel for k in ("canonical", "next", "prev", "chapter")):
            score += 1.0
        if any(k in rel for k in ("nofollow", "sponsored", "ugc")):
            score -= 0.5

        low = url.lower()
        if any(p in low for p in ("/docs/", "/api/", "/guide/", "/tutorial/", "/reference/", "/manual/")):
            score += 2.0
        elif any(p in low for p in ("/blog/", "/article/", "/post/", "/news/")):
            score += 1.0
        if any(p in low for p in ("/admin/", "/login/", "/cart/", "/checkout/", "/track/", "/click/")):
            score -= 1.5
        depth = url.count("/") - 2
        if depth <= 2:
            score += 1.0
        elif depth > 5:
            score -= 0.5
        if url.startswith("https://"):
            score += 0.5

        if link_text:
            t = link_text.strip()
            if len(t) > 3:
                score += 1.0
            words = len(t.split())
            if words >= 2:
                score += 0.5
            if words >= 4:
                score += 0.5
            if t.lower() in ("click here", "read more", "more info", "link", "here"):
                score -= 1.0

        terms = page_context.get("terms")
        if terms and link_text:
            link_words = {
                w.strip(_STRIP_PUNCT).lower()
                for w in link_text.split()
                if len(w.strip(_STRIP_PUNCT)) > 2
            }
            if link_words:
                overlap = len(link_words & terms)
                if overlap > 0:
                    score += (overlap / min(len(link_words), 10)) * 2.0

        if page_context.get("is_docs_site") and link_text:
            if any(k in link_text.lower() for k in ("api", "reference", "guide", "tutorial", "example")):
                score += 1.0
    except Exception:
        score = 0.5
    return max(0.0, min(score, 10.0))


# -- pretty printers & scalar html helpers (SURVEY §2.2/§2.11) --------------


def sanitize_html(html: str) -> str:
    """Backslash-escape double and single quotes (reference
    utils.py:752-775 — its only live transform; the character-class
    strip is commented out there)."""
    if not html:
        return ""
    return html.replace('"', '\\"').replace("'", "\\'")


def fast_format_html(html) -> str:
    """String-operation HTML indenter, algorithm-parity with the
    reference ``fast_format_html`` (utils.py:2169-2213): every ``>`` and
    ``<`` becomes a line boundary, two-space indent, close tags dedent
    BEFORE printing (no clamping — over-closing yields zero indent via
    negative string multiply), only ``/>`` counts as self-closing (void
    tags like ``<br>`` do indent — a reference quirk kept)."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", "replace")
    if not html:
        return ""
    indent = 0
    out = []
    for part in html.replace(">", ">\n").replace("<", "\n<").split("\n"):
        stripped = part.strip()
        if not stripped:
            continue
        if part.startswith("</"):
            indent -= 1
            out.append("  " * indent + part)
        elif part.startswith("<") and part.endswith("/>"):
            out.append("  " * indent + part)
        elif part.startswith("<"):
            out.append("  " * indent + part)
            indent += 1
        else:
            out.append("  " * indent + stripped)
    return "\n".join(out)


# advanced_split tables (reference utils.py:383-428). The reference's
# SPLITS bytearray is OFF BY ONE from its own comments starting at ASCII
# 33 (the "33-47" block holds 16 entries): '0' (48), 'A' (65) and 'a'
# (97) are split points, while ':' (58), '[' (91) and '{' (123) are not.
# The quirk is reproduced exactly (pinned by differential fuzz) — the
# block lengths below are the reference's actual run-lengths.
_SPLIT_BYTE = b"".join(
    bytes([bit]) * length
    for bit, length in [
        (1, 33),   # 0-32   control + space
        (1, 16),   # 33-48  punctuation, including '0'
        (0, 10),   # 49-58  '1'-'9' and ':'
        (1, 7),    # 59-65  ';'-'@' and 'A'
        (0, 26),   # 66-91  'B'-'Z' and '['
        (1, 6),    # 92-97  '\\'-'`' and 'a'
        (0, 26),   # 98-123 'b'-'z' and '{'
        (1, 4),    # 124-127 '|'-DEL
        (1, 128),  # Latin-1 extended
    ]
)
assert len(_SPLIT_BYTE) == 256
_SPLIT_PAIRS = frozenset(
    {
        "+=", "-=", "*=", "/=", "=>", "!=", "==", "++", "--",
        "<<", ">>", "&&", "||", "??", "?:", "?.",
    }
)


def advanced_split(text: str) -> list:
    """Token splitter over the reference's split-byte table
    (utils.py:419-452): ASCII non-alnum and Latin-1 extended bytes end a
    word; 2-char operator pairs end a word and consume both chars;
    other unicode chars accumulate into words."""
    result = []
    word: list = []
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        o = ord(ch)
        if o < 256 and _SPLIT_BYTE[o]:
            if word:
                result.append("".join(word))
                word = []
        elif i < n - 1:
            if ch + text[i + 1] in _SPLIT_PAIRS:
                if word:
                    result.append("".join(word))
                    word = []
                i += 1
            else:
                word.append(ch)
        else:
            word.append(ch)
        i += 1
    if word:
        result.append("".join(word))
    return result


def calculate_total_score(
    intrinsic_score=None,
    contextual_score=None,
    score_links_enabled: bool = False,
    query_provided: bool = False,
) -> float:
    """Combined link score with smart fallbacks (utils.py:3459-3506):
    scoring disabled -> neutral 5.0; intrinsic only -> clamp to 0-10;
    both -> 0.7*intrinsic + 0.3*min(contextual*10, 10), clamped."""
    if not score_links_enabled:
        return 5.0
    intrinsic = intrinsic_score if intrinsic_score is not None else 0.0
    if not query_provided or contextual_score is None:
        return max(0.0, min(intrinsic, 10.0))
    contextual_scaled = min(contextual_score * 10.0, 10.0)
    total = (intrinsic * 0.7) + (contextual_scaled * 0.3)
    return max(0.0, min(total, 10.0))
