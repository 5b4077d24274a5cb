"""Anti-bot block classifier — a per-batch predicate on fetch results.

Models ``is_blocked`` (crawl4ai/antibot_detector.py:27-281): three
detection tiers —

1. high-confidence structural vendor markers (Akamai reference ids,
   Cloudflare challenge forms/error codes, PerimeterX/DataDome/
   Imperva/Sucuri/Kasada fingerprints) on any page size;
2. generic phrases ("Access Denied", "Checking your browser",
   captcha classes) only on short (<10KB) or 403/503 pages;
3. structural-integrity signals (no <body>, minimal visible text, no
   content elements, script-heavy shell) on small pages,

plus status-code rules: 429 always blocked; non-data 403/503 HTML
always blocked; near-empty 200s blocked. JSON/XML data responses are
never flagged.

Ray mapping: compiled once per actor (``AntibotBatch``), vectorized
over the (status_code, html) columns.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import pyarrow as pa

_T1 = [
    (re.compile(r"Reference\s*#\s*[\d]+\.[0-9a-f]+\.\d+\.[0-9a-f]+", re.I), "Akamai block (Reference #)"),
    (re.compile(r"Pardon\s+Our\s+Interruption", re.I), "Akamai challenge (Pardon Our Interruption)"),
    (re.compile(r"challenge-form.*?__cf_chl_f_tk=", re.I | re.S), "Cloudflare challenge form"),
    (re.compile(r'<span\s+class="cf-error-code">\d{4}</span>', re.I), "Cloudflare firewall block"),
    (re.compile(r"/cdn-cgi/challenge-platform/\S+orchestrate", re.I), "Cloudflare JS challenge"),
    (re.compile(r"window\._pxAppId\s*=", re.I), "PerimeterX block"),
    (re.compile(r"captcha\.px-cdn\.net", re.I), "PerimeterX captcha"),
    (re.compile(r"captcha-delivery\.com", re.I), "DataDome captcha"),
    (re.compile(r"_Incapsula_Resource", re.I), "Imperva/Incapsula block"),
    (re.compile(r"Incapsula\s+incident\s+ID", re.I), "Imperva/Incapsula incident"),
    (re.compile(r"Sucuri\s+WebSite\s+Firewall", re.I), "Sucuri firewall block"),
    (re.compile(r"KPSDK\.scriptStart\s*=\s*KPSDK\.now\(\)", re.I), "Kasada challenge"),
    (re.compile(r"blocked\s+by\s+network\s+security", re.I), "Network security block"),
]

_T2 = [
    (re.compile(r"Access\s+Denied", re.I), "Access Denied on short page"),
    (re.compile(r"Checking\s+your\s+browser", re.I), "Cloudflare browser check"),
    (re.compile(r"<title>\s*Just\s+a\s+moment", re.I), "Cloudflare interstitial"),
    (re.compile(r'class=["\']g-recaptcha["\']', re.I), "reCAPTCHA on block page"),
    (re.compile(r'class=["\']h-captcha["\']', re.I), "hCaptcha on block page"),
    (re.compile(r"Access\s+to\s+This\s+Page\s+Has\s+Been\s+Blocked", re.I), "PerimeterX block page"),
    (re.compile(r"blocked\s+by\s+security", re.I), "Blocked by security"),
    (re.compile(r"Request\s+unsuccessful", re.I), "Request unsuccessful (Imperva)"),
]

_T2_MAX = 10000
_STRUCT_MAX = 50000
_EMPTY = 100

_CONTENT_EL = re.compile(r"<(?:p|h[1-6]|article|section|li|td|a|pre)\b", re.I)
_SCRIPT_TAG = re.compile(r"<script\b", re.I)
_STYLE_BLOCK = re.compile(r"<style\b[\s\S]*?</style>", re.I)
_SCRIPT_BLOCK = re.compile(r"<script\b[\s\S]*?</script>", re.I)
_ANY_TAG = re.compile(r"<[^>]+>")
_BODY = re.compile(r"<body\b", re.I)


def _looks_like_data(html: str) -> bool:
    s = html.strip()
    if not s:
        return False
    if s[0] in ("{", "["):
        return True
    if s[:10].lower().startswith(("<html", "<!")):
        return bool(
            re.search(r"<body[^>]*>\s*<pre[^>]*>\s*[{\[]", s[:500], re.I)
        )
    return s[0] == "<"


def _structural_check(html: str) -> Tuple[bool, str]:
    n = len(html)
    if n > _STRUCT_MAX or _looks_like_data(html):
        return False, ""
    signals = []
    if not _BODY.search(html):
        return True, f"Structural: no <body> tag ({n} bytes)"
    m = re.search(r"<body\b[^>]*>([\s\S]*)</body>", html, re.I)
    body = m.group(1) if m else html
    stripped = _STYLE_BLOCK.sub("", _SCRIPT_BLOCK.sub("", body))
    visible = _ANY_TAG.sub("", stripped).strip()
    if len(visible) < 50:
        signals.append("minimal_text")
    content_els = len(_CONTENT_EL.findall(html))
    if content_els == 0:
        signals.append("no_content_elements")
    if _SCRIPT_TAG.search(html) and content_els == 0 and len(visible) < 100:
        signals.append("script_heavy_shell")
    if len(signals) >= 2:
        return True, (
            f"Structural: {', '.join(signals)} "
            f"({n} bytes, {len(visible)} chars visible)"
        )
    if len(signals) == 1 and n < 5000:
        return True, (
            f"Structural: {signals[0]} on small page "
            f"({n} bytes, {len(visible)} chars visible)"
        )
    return False, ""


def is_blocked(
    status_code: Optional[int], html: str, error_message: Optional[str] = None
) -> Tuple[bool, str]:
    html = html or ""
    n = len(html)
    if status_code == 429:
        return True, "HTTP 429 Too Many Requests"
    snippet = html[:15000]
    for pat, reason in _T1:
        if pat.search(snippet):
            return True, reason
    if n > 15000:
        deep = _STYLE_BLOCK.sub("", _SCRIPT_BLOCK.sub("", html[:500000]))[:30000]
        for pat, reason in _T1:
            if pat.search(deep):
                return True, reason
    if status_code in (403, 503) and not _looks_like_data(html):
        if n < _EMPTY:
            return True, f"HTTP {status_code} with near-empty response ({n} bytes)"
        check = (
            _STYLE_BLOCK.sub("", _SCRIPT_BLOCK.sub("", html[:500000]))[:30000]
            if n > _T2_MAX
            else snippet
        )
        for pat, reason in _T2:
            if pat.search(check):
                return True, f"{reason} (HTTP {status_code}, {n} bytes)"
        return True, f"HTTP {status_code} with HTML content ({n} bytes)"
    if status_code and status_code >= 400 and n < _T2_MAX:
        for pat, reason in _T2:
            if pat.search(snippet):
                return True, f"{reason} (HTTP {status_code}, {n} bytes)"
    if status_code == 200:
        if len(html.strip()) < _EMPTY and not _looks_like_data(html):
            return True, f"Near-empty content ({len(html.strip())} bytes) with HTTP 200"
    return _structural_check(html)


class AntibotBatch:
    """map_batches stage: (status_code, html) -> + blocked, block_reason."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        codes = batch.column("status_code").to_pylist()
        htmls = batch.column("html").to_pylist()
        blocked, reasons = [], []
        for c, h in zip(codes, htmls):
            if isinstance(h, (bytes, bytearray)):
                h = bytes(h).decode("utf-8", "replace")
            b, r = is_blocked(c, h or "")
            blocked.append(b)
            reasons.append(r)
        return batch.append_column(
            "blocked", pa.array(blocked, pa.bool_())
        ).append_column("block_reason", pa.array(reasons, pa.string()))
