"""URL canonicalization & classification for the crawl frontier.

These functions define *frontier identity*: two URLs are the same crawl
target iff their canonical forms are equal. Behavior follows the
reference engine's semantics (crawl4ai ``crawl4ai/utils.py``:

- ``normalize_url``               -> utils.py:2216-2314
- ``normalize_url_for_deep_crawl``-> utils.py:2317-2373  (frontier identity)
- ``efficient_normalize_url_for_deep_crawl`` -> utils.py:2375-2412
- ``get_base_domain``             -> utils.py:2480-2528
- ``is_external_url``             -> utils.py:2531-2562

but is written from scratch for a vectorized Ray Data pipeline: each
function has a scalar form plus a ``*_batch`` form operating on Python
lists (called from ``map_batches`` over the ``url`` column).

Subtle reference behaviors preserved deliberately:

* ``normalize_url_for_deep_crawl`` rebuilds the query via
  ``parse_qs`` + ``urlencode(doseq=True)``. ``parse_qs`` drops
  blank values, groups duplicate keys (first-occurrence key order —
  NOT sorted, despite the reference's comment), so ``b=2&a=1`` stays
  ``b=2&a=1`` while ``a=1&x&a=2`` becomes ``a=1&a=2``.
* Only five tracking params are dropped by the deep-crawl variant
  (utm_source, utm_medium, utm_campaign, ref, fbclid) — exact-case
  match, unlike ``normalize_url`` which drops nine case-insensitively.
* Empty path becomes ``/``; trailing slashes are preserved.
* The netloc is lowercased; scheme case is left to ``urlparse``
  (which lowercases schemes itself).
"""

from __future__ import annotations

import re
import re as _re
from functools import lru_cache
from typing import Optional
from urllib.parse import parse_qs, parse_qsl, urlencode, urljoin, urlparse, urlunparse

# Tracking params dropped by the full normalizer (case-insensitive).
_TRACKING_FULL = frozenset(
    {
        "utm_source",
        "utm_medium",
        "utm_campaign",
        "utm_term",
        "utm_content",
        "gclid",
        "fbclid",
        "ref",
        "ref_src",
    }
)

# Tracking params dropped by the deep-crawl (frontier) normalizer —
# exact-key match on the parse_qs dict, like the reference.
_TRACKING_DEEP = ("utm_source", "utm_medium", "utm_campaign", "ref", "fbclid")

_SPECIAL_SCHEME_PREFIXES = ("mailto:", "tel:", "ftp:", "file:", "data:", "javascript:")

_CCTLD_SECOND_LEVEL = frozenset(
    {"co", "com", "org", "gov", "edu", "net", "mil", "int", "ac", "ad", "ae", "af", "ag"}
)

_WWW_RE = re.compile(r"^www\.")


def _preserve_https(full_url: str, base_url: str, href: str) -> str:
    parsed_full = urlparse(full_url)
    parsed_base = urlparse(base_url)
    if (
        parsed_full.scheme == "http"
        and parsed_full.netloc == parsed_base.netloc
        and not href.strip().startswith("//")
    ):
        return full_url.replace("http://", "https://", 1)
    return full_url


# absolute http(s) url with no query/fragment/;params — fast-path shape
_ABS_FAST_RE = _re.compile(r"^(https?)://([^/?#;]+)((?:/[^?#;]*)?)$", _re.IGNORECASE)

# netloc of an absolute http(s)/scheme url (fast path of is_external_url /
# get_base_domain); matches urlparse().netloc for these shapes
_NETLOC_FAST_RE = _re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)")


def normalize_url(
    href: Optional[str],
    base_url: str,
    *,
    drop_query_tracking: bool = True,
    sort_query: bool = True,
    keep_fragment: bool = False,
    extra_drop_params=None,
    preserve_https: bool = False,
    original_scheme: Optional[str] = None,
) -> Optional[str]:
    """Full URL normalizer (reference: utils.py:2216-2314).

    Resolves relative hrefs against ``base_url``, lowercases the
    netloc, drops tracking query params, sorts query keys, drops the
    fragment. Returns ``None`` for falsy hrefs.
    """
    if not href:
        return None
    href_s = href.strip()
    # Fast path: absolute http(s) href with no query/fragment/;params
    # (the overwhelmingly common shape in link walks). Equivalent to
    # the general path: urljoin is identity for absolute urls and with
    # no query there is nothing to drop/sort. Unit-tested equivalent.
    if not preserve_https and href_s[:4].lower() == "http":
        m = _ABS_FAST_RE.match(href_s)
        if m is not None:
            scheme, netloc, path = m.group(1), m.group(2), m.group(3) or ""
            return f"{scheme.lower()}://{netloc.lower()}{path}"
    full_url = urljoin(base_url, href_s)
    if preserve_https and original_scheme == "https":
        full_url = _preserve_https(full_url, base_url, href)

    parsed = urlparse(full_url)
    netloc = parsed.netloc.lower()
    path = parsed.path  # left untouched: encoding already canonical per urlparse

    query = parsed.query
    if query:
        params = [(k, v) for k, v in parse_qsl(query, keep_blank_values=True)]
        if drop_query_tracking:
            drop = set(_TRACKING_FULL)
            if extra_drop_params:
                drop |= {p.lower() for p in extra_drop_params}
            params = [(k, v) for k, v in params if k.lower() not in drop]
        if sort_query:
            params.sort(key=lambda kv: kv[0])
        query = urlencode(params, doseq=True) if params else ""

    fragment = parsed.fragment if keep_fragment else ""
    return urlunparse((parsed.scheme, netloc, path, parsed.params, query, fragment))


def normalize_url_for_deep_crawl(
    href: Optional[str],
    base_url: str,
    preserve_https: bool = False,
    original_scheme: Optional[str] = None,
) -> Optional[str]:
    """Frontier-identity normalizer (reference: utils.py:2317-2373).

    This function's output IS the canonical URL used for the URL-seen
    set; it must match the reference bit-for-bit for crawl parity.
    """
    if not href:
        return None
    href_s = href.strip()
    # Fast path (same shape as normalize_url's): absolute http(s)
    # href with no query/fragment/;params — nothing to join, drop or
    # group; empty path becomes "/". Unit-tested equivalent.
    if not preserve_https and href_s[:4].lower() == "http":
        m = _ABS_FAST_RE.match(href_s)
        if m is not None:
            scheme, netloc, path = m.group(1), m.group(2), m.group(3) or "/"
            return f"{scheme.lower()}://{netloc.lower()}{path}"
    full_url = urljoin(base_url, href_s)
    if preserve_https and original_scheme == "https":
        full_url = _preserve_https(full_url, base_url, href)

    parsed = urlparse(full_url)
    netloc = parsed.netloc.lower()

    query = parsed.query
    if query:
        params = parse_qs(query)  # drops blank values, groups dup keys
        for p in _TRACKING_DEEP:
            params.pop(p, None)
        query = urlencode(params, doseq=True) if params else ""

    return urlunparse(
        (parsed.scheme, netloc, parsed.path or "/", parsed.params, query, "")
    )


@lru_cache(maxsize=10000)
def efficient_normalize_url_for_deep_crawl(
    href: Optional[str],
    base_url: str,
    preserve_https: bool = False,
    original_scheme: Optional[str] = None,
) -> Optional[str]:
    """Cheap variant: lowercase host + strip fragment only
    (reference: utils.py:2375-2412)."""
    if not href:
        return None
    full_url = urljoin(base_url, href.strip())
    if preserve_https and original_scheme == "https":
        full_url = _preserve_https(full_url, base_url, href)
    parsed = urlparse(full_url)
    return urlunparse(
        (
            parsed.scheme,
            parsed.netloc.lower(),
            parsed.path or "/",
            parsed.params,
            parsed.query,
            "",
        )
    )


def get_base_domain(url: str) -> str:
    """Registered-domain extraction with crude ccTLD second-level
    handling (reference: utils.py:2480-2528)."""
    try:
        domain = urlparse(url).netloc.lower()
        if not domain:
            return ""
        domain = domain.split(":")[0]
        domain = _WWW_RE.sub("", domain)
        parts = domain.split(".")
        if len(parts) > 2 and parts[-2] in _CCTLD_SECOND_LEVEL:
            return ".".join(parts[-3:])
        return ".".join(parts[-2:])
    except Exception:
        return ""


def is_external_url(url: str, base_domain: str) -> bool:
    """Internal/external link classifier (reference: utils.py:2531-2562).

    Special schemes (mailto:, tel:, javascript:, ...) are external;
    relative URLs internal; otherwise suffix-match of the link's
    domain (www-stripped) against ``base_domain``.
    """
    if any(url.lower().startswith(p) for p in _SPECIAL_SCHEME_PREFIXES):
        return True
    try:
        # fast netloc extraction for the absolute-http(s) hot shape
        # (equivalent to urlparse().netloc for these; general forms
        # fall back)
        m = _NETLOC_FAST_RE.match(url)
        if m is not None:
            netloc = m.group(1)
        else:
            netloc = urlparse(url).netloc
        if not netloc:
            return False
        url_domain = netloc.lower().split(":")[0].replace("www.", "")
        base = base_domain.lower().split(":")[0].replace("www.", "")
        return not url_domain.endswith(base)
    except Exception:
        return False


def is_valid_crawl_url(url: Optional[str]) -> bool:
    """URL validity gate of the frontier (reference:
    bfs_strategy.py:63-82 ``can_process_url`` pre-filter-chain part):
    http/https scheme, non-empty netloc containing a dot."""
    if not url:
        return False
    try:
        parsed = urlparse(url)
    except Exception:
        return False
    if not parsed.scheme or not parsed.netloc:
        return False
    if parsed.scheme not in ("http", "https"):
        return False
    if "." not in parsed.netloc:
        return False
    return True


def host_of(url: str) -> str:
    """Lowercased netloc (politeness key)."""
    try:
        return urlparse(url).netloc.lower()
    except Exception:
        return ""


# ---------------------------------------------------------------------------
# Batch forms (list in, list out) — called from map_batches over Arrow
# string columns; urllib parsing is Python-level, so a tight loop over
# the column is the practical vectorization (no regex shortcut is
# byte-equivalent to urlparse for frontier identity).
# ---------------------------------------------------------------------------


def normalize_batch(hrefs, base_urls) -> list:
    return [normalize_url_for_deep_crawl(h, b) for h, b in zip(hrefs, base_urls)]


def host_batch(urls) -> list:
    return [host_of(u) for u in urls]


def valid_batch(urls) -> list:
    return [is_valid_crawl_url(u) for u in urls]


_VALID_NETLOC_RE = r"(?i)^(?:http|https)://([^/?#]+)"


def valid_crawl_mask(urls) -> "np.ndarray":
    """Vectorized ``is_valid_crawl_url`` over a sequence: http/https
    scheme + non-empty netloc containing a dot. pandas C string ops;
    equivalence with the scalar function is unit-tested (the scalar
    path keeps urlparse for arbitrary garbage; frontier candidates
    have already been normalized, where the two agree)."""
    import numpy as np
    import pandas as pd

    s = pd.Series(urls, dtype=object)
    netloc = s.str.extract(_VALID_NETLOC_RE, expand=False)
    return (netloc.notna() & netloc.str.contains(".", regex=False)).to_numpy(
        dtype=bool
    )


def valid_crawl_mask_arrow(arr) -> "np.ndarray":
    """``valid_crawl_mask`` over a pyarrow string Array without
    materializing Python strings (RE2 via pyarrow.compute). Same
    predicate: http/https scheme + netloc containing a dot
    (equivalence fuzz-tested against the pandas path)."""
    import numpy as np
    import pyarrow.compute as pc

    if len(arr) == 0:
        return np.zeros(0, dtype=bool)
    m = pc.fill_null(
        pc.match_substring_regex(
            arr, r"(?i)^(?:http|https)://[^/?#]*\.[^/?#]*"
        ),
        False,
    )
    return m.to_numpy(zero_copy_only=False).astype(bool)


def hosts_of(urls) -> list:
    """Vectorized lowercased-netloc extraction (politeness key),
    '' for unparseable — matches ``host_of`` per url."""
    import pandas as pd

    s = pd.Series(urls, dtype=object)
    netloc = s.str.extract(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", expand=False)
    # urlparse also yields a netloc for scheme-relative //host/path
    rel = s.str.extract(r"^//([^/?#]+)", expand=False)
    netloc = netloc.where(netloc.notna(), rel)
    return netloc.fillna("").str.lower().tolist()
