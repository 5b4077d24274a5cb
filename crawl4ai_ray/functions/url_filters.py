"""Frontier URL filters — vectorizable predicates over url columns.

Models the reference's ``crawl4ai/deep_crawling/filters.py``:

* ``FilterChain``        -> filters.py:69-116   (AND, short-circuit, stats)
* ``URLPatternFilter``   -> filters.py:119-256  (glob/regex categories)
* ``ContentTypeFilter``  -> filters.py:259-422  (extension -> MIME allowlist)
* ``DomainFilter``       -> filters.py:425-499  (allow/block + subdomains)
* ``SEOFilter``/``ContentRelevanceFilter`` (filters.py:502-691) touch
  page heads — they are implemented as a head-scoring stage over the
  fetched corpus instead (see ``stages/head_filters.py``).

Each filter exposes ``apply(url) -> bool`` (reference protocol) and
``apply_batch(urls) -> np.ndarray`` for ``map_batches``; a chain keeps
the reference's atomic pass/reject counters as per-batch partials.
"""

from __future__ import annotations

import fnmatch
import re
from typing import Iterable, Optional
from urllib.parse import urlparse

import numpy as np


class FilterStats:
    """total/passed/rejected counters (filters.py:19-37)."""

    __slots__ = ("total", "passed", "rejected")

    def __init__(self):
        self.total = 0
        self.passed = 0
        self.rejected = 0

    def update(self, passed: int, total: int) -> None:
        self.total += total
        self.passed += passed
        self.rejected += total - passed

    def as_dict(self) -> dict:
        return {"total": self.total, "passed": self.passed, "rejected": self.rejected}


class URLFilter:
    def __init__(self, name: Optional[str] = None):
        self.name = name or self.__class__.__name__
        self.stats = FilterStats()

    def apply(self, url: str) -> bool:
        raise NotImplementedError

    def apply_batch(self, urls) -> np.ndarray:
        out = np.fromiter((self.apply(u) for u in urls), dtype=bool, count=len(urls))
        self.stats.update(int(out.sum()), len(urls))
        return out


class URLPatternFilter(URLFilter):
    """Glob/regex matching with category fast paths
    (filters.py:119-256): ``*.ext`` suffix, ``prefix*`` prefix,
    ``*domain*`` contains, regex otherwise; ``reverse`` flips."""

    def __init__(self, patterns: str | Iterable[str], reverse: bool = False):
        super().__init__()
        if isinstance(patterns, str):
            patterns = [patterns]
        self.reverse = reverse
        self._suffixes: list[str] = []
        self._prefixes: list[str] = []
        self._contains: list[str] = []
        self._regexes: list[re.Pattern] = []
        for p in patterns:
            if isinstance(p, re.Pattern):
                self._regexes.append(p)
            elif p.startswith("*") and p.endswith("*") and not _has_glob(p[1:-1]):
                self._contains.append(p[1:-1])
            elif p.startswith("*.") and not _has_glob(p[2:]):
                self._suffixes.append(p[1:])
            elif p.endswith("*") and not _has_glob(p[:-1]):
                self._prefixes.append(p[:-1])
            else:
                self._regexes.append(re.compile(fnmatch.translate(p)))

    def apply(self, url: str) -> bool:
        hit = (
            any(url.endswith(s) for s in self._suffixes)
            or any(url.startswith(p) for p in self._prefixes)
            or any(c in url for c in self._contains)
            or any(r.match(url) for r in self._regexes)
        )
        return (not hit) if self.reverse else hit


def _has_glob(s: str) -> bool:
    return any(ch in s for ch in "*?[")


# extension -> MIME map (subset of the reference's 80-entry table,
# filters.py:300-380; unlisted extensions resolve to None -> allowed
# only when ``allow_unknown``)
_EXT_MIME = {
    "html": "text/html", "htm": "text/html", "xhtml": "text/html",
    "php": "text/html", "asp": "text/html", "aspx": "text/html",
    "jsp": "text/html", "txt": "text/plain", "md": "text/plain",
    "css": "text/css", "js": "application/javascript",
    "json": "application/json", "xml": "application/xml",
    "rss": "application/xml", "atom": "application/xml",
    "pdf": "application/pdf", "doc": "application/msword",
    "docx": "application/msword", "xls": "application/vnd.ms-excel",
    "xlsx": "application/vnd.ms-excel", "zip": "application/zip",
    "gz": "application/gzip", "tar": "application/x-tar",
    "jpg": "image/jpeg", "jpeg": "image/jpeg", "png": "image/png",
    "gif": "image/gif", "webp": "image/webp", "svg": "image/svg+xml",
    "ico": "image/x-icon", "mp3": "audio/mpeg", "wav": "audio/wav",
    "mp4": "video/mp4", "webm": "video/webm", "avi": "video/x-msvideo",
    "woff": "font/woff", "woff2": "font/woff2", "ttf": "font/ttf",
}


class ContentTypeFilter(URLFilter):
    """Allow urls whose extension maps to an allowed MIME category
    (filters.py:259-422). Extensionless urls pass (assumed html)."""

    def __init__(self, allowed_types: Iterable[str], allow_unknown: bool = False):
        super().__init__()
        self.allowed = {t.lower() for t in allowed_types}
        self.allow_unknown = allow_unknown

    def apply(self, url: str) -> bool:
        path = urlparse(url).path
        dot = path.rfind(".")
        slash = path.rfind("/")
        if dot <= slash:  # no extension
            return True
        ext = path[dot + 1 :].lower()
        mime = _EXT_MIME.get(ext)
        if mime is None:
            return self.allow_unknown
        return any(mime.startswith(t) or t in mime for t in self.allowed)


class DomainFilter(URLFilter):
    """allowed/blocked domain lists with subdomain suffix matching
    (filters.py:425-499). Block wins over allow."""

    def __init__(
        self,
        allowed_domains: Optional[Iterable[str]] = None,
        blocked_domains: Optional[Iterable[str]] = None,
    ):
        super().__init__()
        self.allowed = {d.lower() for d in (allowed_domains or [])} or None
        self.blocked = {d.lower() for d in (blocked_domains or [])}

    @staticmethod
    def _matches(host: str, domains: set) -> bool:
        return any(host == d or host.endswith("." + d) for d in domains)

    def apply(self, url: str) -> bool:
        host = urlparse(url).netloc.lower().split(":")[0]
        if self.blocked and self._matches(host, self.blocked):
            return False
        if self.allowed is not None:
            return self._matches(host, self.allowed)
        return True


class FilterChain:
    """AND of filters with short-circuit + aggregated stats
    (filters.py:69-116). Callable so it can be handed directly to the
    crawler's ``url_filter=`` seam."""

    def __init__(self, filters: Iterable[URLFilter] = ()):
        self.filters = list(filters)
        self.stats = FilterStats()

    def apply(self, url: str) -> bool:
        for f in self.filters:
            if not f.apply(url):
                self.stats.update(0, 1)
                return False
        self.stats.update(1, 1)
        return True

    __call__ = apply

    def apply_batch(self, urls) -> np.ndarray:
        mask = np.ones(len(urls), dtype=bool)
        for f in self.filters:
            if not mask.any():
                break
            idx = np.where(mask)[0]
            sub = f.apply_batch([urls[i] for i in idx])
            mask[idx] = sub
        self.stats.update(int(mask.sum()), len(urls))
        return mask
