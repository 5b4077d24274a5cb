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
    """Categorized glob/regex matching, decision-procedure-parity with
    filters.py:119-256 (pinned by differential fuzz vs the direct-loaded
    reference module in tests/test_reference_differential.py).

    Categories, checked in this order: SUFFIX (``*.ext``: last dot-component
    of the path's filename), DOMAIN (``*.``-prefixed patterns containing
    ``://``), PREFIX (``prefix/*`` with a ``/?#``-or-end boundary; absolute
    prefixes match the whole url), PATH (regex: raw when ``^``/``$``/``\\d``
    signals a regex, else glob-translated with ``**``→``.*`` and
    ``{a,b}``→``(a|b)``, matched with ``search``)."""

    def __init__(self, patterns: str | Iterable[str], reverse: bool = False):
        super().__init__()
        if isinstance(patterns, (str, re.Pattern)):
            patterns = [patterns]
        self.reverse = reverse
        self._suffixes: set[str] = set()
        self._prefixes: set[str] = set()
        self._domain_rx: list[re.Pattern] = []
        self._path_rx: list[re.Pattern] = []
        for p in patterns:
            self._add(p)

    def _add(self, p) -> None:
        if isinstance(p, str) and (
            p.startswith("^") or p.endswith("$") or "\\d" in p
        ):
            self._path_rx.append(re.compile(p))
            return
        if isinstance(p, str):
            if p.count("*") == 1:
                if p.startswith("*."):
                    self._suffixes.add(p[2:])
                    return
                if p.endswith("/*"):
                    self._prefixes.add(p[:-2])
                    return
            if "://" in p and p.startswith("*."):
                self._domain_rx.append(re.compile(p.replace("*.", r"[^/]+\.")))
                return
            if "**" in p:
                p = p.replace("**", ".*")
            if "{" in p:
                p = re.sub(
                    r"\{([^}]+)\}",
                    lambda m: "(" + "|".join(m.group(1).split(",")) + ")",
                    p,
                )
            self._path_rx.append(re.compile(fnmatch.translate(p)))
        else:
            self._path_rx.append(p)

    def apply(self, url: str) -> bool:
        hit = self._match(url)
        return (not hit) if self.reverse else hit

    def _match(self, url: str) -> bool:
        if self._suffixes:
            path = urlparse(url).path
            if path.split("/")[-1].split(".")[-1] in self._suffixes:
                return True
        for rx in self._domain_rx:
            if rx.match(url):
                return True
        for prefix in self._prefixes:
            against = url if "://" in prefix else urlparse(url).path
            if against.startswith(prefix) and (
                len(against) == len(prefix) or against[len(prefix)] in "/?#"
            ):
                return True
        return any(rx.search(url) for rx in self._path_rx)


# extension -> MIME table, same entries as the reference's
# ContentTypeFilter._MIME_MAP (filters.py:264-364; standard IANA data,
# reorganized). An allowed type matches by SUBSTRING containment in the
# mime value — reference filters.py:404-409.
_EXT_MIME = {
    # text
    "css": "text/css", "csv": "text/csv", "htm": "text/html",
    "html": "text/html", "ics": "text/calendar", "txt": "text/plain",
    # images
    "bmp": "image/bmp", "gif": "image/gif", "ico": "image/x-icon",
    "jpeg": "image/jpeg", "jpg": "image/jpeg", "png": "image/png",
    "svg": "image/svg+xml", "tiff": "image/tiff", "webp": "image/webp",
    # audio
    "aac": "audio/aac", "m4a": "audio/mp4", "mid": "audio/midi",
    "midi": "audio/midi", "mp3": "audio/mpeg", "ogg": "audio/ogg",
    "wav": "audio/wav",
    # video
    "avi": "video/x-msvideo", "flv": "video/x-flv",
    "mkv": "video/x-matroska", "mov": "video/quicktime",
    "mp4": "video/mp4", "mpeg": "video/mpeg", "webm": "video/webm",
    "wmv": "video/x-ms-wmv",
    # applications
    "7z": "application/x-7z-compressed", "exe":
    "application/vnd.microsoft.portable-executable",
    "gz": "application/gzip", "js": "application/javascript",
    "json": "application/json", "msi": "application/x-msdownload",
    "pdf": "application/pdf", "rar": "application/vnd.rar",
    "tar": "application/x-tar", "xhtml": "application/xhtml+xml",
    "xml": "application/xml", "zip": "application/zip",
    # fonts
    "otf": "font/otf", "ttf": "font/ttf", "woff": "font/woff",
    "woff2": "font/woff2",
    # office
    "doc": "application/msword", "dot": "application/msword",
    "docx": "application/vnd.openxmlformats-officedocument"
    ".wordprocessingml.document",
    "odp": "application/vnd.oasis.opendocument.presentation",
    "ods": "application/vnd.oasis.opendocument.spreadsheet",
    "odt": "application/vnd.oasis.opendocument.text",
    "ppt": "application/vnd.ms-powerpoint",
    "pptx": "application/vnd.openxmlformats-officedocument"
    ".presentationml.presentation",
    "xls": "application/vnd.ms-excel",
    "xlsx": "application/vnd.openxmlformats-officedocument"
    ".spreadsheetml.sheet",
    # archives / misc
    "ai": "application/postscript",
    "apk": "application/vnd.android.package-archive",
    "bin": "application/octet-stream", "bz2": "application/x-bzip2",
    "deb": "application/x-debian-package",
    "dmg": "application/x-apple-diskimage",
    "eps": "application/postscript", "epub": "application/epub+zip",
    "iso": "application/x-iso9660-image",
    "jar": "application/java-archive", "ps": "application/postscript",
    "rpm": "application/x-rpm", "rtf": "application/rtf",
    "sqlite": "application/vnd.sqlite3",
    "swf": "application/x-shockwave-flash",
    "tar.gz": "application/gzip", "tgz": "application/gzip",
    "unknown": "application/octet-stream",
    # php
    "php": "application/x-httpd-php", "php3": "application/x-httpd-php",
    "php4": "application/x-httpd-php", "php5": "application/x-httpd-php",
    "php7": "application/x-httpd-php", "phtml": "application/x-httpd-php",
    "phps": "application/x-httpd-php-source",
}


def _url_extension(url: str) -> str:
    """Reference ContentTypeFilter._extract_extension (filters.py:366-383):
    scheme-strip, path from first '/', filename after last '/', extension
    after the last dot — deliberately NOT query-stripped (``page.php?id=1``
    yields ``php?id=1``), matching the reference byte-for-byte."""
    if "://" in url:
        url = url.split("://", 1)[-1]
    path_start = url.find("/")
    path = url[path_start:] if path_start != -1 else ""
    filename = path.rsplit("/", 1)[-1] if "/" in path else ""
    if "." not in filename:
        return ""
    return filename.rpartition(".")[-1].lower()


class ContentTypeFilter(URLFilter):
    """Allow urls whose extension belongs to an allowed MIME category
    (filters.py:259-422). Extensionless urls pass (assumed html); known
    and unknown extensions alike are rejected unless their mime entry
    contains one of ``allowed_types`` as a substring."""

    def __init__(
        self,
        allowed_types: str | Iterable[str],
        check_extension: bool = True,
    ):
        super().__init__()
        if isinstance(allowed_types, str):
            allowed_types = [allowed_types]
        self.allowed = frozenset(t.lower() for t in allowed_types)
        self.check_extension = check_extension
        self._allowed_exts = frozenset(
            ext
            for ext, mime in _EXT_MIME.items()
            if any(t in mime for t in self.allowed)
        )

    def apply(self, url: str) -> bool:
        if not self.check_extension:
            return True
        ext = _url_extension(url)
        if not ext:
            return True
        return ext in self._allowed_exts


class DomainFilter(URLFilter):
    """allowed/blocked domain lists with subdomain suffix matching
    (filters.py:425-499). Block wins over allow. Domain extraction is the
    reference's ``://([^/]+)`` regex: the port (and any userinfo) stays in
    the compared string, and schemeless urls yield an empty domain."""

    _DOMAIN_RE = re.compile(r"://([^/]+)")

    def __init__(
        self,
        allowed_domains: Optional[str | Iterable[str]] = None,
        blocked_domains: Optional[str | Iterable[str]] = None,
    ):
        super().__init__()
        self.allowed = self._norm(allowed_domains) if allowed_domains else None
        self.blocked = self._norm(blocked_domains) if blocked_domains else frozenset()

    @staticmethod
    def _norm(domains) -> frozenset:
        if isinstance(domains, str):
            return frozenset({domains.lower()})
        return frozenset(d.lower() for d in domains)

    @staticmethod
    def _matches(host: str, domains) -> bool:
        return any(host == d or host.endswith("." + d) for d in domains)

    def apply(self, url: str) -> bool:
        if not self.blocked and self.allowed is None:
            return True
        m = self._DOMAIN_RE.search(url)
        host = m.group(1).lower() if m else ""
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
