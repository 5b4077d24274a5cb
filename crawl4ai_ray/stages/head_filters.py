"""Head-content filters: SEO scoring + BM25 content relevance.

Models ``SEOFilter`` / ``ContentRelevanceFilter``
(crawl4ai/deep_crawling/filters.py:502-691). In the reference these
filters fetch each candidate's ``<head>`` over the network
(``HeadPeekr.peek_html``, utils.py:3027-3058); here the head comes
from the corpus (a second, columns-pruned fetch — the sandbox analog
of a HEAD-only request), so both become a **two-stage frontier
filter**: candidate urls -> head fetch (``fetch_batch`` with the html
column, head sliced) -> vectorized scoring -> boolean mask.

Scoring formulas match the reference:

* SEO: weighted factors (title length 50-60 chars -> 1.0; keyword
  matches x0.3 cap 1.0; meta-description 140-160 -> 1.0; canonical
  match; robots-noindex gate weight .20; ld+json presence; url shape
  penalties), threshold 0.65.
* Relevance: simplified BM25 (k1=1.2, b=0.75, avgdl=1000, idf =
  log(2/(tf+0.5)+1)) over a weighted head document (title x3,
  description x2, keywords, all meta values).
"""

from __future__ import annotations

import math
import re
from collections import defaultdict
from typing import Dict, List, Optional, Union
from urllib.parse import urlparse

import pyarrow as pa

_LDJSON_RE = re.compile(r'<script[^>]+type=["\']application/ld\+json', re.I)


def head_of(html: str | bytes) -> str:
    """Slice the <head> section (HeadPeekr analog)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    m = re.search(r"<head[^>]*>([\s\S]*?)</head>", html or "", re.I)
    return m.group(0) if m else (html or "")[:4096]


_META_TAG_RE = re.compile(r"<meta[^>]+>")
_META_NAME_RE = re.compile(r'name=["\'](.*?)["\']')
_META_PROP_RE = re.compile(r'property=["\'](.*?)["\']')
_META_CONTENT_RE = re.compile(r'content=["\'](.*?)["\']')


def get_title(head: str) -> Optional[str]:
    """Byte-parity with ``HeadPeekr.get_title`` (utils.py:3081-3083):
    first <title> match, IGNORECASE|DOTALL, verbatim (no strip)."""
    m = re.search(r"<title>(.*?)</title>", head, re.IGNORECASE | re.DOTALL)
    return m.group(1) if m else None


def extract_meta_tags(head: str) -> Dict[str, str]:
    """Byte-parity with ``HeadPeekr.extract_meta_tags``
    (utils.py:3060-3079): case-sensitive ``<meta`` scan, ``name``
    wins over ``property`` when both are present, last occurrence
    wins, key case preserved. Canonical comes only from a
    ``<meta name="canonical">`` tag — the reference never reads
    ``<link rel="canonical">`` (its SEOFilter does
    ``meta.get("canonical")`` over this same dict, filters.py:630)."""
    meta: Dict[str, str] = {}
    for m in _META_TAG_RE.finditer(head):
        tag = m.group(0)
        name_match = _META_NAME_RE.search(tag)
        property_match = _META_PROP_RE.search(tag)
        content_match = _META_CONTENT_RE.search(tag)
        if content_match and (name_match or property_match):
            key = name_match.group(1) if name_match else property_match.group(1)
            meta[key] = content_match.group(1)
    return meta


class ContentRelevanceHead:
    """Simplified-BM25 head relevance (filters.py:502-578)."""

    def __init__(
        self,
        query: Union[str, List[str]],
        threshold: float,
        k1: float = 1.2,
        b: float = 0.75,
        avgdl: int = 1000,
    ):
        self.query = " ".join(query) if isinstance(query, list) else query
        self.query_terms = self.query.lower().split()
        self.threshold = threshold
        self.k1, self.b, self.avgdl = k1, b, avgdl

    def score_head(self, head: str) -> float:
        title = get_title(head) or ""
        meta = extract_meta_tags(head)
        doc = " ".join(
            [
                title * 3,
                meta.get("description", "") * 2,
                meta.get("keywords", ""),
                " ".join(meta.values()),
            ]
        )
        terms = doc.lower().split()
        doc_len = len(terms)
        tf: dict = defaultdict(int)
        for t in terms:
            tf[t] += 1
        score = 0.0
        for term in set(self.query_terms):
            f = tf[term]
            idf = math.log((1 + 1) / (f + 0.5) + 1)
            num = f * (self.k1 + 1)
            den = f + self.k1 * (1 - self.b + self.b * (doc_len / self.avgdl))
            score += idf * (num / den)
        return score

    def apply_head(self, head: str) -> bool:
        return bool(head) and self.score_head(head) >= self.threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        heads = [head_of(h) for h in batch.column("html").to_pylist()]
        mask = [self.apply_head(h) for h in heads]
        return batch.append_column("relevance_ok", pa.array(mask, pa.bool_()))


class SEOHead:
    """Weighted SEO quality score over the head (filters.py:581-691)."""

    DEFAULT_WEIGHTS = {
        "title_length": 0.15,
        "title_kw": 0.18,
        "meta_description": 0.12,
        "canonical": 0.10,
        "robot_ok": 0.20,
        "schema_org": 0.10,
        "url_quality": 0.15,
    }

    def __init__(
        self,
        threshold: float = 0.65,
        keywords: Optional[List[str]] = None,
        weights: Optional[Dict[str, float]] = None,
    ):
        self.threshold = threshold
        self.weights = weights or self.DEFAULT_WEIGHTS
        self.kw_re = (
            re.compile(r"\b({})\b".format("|".join(map(re.escape, keywords))), re.I)
            if keywords
            else None
        )

    def score(self, url: str, head: str) -> float:
        meta = extract_meta_tags(head)
        title = get_title(head) or ""
        parsed = urlparse(url)
        factors = {
            "title_length": self._title_length(title),
            "title_kw": self._kw(title),
            "meta_description": self._desc(meta.get("description", "")),
            "canonical": self._canonical(meta.get("canonical"), url),
            "robot_ok": 1.0 if "noindex" not in meta.get("robots", "") else 0.0,
            "schema_org": 1.0 if _LDJSON_RE.search(head) else 0.0,
            "url_quality": self._url_quality(parsed),
        }
        return sum(w * factors[k] for k, w in self.weights.items())

    @staticmethod
    def _title_length(title: str) -> float:
        n = len(title)
        if 50 <= n <= 60:
            return 1.0
        if 40 <= n < 50 or 60 < n <= 70:
            return 0.7
        return 0.3

    def _kw(self, text: str) -> float:
        if not self.kw_re:
            return 0.0
        return min(len(self.kw_re.findall(text)) * 0.3, 1.0)

    @staticmethod
    def _desc(desc: str) -> float:
        n = len(desc)
        if 140 <= n <= 160:
            return 1.0
        return 0.5 if 120 <= n <= 200 else 0.2

    @staticmethod
    def _canonical(canonical: Optional[str], original: str) -> float:
        if not canonical:
            return 0.5
        return 1.0 if canonical == original else 0.2

    @staticmethod
    def _url_quality(parsed) -> float:
        score = 1.0
        path = parsed.path.lower()
        if len(path) > 80:
            score *= 0.7
        if re.search(r"\d{4}", path):
            score *= 0.8
        if parsed.query:
            score *= 0.6
        if "_" in path:
            score *= 0.9
        return score

    def apply_head(self, url: str, head: str) -> bool:
        return bool(head) and self.score(url, head) >= self.threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        heads = [head_of(h) for h in batch.column("html").to_pylist()]
        scores = [self.score(u, h) if h else 0.0 for u, h in zip(urls, heads)]
        mask = [s >= self.threshold for s in scores]
        return batch.append_column(
            "seo_score", pa.array(scores, pa.float64())
        ).append_column("seo_ok", pa.array(mask, pa.bool_()))
