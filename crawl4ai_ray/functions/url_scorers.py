"""Frontier URL scorers — vectorizable scalar scores over url columns.

Models ``crawl4ai/deep_crawling/scorers.py``:

* ``URLScorer`` + ``ScoringStats``      -> scorers.py:26-89
* ``CompositeScorer``                   -> scorers.py:91-158
* ``KeywordRelevanceScorer``            -> scorers.py:160-188
* ``PathDepthScorer``                   -> scorers.py:190-245
* ``ContentTypeScorer``                 -> scorers.py:247-330
* ``FreshnessScorer``                   -> scorers.py:332-412
* ``DomainAuthorityScorer``             -> scorers.py:414-519

Semantics match the reference formulas (1/(1+distance) path-depth
lookup, year-difference freshness table, keyword-fraction relevance,
domain-weight map with default). Each scorer is callable
(``scorer(url)``) so it plugs into the crawler's ``url_scorer=`` seam,
and exposes ``score_batch`` for `map_batches`.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Optional

import numpy as np

_PATH_SCORE_LOOKUP = [1.0, 0.5, 1.0 / 3.0, 0.25]
_FRESHNESS_SCORES = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5]


class ScoringStats:
    __slots__ = ("urls_scored", "total_score", "min_score", "max_score")

    def __init__(self):
        self.urls_scored = 0
        self.total_score = 0.0
        self.min_score: Optional[float] = None
        self.max_score: Optional[float] = None

    def update(self, score: float) -> None:
        self.urls_scored += 1
        self.total_score += score
        if self.min_score is None or score < self.min_score:
            self.min_score = score
        if self.max_score is None or score > self.max_score:
            self.max_score = score

    def get_average(self) -> float:
        return self.total_score / self.urls_scored if self.urls_scored else 0.0


class URLScorer:
    def __init__(self, weight: float = 1.0):
        self.weight = np.float32(weight).item()  # f32 rounding like the reference
        self.stats = ScoringStats()

    def _calculate_score(self, url: str) -> float:
        raise NotImplementedError

    def score(self, url: str) -> float:
        s = self._calculate_score(url) * self.weight
        self.stats.update(s)
        return s

    __call__ = score

    def score_batch(self, urls) -> np.ndarray:
        return np.fromiter(
            (self.score(u) for u in urls), dtype=np.float64, count=len(urls)
        )


class KeywordRelevanceScorer(URLScorer):
    """Fraction of keywords present in the url."""

    def __init__(self, keywords: List[str], weight: float = 1.0, case_sensitive: bool = False):
        super().__init__(weight)
        self.case_sensitive = case_sensitive
        self.keywords = [k if case_sensitive else k.lower() for k in keywords]

    def _calculate_score(self, url: str) -> float:
        if not self.case_sensitive:
            url = url.lower()
        matches = sum(1 for k in self.keywords if k in url)
        return matches / len(self.keywords) if self.keywords else 0.0


class PathDepthScorer(URLScorer):
    """1/(1+|depth-optimal|) with the reference's lookup table."""

    def __init__(self, optimal_depth: int = 3, weight: float = 1.0):
        super().__init__(weight)
        self.optimal_depth = optimal_depth

    @staticmethod
    def _depth(url: str) -> int:
        pos = url.find("/", url.find("://") + 3)
        if pos == -1:
            return 0
        path = url[pos:]
        return len([seg for seg in path.split("/") if seg])

    def _calculate_score(self, url: str) -> float:
        distance = abs(self._depth(url) - self.optimal_depth)
        if distance < 4:
            return _PATH_SCORE_LOOKUP[distance]
        return 1.0 / (1.0 + distance)


class ContentTypeScorer(URLScorer):
    """Extension -> weight map; 0 for unmatched.

    Decision-procedure parity with scorers.py:247-330: ``.ext$`` patterns
    go to an exact-extension dict, everything else is a regex fallback
    sorted by descending score; the extension is taken from the LAST dot
    anywhere in the url, truncated at the first non-alphanumeric char
    (so bare domains yield ``com`` — a reference quirk kept on purpose)."""

    def __init__(self, type_weights: Dict[str, float], weight: float = 1.0):
        super().__init__(weight)
        self.exact: Dict[str, float] = {}
        self.regexes: list[tuple[re.Pattern, float]] = []
        for pat, w in type_weights.items():
            if pat.startswith(".") and pat.endswith("$"):
                self.exact[pat[1:-1]] = w
            else:
                self.regexes.append((re.compile(pat), w))
        self.regexes.sort(key=lambda x: -x[1])

    @staticmethod
    def _extension(url: str) -> str:
        pos = url.rfind(".")
        if pos == -1:
            return ""
        end = len(url)
        for i in range(pos + 1, len(url)):
            if not url[i].isalnum():
                end = i
                break
        return url[pos + 1 : end].lower()

    def _calculate_score(self, url: str) -> float:
        ext = self._extension(url)
        if ext:
            w = self.exact.get(ext)
            if w is not None:
                return w
        for rx, w in self.regexes:
            if rx.search(url):
                return w
        return 0.0


class FreshnessScorer(URLScorer):
    """Newest plausible year in the url -> freshness table
    (default 0.5 when no year present)."""

    _DATE_RE = re.compile(
        r"(?:/|[-_])((?:19|20)\d{2})(?:(?:/|[-_])(?:\d{2})(?:(?:/|[-_])(?:\d{2}))?)?"
    )

    def __init__(self, weight: float = 1.0, current_year: int = 2024):
        super().__init__(weight)
        self.current_year = current_year

    def _calculate_score(self, url: str) -> float:
        latest = None
        for m in self._DATE_RE.finditer(url):
            y = int(m.group(1))
            if y <= self.current_year and (latest is None or y > latest):
                latest = y
        if latest is None:
            return 0.5
        diff = self.current_year - latest
        if diff < len(_FRESHNESS_SCORES):
            return _FRESHNESS_SCORES[diff]
        return max(0.1, 1.0 - diff * 0.1)


class DomainAuthorityScorer(URLScorer):
    """domain -> authority weight broadcast-dict lookup."""

    def __init__(
        self,
        domain_weights: Dict[str, float],
        default_weight: float = 0.5,
        weight: float = 1.0,
    ):
        super().__init__(weight)
        self.domain_weights = {d.lower(): s for d, s in domain_weights.items()}
        self.default_weight = default_weight

    @staticmethod
    def _domain(url: str) -> str:
        # staged end-finding ('/' else '?' else '#'), scorers.py:455-495:
        # a '/' inside the query still terminates the domain — quirk kept
        start = url.find("://")
        start = 0 if start == -1 else start + 3
        end = url.find("/", start)
        if end == -1:
            end = url.find("?", start)
            if end == -1:
                end = url.find("#", start)
                if end == -1:
                    end = len(url)
        domain = url[start:end]
        port = domain.rfind(":")
        if port != -1:
            domain = domain[:port]
        return domain.lower()

    def _calculate_score(self, url: str) -> float:
        return self.domain_weights.get(self._domain(url), self.default_weight)


class CompositeScorer(URLScorer):
    """Sum of sub-scorer scores, optionally normalized by count.

    Float parity with scorers.py:91-158: the reference stages each
    sub-score through an ``array('f')`` slot, so every term is rounded to
    float32 before entering the float64 running total — reproduced here."""

    def __init__(self, scorers: List[URLScorer], normalize: bool = True):
        super().__init__(1.0)
        self.scorers = scorers
        self.normalize = normalize

    def _calculate_score(self, url: str) -> float:
        total = 0.0
        for s in self.scorers:
            total += np.float32(s.score(url)).item()
        if self.normalize and self.scorers:
            return total / len(self.scorers)
        return total
