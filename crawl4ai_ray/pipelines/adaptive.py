"""Adaptive crawler — reference ``AdaptiveCrawler`` with the
``StatisticalStrategy`` (crawl4ai/adaptive_crawler.py:301-613,
1330-1500): crawl outward from a start url, keep a term-statistics
knowledge base, and stop when the information need expressed by
``query`` is satisfied (confidence = 0.4*coverage + 0.3*consistency +
0.3*saturation, adaptive_crawler.py:309-326).

Ray mapping: each round's ``top_k_links`` fetch+extract runs through
``run_fetch_extract_wave`` (the same fused distributed wave as the
BFS engine — tiny rounds take its inline driver path); the
term-statistics update, scoring and ranking are driver-side over
compact text (the knowledge base is bounded by ``max_pages``). State
is JSON-checkpointed per round (reference CrawlState.save,
adaptive_crawler.py:53-111).

Scoring formulas follow the reference exactly:
- coverage: per query-term df/N with log-tf boost, sqrt curve
  (:328-367)
- consistency: mean pairwise Jaccard of document term sets (:369-394)
- saturation: 1 - recent/initial new-term discovery rate (:396-411)
- link rank: 0.5*relevance + 0.3*novelty + 0.2*authority (:413-438);
  relevance = query-term overlap of the link preview text (:440-471);
  novelty = fraction of preview terms unseen (:472-497); authority =
  url-shape heuristics (:498-525)
- stop: confidence >= threshold | pages >= max_pages | no links |
  saturation >= threshold (:527-547)
"""

from __future__ import annotations

import json
import math
import os
import re
import tempfile
from collections import Counter, defaultdict
from dataclasses import dataclass, field
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq

_TOKEN_CLEAN = re.compile(r"[^\w\s]")


def tokenize(text: str) -> list[str]:
    """Reference _tokenize (adaptive_crawler.py:598-608): strip
    punctuation, whitespace split, keep len>2."""
    return [t for t in _TOKEN_CLEAN.sub(" ", text or "").split() if len(t) > 2]


@dataclass
class AdaptiveConfig:
    """Statistical-strategy subset of the reference AdaptiveConfig
    (adaptive_crawler.py:154-257)."""

    confidence_threshold: float = 0.7
    max_depth: int = 5
    max_pages: int = 20
    top_k_links: int = 3
    min_gain_threshold: float = 0.1
    saturation_threshold: float = 0.8
    coverage_weight: float = 0.4
    consistency_weight: float = 0.3
    saturation_weight: float = 0.3
    relevance_weight: float = 0.5
    novelty_weight: float = 0.3
    authority_weight: float = 0.2
    save_state: bool = False
    state_path: Optional[str] = None


@dataclass
class AdaptiveState:
    """Term-statistics knowledge base (reference CrawlState,
    adaptive_crawler.py:27-111, statistical fields only)."""

    query: str = ""
    crawled_urls: set = field(default_factory=set)
    crawl_order: list = field(default_factory=list)
    doc_terms: list = field(default_factory=list)  # list[set[str]] per doc
    term_frequencies: Counter = field(default_factory=Counter)
    document_frequencies: Counter = field(default_factory=Counter)
    new_terms_history: list = field(default_factory=list)
    pending_links: list = field(default_factory=list)  # dicts href/text/title
    metrics: dict = field(default_factory=dict)
    total_documents: int = 0

    def save(self, path: str) -> None:
        data = {
            "query": self.query,
            "crawled_urls": sorted(self.crawled_urls),
            "crawl_order": self.crawl_order,
            "doc_terms": [sorted(s) for s in self.doc_terms],
            "term_frequencies": dict(self.term_frequencies),
            "document_frequencies": dict(self.document_frequencies),
            "new_terms_history": self.new_terms_history,
            "pending_links": self.pending_links,
            "metrics": self.metrics,
            "total_documents": self.total_documents,
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "AdaptiveState":
        with open(path) as f:
            d = json.load(f)
        st = cls(query=d["query"])
        st.crawled_urls = set(d["crawled_urls"])
        st.crawl_order = d["crawl_order"]
        st.doc_terms = [set(x) for x in d["doc_terms"]]
        st.term_frequencies = Counter(d["term_frequencies"])
        st.document_frequencies = Counter(d["document_frequencies"])
        st.new_terms_history = d["new_terms_history"]
        st.pending_links = d["pending_links"]
        st.metrics = d["metrics"]
        st.total_documents = d["total_documents"]
        return st


class StatisticalScorer:
    """Reference StatisticalStrategy scoring, verbatim formulas."""

    def coverage(self, state: AdaptiveState) -> float:
        if not state.query or state.total_documents == 0:
            return 0.0
        query_terms = tokenize(state.query.lower())
        if not query_terms:
            return 0.0
        max_tf = max(state.term_frequencies.values()) if state.term_frequencies else 1
        scores = []
        for term in query_terms:
            tf = state.term_frequencies.get(term, 0)
            df = state.document_frequencies.get(term, 0)
            if df > 0:
                doc_coverage = df / state.total_documents
                freq_signal = (
                    math.log(1 + tf) / math.log(1 + max_tf) if max_tf > 0 else 0
                )
                scores.append(doc_coverage * (1 + 0.5 * freq_signal))
            else:
                scores.append(0.0)
        return min(1.0, math.sqrt(sum(scores) / len(scores)))

    def consistency(self, state: AdaptiveState) -> float:
        docs = state.doc_terms
        if len(docs) < 2:
            return 1.0
        overlaps = []
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                a, b = docs[i], docs[j]
                if a and b:
                    overlaps.append(len(a & b) / len(a | b))
        return sum(overlaps) / len(overlaps) if overlaps else 0.0

    def saturation(self, state: AdaptiveState) -> float:
        h = state.new_terms_history
        if len(h) < 2:
            return 0.0
        recent = h[-1] if h[-1] > 0 else 1
        initial = h[0] if h[0] > 0 else 1
        return max(0.0, min(1.0 - recent / initial, 1.0))

    def confidence(self, state: AdaptiveState, cfg: AdaptiveConfig) -> float:
        if state.total_documents == 0:
            return 0.0
        cov = self.coverage(state)
        con = self.consistency(state)
        sat = self.saturation(state)
        state.metrics.update(
            {"coverage": cov, "consistency": con, "saturation": sat}
        )
        return (
            cfg.coverage_weight * cov
            + cfg.consistency_weight * con
            + cfg.saturation_weight * sat
        )

    # -- link scoring -----------------------------------------------------

    def relevance(self, link: dict, state: AdaptiveState) -> float:
        if not state.query:
            return 0.0
        text = " ".join(
            filter(None, [link.get("text"), link.get("title")])
        ).lower()
        if not text:
            return 0.0
        q = set(tokenize(state.query.lower()))
        if not q:
            return 0.0
        return len(q & set(tokenize(text))) / len(q)

    def novelty(self, link: dict, state: AdaptiveState) -> float:
        if state.total_documents == 0:
            return 1.0
        text = " ".join(
            filter(None, [link.get("text"), link.get("title")])
        ).lower()
        terms = set(tokenize(text))
        if not terms:
            return 0.5
        return len(terms - set(state.term_frequencies)) / len(terms)

    def authority(self, link: dict) -> float:
        href = (link.get("href") or "").lower()
        if not href:
            return 0.0
        score = 0.5
        if "/docs/" in href or "/documentation/" in href:
            score += 0.2
        if "/api/" in href or "/reference/" in href:
            score += 0.2
        if "/guide/" in href or "/tutorial/" in href:
            score += 0.1
        if href.endswith(".pdf"):
            score += 0.1
        elif href.endswith((".jpg", ".png", ".gif")):
            score -= 0.3
        return min(score, 1.0)

    def rank_links(
        self, state: AdaptiveState, cfg: AdaptiveConfig
    ) -> list[tuple[dict, float]]:
        out = []
        for link in state.pending_links:
            if link.get("href") in state.crawled_urls:
                continue
            s = (
                cfg.relevance_weight * self.relevance(link, state)
                + cfg.novelty_weight * self.novelty(link, state)
                + cfg.authority_weight * self.authority(link)
            )
            out.append((link, s))
        out.sort(key=lambda x: (-x[1], x[0].get("href") or ""))
        return out

    def should_stop(self, state: AdaptiveState, cfg: AdaptiveConfig) -> bool:
        if state.metrics.get("confidence", 0.0) >= cfg.confidence_threshold:
            return True
        if len(state.crawled_urls) >= cfg.max_pages:
            return True
        if not state.pending_links:
            return True
        if state.metrics.get("saturation", 0.0) >= cfg.saturation_threshold:
            return True
        return False

    def update_state(self, state: AdaptiveState, results: list[dict]) -> None:
        """results: dicts with url, markdown, links (href/text/title)."""
        for r in results:
            before = len(state.term_frequencies)
            terms = tokenize((r.get("markdown") or "").lower())
            term_set = set()
            for t in terms:
                state.term_frequencies[t] += 1
                term_set.add(t)
            for t in term_set:
                state.document_frequencies[t] += 1
            state.doc_terms.append(term_set)
            state.new_terms_history.append(len(state.term_frequencies) - before)
            state.total_documents += 1
            state.crawl_order.append(r["url"])


class AdaptiveCrawler:
    """query-driven adaptive crawl over the corpus (reference
    ``AdaptiveCrawler.digest``, adaptive_crawler.py:1330-1500)."""

    def __init__(
        self,
        corpus_dir: str,
        out_dir: Optional[str] = None,
        config: Optional[AdaptiveConfig] = None,
    ):
        self.corpus_dir = corpus_dir
        self.out_dir = out_dir or tempfile.mkdtemp(prefix="c4r_adaptive_")
        self.config = config or AdaptiveConfig()
        self.scorer = StatisticalScorer()
        self.state = AdaptiveState()
        self._round = 0

    # -- fetch+extract one batch through the shared wave machinery --------

    def _crawl_batch(self, urls: list[str]) -> list[dict]:
        from .crawl import run_fetch_extract_wave

        tbl = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "depth": pa.array([0] * len(urls), pa.int32()),
                "parent_url": pa.array([None] * len(urls), pa.string()),
                "order": pa.array(list(range(len(urls))), pa.int64()),
                "host": pa.array([""] * len(urls), pa.string()),
            }
        )
        run_fetch_extract_wave(
            self.corpus_dir,
            tbl,
            self.out_dir,
            self._round,
            prefix="round",
        )
        wave_dir = os.path.join(self.out_dir, f"round={self._round:05d}")
        self._round += 1
        out = []
        part = pq.read_table(
            wave_dir, columns=["url", "success", "raw_markdown", "links_internal"]
        )
        by_url = {
            u: (s, m, l)
            for u, s, m, l in zip(
                part.column("url").to_pylist(),
                part.column("success").to_pylist(),
                part.column("raw_markdown").to_pylist(),
                part.column("links_internal").to_pylist(),
            )
        }
        for u in urls:  # preserve request order (reference processes serially)
            s, m, links = by_url.get(u, (False, "", []))
            if s:
                out.append({"url": u, "markdown": m, "links": links})
        return out

    def digest(
        self, start_url: str, query: str, resume_from: Optional[str] = None
    ) -> AdaptiveState:
        cfg = self.config
        if resume_from:
            self.state = AdaptiveState.load(resume_from)
            self.state.query = query
        else:
            self.state = AdaptiveState(query=query)
        st, sc = self.state, self.scorer

        if start_url not in st.crawled_urls:
            results = self._crawl_batch([start_url])
            for r in results:
                st.crawled_urls.add(r["url"])
                st.pending_links.extend(r["links"])
            sc.update_state(st, results)

        depth = 0
        while depth < cfg.max_depth:
            st.metrics["confidence"] = sc.confidence(st, cfg)
            if sc.should_stop(st, cfg):
                break
            ranked = sc.rank_links(st, cfg)
            if not ranked or ranked[0][1] < cfg.min_gain_threshold:
                break
            to_crawl = [
                l["href"]
                for l, _ in ranked[: cfg.top_k_links]
                if l.get("href") not in st.crawled_urls
            ]
            if not to_crawl:
                break
            results = self._crawl_batch(to_crawl)
            for u in to_crawl:
                st.crawled_urls.add(u)
            for r in results:
                st.pending_links.extend(r["links"])
            sc.update_state(st, results)
            depth += 1
            if cfg.save_state and cfg.state_path:
                st.save(cfg.state_path)

        st.metrics["confidence"] = sc.confidence(st, cfg)
        if cfg.save_state and cfg.state_path:
            st.save(cfg.state_path)
        return st
