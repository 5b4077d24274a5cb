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

Round 3 adds the reference's ``EmbeddingStrategy``
(adaptive_crawler.py:615-1290): semantic-space coverage with an
injectable embedder (deterministic ``HashingEmbedder`` by default —
the same seam style as CosineStrategy) and an injectable query
expander standing in for the reference's LLM variation generator
(adaptive_crawler.py:726-806). All scoring math follows the
reference exactly:
- query space: n*1.3 variations, 80/20 train/validation split with
  the original query pinned to train (:784-800)
- coverage gaps: per-query min cosine distance to the KB (:841-869)
- link selection: gap-improvement sum (scaled x2) averaged over
  gaps outside ``coverage_radius``, times (1 - overlap penalty
  above ``overlap_threshold``) (:871-986)
- confidence: mean best-cosine per query (hit-rate if
  ``coverage_tau`` set) (:988-1015)
- stop: below-minimum relevance | limits | convergence (avg abs
  improvement < rel-improvement x confidence) validated on the
  held-out queries (:1155-1204)
- KB update: embed markdown[:5000], dedup at 0.95 similarity
  (:1233-1290)
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import random
import re
import tempfile
from collections import Counter, defaultdict
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np
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
    # -- embedding strategy (reference adaptive_crawler.py:161-256) --
    strategy: str = "statistical"  # "statistical" | "embedding"
    n_query_variations: int = 10
    embedding_min_confidence_threshold: float = 0.1
    embedding_coverage_radius: float = 0.2
    embedding_k_exp: float = 1.0
    embedding_nearest_weight: float = 0.7
    embedding_top_k_weight: float = 0.3
    embedding_overlap_threshold: float = 0.85
    embedding_min_relative_improvement: float = 0.1
    embedding_validation_min_score: float = 0.3
    embedding_quality_min_confidence: float = 0.7
    embedding_quality_max_confidence: float = 0.95
    embedding_quality_scale_factor: float = 0.833
    coverage_tau: Optional[float] = None
    kb_similarity_threshold: float = 0.95


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
    # -- embedding strategy (reference CrawlState:45-51) --
    kb_embeddings: Optional[np.ndarray] = None
    query_embeddings: Optional[np.ndarray] = None
    expanded_queries: list = field(default_factory=list)
    validation_queries: list = field(default_factory=list)
    confidence_history: list = field(default_factory=list)

    def save(self, path: str) -> None:
        data = {
            # embedding fields serialize as lists (reference
            # CrawlState.save:72-76); confidence_history intentionally
            # NOT persisted (reference omits it — resume restarts
            # convergence tracking)
            "kb_embeddings": (
                self.kb_embeddings.tolist()
                if self.kb_embeddings is not None
                else None
            ),
            "query_embeddings": (
                self.query_embeddings.tolist()
                if self.query_embeddings is not None
                else None
            ),
            "expanded_queries": self.expanded_queries,
            "validation_queries": self.validation_queries,
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
        if d.get("kb_embeddings") is not None:
            st.kb_embeddings = np.array(d["kb_embeddings"])
        if d.get("query_embeddings") is not None:
            st.query_embeddings = np.array(d["query_embeddings"])
        st.expanded_queries = d.get("expanded_queries", [])
        st.validation_queries = d.get("validation_queries", [])
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


def default_query_expander(query: str, n: int) -> list[str]:
    """Deterministic stand-in for the reference's LLM query-variation
    generator (adaptive_crawler.py:726-760): token rotations plus
    aspect-suffixed rephrasings. Injectable — a production deployment
    passes an LLM-backed callable with the same signature."""
    toks = query.split()
    out = []
    aspects = [
        "overview", "examples", "tutorial", "reference", "comparison",
        "best practices", "internals", "performance", "api", "faq",
        "guide", "advanced", "basics", "troubleshooting",
    ]
    for i in range(n):
        if toks and i % 3 == 0:
            rot = toks[i % len(toks):] + toks[: i % len(toks)]
            out.append(" ".join(rot) + f" {aspects[i % len(aspects)]}")
        else:
            out.append(f"{query} {aspects[i % len(aspects)]}")
    return out


class EmbeddingScorer:
    """Reference ``EmbeddingStrategy`` (adaptive_crawler.py:615-1290)
    with injectable embedder + query expander (the LLM/
    sentence-transformers seams). All scoring math mirrors the
    reference exactly; differential-pinned by
    tests/test_adaptive_embedding.py against the loaded reference
    class."""

    def __init__(
        self,
        embedder=None,
        query_expander: Optional[Callable[[str, int], list[str]]] = None,
        shuffle: Optional[Callable[[list], None]] = None,
    ):
        if embedder is None:
            from ..stages.cosine_extract import HashingEmbedder

            embedder = HashingEmbedder(64)
        self.embedder = embedder
        self.query_expander = query_expander or default_query_expander
        # reference uses global random.shuffle (:784); ours defaults to
        # a seeded Random for determinism, injectable for parity tests
        self.shuffle = shuffle or random.Random(0).shuffle
        self._link_embedding_cache: dict = {}
        self._validation_embeddings_cache = None
        self._validation_passed = False
        self._distance_matrix_cache = None
        self._kb_embeddings_hash = None

    # -- embedding plumbing -------------------------------------------------

    def _embed(self, texts: list[str]) -> np.ndarray:
        return np.asarray(self.embedder.encode(texts))

    @staticmethod
    def _distance_matrix(q: np.ndarray, kb: np.ndarray):
        """1 - cosine similarity, vectorized (reference :682-706)."""
        if kb is None or len(kb) == 0:
            return None
        q = np.atleast_2d(q)
        kb = np.atleast_2d(kb)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        kn = kb / np.linalg.norm(kb, axis=1, keepdims=True)
        return 1.0 - qn @ kn.T

    def _cached_distance_matrix(self, q, kb):
        if kb is None or len(kb) == 0:
            return None
        kb_hash = hash(kb.tobytes())
        if self._distance_matrix_cache is None or kb_hash != self._kb_embeddings_hash:
            self._distance_matrix_cache = self._distance_matrix(q, kb)
            self._kb_embeddings_hash = kb_hash
        return self._distance_matrix_cache

    # -- query space (reference :726-806) -----------------------------------

    def map_query_semantic_space(
        self, query: str, n_synthetic: int = 10
    ) -> tuple[np.ndarray, list[str]]:
        n_total = int(n_synthetic * 1.3)
        variations = self.query_expander(query, n_total)
        other = list(variations)
        self.shuffle(other)
        n_validation = max(2, int(len(other) * 0.2))
        val_queries = other[-n_validation:]
        train_queries = [query] + other[:-n_validation]
        self._validation_queries = val_queries
        return self._embed(train_queries), train_queries

    # -- coverage gaps (reference :841-869) ----------------------------------

    def find_coverage_gaps(self, kb, query_embeddings) -> list[tuple]:
        if kb is None or len(kb) == 0:
            return [(q, 1.0) for q in query_embeddings]
        dm = self._cached_distance_matrix(query_embeddings, kb)
        if dm is None:
            return [(q, 1.0) for q in query_embeddings]
        min_d = np.min(dm, axis=1)
        return [(q, min_d[i]) for i, q in enumerate(query_embeddings)]

    # -- link selection (reference :871-986) ----------------------------------

    @staticmethod
    def _link_text(link: dict) -> str:
        return " ".join(
            filter(None, [link.get("text") or "", link.get("title") or ""])
        )

    def select_links_for_expansion(
        self, candidate_links: list[dict], gaps: list[tuple], kb, cfg
    ) -> list[tuple[dict, float]]:
        # batch-embed uncached link texts (cache keyed md5(href:text),
        # reference :905-933)
        to_embed, texts, emb_map = [], [], {}
        for link in candidate_links:
            text = self._link_text(link)
            if not text.strip():
                continue
            key = hashlib.md5(
                f"{link.get('href')}:{text}".encode()
            ).hexdigest()
            if key in self._link_embedding_cache:
                emb_map[link.get("href")] = self._link_embedding_cache[key]
            else:
                to_embed.append(link)
                texts.append(text)
        if texts:
            new_embs = self._embed(texts)
            for link, text, emb in zip(to_embed, texts, new_embs):
                key = hashlib.md5(
                    f"{link.get('href')}:{text}".encode()
                ).hexdigest()
                self._link_embedding_cache[key] = emb
                emb_map[link.get("href")] = emb

        radius = cfg.embedding_coverage_radius
        gap_arr = (
            np.stack([g[0] for g in gaps]) if gaps else np.zeros((0, 1))
        )
        gap_d = np.array([g[1] for g in gaps]) if gaps else np.zeros(0)
        needing = gap_d > radius
        n_needing = int(needing.sum())
        if kb is not None and len(kb):
            kb_norm = kb / np.linalg.norm(kb, axis=1, keepdims=True)
        scored = []
        for link in candidate_links:
            href = link.get("href")
            if href not in emb_map:
                continue
            emb = emb_map[href]
            if not gaps:
                score = 0.0
            else:
                if n_needing > 0:
                    # cosine distance from this link to each needing gap
                    gn = gap_arr[needing]
                    gn = gn / np.linalg.norm(gn, axis=1, keepdims=True)
                    en = emb / np.linalg.norm(emb)
                    new_d = 1.0 - gn @ en
                    helped = new_d < gap_d[needing]
                    total_improvement = float(
                        ((gap_d[needing] - new_d) * 2)[helped].sum()
                    )
                    gap_reduction = total_improvement / n_needing
                else:
                    gap_reduction = 0.0
                if kb is not None and len(kb):
                    sims = kb_norm @ (emb / np.linalg.norm(emb))
                    max_sim = float(np.max(sims))
                    thr = cfg.embedding_overlap_threshold
                    overlap_penalty = (
                        (max_sim - thr) * 2 if max_sim > thr else 0.0
                    )
                else:
                    overlap_penalty = 0.0
                score = gap_reduction * (1 - overlap_penalty)
                ctx = link.get("contextual_score")
                if ctx:
                    score = score * 0.8 + ctx * 0.2
            scored.append((link, score))
        # deterministic tie-break by href (reference sorts by score only)
        scored.sort(key=lambda x: (-x[1], x[0].get("href") or ""))
        return scored

    # -- confidence / stopping (reference :988-1231) --------------------------

    def confidence(self, state: AdaptiveState, cfg: AdaptiveConfig) -> float:
        if state.kb_embeddings is None or state.query_embeddings is None:
            return 0.0
        if len(state.kb_embeddings) == 0 or len(state.query_embeddings) == 0:
            return 0.0
        Q = np.asarray(state.query_embeddings, dtype=np.float32)
        D = np.asarray(state.kb_embeddings, dtype=np.float32)
        Q = Q / (np.linalg.norm(Q, axis=1, keepdims=True) + 1e-8)
        D = D / (np.linalg.norm(D, axis=1, keepdims=True) + 1e-8)
        best = (Q @ D.T).max(axis=1)
        tau = cfg.coverage_tau
        score = float((best >= tau).mean()) if tau is not None else float(best.mean())
        state.metrics["coverage_score"] = score
        state.metrics["avg_best_similarity"] = float(best.mean())
        state.metrics["median_best_similarity"] = float(np.median(best))
        return score

    def rank_links(
        self, state: AdaptiveState, cfg: AdaptiveConfig
    ) -> list[tuple[dict, float]]:
        seen, uncrawled = set(), []
        for link in state.pending_links:
            href = link.get("href")
            if href not in state.crawled_urls and href not in seen:
                uncrawled.append(link)
                seen.add(href)
        if not uncrawled:
            return []
        gaps = self.find_coverage_gaps(
            state.kb_embeddings, state.query_embeddings
        )
        return self.select_links_for_expansion(
            uncrawled, gaps, state.kb_embeddings, cfg
        )

    def validate_coverage(self, state: AdaptiveState) -> float:
        if not getattr(self, "_validation_queries", None):
            return state.metrics.get("confidence", 0.0)
        if self._validation_embeddings_cache is None:
            self._validation_embeddings_cache = self._embed(
                self._validation_queries
            )
        if state.kb_embeddings is None or len(state.kb_embeddings) == 0:
            return 0.0
        dm = self._distance_matrix(
            self._validation_embeddings_cache, state.kb_embeddings
        )
        if dm is None:
            return 0.0
        score = float(np.mean(1.0 - np.min(dm, axis=1)))
        state.metrics["validation_confidence"] = score
        return score

    def should_stop(self, state: AdaptiveState, cfg: AdaptiveConfig) -> bool:
        confidence = state.metrics.get("confidence", 0.0)
        if (
            confidence < cfg.embedding_min_confidence_threshold
            and len(state.crawled_urls) > 0
        ):
            state.metrics["stopped_reason"] = "below_minimum_relevance_threshold"
            state.metrics["is_irrelevant"] = True
            return True
        if len(state.crawled_urls) >= cfg.max_pages or not state.pending_links:
            return True
        state.confidence_history.append(confidence)
        if len(state.confidence_history) < 2:
            return False
        pairs = list(
            zip(state.confidence_history[:-1], state.confidence_history[1:])
        )
        avg_improvement = sum(abs(b - a) for a, b in pairs) / len(pairs)
        state.metrics["avg_improvement"] = avg_improvement
        if avg_improvement < cfg.embedding_min_relative_improvement * confidence:
            val = self.validate_coverage(state)
            if val > cfg.embedding_validation_min_score:
                state.metrics["stopped_reason"] = "converged_validated"
                self._validation_passed = True
                return True
            state.metrics["stopped_reason"] = "low_validation"
        return False

    def get_quality_confidence(self, state: AdaptiveState, cfg: AdaptiveConfig) -> float:
        learning = state.metrics.get("coverage_score", 0.0)
        validation = state.metrics.get("validation_confidence", 0.0)
        if self._validation_passed and validation > cfg.embedding_validation_min_score:
            if learning < 0.4:
                return cfg.embedding_quality_min_confidence
            if learning > 0.7:
                return cfg.embedding_quality_max_confidence
            return (
                cfg.embedding_quality_min_confidence
                + (learning - 0.4) * cfg.embedding_quality_scale_factor
            )
        return learning * 0.8

    def update_state(
        self,
        state: AdaptiveState,
        results: list[dict],
        cfg: Optional[AdaptiveConfig] = None,
    ) -> None:
        """Embed markdown[:5000], dedup vs KB at the similarity
        threshold, append only non-duplicates (reference :1233-1290 —
        note crawl_order gains ONLY deduplicated results here, unlike
        the statistical strategy)."""
        thr = (cfg or AdaptiveConfig()).kb_similarity_threshold
        texts, valid = [], []
        for r in results:
            content = r.get("markdown") or ""
            if content:
                texts.append(content[:5000])
                valid.append(r)
        if not texts:
            return
        new_embs = self._embed(texts)
        if state.kb_embeddings is None or len(state.kb_embeddings) == 0:
            state.kb_embeddings = new_embs
            kept = list(range(len(new_embs)))
        else:
            kept, kept_embs = [], []
            for i, emb in enumerate(new_embs):
                en = emb / np.linalg.norm(emb)
                kn = state.kb_embeddings / np.linalg.norm(
                    state.kb_embeddings, axis=1, keepdims=True
                )
                if float(np.max(kn @ en)) < thr:
                    kept.append(i)
                    kept_embs.append(emb)
            if kept_embs:
                state.kb_embeddings = np.vstack(
                    [state.kb_embeddings, np.array(kept_embs)]
                )
        for i in kept:
            state.crawl_order.append(valid[i]["url"])
        state.total_documents = len(state.kb_embeddings)
        self._kb_embeddings_hash = None
        self._distance_matrix_cache = None


class AdaptiveCrawler:
    """query-driven adaptive crawl over the corpus (reference
    ``AdaptiveCrawler.digest``, adaptive_crawler.py:1330-1500)."""

    def __init__(
        self,
        corpus_dir: str,
        out_dir: Optional[str] = None,
        config: Optional[AdaptiveConfig] = None,
        embedder=None,
        query_expander: Optional[Callable[[str, int], list[str]]] = None,
    ):
        self.corpus_dir = corpus_dir
        self.out_dir = out_dir or tempfile.mkdtemp(prefix="c4r_adaptive_")
        self.config = config or AdaptiveConfig()
        if self.config.strategy == "embedding":
            self.scorer = EmbeddingScorer(
                embedder=embedder, query_expander=query_expander
            )
        elif self.config.strategy == "statistical":
            self.scorer = StatisticalScorer()
        else:
            raise ValueError(f"Unknown strategy: {self.config.strategy}")
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
        embedding = isinstance(sc, EmbeddingScorer)
        if embedding and not resume_from:
            # expand the query's semantic space before crawling
            # (reference digest :1355-1364)
            q_emb, train_queries = sc.map_query_semantic_space(
                query, cfg.n_query_variations
            )
            st.query_embeddings = q_emb
            st.expanded_queries = train_queries[1:]
            st.validation_queries = list(sc._validation_queries)
        elif embedding and resume_from:
            sc._validation_queries = list(st.validation_queries)

        def _update(results):
            if embedding:
                sc.update_state(st, results, cfg)
            else:
                sc.update_state(st, results)

        if start_url not in st.crawled_urls:
            results = self._crawl_batch([start_url])
            for r in results:
                st.crawled_urls.add(r["url"])
                st.pending_links.extend(r["links"])
            _update(results)

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
            _update(results)
            depth += 1
            if cfg.save_state and cfg.state_path:
                st.save(cfg.state_path)

        st.metrics["confidence"] = sc.confidence(st, cfg)
        if embedding:
            # quality-mapped confidence for validated coverage
            # (reference digest :1451-1456)
            st.metrics["confidence"] = sc.get_quality_confidence(st, cfg)
        st.metrics["pages_crawled"] = len(st.crawled_urls)
        if cfg.save_state and cfg.state_path:
            st.save(cfg.state_path)
        return st
