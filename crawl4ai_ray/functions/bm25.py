"""BM25Okapi scoring for link-preview / seeder contextual relevance.

Reimplements the exact scoring chain the reference runs in
``AsyncUrlSeeder._calculate_bm25_score`` (async_url_seeder.py:1703-1755):
tokenize by ``lower().split()``, score with the rank_bm25 package's
``BM25Okapi`` (k1=1.5, b=0.75, epsilon=0.25 — the published Okapi
variant with epsilon-floored negative IDFs), then min-max normalize to
0-1 (all-equal -> 0.5).  ``rank_bm25`` is not vendored by the
reference and not installed here, so the algorithm is reimplemented
from its public definition; arithmetic order matches the package
(numpy elementwise expression) so scores are bit-identical.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence

import numpy as np

K1 = 1.5
B = 0.75
EPSILON = 0.25


def bm25_okapi_scores(
    query_tokens: Sequence[str],
    tokenized_docs: Sequence[Sequence[str]],
    k1: float = K1,
    b: float = B,
    epsilon: float = EPSILON,
) -> np.ndarray:
    """Raw BM25Okapi scores of each doc against the query.

    Mirrors rank_bm25.BM25Okapi: per-word document frequencies ``nd``;
    idf(w) = ln(N - df + 0.5) - ln(df + 0.5); negative idfs floored to
    epsilon * average_idf (average over the *unfloored* vocabulary);
    score += idf(q) * (tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))).
    """
    n = len(tokenized_docs)
    if n == 0:
        return np.zeros(0)
    doc_freqs: List[Dict[str, int]] = []
    doc_len = np.zeros(n)
    nd: Dict[str, int] = {}
    num_doc = 0
    for i, doc in enumerate(tokenized_docs):
        doc_len[i] = len(doc)
        num_doc += len(doc)
        freq: Dict[str, int] = {}
        for w in doc:
            freq[w] = freq.get(w, 0) + 1
        doc_freqs.append(freq)
        for w in freq:
            nd[w] = nd.get(w, 0) + 1
    avgdl = num_doc / n

    idf: Dict[str, float] = {}
    idf_sum = 0.0
    negative = []
    for w, df in nd.items():
        v = math.log(n - df + 0.5) - math.log(df + 0.5)
        idf[w] = v
        idf_sum += v
        if v < 0:
            negative.append(w)
    if idf:
        eps = epsilon * (idf_sum / len(idf))
        for w in negative:
            idf[w] = eps

    score = np.zeros(n)
    for q in query_tokens:
        q_freq = np.array([(d.get(q) or 0) for d in doc_freqs], dtype=float)
        score += (idf.get(q) or 0) * (
            q_freq * (k1 + 1) / (q_freq + k1 * (1 - b + b * doc_len / avgdl))
        )
    return score


def minmax_normalize(scores: Sequence[float]) -> List[float]:
    """Seeder's 0-1 normalization (async_url_seeder.py:1735-1746):
    all-equal -> 0.5 for every doc."""
    scores = list(scores)
    if not scores:
        return []
    lo, hi = min(scores), max(scores)
    if hi == lo:
        return [0.5] * len(scores)
    return [(s - lo) / (hi - lo) for s in scores]


def bm25_relevance(query: str, documents: Sequence[str]) -> List[float]:
    """Full reference chain: whitespace-lowercase tokenize -> Okapi ->
    min-max normalize.  Empty query/doc set -> zeros (reference
    returns zero scores before the normalize step in that case)."""
    if not query or not documents:
        return [0.0] * len(documents)
    tokenized = [d.lower().split() for d in documents]
    if all(len(d) == 0 for d in tokenized):
        return [0.0] * len(documents)
    raw = bm25_okapi_scores(query.lower().split(), tokenized)
    return minmax_normalize(raw)
