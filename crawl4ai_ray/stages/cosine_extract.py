"""Cosine-clustering extraction — the reference's ``CosineStrategy``
(crawl4ai/extraction_strategy.py:172-532) as a Ray Data actor-pool
stage.

Reference semantics reproduced:
- split text into chunks (word windows, reference uses its chunking
  strategy output)
- embed every chunk (reference: sentence-transformers
  all-MiniLM-L6-v2 loaded once per process at __init__,
  extraction_strategy.py:245-269)
- hierarchical agglomerative clustering with cosine distance and a
  ``max_dist`` merge threshold (reference: scipy linkage 'average',
  extraction_strategy.py:307-330)
- drop clusters under ``word_count_threshold``; optional semantic
  ``semantic_filter`` query keeps only clusters whose centroid is
  within ``sim_threshold`` of the query embedding; ``top_k`` clusters
  returned.

The sentence-transformers model is NOT in this container, so the
embedder seam is pluggable: ``HashingEmbedder`` is a deterministic
bag-of-character-ngrams projection (real vector math, fake weights) —
the Ray plumbing (actor pool, once-per-actor init, batched encode) is
exactly what a real model would use; swap ``embedder="st"`` in a
deployment with the library installed.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa


class HashingEmbedder:
    """Deterministic stand-in embedder: character-3-gram hashing into
    ``dim`` buckets, l2-normalized. Stable across processes/runs."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def encode(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        for i, t in enumerate(texts):
            t = (t or "").lower()
            for j in range(max(0, len(t) - 2)):
                g = t[j : j + 3].encode("utf-8", "ignore")
                h = int.from_bytes(hashlib.blake2b(g, digest_size=8).digest(), "big")
                out[i, h % self.dim] += 1.0
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.where(norms == 0, 1, norms)


def _chunk_words(text: str, window: int = 40) -> list[str]:
    words = (text or "").split()
    if not words:
        return []
    return [
        " ".join(words[i : i + window]) for i in range(0, len(words), window)
    ]


def _agglomerative_cosine(emb: np.ndarray, max_dist: float) -> np.ndarray:
    """Average-linkage agglomerative clustering on cosine distance,
    merge while the closest pair is under ``max_dist``. O(n^3) worst
    case but n = chunks-per-document (tens), run inside the actor —
    per-document state never crosses the wire."""
    n = len(emb)
    labels = np.arange(n)
    if n <= 1:
        return labels
    active = {i: [i] for i in range(n)}
    sims = emb @ emb.T
    dist = 1.0 - sims
    while len(active) > 1:
        keys = sorted(active)
        best, pair = None, None
        for ai in range(len(keys)):
            for bi in range(ai + 1, len(keys)):
                a, b = keys[ai], keys[bi]
                d = float(
                    np.mean([dist[i, j] for i in active[a] for j in active[b]])
                )
                if best is None or d < best:
                    best, pair = d, (a, b)
        if best is None or best > max_dist:
            break
        a, b = pair
        active[a] = active[a] + active[b]
        del active[b]
    for root, members in active.items():
        for m in members:
            labels[m] = root
    return labels


class CosineClusterExtract:
    """map_batches actor: (url, text) -> exploded cluster rows.

    Output: one row per kept cluster —
    (url, cluster_id, n_chunks, word_count, text).
    Reference: CosineStrategy.extract -> List[dict] of cluster texts.
    """

    def __init__(
        self,
        word_count_threshold: int = 20,
        max_dist: float = 0.6,
        top_k: int = 3,
        semantic_filter: Optional[str] = None,
        sim_threshold: float = 0.3,
        chunk_window: int = 40,
        embedder_dim: int = 64,
    ):
        # once per actor (the reference loads its HF model here)
        self.embedder = HashingEmbedder(embedder_dim)
        self.word_count_threshold = word_count_threshold
        self.max_dist = max_dist
        self.top_k = top_k
        self.sim_threshold = sim_threshold
        self.chunk_window = chunk_window
        self.query_emb = (
            self.embedder.encode([semantic_filter])[0] if semantic_filter else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist() if "url" in batch.column_names else [
            str(i) for i in range(batch.num_rows)
        ]
        texts = batch.column("text").to_pylist()
        o_url, o_cid, o_n, o_wc, o_text = [], [], [], [], []
        for url, text in zip(urls, texts):
            chunks = _chunk_words(text, self.chunk_window)
            if not chunks:
                continue
            emb = self.embedder.encode(chunks)
            labels = _agglomerative_cosine(emb, self.max_dist)
            clusters: dict[int, list[int]] = {}
            for i, lbl in enumerate(labels):
                clusters.setdefault(int(lbl), []).append(i)
            scored = []
            for lbl, members in clusters.items():
                ctext = " ".join(chunks[i] for i in sorted(members))
                wc = len(ctext.split())
                if wc < self.word_count_threshold:
                    continue
                centroid = emb[members].mean(axis=0)
                cn = np.linalg.norm(centroid)
                centroid = centroid / (cn if cn else 1)
                if self.query_emb is not None:
                    sim = float(centroid @ self.query_emb)
                    if sim < self.sim_threshold:
                        continue
                    score = sim
                else:
                    score = float(wc)
                scored.append((score, lbl, members, ctext, wc))
            scored.sort(key=lambda x: (-x[0], x[1]))
            for rank, (score, lbl, members, ctext, wc) in enumerate(
                scored[: self.top_k]
            ):
                o_url.append(url)
                o_cid.append(rank)
                o_n.append(len(members))
                o_wc.append(wc)
                o_text.append(ctext)
        return pa.table(
            {
                "url": pa.array(o_url, pa.string()),
                "cluster_id": pa.array(o_cid, pa.int32()),
                "n_chunks": pa.array(o_n, pa.int32()),
                "word_count": pa.array(o_wc, pa.int64()),
                "text": pa.array(o_text, pa.string()),
            }
        )
