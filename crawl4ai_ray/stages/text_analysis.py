"""Text-analysis stages for training-data pipelines over `documents`.

Beyond-reference operators (required by the build brief): language ID,
quality scoring, token counting, document fingerprinting. All are
vectorized ``map_batches`` stages; the heavier ones are actor classes
so per-actor state (compiled regexes, n-gram profiles) is built once.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash64, rolling_hash

# -- language ID ------------------------------------------------------------

# Tiny trigram profiles for a handful of languages: most-frequent
# character trigrams from public frequency tables (approximate; this is
# an n-gram heuristic, not a trained model).
_PROFILES = {
    "en": [" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng "],
    "de": ["en ", "er ", " de", "der", "ie ", " di", "die", "ch ", "sch", "ein"],
    "fr": [" de", "de ", "es ", " le", "le ", "ent", "nt ", "la ", " la", "ion"],
    "es": [" de", "de ", "os ", " la", "la ", "el ", " el", "que", " qu", "ue "],
    "zh": [],  # script-based detection below
}


class LangIdBatch:
    """Heuristic language ID: CJK/script detection first, then
    trigram-profile overlap. Profiles built once per actor."""

    def __init__(self):
        self.profiles = {
            lang: {g: len(grams) - i for i, g in enumerate(grams)}
            for lang, grams in _PROFILES.items()
            if grams
        }
        self.word_re = re.compile(r"\w+", re.U)

    def classify(self, text: str) -> str:
        if not text:
            return "und"
        sample = text[:2000]
        n_cjk = sum(1 for ch in sample[:200] if "一" <= ch <= "鿿")
        if n_cjk > len(sample[:200]) * 0.2:
            return "zh"
        low = sample.lower()
        grams = Counter(low[i : i + 3] for i in range(len(low) - 2))
        best, best_score = "und", 0
        for lang, prof in self.profiles.items():
            score = sum(c * prof.get(g, 0) for g, c in grams.items())
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        preds = [self.classify(t) for t in texts]
        return batch.append_column("pred_lang", pa.array(preds, pa.string()))


# -- quality scoring --------------------------------------------------------

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by from".split()
)


def quality_batch(df: pd.DataFrame, text_column: str = "text") -> pd.DataFrame:
    """Vectorized quality heuristics: length, mean word length,
    punctuation ratio, stopword ratio, uppercase ratio, and a composite
    0-1 quality score (C4/Gopher-style rule spirit)."""
    s = df[text_column].fillna("")
    n_chars = s.str.len()
    words = s.str.split()
    n_words = words.str.len().fillna(0).astype("int64")
    mean_word_len = (n_chars / n_words.clip(lower=1)).astype("float64")
    n_punct = s.str.count(r"[\.,;:!?]")
    punct_ratio = (n_punct / n_chars.clip(lower=1)).astype("float64")
    stop_counts = words.map(
        lambda ws: sum(1 for w in ws if w.lower() in _STOPWORDS) if isinstance(ws, list) else 0
    )
    stop_ratio = (stop_counts / n_words.clip(lower=1)).astype("float64")
    upper_ratio = (s.str.count(r"[A-Z]") / n_chars.clip(lower=1)).astype("float64")

    score = (
        (n_words.clip(0, 200) / 200.0) * 0.3
        + (1.0 - (mean_word_len - 5.0).abs().clip(0, 5) / 5.0) * 0.2
        + stop_ratio.clip(0, 0.5) / 0.5 * 0.3
        + (1.0 - upper_ratio.clip(0, 0.3) / 0.3) * 0.2
    )
    out = df[[c for c in df.columns if c != text_column]].copy()
    # unrounded: same-operand IEEE divisions are bit-identical to the
    # DuckDB oracle, while round() tie-breaking rules differ
    out["n_words"] = n_words
    out["mean_word_len"] = mean_word_len
    out["punct_ratio"] = punct_ratio
    out["stop_ratio"] = stop_ratio
    out["quality_score"] = score
    return out


# -- token counting ---------------------------------------------------------

# BPE-ish pre-tokenizer regex (GPT-2 style split classes, simplified)
_BPE_RE = re.compile(r"'(?:[sdmt]|ll|ve|re)| ?\w+| ?[^\s\w]+|\s+(?!\S)|\s+")


class TokenCountBatch:
    """Whitespace + BPE-ish token counting (compiled once/actor)."""

    def __init__(self):
        self.bpe = _BPE_RE

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"].fillna("")
        out = df[[c for c in df.columns if c != "text"]].copy()
        out["n_tokens_ws"] = s.str.split().str.len().astype("int64")
        # vectorized match count (C regex loop) == len(findall(...))
        out["n_tokens_bpe"] = s.str.count(self.bpe).astype("int64")
        return out


# -- document fingerprinting ------------------------------------------------


def fingerprint_batch(batch: pa.Table, shingle_k: int = 4, keep: int = 8) -> pa.Table:
    """MOSS-style winnowed fingerprint: the ``keep`` lexicographically
    smallest md5 digests of the document's word ``shingle_k``-grams.
    md5 keeps the digest function standard so the oracle can recompute
    the identical fingerprint in SQL (min-hash selection = winnowing)."""
    import hashlib

    ids = batch.column("doc_id")
    texts = batch.column("text").to_pylist()
    fps = []
    for t in texts:
        words = (t or "").split()
        if not words:
            fps.append([])
            continue
        if len(words) < shingle_k:
            grams = {" ".join(words)}
        else:
            grams = {
                " ".join(words[i : i + shingle_k])
                for i in range(len(words) - shingle_k + 1)
            }
        digs = sorted(hashlib.md5(g.encode()).hexdigest() for g in grams)
        fps.append(digs[:keep])
    return pa.table(
        {
            "doc_id": ids,
            "fingerprint": pa.array(fps, pa.list_(pa.string())),
        }
    )


def rolling_fingerprint_batch(batch: pa.Table, window: int = 16, keep: int = 8) -> pa.Table:
    """Winnowed rolling-hash fingerprint (hashing.py rolling_hash):
    the ``keep`` smallest window hashes form the doc fingerprint."""
    ids = batch.column("doc_id")
    texts = batch.column("text").to_pylist()
    fps = []
    for t in texts:
        hs = rolling_hash(t or "", window=window)
        sel = np.sort(np.unique(hs))[:keep]
        fps.append([int(x) for x in sel])
    return pa.table(
        {
            "doc_id": ids,
            "fingerprint": pa.array(fps, pa.list_(pa.uint64())),
        }
    )
