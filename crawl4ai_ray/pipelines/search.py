"""Corpus-level BM25 ranked retrieval over the documents table.

Generalizes the reference's BM25Okapi scoring — seeder contextual
relevance (crawl4ai/async_url_seeder.py:1703-1755) and the
BM25ContentFilter chunk scorer (content_filter_strategy.py) both
score SMALL in-memory candidate sets — to a distributed corpus-scale
search operator: score every document against a query and return the
global top-k, with the exact rank_bm25-parity arithmetic of
functions/bm25.py (k1=1.5, b=0.75, negative IDFs floored to
epsilon*average_idf over the unfloored vocabulary).

Scale shape (two tokenizing scans, no corpus-wide shuffle of text):

1. **Stats scan** — ``map_batches`` emits per-batch PARTIAL term
   document-frequencies (one row per distinct in-batch word) plus a
   sentinel row carrying the batch's doc count and token count; one
   ``groupby("word").sum()`` over word rows (vocabulary-sized, the
   inverted-index-build shape — pre-aggregated per batch so the
   shuffle moves one row per distinct word per batch, never per
   token). The vocabulary stays distributed: the floor's
   average-IDF is computed with dataset aggregates (sum/count) and
   only the query terms' rows are collected.
2. **Scoring scan** — with the tiny (terms, idf, avgdl, N) broadcast
   in the batch-fn closure, each batch computes query-term tfs
   (explode + isin + crosstab, no per-row loop), scores
   vectorized, and emits only its top-k rows — the driver sees
   O(batches x k), never O(corpus).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions.bm25 import B, EPSILON, K1
from ..functions.wstokens import WS_TOKEN_RE

_SENTINEL = ""  # whitespace-split tokens can never be empty


def _tokenize(texts: pd.Series) -> pd.Series:
    """Lowercase + RE2-``\\s``-class tokenization (wstokens contract):
    oracle-exact on ALL inputs, unlike ``str.split()`` which also
    splits on NBSP/``\\x0b``/Unicode spaces (ADVICE r2)."""
    return texts.fillna("").str.lower().str.findall(WS_TOKEN_RE)


def _make_word_mask_batch(words: list[str]):
    """Vectorized ``word IN (...)`` selection over the vocabulary-stats
    table: a pyarrow ``is_in`` kernel inside ``map_batches`` instead of
    a per-row Python predicate (``Dataset.filter(fn)``), which at 100 TB
    would run Python on billions of vocabulary rows."""
    vals = pa.array(words, pa.string())

    def _mask(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t.column("word"), value_set=vals))

    return _mask


def _stats_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch partial stats: (word, df) rows + one sentinel row
    with (n_docs, total_tokens) in the (df, dl) columns."""
    toks = _tokenize(df["text"]).reset_index(drop=True)
    ex = toks.explode().dropna()
    pairs = pd.DataFrame({"i": ex.index, "word": ex.values}).drop_duplicates()
    dfc = pairs.groupby("word", sort=False).size()
    out = pd.DataFrame(
        {
            "word": dfc.index.astype(str),
            "df": dfc.values.astype("int64"),
            "dl": np.zeros(len(dfc), dtype="int64"),
            "n": np.zeros(len(dfc), dtype="int64"),
        }
    )
    sent = pd.DataFrame(
        {
            "word": [_SENTINEL],
            "df": [0],
            "dl": [int(toks.str.len().sum())],
            "n": [len(df)],
        }
    )
    return pd.concat([out, sent], ignore_index=True)


def corpus_bm25_stats(sf_dir: str, query_terms: list[str]) -> dict:
    """Distributed corpus statistics for BM25 scoring: N, avgdl,
    floored idf per query term (absent terms score 0, matching
    functions/bm25.py's ``idf.get(q) or 0``)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    stats = (
        ds.map_batches(_stats_batch, batch_format="pandas")
        .groupby("word")
        .sum(["df", "dl", "n"])
        .materialize()  # vocabulary-sized aggregate, reused 3x below
    )
    sent = stats.map_batches(
        _make_word_mask_batch([_SENTINEL]), batch_format="pyarrow"
    ).take(1)[0]
    n, total_dl = int(sent["sum(n)"]), int(sent["sum(dl)"])
    avgdl = total_dl / n if n else 0.0

    def _idf_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.not_equal(t.column("word"), _SENTINEL)
        t = t.filter(mask)
        dfc = t.column("sum(df)").to_numpy(zero_copy_only=False).astype(float)
        raw = np.log(n - dfc + 0.5) - np.log(dfc + 0.5)
        return pa.table(
            {"idf_raw": pa.array(raw, pa.float64()),
             "one": pa.array(np.ones(len(raw), dtype=np.int64))}
        )

    agg = stats.map_batches(_idf_batch, batch_format="pyarrow")
    idf_sum = agg.sum("idf_raw")
    vocab = agg.sum("one")
    eps = EPSILON * (idf_sum / vocab) if vocab else 0.0

    qset = set(query_terms)
    qrows = stats.map_batches(
        _make_word_mask_batch(sorted(qset)), batch_format="pyarrow"
    ).take_all()
    idf_q: dict[str, float] = {}
    for r in qrows:
        raw = math.log(n - r["sum(df)"] + 0.5) - math.log(r["sum(df)"] + 0.5)
        idf_q[r["word"]] = eps if raw < 0 else raw
    return {"n": n, "avgdl": avgdl, "idf": idf_q}


def _make_score_batch(query_tokens: list[str], idf: dict, avgdl: float, topk):
    qset = sorted(set(query_tokens))

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        toks = _tokenize(df["text"]).reset_index(drop=True)
        dl = toks.str.len().to_numpy(dtype=float)
        ex = toks.explode().dropna()
        hit = ex[ex.isin(qset)]
        tf = pd.crosstab(hit.index, hit.values)
        tf = tf.reindex(index=range(len(df)), columns=qset, fill_value=0)
        tfm = tf.to_numpy(dtype=float)
        denom_dl = K1 * (1 - B + B * dl / avgdl) if avgdl else K1
        score = np.zeros(len(df))
        for q in query_tokens:  # query-token order, incl. duplicates
            f = tfm[:, qset.index(q)]
            score += idf.get(q, 0.0) * (f * (K1 + 1) / (f + denom_dl))
        out = pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(), "score": score}
        )
        if topk is not None:
            out = out.sort_values(
                ["score", "doc_id"], ascending=[False, True]
            ).head(topk)
        return out.reset_index(drop=True)

    return _score


def bm25_scores_dataset(sf_dir: str, query: str) -> rd.Dataset:
    """Score EVERY document against ``query`` (full-corpus result —
    the oracle-checkable surface; use :func:`bm25_topk` for the
    driver-bounded retrieval shape)."""
    terms = query.lower().split()
    st = corpus_bm25_stats(sf_dir, terms)
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(
        _make_score_batch(terms, st["idf"], st["avgdl"], None),
        batch_format="pandas",
    )


def bm25_topk(sf_dir: str, query: str, k: int = 10) -> pd.DataFrame:
    """Global BM25 top-k: per-batch partial top-k (the only rows that
    leave each task), final selection over O(batches x k) rows on the
    driver."""
    terms = query.lower().split()
    st = corpus_bm25_stats(sf_dir, terms)
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    parts = ds.map_batches(
        _make_score_batch(terms, st["idf"], st["avgdl"], k),
        batch_format="pandas",
    ).to_pandas()
    return (
        parts.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
