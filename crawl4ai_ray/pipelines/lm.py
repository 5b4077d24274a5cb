"""CCNet-style corpus-trained unigram LM perplexity scoring.

The CCNet curation pipeline (Wenzek et al. 2020) buckets web
documents by the perplexity of a language model over their text —
the canonical "does this read like real language" quality signal a
100-TB training-data pipeline runs after Gopher/C4 rule filters
(pipelines/quality.py). Real CCNet scores against a fixed external
KenLM; that model file isn't in this container, so this operator
implements the same shape with a self-trained additive-smoothing
unigram LM — which also exercises the harder distributed problem
(the TRAINING scan), and keeps every number SQL-derivable so the
driver can value-check the full chain.

Scale shape (mirrors pipelines/search.py's BM25 two-scan design):

1. **Count scan** — ``map_batches`` emits per-batch PARTIAL
   ``(word, count)`` rows plus a sentinel row carrying the batch's
   total token count; one vocabulary-sized ``groupby("word").sum()``
   folds them (the shuffle moves one row per distinct word per
   batch, never per token). Vocab size ``V`` comes from dataset
   aggregates on the folded stats — the full vocabulary never
   reaches the driver.
2. **Model head** — the LM the scorer broadcasts is BOUNDED: the
   global top-``vocab_size`` words by ``(count desc, word asc)``.
   Web-scale corpora have unbounded vocabularies (every typo is a
   word); shipping the whole count table to every scorer would be a
   multi-GB broadcast, so — exactly like a real tokenizer's fixed
   vocab — everything outside the head scores as one OOV class.
   The head selection is a vocabulary-sized ``sort().limit()``, and
   smoothing uses the FULL-corpus totals so head probabilities are
   true corpus probabilities, not renormalized ones.
3. **Scoring scan** — with the ``{word: logp}`` head broadcast in
   the batch-fn closure, each batch tokenizes, maps tokens through
   the table (vectorized ``pd.Series.map``), fills OOV with the
   smoothed zero-count logprob, and emits per-doc
   ``(n_tokens, logprob_sum, ppl)`` — constant-width output rows,
   never token-level data.

Additive smoothing: ``p(w) = (c_w + alpha) / (T + alpha * (V + 1))``
with ``V`` = distinct trained words and one extra slot for the OOV
class; ``ppl(doc) = exp(-sum(logp) / n_tokens)`` (docs with zero
tokens get ppl = NULL). All arithmetic is float64 and mirrored
term-for-term in the SQL oracle (pipelines/oracles.py).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

import ray.data as rd

from ..functions.wstokens import WS_TOKEN_RE

_SENTINEL = ""  # a whitespace token can never be empty
ALPHA = 0.5  # additive-smoothing mass (Jeffreys prior)
VOCAB_SIZE = 4096  # broadcast head size; beyond it words are OOV


def _tokenize(texts: pd.Series) -> pd.Series:
    """Lowercase + RE2-``\\s``-class tokens (wstokens contract) —
    oracle-exact on all inputs, unlike ``str.split()``."""
    return texts.fillna("").str.lower().str.findall(WS_TOKEN_RE)


def _count_batch(df: pd.DataFrame) -> pd.DataFrame:
    toks = _tokenize(df["text"])
    ex = toks.explode().dropna()
    counts = ex.groupby(ex.values, sort=False).size()
    return pd.DataFrame(
        {
            "word": list(counts.index) + [_SENTINEL],
            "count": list(counts.values) + [int(ex.size)],
        }
    ).astype({"word": str, "count": "int64"})


def _sentinel_batch(t):
    """Vectorized sentinel-row extraction (pyarrow equality mask, not
    a per-row ``Dataset.filter(fn)`` over the whole vocabulary)."""
    import pyarrow.compute as pc

    return t.filter(pc.equal(t.column("word"), _SENTINEL))


def _make_head_topk_batch(vocab_size: int):
    """Per-block partial top-``vocab_size`` by (count desc, word asc),
    sentinel excluded. The global top-K is a subset of the union of
    per-block top-Ks, so the downstream sort+limit stays exact."""

    def _topk(t):
        import pyarrow.compute as pc

        t = t.filter(pc.not_equal(t.column("word"), _SENTINEL))
        if t.num_rows > vocab_size:
            idx = pc.sort_indices(
                t,
                sort_keys=[("sum(count)", "descending"), ("word", "ascending")],
            )
            t = t.take(idx.slice(0, vocab_size))
        return t

    return _topk


def train_unigram_lm(
    sf_dir: str,
    alpha: float = ALPHA,
    vocab_size: int = VOCAB_SIZE,
) -> dict:
    """Distributed LM training: returns the bounded broadcastable
    model ``{"logp": {word: logp}, "logp_oov": float, "t": int,
    "v": int}``."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    stats = (
        ds.map_batches(_count_batch, batch_format="pandas")
        .groupby("word")
        .sum("count")
        .materialize()  # vocabulary-sized; reused for V, T, and the head
    )
    # T (total tokens) rides the sentinel row; V excludes it.
    v = stats.count() - 1
    t = int(
        stats.map_batches(_sentinel_batch, batch_format="pyarrow")
        .take(1)[0]["sum(count)"]
    )
    # Head selection is partial top-K: each vocabulary-stats block
    # emits at most vocab_size (count desc, word asc) rows via a
    # pyarrow sort kernel, so the final global sort runs over
    # O(blocks x vocab_size) rows — never the full vocabulary, which
    # at 100 TB is billions of types (pattern: selection.py /
    # similarity.py partial top-k).
    head = (
        stats.map_batches(
            _make_head_topk_batch(vocab_size), batch_format="pyarrow"
        )
        .sort(["sum(count)", "word"], descending=[True, False])
        .limit(vocab_size)
        .to_pandas()
    )
    denom = t + alpha * (v + 1)
    logp = dict(
        zip(
            head["word"],
            np.log((head["sum(count)"].to_numpy(dtype=float) + alpha) / denom),
        )
    )
    return {
        "logp": logp,
        "logp_oov": math.log(alpha / denom),
        "t": t,
        "v": int(v),
    }


def _make_ppl_batch(logp: dict, logp_oov: float):
    def _score(df: pd.DataFrame) -> pd.DataFrame:
        toks = _tokenize(df["text"]).reset_index(drop=True)
        n = toks.str.len().to_numpy(dtype="int64")
        ex = toks.explode().dropna()
        lp = ex.map(logp).fillna(logp_oov)
        sums = lp.groupby(level=0).sum().reindex(range(len(df)), fill_value=0.0)
        s = sums.to_numpy(dtype=float)
        # zero-token docs: ppl is undefined; pin 0.0 (never a valid
        # perplexity, which is >= 1) so the column carries no nulls.
        ppl = np.where(n > 0, np.exp(-s / np.where(n > 0, n, 1)), 0.0)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_tokens": n,
                "logprob_sum": s,
                "ppl": ppl,
            }
        )

    return _score


def perplexity_dataset(
    sf_dir: str,
    alpha: float = ALPHA,
    vocab_size: int = VOCAB_SIZE,
) -> rd.Dataset:
    """Per-document unigram perplexity over the documents table."""
    lm = train_unigram_lm(sf_dir, alpha=alpha, vocab_size=vocab_size)
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(
        _make_ppl_batch(lm["logp"], lm["logp_oov"]), batch_format="pandas"
    )
