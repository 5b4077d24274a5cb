"""Unigram-LM perplexity (pipelines/lm.py) vs a serial reference.

Covers: OOV scoring for words outside the vocab head, the
(count desc, word asc) tie-break at the head boundary, zero-token
docs (ppl pinned 0.0), multi-batch partial-count merging, and the
smoothing denominator using FULL-corpus totals (V = all distinct
words, not just the head).
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawl4ai_ray.functions.wstokens import tokens

TEXTS = [
    "aa aa aa bb bb cc",
    "bb cc dd dd ee",
    "",  # zero tokens
    "ee ff gg hh ii jj",  # mostly outside a small head
    None,  # null text == zero tokens
    "aa bb cc dd ee ff gg hh ii jj kk ll",
    "tie1 tie2 tie3 tie4",  # all count 1: head boundary tie-break
]


def _serial(texts, alpha, vocab_size):
    docs = [[t.lower() for t in tokens(x or "")] for x in texts]
    counts = Counter(w for d in docs for w in d)
    t, v = sum(counts.values()), len(counts)
    denom = t + alpha * (v + 1)
    head = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    logp = {w: math.log((c + alpha) / denom) for w, c in head}
    lo = math.log(alpha / denom)
    rows = []
    for i, d in enumerate(docs):
        s = sum(logp.get(w, lo) for w in d)
        rows.append((i, len(d), s, math.exp(-s / len(d)) if d else 0.0))
    return rows


@pytest.fixture(scope="module")
def tiny_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("lm")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                "text": pa.array(TEXTS, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
        row_group_size=2,  # force multi-batch count merging
    )
    return str(d)


@pytest.mark.parametrize("vocab_size", [3, 6, 100])
def test_matches_serial(tiny_dir, vocab_size):
    from crawl4ai_ray.pipelines.lm import perplexity_dataset

    got = (
        perplexity_dataset(tiny_dir, alpha=0.5, vocab_size=vocab_size)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _serial(TEXTS, 0.5, vocab_size)
    assert got["doc_id"].tolist() == [r[0] for r in exp]
    assert got["n_tokens"].tolist() == [r[1] for r in exp]
    np.testing.assert_allclose(
        got["logprob_sum"], [r[2] for r in exp], rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        got["ppl"], [r[3] for r in exp], rtol=1e-12, atol=1e-12
    )


def test_head_is_bounded_and_denominator_is_global(tiny_dir):
    from crawl4ai_ray.pipelines.lm import train_unigram_lm

    lm = train_unigram_lm(tiny_dir, alpha=0.5, vocab_size=3)
    assert len(lm["logp"]) == 3
    # full-vocabulary V in the denominator, not the head size
    all_words = {w.lower() for x in TEXTS for w in tokens(x or "")}
    assert lm["v"] == len(all_words)
    # head = top-3 by (count desc, word asc)
    counts = Counter(w.lower() for x in TEXTS for w in tokens(x or ""))
    want = [w for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]]
    assert sorted(lm["logp"]) == sorted(want)
    # OOV logprob is the zero-count smoothed mass, below every head entry
    assert all(lm["logp_oov"] < lp for lp in lm["logp"].values())
