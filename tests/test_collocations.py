"""Bigram PMI collocation mining (pipelines/collocations.py).

Value-checks the distributed pipeline against a naive pure-Python
PMI computation on a tiny corpus, pins doc-boundary handling,
min_count support filtering, bucket-count invariance, and the
NUL-byte-sentinel groupby regression (Ray's sort-based groupby does
not merge string keys containing NUL bytes).
"""

import math
import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawl4ai_ray.functions.wstokens import tokens


def naive_pmi(texts, min_count):
    """Reference implementation: corpus-wide counts, ln-PMI."""
    uni, big = {}, {}
    T = B = 0
    for t in texts:
        w = [x.lower() for x in tokens(t)]
        T += len(w)
        for x in w:
            uni[x] = uni.get(x, 0) + 1
        for a, b in zip(w, w[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            B += 1
    rows = []
    for (a, b), c12 in big.items():
        if c12 < min_count:
            continue
        pmi = (
            math.log(c12) - math.log(B)
            + 2 * math.log(T) - math.log(uni[a]) - math.log(uni[b])
        )
        rows.append({"w1": a, "w2": b, "pair_count": c12, "pmi": pmi})
    return (
        pd.DataFrame(rows, columns=["w1", "w2", "pair_count", "pmi"])
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox sleeps",          # repeats quick->brown, brown->fox
    "lazy dog the quick\tbrown cat",        # tab whitespace; quick->brown again
    "fox the",                              # no cross-doc bigram fox->the x2
    "",                                     # empty doc contributes nothing
    "solo",                                 # 1-token doc: no bigrams
]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("colloc")
    pd.DataFrame(
        {"doc_id": range(len(TEXTS)), "text": TEXTS}
    ).to_parquet(d / "documents.parquet")
    return str(d)


def run(corpus_dir, **kw):
    from crawl4ai_ray.pipelines.collocations import collocations_dataset

    return (
        collocations_dataset(corpus_dir, **kw)
        .to_pandas()
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )


class TestCollocations:
    def test_matches_naive(self, ray_session, corpus_dir):
        got = run(corpus_dir, min_count=2)
        want = naive_pmi(TEXTS, min_count=2)
        assert len(got) == len(want) > 0
        pd.testing.assert_frame_equal(
            got.astype({"pair_count": "int64"}), want, check_exact=False, atol=1e-12
        )

    def test_min_count_one_keeps_all_bigrams(self, ray_session, corpus_dir):
        got = run(corpus_dir, min_count=1)
        want = naive_pmi(TEXTS, min_count=1)
        assert len(got) == len(want)
        pd.testing.assert_frame_equal(
            got.astype({"pair_count": "int64"}), want, check_exact=False, atol=1e-12
        )

    def test_bucket_count_invariance(self, ray_session, corpus_dir):
        a = run(corpus_dir, min_count=2, buckets=1)
        b = run(corpus_dir, min_count=2, buckets=7)
        pd.testing.assert_frame_equal(a, b)

    def test_no_cross_doc_bigrams(self, ray_session, corpus_dir):
        # 'sleeps' ends doc 1 and 'lazy' starts doc 2; the pair must
        # not exist even at min_count=1.
        got = run(corpus_dir, min_count=1)
        assert not ((got.w1 == "sleeps") & (got.w2 == "lazy")).any()
        assert not ((got.w1 == "cat") & (got.w2 == "fox")).any()

    def test_sentinel_totals_collapse(self, ray_session, corpus_dir):
        """Regression: per-batch sentinel total rows must fold to ONE
        row each under Ray's groupby (NUL-prefixed sentinel keys did
        not merge — ray 2.49 sort-based groupby)."""
        import ray.data as rd

        from crawl4ai_ray.pipelines.collocations import (
            _SENT_B,
            _SENT_T,
            _count_batch,
        )

        stats = (
            rd.read_parquet(
                os.path.join(corpus_dir, "documents.parquet"), columns=["text"]
            )
            .map_batches(_count_batch, batch_format="pandas", batch_size=2)
            .groupby(["kind", "w1", "w2"])
            .sum("count")
        )
        sent = [r for r in stats.take_all() if r["kind"] == "s"]
        assert len(sent) == 2, f"sentinels did not collapse: {sent}"
        totals = {r["w1"]: r["sum(count)"] for r in sent}
        n_tok = sum(len(tokens(t)) for t in TEXTS)
        n_big = sum(max(len(tokens(t)) - 1, 0) for t in TEXTS)
        assert totals[_SENT_T] == n_tok
        assert totals[_SENT_B] == n_big

    def test_topk_ordering(self, ray_session, corpus_dir):
        from crawl4ai_ray.pipelines.collocations import collocations_topk

        top = collocations_topk(corpus_dir, k=3, min_count=1)
        assert len(top) == 3
        assert list(top.pmi) == sorted(top.pmi, reverse=True)
