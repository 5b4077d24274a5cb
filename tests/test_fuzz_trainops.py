"""Property-based checks for the round-4 training-data operators'
pure kernels (no Ray session — the distributed paths are pinned by
tests/test_{collocations,dsir,bpe,packing,heavy}.py; these fuzz the
algebraic invariants the distributed layouts rely on)."""

import string

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crawl4ai_ray.functions.wstokens import tokens

WORDS = st.text(alphabet="abcxyz", min_size=1, max_size=4)
TEXTS = st.lists(
    st.lists(WORDS, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)

FUZZ = settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


class TestBpeFuzz:
    @given(texts=TEXTS, n=st.integers(1, 15))
    @FUZZ
    def test_type_weighted_equals_per_occurrence(self, texts, n):
        from test_bpe import counts_of, naive_bpe

        from crawl4ai_ray.pipelines.bpe import learn_bpe

        assert learn_bpe(counts_of(texts), n) == naive_bpe(texts, n)

    @given(texts=TEXTS, word=WORDS)
    @FUZZ
    def test_segment_concat_invariant(self, texts, word):
        from test_bpe import counts_of

        from crawl4ai_ray.pipelines.bpe import (
            EOW,
            _segment_word,
            learn_bpe,
        )

        merges = learn_bpe(counts_of(texts), 10)
        rank = {(l, r): i for i, (l, r, _) in enumerate(merges)}
        assert "".join(_segment_word(word, rank)) == word + EOW


class TestCollocationsFuzz:
    @given(texts=TEXTS, split=st.integers(0, 8))
    @FUZZ
    def test_partial_counts_fold_batch_invariant(self, texts, split):
        """Folding per-batch partial rows must give the same corpus
        stats for ANY batch split — the property the distributed
        count scan depends on."""
        from crawl4ai_ray.pipelines.collocations import _count_batch

        split = min(split, len(texts))
        parts = [texts[:split], texts[split:]]
        frames = [
            _count_batch(pd.DataFrame({"text": p})) for p in parts if p
        ]
        folded = (
            pd.concat(frames)
            .groupby(["kind", "w1", "w2"], as_index=False)["count"]
            .sum()
        )
        whole = (
            _count_batch(pd.DataFrame({"text": texts}))
            .groupby(["kind", "w1", "w2"], as_index=False)["count"]
            .sum()
        )
        pd.testing.assert_frame_equal(
            folded.sort_values(["kind", "w1", "w2"]).reset_index(drop=True),
            whole.sort_values(["kind", "w1", "w2"]).reset_index(drop=True),
        )


class TestDsirFuzz:
    @given(texts=TEXTS)
    @FUZZ
    def test_features_match_naive_and_never_cross_docs(self, texts):
        from crawl4ai_ray.pipelines.dsir import _doc_features

        fdocs, feats = _doc_features(pd.Series(texts))
        want = []
        for i, t in enumerate(texts):
            ws = [w for w in tokens(t.lower())]
            for w in ws:
                want.append((i, w))
            for a, b in zip(ws, ws[1:]):
                want.append((i, a + " " + b))
        got = sorted(zip(fdocs.tolist(), feats.tolist()))
        assert got == sorted(want)


class TestHeavyFuzz:
    @given(
        texts=TEXTS,
        k=st.integers(1, 10),
        cuts=st.lists(st.integers(0, 8), max_size=3),
    )
    @FUZZ
    def test_candidate_union_contains_all_heavy(self, texts, k, cuts):
        """Any global phi-heavy token must appear in >=1 per-batch
        summary for EVERY way of batching the corpus — the guarantee
        the two-pass layout rests on."""
        all_tokens = [w for t in texts for w in tokens(t.lower())]
        n = len(all_tokens)
        if n == 0:
            return
        bounds = sorted({0, n, *[min(c, n) for c in cuts]})
        candidates = set()
        for a, b in zip(bounds, bounds[1:]):
            batch = all_tokens[a:b]
            if not batch:
                continue
            uniq, cnt = np.unique(np.array(batch, dtype=str), return_counts=True)
            candidates.update(uniq[cnt > len(batch) / (k + 1)])
        uniq, cnt = np.unique(np.array(all_tokens, dtype=str), return_counts=True)
        heavy = set(uniq[cnt > n / (k + 1)])
        assert heavy <= candidates
