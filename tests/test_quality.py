"""Unit tests for the training-data quality operators (quality.py):
Gopher rules, C4 line filtering, corpus-wide line dedup. The sf0.01
oracle parity for all three runs in test_oracle_parity.py; these pin
edge-case semantics directly."""

import pandas as pd
import pytest

from crawl4ai_ray.pipelines.quality import (
    GOPHER_MIN_STOP_HITS,
    c4_line_stats_batch,
    gopher_quality_batch,
    line_dedup_counts,
)


def _gq(text):
    return gopher_quality_batch(pd.DataFrame({"doc_id": [0], "text": [text]})).iloc[0]


class TestGopher:
    def test_empty_text(self):
        r = _gq("")
        assert r.n_words == 0 and not r.gopher_pass
        assert r.mean_word_len == 0.0 and r.alpha_word_frac == 0.0

    def test_good_doc_passes(self):
        text = " ".join(
            ["the quick brown fox jumps over that lazy dog with style and be have of"] * 5
        )
        r = _gq(text)
        assert r.n_words == 75
        assert r.stop_hits >= GOPHER_MIN_STOP_HITS
        assert bool(r.gopher_pass)

    def test_symbol_ratio_fails(self):
        base = "the of and that be have with words " * 10  # 80 words, stops ok
        r = _gq(base + "# " * 30)  # 30 '#' symbols / 110 words > 0.1
        assert r.symbol_word_ratio > 0.1 and not r.gopher_pass

    def test_ellipsis_counts_non_overlapping(self):
        r = _gq("a....")  # one '...' (non-overlapping scan), line ends ...-ish
        assert r.symbol_word_ratio == 1.0  # 1 symbol / 1 word

    def test_bullet_lines(self):
        text = "- item one\n* item two\n  • indented\nplain line"
        r = _gq(text)
        assert r.bullet_line_frac == 3 / 4

    def test_stop_hits_distinct(self):
        r = _gq("the the the the")  # repeated stopword counts once
        assert r.stop_hits == 1 and not r.gopher_pass


class TestC4:
    def test_line_rules(self):
        text = "\n".join(
            [
                "This line has enough words to pass fine.",  # kept (8 words)
                "Too short line.",  # < 5 words
                "no terminal punctuation here so it is dropped",  # no punct
                "Enable javascript to view this content please.",  # javascript
                'He said "five words are here."',  # kept, quote terminal
            ]
        )
        out = c4_line_stats_batch(pd.DataFrame({"doc_id": [0], "text": [text]})).iloc[0]
        assert out.n_lines == 5
        assert out.n_kept_lines == 2
        assert out.n_kept_words == 8 + 6
        assert bool(out.c4_keep_doc)

    def test_page_drop_flags(self):
        for bad in ["some Lorem Ipsum filler.", "code { float: left }"]:
            out = c4_line_stats_batch(
                pd.DataFrame({"doc_id": [0], "text": [bad]})
            ).iloc[0]
            assert not out.c4_keep_doc


class TestLineDedup:
    @pytest.fixture(scope="class")
    def ds(self, ray_session):
        import ray.data as rd

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "alpha\nbeta\n\nalpha",  # dup of own line
                    "beta\ngamma",  # beta already in doc 1
                    "  alpha  \ndelta\t",  # edge-trimmed dup + tab edge
                ],
            }
        )
        return rd.from_pandas(docs)

    def test_first_occurrence_wins(self, ds):
        out = line_dedup_counts(ds, buckets=4, doc_buckets=2)
        by = out.set_index("doc_id")
        # doc 1: alpha(kept) beta(kept) alpha(removed)
        assert by.loc[1, "n_kept"] == 2 and by.loc[1, "n_removed"] == 1
        # doc 2: beta removed (doc 1 first), gamma kept
        assert by.loc[2, "n_kept"] == 1 and by.loc[2, "n_removed"] == 1
        # doc 3: '  alpha  ' trims to dup; 'delta\t' trims to new line
        assert by.loc[3, "n_kept"] == 1 and by.loc[3, "n_removed"] == 1

    def test_totals(self, ds):
        out = line_dedup_counts(ds, buckets=4, doc_buckets=2)
        assert int(out.n_kept.sum()) == 4  # alpha beta gamma delta
        assert int(out.n_removed.sum()) == 3


class TestGopherRepetition:
    def test_hand_computed(self):
        import pandas as pd

        from crawl4ai_ray.pipelines.quality import gopher_repetition_batch

        df = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    # 9 words, chars=9; top 2-gram "a b"x3 (tie with
                    # "b c" -> lexicographic min), 3*2/9
                    "a b c a b c a b c",
                    # lines: [x y, x y, x y, z] -> 2 dup of 4; chars
                    # 3+3+3+1=10, dup chars 6; paragraphs [x y\nx y, x y\nz]
                    "x y\nx y\n\nx y\nz",
                    # no repetition at n>=5, clean doc
                    "the cat sat on a mat and then the dog sat on it",
                ],
            }
        )
        out = gopher_repetition_batch(df)
        r1 = out[out.doc_id == 1].iloc[0]
        assert r1["top_2gram_char_frac"] == 3 * 2 / 9
        # coverage union keeps the dup 5-gram fraction bounded by 1
        assert 0.0 <= r1["dup_5gram_char_frac"] <= 1.0
        r2 = out[out.doc_id == 2].iloc[0]
        assert r2["dup_line_frac"] == 2 / 4
        assert r2["dup_line_char_frac"] == 6 / 10
        assert r2["dup_para_frac"] == 0.0
        r3 = out[out.doc_id == 3].iloc[0]
        assert r3["dup_5gram_char_frac"] == 0.0
        assert not r1["repetition_ok"] and not r2["repetition_ok"]

    def test_empty_and_short_docs(self):
        import pandas as pd

        from crawl4ai_ray.pipelines.quality import gopher_repetition_batch

        df = pd.DataFrame({"doc_id": [1, 2], "text": ["", "one two"]})
        out = gopher_repetition_batch(df)
        # empty doc: every metric zero, passes
        assert bool(out[out.doc_id == 1].iloc[0]["repetition_ok"])
        assert (out.filter(like="gram").iloc[0] == 0.0).all()
        r2 = out[out.doc_id == 2].iloc[0]
        # a 2-word doc IS its own top bigram (frac 1.0 -> fails, like
        # the paper's rule would on a degenerate doc); no 3-gram exists
        assert r2["top_2gram_char_frac"] == 1.0
        assert r2["top_3gram_char_frac"] == 0.0
        assert not r2["repetition_ok"]
