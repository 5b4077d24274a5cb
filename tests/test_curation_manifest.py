"""End-to-end curation manifest (pipelines/curation.py)."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


GOOD = (
    "the quick brown fox jumps over the lazy dog and then walks back "
    "to the river where many other animals have gathered with great "
    "interest because the water level is low and food is plentiful "
    "for those that arrive early in the morning hours every day now "
    "while several curious birds watch quietly from nearby branches"
)  # 55 words, passes gopher (length, stopwords, alpha)
BAD_SHORT = "too short to pass"
BAD_BRACE = GOOD + " {json}"  # C4 page rule: '{' drops the doc


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    texts = [
        GOOD,                 # 0: kept (keeper of the dup group)
        BAD_SHORT,            # 1: quality-dropped
        GOOD,                 # 2: duplicate of 0 -> dropped
        GOOD + " extra",      # 3: kept (distinct text)
        BAD_BRACE,            # 4: C4-dropped (even though dup-unique)
        GOOD,                 # 5: duplicate of 0 -> dropped
    ]
    d = tmp_path_factory.mktemp("cur")
    pd.DataFrame({"doc_id": range(len(texts)), "text": texts}).to_parquet(
        d / "documents.parquet"
    )
    return str(d)


class TestCurationManifest:
    @pytest.fixture(scope="class")
    def out(self, ray_session, corpus_dir):
        from crawl4ai_ray.pipelines.curation import curation_manifest

        return (
            curation_manifest(corpus_dir, seq_len=10)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def test_keep_flags(self, out):
        assert list(out["keep"]) == [1, 0, 0, 1, 0, 0]

    def test_offsets_contiguous_over_kept(self, out):
        kept = out[out.keep == 1]
        assert kept["tok_offset"].iloc[0] == 0
        assert (
            kept["tok_offset"].iloc[1]
            == kept["n_tokens" if "n_tokens" in kept else "n_words"].iloc[0]
        )
        drop = out[out.keep == 0]
        assert (drop[["tok_offset", "first_seq", "last_seq"]] == -1).all().all()

    def test_seq_spans(self, out):
        kept = out[out.keep == 1].reset_index(drop=True)
        nw = kept["n_words"].to_numpy()
        off = kept["tok_offset"].to_numpy()
        assert (kept["first_seq"].to_numpy() == off // 10).all()
        assert (kept["last_seq"].to_numpy() == (off + nw - 1) // 10).all()

    def test_range_size_invariance(self, ray_session, corpus_dir):
        from crawl4ai_ray.pipelines.curation import curation_manifest

        a = (
            curation_manifest(corpus_dir, seq_len=10, range_size=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            curation_manifest(corpus_dir, seq_len=10, range_size=4096)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
