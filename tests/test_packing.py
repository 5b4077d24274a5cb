"""Sequence packing / distributed ordered prefix sum
(pipelines/packing.py)."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawl4ai_ray.functions.wstokens import tokens


TEXTS = [
    "a b c d e",            # 5 tokens
    "",                      # empty doc occupies no tokens
    "one two three",         # 3
    "x " * 13,               # 13 -> crosses a 10-token boundary
    "tail",                  # 1
    None,                    # null text == empty
    "p q r s t u v w",       # 8
]


def naive_pack(texts, seq_len):
    nts = [len(tokens((t or "").lower())) for t in texts]
    off, rows = 0, []
    for i, nt in enumerate(nts):
        first = off // seq_len if nt else -1
        last = (off + nt - 1) // seq_len if nt else -1
        rows.append(
            {
                "doc_id": i,
                "n_tokens": nt,
                "tok_offset": off,
                "first_seq": first,
                "last_seq": last,
                "n_seqs": (last - first + 1) if nt else 0,
            }
        )
        off += nt
    return pd.DataFrame(rows).astype("int64")


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pack")
    pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS}).to_parquet(
        d / "documents.parquet"
    )
    return str(d)


def run(corpus_dir, **kw):
    from crawl4ai_ray.pipelines.packing import pack_sequences

    return (
        pack_sequences(corpus_dir, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )


class TestPacking:
    def test_matches_naive(self, ray_session, corpus_dir):
        got = run(corpus_dir, seq_len=10)
        pd.testing.assert_frame_equal(got, naive_pack(TEXTS, 10))

    def test_multi_range_prefix_sum(self, ray_session, corpus_dir):
        # range_size smaller than the corpus forces the hierarchical
        # path: per-range partials + driver offsets + intra-range scan
        got = run(corpus_dir, seq_len=10, range_size=3)
        pd.testing.assert_frame_equal(got, naive_pack(TEXTS, 10))

    def test_range_size_invariance(self, ray_session, corpus_dir):
        a = run(corpus_dir, seq_len=7, range_size=2)
        b = run(corpus_dir, seq_len=7, range_size=4096)
        pd.testing.assert_frame_equal(a, b)

    def test_offsets_are_exclusive_prefix_sums(self, ray_session, corpus_dir):
        got = run(corpus_dir, seq_len=10)
        assert got["tok_offset"].iloc[0] == 0
        recon = np.concatenate([[0], np.cumsum(got["n_tokens"])[:-1]])
        assert (got["tok_offset"].to_numpy() == recon).all()


class TestShuffleManifest:
    def test_permutation_and_determinism(self, ray_session, corpus_dir):
        from crawl4ai_ray.pipelines.shuffle import shuffle_manifest

        a = (
            shuffle_manifest(corpus_dir, n_shards=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            shuffle_manifest(corpus_dir, n_shards=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)  # pure key function
        assert sorted(a["doc_id"]) == list(range(7))
        assert a["shard"].between(0, 3).all()
        # positions within each shard are 0..len-1 (a true manifest)
        for s, g in a.groupby("shard"):
            assert sorted(g["pos"]) == list(range(len(g)))
