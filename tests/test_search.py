"""Corpus-level BM25 search (pipelines/search.py).

Pins the distributed two-scan implementation to the repo's serial
rank_bm25-parity kernel (functions/bm25.py, itself differential-pinned
to the reference's async_url_seeder BM25 chain) on corpora that
exercise every arithmetic branch: rare terms (positive IDF), common
terms (negative IDF floored to eps*average_idf — a NEGATIVE floor
when the whole vocabulary is common, exactly rank_bm25's behavior),
absent terms (score 0), empty docs, and adversarial whitespace
(NBSP / vertical tab stay inside tokens per the wstokens contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawl4ai_ray.functions.bm25 import bm25_okapi_scores
from crawl4ai_ray.functions.wstokens import tokens

SF = "/root/testdata/sf0.001"

TEXTS = [
    "the fast cat sat on the mat",
    "a dup dup dup line of dup tokens",
    "",  # empty doc: dl=0, every tf=0
    "common common common words words",
    "nbsp joined stays one token",
    "vertical\x0btab also one token",
    "the the the the the the the the",
    "rareword appears exactly once in the corpus",
    None,  # null text == empty doc
    "fast fast scan scan a a dup",
]


def _serial_scores(texts, query):
    toks = [[t.lower() for t in tokens(x or "")] for x in texts]
    return bm25_okapi_scores(query.lower().split(), toks)


@pytest.fixture(scope="module")
def tiny_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("bm25")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                "text": pa.array(TEXTS, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
        row_group_size=3,  # force multi-batch partial-stats merging
    )
    return str(d)


QUERIES = [
    "dup",  # rare -> positive idf
    "the common",  # common -> negative idf, floored
    "zzz missing",  # absent -> all-zero scores
    "fast dup the zzz",  # all three paths at once
    "dup dup fast",  # duplicate query tokens accumulate (rank_bm25)
    "nbsp joined",  # NBSP is NOT whitespace: one 2-word token
]


@pytest.mark.parametrize("query", QUERIES)
def test_distributed_matches_serial_kernel(tiny_dir, query):
    from crawl4ai_ray.pipelines.search import bm25_scores_dataset

    got = (
        bm25_scores_dataset(tiny_dir, query)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _serial_scores(TEXTS, query)
    assert got["doc_id"].tolist() == list(range(len(TEXTS)))
    np.testing.assert_allclose(got["score"].to_numpy(), exp, rtol=1e-12, atol=1e-12)


def test_topk_is_head_of_full_ranking(tiny_dir):
    from crawl4ai_ray.pipelines.search import bm25_scores_dataset, bm25_topk

    full = (
        bm25_scores_dataset(tiny_dir, "dup fast the")
        .to_pandas()
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    for k in (1, 3, len(TEXTS), len(TEXTS) + 5):
        top = bm25_topk(tiny_dir, "dup fast the", k=k)
        want = full.head(k).reset_index(drop=True)
        pd.testing.assert_frame_equal(top, want)


def test_sf_corpus_matches_serial_kernel(ray_session):
    """Whole sf0.001 documents table vs the serial kernel — the same
    surface the driver oracle checks, pinned here against the Python
    reference-parity implementation instead of SQL."""
    from crawl4ai_ray.pipelines.search import bm25_scores_dataset

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = t.column("text").to_pylist()
    q = "fast scan a dup zzz"
    got = (
        bm25_scores_dataset(SF, q)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    order = np.argsort(t.column("doc_id").to_numpy())
    exp = np.asarray(_serial_scores(texts, q))[order]
    np.testing.assert_allclose(got["score"].to_numpy(), exp, rtol=1e-12, atol=1e-12)
    # all three idf regimes must be present on this corpus
    s = got["score"].to_numpy()
    assert (s > 0).any() and (s < 0).any()
