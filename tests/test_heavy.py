"""Exact two-pass heavy hitters (pipelines/heavy.py)."""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    # 'hot' is globally heavy but spread thin across docs — the case
    # a naive per-batch top-k (without the n/(k+1) bound) can drop;
    # each filler word is locally concentrated but globally light.
    texts = []
    for i in range(40):
        texts.append(("hot " * 3 + f"filler{i} " * 5).strip())
    d = tmp_path_factory.mktemp("heavy")
    pd.DataFrame({"doc_id": range(len(texts)), "text": texts}).to_parquet(
        d / "documents.parquet"
    )
    return str(d)


def naive(texts, k):
    from crawl4ai_ray.functions.wstokens import tokens

    cnt = {}
    n = 0
    for t in texts:
        for w in tokens(t.lower()):
            cnt[w] = cnt.get(w, 0) + 1
            n += 1
    rows = [(w, c) for w, c in cnt.items() if c > n / (k + 1)]
    return (
        pd.DataFrame(rows, columns=["word", "count"])
        .astype({"count": "int64"})
        .sort_values(["count", "word"], ascending=[False, True])
        .reset_index(drop=True)
    )


class TestHeavyHitters:
    def test_spread_thin_heavy_hitter_survives(self, ray_session, skew_dir):
        from crawl4ai_ray.pipelines.heavy import heavy_hitters

        # small batches force many summaries; k=7 -> threshold n/8
        got = heavy_hitters(skew_dir, k=7)
        texts = pd.read_parquet(skew_dir + "/documents.parquet")["text"]
        want = naive(list(texts), k=7)
        pd.testing.assert_frame_equal(got, want)
        assert "hot" in set(got["word"])  # 120/320 = 37.5% > 1/8

    def test_sf0001_matches_duckdb(self, ray_session):
        import duckdb

        from crawl4ai_ray.pipelines.heavy import heavy_hitters

        got = heavy_hitters("/root/testdata/sf0.001", k=50)
        want = duckdb.connect().execute(
            """
            WITH w AS (
              SELECT unnest(list_filter(
                regexp_split_to_array(lower(coalesce(text,'')), '\\s+'),
                x -> x <> '')) AS word
              FROM read_parquet('/root/testdata/sf0.001/documents.parquet'))
            SELECT word, count(*)::BIGINT AS count FROM w GROUP BY word
            HAVING count(*) > (SELECT count(*) FROM w) / 51.0
            ORDER BY count DESC, word
            """
        ).fetchdf()
        pd.testing.assert_frame_equal(got, want.astype({"count": "int64"}))
