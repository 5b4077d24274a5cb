"""Crawl snapshot diff (pipelines/snapshot.py)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def diff_df(ray_session):
    from crawl4ai_ray.pipelines.snapshot import snapshot_diff

    return snapshot_diff(SF)


def test_all_classes_present(diff_df):
    # the %10 / %7 / %5 rules guarantee every non-trivial class occurs
    assert set(diff_df["status"]) == {"added", "removed", "changed"}
    assert diff_df["doc_id"].is_unique


def test_matches_full_outer_join_oracle(diff_df):
    from crawl4ai_ray.pipelines.oracles import ORACLES

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(ORACLES["snapshot_diff"]).df()
    pd.testing.assert_frame_equal(
        diff_df, want.astype(diff_df.dtypes.to_dict())
    )


def test_bucket_count_invariant(diff_df):
    from crawl4ai_ray.pipelines.snapshot import snapshot_diff

    pd.testing.assert_frame_equal(diff_df, snapshot_diff(SF, buckets=3))


def test_unchanged_never_leaves_fold(diff_df):
    # pages in both snapshots and not rewritten must be absent
    both_unchanged = [
        i
        for i in range(1, 200)
        if i % 10 != 0 and i % 7 != 0 and i % 5 != 0
    ]
    assert not diff_df["doc_id"].isin(both_unchanged).any()
