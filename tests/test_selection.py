"""Distributed selection operators (pipelines/selection.py): exact
quantiles by threshold-count narrowing, exact-k uniform md5 sample."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_duckdb_rank_rule_pin():
    """quantile_disc rank = max(1, ceil(q*N)): the q=0.51/n=4 probe
    separates ceil(q*n) (rank 3) from floor(1+q*(n-1)) (rank 2).
    selection.exact_quantiles assumes this rule."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES (10.0),(20.0),(30.0),(40.0)) v(x)")
    assert con.execute("SELECT quantile_disc(x, 0.51) FROM t").fetchone()[0] == 30.0
    assert con.execute("SELECT quantile_disc(x, 0.25) FROM t").fetchone()[0] == 10.0
    assert con.execute("SELECT quantile_disc(x, 1.0) FROM t").fetchone()[0] == 40.0


@pytest.fixture(scope="module")
def sel_dir(ray_session, tmp_path_factory):
    rng = np.random.RandomState(7)
    # lognormal body + an 80%-mass duplicate spike (the worst case for
    # threshold narrowing: equal keys cannot be split by probes) +
    # negatives and exact-boundary repeats
    vals = np.concatenate(
        [
            rng.lognormal(3.0, 1.5, 400).round(2),
            np.full(1600, 42.5),
            -rng.lognormal(1.0, 1.0, 100).round(2),
        ]
    )
    d = tmp_path_factory.mktemp("selection")
    pd.DataFrame(
        {
            "event_id": np.arange(len(vals)),
            "event_type": np.where(
                np.arange(len(vals)) % 3 == 0,
                "click",
                np.where(np.arange(len(vals)) % 3 == 1, "view", "buy"),
            ),
            "value": vals,
        }
    ).to_parquet(d / "events.parquet", row_group_size=200)
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(500, dtype="int64"),
            "lang": np.where(np.arange(500) % 3 == 0, "en", "fi"),
        }
    )
    docs.to_parquet(d / "documents.parquet", row_group_size=100)
    return str(d)


def _want_quantiles(con_path, qs):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{con_path}/events.parquet')"
    )
    sql = " UNION ALL ".join(
        f"SELECT {q} AS q, quantile_disc(value, {q}) AS value FROM events" for q in qs
    )
    return con.execute(sql + " ORDER BY q").df()


def test_exact_quantiles_matches_duckdb(sel_dir):
    from crawl4ai_ray.pipelines.selection import DEFAULT_QS, exact_quantiles

    got = exact_quantiles(sel_dir)
    want = _want_quantiles(sel_dir, DEFAULT_QS)
    pd.testing.assert_frame_equal(got, want)


def test_exact_quantiles_forced_refinement(sel_dir):
    """Tiny probe fan + pull_cap forces several narrowing rounds AND
    the duplicate-mass pull path (the 42.5 spike exceeds any cap)."""
    from crawl4ai_ray.pipelines.selection import DEFAULT_QS, exact_quantiles

    got = exact_quantiles(sel_dir, n_probes=2, pull_cap=20, max_iters=12)
    want = _want_quantiles(sel_dir, DEFAULT_QS)
    pd.testing.assert_frame_equal(got, want)


def test_exact_quantiles_extremes(sel_dir):
    """q near 0/1 resolves to the column min/max; ranks stay exact."""
    from crawl4ai_ray.pipelines.selection import exact_quantiles

    got = exact_quantiles(sel_dir, qs=(0.0009765625, 0.5, 0.9990234375))
    want = _want_quantiles(sel_dir, (0.0009765625, 0.5, 0.9990234375))
    pd.testing.assert_frame_equal(got, want)


def _want_grouped(con_path, qs):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{con_path}/events.parquet')"
    )
    sql = " UNION ALL ".join(
        f"SELECT event_type, {q} AS q, quantile_disc(value, {q}) AS value "
        "FROM events GROUP BY event_type"
        for q in qs
    )
    return (
        con.execute(f"SELECT * FROM ({sql}) ORDER BY event_type, q")
        .df()
        .reset_index(drop=True)
    )


def test_grouped_quantiles_matches_duckdb(sel_dir):
    from crawl4ai_ray.pipelines.selection import grouped_quantiles

    got = grouped_quantiles(sel_dir)
    want = _want_grouped(sel_dir, (0.5, 0.9375))
    pd.testing.assert_frame_equal(got, want)


def test_grouped_quantiles_forced_refinement(sel_dir):
    from crawl4ai_ray.pipelines.selection import grouped_quantiles

    got = grouped_quantiles(sel_dir, n_probes=2, pull_cap=10, max_iters=12)
    want = _want_grouped(sel_dir, (0.5, 0.9375))
    pd.testing.assert_frame_equal(got, want)


def test_uniform_sample_exact_and_deterministic(sel_dir):
    from crawl4ai_ray.pipelines.selection import uniform_sample_k

    got = uniform_sample_k(sel_dir, k=37)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sel_dir}/documents.parquet')"
    )
    want = (
        con.execute(
            """
        SELECT doc_id, lang FROM (
          SELECT doc_id, lang,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT AS draw
          FROM documents) ORDER BY draw, doc_id LIMIT 37
        """
        )
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # deterministic across runs (pure key function of the row)
    pd.testing.assert_frame_equal(got, uniform_sample_k(sel_dir, k=37))


def test_uniform_sample_k_larger_than_n(sel_dir):
    from crawl4ai_ray.pipelines.selection import uniform_sample_k

    got = uniform_sample_k(sel_dir, k=10_000)
    assert len(got) == 500  # whole table, no duplicates
    assert got["doc_id"].is_unique
