"""Hopping-window aggregate (pipelines/windows.py) and bucketed range
join (pipelines/relational.py) — brute-twin equality + boundary pins."""

import numpy as np
import pandas as pd
import pytest

from conftest import SF_SMALL

from crawl4ai_ray.pipelines.relational import range_join_order_bursts
from crawl4ai_ray.pipelines.windows import hopping_window_agg


def _brute_hopping(df: pd.DataFrame, size_min: int, hop_min: int) -> pd.DataFrame:
    k = size_min // hop_min
    hop_us = hop_min * 60_000_000
    ts_us = df["ts"].astype("int64").to_numpy()
    rows = []
    for i in range(len(df)):
        base = (ts_us[i] // hop_us) * hop_us
        for j in range(k):
            rows.append((base - j * hop_us, df["event_type"].iloc[i], df["value"].iloc[i]))
    b = pd.DataFrame(rows, columns=["w", "event_type", "value"])
    g = b.groupby(["w", "event_type"], as_index=False).agg(
        n_events=("value", "count"), sum_value=("value", "sum")
    )
    g["window_start"] = pd.to_datetime(g.pop("w"), unit="us")
    g["sum_value"] = g["sum_value"].round(6)
    return (
        g[["window_start", "event_type", "n_events", "sum_value"]]
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )


def test_hopping_vs_brute(ray_session):
    got = hopping_window_agg(SF_SMALL, size_minutes=120, hop_minutes=30)
    events = pd.read_parquet(SF_SMALL + "/events.parquet", columns=["ts", "event_type", "value"])
    want = _brute_hopping(events, 120, 30)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hopping_counts_are_k_times_events(ray_session):
    got = hopping_window_agg(SF_SMALL, size_minutes=120, hop_minutes=30)
    events = pd.read_parquet(SF_SMALL + "/events.parquet", columns=["value"])
    assert got["n_events"].sum() == 4 * len(events)


def test_hopping_requires_multiple():
    with pytest.raises(AssertionError):
        hopping_window_agg(SF_SMALL, size_minutes=100, hop_minutes=30)


def _brute_range(orders: pd.DataFrame, days: int) -> pd.DataFrame:
    w = pd.Timedelta(days=days)
    rows = []
    d = orders["o_orderdate"]
    for i in range(len(orders)):
        m = (d > d.iloc[i]) & (d <= d.iloc[i] + w)
        rows.append(
            (
                int(orders["o_orderkey"].iloc[i]),
                int(m.sum()),
                round(float(orders.loc[m, "o_totalprice"].sum()), 4),
            )
        )
    return (
        pd.DataFrame(rows, columns=["o_orderkey", "n_follow", "sum_follow_price"])
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )


def test_range_join_vs_brute(ray_session):
    got = range_join_order_bursts(SF_SMALL, days=7)
    orders = pd.read_parquet(
        SF_SMALL + "/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    )
    want = _brute_range(orders, 7)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_follow"] > 0).any()  # band is non-trivial


def test_range_join_bucket_boundary(ray_session, tmp_path):
    # dates exactly on bucket edges: d2 = d1 + 7d must be EXCLUDED from
    # d1's strictly-after window's right-open complement — i.e. d2 is
    # included (<= d1+7d) while d1 itself never self-matches.
    base = pd.Timestamp("1995-01-01")
    df = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_orderdate": [
                base,
                base + pd.Timedelta(days=7),       # on the edge: included for 1
                base + pd.Timedelta(days=7, seconds=1),  # beyond: excluded for 1
                base,                                # same date as 1: excluded (strict >)
            ],
            "o_totalprice": [10.0, 20.0, 30.0, 40.0],
        }
    )
    p = tmp_path / "orders.parquet"
    df.to_parquet(p)
    got = range_join_order_bursts(str(tmp_path), days=7)
    want = _brute_range(df, 7)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    byk = got.set_index("o_orderkey")
    # order 2 at exactly +7d is included; order 3 one second past is
    # excluded; order 4 shares order 1's date so neither self-matches
    assert byk.loc[1, "n_follow"] == 1
    assert byk.loc[4, "n_follow"] == 1
    assert byk.loc[2, "n_follow"] == 1  # order 3 is 1s after order 2


def test_queries_registered_in_window():
    from crawl4ai_ray.pipelines.queries import QUERIES
    from crawl4ai_ray.pipelines.oracles import ORACLES

    keys = list(QUERIES)
    # hopping_window went driver-green in round 4 and rotated to the
    # tail in round 5 to make window room for new operators (still
    # oracle-gated at sf0.01 by tests/test_oracle_parity.py every run)
    assert "hopping_window" in keys and "range_join_orders" in keys[:50]
    assert "hopping_window" in ORACLES and "range_join_orders" in ORACLES
