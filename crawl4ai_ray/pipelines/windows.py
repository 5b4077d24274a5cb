"""Windowed / time-ordered operators over the events table — the
custom-operator family the reference lacks entirely (its pipeline is
per-page; a training-data engine needs time semantics for logs and
crawl telemetry).

Both operators follow the pre-aggregate + small-shuffle law:

- **tumbling window**: window key computed per batch with an Arrow
  temporal kernel, per-batch partial (count, sum) via Arrow hash
  aggregation, then ONE small groupby over (window, type) partials —
  the shuffle moves one row per (batch, window, type), never events.
- **sessionization**: hash-shuffle by user_id (the only co-location
  the semantics need), per-user gap scan vectorized in numpy inside
  ``map_groups``. Partitioning assumption: one user's events fit one
  group (true for any real user; a pathological user would need
  time-range sub-splitting).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def tumbling_window_agg(
    sf_dir: str, every: str = "1 hour"
) -> pd.DataFrame:
    """count + sum(value) per (window_start, event_type)."""
    path = os.path.join(sf_dir, "events.parquet")
    ds = rd.read_parquet(path, columns=["ts", "event_type", "value"])
    unit = {"1 hour": "hour", "1 day": "day", "1 minute": "minute"}[every]

    def partial(t: pa.Table) -> pa.Table:
        win = pc.floor_temporal(t.column("ts"), unit=unit)
        g = (
            t.drop_columns(["ts"])
            .append_column("window_start", win)
            .group_by(["window_start", "event_type"])
            .aggregate([("value", "count"), ("value", "sum")])
        )
        return g

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .sum(["value_count", "value_sum"])
        .to_pandas()
    )
    out = out.rename(
        columns={"sum(value_count)": "n_events", "sum(value_sum)": "sum_value"}
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(6)
    return out.sort_values(["window_start", "event_type"]).reset_index(drop=True)


def sessionize(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Per-user session stats (a new session starts when the gap to
    the previous event exceeds ``gap_minutes``):
    (user_id, n_sessions, n_events, max_session_events)."""
    path = os.path.join(sf_dir, "events.parquet")
    ds = rd.read_parquet(path, columns=["user_id", "ts"])
    gap_us = np.int64(gap_minutes) * 60_000_000

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        if len(ts) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "n_sessions": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "max_session_events": pd.Series([], dtype="int64"),
                }
            )
        new_session = np.r_[True, np.diff(ts) > gap_us]
        sess_ids = np.cumsum(new_session)
        counts = np.bincount(sess_ids)[1:]
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_sessions": [int(sess_ids[-1])],
                "n_events": [len(ts)],
                "max_session_events": [int(counts.max())],
            }
        )

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)
