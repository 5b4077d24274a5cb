"""Windowed / time-ordered operators over the events table — the
custom-operator family the reference lacks entirely (its pipeline is
per-page; a training-data engine needs time semantics for logs and
crawl telemetry).

All operators follow the pre-aggregate + small-shuffle law:

- **tumbling window**: window key computed per batch with an Arrow
  temporal kernel, per-batch partial (count, sum) via Arrow hash
  aggregation, then ONE small groupby over (window, type) partials —
  the shuffle moves one row per (batch, window, type), never events.
- **hopping window**: same shape; each event expands to its exact
  k = size/hop windows by arithmetic inside the batch partial, so the
  replication never crosses the wire.
- **sessionization**: hash-shuffle by ``user_id % B`` (bounded
  distinct groupby keys — avoids Ray's many-distinct-key sort-reduce
  cliff at 10^9 users; r2 verdict item 8), then a vectorized ALL-users
  gap scan inside each bucket: one lexsort over (user, ts) per bucket,
  session breaks via a single diff, per-user folds via np.bincount —
  no per-user Python loop. Partitioning assumption: one user's events
  land in one bucket (guaranteed by the modulo key); a pathological
  user would need time-range sub-splitting.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.scaling import auto_buckets, input_nbytes


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


_SESSION_BUCKETS = 64  # floor; default scales with input (scaling.py)


def sessionize(
    sf_dir: str, gap_minutes: int = 30, buckets: int | None = None
) -> pd.DataFrame:
    """Per-user session stats (a new session starts when the gap to
    the previous event exceeds ``gap_minutes``):
    (user_id, n_sessions, n_events, max_session_events).

    The user-bucket count defaults to input-proportional (one bucket
    per ~64 MiB of events parquet, floor 64 — functions/scaling.py)
    so each group's in-worker frame stays bounded at any corpus size;
    output is bucket-count-invariant (user_id % buckets keeps every
    user's events in exactly one group)."""
    path = os.path.join(sf_dir, "events.parquet")
    if buckets is None:
        buckets = auto_buckets(input_nbytes(sf_dir, "events.parquet"))
    ds = rd.read_parquet(path, columns=["user_id", "ts"])
    gap_us = np.int64(gap_minutes) * 60_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "ubucket", pa.array((u % buckets).astype(np.int64))
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "n_sessions": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "max_session_events": pd.Series([], dtype="int64"),
                }
            )
        users = g["user_id"].to_numpy().astype(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, users))
        users, ts = users[order], ts[order]
        # break = new user OR gap exceeded; sessions are runs between
        # breaks — all users in the bucket folded in one pass
        new_user = np.r_[True, users[1:] != users[:-1]]
        new_session = new_user | np.r_[True, np.diff(ts) > gap_us]
        sess_ids = np.cumsum(new_session)  # 1..S over the whole bucket
        sess_sizes = np.bincount(sess_ids)[1:]
        sess_user = users[new_session]  # owner of each session
        uniq, uidx = np.unique(users, return_inverse=True)
        sess_uidx = np.searchsorted(uniq, sess_user)
        n_sessions = np.bincount(sess_uidx, minlength=len(uniq))
        n_events = np.bincount(uidx, minlength=len(uniq))
        # per-user max session size: sort sessions by (user, size) and
        # take the last per user
        so = np.lexsort((sess_sizes, sess_uidx))
        last = np.r_[sess_uidx[so][1:] != sess_uidx[so][:-1], True]
        max_sess = np.zeros(len(uniq), dtype=np.int64)
        max_sess[sess_uidx[so][last]] = sess_sizes[so][last]
        return pd.DataFrame(
            {
                "user_id": uniq,
                "n_sessions": n_sessions.astype("int64"),
                "n_events": n_events.astype("int64"),
                "max_session_events": max_sess,
            }
        )

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


def hopping_window_agg(
    sf_dir: str, size_minutes: int = 120, hop_minutes: int = 30
) -> pd.DataFrame:
    """Hopping (sliding) window aggregate: count + sum(value) per
    (window_start, event_type) for overlapping windows of ``size``
    advancing by ``hop`` (size must be a multiple of hop).

    Each event belongs to exactly ``k = size/hop`` windows whose
    starts are ``floor(ts/hop)*hop - i*hop`` for ``i in 0..k-1`` — a
    pure-arithmetic expansion, so the per-batch plan is: vectorized
    k-way repeat (numpy, no per-row loop), Arrow hash partial per
    (window_start, type), then ONE small groupby over partials. The
    shuffle moves one row per (batch, window, type) — events are
    replicated k times only inside the batch-local partial, never
    across the wire. Same SQL-mirrorable shape as the tumbling
    window; the oracle expands with a ``range(0,k)`` cross join.
    """
    assert size_minutes % hop_minutes == 0
    k = size_minutes // hop_minutes
    hop_us = hop_minutes * 60_000_000
    path = os.path.join(sf_dir, "events.parquet")
    ds = rd.read_parquet(path, columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        floored = (ts_us // hop_us) * hop_us
        starts = (
            np.repeat(floored, k)
            - np.tile(np.arange(k, dtype=np.int64) * hop_us, len(floored))
        )
        etype = pc.take(
            t.column("event_type"),
            pa.array(np.repeat(np.arange(len(ts_us), dtype=np.int64), k)),
        )
        value = np.repeat(
            t.column("value").to_numpy(zero_copy_only=False), k
        )
        exp = pa.table(
            {
                "window_start": pa.array(starts).cast(pa.timestamp("us")),
                "event_type": etype,
                "value": pa.array(value, pa.float64()),
            }
        )
        return exp.group_by(["window_start", "event_type"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .sum(["value_count", "value_sum"])
        .to_pandas()
        .rename(
            columns={"sum(value_count)": "n_events", "sum(value_sum)": "sum_value"}
        )
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(6)
    return out.sort_values(["window_start", "event_type"]).reset_index(drop=True)
