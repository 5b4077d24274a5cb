"""Relational operators over the TPC-H-ish tables — joins the
reference has no counterpart for (SURVEY §2.7: "no relational joins
in the reference") but a general data-processing engine must cover.

Four join strategies, chosen by side sizes and predicate shape (the
§2.7 lookup table):

- **broadcast join** (`enrich_lineitem_with_part`): the small side is
  `ray.put` ONCE and probed inside every map_batches task — no
  shuffle, the pattern for dimension tables.
- **hash join** (`q_customer_order_totals`): `Dataset.join` — both
  sides hash-partitioned on the key; used when both sides are big.
- **as-of join** (`asof_latest_order_before_event`): hash-shuffle
  both sides by user/customer key, per-group numpy searchsorted merge
  in ``map_groups`` — the classic time-series pattern Ray Data lacks
  natively. Partitioning assumption: one key's rows co-locate.
- **range/band join** (`range_join_order_bursts`): NO equality key —
  the time axis is bucketed at the band width so anchors replicate to
  exactly two buckets and one bounded-key cogroup answers every
  in-band probe vectorized; pairs never materialize.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def tpch_q1(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 pricing summary (shipdate cutoff; per
    returnflag/linestatus sums and averages) — the canonical
    pre-aggregable wide aggregate."""
    from ray.data.aggregate import Count, Mean, Sum

    path = os.path.join(sf_dir, "lineitem.parquet")
    ds = rd.read_parquet(
        path,
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )
    import datetime

    cutoff = datetime.date(1998, 9, 2)

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("l_shipdate"), pa.scalar(cutoff)))
        disc = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "l_quantity": t.column("l_quantity"),
                "l_extendedprice": t.column("l_extendedprice"),
                "disc_price": disc,
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Mean("l_quantity", alias_name="avg_qty"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "avg_qty"):
        out[c] = out[c].round(4)
    out["count_order"] = out["count_order"].astype("int64")
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def enrich_lineitem_with_part(sf_dir: str) -> pd.DataFrame:
    """Broadcast join: per-brand revenue. `part` (dimension side) is
    broadcast via ray.put and probed per batch — zero shuffle."""
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    )
    lookup_ref = ray.put(
        dict(
            zip(
                part.column("p_partkey").to_pylist(),
                part.column("p_brand").to_pylist(),
            )
        )
    )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def probe(t: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        keys = t.column("l_partkey").to_pylist()
        brands = [lookup.get(k) for k in keys]
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        return (
            pa.table({"p_brand": pa.array(brands, pa.string()), "revenue": rev})
            .group_by("p_brand")
            .aggregate([("revenue", "sum")])
        )

    out = (
        ds.map_batches(probe, batch_format="pyarrow")
        .groupby("p_brand")
        .sum("revenue_sum")
        .to_pandas()
        .rename(columns={"sum(revenue_sum)": "revenue"})
    )
    out["revenue"] = out["revenue"].round(4)
    return out.sort_values("p_brand").reset_index(drop=True)


def customer_order_totals(sf_dir: str, num_partitions: int = 8) -> pd.DataFrame:
    """Hash join (Dataset.join): per-market-segment order totals."""
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
    )
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    out = (
        joined.groupby("c_mktsegment")
        .sum("o_totalprice")
        .to_pandas()
        .rename(columns={"sum(o_totalprice)": "total_price"})
    )
    out["total_price"] = out["total_price"].round(4)
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def asof_latest_order_before_event(sf_dir: str) -> pd.DataFrame:
    """As-of join: for each event, the latest order of the same
    customer (user_id = custkey) placed strictly before the event's
    date. Returns per-user counts of matched events and the max
    matched order total.

    Plan: hash-shuffle both sides by user key (one groupby cogroup via
    union + map_groups), then a vectorized searchsorted merge per key.
    """
    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def tag_events(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t.column("user_id").cast(pa.int64()),
                "t_us": t.column("ts").cast(pa.int64()),
                "price": pa.nulls(t.num_rows, pa.float64()),
                "side": pa.array(["e"] * t.num_rows, pa.string()),
            }
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        ts = t.column("o_orderdate").cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "key": t.column("o_custkey").cast(pa.int64()),
                "t_us": ts,
                "price": t.column("o_totalprice").cast(pa.float64()),
                "side": pa.array(["o"] * t.num_rows, pa.string()),
            }
        )

    both = events.map_batches(tag_events, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        ev = g[g["side"] == "e"]
        od = g[g["side"] == "o"].sort_values("t_us", kind="mergesort")
        if len(ev) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "n_matched": pd.Series([], dtype="int64"),
                    "max_matched_price": pd.Series([], dtype="float64"),
                }
            )
        key = int(g["key"].iloc[0])
        if len(od) == 0:
            return pd.DataFrame(
                {"user_id": [key], "n_matched": [0], "max_matched_price": [0.0]}
            )
        o_ts = od["t_us"].to_numpy()
        prices = od["price"].to_numpy()
        # deterministic tie-break: multiple orders can share the
        # latest qualifying date — pick the max price among them
        dates, inv = np.unique(o_ts, return_inverse=True)
        max_per_date = np.full(len(dates), -np.inf)
        np.maximum.at(max_per_date, inv, prices)
        idx = np.searchsorted(dates, ev["t_us"].to_numpy(), side="left") - 1
        matched = idx >= 0
        picked = max_per_date[idx[matched]]
        return pd.DataFrame(
            {
                "user_id": [key],
                "n_matched": [int(matched.sum())],
                "max_matched_price": [
                    round(float(picked.max()), 4) if matched.any() else 0.0
                ],
            }
        )

    out = both.groupby("key").map_groups(merge, batch_format="pandas").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def range_join_order_bursts(
    sf_dir: str, days: int = 7, partitions: int = 64
) -> pd.DataFrame:
    """Range (band) join WITHOUT an equality key: for every order, the
    count and total price of OTHER orders placed in the strictly-after
    window ``(o_orderdate, o_orderdate + days]`` — a demand-burst
    probe, and the fourth join strategy in this module's §2.7 table.

    A naive band join is all-pairs. The scale plan buckets the TIME
    axis at the band width: every candidate order lands in exactly one
    ``floor(date / W)`` bucket, every anchor's window spans exactly the
    two buckets ``b0, b0+1`` — so each anchor is replicated twice, the
    union is cogrouped (ONE bounded-key shuffle), and inside a group a
    sorted-candidate ``searchsorted`` + prefix-sum answers all anchors
    vectorized. Anchor partials from the two replicas are summed by a
    final per-order groupby, which also preserves LEFT-join semantics
    (zero-follower anchors still emit partials). Matched pairs are
    never materialized — only per-anchor partials move, so output is
    O(anchors) regardless of band selectivity.

    The shuffle key is ``bucket % partitions`` (bounded distinct keys
    — the repo-wide defense against Ray's many-key groupby overhead):
    only buckets ``b0`` and ``b0+1`` can intersect a window, and
    consecutive integers always differ mod ``partitions >= 2``, so the
    two replicas land in different groups and each in-window candidate
    is counted by exactly one of them; candidates folded in from OTHER
    bucket ranges of the same group are >= W away in time and fall
    outside every window the group's anchors probe.
    """
    assert partitions >= 2
    w_us = days * 86400_000_000
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def tag(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").cast(pa.timestamp("us")).cast(pa.int64())
        dd = d.to_numpy(zero_copy_only=False)
        keys = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        price = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        b0 = (dd // w_us) % partitions
        # candidates once, anchors in b0 and b0+1 (mod partitions)
        bucket = np.concatenate([b0, b0, (dd // w_us + 1) % partitions])
        date = np.concatenate([dd, dd, dd])
        key = np.concatenate([keys, keys, keys])
        pr = np.concatenate([price, price, price])
        side = np.concatenate(
            [np.zeros(len(dd), np.int8), np.ones(2 * len(dd), np.int8)]
        )
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "date_us": pa.array(date, pa.int64()),
                "o_orderkey": pa.array(key, pa.int64()),
                "price": pa.array(pr, pa.float64()),
                "is_anchor": pa.array(side, pa.int8()),
            }
        )

    tagged = orders.map_batches(tag, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cand = g[g["is_anchor"] == 0]
        anch = g[g["is_anchor"] == 1]
        if len(anch) == 0:
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series([], dtype="int64"),
                    "n_follow": pd.Series([], dtype="int64"),
                    "sum_follow_price": pd.Series([], dtype="float64"),
                }
            )
        c_dates = np.sort(cand["date_us"].to_numpy())
        order_c = np.argsort(cand["date_us"].to_numpy(), kind="mergesort")
        c_price = cand["price"].to_numpy()[order_c]
        cum = np.concatenate([[0.0], np.cumsum(c_price)])
        a_dates = anch["date_us"].to_numpy()
        lo = np.searchsorted(c_dates, a_dates, side="right")
        hi = np.searchsorted(c_dates, a_dates + w_us, side="right")
        n = (hi - lo).astype(np.int64)
        s = cum[hi] - cum[lo]
        return pd.DataFrame(
            {
                "o_orderkey": anch["o_orderkey"].to_numpy(),
                "n_follow": n,
                "sum_follow_price": s,
            }
        )

    partials = tagged.groupby("bucket").map_groups(
        per_bucket, batch_format="pandas"
    )

    # fold the two per-anchor partials with a BOUNDED-key shuffle
    # (orderkey % partitions) + in-group vectorized sum — a direct
    # groupby(o_orderkey) would sort-aggregate len(orders) distinct
    # keys (Ray's many-key cliff; measured 3x slower at sf0.1)
    def key_bucket(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        return t.append_column(
            "kb", pa.array((k % partitions).astype(np.int32), pa.int32())
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("o_orderkey", as_index=False).agg(
            n_follow=("n_follow", "sum"),
            sum_follow_price=("sum_follow_price", "sum"),
        )
        return s

    out = (
        partials.map_batches(key_bucket, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    out["n_follow"] = out["n_follow"].astype("int64")
    out["sum_follow_price"] = out["sum_follow_price"].round(4)
    return out.sort_values("o_orderkey").reset_index(drop=True)
