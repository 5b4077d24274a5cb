"""Distributed selection operators: exact quantiles without a global
sort, and an exact-k uniform sample via rank-key partial top-k.

Both answer "order statistics over a 100-TB column" without ever
shuffling or sorting the dataset:

- ``exact_quantiles``: iterative threshold-count narrowing (the
  classic distributed selection / k-th element scheme, Blum et al.
  lineage; same shape as M/R selection in Dean & Ghemawat's examples).
  Scan 1 folds per-batch (count, min, max) partials.  Each refinement
  scan counts, per candidate quantile, how many values fall below each
  of B probe thresholds spanning the current bracket (a per-batch
  ``np.sort`` + ``searchsorted`` — one row of B ints leaves each
  batch), and the driver tightens the bracket [lo, hi] around the
  target rank.  When the bracket holds fewer than ``pull_cap`` values,
  one filtered scan pulls exactly those values and the rank is read
  off locally.  Driver memory is O(n_quantiles x B) ints plus one
  final pull; the value column is scanned (column-pruned) but never
  moved.  Rank rule is DuckDB's ``quantile_disc``: the value at
  1-indexed rank ``max(1, ceil(q*N))`` — hence a full SQL value
  oracle.  Worst case is a single value carrying more than
  ``pull_cap`` duplicates: thresholds cannot split equal keys, so
  after ``max_iters`` the pull returns that (byte-identical) run —
  bounded by the largest duplicate mass, not by N.

- ``uniform_sample_k``: exact-k uniform-without-replacement sample,
  keyed by a deterministic md5 rank (the same digest rule as
  queries.q_stratified_sample so DuckDB replays the draw).  Each
  batch forwards only its k smallest (draw, doc_id) rows; the driver
  merges k x n_blocks bounded partials.  Equivalent to ``ORDER BY
  md5(id) LIMIT k`` without the global sort; deterministic across
  any repartitioning because the key is a pure row function.
"""

from __future__ import annotations

import hashlib
import math
import os

import numpy as np
import pandas as pd

import ray.data as rd

DEFAULT_QS = (0.25, 0.5, 0.75, 0.9375, 0.984375)
_MD5_SCALE = 16**15  # 60-bit draw, same width as stratified_sample


def _md5_draws(ids) -> np.ndarray:
    """md5 of the decimal id, first 15 hex chars — bit-identical to
    DuckDB ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::UBIGINT."""
    return np.array(
        [int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) for i in ids],
        dtype=np.int64,
    )


def exact_quantiles(
    sf_dir: str,
    qs: tuple[float, ...] = DEFAULT_QS,
    table: str = "events",
    column: str = "value",
    n_probes: int = 256,
    pull_cap: int = 100_000,
    max_iters: int = 6,
) -> pd.DataFrame:
    """Exact ``quantile_disc``-semantics quantiles of ``column``;
    returns columns (q, value) sorted by q."""
    ds = rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=[column])

    def stats_batch(df: pd.DataFrame) -> pd.DataFrame:
        v = df[column].dropna().to_numpy(dtype="float64")
        if len(v) == 0:
            return pd.DataFrame({"n": [0], "mn": [np.inf], "mx": [-np.inf]})
        return pd.DataFrame({"n": [len(v)], "mn": [v.min()], "mx": [v.max()]})

    st = ds.map_batches(stats_batch, batch_format="pandas").to_pandas()
    n_total = int(st["n"].sum())
    if n_total == 0:
        return pd.DataFrame({"q": list(qs), "value": [np.nan] * len(qs)})
    gmin, gmax = float(st["mn"].min()), float(st["mx"].max())

    # DuckDB quantile_disc rank: 1-indexed max(1, ceil(q*N)) — pinned
    # empirically (the q=0.51/n=4 case separates it from the
    # floor(1+q*(n-1)) family) and re-pinned vs DuckDB in tests.
    targets = [(float(q), max(1, math.ceil(q * n_total))) for q in qs]

    # bracket invariant per quantile: #{v < lo} < k <= #{v <= hi},
    # i.e. the rank-k value lies in [lo, hi]; c_lo = #{v < lo}.
    state = {q: {"lo": gmin, "hi": gmax, "c_lo": 0, "k": k} for q, k in targets}
    resolved: dict[float, float] = {}

    for _ in range(max_iters):
        pending = {
            q: s
            for q, s in state.items()
            if q not in resolved and s["lo"] < s["hi"]
        }
        for q, s in state.items():
            if q not in resolved and s["lo"] >= s["hi"]:
                resolved[q] = s["lo"]
        if not pending:
            break
        probe_sets = {
            q: np.linspace(s["lo"], s["hi"], n_probes + 1)
            for q, s in pending.items()
        }
        qs_pending = sorted(probe_sets)
        flat_probes = np.concatenate([probe_sets[q] for q in qs_pending])

        def count_batch(df: pd.DataFrame, probes=flat_probes) -> pd.DataFrame:
            v = np.sort(df[column].dropna().to_numpy(dtype="float64"))
            # counts[i] = #{v < probes[i]} in this batch
            counts = np.searchsorted(v, probes, side="left")
            return pd.DataFrame({"counts": [counts.astype("int64")]})

        parts = ds.map_batches(count_batch, batch_format="pandas").to_pandas()
        total = np.sum(np.stack(parts["counts"].to_list()), axis=0)

        off = 0
        for q in qs_pending:
            s = pending[q]
            c = total[off : off + n_probes + 1]  # c[i] = #{v < t_i}
            t = probe_sets[q]
            off += n_probes + 1
            k = s["k"]
            below = np.nonzero(c < k)[0]  # t_i with fewer than k values below
            at_or_above = np.nonzero(c >= k)[0]
            new_lo, new_c_lo = (t[below[-1]], int(c[below[-1]])) if len(below) else (s["lo"], s["c_lo"])
            new_hi = t[at_or_above[0]] if len(at_or_above) else s["hi"]
            if (new_lo, new_hi) == (s["lo"], s["hi"]):
                continue  # no progress (duplicate mass) -> pull later
            s.update(lo=new_lo, hi=new_hi, c_lo=new_c_lo)
            # candidate count = #{v < hi} - #{v < lo} (+ values == hi);
            # small enough -> next loop exits via the pull below
        pend_counts = {
            q: int(
                total[qs_pending.index(q) * (n_probes + 1) + n_probes]
                - pending[q]["c_lo"]
            )
            for q in qs_pending
        }
        if all(v <= pull_cap for v in pend_counts.values()):
            break

    # final pull: for each unresolved quantile, gather values in
    # [lo, hi] (exact mask matching the c_lo definition v < lo) and
    # read rank k - c_lo locally.
    unresolved = [q for q, _ in targets if q not in resolved]
    if unresolved:
        brackets = [(state[q]["lo"], state[q]["hi"]) for q in unresolved]
        plo = min(b[0] for b in brackets)
        phi = max(b[1] for b in brackets)

        def pull_batch(df: pd.DataFrame) -> pd.DataFrame:
            v = df[column].dropna().to_numpy(dtype="float64")
            return pd.DataFrame({"v": v[(v >= plo) & (v <= phi)]})

        pulled = np.sort(
            ds.map_batches(pull_batch, batch_format="pandas").to_pandas()[
                "v"
            ].to_numpy()
        )
        for q in unresolved:
            s = state[q]
            # rank within pulled: values < s["lo"] are excluded from
            # the slice below; extra values in [plo, lo) shift by count
            lo_shift = int(np.searchsorted(pulled, s["lo"], side="left"))
            resolved[q] = float(pulled[s["k"] - s["c_lo"] - 1 + lo_shift])

    out = pd.DataFrame(
        {"q": [q for q, _ in targets], "value": [resolved[q] for q, _ in targets]}
    )
    return out.sort_values("q").reset_index(drop=True)


def uniform_sample_k(
    sf_dir: str, k: int = 100, table: str = "documents", id_col: str = "doc_id"
) -> pd.DataFrame:
    """Exact-k uniform sample by md5 rank; columns (doc_id, lang)
    sorted by doc_id.  Per batch only the k smallest draws move."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=[id_col, "lang"]
    )

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        draws = _md5_draws(ids)
        order = np.lexsort((ids, draws))[:k]
        out = df.iloc[order][[id_col, "lang"]].copy()
        out["draw"] = draws[order]
        return out

    parts = ds.map_batches(partial_topk, batch_format="pandas").to_pandas()
    top = parts.sort_values(["draw", id_col]).head(k)
    return (
        top[[id_col, "lang"]].sort_values(id_col).reset_index(drop=True)
    )


def grouped_quantiles(
    sf_dir: str,
    qs: tuple[float, ...] = (0.5, 0.9375),
    table: str = "events",
    group_col: str = "event_type",
    column: str = "value",
    n_probes: int = 128,
    pull_cap: int = 100_000,
    max_iters: int = 6,
) -> pd.DataFrame:
    """Exact per-group quantiles (quantile_disc semantics) by the same
    threshold-count narrowing as ``exact_quantiles``, with the bracket
    state keyed by (group, q).  Designed for BOUNDED group cardinality
    (event types, status classes, host buckets — the per-host-class
    latency-percentile shape): every scan moves n_groups x n_probes
    ints per batch and the driver holds n_groups x n_quantiles
    brackets.  Unbounded group keys should bucket-shuffle and sort
    in-group instead.  Returns (group_col, q, value) sorted."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=[group_col, column]
    )

    def stats_batch(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_col)[column]
        out = g.agg(n="count", mn="min", mx="max").reset_index()
        return out[out["n"] > 0]

    st = (
        ds.map_batches(stats_batch, batch_format="pandas")
        .to_pandas()
        .groupby(group_col)
        .agg(n=("n", "sum"), mn=("mn", "min"), mx=("mx", "max"))
    )

    # bracket state per (group, q); rank rule as exact_quantiles
    state: dict[tuple[str, float], dict] = {}
    for grp, row in st.iterrows():
        for q in qs:
            state[(grp, float(q))] = {
                "lo": float(row["mn"]),
                "hi": float(row["mx"]),
                "c_lo": 0,
                "k": max(1, math.ceil(q * int(row["n"]))),
            }
    resolved: dict[tuple[str, float], float] = {}

    for _ in range(max_iters):
        for key, s in state.items():
            if key not in resolved and s["lo"] >= s["hi"]:
                resolved[key] = s["lo"]
        pending = [k for k in state if k not in resolved]
        if not pending:
            break
        probe_sets = {
            key: np.linspace(state[key]["lo"], state[key]["hi"], n_probes + 1)
            for key in pending
        }
        # one probe matrix per group: concat its pending quantiles
        by_group: dict[str, list[tuple[float, np.ndarray]]] = {}
        for (grp, q), probes in probe_sets.items():
            by_group.setdefault(grp, []).append((q, probes))
        flat = {g: np.concatenate([p for _, p in lst]) for g, lst in by_group.items()}

        def count_batch(df: pd.DataFrame, flat=flat) -> pd.DataFrame:
            rows = []
            for grp, sub in df.groupby(group_col):
                if grp not in flat:
                    continue
                v = np.sort(sub[column].dropna().to_numpy(dtype="float64"))
                rows.append(
                    {
                        "grp": grp,
                        "counts": np.searchsorted(v, flat[grp], side="left").astype(
                            "int64"
                        ),
                    }
                )
            return pd.DataFrame(rows, columns=["grp", "counts"])

        parts = ds.map_batches(count_batch, batch_format="pandas").to_pandas()
        totals = {
            grp: np.sum(np.stack(sub["counts"].to_list()), axis=0)
            for grp, sub in parts.groupby("grp")
        }
        done_narrowing = True
        for grp, lst in by_group.items():
            total = totals[grp]
            off = 0
            for q, t in lst:
                c = total[off : off + n_probes + 1]
                off += n_probes + 1
                s = state[(grp, q)]
                k = s["k"]
                below = np.nonzero(c < k)[0]
                at_or_above = np.nonzero(c >= k)[0]
                new_lo, new_c_lo = (
                    (t[below[-1]], int(c[below[-1]])) if len(below) else (s["lo"], s["c_lo"])
                )
                new_hi = t[at_or_above[0]] if len(at_or_above) else s["hi"]
                if (new_lo, new_hi) != (s["lo"], s["hi"]):
                    s.update(lo=new_lo, hi=new_hi, c_lo=new_c_lo)
                if int(c[-1]) - s["c_lo"] > pull_cap:
                    done_narrowing = False
        if done_narrowing:
            break

    unresolved = [k for k in state if k not in resolved]
    if unresolved:
        bounds = {
            grp: (
                min(state[k]["lo"] for k in unresolved if k[0] == grp),
                max(state[k]["hi"] for k in unresolved if k[0] == grp),
            )
            for grp in {k[0] for k in unresolved}
        }

        def pull_batch(df: pd.DataFrame, bounds=bounds) -> pd.DataFrame:
            outs = []
            for grp, sub in df.groupby(group_col):
                if grp not in bounds:
                    continue
                lo, hi = bounds[grp]
                v = sub[column].dropna().to_numpy(dtype="float64")
                outs.append(pd.DataFrame({"grp": grp, "v": v[(v >= lo) & (v <= hi)]}))
            return (
                pd.concat(outs, ignore_index=True)
                if outs
                else pd.DataFrame({"grp": pd.Series(dtype=object), "v": pd.Series(dtype="float64")})
            )

        pulled = ds.map_batches(pull_batch, batch_format="pandas").to_pandas()
        by_grp = {grp: np.sort(sub["v"].to_numpy()) for grp, sub in pulled.groupby("grp")}
        for key in unresolved:
            grp, _q = key
            s = state[key]
            arr = by_grp[grp]
            lo_shift = int(np.searchsorted(arr, s["lo"], side="left"))
            resolved[key] = float(arr[s["k"] - s["c_lo"] - 1 + lo_shift])

    out = pd.DataFrame(
        [
            {group_col: grp, "q": q, "value": resolved[(grp, q)]}
            for (grp, q) in sorted(state)
        ]
    )
    return out.sort_values([group_col, "q"]).reset_index(drop=True)
