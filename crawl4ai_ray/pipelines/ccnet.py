"""CCNet perplexity bucketing — head/middle/tail per language.

The POINT of CCNet's LM-perplexity stage (Wenzek et al. 2020, §4.3)
is the bucketing: within each language, documents are split into
head / middle / tail TERCILES by perplexity, and downstream training
recipes sample the buckets differently (head ~ "reads like edited
text"). ``pipelines/lm.py`` built the distributed scoring chain;
this operator completes it with the exact per-language split.

Exactness contract (what the SQL oracle checks): bucket boundaries
are RANK cuts — within language, rank docs by ``(ppl, doc_id)``
(doc_id breaks ties deterministically: exact duplicate texts DO occur
in real corpora and produce identical perplexities), then
``head = rank <= ceil(n/3)``, ``middle = rank <= ceil(2n/3)``,
``tail`` otherwise — the DuckDB twin is a plain ``ROW_NUMBER() OVER
(PARTITION BY lang ORDER BY ppl, doc_id)``.

Scale shape (NO global sort anywhere):

1. **Score scan** — one pass over (doc_id, lang, text) with the
   broadcast LM head: constant-width (doc_id, lang, ppl) rows,
   materialized to the object store (fixed-width, ~1% of the text
   bytes; spillable).
2. **Threshold narrowing** — per (lang, cut-rank) value brackets
   tightened by iterative probe-count scans (the
   selection.py/exact_quantiles pattern, keyed by lang): each
   iteration is ONE map_batches over the scored rows emitting
   #{ppl < probe} per (lang, probe). Converges to the cut VALUE; the
   tie set (rows with ppl == cut value) is pulled (bounded; asserted)
   and the doc_id sub-threshold resolved driver-side.
3. **Assignment scan** — thresholds broadcast in the closure; each
   batch buckets its rows by lexicographic (ppl, doc_id) compare.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .lm import ALPHA, VOCAB_SIZE, _make_ppl_batch, _tokenize, train_unigram_lm

_N_PROBES = 128
_PULL_CAP = 1_000_000  # tie-set bound: rows sharing a cut ppl value


def _scored_dataset(sf_dir: str, lm: dict) -> rd.Dataset:
    """(doc_id, lang, ppl) via one scoring scan with the broadcast LM."""
    score = _make_ppl_batch(lm["logp"], lm["logp_oov"])

    def batch(df: pd.DataFrame) -> pd.DataFrame:
        out = score(df)
        out["lang"] = df["lang"].to_numpy()
        # rank on round(ppl, 6): numpy and DuckDB ln/exp can differ in
        # the last ulps, and an unrounded ORDER BY could flip two
        # near-equal docs across the Ray/SQL boundary; rounding makes
        # such pairs EQUAL on both sides, where the doc_id tie-break
        # resolves them identically (oracle mirrors round(ppl, 6))
        out["ppl"] = np.round(out["ppl"].to_numpy(dtype="float64"), 6)
        return out[["doc_id", "lang", "ppl"]]

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "text"],
    ).map_batches(batch, batch_format="pandas")


def _cut_ranks(n: int) -> tuple[int, int]:
    """ceil(n/3), ceil(2n/3) in exact integer arithmetic (mirrors the
    oracle's ceil(n/3.0), safe for any BIGINT n)."""
    return (n + 2) // 3, (2 * n + 2) // 3


def _rank_thresholds(scored: rd.Dataset, counts: dict) -> dict:
    """For each (lang, k) cut: the threshold PAIR (ppl*, doc*) such
    that exactly k rows of that lang satisfy ``(ppl, doc_id) <=
    (ppl*, doc*)``. Iterative per-lang bracket narrowing on the value,
    then a bounded tie pull resolves the doc_id sub-threshold."""
    # state per (lang, k): value bracket [lo, hi] with #{ppl < lo} = c_lo
    state: dict = {}
    for lang, (n, mn, mx) in counts.items():
        for k in _cut_ranks(n):
            state[(lang, k)] = {"lo": mn, "hi": mx, "c_lo": 0, "k": k}

    for _ in range(8):
        pending = {key: s for key, s in state.items() if s["lo"] < s["hi"]}
        if not pending:
            break
        keys = sorted(pending)
        probes = {
            key: np.linspace(pending[key]["lo"], pending[key]["hi"], _N_PROBES + 1)
            for key in keys
        }

        def count_batch(df: pd.DataFrame, keys=keys, probes=probes) -> pd.DataFrame:
            rows = []
            for lang, grp in df.groupby("lang", sort=False):
                v = np.sort(grp["ppl"].to_numpy(dtype="float64"))
                for key in keys:
                    if key[0] != lang:
                        continue
                    rows.append(
                        {
                            "key": f"{key[0]}\x1f{key[1]}",
                            "counts": np.searchsorted(
                                v, probes[key], side="left"
                            ).astype("int64"),
                        }
                    )
            return pd.DataFrame(rows, columns=["key", "counts"])

        parts = scored.map_batches(count_batch, batch_format="pandas").to_pandas()
        progressed = False
        max_cand = 0
        for key in keys:
            tag = f"{key[0]}\x1f{key[1]}"
            sel = parts[parts["key"] == tag]
            if sel.empty:
                continue
            total = np.sum(np.stack(sel["counts"].to_list()), axis=0)
            s, t = pending[key], probes[key]
            below = np.nonzero(total < s["k"])[0]
            at_or_above = np.nonzero(total >= s["k"])[0]
            new_lo, new_c_lo = (
                (t[below[-1]], int(total[below[-1]])) if len(below) else (s["lo"], s["c_lo"])
            )
            new_hi = t[at_or_above[0]] if len(at_or_above) else s["hi"]
            if (new_lo, new_hi) != (s["lo"], s["hi"]):
                s.update(lo=new_lo, hi=new_hi, c_lo=new_c_lo)
                progressed = True
            # candidate estimate: rows strictly inside [lo, last probe)
            # (== hi rows join at the pull); early exit saves whole
            # probe-scan rounds — each is a full Dataset execution
            max_cand = max(max_cand, int(total[-1]) - s["c_lo"])
        if not progressed or max_cand <= _PULL_CAP // 4:
            break  # resolved enough for one bounded pull

    # bounded pull: rows whose ppl falls in any unresolved bracket
    brackets = {key: (s["lo"], s["hi"]) for key, s in state.items()}

    def pull_batch(df: pd.DataFrame) -> pd.DataFrame:
        keep = np.zeros(len(df), dtype=bool)
        v = df["ppl"].to_numpy(dtype="float64")
        langs = df["lang"].to_numpy()
        for (lang, _k), (lo, hi) in brackets.items():
            keep |= (langs == lang) & (v >= lo) & (v <= hi)
        return df.loc[keep, ["doc_id", "lang", "ppl"]]

    pulled = scored.map_batches(pull_batch, batch_format="pandas").to_pandas()
    assert len(pulled) <= _PULL_CAP, (
        f"cut-value tie set ({len(pulled)} rows) exceeds the pull cap; "
        "raise _PULL_CAP or add a narrowing iteration"
    )

    out: dict = {}
    for (lang, k), s in state.items():
        grp = pulled[pulled["lang"] == lang].sort_values(
            ["ppl", "doc_id"], kind="mergesort"
        )
        v = grp["ppl"].to_numpy(dtype="float64")
        # rank of the first pulled row = #{ppl < lo} + #{lo <= ppl <
        # first pulled} — the bracket pull starts exactly at lo, so
        # the k-th row of the lang sits at local index k - c_lo_at_lo
        lo_shift = int(np.searchsorted(v, s["lo"], side="left"))
        i = s["k"] - s["c_lo"] - 1 + lo_shift
        out[(lang, k)] = (
            float(grp["ppl"].iloc[i]),
            int(grp["doc_id"].iloc[i]),
        )
    return out


def ccnet_buckets(
    sf_dir: str,
    alpha: float = ALPHA,
    vocab_size: int = VOCAB_SIZE,
) -> pd.DataFrame:
    """Per-document CCNet bucket assignment: (doc_id, lang, ppl,
    bucket) with bucket in head/middle/tail by per-language
    (ppl, doc_id) rank terciles; sorted by doc_id."""
    lm = train_unigram_lm(sf_dir, alpha=alpha, vocab_size=vocab_size)
    scored = _scored_dataset(sf_dir, lm).materialize()

    def stats_batch(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("lang", sort=False)["ppl"]
        return pd.DataFrame(
            {
                "lang": g.count().index,
                "n": g.count().to_numpy(),
                "mn": g.min().to_numpy(),
                "mx": g.max().to_numpy(),
            }
        )

    st = (
        scored.map_batches(stats_batch, batch_format="pandas")
        .to_pandas()
        .groupby("lang")
        .agg(n=("n", "sum"), mn=("mn", "min"), mx=("mx", "max"))
    )
    counts = {
        lang: (int(r["n"]), float(r["mn"]), float(r["mx"]))
        for lang, r in st.iterrows()
    }
    cuts = _rank_thresholds(scored, counts)

    # broadcast thresholds: per lang, the two (ppl*, doc*) pairs
    by_lang = {
        lang: tuple(cuts[(lang, k)] for k in _cut_ranks(n))
        for lang, (n, _mn, _mx) in counts.items()
    }

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        v = df["ppl"].to_numpy(dtype="float64")
        ids = df["doc_id"].to_numpy()
        langs = df["lang"].to_numpy()
        bucket = np.full(len(df), "tail", dtype=object)
        for lang, ((p1, d1), (p2, d2)) in by_lang.items():
            m = langs == lang
            le2 = m & ((v < p2) | ((v == p2) & (ids <= d2)))
            bucket[le2] = "middle"
            le1 = m & ((v < p1) | ((v == p1) & (ids <= d1)))
            bucket[le1] = "head"
        out = df[["doc_id", "lang", "ppl"]].copy()
        out["bucket"] = bucket
        return out

    out = scored.map_batches(assign, batch_format="pandas").to_pandas()
    return (
        out.astype({"doc_id": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
