"""Exact distributed heavy hitters over the documents token stream.

Finds every token whose corpus frequency exceeds ``phi = 1/(k+1)`` of
all tokens — the classic two-pass candidate/verify layout used when
the vocabulary is too large to shuffle (Misra-Gries / SpaceSaving
family; mergeability per Agarwal et al. 2013, "Mergeable summaries"):

1. **Candidate pass**: each batch keeps only tokens with in-batch
   count ``> n_batch/(k+1)`` — an exact-in-batch Misra-Gries summary,
   at most k rows per batch.  Any GLOBAL phi-heavy hitter must be
   locally heavy in at least one batch (if ``sum c_i > sum n_i/(k+1)``
   then ``c_i > n_i/(k+1)`` somewhere), so the union of summaries
   contains every true heavy hitter; it may contain false positives.
2. **Verify pass**: the candidate set (bounded: ≤ k per batch, tiny
   after the bounded dedup groupby) broadcasts via ``ray.put``; a
   second streaming scan counts EXACT occurrences of candidates only
   (vectorized isin), folded by a candidate-set-sized groupby; false
   positives fall to the final ``count > N·phi`` filter.

Output is exact and deterministic — hence a full DuckDB value oracle
(plain GROUP BY ... HAVING) — while the Ray plan never moves more
than k rows per batch plus one candidate-sized table: the
full-vocabulary shuffle that collocations/BPE pay is avoided
entirely.  This is the 100-TB shape for "top domains / hot tokens /
skew probes" where only the heavy tail matters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from ..functions.wstokens import WS_TOKEN_RE

DEFAULT_K = 200


def _batch_tokens(df: pd.DataFrame) -> np.ndarray:
    toks = df["text"].fillna("").str.lower().str.findall(WS_TOKEN_RE)
    return toks.explode().dropna().to_numpy(dtype=object)


def heavy_hitters(sf_dir: str, k: int = DEFAULT_K) -> pd.DataFrame:
    """All tokens with corpus count > N/(k+1); columns (word, count),
    sorted by (count desc, word asc)."""

    def candidates_batch(df: pd.DataFrame) -> pd.DataFrame:
        words = _batch_tokens(df)
        n = len(words)
        if n == 0:
            return pd.DataFrame({"word": [], "n_batch": []}).astype(
                {"word": str, "n_batch": "int64"}
            )
        uniq, cnt = np.unique(words.astype(str), return_counts=True)
        keep = cnt > n / (k + 1)
        return pd.DataFrame(
            {
                "word": uniq[keep],
                "n_batch": np.full(int(keep.sum()), n, dtype="int64"),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    summaries = (
        ds.map_batches(candidates_batch, batch_format="pandas")
        .groupby("word")  # bounded: ≤ k rows per batch reach this fold
        .sum("n_batch")
        .take_all()
    )
    cand = sorted(r["word"] for r in summaries)
    if not cand:
        return pd.DataFrame({"word": [], "count": []}).astype(
            {"word": str, "count": "int64"}
        )
    cand_ref = ray.put(np.array(cand, dtype=object))

    def verify_batch(df: pd.DataFrame) -> pd.DataFrame:
        cands = ray.get(cand_ref)
        words = _batch_tokens(df)
        n = len(words)
        if n == 0:
            return pd.DataFrame({"word": [""], "count": [0]}).astype(
                {"word": str, "count": "int64"}
            )
        s = pd.Series(words)
        hits = s[s.isin(cands)]
        out = hits.groupby(hits.values, sort=False).size()
        return pd.DataFrame(
            {
                "word": list(out.index) + [""],
                "count": list(out.values) + [n],
            }
        ).astype({"word": str, "count": "int64"})

    # The running-total sentinel key is "" — impossible as a token
    # (tokens are maximal NON-EMPTY non-whitespace runs), unlike any
    # printable or NUL-prefixed marker which could in principle occur
    # in pathological source text.
    folded = (
        ds.map_batches(verify_batch, batch_format="pandas")
        .groupby("word")
        .sum("count")
        .take_all()
    )
    total = sum(r["sum(count)"] for r in folded if r["word"] == "")
    rows = [
        (r["word"], int(r["sum(count)"]))
        for r in folded
        if r["word"] != "" and r["sum(count)"] > total / (k + 1)
    ]
    out = pd.DataFrame(rows, columns=["word", "count"]).astype(
        {"word": str, "count": "int64"}
    )
    return out.sort_values(
        ["count", "word"], ascending=[False, True]
    ).reset_index(drop=True)
