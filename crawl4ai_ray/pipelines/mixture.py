"""Domain-mixture sampling weights over the documents table.

The data-mixing step of a training-data pipeline (GPT-3 / LLaMA
style): compute each source domain's share of the corpus in TOKENS,
then temperature-scale the sampling distribution

    weight_i = prop_i^tau / sum_j prop_j^tau        (tau in (0, 1])

so low-resource domains are up-sampled (tau < 1 flattens the
distribution; the multinomial-sampling temperature of Conneau &
Lample 2019).  ``boost_i = weight_i / prop_i`` is the resulting
per-domain over/under-sampling factor.

Scale shape: one streaming token-count scan emitting per-batch
partial ``(source, n_docs, n_tokens)`` rows (distinct sources are
bounded — domains, not documents), one tiny groupby fold, and a
domain-table-sized driver finalize for the normalizations.  Token
counting is the repo-canonical whitespace tokenizer (functions/
wstokens.py) so the DuckDB oracle agrees byte-for-byte.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from ..functions.wstokens import WS_TOKEN_RE

DEFAULT_TAU = 0.5


def mixture_weights(sf_dir: str, tau: float = DEFAULT_TAU) -> pd.DataFrame:
    """Per-source (n_docs, n_tokens, prop, weight, boost), rounded to
    6 decimals, sorted by source."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        nt = df["text"].fillna("").str.count(WS_TOKEN_RE)
        g = pd.DataFrame({"source": df["source"].to_numpy(), "nt": nt.to_numpy()})
        out = g.groupby("source", as_index=False).agg(
            n_docs=("nt", "size"), n_tokens=("nt", "sum")
        )
        return out.astype({"n_docs": "int64", "n_tokens": "int64"})

    per = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
        .map_batches(partial, batch_format="pandas")
        .groupby("source")
        .sum(["n_docs", "n_tokens"])
        .to_pandas()
        .rename(columns={"sum(n_docs)": "n_docs", "sum(n_tokens)": "n_tokens"})
    )
    total = float(per["n_tokens"].sum())
    prop = per["n_tokens"].to_numpy(dtype=float) / total
    scaled = np.power(prop, tau)
    weight = scaled / scaled.sum()
    out = pd.DataFrame(
        {
            "source": per["source"],
            "n_docs": per["n_docs"].astype("int64"),
            "n_tokens": per["n_tokens"].astype("int64"),
            "prop": np.round(prop, 6),
            "weight": np.round(weight, 6),
            "boost": np.round(weight / prop, 6),
        }
    )
    return out.sort_values("source").reset_index(drop=True)
