"""Sequence packing: concat-and-chunk documents into fixed-length
training sequences.

The final assembly step of an LLM training-data pipeline: the
tokenized corpus is one logical token stream (documents concatenated
in doc_id order) cut into ``seq_len``-token training sequences; each
document needs its global token offset and the range of sequences it
lands in (for shard manifests, boundary-aware loss masking, and
resume bookkeeping).

The core primitive is a DISTRIBUTED ORDERED PREFIX SUM over doc_id
order — the one aggregation shape none of the repo's other pipelines
needed (groupbys are unordered; windows.py sessionizes per user).
Hierarchical two-level scan, the textbook parallel-scan layout:

1. **Token-count scan**: ``map_batches`` reduces each doc to
   ``(doc_id, n_tokens)`` — 16 bytes/doc; text never leaves this
   stage.
2. **Range partials**: docs bucket by ``doc_id // range_size``;
   a bounded ``groupby(range).sum`` yields per-range token sums
   (one row per range — corpus_size/range_size rows, tiny).
3. **Range offsets**: the driver cumsums the per-range sums in range
   order (range-count-sized, broadcast via ``ray.put``).
4. **Intra-range scan**: ``groupby(range).map_groups`` sorts each
   range by doc_id and cumsums locally, adding the broadcast range
   offset — exact global offsets without ever ordering the whole
   dataset on one node.

Partitioning assumption (documented per repo convention): doc_id is
the pack order. Any total order works — substitute the sort key.
Sequence spans follow arithmetically: ``first_seq = off // L``,
``last_seq = (off + nt - 1) // L`` (empty docs: sentinel -1, they
occupy no tokens).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from ..functions.wstokens import WS_TOKEN_RE

DEFAULT_SEQ_LEN = 128
DEFAULT_RANGE_SIZE = 4096  # docs per prefix-sum range


def pack_sequences(
    sf_dir: str,
    seq_len: int = DEFAULT_SEQ_LEN,
    range_size: int = DEFAULT_RANGE_SIZE,
) -> rd.Dataset:
    """Per-doc packing manifest: (doc_id, n_tokens, tok_offset,
    first_seq, last_seq, n_seqs) under concat-and-chunk at
    ``seq_len`` tokens in doc_id order."""

    def count_tokens(df: pd.DataFrame) -> pd.DataFrame:
        nt = df["text"].fillna("").str.count(WS_TOKEN_RE).astype("int64")
        doc = df["doc_id"].astype("int64")
        return pd.DataFrame(
            {
                "doc_id": doc,
                "nt": nt.to_numpy(),
                "rng": (doc // range_size).to_numpy(),
            }
        )

    counts = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(count_tokens, batch_format="pandas")
    counts = counts.materialize()  # (doc_id, nt, rng) — ints only

    # per-range token sums -> driver cumsum -> broadcast offsets
    per_range = counts.groupby("rng").sum("nt").take_all()
    per_range.sort(key=lambda r: r["rng"])
    offsets: dict[int, int] = {}
    acc = 0
    for r in per_range:
        offsets[r["rng"]] = acc
        acc += int(r["sum(nt)"])
    off_ref = ray.put(offsets)

    def scan_range(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(off_ref)[int(g["rng"].iloc[0])]
        g = g.sort_values("doc_id").reset_index(drop=True)
        nt = g["nt"].to_numpy()
        off = base + np.concatenate([[0], np.cumsum(nt)[:-1]])
        nz = nt > 0
        first = np.where(nz, off // seq_len, -1)
        last = np.where(nz, (off + nt - 1) // seq_len, -1)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "n_tokens": nt,
                "tok_offset": off.astype("int64"),
                "first_seq": first.astype("int64"),
                "last_seq": last.astype("int64"),
                "n_seqs": np.where(nz, last - first + 1, 0).astype("int64"),
            }
        )

    return counts.groupby("rng").map_groups(scan_range, batch_format="pandas")
