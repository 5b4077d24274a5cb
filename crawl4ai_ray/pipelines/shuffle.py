"""Deterministic corpus shuffle manifest for training order.

Training runs need the corpus in a reproducible pseudo-random order,
sharded for parallel loaders — but actually MOVING 100 TB of payload
through a ``random_shuffle`` is the most expensive operation a
pipeline can run.  The standard trick: shuffle the MANIFEST, not the
data.  Each doc gets a deterministic 64-bit key (md5 of its id — the
repo's oracle-parity digest), its shard is ``key % n_shards``, and
its position within the shard is its rank by ``(key, doc_id)``.
Loaders then read payloads by manifest order with whatever
prefetch/batching they like; re-running the pipeline yields the
identical order (seeded shuffles in distributed engines generally do
NOT survive a change of partitioning — a pure key function does).

Scale shape: one scan computes keys/shard (ids only — 24 bytes/doc;
payloads never move), one bounded ``groupby(shard)`` ranks each
shard's manifest with a vectorized argsort.  Shards are the unit of
loader parallelism, so ``n_shards`` is bounded (hundreds), and each
group holds ids only — corpus-size-independent memory per group is
NOT required here (ids are 1/10^5 of payload bytes); for manifests
beyond that, rank hierarchically like pipelines/packing.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data as rd

DEFAULT_SHARDS = 32


def _id_keys(doc_ids: np.ndarray) -> np.ndarray:
    return np.array(
        [
            int(hashlib.md5(str(int(d)).encode()).hexdigest()[:16], 16)
            for d in doc_ids
        ],
        dtype=np.uint64,
    )


def shuffle_manifest(sf_dir: str, n_shards: int = DEFAULT_SHARDS) -> rd.Dataset:
    """Per-doc (doc_id, shard, pos): deterministic shuffled training
    order, payloads untouched."""

    def key_batch(df: pd.DataFrame) -> pd.DataFrame:
        doc = df["doc_id"].to_numpy()
        h = _id_keys(doc)
        return pd.DataFrame(
            {
                "doc_id": doc.astype("int64"),
                "h": h,
                "shard": (h % np.uint64(n_shards)).astype("int64"),
            }
        )

    def rank_shard(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["doc_id"].to_numpy(), g["h"].to_numpy()))
        out = g.iloc[order]
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].to_numpy(),
                "shard": out["shard"].to_numpy(),
                "pos": np.arange(len(out), dtype="int64"),
            }
        )

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .map_batches(key_batch, batch_format="pandas")
        .groupby("shard")
        .map_groups(rank_shard, batch_format="pandas")
    )
