"""Crawl snapshot diff — the incremental-recrawl delta.

Given two crawl snapshots of the same url space, classify every page
as added / removed / changed / unchanged by comparing content
fingerprints (md5 here, so DuckDB replays it; the engines' own store
uses the same content-hash idea as the reference's smart-revalidation
fingerprint, crawl4ai cache_validator.py + utils.py:2847 head
fingerprint).  This is the corpus-level analog of the reference's
per-URL revalidation: the delta feeds a recrawl frontier (changed +
added) and a tombstone list (removed).

Scale shape: each snapshot reduces to (id, 16-byte hash) rows inside
``map_batches`` — page bodies never leave the scan — then ONE
bounded-key cogroup shuffle (``id % auto_buckets``) aligns the two
sides and a vectorized pandas outer merge classifies per bucket.
Output is O(delta), not O(corpus): the dominant 'unchanged' class is
dropped inside the bucket fold, so at 100 TB the driver sees only
the recrawl work list.  Bucket count scales with input bytes
(functions/scaling.py), and the diff is bucket-count-invariant.

The synthetic snapshots are pure functions of the documents table
(BASELINE.md: deterministic small-scale synthesis), chosen so all
four classes occur, including the added-AND-rewritten overlap:

- snapshot A (previous crawl): docs with ``doc_id % 10 != 0``
- snapshot B (current crawl):  docs with ``doc_id % 7  != 0``;
  pages with ``doc_id % 5 == 0`` were rewritten (text + ' v2')

The Ray side hashes the actual text on both scans — the rules only
shape the fixture; classification happens on real digests.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

import ray.data as rd

from ..functions.scaling import auto_buckets, input_nbytes


def _hash_side(
    sf_dir: str, side: str, keep_mod: int, rewrite_mod: int | None, buckets: int
):
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def fingerprints(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        m = (ids % keep_mod) != 0
        ids = ids[m]
        texts = df["text"].fillna("").to_numpy(dtype=object)[m]
        if rewrite_mod is not None:
            rw = (ids % rewrite_mod) == 0
            texts = np.where(rw, [t + " v2" for t in texts], texts)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "h": [hashlib.md5(t.encode()).hexdigest() for t in texts],
                "side": side,
                "bucket": (ids % buckets).astype("int64"),
            }
        )

    return ds.map_batches(fingerprints, batch_format="pandas")


def snapshot_diff(sf_dir: str, buckets: int | None = None) -> pd.DataFrame:
    """Per-page delta between snapshot A (doc_id%10!=0) and B
    (doc_id%7!=0, %5==0 rewritten); columns (doc_id, status) with
    status in added/removed/changed, sorted by doc_id.  'unchanged'
    never leaves the bucket fold."""
    if buckets is None:
        buckets = auto_buckets(input_nbytes(sf_dir))

    a = _hash_side(sf_dir, "a", keep_mod=10, rewrite_mod=None, buckets=buckets)
    b = _hash_side(sf_dir, "b", keep_mod=7, rewrite_mod=5, buckets=buckets)

    def diff_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == "a"][["doc_id", "h"]]
        right = g[g["side"] == "b"][["doc_id", "h"]]
        m = left.merge(right, on="doc_id", how="outer", suffixes=("_a", "_b"))
        status = np.where(
            m["h_a"].isna(),
            "added",
            np.where(
                m["h_b"].isna(),
                "removed",
                np.where(m["h_a"] != m["h_b"], "changed", "unchanged"),
            ),
        )
        out = pd.DataFrame({"doc_id": m["doc_id"], "status": status})
        return out[out["status"] != "unchanged"]

    parts = (
        a.union(b)
        .groupby("bucket")
        .map_groups(diff_bucket, batch_format="pandas")
        .to_pandas()
    )
    return (
        parts.astype({"doc_id": "int64", "status": str})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
