"""End-to-end curation manifest: quality -> dedup -> packing, fused.

The pipeline a training-data run actually executes, composed from
the repo's primitives so each 100-TB-shaped stage is reused, not
re-invented:

1. **Quality scan** (`quality.curation_batch`): ONE read of the text
   column computes Gopher quality + Gopher repetition + C4 document
   rules and the doc's word count; the text reduces to
   ``(doc_id, n_words, keep_quality, text_hash)`` — 28 bytes/doc —
   before anything shuffles.
2. **Exact dedup among quality survivors** (the `dedup_exact`
   pattern): ``groupby(text_hash).min(doc_id)`` elects one keeper per
   identical text; a bucket-cogroup LEFT join (int-keyed, the
   dedup._bucket_attach layout) flags members.  64-bit text hashing
   follows the established exact-dedup precedent (the SQL oracle
   groups by exact text; hash collisions are the documented
   theoretical gap).
3. **Packing manifest over kept docs** (the `packing` layout): a
   hierarchical ordered prefix sum — bounded per-range groupby
   partials over KEPT word counts, driver cumsum broadcast,
   intra-range vectorized scan — assigns each kept doc its global
   token offset and sequence span; dropped docs carry ``-1``
   sentinels.

Output per doc: (doc_id, n_words, keep, tok_offset, first_seq,
last_seq).  Fully SQL-value-checked: the oracle composes the
gopher_quality + gopher_repetition oracles, a window MIN for the
keeper election, and a window cumsum for the offsets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..functions.hashing import hash64_batch
from .quality import curation_batch

DEFAULT_SEQ_LEN = 128
DEFAULT_RANGE_SIZE = 4096
_KEEPER_BUCKETS = 64


def curation_manifest(
    sf_dir: str,
    seq_len: int = DEFAULT_SEQ_LEN,
    range_size: int = DEFAULT_RANGE_SIZE,
) -> rd.Dataset:
    # -- 1. fused quality scan; text never leaves this stage --------
    def scan(df: pd.DataFrame) -> pd.DataFrame:
        flags = curation_batch(df[["doc_id", "text"]])
        h = hash64_batch(df["text"].fillna("").tolist()).view(np.int64)
        return pd.DataFrame(
            {
                "doc_id": flags["doc_id"].astype("int64"),
                "n_words": flags["n_words"].astype("int64"),
                "keep_quality": flags["keep"].astype(bool),
                "text_hash": h,
            }
        )

    docs = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(scan, batch_format="pandas")
        .materialize()
    )

    # -- 2. keeper election + LEFT bucket-cogroup flag --------------
    import pyarrow.compute as pc

    keepers = (
        docs.map_batches(
            lambda t: t.filter(pc.equal(t.column("keep_quality"), True)).select(
                ["text_hash", "doc_id"]
            ),
            batch_format="pyarrow",
        )
        .groupby("text_hash")
        .min("doc_id")
    )

    schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("side", pa.int8()),
            ("doc_id", pa.int64()),
            ("n_words", pa.int64()),
            ("keep_quality", pa.bool_()),
            ("text_hash", pa.int64()),
            ("keeper", pa.int64()),
        ]
    )

    def tag_left(t: pa.Table) -> pa.Table:
        h = t.column("text_hash").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(
                    (h % _KEEPER_BUCKETS).astype(np.int32), pa.int32()
                ),
                "side": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
                "doc_id": t.column("doc_id"),
                "n_words": t.column("n_words"),
                "keep_quality": t.column("keep_quality"),
                "text_hash": t.column("text_hash"),
                "keeper": pa.nulls(t.num_rows, pa.int64()),
            },
            schema=schema,
        )

    def tag_right(t: pa.Table) -> pa.Table:
        h = t.column("text_hash").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(
                    (h % _KEEPER_BUCKETS).astype(np.int32), pa.int32()
                ),
                "side": pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
                "doc_id": pa.nulls(t.num_rows, pa.int64()),
                "n_words": pa.nulls(t.num_rows, pa.int64()),
                "keep_quality": pa.nulls(t.num_rows, pa.bool_()),
                "text_hash": t.column("text_hash").cast(pa.int64()),
                "keeper": t.column("min(doc_id)").cast(pa.int64()),
            },
            schema=schema,
        )

    tagged = docs.map_batches(tag_left, batch_format="pyarrow").union(
        keepers.map_batches(tag_right, batch_format="pyarrow")
    )

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        lhs = g[g["side"] == 0]
        rhs = g[g["side"] == 1].drop_duplicates("text_hash")
        m = lhs.merge(
            rhs[["text_hash", "keeper"]],
            on="text_hash",
            how="left",
            suffixes=("_x", ""),
        )
        keep = m["keep_quality"].astype(bool) & (
            m["doc_id"] == m["keeper"].fillna(-1)
        )
        return pd.DataFrame(
            {
                "doc_id": m["doc_id"].astype("int64"),
                "n_words": m["n_words"].astype("int64"),
                "keep": keep.to_numpy(),
                "rng": (m["doc_id"].astype("int64") // range_size),
            }
        )

    from .dedup import _with_schema

    flagged = _with_schema(
        tagged.groupby("bucket").map_groups(flag, batch_format="pandas"),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_words", pa.int64()),
                ("keep", pa.bool_()),
                ("rng", pa.int64()),
            ]
        ),
    ).materialize()

    # -- 3. hierarchical prefix sum over kept word counts -----------
    def kept_partial(t: pa.Table) -> pa.Table:
        keep = t.column("keep").to_numpy(zero_copy_only=False)
        nw = t.column("n_words").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "rng": t.column("rng"),
                "kw": pa.array(np.where(keep, nw, 0), pa.int64()),
            }
        )

    per_range = (
        flagged.map_batches(kept_partial, batch_format="pyarrow")
        .groupby("rng")
        .sum("kw")
        .take_all()
    )
    per_range.sort(key=lambda r: r["rng"])
    offsets: dict[int, int] = {}
    acc = 0
    for r in per_range:
        offsets[r["rng"]] = acc
        acc += int(r["sum(kw)"])
    off_ref = ray.put(offsets)

    def scan_range(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(off_ref)[int(g["rng"].iloc[0])]
        g = g.sort_values("doc_id").reset_index(drop=True)
        keep = g["keep"].to_numpy()
        nw = np.where(keep, g["n_words"].to_numpy(), 0)
        off = base + np.concatenate([[0], np.cumsum(nw)[:-1]])
        first = np.where(keep, off // seq_len, -1)
        last = np.where(keep, (off + np.maximum(nw, 1) - 1) // seq_len, -1)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "n_words": g["n_words"].to_numpy(),
                "keep": keep.astype("int64"),
                "tok_offset": np.where(keep, off, -1).astype("int64"),
                "first_seq": first.astype("int64"),
                "last_seq": last.astype("int64"),
            }
        )

    return flagged.groupby("rng").map_groups(scan_range, batch_format="pandas")
