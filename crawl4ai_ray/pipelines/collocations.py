"""Bigram collocation mining (PMI) over the documents table.

Corpus analysis a training-data pipeline runs when building
tokenizer vocabularies / multi-word expressions: count adjacent
token pairs corpus-wide, attach each pair's constituent unigram
counts, and score pointwise mutual information

    pmi(w1, w2) = ln( (c12 / B) / ((c1 / T) * (c2 / T)) )

with T = total tokens, B = total bigrams (both corpus-wide).

Scale shape — one tokenizing scan, vocabulary-sized shuffles only:

1. **Count scan** — ``map_batches`` emits per-batch PARTIAL
   ``(kind, w1, w2, count)`` rows: one per distinct in-batch unigram
   (kind='u'), one per distinct in-batch bigram (kind='b';
   doc-boundary-aware, vectorized shift over the exploded token
   array), plus sentinel totals. One multi-key
   ``groupby(["kind","w1","w2"]).sum`` folds them — the shuffle
   moves one row per distinct term per batch, never per token.
2. **Support filter** — bigrams below ``min_count`` drop BEFORE any
   join (the classic Zipf cut: the long tail is most of the rows).
3. **Count attach** — constituent unigram counts join in via two
   bucketed string-key cogroups (``_attach_word_count``, the
   dedup._bucket_attach pattern: tag bucket = hash64(word) % K,
   union under one schema, shuffle once, exact pandas merge on the
   WORD inside each bucket — the hash only routes, so hash
   collisions cannot mis-join). The unigram table is never
   broadcast: web-scale vocabularies don't fit a closure.
4. **Score** — pmi arithmetic per batch; output
   ``(w1, w2, pair_count, pmi)`` for every surviving bigram,
   deterministically sorted by (w1, w2) — no top-k boundary in the
   oracle-checked surface; :func:`collocations_topk` is the
   driver-bounded convenience on top.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions.hashing import hash64_batch
from ..functions.scaling import auto_buckets
from ..functions.wstokens import WS_TOKEN_RE
from .dedup import _with_schema

# Sentinel w1 values for the corpus-total rows.  They live under
# kind='s' so they can never collide with real unigram ('u') /
# bigram ('b') rows — and they MUST be plain ASCII: Ray's sort-based
# groupby fails to merge string keys containing NUL bytes (observed
# on ray 2.49: 16 per-batch "\x00T" sentinel rows survived
# groupby.sum un-collapsed while ordinary words grouped fine).
_SENT_T = "T"  # total-token count row
_SENT_B = "B"  # total-bigram count row


def _tokenize(texts: pd.Series) -> pd.Series:
    return texts.fillna("").str.lower().str.findall(WS_TOKEN_RE)


def _count_batch(df: pd.DataFrame) -> pd.DataFrame:
    toks = _tokenize(df["text"]).reset_index(drop=True)
    ex = toks.explode().dropna()
    words = ex.to_numpy(dtype=object)
    docs = ex.index.to_numpy()

    uni = pd.Series(words).groupby(words, sort=False).size()

    if len(words) > 1:
        same_doc = docs[:-1] == docs[1:]
        w1, w2 = words[:-1][same_doc], words[1:][same_doc]
        key = pd.MultiIndex.from_arrays([w1, w2])
        big = pd.Series(np.ones(len(w1)), index=key).groupby(level=[0, 1]).size()
    else:
        big = pd.Series(dtype="int64")

    n_big = int(big.sum()) if len(big) else 0
    return pd.DataFrame(
        {
            "kind": ["u"] * len(uni) + ["b"] * len(big) + ["s", "s"],
            "w1": list(uni.index)
            + [k[0] for k in big.index]
            + [_SENT_T, _SENT_B],
            "w2": [""] * len(uni) + [k[1] for k in big.index] + ["", ""],
            "count": list(uni.values) + list(big.values) + [len(words), n_big],
        }
    ).astype({"kind": str, "w1": str, "w2": str, "count": "int64"})


def _attach_word_count(
    ds: rd.Dataset,
    key_col: str,
    carry_cols: list,
    unigrams: rd.Dataset,
    val_out: str,
    buckets: int,
) -> rd.Dataset:
    """Bucket-cogroup inner join attaching ``sum(count)`` of
    ``unigrams`` (columns word, sum(count)) onto ``ds[key_col]``
    (string words). hash64 routes buckets; the merge itself is on the
    exact word string."""
    carry_names = [c for c, _ in carry_cols]
    schema = pa.schema(
        [("bucket", pa.int32()), ("side", pa.int8())]
        + [(c, t) for c, t in carry_cols]
        + [("_val", pa.int64())]
    )

    def _tag(side: int, word_col: str, val_col):
        def _fn(t: pa.Table) -> pa.Table:
            words = t.column(word_col).to_pylist()
            b = (hash64_batch(words) % buckets).astype(np.int32)
            cols = {
                "bucket": pa.array(b, pa.int32()),
                "side": pa.array(np.full(t.num_rows, side, np.int8), pa.int8()),
            }
            for c, typ in carry_cols:
                if side == 0:
                    cols[c] = t.column(c).cast(typ)
                else:
                    cols[c] = (
                        t.column(word_col).cast(typ)
                        if c == key_col
                        else pa.nulls(t.num_rows, typ)
                    )
            cols["_val"] = (
                t.column(val_col).cast(pa.int64())
                if val_col
                else pa.nulls(t.num_rows, pa.int64())
            )
            return pa.table(cols, schema=schema)

        return _fn

    tagged = ds.map_batches(_tag(0, key_col, None), batch_format="pyarrow").union(
        unigrams.map_batches(_tag(1, "word", "sum(count)"), batch_format="pyarrow")
    )

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        lhs, rhs = g[g["side"] == 0], g[g["side"] == 1]
        return lhs[carry_names].merge(
            rhs[[key_col, "_val"]]
            .drop_duplicates(key_col)
            .rename(columns={"_val": val_out}),
            on=key_col,
            how="inner",
        )

    out_schema = pa.schema(
        [(c, t) for c, t in carry_cols] + [(val_out, pa.int64())]
    )
    return _with_schema(
        tagged.groupby("bucket").map_groups(_merge, batch_format="pandas"),
        out_schema,
    )


def collocations_dataset(
    sf_dir: str, min_count: int = 2, buckets: int | None = None
) -> rd.Dataset:
    """All bigrams with corpus count >= ``min_count``, scored with
    PMI; columns (w1, w2, pair_count, pmi)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    if buckets is None:
        buckets = auto_buckets(ds.size_bytes())
    # Fold the per-batch partial rows with the repo-standard BUCKETED
    # groupby (hash64(w1,w2) % buckets -> pandas sum inside each
    # group): a direct 3-string-key ``groupby(["kind","w1","w2"])``
    # hits Ray's many-distinct-key sort-reduce cliff (measured 9 s vs
    # ~1 s at sf0.1/32cpus for identical output).
    def _add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        key = (df["w1"] + "\x1f" + df["w2"]).tolist()
        df = df.copy()
        df["bucket"] = (hash64_batch(key) % buckets).astype(np.int32)
        return df

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["kind", "w1", "w2"], as_index=False)["count"].sum()
        return out.rename(columns={"count": "sum(count)"})

    stats = _with_schema(
        ds.map_batches(_count_batch, batch_format="pandas")
        .map_batches(_add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_fold, batch_format="pandas"),
        pa.schema(
            [
                ("kind", pa.string()),
                ("w1", pa.string()),
                ("w2", pa.string()),
                ("sum(count)", pa.int64()),
            ]
        ),
    ).materialize()  # term-vocabulary sized; reused below

    # All three carve-outs are vectorized Arrow masks — a row-wise
    # ``Dataset.filter(lambda)`` here costs seconds of per-row Python
    # over the (vocabulary x batches)-sized stats table.
    import pyarrow.compute as pc

    def _take_sent(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("kind"), "s"))

    def _take_uni(t: pa.Table) -> pa.Table:
        return (
            t.filter(pc.equal(t.column("kind"), "u"))
            .select(["w1", "sum(count)"])
            .rename_columns(["word", "sum(count)"])
        )

    def _take_big(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(t.column("kind"), "b"),
            pc.greater_equal(t.column("sum(count)"), min_count),
        )
        return (
            t.filter(mask)
            .select(["w1", "w2", "sum(count)"])
            .rename_columns(["w1", "w2", "pair_count"])
        )

    sent = {
        r["w1"]: r["sum(count)"]
        for r in stats.map_batches(_take_sent, batch_format="pyarrow").take_all()
    }
    t_tokens, b_total = int(sent[_SENT_T]), int(sent[_SENT_B])

    uni = stats.map_batches(_take_uni, batch_format="pyarrow")
    big = stats.map_batches(_take_big, batch_format="pyarrow")

    big = _attach_word_count(
        big,
        "w1",
        [("w1", pa.string()), ("w2", pa.string()), ("pair_count", pa.int64())],
        uni,
        "c1",
        buckets,
    )
    big = _attach_word_count(
        big,
        "w2",
        [
            ("w1", pa.string()),
            ("w2", pa.string()),
            ("pair_count", pa.int64()),
            ("c1", pa.int64()),
        ],
        uni,
        "c2",
        buckets,
    )

    def _score(t: pa.Table) -> pa.Table:
        c12 = t.column("pair_count").to_numpy(zero_copy_only=False).astype(float)
        c1 = t.column("c1").to_numpy(zero_copy_only=False).astype(float)
        c2 = t.column("c2").to_numpy(zero_copy_only=False).astype(float)
        pmi = (
            np.log(c12)
            - np.log(b_total)
            + 2.0 * np.log(t_tokens)
            - np.log(c1)
            - np.log(c2)
        )
        return pa.table(
            {
                "w1": t.column("w1"),
                "w2": t.column("w2"),
                "pair_count": t.column("pair_count"),
                "pmi": pa.array(pmi, pa.float64()),
            }
        )

    return big.map_batches(_score, batch_format="pyarrow")


def collocations_topk(sf_dir: str, k: int = 20, min_count: int = 2) -> pd.DataFrame:
    """Driver-bounded convenience: top-k bigrams by
    (pmi desc, w1, w2) — the final sort runs over the already
    support-filtered (vocabulary-sized) collocation set."""
    df = collocations_dataset(sf_dir, min_count=min_count).to_pandas()
    return (
        df.sort_values(["pmi", "w1", "w2"], ascending=[False, True, True])
        .head(k)
        .reset_index(drop=True)
    )
