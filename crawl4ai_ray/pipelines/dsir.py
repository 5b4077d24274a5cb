"""DSIR-style importance resampling over the documents table.

Data Selection via Importance Resampling (Xie et al., 2023,
arXiv:2302.03169, public method): score every raw document by how
much more likely its hashed-n-gram bag is under a TARGET corpus
distribution than under the RAW corpus distribution, then keep the
top-k by importance weight.  Here the target split is the corpus'
``lang == target_lang`` documents — the classic "select web text
that looks like the curated subset" setup.

Features (paper §3): word unigrams + word bigrams, each hashed into
``n_buckets`` counting buckets.  Bucket models are add-alpha
smoothed unigram distributions over buckets:

    p_b = (cnt_target[b] + alpha) / (tot_target + alpha * B)
    q_b = (cnt_raw[b]    + alpha) / (tot_raw    + alpha * B)
    log w(doc) = sum over the doc's feature OCCURRENCES of
                 (ln p_b - ln q_b)

Hashing is md5-derived (``int(md5(g)[:16], 16) % B`` — the repo's
established oracle-parity digest, pipelines/dedup.py
_md5_word_hashes) so the DuckDB oracle recomputes identical buckets
with ``('0x' || substr(md5(g),1,16))::UBIGINT % B``.  A production
deployment would swap in a cheaper 64-bit hash; md5 here buys an
end-to-end SQL value check of the whole chain.

Scale shape — two streaming scans, a B-sized broadcast between:

1. **Fit scan**: ``map_batches`` emits per-batch partial
   ``(bucket, cnt_raw, cnt_tgt)`` rows (nonzero buckets only, via
   ``np.bincount``), folded by a bounded ``groupby(bucket)`` —
   at most B distinct keys ever shuffle.
2. **Log-ratio broadcast**: the B-sized ``ln p - ln q`` vector is
   ``ray.put`` once and read per worker — never re-shipped per batch.
3. **Score scan**: per batch, features re-derive (no corpus-sized
   intermediate materializes), per-doc ``np.add.at`` folds
   ``ratio[bucket]`` into (n_feats, logw).
4. **Selection**: per-batch partial top-k of (logw, doc_id)
   candidates -> driver merges k rows -> the k-th (logw, doc_id)
   pair broadcasts as the selection threshold; a final vectorized
   flag pass marks ``selected``.  Only k rows per block reach the
   driver.  Ranking is over logw ROUNDED to 6 decimals (both here
   and in the oracle) so float summation order can't flip ranks at
   the boundary.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from ..functions.wstokens import WS_TOKEN_RE

DEFAULT_BUCKETS = 256
DEFAULT_ALPHA = 1.0
DEFAULT_TARGET_LANG = "en"
DEFAULT_K = 100


def _doc_features(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, feature_string) arrays of every unigram + bigram
    OCCURRENCE in the batch (positional doc index, doc-boundary-aware
    bigrams)."""
    toks = texts.fillna("").str.lower().str.findall(WS_TOKEN_RE)
    toks = toks.reset_index(drop=True)
    ex = toks.explode().dropna()
    words = ex.to_numpy(dtype=object)
    docs = ex.index.to_numpy()
    if len(words) > 1:
        same = docs[:-1] == docs[1:]
        big = np.char.add(
            np.char.add(words[:-1][same].astype(str), " "),
            words[1:][same].astype(str),
        ).astype(object)
        bdocs = docs[:-1][same]
        feats = np.concatenate([words, big])
        fdocs = np.concatenate([docs, bdocs])
    else:
        feats, fdocs = words, docs
    return fdocs, feats


def _hash_buckets(feats: np.ndarray, n_buckets: int) -> np.ndarray:
    """md5[:16]-derived bucket per feature occurrence; hashes computed
    once per DISTINCT in-batch feature."""
    if len(feats) == 0:
        return np.zeros(0, dtype=np.int64)
    uniq, inv = np.unique(feats.astype(str), return_inverse=True)
    hb = np.array(
        [
            int(hashlib.md5(g.encode()).hexdigest()[:16], 16) % n_buckets
            for g in uniq
        ],
        dtype=np.int64,
    )
    return hb[inv]


def _fit_counts(
    sf_dir: str, target_lang: str, n_buckets: int
) -> tuple[np.ndarray, np.ndarray]:
    """One scan -> (raw bucket counts, target bucket counts), each a
    dense length-B vector."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        fdocs, feats = _doc_features(df["text"])
        b = _hash_buckets(feats, n_buckets)
        is_tgt = (df["lang"] == target_lang).to_numpy()
        raw = np.bincount(b, minlength=n_buckets)
        tgt = np.bincount(b[is_tgt[fdocs]], minlength=n_buckets)
        nz = np.nonzero(raw)[0]
        return pd.DataFrame(
            {
                "bucket": nz.astype(np.int64),
                "cnt_raw": raw[nz].astype(np.int64),
                "cnt_tgt": tgt[nz].astype(np.int64),
            }
        )

    folded = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text", "lang"])
        .map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .sum(["cnt_raw", "cnt_tgt"])
        .take_all()
    )
    raw = np.zeros(n_buckets, dtype=np.int64)
    tgt = np.zeros(n_buckets, dtype=np.int64)
    for r in folded:
        raw[r["bucket"]] = r["sum(cnt_raw)"]
        tgt[r["bucket"]] = r["sum(cnt_tgt)"]
    return raw, tgt


def dsir_scores(
    sf_dir: str,
    target_lang: str = DEFAULT_TARGET_LANG,
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = DEFAULT_ALPHA,
) -> rd.Dataset:
    """Per-doc importance weights: (doc_id, n_feats, logw), logw
    rounded to 6 decimals (rank-stable vs the SQL oracle)."""
    raw, tgt = _fit_counts(sf_dir, target_lang, n_buckets)
    lp = np.log(tgt + alpha) - np.log(tgt.sum() + alpha * n_buckets)
    lq = np.log(raw + alpha) - np.log(raw.sum() + alpha * n_buckets)
    ratio_ref = ray.put(lp - lq)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ratio = ray.get(ratio_ref)
        fdocs, feats = _doc_features(df["text"])
        b = _hash_buckets(feats, n_buckets)
        logw = np.zeros(len(df))
        nf = np.zeros(len(df), dtype=np.int64)
        if len(b):
            np.add.at(logw, fdocs, ratio[b])
            np.add.at(nf, fdocs, 1)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_feats": nf,
                "logw": np.round(logw, 6),
            }
        )

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(score, batch_format="pandas")


def dsir_select(
    sf_dir: str,
    k: int = DEFAULT_K,
    target_lang: str = DEFAULT_TARGET_LANG,
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = DEFAULT_ALPHA,
) -> rd.Dataset:
    """Scores + a ``selected`` flag for the k best docs by
    (logw desc, doc_id asc).  The threshold is found from per-batch
    partial top-k candidates (k rows per block to the driver), then
    broadcast into a vectorized flag pass — no global sort."""
    scores = dsir_scores(sf_dir, target_lang, n_buckets, alpha).materialize()

    def topk_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["logw", "doc_id"], ascending=[False, True]
        ).head(k)[["logw", "doc_id"]]

    cand = scores.map_batches(topk_partial, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["logw", "doc_id"], ascending=[False, True]).head(k)
    if len(cand) == 0:
        thr_w, thr_d = np.inf, -1
    else:
        thr_w = float(cand["logw"].iloc[-1])
        thr_d = int(cand["doc_id"].iloc[-1])

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        w = df["logw"].to_numpy()
        d = df["doc_id"].to_numpy()
        sel = (w > thr_w) | ((w == thr_w) & (d <= thr_d))
        out = df.copy()
        out["selected"] = sel.astype(np.int64)
        return out

    return scores.map_batches(flag, batch_format="pandas")
