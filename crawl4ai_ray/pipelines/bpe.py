"""Distributed BPE tokenizer training over the documents table.

Byte-pair-encoding merge learning (Sennrich, Haddow & Birch 2016,
arXiv:1508.07909, public algorithm): start from characters, repeatedly
merge the most frequent adjacent symbol pair, record the merge table.
The trained merges are what a tokenizer ships; applying them segments
text into subword units.

Scale shape — the textbook split used by real tokenizer trainers
(sentencepiece / HF tokenizers): the CORPUS-scale work is a single
word-frequency count scan; merge learning then runs on the
word-TYPE table weighted by counts, which is vocabulary-sized, not
corpus-sized.

1. **Word-count scan**: ``map_batches`` partial counts ->
   repo-standard bucketed fold (``hash64(word) % B`` groupby, pandas
   sum in-group).  Optional ``min_word_count`` Zipf cut bounds the
   type table (at web scale the singleton tail is most of the types
   and contributes almost nothing to pair counts).
2. **Merge learning** on the collected type table: incremental
   pair-count index (Sennrich's reference trick — after a merge only
   words CONTAINING the merged pair update), deterministic tie-break
   ``(count desc, left asc, right asc)`` so training is reproducible
   across runs and cluster layouts.  Vocabulary-sized driver compute:
   the same boundary sentencepiece draws; at 10^8 word types apply
   ``min_word_count`` (or train on a counted sample) first.
3. **Segmentation** (``bpe_segment_batch``): merges broadcast once,
   applied greedily by merge rank per UNIQUE in-batch word with a
   memo cache — the GPT-2 application loop, vectorized across
   repeats via pandas map.

End-of-word marker: ``</w>`` appended to the final symbol of every
word (Sennrich §3.2) so merges cannot cross word boundaries and
word-final units stay distinct from word-internal ones.

Not SQL-expressible (iterative global argmax); pinned instead by a
differential test against an independent per-occurrence naive
implementation and by paper-example fixtures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from ..functions.hashing import hash64_batch
from ..functions.scaling import auto_buckets
from ..functions.wstokens import WS_TOKEN_RE

EOW = "</w>"


# -- 1. distributed word-frequency scan ------------------------------------


def word_counts(
    sf_dir: str,
    min_word_count: int = 1,
    buckets: int | None = None,
) -> pd.DataFrame:
    """Corpus word-frequency table (word, count), lowercased
    whitespace tokens, sorted by (count desc, word asc)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    if buckets is None:
        buckets = auto_buckets(ds.size_bytes())

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(WS_TOKEN_RE)
        words = toks.explode().dropna().to_numpy(dtype=object)
        if not len(words):
            return pd.DataFrame({"word": [], "count": []}).astype(
                {"word": str, "count": "int64"}
            )
        uniq, cnt = np.unique(words.astype(str), return_counts=True)
        out = pd.DataFrame({"word": uniq, "count": cnt.astype("int64")})
        out["bucket"] = (hash64_batch(list(out["word"])) % buckets).astype(
            np.int32
        )
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("word", as_index=False)["count"].sum()

    df = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    if df.empty:
        return pd.DataFrame({"word": [], "count": []}).astype(
            {"word": str, "count": "int64"}
        )
    df = df[df["count"] >= min_word_count]
    return (
        df.sort_values(["count", "word"], ascending=[False, True])
        .reset_index(drop=True)
        .astype({"count": "int64"})
    )


# -- 2. merge learning on the type table -----------------------------------


def _word_symbols(word: str) -> tuple:
    syms = list(word)
    syms[-1] = syms[-1] + EOW
    return tuple(syms)


def learn_bpe(
    wcounts: pd.DataFrame, n_merges: int, min_pair_count: int = 2
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` merges from a (word, count) table.
    Returns [(left, right, pair_count_at_merge_time), ...] in merge
    order.  Deterministic: argmax tie-break (count desc, left asc,
    right asc).  Incremental index: after each merge only words
    containing the merged pair recount."""
    words = [_word_symbols(w) for w in wcounts["word"]]
    counts = wcounts["count"].to_list()

    pair_counts: dict = {}
    pair_words: dict = {}  # pair -> set of word indices containing it

    def add_word(i: int, sign: int):
        syms, c = words[i], counts[i]
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + sign * c
            if sign > 0:
                pair_words.setdefault(p, set()).add(i)

    for i in range(len(words)):
        add_word(i, +1)

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = None
        for p, c in pair_counts.items():
            if c < min_pair_count:
                continue
            key = (-c, p[0], p[1])
            if best is None or key < best[0]:
                best = (key, p, c)
        if best is None:
            break
        _, (a, b), c = best
        merges.append((a, b, c))
        merged = a + b
        affected = list(pair_words.get((a, b), ()))
        for i in affected:
            syms = words[i]
            add_word(i, -1)
            out = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = tuple(out)
            add_word(i, +1)
        # drop exhausted entries so the argmax scan stays tight
        dead = [p for p, c in pair_counts.items() if c <= 0]
        for p in dead:
            del pair_counts[p]
            pair_words.pop(p, None)
    return merges


def bpe_train(
    sf_dir: str,
    n_merges: int = 200,
    min_word_count: int = 1,
    min_pair_count: int = 2,
) -> pd.DataFrame:
    """End-to-end training: distributed word counts -> merge table
    (rank, left, right, pair_count)."""
    wc = word_counts(sf_dir, min_word_count=min_word_count)
    merges = learn_bpe(wc, n_merges, min_pair_count)
    return pd.DataFrame(
        {
            "rank": np.arange(len(merges), dtype=np.int64),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
            "pair_count": np.array([m[2] for m in merges], dtype=np.int64),
        }
    )


# -- 3. segmentation with a learned merge table ----------------------------


def _segment_word(word: str, rank: dict) -> tuple:
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_r, best_j = None, -1
        for j in range(len(syms) - 1):
            r = rank.get((syms[j], syms[j + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_r, best_j = r, j
        if best_r is None:
            break
        syms[best_j : best_j + 2] = [syms[best_j] + syms[best_j + 1]]
    return tuple(syms)


class BpeSegmenter:
    """Actor-pool ``map_batches`` stage: merges broadcast via
    ``ray.put`` once, segmentation memoized per unique word across
    the actor's lifetime.  Emits per-doc subword statistics."""

    def __init__(self, merges_ref):
        merges = ray.get(merges_ref) if hasattr(merges_ref, "hex") else merges_ref
        self.rank = {
            (l, r): i for i, (l, r) in enumerate(zip(merges["left"], merges["right"]))
        }
        self.memo: dict = {}

    def _seg(self, w: str) -> tuple:
        got = self.memo.get(w)
        if got is None:
            got = self.memo[w] = _segment_word(w, self.rank)
        return got

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(WS_TOKEN_RE)
        n_words = toks.str.len().to_numpy(np.int64)
        n_sub = np.array(
            [sum(len(self._seg(w)) for w in ws) for ws in toks], dtype=np.int64
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_words": n_words,
                "n_subwords": n_sub,
            }
        )


def bpe_segment_counts(
    sf_dir: str, merges: pd.DataFrame, concurrency: int = 2
) -> pd.DataFrame:
    """Per-doc (n_words, n_subwords) under a learned merge table."""
    merges_ref = ray.put(
        {"left": merges["left"].to_list(), "right": merges["right"].to_list()}
    )
    df = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(
            BpeSegmenter,
            fn_constructor_args=(merges_ref,),
            concurrency=concurrency,
            batch_format="pandas",
        )
        .to_pandas()
    )
    return df.sort_values("doc_id").reset_index(drop=True)
