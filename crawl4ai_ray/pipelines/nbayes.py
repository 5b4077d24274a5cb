"""Distributed multinomial Naive Bayes text classification.

Model-based document classification is the role fastText/logreg
filters play in large-scale curation (CCNet's LM filter and DCLM's
fastText quality classifier are the published examples; this repo's
lm_perplexity query covers the LM side).  Naive Bayes is the member
of that family whose TRAINING is pure counting — which makes the
whole train-then-predict pipeline an exact-parity distributed
aggregation, SQL-checkable end to end, rather than an SGD loop with
float-order drift.

Beyond-reference extension (the reference has no trained classifier;
its language/quality signals are heuristic).  NOTE: the synthetic
corpus draws text independently of the ``lang`` label, so prediction
accuracy is chance-level BY CONSTRUCTION — the query's value is the
verified machinery (trained counts, smoothing, argmax all match the
SQL oracle exactly), not the accuracy number.

Ray-Data shape (the 100 TB plan):

1. **Train = aggregation.**  One streaming scan of ``documents``;
   per batch a vectorized pandas explode counts (label, token) pairs
   — the per-batch PARTIAL (combiner) — then ONE bounded
   ``hash(token) % B`` bucket fold merges partials (the repo's
   standard route around Ray's many-distinct-key groupby cliff).
   The finished model is O(vocab x labels) and collects to the
   driver; at 100 TB the token space is capped by feature hashing
   (``hash(token) % 2^20``) so the model stays MBs regardless of
   corpus size.
2. **Predict = broadcast + map.**  The model ships once via
   ``ray.put`` (log-likelihood matrix + vocab index); one streaming
   scan scores each doc vectorized (bincount over token indices,
   matrix product against the log-lik matrix) and argmaxes.  No
   shuffle at all in the predict pass.

Add-one (Laplace) smoothing; unseen tokens score ``1 / (t_l + V)``;
argmax ties break to the lexicographically smallest label — all
mirrored literally in the DuckDB oracle (oracles.py nb_predict_lang).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.scaling import auto_buckets, input_nbytes

_TOKEN_RE = re.compile(r"[a-z]+")


def doc_tokens(text: str) -> list[str]:
    """Lowercase a-z runs — equals DuckDB
    ``regexp_split_to_array(lower(text), '[^a-z]+')`` minus empties."""
    return _TOKEN_RE.findall((text or "").lower())


def nb_train(
    sf_dir: str,
    label_col: str = "lang",
    text_col: str = "text",
    buckets: int | None = None,
):
    """Count-train NB over ``documents``: returns (labels sorted,
    priors, counts df (label, token, c), label token totals, V)."""
    path = os.path.join(sf_dir, "documents.parquet")
    if buckets is None:
        buckets = auto_buckets(input_nbytes(path, table=None))

    ds = rd.read_parquet(path, columns=[label_col, text_col])

    empty = pd.DataFrame(
        {
            "label": pd.Series([], dtype=object),
            "token": pd.Series([], dtype=object),
            "c": pd.Series([], dtype="int64"),
            "bucket": pd.Series([], dtype="int64"),
        }
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return empty.copy()
        toks = batch[text_col].fillna("").str.lower().str.findall(_TOKEN_RE)
        ex = pd.DataFrame(
            {
                "label": batch[label_col].repeat(toks.str.len()).to_numpy(),
                "token": np.concatenate([np.array(t, dtype=object) for t in toks]),
            }
        )
        out = ex.groupby(["label", "token"], sort=True).size().reset_index(name="c")
        # per-label doc counts ride along as sentinel token "" (the
        # tokenizer never emits an empty string) — saves a second
        # full scan for the priors
        docs = (
            batch.groupby(label_col, sort=True)
            .size()
            .reset_index(name="c")
            .rename(columns={label_col: "label"})
        )
        docs["token"] = ""
        out = pd.concat([out, docs[["label", "token", "c"]]], ignore_index=True)
        out["bucket"] = _tok_bucket(out["token"], buckets)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["label", "token"], sort=True)["c"].sum().reset_index()
        )

    merged = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    pri = merged[merged["token"] == ""]
    counts = merged[merged["token"] != ""].reset_index(drop=True)
    labels = sorted(pri["label"])
    n_docs = int(pri["c"].sum())
    priors = {lab: int(n) for lab, n in zip(pri["label"], pri["c"])}
    totals = counts.groupby("label")["c"].sum().to_dict()
    vocab = sorted(counts["token"].unique())
    return labels, priors, n_docs, counts, totals, vocab


def _tok_bucket(tokens: pd.Series, buckets: int) -> np.ndarray:
    from ..functions.hashing import hash64_batch

    if len(tokens) == 0:
        return np.array([], dtype=np.int64)
    return (hash64_batch(tokens.tolist()) % np.uint64(buckets)).astype(np.int64)


def nb_predict(
    sf_dir: str,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int | None = None,
) -> pd.DataFrame:
    """Train on the labeled corpus, predict every doc: (doc_id,
    pred_{label_col}).  Exact twin of oracles.py's closed-form SQL."""
    import ray

    labels, priors, n_docs, counts, totals, vocab = nb_train(
        sf_dir, label_col=label_col, text_col=text_col, buckets=buckets
    )
    V = len(vocab)
    tok_ix = {t: i for i, t in enumerate(vocab)}
    L = len(labels)
    # loglik[l, v] = ln((count + 1) / (total_l + V)); column V is the
    # shared unseen-token slot per label
    loglik = np.zeros((L, V + 1), dtype=np.float64)
    for li, lab in enumerate(labels):
        t_l = float(totals.get(lab, 0))
        loglik[li, :] = -np.log(t_l + V)  # count 0 -> ln(1/(t+V))
    for lab, tok, c in zip(counts["label"], counts["token"], counts["c"]):
        li = labels.index(lab)
        loglik[li, tok_ix[tok]] = np.log(
            (float(c) + 1.0) / (float(totals[lab]) + V)
        )
    logprior = np.array(
        [np.log(priors[lab] / float(n_docs)) for lab in labels], np.float64
    )
    model_ref = ray.put((labels, tok_ix, loglik, logprior, V))

    path = os.path.join(sf_dir, "documents.parquet")
    ds = rd.read_parquet(path, columns=[id_col, text_col])

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        labels, tok_ix, loglik, logprior, V = ray.get(model_ref)
        n = len(batch)
        if n == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    f"pred_{label_col}": pd.Series([], dtype=object),
                }
            )
        toks = batch[text_col].fillna("").str.lower().str.findall(_TOKEN_RE)
        lens = toks.str.len().to_numpy()
        doc_ix = np.repeat(np.arange(n), lens)
        flat = pd.Series(
            np.concatenate([np.array(t, dtype=object) for t in toks])
            if lens.sum()
            else np.array([], dtype=object)
        )
        tok_idx = flat.map(tok_ix).fillna(V).to_numpy().astype(np.int64)
        # scores[i, l] = logprior[l] + sum over doc i's tokens of
        # loglik[l, tok]; fully vectorized scatter-add
        scores = np.tile(logprior, (n, 1))
        np.add.at(scores, doc_ix, loglik[:, tok_idx].T)
        preds = [labels[i] for i in np.argmax(scores, axis=1)]  # ties -> smallest label
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy(), f"pred_{label_col}": preds}
        )

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    return out.sort_values(id_col).reset_index(drop=True)
