"""SemDeDup — semantic deduplication over an embedding column.

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", arXiv:2303.09540): k-means cluster
the (normalized) embeddings, then within each cluster drop every
vector whose cosine similarity to an already-kept vector exceeds
``1 - eps``.  Keep-priority follows the paper's best-performing
variant: within a duplicate group the example with the LOWEST cosine
similarity to its cluster centroid survives (it carries the most
marginal information for the cluster).

Ray-Data shape (the 100 TB plan):

1. **Centroids** — k-means (Lloyd, deterministic seed) over a strided
   whole-file sample (``similarity._strided_sample``; a head sample
   collapses on sorted corpora).  Centroids are tiny; broadcast via
   ``ray.put`` once.
2. **Assign** — one streaming ``map_batches`` over zero-copy Arrow
   assigns each vector its nearest-centroid id and centroid cosine.
3. **Within-cluster prune** — ``groupby("cluster").map_groups``: each
   group is one semantic cluster; greedy keep-scan in keep-priority
   order (centroid-cosine asc, vec_id asc) with an incremental numpy
   matmul against the kept set.  This is the paper's O(|cluster|^2)
   step — the partitioning assumption is that ``n_clusters`` scales
   with the corpus so a cluster (~N/K vectors × d floats) fits one
   worker's heap; at web scale K is chosen for ~10^4-10^5 vectors per
   cluster, exactly as in the paper (50k clusters for LAION-440M).

No counterpart in the reference repo (crawl4ai has only pairwise
``cosine_similarity``, crawl4ai/utils.py:3605); this is a
training-data-pipeline extension alongside the MinHash/SimHash/
embedding-LSH family in ``pipelines/dedup.py``.

Not SQL-expressible (iterative k-means) — ``queries()`` registers it
rows-only; tests pin exact equality against a single-process brute
twin (``semdedup_brute``) plus eps-limit properties.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .similarity import _kmeans, _normalize, _strided_sample, embedding_matrix


def _greedy_keep(mat_n: np.ndarray, order: np.ndarray, thresh: float) -> np.ndarray:
    """Greedy keep-mask over rows of ``mat_n`` visited in ``order``.

    A row is kept iff its max cosine to every previously-kept row is
    strictly below ``thresh``.  Incremental: each visited row is scored
    against the kept block in one matvec (O(kept·d)), so total work is
    O(n·kept·d) — the SemDeDup within-cluster scan.
    """
    n = len(order)
    if n == 0:
        return np.zeros(0, dtype=bool)
    d = mat_n.shape[1]
    keep_in_order = np.zeros(n, dtype=bool)
    buf = np.empty((16, d), dtype=np.float64)  # kept rows, doubling buffer
    n_kept = 0
    for pos, i in enumerate(order):
        v = mat_n[i]
        dup = n_kept > 0 and bool((buf[:n_kept] @ v).max() >= thresh)
        if not dup:
            if n_kept == buf.shape[0]:
                buf = np.vstack([buf, np.empty_like(buf)])
            buf[n_kept] = v
            n_kept += 1
            keep_in_order[pos] = True
    out = np.zeros(n, dtype=bool)
    out[order] = keep_in_order
    return out


def _prune_cluster(df: pd.DataFrame, thresh: float) -> pd.DataFrame:
    """Within one k-means cluster: keep-priority greedy cosine prune."""
    mat = np.vstack(df["embedding"].to_numpy()).astype(np.float64)
    mat_n = _normalize(mat)
    # keep-priority: lowest centroid-cosine first, vec_id tiebreak
    order = np.lexsort((df["vec_id"].to_numpy(), df["cent_sim"].to_numpy()))
    keep = _greedy_keep(mat_n, order, thresh)
    return pd.DataFrame(
        {
            "vec_id": df["vec_id"].to_numpy(),
            "cluster": df["cluster"].to_numpy(),
            "cent_sim": np.round(df["cent_sim"].to_numpy(), 6),
            "keep": keep,
        }
    )


def semdedup(
    sf_dir: str,
    eps: float = 0.05,
    n_clusters: int = 8,
    sample_rows: int = 2048,
    seed: int = 11,
) -> pd.DataFrame:
    """Distributed SemDeDup over ``embeddings.parquet``.

    Returns one row per vector: ``(vec_id, cluster, cent_sim, keep)``,
    sorted by vec_id.  ``keep=False`` rows are the semantic duplicates
    the paper would drop at this ``eps``.
    """
    thresh = 1.0 - eps
    path = os.path.join(sf_dir, "embeddings.parquet")
    sample = _strided_sample(path, sample_rows)
    cent = _normalize(_kmeans(sample, n_clusters, seed=seed))
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        mat_n = _normalize(embedding_matrix(batch))
        sims = mat_n @ c.T  # (n, K)
        cl = sims.argmax(axis=1)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "embedding": batch.column("embedding"),
                "cluster": pa.array(cl.astype(np.int64)),
                "cent_sim": pa.array(sims[np.arange(len(cl)), cl]),
            }
        )

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    assigned = ds.map_batches(assign, batch_format="pyarrow")
    out = (
        assigned.groupby("cluster")
        .map_groups(lambda df: _prune_cluster(df, thresh), batch_format="pandas")
        .to_pandas()
    )
    out["cluster"] = out["cluster"].astype("int64")
    out["keep"] = out["keep"].astype(bool)
    return out.sort_values("vec_id").reset_index(drop=True)


def semdedup_brute(
    sf_dir: str,
    eps: float = 0.05,
    n_clusters: int = 8,
    sample_rows: int = 2048,
    seed: int = 11,
) -> pd.DataFrame:
    """Single-process twin of :func:`semdedup` — same sample, same
    k-means, same greedy order — used by tests to pin the distributed
    path exactly (no Ray shuffle may change the answer)."""
    import pyarrow.parquet as pq

    thresh = 1.0 - eps
    path = os.path.join(sf_dir, "embeddings.parquet")
    sample = _strided_sample(path, sample_rows)
    cent = _normalize(_kmeans(sample, n_clusters, seed=seed))
    t = pq.read_table(path, columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    mat_n = _normalize(embedding_matrix(t))
    sims = mat_n @ cent.T
    cl = sims.argmax(axis=1)
    cent_sim = sims[np.arange(len(cl)), cl]
    frames = []
    for c in np.unique(cl):
        m = cl == c
        sub = mat_n[m]
        sub_ids = ids[m]
        sub_cs = cent_sim[m]
        order = np.lexsort((sub_ids, sub_cs))
        keep = _greedy_keep(sub, order, thresh)
        frames.append(
            pd.DataFrame(
                {
                    "vec_id": sub_ids,
                    "cluster": np.full(m.sum(), int(c), dtype=np.int64),
                    "cent_sim": np.round(sub_cs, 6),
                    "keep": keep,
                }
            )
        )
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values("vec_id").reset_index(drop=True)
