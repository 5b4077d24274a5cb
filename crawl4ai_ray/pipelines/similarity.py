"""Similarity search over an embedding column (``list<float>``).

Three tiers, all expressed as ``map_batches`` over the embeddings
Dataset with the query side broadcast via ``ray.put``:

- **Brute-force cosine top-k** — the exact baseline. Per-batch numpy
  matmul against a broadcast (normalized) query matrix; per-batch
  partial top-k so only ``k`` rows per block reach the driver-side
  merge. O(N·d) per query, streaming, no shuffle.
- **Hyperplane-LSH top-k** — the scale path. A seeded random
  hyperplane matrix (broadcast once) maps every vector to a
  ``n_tables``-way bucket signature; only vectors sharing a bucket
  with the query (in any table, with 1-bit multiprobe) are scored.
  At 100 TB the bucket column is written alongside the embeddings at
  ingest, so a query touches only matching row groups.
- **IVF top-k** — k-means coarse quantizer trained on a driver-side
  sample (deterministic seed), centroids broadcast; each batch
  assigns its vectors to the nearest centroid and scores only those
  in the ``nprobe`` centroids closest to the query.

No counterpart in the reference (crawl4ai has only
``cosine_similarity`` at crawl4ai/utils.py:3605 used pairwise); these
are the training-data-pipeline extensions.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def embedding_matrix(t: pa.Table, column: str = "embedding") -> np.ndarray:
    """Zero-copy-ish Arrow ``list<float>`` -> (n, d) float64 matrix.

    Uses the flattened values buffer directly (no per-row to_pylist);
    requires fixed-length lists, which the embeddings table has.
    """
    col = t.column(column).combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0)
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    values = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    d = len(values) // n
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    if not np.all(np.diff(offsets) == d):
        raise ValueError("ragged embedding column")
    return values.reshape(n, d)


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.where(norms == 0, 1, norms)


def _query_vector(emb_path: str, query_id: int) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(emb_path, columns=["vec_id", "embedding"]).filter(
        pc.equal(pc.field("vec_id"), query_id)
    )
    if t.num_rows == 0:
        raise KeyError(f"vec_id {query_id} not in {emb_path}")
    q = embedding_matrix(t)[0]
    n = np.linalg.norm(q)
    return q / (n if n else 1)


def _merge_topk(parts: list[pa.Table], k: int) -> pd.DataFrame:
    df = pa.concat_tables(parts).to_pandas()
    df = df.sort_values(["cos_sim", "vec_id"], ascending=[False, True]).head(k)
    return df.reset_index(drop=True)


# -- brute force -------------------------------------------------------------


def brute_topk(sf_dir: str, query_id: int = 0, k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k: per-batch matmul + partial top-k."""
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qn = ray.put(_query_vector(emb_path, query_id))

    def score(t: pa.Table) -> pa.Table:
        q = ray.get(qn)
        mat = _normalize(embedding_matrix(t))
        sims = mat @ q
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        if len(sims) > k:
            keep = np.argpartition(-sims, k)[:k]
        else:
            keep = np.arange(len(sims))
        return pa.table(
            {
                "vec_id": pa.array(ids[keep], pa.int64()),
                "cos_sim": pa.array(sims[keep], pa.float64()),
            }
        )

    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    parts = list(
        ds.map_batches(score, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    return _merge_topk(parts, k)


# -- hyperplane LSH ----------------------------------------------------------


def _hyperplanes(dim: int, n_tables: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_planes, dim))


def _signatures(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, d) x (T, P, d) -> (n, T) uint32 bucket codes."""
    bits = np.einsum("nd,tpd->ntp", mat, planes) >= 0
    weights = (1 << np.arange(planes.shape[1])).astype(np.uint32)
    return (bits.astype(np.uint32) * weights[None, None, :]).sum(axis=2)


def lsh_topk(
    sf_dir: str,
    query_id: int = 0,
    k: int = 10,
    n_tables: int = 16,
    n_planes: int = 8,
    multiprobe: bool = True,
    seed: int = 7,
) -> pd.DataFrame:
    """Approximate cosine top-k via hyperplane LSH bucket filtering.

    A vector is a candidate if it shares the query's bucket in ANY
    table; with ``multiprobe`` the query also probes every 1-bit
    neighboring bucket per table (recall boost at ~P× probe cost,
    no extra data movement).
    """
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    q = _query_vector(emb_path, query_id)
    planes = _hyperplanes(len(q), n_tables, n_planes, seed)
    qsig = _signatures(q[None, :], planes)[0]  # (T,)
    probe_sets = []
    for t in range(n_tables):
        s = {int(qsig[t])}
        if multiprobe:
            s.update(int(qsig[t]) ^ (1 << b) for b in range(n_planes))
        probe_sets.append(np.fromiter(s, dtype=np.uint32))
    shared = ray.put((q, planes, probe_sets))

    def score(t: pa.Table) -> pa.Table:
        qv, pl, probes = ray.get(shared)
        mat = embedding_matrix(t)
        sigs = _signatures(mat, pl)  # (n, T)
        cand = np.zeros(len(mat), dtype=bool)
        for ti in range(sigs.shape[1]):
            cand |= np.isin(sigs[:, ti], probes[ti])
        if not cand.any():
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        sims = _normalize(mat[cand]) @ qv
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)[cand]
        if len(sims) > k:
            keep = np.argpartition(-sims, k)[:k]
            ids, sims = ids[keep], sims[keep]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cos_sim": pa.array(sims, pa.float64()),
            }
        )

    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    parts = list(
        ds.map_batches(score, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    return _merge_topk(parts, k)


# -- IVF ---------------------------------------------------------------------


def _kmeans(sample: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 11):
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    cent = sample[np.sort(idx)].copy()
    for _ in range(iters):
        d2 = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    return cent


def ivf_topk(
    sf_dir: str,
    query_id: int = 0,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 8,
    sample_rows: int = 2048,
    seed: int = 11,
) -> pd.DataFrame:
    """Approximate cosine top-k via an IVF coarse quantizer.

    Centroids come from k-means over a head sample (deterministic
    seed) and are broadcast; each batch scores only vectors assigned
    to the ``nprobe`` centroids nearest the query. At scale the
    assignment is a partition column written at ingest, so probing is
    row-group pruning instead of a full scan. Default nprobe is high
    (half the cells) because the test corpora are tiny — at real
    corpus sizes recall concentrates and nprobe << n_centroids.
    """
    import pyarrow.parquet as pq

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    q = _query_vector(emb_path, query_id)

    f = pq.ParquetFile(emb_path)
    head = next(f.iter_batches(batch_size=sample_rows, columns=["embedding"]))
    sample = _normalize(embedding_matrix(pa.Table.from_batches([head])))
    cent = _kmeans(sample, n_centroids, seed=seed)
    qd = ((cent - q[None, :]) ** 2).sum(axis=1)
    probed = np.sort(np.argsort(qd)[:nprobe])
    shared = ray.put((q, cent, probed))

    def score(t: pa.Table) -> pa.Table:
        qv, c, pr = ray.get(shared)
        mat = _normalize(embedding_matrix(t))
        d2 = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        cand = np.isin(assign, pr)
        if not cand.any():
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        sims = mat[cand] @ qv
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)[cand]
        if len(sims) > k:
            keep = np.argpartition(-sims, k)[:k]
            ids, sims = ids[keep], sims[keep]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cos_sim": pa.array(sims, pa.float64()),
            }
        )

    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    parts = list(
        ds.map_batches(score, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    return _merge_topk(parts, k)


def recall_at_k(approx: pd.DataFrame, exact: pd.DataFrame) -> float:
    a, e = set(approx["vec_id"]), set(exact["vec_id"])
    return len(a & e) / max(1, len(e))
