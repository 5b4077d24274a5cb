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


def _strided_sample(emb_path: str, sample_rows: int) -> np.ndarray:
    """Quantizer training sample spread across the WHOLE file.

    A head sample is NOT representative on a sorted corpus (url-,
    time- or language-sorted parquet puts one stratum first, centroids
    collapse onto it and recall for the rest of the corpus dies).
    Instead: visit row groups at an even stride across the file, and
    stride rows WITHIN each visited group, so the sample covers every
    key range at deterministic positions — no RNG, resumable, and at
    100 TB it reads only ~sample_rows/128 row groups of one column.
    """
    import pyarrow.parquet as pq

    f = pq.ParquetFile(emb_path)
    n_rg = f.metadata.num_row_groups
    n_visit = int(min(n_rg, max(1, sample_rows // 128)))
    rg_ids = np.unique(np.linspace(0, n_rg - 1, n_visit).round().astype(int))
    per_rg = -(-sample_rows // len(rg_ids))  # ceil
    mats = []
    for rg in rg_ids:
        m = embedding_matrix(f.read_row_group(int(rg), columns=["embedding"]))
        stride = max(1, len(m) // per_rg)
        mats.append(m[::stride][:per_rg])
    return _normalize(np.concatenate(mats, axis=0)[:sample_rows])


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

    Centroids come from k-means over a strided whole-file sample
    (``_strided_sample``, deterministic) and are broadcast; each batch
    scores only vectors assigned to the ``nprobe`` centroids nearest
    the query. At scale the assignment is a partition column written
    at ingest, so probing is row-group pruning instead of a full scan.
    Default nprobe is high (half the cells) because the test corpora
    are tiny — at real corpus sizes recall concentrates and
    nprobe << n_centroids.
    """
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    q = _query_vector(emb_path, query_id)

    sample = _strided_sample(emb_path, sample_rows)
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


# -- batch of queries ---------------------------------------------------------


def _query_matrix(emb_path: str, query_ids: list[int]) -> np.ndarray:
    """(m, d) normalized query matrix in query_ids order."""
    import pyarrow.parquet as pq

    t = pq.read_table(emb_path, columns=["vec_id", "embedding"]).filter(
        pc.is_in(pc.field("vec_id"), pa.array(query_ids, pa.int64()))
    )
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    mat = embedding_matrix(t)
    order = {int(v): i for i, v in enumerate(ids)}
    missing = [q for q in query_ids if q not in order]
    if missing:
        raise KeyError(f"vec_ids {missing} not in {emb_path}")
    return _normalize(mat[[order[q] for q in query_ids]])


def _merge_multi_topk(
    parts: list[pa.Table], query_ids: list[int], k: int
) -> pd.DataFrame:
    df = pa.concat_tables(parts).to_pandas()
    df = df.sort_values(
        ["query_id", "cos_sim", "vec_id"], ascending=[True, False, True]
    )
    df = df.groupby("query_id", sort=True).head(k)
    return df.reset_index(drop=True)


def brute_multi_topk(
    sf_dir: str, query_ids: list[int], k: int = 10
) -> pd.DataFrame:
    """Exact cosine top-k for a TABLE of queries in one corpus scan:
    the (m, d) query matrix is broadcast once (``ray.put``) and every
    batch does a single (n, d) x (d, m) matmul + per-query partial
    top-k, so only k rows per (block, query) reach the driver merge.
    This is the training-pipeline shape — m queries cost one scan, not
    m scans; at large m the query side becomes a bucketed co-join
    (``lsh_multi_topk``)."""
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qids = list(query_ids)
    shared = ray.put((_query_matrix(emb_path, qids), np.asarray(qids)))

    def score(t: pa.Table) -> pa.Table:
        Q, qid_arr = ray.get(shared)
        mat = _normalize(embedding_matrix(t))
        sims = mat @ Q.T  # (n, m)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        n, m = sims.shape
        kk = min(k, n)
        # per-query partial top-k down the rows
        keep = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, m)
        out_q = np.repeat(qid_arr, kk)
        out_v = ids[keep.T.ravel()]
        out_s = np.take_along_axis(sims, keep, axis=0).T.ravel()
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )

    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    parts = list(
        ds.map_batches(score, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    return _merge_multi_topk(parts, qids, k)


def lsh_multi_topk(
    sf_dir: str,
    query_ids: list[int],
    k: int = 10,
    n_tables: int = 16,
    n_planes: int = 8,
    multiprobe: bool = True,
    seed: int = 7,
) -> pd.DataFrame:
    """Approximate multi-query top-k via a bucket co-join: per table,
    every query's probe buckets form a sorted (bucket -> query) map
    broadcast once; each corpus batch computes its signatures and
    joins them against the map (searchsorted), scoring each vector
    only against the queries it shares a bucket with. Cost per batch
    is O(n·T·log(probes) + |candidate pairs|·d) — independent of m
    except through genuine bucket collisions."""
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qids = list(query_ids)
    Q = _query_matrix(emb_path, qids)
    planes = _hyperplanes(Q.shape[1], n_tables, n_planes, seed)
    qsigs = _signatures(Q, planes)  # (m, T)
    probe_maps = []  # per table: (sorted buckets, start offsets, qidx)
    for t in range(n_tables):
        buckets, qidx = [], []
        for qi in range(len(qids)):
            s = {int(qsigs[qi, t])}
            if multiprobe:
                s.update(int(qsigs[qi, t]) ^ (1 << b) for b in range(n_planes))
            buckets.extend(s)
            qidx.extend([qi] * len(s))
        b = np.asarray(buckets, dtype=np.uint32)
        qi_arr = np.asarray(qidx, dtype=np.int64)
        order = np.argsort(b, kind="stable")
        probe_maps.append((b[order], qi_arr[order]))
    shared = ray.put((Q, np.asarray(qids), planes, probe_maps))

    def score(t: pa.Table) -> pa.Table:
        Qm, qid_arr, pl, maps = ray.get(shared)
        mat = embedding_matrix(t)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        sigs = _signatures(mat, pl)  # (n, T)
        pair_v, pair_q = [], []
        for ti, (b_sorted, qi_sorted) in enumerate(maps):
            s = sigs[:, ti]
            lo = np.searchsorted(b_sorted, s, side="left")
            hi = np.searchsorted(b_sorted, s, side="right")
            hit = hi > lo
            if not hit.any():
                continue
            counts = (hi - lo)[hit]
            v_rep = np.repeat(np.flatnonzero(hit), counts)
            q_take = np.concatenate(
                [qi_sorted[l:h] for l, h in zip(lo[hit], hi[hit])]
            )
            pair_v.append(v_rep)
            pair_q.append(q_take)
        if not pair_v:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        pv = np.concatenate(pair_v)
        pq_ = np.concatenate(pair_q)
        # dedup (vector, query) pairs across tables/probes
        key = pv.astype(np.int64) * len(qid_arr) + pq_
        uniq = np.unique(key)
        pv = (uniq // len(qid_arr)).astype(np.int64)
        pq_ = (uniq % len(qid_arr)).astype(np.int64)
        matn = _normalize(mat)
        sims = np.einsum("ij,ij->i", matn[pv], Qm[pq_])
        # per-query partial top-k within the batch
        out_q, out_v, out_s = [], [], []
        for qi in np.unique(pq_):
            m_ = pq_ == qi
            s_, v_ = sims[m_], pv[m_]
            if len(s_) > k:
                sel = np.argpartition(-s_, k)[:k]
                s_, v_ = s_[sel], v_[sel]
            out_q.append(np.full(len(s_), qid_arr[qi], dtype=np.int64))
            out_v.append(ids[v_])
            out_s.append(s_)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "cos_sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    parts = list(
        ds.map_batches(score, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    return _merge_multi_topk(parts, qids, k)

# -- Product quantization (PQ) ------------------------------------------------


def train_pq(
    sample: np.ndarray, m: int = 8, ks: int = 16, iters: int = 10, seed: int = 13
) -> np.ndarray:
    """Train PQ codebooks (Jégou et al. 2011, "Product Quantization
    for Nearest Neighbor Search"): split the d dims into ``m``
    subspaces and run k-means with ``ks`` codes in each. Returns
    (m, ks, d/m) float64 codebooks. Deterministic (seeded init over a
    strided sample — same regime as the IVF coarse quantizer)."""
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    sub = d // m
    books = np.empty((m, ks, sub), dtype=np.float64)
    for j in range(m):
        books[j] = _kmeans(
            np.ascontiguousarray(sample[:, j * sub : (j + 1) * sub]),
            ks,
            iters=iters,
            seed=seed + j,
        )
    return books


def _pq_codes(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Encode (n, d) vectors -> (n, m) uint8 codes (nearest centroid
    per subspace, vectorized)."""
    n, d = mat.shape
    m, ks, sub = books.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        x = mat[:, j * sub : (j + 1) * sub]
        # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin drops ||x||^2
        d2 = -2.0 * (x @ books[j].T) + (books[j] ** 2).sum(axis=1)[None, :]
        codes[:, j] = d2.argmin(axis=1)
    return codes


def pq_topk(
    sf_dir: str,
    query_id: int = 0,
    k: int = 10,
    m: int = 8,
    ks: int = 16,
    sample_rows: int = 2048,
    overscan: int = 8,
    seed: int = 13,
) -> pd.DataFrame:
    """Approximate cosine top-k via product quantization + exact
    re-rank — the ANN **memory** path at 100 TB: a 64-dim float32
    vector (256 B) compresses to ``m`` bytes (8 B at the defaults,
    32x), so a corpus whose raw embeddings need a cluster's worth of
    RAM fits its PQ codes in one node's page cache; at ingest the
    codes are written as a fixed-width column and scans never touch
    the float column except to re-rank.

    Scan shape: codebooks + the query's per-subspace lookup table
    (LUT[j][c] = q_j . codebook[j][c], so the ADC approximate score is
    a table-gather sum — no float math per vector) broadcast once via
    ``ray.put``; each batch encodes, ADC-scores, keeps its top
    ``overscan*k`` candidates, and re-ranks them EXACTLY against the
    float vectors it already holds (the standard ADC + re-rank
    recipe). Only k rows per block reach the driver merge.
    """
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    q = _query_vector(emb_path, query_id)

    sample = _strided_sample(emb_path, sample_rows)
    books = train_pq(sample, m=m, ks=ks, seed=seed)
    sub = books.shape[2]
    lut = np.einsum(
        "mkc,mc->mk", books, q.reshape(m, sub)
    )  # (m, ks): per-subspace query dot products
    shared = ray.put((q, books, lut))

    def score(t: pa.Table) -> pa.Table:
        qv, bks, l = ray.get(shared)
        mat = _normalize(embedding_matrix(t))
        codes = _pq_codes(mat, bks)
        # ADC: approx cosine = sum_j LUT[j, code_j]
        approx = l[np.arange(bks.shape[0])[None, :], codes].sum(axis=1)
        n_cand = min(len(approx), overscan * k)
        cand = np.argpartition(-approx, n_cand - 1)[:n_cand] if len(
            approx
        ) > n_cand else np.arange(len(approx))
        sims = mat[cand] @ qv  # exact re-rank of the candidate set
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
