"""Distributed PageRank over the crawled link graph.

URL-importance scoring is the canonical web-graph computation a
crawl engine feeds (frontier prioritization, seed ranking — the same
role the reference's URL scorers play heuristically,
deep_crawling/scorers.py); the reference has no graph operator, so
this is a beyond-reference extension built crawl-first: edges come
from the REAL link-extraction kernel (``prefetch_batch`` DOM walk +
``normalize_url_for_deep_crawl``), not from the corpus arithmetic, so
the query doubles as an end-to-end link-extraction check against the
SQL oracle's closed-form link rule.

Ray-Data shape (the 100 TB plan):

1. **Edges** — one streaming scan of the corpus: per page, the DOM
   walk yields internal links; normalization + per-row set-dedup make
   the page's DISTINCT out-edges, and the out-degree is attached to
   every edge right there (a page's edges are born in one row — the
   out-degree never needs a shuffle).
2. **Iterate** ``r' = (1-d)/N + d * Σ_in r/outdeg`` with TWO
   bounded-key bucket-cogroup shuffles per iteration (the
   ``_bucket_attach`` pattern, dedup.py — Dataset.join's empty-
   partition schema bug is documented there):
   rank joins edges on ``hash(src) % B`` (in-bucket pandas merge on
   the url string, so hash collisions cannot merge nodes), contribs
   re-key by ``hash(dst) % B`` and fold onto the page set (LEFT —
   pages with no inbound links keep the teleport base).
   Buckets scale with input (``functions/scaling.py``).
3. Nothing materializes on the driver until the final ranked table
   (O(pages) rows, the query's own result).

Fixed synchronous iterations (default 5; the gate query runs 3 — each
iteration is two whole-graph shuffles and 3 already exercises every
stage), damping 0.85; no dangling correction is needed — every
synthetic page has >=1 distinct internal out-link (sources/corpus.py
``n_links`` >= 2). The DuckDB oracle chains k non-recursive CTEs over
the links rule, so every rank value is SQL-checked to 6 decimals.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.scaling import auto_buckets, input_nbytes


def edge_batch(batch: pa.Table) -> pa.Table:
    """Corpus (url, html) rows -> distinct internal edges
    (src, dst, outdeg) via the real extraction kernel."""
    from ..functions.urls import normalize_url_for_deep_crawl
    from ..stages.extract import prefetch_batch

    pre = prefetch_batch(batch)
    srcs, dsts, degs = [], [], []
    for u, links in zip(
        pre.column("url").to_pylist(), pre.column("links_internal").to_pylist()
    ):
        canon = set()
        for link in links:
            c = normalize_url_for_deep_crawl(link["href"], u)
            if c is not None:
                canon.add(c)
        d = len(canon)
        for c in sorted(canon):
            srcs.append(u)
            dsts.append(c)
            degs.append(d)
    return pa.table(
        {
            "src": pa.array(srcs, pa.string()),
            "dst": pa.array(dsts, pa.string()),
            "outdeg": pa.array(degs, pa.int64()),
        }
    )


def _bucket_of(urls: pa.Array, buckets: int) -> pa.Array:
    from ..functions.hashing import hash64_batch

    h = hash64_batch(urls.to_pylist())
    return pa.array((h % np.uint64(buckets)).astype(np.int32), pa.int32())


def pagerank(
    sf_dir: str,
    iters: int = 5,
    damping: float = 0.85,
    buckets: int | None = None,
) -> pd.DataFrame:
    """(url, pr) after ``iters`` synchronous PageRank iterations over
    the corpus link graph; sorted by url, pr rounded to 6."""
    from ..sources.corpus import build_corpus

    corpus_dir = build_corpus(sf_dir)
    if buckets is None:
        buckets = auto_buckets(input_nbytes(corpus_dir, table=None), floor=16)

    pages = rd.read_parquet(corpus_dir, columns=["url"])
    n_pages = pages.count()
    base = (1.0 - damping) / n_pages

    edges = rd.read_parquet(corpus_dir, columns=["url", "html"]).map_batches(
        edge_batch, batch_format="pyarrow"
    )
    # edges are re-read every iteration from this materialized handle;
    # blocks stay in the object store (spillable), never on the driver
    edges = edges.materialize()

    def _tag(side: int, key_col: str, cols: dict):
        def fn(t: pa.Table) -> pa.Table:
            out = {
                "bucket": _bucket_of(t.column(key_col), buckets),
                "side": pa.array(
                    np.full(t.num_rows, side, np.int8), pa.int8()
                ),
            }
            for name, (src_col, typ) in cols.items():
                out[name] = (
                    t.column(src_col).cast(typ)
                    if src_col is not None
                    else pa.nulls(t.num_rows, typ)
                )
            return pa.table(out)

        return fn

    # unified cogroup schema: key (url), aux (dst url), num (rank or
    # contrib), deg (outdeg)
    COLS_RANK = {
        "key": ("url", pa.string()),
        "aux": (None, pa.string()),
        "num": ("pr", pa.float64()),
        "deg": (None, pa.int64()),
    }
    COLS_EDGE = {
        "key": ("src", pa.string()),
        "aux": ("dst", pa.string()),
        "num": (None, pa.float64()),
        "deg": ("outdeg", pa.int64()),
    }
    COLS_CONTRIB = {
        "key": ("dst", pa.string()),
        "aux": (None, pa.string()),
        "num": ("contrib", pa.float64()),
        "deg": (None, pa.int64()),
    }
    COLS_PAGE = {
        "key": ("url", pa.string()),
        "aux": (None, pa.string()),
        "num": (None, pa.float64()),
        "deg": (None, pa.int64()),
    }

    def spread(g: pd.DataFrame) -> pd.DataFrame:
        """Bucket cogroup #1: rank rows (side 0) x edge rows (side 1)
        on the url string -> per-edge contribution keyed by dst."""
        ranks = g[g["side"] == 0]
        eg = g[g["side"] == 1]
        if len(eg) == 0:
            return pd.DataFrame(
                {"dst": pd.Series([], dtype=object), "contrib": pd.Series([], dtype="float64")}
            )
        m = eg.merge(
            ranks[["key", "num"]].rename(columns={"num": "pr"}),
            on="key",
            how="left",
        )
        contrib = m["pr"].fillna(0.0).to_numpy() / m["deg"].to_numpy()
        return pd.DataFrame({"dst": m["aux"].to_numpy(), "contrib": contrib})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        """Bucket cogroup #2: contrib rows (side 0) folded LEFT onto
        page rows (side 1) -> next rank per page."""
        pagesg = g[g["side"] == 1]
        contribs = g[g["side"] == 0]
        if len(pagesg) == 0:
            return pd.DataFrame(
                {"url": pd.Series([], dtype=object), "pr": pd.Series([], dtype="float64")}
            )
        summed = contribs.groupby("key")["num"].sum()
        vals = (
            pagesg["key"].map(summed).fillna(0.0).to_numpy()
        )
        return pd.DataFrame(
            {
                "url": pagesg["key"].to_numpy(),
                "pr": base + damping * vals,
            }
        )

    ranks = pages.map_batches(
        lambda t: pa.table(
            {
                "url": t.column("url"),
                "pr": pa.array(
                    np.full(t.num_rows, 1.0 / n_pages), pa.float64()
                ),
            }
        ),
        batch_format="pyarrow",
    )

    tagged_edges = edges.map_batches(
        _tag(1, "src", COLS_EDGE), batch_format="pyarrow"
    ).materialize()
    tagged_pages = pages.map_batches(
        _tag(1, "url", COLS_PAGE), batch_format="pyarrow"
    ).materialize()

    for _ in range(iters):
        tagged_ranks = ranks.map_batches(
            _tag(0, "url", COLS_RANK), batch_format="pyarrow"
        )
        contribs = (
            tagged_ranks.union(tagged_edges)
            .groupby("bucket")
            .map_groups(spread, batch_format="pandas")
        )
        tagged_contribs = contribs.map_batches(
            _tag(0, "dst", COLS_CONTRIB), batch_format="pyarrow"
        )
        ranks = (
            tagged_contribs.union(tagged_pages)
            .groupby("bucket")
            .map_groups(fold, batch_format="pandas")
            # truncate lineage each iteration — the lazy DAG otherwise
            # re-plans the whole k-deep chain per added stage
            # (measured superlinear: 7.5/15/22/39 s at iters 2..5);
            # ranks blocks are O(pages) rows in the object store, the
            # intended footprint for iterative graph state
            .materialize()
        )

    out = ranks.to_pandas()
    out["pr"] = out["pr"].round(6)
    return out.sort_values("url").reset_index(drop=True)


def inlink_stats(sf_dir: str, buckets: int | None = None) -> pd.DataFrame:
    """Inlink + anchor-text aggregation per target url — the web-search
    signal an anchor corpus is built from (no reference counterpart;
    companion to :func:`pagerank` on the same kernel-extracted edges).

    Per target: number of distinct in-edges, number of distinct source
    hosts, and the lexicographically-first anchor text.  One streaming
    edge scan (anchor text read straight off the DOM walk) + ONE
    bounded-key shuffle (``hash(dst) % buckets``) with an in-group
    pandas fold — a direct groupby(dst) would sort-aggregate one key
    per page (the many-key cliff this repo routes around everywhere).
    """
    from ..functions.urls import host_of, normalize_url_for_deep_crawl
    from ..sources.corpus import build_corpus
    from ..stages.extract import prefetch_batch

    corpus_dir = build_corpus(sf_dir)
    if buckets is None:
        buckets = auto_buckets(input_nbytes(corpus_dir, table=None), floor=16)

    def anchor_edges(batch: pa.Table) -> pa.Table:
        pre = prefetch_batch(batch)
        dsts, hosts, anchors = [], [], []
        for u, links in zip(
            pre.column("url").to_pylist(),
            pre.column("links_internal").to_pylist(),
        ):
            src_host = host_of(u)
            seen = set()
            for link in links:
                c = normalize_url_for_deep_crawl(link["href"], u)
                if c is None or c in seen:
                    continue
                seen.add(c)
                dsts.append(c)
                hosts.append(src_host)
                anchors.append(link["text"])
        from ..functions.hashing import hash64_batch

        b = (hash64_batch(dsts) % np.uint64(buckets)).astype(np.int32)
        return pa.table(
            {
                "bucket": pa.array(b, pa.int32()),
                "dst": pa.array(dsts, pa.string()),
                "src_host": pa.array(hosts, pa.string()),
                "anchor": pa.array(anchors, pa.string()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("dst").agg(
            n_inlinks=("src_host", "size"),
            n_src_hosts=("src_host", "nunique"),
            anchor=("anchor", "min"),
        )
        return s.reset_index().rename(columns={"dst": "url"})

    ds = rd.read_parquet(corpus_dir, columns=["url", "html"])
    out = (
        ds.map_batches(anchor_edges, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    out["n_inlinks"] = out["n_inlinks"].astype("int64")
    out["n_src_hosts"] = out["n_src_hosts"].astype("int64")
    return out.sort_values("url").reset_index(drop=True)
