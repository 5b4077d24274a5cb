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
2. **Partition once, iterate over refs** — edges are hash-partitioned
   by ``hash(src) % B`` into B static object-store blocks in ONE
   exchange (each block also carries a precomputed ``hash(dst) % B``
   column); pages likewise by ``hash(url) % B``.  Each iteration is
   then B ``_spread`` tasks (in-bucket pandas merge of the rank shard
   onto its static edge block on the url STRING — hash collisions
   cannot merge nodes — emitting per-(src-bucket, dst-bucket)
   contribution shards PARTIALLY SUMMED per dst, the combiner
   pattern) and B ``_fold`` tasks (sum the B partials, LEFT onto the
   page shard so pages with no inbound links keep the teleport
   base).  The new rank shards are keyed by the SAME bucket function,
   so they feed the next iteration with no re-partition.  Per
   iteration the only data that moves is O(pages) rank rows plus
   O(distinct dst per bucket pair) partials — the O(edges) table
   never crosses the wire again (a Dataset ``groupby`` loop would
   re-shuffle the full edge set twice per iteration; measured 31.7 s
   -> see BASELINE.md for the A/B).  Buckets scale with input
   (``functions/scaling.py``).
3. Nothing materializes on the driver until the final ranked table
   (O(pages) rows, the query's own result); mid-iteration state is
   ObjectRefs only.

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


def _slice_by_bucket(tbl: pa.Table, col: str, buckets: int) -> list:
    """Split ``tbl`` into ``buckets`` tables on int32 column ``col``
    (one stable argsort + searchsorted slices, no per-bucket scan)."""
    b = tbl.column(col).to_numpy(zero_copy_only=False)
    order = np.argsort(b, kind="stable")
    sorted_tbl = tbl.take(pa.array(order))
    bounds = np.searchsorted(b[order], np.arange(buckets + 1))
    return [
        sorted_tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
        for i in range(buckets)
    ]


def _ray_remote(fn):
    import ray

    return ray.remote(fn)


def _fan(parts, buckets: int) -> list:
    # num_returns=1 hands back a bare ref, not a 1-tuple
    return [parts] if buckets == 1 else list(parts)


def _returns(slices: list, buckets: int):
    """Match a partition task's return shape to ``num_returns``: with
    ``num_returns=1`` Ray hands the consumer ONE ref to the whole
    return value, so a 1-element list would reach ``_concat_shards``/
    ``_fold`` as a Python list instead of a pa.Table (ADVICE r4) —
    return the bare table in that case."""
    return slices[0] if buckets == 1 else slices


@_ray_remote
def _part_edges(block: pa.Table, buckets: int, key: str = "src") -> list:
    """One-time edge partition: block -> B shards keyed by
    hash(``key``) % B, carrying precomputed src/dst bucket columns."""
    block = block.append_column(
        "src_bucket", _bucket_of(block.column("src"), buckets)
    ).append_column("dst_bucket", _bucket_of(block.column("dst"), buckets))
    return _returns(_slice_by_bucket(block, f"{key}_bucket", buckets), buckets)


def _exchange(refs, remote_fn, buckets: int, *extra) -> list:
    """Fan every input block ref through ``remote_fn`` (one task per
    block, B returns) and concat per bucket — the ONE all-to-all this
    module performs; everything after it moves O(vector) data only."""
    shards: list[list] = [[] for _ in range(buckets)]
    for ref in refs:
        parts = remote_fn.options(num_returns=buckets).remote(
            ref, buckets, *extra
        )
        parts = [parts] if buckets == 1 else list(parts)
        for b in range(buckets):
            shards[b].append(parts[b])
    return [_concat_shards.remote(*shards[b]) for b in range(buckets)]


@_ray_remote
def _part_pages(block: pa.Table, buckets: int) -> list:
    block = block.append_column(
        "bucket", _bucket_of(block.column("url"), buckets)
    )
    return _returns(_slice_by_bucket(block, "bucket", buckets), buckets)


@_ray_remote
def _concat_shards(*shards) -> pa.Table:
    return pa.concat_tables(shards)


@_ray_remote
def _init_ranks(page_tbl: pa.Table, pr0: float) -> pa.Table:
    return pa.table(
        {
            "url": page_tbl.column("url"),
            "pr": pa.array(np.full(page_tbl.num_rows, pr0), pa.float64()),
        }
    )


@_ray_remote
def _spread(rank_tbl: pa.Table, edge_tbl: pa.Table, buckets: int) -> list:
    """Rank shard x static edge shard (same src bucket) -> B partial
    contribution shards, pre-summed per dst (combiner)."""
    if edge_tbl.num_rows == 0:
        empty = pa.table(
            {"dst": pa.array([], pa.string()), "contrib": pa.array([], pa.float64())}
        )
        return _returns([empty] * buckets, buckets)
    e = edge_tbl.select(["src", "dst", "outdeg", "dst_bucket"]).to_pandas()
    r = rank_tbl.to_pandas()
    m = e.merge(
        r.rename(columns={"url": "src"}), on="src", how="left", sort=False
    )
    m["contrib"] = m["pr"].fillna(0.0).to_numpy() / m["outdeg"].to_numpy()
    # partial per-dst sum inside each (src_bucket, dst_bucket) cell —
    # shrinks the shipped shard from O(edges in cell) to O(distinct
    # dst in cell) before it crosses the wire
    partial = (
        m.groupby(["dst_bucket", "dst"], sort=True)["contrib"].sum().reset_index()
    )
    out = pa.table(
        {
            "dst_bucket": pa.array(partial["dst_bucket"].to_numpy(), pa.int32()),
            "dst": pa.array(partial["dst"], pa.string()),
            "contrib": pa.array(partial["contrib"].to_numpy(), pa.float64()),
        }
    )
    return _returns(
        [
            s.drop_columns(["dst_bucket"])
            for s in _slice_by_bucket(out, "dst_bucket", buckets)
        ],
        buckets,
    )


@_ray_remote
def _fold(page_tbl: pa.Table, base: float, damping: float, *shards) -> pa.Table:
    """Sum the B partial shards per dst, LEFT onto the page shard."""
    urls = page_tbl.column("url")
    c = pa.concat_tables(shards).to_pandas()
    summed = c.groupby("dst", sort=True)["contrib"].sum()
    vals = (
        pd.Series(urls.to_pandas()).map(summed).fillna(0.0).to_numpy()
    )
    return pa.table(
        {"url": urls, "pr": pa.array(base + damping * vals, pa.float64())}
    )


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

    import ray

    # one-time exchange: per input block, B shard refs; per bucket,
    # one concat task.  Edge blocks then live in the object store
    # (spillable) for the whole iteration loop.
    edge_refs = _exchange(edges.to_arrow_refs(), _part_edges, buckets)
    page_refs = _exchange(
        pages.materialize().to_arrow_refs(), _part_pages, buckets
    )

    rank_refs = [
        _init_ranks.remote(page_refs[b], 1.0 / n_pages) for b in range(buckets)
    ]

    for _ in range(iters):
        spread_out = [
            _fan(
                _spread.options(num_returns=buckets).remote(
                    rank_refs[b], edge_refs[b], buckets
                ),
                buckets,
            )
            for b in range(buckets)
        ]
        # fold shard d consumes column d of the spread matrix; the new
        # rank shards are keyed by the same hash(url) % B, so they are
        # already src-partitioned for the next iteration
        rank_refs = [
            _fold.remote(
                page_refs[d],
                base,
                damping,
                *[spread_out[b][d] for b in range(buckets)],
            )
            for d in range(buckets)
        ]

    out = pd.concat(
        [t.to_pandas() for t in ray.get(rank_refs)], ignore_index=True
    )
    out["pr"] = out["pr"].round(6)
    return out.sort_values("url").reset_index(drop=True)


@_ray_remote
def _hits_spread(
    vec_tbl: pa.Table, edge_tbl: pa.Table, buckets: int, join_col: str
) -> list:
    """Vector shard x static edge shard (partitioned by ``join_col``)
    -> B partial sums keyed by the OTHER endpoint (combiner)."""
    emit_col = "dst" if join_col == "src" else "src"
    emit_bucket = f"{emit_col}_bucket"
    if edge_tbl.num_rows == 0:
        empty = pa.table(
            {"key": pa.array([], pa.string()), "contrib": pa.array([], pa.float64())}
        )
        return _returns([empty] * buckets, buckets)
    e = edge_tbl.select([join_col, emit_col, emit_bucket]).to_pandas()
    v = vec_tbl.to_pandas()  # (url, val)
    m = e.merge(
        v.rename(columns={"url": join_col}), on=join_col, how="left", sort=False
    )
    m["contrib"] = m["val"].fillna(0.0)
    partial = (
        m.groupby([emit_bucket, emit_col], sort=True)["contrib"].sum().reset_index()
    )
    out = pa.table(
        {
            "bucket": pa.array(partial[emit_bucket].to_numpy(), pa.int32()),
            "key": pa.array(partial[emit_col], pa.string()),
            "contrib": pa.array(partial["contrib"].to_numpy(), pa.float64()),
        }
    )
    return _returns(
        [s.drop_columns(["bucket"]) for s in _slice_by_bucket(out, "bucket", buckets)],
        buckets,
    )


@_ray_remote
def _hits_fold(page_tbl: pa.Table, *shards) -> pa.Table:
    """Sum the B partials per key, LEFT onto the page shard (pages
    with no incoming messages score 0.0) -> raw (url, val)."""
    urls = page_tbl.column("url")
    c = pa.concat_tables(shards).to_pandas()
    summed = c.groupby("key", sort=True)["contrib"].sum()
    vals = pd.Series(urls.to_pandas()).map(summed).fillna(0.0).to_numpy()
    return pa.table({"url": urls, "val": pa.array(vals, pa.float64())})


@_ray_remote
def _sumsq(tbl: pa.Table) -> float:
    v = tbl.column("val").to_numpy(zero_copy_only=False)
    return float(np.dot(v, v))


@_ray_remote
def _scale(tbl: pa.Table, s: float) -> pa.Table:
    return pa.table(
        {
            "url": tbl.column("url"),
            "val": pa.array(
                tbl.column("val").to_numpy(zero_copy_only=False) * s, pa.float64()
            ),
        }
    )


def hits(
    sf_dir: str, iters: int = 5, buckets: int | None = None
) -> pd.DataFrame:
    """Kleinberg HITS over the crawled link graph: per url the
    authority and hub score after ``iters`` synchronous iterations
    (a <- E^T h then L2-normalize; h <- E a then L2-normalize),
    init a = h = 1.  Beyond-reference graph extension on the same
    kernel-extracted edges as :func:`pagerank`.

    Same partition-once-iterate engine: edges are exchanged TWICE up
    front (by hash(src) % B for the authority pass, by hash(dst) % B
    for the hub pass — HITS messages flow both directions), then each
    iteration moves only O(pages) vector rows and per-bucket-pair
    partial sums.  The L2 norm is the classic scalar reduce: B
    per-shard sum-of-squares floats to the driver, one multiplier
    broadcast back — O(B) driver bytes per iteration.
    """
    import ray

    from ..sources.corpus import build_corpus

    corpus_dir = build_corpus(sf_dir)
    if buckets is None:
        buckets = auto_buckets(input_nbytes(corpus_dir, table=None), floor=16)

    pages = rd.read_parquet(corpus_dir, columns=["url"])
    edges = (
        rd.read_parquet(corpus_dir, columns=["url", "html"])
        .map_batches(edge_batch, batch_format="pyarrow")
        .materialize()
    )
    edge_block_refs = edges.to_arrow_refs()
    edges_by_src = _exchange(edge_block_refs, _part_edges, buckets, "src")
    edges_by_dst = _exchange(edge_block_refs, _part_edges, buckets, "dst")
    page_refs = _exchange(
        pages.materialize().to_arrow_refs(), _part_pages, buckets
    )

    def _pass(vec_refs: list, edge_refs: list, join_col: str) -> list:
        spread_out = [
            _fan(
                _hits_spread.options(num_returns=buckets).remote(
                    vec_refs[b], edge_refs[b], buckets, join_col
                ),
                buckets,
            )
            for b in range(buckets)
        ]
        raw = [
            _hits_fold.remote(
                page_refs[d], *[spread_out[b][d] for b in range(buckets)]
            )
            for d in range(buckets)
        ]
        norm = float(np.sqrt(sum(ray.get([_sumsq.remote(r) for r in raw]))))
        if norm == 0.0:
            return raw
        return [_scale.remote(r, 1.0 / norm) for r in raw]

    hub = [_init_ranks_val.remote(page_refs[b], 1.0) for b in range(buckets)]
    auth = hub
    for _ in range(iters):
        auth = _pass(hub, edges_by_src, "src")
        hub = _pass(auth, edges_by_dst, "dst")

    frames = []
    for a_t, h_t in zip(ray.get(auth), ray.get(hub)):
        a = a_t.to_pandas().rename(columns={"val": "authority"})
        h = h_t.to_pandas().rename(columns={"val": "hub"})
        frames.append(a.merge(h, on="url", how="inner", sort=False))
    out = pd.concat(frames, ignore_index=True)
    out["authority"] = out["authority"].round(6)
    out["hub"] = out["hub"].round(6)
    return out.sort_values("url").reset_index(drop=True)


@_ray_remote
def _init_ranks_val(page_tbl: pa.Table, v0: float) -> pa.Table:
    return pa.table(
        {
            "url": page_tbl.column("url"),
            "val": pa.array(np.full(page_tbl.num_rows, v0), pa.float64()),
        }
    )


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


# -- host-level (domain) PageRank ---------------------------------------------


def host_pagerank(
    sf_dir: str, iters: int = 5, damping: float = 0.85
) -> pd.DataFrame:
    """PageRank over the HOST graph — the domain-authority signal
    (the quantity the reference's DomainAuthorityScorer takes as a
    user-supplied dict, deep_crawling/scorers.py; this computes it
    from the crawl itself). Host edges are the DISTINCT cross-host
    pairs of the kernel-extracted page edges (self-loops removed —
    intra-host links carry no cross-domain endorsement).

    Scale shape: the page-edge scan reduces each batch to its distinct
    (src_host, dst_host) pairs in-task, and one bounded groupby folds
    them — the host-pair graph is a DIMENSION TABLE relative to the
    page graph (distinct cross-host pairs, orders of magnitude smaller
    than edges), so the iteration runs driver-side in numpy on the
    folded graph. If the host graph itself outgrows one node (~10^8+
    hosts), the SAME partition-once engine above (pagerank) runs on
    the host-edge dataset unchanged — this function is the
    dimension-table fast path, asserting its own bound.
    """
    from ..functions.urls import hosts_of
    from ..sources.corpus import build_corpus

    corpus_dir = build_corpus(sf_dir)

    edges = rd.read_parquet(corpus_dir, columns=["url", "html"]).map_batches(
        edge_batch, batch_format="pyarrow"
    )

    def host_pairs(t: pa.Table) -> pa.Table:
        hs = hosts_of(t.column("src").to_pylist())
        hd = hosts_of(t.column("dst").to_pylist())
        df = pd.DataFrame({"hs": hs, "hd": hd})
        df = df[df["hs"] != df["hd"]].drop_duplicates()
        return pa.table(
            {
                "hs": pa.array(df["hs"], pa.string()),
                "hd": pa.array(df["hd"], pa.string()),
            }
        )

    pairs = (
        edges.map_batches(host_pairs, batch_format="pyarrow")
        .groupby(["hs", "hd"])
        .count()
        .to_pandas()[["hs", "hd"]]
    )
    assert len(pairs) <= 5_000_000, (
        "host-pair graph exceeds the dimension-table fast path; run the "
        "partition-once engine (pagerank) on the host-edge dataset"
    )

    # host universe = hosts WITH PAGES (mirrors page-level N = pages)
    host_rows = (
        rd.read_parquet(corpus_dir, columns=["url"])
        .map_batches(
            lambda t: pa.table(
                {"host": pa.array(sorted(set(hosts_of(t.column("url").to_pylist()))))}
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    hosts = sorted(set(host_rows["host"]))
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)

    src = pairs["hs"].map(idx).to_numpy()
    dst = pairs["hd"].map(idx).to_numpy()
    outdeg = np.bincount(src, minlength=n)
    assert (outdeg > 0).all(), (
        "dangling host (no cross-host out-edges): the no-dangling "
        "formula below (shared with the SQL oracle) would leak its mass"
    )
    pr = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, pr[src] / outdeg[src])
        pr = base + damping * contrib
    return pd.DataFrame({"host": hosts, "pr": np.round(pr, 6)})
