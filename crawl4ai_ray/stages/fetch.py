"""Fetch stage: resolve frontier urls against the corpus table.

The sandbox has no network, so "fetch" = keyed lookup into the
Common-Crawl-style Parquet corpus — the same seam the reference's
``AsyncHTTPCrawlerStrategy._handle_http``
(crawl4ai/async_crawler_strategy.py:2679-2796) fills with aiohttp. A
real deployment swaps ``CorpusFetcher`` for an aiohttp actor pool
with identical batch signature.

Scale design: ``CorpusFetcher`` is an **actor** — the
``pyarrow.dataset`` handle (file footers, row-group statistics) is
opened once per actor in ``__init__``, then every batch issues a
predicate-pushdown scan ``url ∈ batch``. The corpus is written sorted
by url, so row-group min/max statistics prune the scan to the few row
groups actually containing the requested keys — the I/O profile of a
keyed remote store GET, without broadcasting the (100 TB) corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Per-worker-process dataset handle cache. Ray reuses worker processes
# across tasks and waves, so footer/statistics parsing happens once per
# worker per corpus — the stateless-task equivalent of actor __init__
# state (cheaper than spinning an actor pool every wave).
_DATASETS: dict = {}


def _dataset(corpus_dir: str):
    ds = _DATASETS.get(corpus_dir)
    if ds is None:
        import pyarrow.dataset as pads

        ds = _DATASETS[corpus_dir] = pads.dataset(corpus_dir, format="parquet")
    return ds


def fetch_batch(batch: pa.Table, corpus_dir: str, columns=("url", "html")) -> pa.Table:
    """Stateless fetch task: url batch -> + html/status_code/fetched.

    Predicate-pushdown scan (url ∈ batch) against the url-sorted
    corpus; row-group statistics prune the read like a keyed store.
    """
    urls = batch.column("url")
    # isin alone does NOT row-group-prune in pyarrow; the url range
    # conjunct does (min/max statistics). Batches arrive url-sorted
    # and range-partitioned (crawl.py slices the sorted wave), so the
    # range covers ~1-2 row groups — a keyed-store GET, not a scan.
    lo, hi = pc.min_max(urls).values()
    hits = _dataset(corpus_dir).to_table(
        filter=(
            (pc.field("url") >= lo) & (pc.field("url") <= hi)
            & pc.field("url").isin(urls)
        ),
        columns=list(columns),
    )
    idx = pc.index_in(urls, hits.column("url"))
    html = pc.take(hits.column("html"), idx)
    if html.type != pa.large_binary():
        html = html.cast(pa.large_binary())
    fetched = pc.is_valid(idx)
    status = pc.if_else(
        fetched, pa.scalar(200, pa.int16()), pa.scalar(404, pa.int16())
    )
    out = batch
    appended = [("html", html), ("status_code", status), ("fetched", fetched)]
    # propagate any additional requested corpus columns (e.g. warc_ts
    # for the cache revalidation probe)
    for extra in columns:
        if extra not in ("url", "html"):
            appended.append((extra, pc.take(hits.column(extra), idx)))
    for name, col in appended:
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, col)
    return out


class CorpusFetcher:
    """map_batches actor: (url, ...) -> (+ html, status_code, fetched).

    Misses (url not in corpus) become status 404 with null html,
    mirroring a dead link. Input batch order is preserved.
    """

    def __init__(self, corpus_dir: str, columns: tuple = ("url", "html")):
        self.corpus_dir = corpus_dir
        self.columns = columns
        _dataset(corpus_dir)  # open once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        return fetch_batch(batch, self.corpus_dir, self.columns)
