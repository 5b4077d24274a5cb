"""Result-cache semantics — reference ``CacheContext`` / ``CacheMode``
(crawl4ai/cache_context.py:23-92) and the SQLite result cache
(async_database.py:299-390) re-expressed as Parquet + anti-join.

"Cache hit" for a batch engine = the url already has a row in the
completed-results table, so the fetch/extract for it is skipped and
the cached row is reused. The completed table IS the crawl's own
partitioned Parquet output — no second store.

Scale: the completed-url column is read (column-pruned) as a Dataset;
for frontier-sized batches the membership probe is a broadcast
``isin`` inside ``map_batches`` when the completed set fits in memory
per worker, else a hash-partitioned anti-join on url_hash (SURVEY
§2.7 row 2).
"""

from __future__ import annotations

import glob
import os
from enum import Enum

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


class CacheMode(Enum):
    """Reference CacheMode (cache_context.py): how the result cache
    participates in a crawl."""

    ENABLED = "enabled"  # read hits, write misses
    DISABLED = "disabled"  # neither read nor write
    READ_ONLY = "read_only"  # read hits, never write
    WRITE_ONLY = "write_only"  # always fetch, write results
    BYPASS = "bypass"  # ignore cache for this call (no read), write


def completed_urls(results_dir: str) -> pa.Array:
    """url column of every finished wave/round part under
    ``results_dir`` (column-pruned read)."""
    parts = sorted(
        glob.glob(os.path.join(results_dir, "*", "part-*.parquet"))
        + glob.glob(os.path.join(results_dir, "*", "denied.parquet"))
    )
    if not parts:
        return pa.array([], pa.string())
    cols = [pq.read_table(p, columns=["url"]).column("url") for p in parts]
    return pa.concat_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols]
    )


def split_cached(
    frontier_tbl: pa.Table,
    results_dir: str,
    mode: CacheMode = CacheMode.ENABLED,
    url_column: str = "url",
) -> tuple[pa.Table, pa.Table]:
    """Anti-join the frontier against completed results.

    Returns ``(to_fetch, cached)``. Under DISABLED/BYPASS/WRITE_ONLY
    everything is fetched (cache not read), mirroring
    ``CacheContext.should_read`` (cache_context.py:60-70).
    """
    if mode in (CacheMode.DISABLED, CacheMode.BYPASS, CacheMode.WRITE_ONLY):
        return frontier_tbl, frontier_tbl.slice(0, 0)
    done = completed_urls(results_dir)
    if len(done) == 0:
        return frontier_tbl, frontier_tbl.slice(0, 0)
    hit = pc.is_in(frontier_tbl.column(url_column), value_set=done)
    return frontier_tbl.filter(pc.invert(hit)), frontier_tbl.filter(hit)


def read_cached_results(
    results_dir: str, urls: pa.Array, columns: list[str] | None = None
) -> pa.Table:
    """Fetch cached rows for ``urls`` from the completed output
    (keyed read over the partitioned Parquet; at scale this prunes by
    the url-sorted part layout the wave writer produces)."""
    import pyarrow.dataset as pads

    dirs = sorted(glob.glob(os.path.join(results_dir, "*")))
    parts = [p for d in dirs for p in sorted(glob.glob(os.path.join(d, "*.parquet")))]
    if not parts:
        return pa.table({"url": pa.array([], pa.string())})
    ds = pads.dataset(parts, format="parquet")
    return ds.to_table(
        filter=pc.field("url").isin(urls),
        columns=columns,
    )
