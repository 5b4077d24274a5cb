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


class CacheContext:
    """Per-URL cache decision record (cache_context.py:23-92).

    Centralizes cacheability (only http/https/file URLs cache; ``raw:``
    never does) and the read/write gates used by ``split_cached`` /
    the crawl engines' persist step.
    """

    def __init__(self, url: str, cache_mode: CacheMode, always_bypass: bool = False):
        self.url = url
        self.cache_mode = cache_mode
        self.always_bypass = always_bypass
        self.is_cacheable = url.startswith(("http://", "https://", "file://"))
        self.is_web_url = url.startswith(("http://", "https://"))
        self.is_local_file = url.startswith("file://")
        self.is_raw_html = url.startswith("raw:")
        self._url_display = url if not self.is_raw_html else "Raw HTML"

    def should_read(self) -> bool:
        if self.always_bypass or not self.is_cacheable:
            return False
        return self.cache_mode in (CacheMode.ENABLED, CacheMode.READ_ONLY)

    def should_write(self) -> bool:
        if self.always_bypass or not self.is_cacheable:
            return False
        return self.cache_mode in (CacheMode.ENABLED, CacheMode.WRITE_ONLY)

    @property
    def display_url(self) -> str:
        return self._url_display


def legacy_to_cache_mode(
    disable_cache: bool = False,
    bypass_cache: bool = False,
    no_cache_read: bool = False,
    no_cache_write: bool = False,
) -> CacheMode:
    """Legacy boolean flags -> CacheMode (cache_context.py:97-117)."""
    if disable_cache:
        return CacheMode.DISABLED
    if bypass_cache:
        return CacheMode.BYPASS
    if no_cache_read and no_cache_write:
        return CacheMode.DISABLED
    if no_cache_read:
        return CacheMode.WRITE_ONLY
    if no_cache_write:
        return CacheMode.READ_ONLY
    return CacheMode.ENABLED


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


class CacheValidationResult(Enum):
    """Reference cache_validator.py:24-30 statuses."""

    FRESH = "fresh"      # content unchanged, reuse cached row
    STALE = "stale"      # content changed, recrawl
    UNKNOWN = "unknown"  # no validators stored, recrawl
    ERROR = "error"      # probe failed, fall back to cache


def revalidate_cached(
    cached_tbl: pa.Table,
    corpus_dir: str,
    *,
    fingerprint_column: str = "head_fingerprint",
    modified_column: str = "warc_ts",
) -> pa.Table:
    """Smart cache validation (reference cache_validator.py:84-214)
    re-expressed for the batch engine: instead of a conditional HEAD
    request per url, one keyed *head-only* read against the corpus —
    the Last-Modified analog is ``warc_ts`` and Layer-4 is the stored
    head fingerprint vs the fingerprint of the current page head.

    Input: cached rows carrying url + stored validators.  Output: the
    same rows plus ``validation: string`` (fresh/stale/unknown/error).
    The caller refetches stale/unknown urls and reuses fresh/error
    rows, mirroring the reference's use-cache-on-error fallback.

    Scale: the corpus read is range+isin pruned exactly like the fetch
    stage and only decodes the head slice of ``html`` — the 5KB-HEAD
    discipline of the reference validator.
    """
    from ..functions.page_utils import compute_head_fingerprint
    from ..stages.fetch import fetch_batch

    urls = cached_tbl.column("url")
    n = len(urls)
    stored_fp = (
        cached_tbl.column(fingerprint_column).to_pylist()
        if fingerprint_column in cached_tbl.column_names
        else [None] * n
    )
    stored_ts = (
        cached_tbl.column(modified_column).to_pylist()
        if modified_column in cached_tbl.column_names
        else [None] * n
    )

    try:
        probe = fetch_batch(
            pa.table({"url": urls}), corpus_dir, columns=("url", "html", "warc_ts")
        )
    except Exception:
        return cached_tbl.append_column(
            "validation",
            pa.array([CacheValidationResult.ERROR.value] * n, pa.string()),
        )

    fetched = probe.column("fetched").to_pylist()
    live_ts = (
        probe.column("warc_ts").to_pylist()
        if "warc_ts" in probe.column_names
        else [None] * n
    )
    htmls = probe.column("html").to_pylist()

    verdicts = []
    for i in range(n):
        if not fetched[i]:
            # url vanished from the store — must recrawl (404 path)
            verdicts.append(CacheValidationResult.STALE.value)
            continue
        # Layer 3: conditional-request analog (Last-Modified timestamp)
        if stored_ts[i] is not None and live_ts[i] is not None:
            if live_ts[i] == stored_ts[i]:
                verdicts.append(CacheValidationResult.FRESH.value)
                continue
        # Layer 4: head fingerprint over the current head slice
        if stored_fp[i]:
            raw = (htmls[i] or b"")
            if isinstance(raw, (bytes, bytearray, memoryview)):
                raw = bytes(raw).decode("utf-8", "replace")
            head_end = raw.find("</head>")
            head = raw[: head_end + 7] if head_end != -1 else raw[:4096]
            if compute_head_fingerprint(head) == stored_fp[i]:
                verdicts.append(CacheValidationResult.FRESH.value)
                continue
            verdicts.append(CacheValidationResult.STALE.value)
            continue
        verdicts.append(
            CacheValidationResult.STALE.value
            if stored_ts[i] is not None
            else CacheValidationResult.UNKNOWN.value
        )
    return cached_tbl.append_column("validation", pa.array(verdicts, pa.string()))


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
    # wave part files and denied.parquet carry different schemas —
    # read per file and concat permissively (missing columns null)
    tables = []
    for part in parts:
        ds = pads.dataset(part, format="parquet")
        cols = columns
        if cols is not None:
            cols = [c for c in cols if c in ds.schema.names]
        t = ds.to_table(filter=pc.field("url").isin(urls), columns=cols)
        if t.num_rows:
            tables.append(t)
    if not tables:
        return pa.table({"url": pa.array([], pa.string())})
    return pa.concat_tables(tables, promote_options="permissive")
