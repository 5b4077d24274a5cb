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

# Per-worker row-group url index: (sorted rg min urls, rg max urls,
# file idx, rg idx within file, ParquetFile handles). Built once from
# footer statistics; lets fetch read EXACTLY the row groups containing
# requested keys instead of every row group in the batch's url range —
# the difference between a keyed GET and a range scan when a late-wave
# frontier scatters across the whole corpus. None = stats unavailable,
# fall back to the dataset-filter path.
_RGINDEX: dict = {}


# Per-worker store-kind cache: a dir with a cdx/ companion is a WARC
# archive (sources/warc.py) — every fetch consumer (BFS/async crawl,
# cache probe, link-preview head fetch) then reads it transparently.
# Keyed on the directory's mtime so a dir that later gains or loses
# its cdx/ companion (adding/removing an entry bumps the parent's
# mtime) is re-classified instead of being pinned for the worker's
# lifetime (ADVICE r4); the steady-state cost is one stat per call.
_STORE_KIND: dict = {}


def _is_warc_store(corpus_dir: str) -> bool:
    import os

    try:
        mt = os.stat(corpus_dir).st_mtime_ns
    except OSError:
        mt = -1
    ent = _STORE_KIND.get(corpus_dir)
    if ent is None or ent[0] != mt:
        ent = _STORE_KIND[corpus_dir] = (
            mt,
            os.path.isdir(os.path.join(corpus_dir, "cdx")),
        )
    return ent[1]


def _dataset(corpus_dir: str):
    ds = _DATASETS.get(corpus_dir)
    if ds is None:
        import pyarrow.dataset as pads

        ds = _DATASETS[corpus_dir] = pads.dataset(corpus_dir, format="parquet")
    return ds


def _rg_index(corpus_dir: str):
    """Build (or fetch the cached) row-group url-range index for a
    corpus directory. Parquet min/max statistics are valid BOUNDS even
    when truncated (spec: truncated min <= true min, truncated max >=
    true max), so candidate selection below is conservative-correct —
    extra row groups may be read, keys are never missed."""
    if corpus_dir in _RGINDEX:
        return _RGINDEX[corpus_dir]
    import glob
    import os

    import pyarrow.parquet as pq

    try:
        paths = sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))
        if not paths:
            _RGINDEX[corpus_dir] = None
            return None
        mins, maxs, fids, rgids, handles = [], [], [], [], []
        for fi, path in enumerate(paths):
            pf = pq.ParquetFile(path)
            handles.append(pf)
            md = pf.metadata
            url_idx = next(
                i
                for i in range(md.num_columns)
                if md.schema.column(i).name == "url"
            )
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(url_idx).statistics
                if st is None or not st.has_min_max:
                    _RGINDEX[corpus_dir] = None
                    return None
                mins.append(st.min)
                maxs.append(st.max)
                fids.append(fi)
                rgids.append(rg)
        order = np.argsort(np.asarray(mins, dtype=object), kind="stable")
        mins_s = np.asarray(mins, dtype=object)[order]
        maxs_s = np.asarray(maxs, dtype=object)[order]
        # Row-group ranges are only guaranteed key-unique when globally
        # disjoint (strict: a key equal to a shared boundary could live
        # in either group). Truncated string statistics WIDEN ranges
        # (truncated min <= true min, truncated max >= true max), so
        # truncation can only create apparent overlap, never hide one —
        # making this check safe. When overlap exists (external /
        # non-globally-sorted corpus), fetch_batch gathers EVERY row
        # group whose [min,max] contains each key via the cummax bound.
        disjoint = bool(
            all(maxs_s[i] < mins_s[i + 1] for i in range(len(mins_s) - 1))
        )
        idx = {
            "mins": mins_s,
            "maxs": maxs_s,
            "cummax": np.maximum.accumulate(maxs_s) if len(maxs_s) else maxs_s,
            "disjoint": disjoint,
            "fids": np.asarray(fids)[order],
            "rgids": np.asarray(rgids)[order],
            "handles": handles,
        }
        _RGINDEX[corpus_dir] = idx
        return idx
    except Exception:
        _RGINDEX[corpus_dir] = None
        return None


def fetch_batch(
    batch: pa.Table,
    corpus_dir: str,
    columns=("url", "html"),
    resolver=None,
) -> pa.Table:
    """Stateless fetch task: url batch -> + html/status_code/fetched.

    Keyed GET against the url-sorted corpus: each url is mapped to its
    row group via footer min/max statistics (cached per worker) and
    only those row groups are decoded. A scattered late-wave frontier
    therefore costs O(hit row groups), not O(url range) — at 100 TB
    the same index maps keys to files/row groups without touching the
    rest of the corpus.

    ``resolver`` (urls -> (final_urls, first_statuses)) enables
    redirect following, aiohttp-style: the lookup happens on the FINAL
    url, the original ``url`` column is preserved, and the batch gains
    ``redirected_url`` (final url — equals the request url when no
    redirect fired) + ``redirected_status_code`` (first hop status,
    null when direct), the reference's ``AsyncCrawlResponse`` surface
    (async_crawler_strategy.py:2771, models.py:341-343).
    """
    urls = batch.column("url")
    redirect_cols = None
    if resolver is not None:
        finals, first = resolver(urls.to_pylist())
        redirect_cols = (
            pa.array(finals, pa.string()),
            pa.array(first, pa.int16()),
        )
        urls = redirect_cols[0]
    if _is_warc_store(corpus_dir):
        from ..sources.warc import warc_hits

        hits = warc_hits(urls, corpus_dir, columns)
    else:
        hits = keyed_lookup(urls, corpus_dir, columns)
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
    if redirect_cols is not None:
        appended.append(("redirected_url", redirect_cols[0]))
        appended.append(("redirected_status_code", redirect_cols[1]))
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


def keyed_lookup(urls, keyed_dir: str, columns) -> pa.Table:
    """Row-group-exact keyed GET into any url-sorted parquet dir:
    returns the rows of ``keyed_dir`` whose ``url`` is in ``urls``
    (arbitrary ``columns``).  The footer min/max index maps each key
    to its row group(s); only those are decoded — shared by the
    corpus fetch path and the WARC CDX lookup."""
    idx_rg = _rg_index(keyed_dir)
    if idx_rg is not None:
        u = np.asarray(urls.to_pylist(), dtype=object)
        pos = np.searchsorted(idx_rg["mins"], u, side="right") - 1
        if idx_rg["disjoint"]:
            # fast path: at most ONE row group can contain each key
            ok = pos >= 0
            ok[ok] = u[ok] <= idx_rg["maxs"][pos[ok]]
            need = np.unique(pos[ok])
        else:
            # overlapping ranges (truncated stats / external corpus):
            # a key may live in any row group i with min[i] <= key <=
            # max[i]. cummax is non-decreasing, and cummax[i] < key
            # implies every max[0..i] < key, so candidates lie in
            # [searchsorted(cummax, key), pos]; mins are sorted so
            # min[i] <= key holds throughout that span — only the max
            # bound needs checking.
            maxs = idx_rg["maxs"]
            left = np.searchsorted(idx_rg["cummax"], u, side="left")
            need_set: set = set()
            for lo_i, hi_i, key in zip(left, pos, u):
                for i in range(int(lo_i), int(hi_i) + 1):
                    if key <= maxs[i]:
                        need_set.add(i)
            need = np.fromiter(sorted(need_set), dtype=np.int64) if need_set else np.empty(0, dtype=np.int64)
        pieces = []
        for fi in np.unique(idx_rg["fids"][need]):
            sel = need[idx_rg["fids"][need] == fi]
            pieces.append(
                idx_rg["handles"][fi].read_row_groups(
                    sorted(int(r) for r in idx_rg["rgids"][sel]),
                    columns=list(columns),
                    # each fetch task IS the parallel unit — a per-task
                    # decode thread pool would oversubscribe the node
                    use_threads=False,
                )
            )
        if pieces:
            cand = pa.concat_tables(pieces)
            hits = cand.filter(
                pc.is_in(cand.column("url"), value_set=pc.unique(urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls))
            )
        else:
            hits = _dataset(keyed_dir).schema.empty_table().select(
                list(columns)
            )
    else:
        # stats unavailable: range + isin predicate-pushdown scan
        lo, hi = pc.min_max(urls).values()
        hits = _dataset(keyed_dir).to_table(
            filter=(
                (pc.field("url") >= lo) & (pc.field("url") <= hi)
                & pc.field("url").isin(urls)
            ),
            columns=list(columns),
        )
    return hits


class CorpusFetcher:
    """map_batches actor: (url, ...) -> (+ html, status_code, fetched).

    Misses (url not in corpus) become status 404 with null html,
    mirroring a dead link. Input batch order is preserved.

    With ``ua_seed`` set, every row additionally carries the sticky
    per-host request identity (``user_agent`` / ``sec_ch_ua`` columns)
    a real aiohttp deployment would send — assignment is a pure
    function of (seed, host), so parallel fetch tasks agree without
    shared state (state/user_agents.py).

    With ``fetch_ssl`` set, every row carries the per-host TLS
    certificate record (``ssl_*`` columns — subject, issuer, serial,
    validity window, sha256 fingerprint), the reference's
    ``fetch_ssl_certificate`` -> ``AsyncCrawlResponse.ssl_certificate``
    surface (crawl4ai/ssl_certificate.py:62-133, models.py:341).
    Certificates are deterministic per host and cached on the actor —
    one "handshake" per host per actor, like a real TLS session cache.
    """

    def __init__(
        self,
        corpus_dir: str,
        columns: tuple = ("url", "html"),
        ua_seed: int | None = None,
        ua_kwargs: dict | None = None,
        fetch_ssl: bool = False,
        follow_redirects: bool = False,
    ):
        self.corpus_dir = corpus_dir
        self.columns = columns
        if not _is_warc_store(corpus_dir):
            _dataset(corpus_dir)  # open once per actor
        self.ua_rotator = None
        self.fetch_ssl = fetch_ssl
        self._ssl_cache: dict = {}
        self.resolver = None
        if follow_redirects:
            from ..sources.corpus import resolve_redirects_batch

            self.resolver = resolve_redirects_batch
        if ua_seed is not None:
            from ..state.user_agents import UserAgentRotator

            self.ua_rotator = UserAgentRotator(
                seed=ua_seed, **(ua_kwargs or {})
            )

    def _hosts(self, out: pa.Table) -> list:
        from ..functions.urls import host_of

        return (
            out.column("host").to_pylist()
            if "host" in out.column_names
            else [host_of(u) for u in out.column("url").to_pylist()]
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = fetch_batch(
            batch, self.corpus_dir, self.columns, resolver=self.resolver
        )
        hosts = (
            self._hosts(out) if (self.ua_rotator is not None or self.fetch_ssl) else None
        )
        if self.ua_rotator is not None:
            headers = self.ua_rotator.assign_batch(hosts)
            out = out.append_column(
                "user_agent",
                pa.array([h["User-Agent"] for h in headers], pa.string()),
            ).append_column(
                "sec_ch_ua",
                pa.array([h["Sec-CH-UA"] for h in headers], pa.string()),
            )
        if self.fetch_ssl:
            from ..functions.ssl_certificate import (
                SSL_COLUMNS,
                synth_cert_fields,
            )

            keys = ("subject", "issuer", "serial_number", "not_before", "not_after", "fingerprint")
            cols: dict = {c: [] for c in SSL_COLUMNS}
            for h in hosts:
                f = self._ssl_cache.get(h)
                if f is None:
                    f = self._ssl_cache[h] = synth_cert_fields(h)
                for c, k in zip(SSL_COLUMNS, keys):
                    cols[c].append(f[k])
            for c in SSL_COLUMNS:
                out = out.append_column(c, pa.array(cols[c], pa.string()))
        return out
