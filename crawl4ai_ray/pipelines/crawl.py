"""Wave-synchronous distributed BFS crawl — the flagship pipeline.

Ray-Data-native rebuild of the reference's deep-crawl loop
(``crawl4ai/deep_crawling/bfs_strategy.py:207-301`` +
``async_dispatcher``): per wave,

    frontier (url, depth, parent, order)
      -> politeness gate (robots + per-host crawl-delay schedule,
         stateful actor shards keyed by host hash)          [state/politeness]
      -> map_batches(CorpusFetcher actor pool)              [stages/fetch]
      -> map_batches(extract kernel, zero-copy Arrow)       [stages/extract]
      -> write_parquet(results/wave=K)   (atomic, resumable)
      -> link discovery (flat summary of canonical out-links
         with (result order, link idx) positions)
      -> URL-seen first-wins dedup (sharded cuckoo+exact actors)
      -> next frontier, ordered by discovery position

Heavy data (html, markdown) never touches the driver: fetch+extract
stream through the object store and land in per-wave Parquet. The
driver holds only one wave's url metadata — the frontier — and the
per-wave link summary, replicating the reference's *serial* discovery
semantics (visited first-wins in (result, link) order, per-result
``max_pages`` capacity truncation, bfs_strategy.py:133-205) exactly
while the heavy stages run distributed.

Ordering parity: results of a wave are processed in frontier order
(``order`` column), never completion order — the property the
reference documents at bff_strategy.py:276-286.

Checkpoint/resume: after each wave the engine writes frontier
Parquet, seen-shard Parquet + cuckoo bytes, politeness shard state,
and a manifest row; ``BFSCrawler.resume`` continues from the last
complete wave (already-written wave outputs are skipped).

Scale notes (10^10-url frontier): the per-wave driver work is O(wave
links) on url *strings only*; for unbounded crawls
(``max_pages=inf``, no filter/scorer) discovery automatically takes
the Arrow-vectorized fast path (``_discover_fast``, bit-equivalent)
— the serial capacity loop is inherently sequential semantics, so it
is only replicated when those semantics are requested. Hot-host skew:
queue storage is partitioned by url hash; the politeness schedule is
always owned by exactly one shard per host, so crawl-delay stays
exact under salting.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from math import inf
from typing import Callable, Optional
from urllib.parse import urlparse

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..functions.urls import (
    hosts_of,
    is_valid_crawl_url,
    normalize_url_for_deep_crawl,
    valid_crawl_mask,
    valid_crawl_mask_arrow,
)
from ..stages.extract import extract_batch
from ..stages.fetch import fetch_batch
from ..state.politeness import PolitenessPool
from ..state.seen import ShardedSeen

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("depth", pa.int32()),
        ("parent_url", pa.string()),
        ("order", pa.int64()),
        ("host", pa.string()),
    ]
)


def _frontier_table(rows: list[tuple[str, int, Optional[str], int]]) -> pa.Table:
    urls = [r[0] for r in rows]
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array([r[1] for r in rows], pa.int32()),
            pa.array([r[2] for r in rows], pa.string()),
            pa.array([r[3] for r in rows], pa.int64()),
            pa.array(hosts_of(urls), pa.string()),
        ],
        schema=FRONTIER_SCHEMA,
    )


def _wave_extract(batch: pa.Table, prefetch: bool = False) -> pa.Table:
    """Extract fetched rows; pass misses through as failed results."""
    from ..stages.extract import prefetch_batch

    kernel = prefetch_batch if prefetch else extract_batch
    fetched = batch.column("fetched")
    ok = batch.filter(fetched)
    miss = batch.filter(pc.invert(fetched))
    parts = []
    if ok.num_rows:
        parts.append(kernel(ok))
    if miss.num_rows:
        t = kernel(
            miss.set_column(
                miss.schema.get_field_index("html"),
                "html",
                pa.array([b""] * miss.num_rows, pa.large_binary()),
            )
        )
        idx = t.schema.get_field_index("success")
        t = t.set_column(idx, "success", pa.array([False] * t.num_rows))
        idx = t.schema.get_field_index("error_message")
        t = t.set_column(idx, "error_message", pa.array(["fetch miss (404)"] * t.num_rows))
        parts.append(t)
    out = pa.concat_tables(parts) if parts else kernel(batch.slice(0, 0))
    return out


def _wave_summary(
    batch: pa.Table,
    include_external: bool,
    url_filter=None,
    url_scorer=None,
) -> pa.Table:
    """Compact per-result wave summary: status + ordered canonical
    out-links (one row per result; heavy columns dropped).

    When a url_filter / url_scorer is configured, their pure per-URL
    verdicts are evaluated HERE, inside the distributed wave task
    (``canon_ok`` / ``canon_score`` list columns), so driver-side
    discovery only combines precomputed masks — the reference's
    can_process_url / scorer chain (bfs_strategy.py:170-186) runs in
    the fan-out instead of per-link on the driver."""
    orders = batch.column("order").to_pylist()
    urls = batch.column("url").to_pylist()
    succ = batch.column("success").to_pylist()
    codes = batch.column("status_code").to_pylist()
    internal = batch.column("links_internal").to_pylist()
    external = batch.column("links_external").to_pylist() if include_external else None
    canon_lists: list[list[str]] = []
    ok_lists: list[list[bool]] = []
    score_lists: list[list[float]] = []
    verdict_cache: dict[str, tuple[bool, float]] = {}
    for k, (u, s) in enumerate(zip(urls, succ)):
        if not s:
            canon_lists.append([])
            ok_lists.append([])
            score_lists.append([])
            continue
        links = list(internal[k])
        if external is not None:
            links += list(external[k])
        canon = []
        oks: list[bool] = []
        scores: list[float] = []
        for link in links:
            c = normalize_url_for_deep_crawl(link["href"], u)
            if c is None:
                continue
            canon.append(c)
            if url_filter is not None or url_scorer is not None:
                verdict = verdict_cache.get(c)
                if verdict is None:
                    ok = url_filter is None or bool(url_filter(c))
                    score = float(url_scorer(c)) if url_scorer is not None else 0.0
                    verdict = (ok, score)
                    verdict_cache[c] = verdict
                oks.append(verdict[0])
                scores.append(verdict[1])
        canon_lists.append(canon)
        ok_lists.append(oks)
        score_lists.append(scores)
    # 64-bit link hashes computed HERE in the distributed wave task
    # (VERDICT r3 #5: the driver used to blake2b-hash every unique
    # candidate url in its discovery fold — ~1.8 s/run at the 80k
    # shape). Shipped as a list column parallel to canon_urls; the
    # driver routes seen probes/inserts by gathering these.
    from ..functions.hashing import hash64_batch

    flat_canon = [c for lst in canon_lists for c in lst]
    offsets = np.zeros(len(canon_lists) + 1, dtype=np.int32)
    np.cumsum([len(lst) for lst in canon_lists], out=offsets[1:])
    canon_hashes = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        pa.array(hash64_batch(flat_canon), pa.uint64()),
    )
    cols = {
        "order": pa.array(orders, pa.int64()),
        "url": pa.array(urls, pa.string()),
        "host": batch.column("host"),
        "success": pa.array(succ, pa.bool_()),
        "status_code": pa.array(codes, pa.int16()),
        "canon_urls": pa.array(canon_lists, pa.list_(pa.string())),
        "canon_hashes": canon_hashes,
    }
    if url_filter is not None or url_scorer is not None:
        cols["canon_ok"] = pa.array(ok_lists, pa.list_(pa.bool_()))
        cols["canon_score"] = pa.array(score_lists, pa.list_(pa.float64()))
    return pa.table(cols)


def _flat_hashes(tbl: pa.Table, expected_len: int):
    """Flattened wave-task-computed link hashes (canon_hashes) as a
    uint64 ndarray aligned with the flattened canon_urls, or None when
    the column is absent/misaligned (e.g. a permissive concat with a
    summary predating the column nulled some lists) — callers fall
    back to driver-side hashing only in that legacy case."""
    if "canon_hashes" not in tbl.column_names:
        return None
    col = tbl.column("canon_hashes").combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0) if col.num_chunks else pa.array([], pa.list_(pa.uint64()))
    if col.null_count:
        return None
    fh = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.uint64)
    return fh if len(fh) == expected_len else None


def _wave_extract_persist(
    batch: pa.Table,
    corpus_dir: str,
    wave_tmp_dir: str,
    include_external: bool,
    url_filter=None,
    url_scorer=None,
    prefetch: bool = False,
    latency: Optional[dict] = None,
) -> pa.Table:
    """Fused wave task: fetch -> extract -> write part file -> return
    ONLY the compact summary. One Ray execution per wave; the heavy
    result columns go straight from the task's heap to Parquet and
    never enter the object store. Part-file names are deterministic in
    the batch's order range, so a retried task overwrites its own
    partial output (idempotent). ``latency`` (default None = no-op)
    injects the deterministic simulated network-latency model at the
    fetch seam (stages/latency.py): the task sleeps its chunk's
    concurrent-fetch wall time; results are byte-identical either way."""
    prof = os.environ.get("C4R_WAVE_PROFILE")
    t0 = time.perf_counter()
    fetched = fetch_batch(batch, corpus_dir)
    if latency is not None:
        from ..stages.latency import simulate_fetch_latency

        simulate_fetch_latency(batch.column("url").to_pylist(), latency)
    t1 = time.perf_counter()
    out = _wave_extract(fetched, prefetch=prefetch)
    t2 = time.perf_counter()
    lo = min(out.column("order").to_pylist())
    path = os.path.join(wave_tmp_dir, f"part-{lo:012d}-{out.num_rows}.parquet")
    pq.write_table(out.drop_columns(["fetched"]), path + ".tmp")
    os.replace(path + ".tmp", path)
    summary = _wave_summary(out, include_external, url_filter, url_scorer)
    if prof:
        n = summary.num_rows
        for name, val in (
            ("prof_fetch_sec", t1 - t0),
            ("prof_extract_sec", t2 - t1),
            ("prof_write_sec", time.perf_counter() - t2),
        ):
            summary = summary.append_column(
                name, pa.array([val] * n, pa.float64())
            )
    return summary


@ray.remote
def _wave_task(
    batch: pa.Table,
    corpus_dir: str,
    wave_tmp_dir: str,
    include_external: bool,
    url_filter=None,
    url_scorer=None,
    prefetch: bool = False,
    latency: Optional[dict] = None,
) -> pa.Table:
    """One fused wave slice as a plain Ray task (see
    ``run_fetch_extract_wave`` for why this is not a Dataset)."""
    return _wave_extract_persist(
        batch, corpus_dir, wave_tmp_dir, include_external, url_filter, url_scorer,
        prefetch=prefetch, latency=latency,
    )


# prefetch probe flush granularity: candidate-url uniques buffered on
# the driver before one batched contains() round to the seen shards.
# Large enough that a 20k-url wave flushes a handful of times (driver
# actor-call cost O(flushes x shards), not O(parts x shards)), small
# enough that probes still overlap straggler execution.
_SEEN_FLUSH_ROWS = 8192

# overlap_discovery fold granularity: candidate links buffered from
# completed parts before one fold (dictionary dedup + check_and_add
# round) runs on the driver, overlapped with straggler execution
_FOLD_CHUNK_LINKS = 16384

_EMPTY_SUMMARY = pa.table(
    {
        "order": pa.array([], pa.int64()),
        "url": pa.array([], pa.string()),
        "host": pa.array([], pa.string()),
        "success": pa.array([], pa.bool_()),
        "status_code": pa.array([], pa.int16()),
        "canon_urls": pa.array([], pa.list_(pa.string())),
        "canon_hashes": pa.array([], pa.list_(pa.uint64())),
    }
)


def run_fetch_extract_wave(
    corpus_dir: str,
    frontier_tbl: pa.Table,
    out_dir: str,
    wave_id: int,
    batch_size: int = 256,
    include_external: bool = False,
    fetch_concurrency: int = 4,
    prefix: str = "wave",
    parallelism: Optional[int] = None,
    url_filter=None,
    url_scorer=None,
    prefetch: bool = False,
    part_cb=None,
    latency: Optional[dict] = None,
) -> pa.Table:
    """Distributed fetch -> extract -> persist for one ordered frontier
    table. Returns the compact per-result summary (order, url, success,
    status_code, canon_urls). Shared by the BFS / best-first / DFS
    engines. Single fused Ray execution per wave (see
    ``_wave_extract_persist``).

    ``part_cb(part_tbl)``, when given, fires on the DRIVER as each
    task's summary arrives (``ray.wait`` streaming, completion order)
    — the hook the BFS engine uses to overlap discovery prep (link
    flatten + seen-shard probes) with straggler execution. The
    returned concat order stays submission order, so downstream
    results are bit-identical with or without the callback."""
    wave_dir = os.path.join(out_dir, f"{prefix}={wave_id:05d}")
    if frontier_tbl.num_rows == 0:
        return _EMPTY_SUMMARY
    if parallelism is None:
        try:
            parallelism = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            parallelism = 8
    tmp = wave_dir + ".tmp"
    for d in (wave_dir, tmp):
        if os.path.exists(d):
            shutil.rmtree(d)
    os.makedirs(tmp)

    # Range-partition the wave BY URL so each fetch task scans a
    # contiguous slice of the url-sorted corpus: row-group min/max
    # statistics then prune every task's read to the 1-2 row groups
    # covering its range, instead of every task decoding every row
    # group that any of its scattered urls lands in (O(corpus) per
    # task — the scaling killer at high parallelism). Crawl-order
    # parity is untouched: the `order` column, not physical row
    # order, carries it.
    rows = frontier_tbl.num_rows
    sort_idx = pc.sort_indices(frontier_tbl.column("url"))
    sorted_tbl = frontier_tbl.take(sort_idx)
    if rows <= 64:
        # tiny wave (crawl ramp-up): task dispatch + object-store
        # round-trips cost more than the work — run inline on the
        # driver. Identical code path, same part-file layout.
        summary = _wave_extract_persist(
            sorted_tbl,
            corpus_dir,
            tmp,
            include_external,
            ray.get(url_filter) if isinstance(url_filter, ray.ObjectRef) else url_filter,
            ray.get(url_scorer) if isinstance(url_scorer, ray.ObjectRef) else url_scorer,
            prefetch=prefetch,
            latency=latency,
        )
        os.replace(tmp, wave_dir)
        if part_cb is not None:
            part_cb(summary)
        return summary
    # Task granularity: ~2 tasks per CPU so the whole pool works, but
    # batches >= ~32 urls (fetch fixed cost) and <= batch_size
    # (worker heap: html blobs).
    batch_eff = max(16, min(batch_size, -(-rows // (2 * parallelism))))
    n_blocks = max(1, -(-rows // batch_eff))
    # Raw Ray tasks, not a per-wave Dataset: the frontier loop runs
    # one barriered micro-execution per wave, and the streaming
    # executor's fixed startup (~0.25s) times tens of waves was pure
    # serial driver time. This is the documented Dataset-API
    # exception (SURVEY §3.4): an iterative wave barrier with compact
    # task outputs. Dataset map_batches still runs every scan-shaped
    # pipeline (extract_all, queries, dedup).
    def _as_ref(obj):
        if obj is None or isinstance(obj, ray.ObjectRef):
            return obj
        return ray.put(obj)

    filter_ref = _as_ref(url_filter)
    scorer_ref = _as_ref(url_scorer)
    # Latency-injected tasks are network-wait dominated: reserving a
    # full core per in-flight chunk would model a crawler that burns a
    # CPU while blocked on sockets. Fractional num_cpus lets waits
    # overlap (the reference dispatcher's concurrency is memory-
    # bounded, not core-bounded — async_dispatcher.py:148-215); the
    # CPU-bound path (latency=None) keeps 1 CPU per task.
    task = _wave_task if latency is None else _wave_task.options(num_cpus=0.25)
    refs = [
        task.remote(
            sorted_tbl.slice(i * batch_eff, batch_eff),
            corpus_dir,
            tmp,
            include_external,
            filter_ref,
            scorer_ref,
            prefetch,
            latency,
        )
        for i in range(n_blocks)
    ]
    if part_cb is None:
        parts = ray.get(refs)
    else:
        # stream summaries in completion order: the driver folds each
        # part's discovery prep while stragglers are still executing
        idx_of = {r: i for i, r in enumerate(refs)}
        parts = [None] * len(refs)
        pend = list(refs)
        while pend:
            done, pend = ray.wait(pend, num_returns=1)
            t = ray.get(done[0])
            parts[idx_of[done[0]]] = t
            part_cb(t)
    os.replace(tmp, wave_dir)
    return pa.concat_tables(parts) if parts else _EMPTY_SUMMARY


class CrawlStats:
    def __init__(self):
        self.waves: list[dict] = []
        self.pages_crawled = 0
        self.urls_failed = 0
        self.urls_skipped = 0
        self.wall_sec = 0.0
        self.politeness_makespan_sec = 0.0

    def as_dict(self) -> dict:
        return {
            "pages_crawled": self.pages_crawled,
            "urls_failed": self.urls_failed,
            "urls_skipped": self.urls_skipped,
            "wall_sec": self.wall_sec,
            "politeness_makespan_sec": self.politeness_makespan_sec,
            "waves": self.waves,
        }


class BFSCrawler:
    """Distributed BFS deep-crawl over a corpus directory."""

    def __init__(
        self,
        corpus_dir: str,
        out_dir: str,
        *,
        max_depth: int = 3,
        max_pages: float = inf,
        include_external: bool = False,
        url_filter: Optional[Callable[[str], bool]] = None,
        url_scorer: Optional[Callable[[str], float]] = None,
        score_threshold: float = -inf,
        num_seen_shards: int = 8,
        num_politeness_shards: int = 4,
        max_pages_per_host: Optional[int] = None,
        fetch_concurrency: int = 4,
        extract_concurrency: Optional[int] = None,
        batch_size: int = 256,
        max_wave_size: Optional[int] = None,
        frontier_mem_rows: int = 500_000,
        cache_from: Optional[str] = None,
        cache_revalidate: bool = False,
        prefetch: bool = False,
        overlap_discovery: bool = False,
        fetch_latency: Optional[dict] = None,
    ):
        self.corpus_dir = corpus_dir
        self.out_dir = out_dir
        self.max_depth = max_depth
        self.max_pages = max_pages
        self.include_external = include_external
        self.url_filter = url_filter
        self.url_scorer = url_scorer
        self.score_threshold = score_threshold
        self.batch_size = batch_size
        self.fetch_concurrency = fetch_concurrency
        self.extract_concurrency = extract_concurrency
        # frontier scale guards: cap how many urls one wave carries and
        # how many frontier rows the driver holds in memory (overflow
        # spills to Parquet — state/frontier.py)
        self.max_wave_size = max_wave_size
        self.frontier_mem_rows = frontier_mem_rows
        # warm-cache crawl (reference CacheMode.ENABLED +
        # cache_validator): reuse result rows from a previous crawl's
        # output dir; with cache_revalidate, stale rows (changed
        # warc_ts/head fingerprint) are refetched
        self.cache_from = cache_from
        self.cache_revalidate = cache_revalidate
        # prefetch=True: URL-discovery-only crawl (reference
        # README.md:697-701) — same DOM link walk, so frontier/seen/
        # order are identical to a full crawl; markdown/media/tables/
        # cleaned_html are skipped
        self.prefetch = prefetch
        # overlap_discovery=True (SCALE MODE, off by default): the
        # fast discovery path folds completed wave parts into the next
        # frontier WHILE stragglers execute, driving acceptance
        # directly off the seen shards' atomic first-wins
        # ``check_and_add`` per submission chunk. The crawled SET,
        # per-url depth, per-wave page counts and seen set are
        # IDENTICAL to the default (asserted by tests); what relaxes
        # is intra-wave attribution — which co-wave parent/order a
        # duplicate discovery is credited to follows task-completion
        # order instead of the serial simulator's order (the same
        # relaxation best-first's wave_size mode documents). Combined
        # with per-host budgets or max_wave_size, wave boundaries may
        # shift (same completeness).
        self.overlap_discovery = overlap_discovery
        # deterministic simulated network latency at the fetch seam
        # (stages/latency.py); None = no-op. Exists to exhibit the
        # heavy-tailed-straggler shape for the BFS-vs-AsyncCrawler A/B.
        self.fetch_latency = fetch_latency
        self._cached_url_set: Optional[set] = None
        self.stats_cache_hits = 0
        self.seen = ShardedSeen(num_seen_shards)
        self.politeness = PolitenessPool(
            num_politeness_shards, max_pages_per_host=max_pages_per_host
        )
        self.stats = CrawlStats()
        self._pages_crawled = 0
        self._order = 0
        self._wave = 0
        # high-water mark of the politeness virtual schedule (per-wave
        # stall accounting; see _run_wave)
        self._release_max = 0.0
        # per-wave seen-probe prefetch (discovery/exec overlap): the
        # ray.wait part callback fires async contains() probes whose
        # (payload, ref) pairs discovery resolves via an exact Arrow
        # index_in join; cleared each wave (check_and_add stales them).
        # _seen_inflight holds 64-bit url hashes (probe dedup only);
        # _seen_buf accumulates per-part candidate uniques between
        # batched probe flushes (see _flush_seen_probes)
        self._seen_inflight: set = set()
        self._seen_pending: list = []
        self._seen_buf: list = []
        self._seen_buf_rows = 0
        # per-crawl object-store handles for the filter/scorer closures
        # (one ray.put per crawl, not one per wave)
        self._filter_ref = None
        self._scorer_ref = None
        os.makedirs(out_dir, exist_ok=True)

    # -- state ------------------------------------------------------------
    def set_robots(self, robots: dict[str, str]) -> None:
        if robots:
            self.politeness.set_robots(list(robots), list(robots.values()))

    def _ckpt_dir(self) -> str:
        return os.path.join(self.out_dir, "checkpoint")

    def _checkpoint(self, buf) -> None:
        """Pipelined checkpoint: shard-state writes overlap the next
        wave's compute; the manifest for wave W is only renamed into
        place once W's state files are durable (finalized at the
        start of checkpoint W+1, or at crawl end). A crash in the
        window loses at most one wave of checkpoint — resume replays
        from W-1, and ``_run_wave`` rmtree+rewrites its wave dir, so
        the replay is idempotent."""
        self._finalize_checkpoint()
        ck = self._ckpt_dir()
        state_dir = os.path.join(ck, f"state-{self._wave:05d}")
        os.makedirs(state_dir, exist_ok=True)
        refs = self.seen.checkpoint_async(state_dir) + self.politeness.checkpoint_async(
            state_dir
        )
        if isinstance(buf, list):  # plain-list frontier (direct API use)
            head, spill_paths, tail = buf, [], []
        else:
            head, spill_paths, tail = buf.segments()
        spill_names = []
        for src in spill_paths:
            name = os.path.basename(src)
            dst = os.path.join(state_dir, name)
            if not os.path.exists(dst):
                try:
                    os.link(src, dst)  # hardlink: O(1) per spill chunk
                except OSError:
                    shutil.copy2(src, dst)
            spill_names.append(name)
        manifest = {
            "wave": self._wave,
            "order": self._order,
            "pages_crawled": self._pages_crawled,
            "stats": self.stats.as_dict(),
            "state_dir": f"state-{self._wave:05d}",
            "frontier_spill": spill_names,
        }
        ft = _frontier_table(head)
        ft_tail = _frontier_table(tail) if tail else None
        if not spill_paths and not tail and self.max_wave_size is None:
            # whole frontier is in `head`; next wave's take() returns
            # this exact list object, so _run_wave can reuse the table
            self._cached_ft = (head, ft)
        self._ckpt_pending = (refs, manifest, ft, ft_tail)

    def _finalize_checkpoint(self) -> None:
        """Durability order: per-wave state dir (shard state +
        frontier) -> manifest rename -> prune older state dirs. The
        manifest names its state dir, so a crash at any point leaves
        a consistent manifest/state pair (possibly one wave old)."""
        pending = getattr(self, "_ckpt_pending", None)
        if pending is None:
            return
        refs, manifest, ft, ft_tail = pending
        ray.get(refs)
        ck = self._ckpt_dir()
        state_dir = os.path.join(ck, manifest["state_dir"])
        tmp = os.path.join(state_dir, "frontier.parquet.tmp")
        pq.write_table(ft, tmp)
        os.replace(tmp, os.path.join(state_dir, "frontier.parquet"))
        if ft_tail is not None:
            tmp = os.path.join(state_dir, "frontier_tail.parquet.tmp")
            pq.write_table(ft_tail, tmp)
            os.replace(tmp, os.path.join(state_dir, "frontier_tail.parquet"))
        with open(os.path.join(ck, "manifest.json.tmp"), "w") as f:
            json.dump(manifest, f)
        os.replace(
            os.path.join(ck, "manifest.json.tmp"), os.path.join(ck, "manifest.json")
        )
        for d in os.listdir(ck):
            if d.startswith("state-") and d != manifest["state_dir"]:
                shutil.rmtree(os.path.join(ck, d), ignore_errors=True)
        self._ckpt_pending = None

    def restore(self, buf=None) -> bool:
        ck = self._ckpt_dir()
        mpath = os.path.join(ck, "manifest.json")
        if not os.path.exists(mpath):
            return False
        with open(mpath) as f:
            manifest = json.load(f)
        self._wave = manifest["wave"]
        self._order = manifest["order"]
        self._pages_crawled = manifest["pages_crawled"]
        state_dir = os.path.join(ck, manifest["state_dir"]) if "state_dir" in manifest else ck
        self.seen.restore(state_dir)
        self.politeness.restore(state_dir)

        def _rows(path):
            if not os.path.exists(path):
                return []
            ft = pq.read_table(path)
            return list(
                zip(
                    ft.column("url").to_pylist(),
                    ft.column("depth").to_pylist(),
                    ft.column("parent_url").to_pylist(),
                    ft.column("order").to_pylist(),
                )
            )

        head = _rows(os.path.join(state_dir, "frontier.parquet"))
        tail = _rows(os.path.join(state_dir, "frontier_tail.parquet"))
        spill = [
            os.path.join(state_dir, name)
            for name in manifest.get("frontier_spill", [])
        ]
        if buf is not None:
            buf.restore_segments(head, spill, tail)
        return True

    # -- main loop --------------------------------------------------------
    def run(
        self,
        seeds: list[str],
        robots: Optional[dict[str, str]] = None,
        resume: bool = False,
        should_cancel: Optional[Callable[[], bool]] = None,
    ):
        for _ in self.run_stream(
            seeds, robots=robots, resume=resume, should_cancel=should_cancel
        ):
            pass
        return self.stats

    def run_stream(
        self,
        seeds: list[str],
        robots: Optional[dict[str, str]] = None,
        resume: bool = False,
        should_cancel: Optional[Callable[[], bool]] = None,
    ):
        """Streaming mode (reference dual batch/stream APIs,
        async_webcrawler.py:1085-1126): yields each completed wave's
        results directory path as soon as its checkpoint lands, so a
        consumer can read/export waves while the crawl continues."""
        from ..state.frontier import FrontierBuffer

        t0 = time.perf_counter()
        buf = FrontierBuffer(
            os.path.join(self.out_dir, "_frontier_spill"),
            mem_rows=self.frontier_mem_rows,
        )
        restored = self.restore(buf) if resume else False
        if not restored:
            self.set_robots(robots or {})
            seed_rows = []
            for u in seeds:
                seed_rows.append((u, 0, None, self._order))
                self._order += 1
            buf.extend(seed_rows)

        while len(buf) and self._pages_crawled < self.max_pages:
            # cooperative cancellation between waves (reference
            # should_cancel, bfs_strategy.py:103-131); the checkpoint
            # for the previous wave is finalized so resume is exact
            if should_cancel is not None and should_cancel():
                break
            wave_id = self._wave
            wave_rows = buf.take(
                min(len(buf), self.max_wave_size) if self.max_wave_size else len(buf)
            )
            buf.extend(self._run_wave(wave_rows))
            self._wave += 1
            self._checkpoint(buf)
            wave_dir = os.path.join(self.out_dir, f"wave={wave_id:05d}")
            if os.path.exists(wave_dir):
                yield wave_dir

        self._finalize_checkpoint()
        self.stats.wall_sec = time.perf_counter() - t0
        self.stats.pages_crawled = self._pages_crawled
        # politeness stalls are budget, not engine time — report the
        # virtual-schedule makespan separately (SURVEY §7.5)
        try:
            self.stats.politeness_makespan_sec = self.politeness.stats()[
                "politeness_makespan_sec"
            ]
        except Exception:
            self.stats.politeness_makespan_sec = 0.0
        self._write_metrics()

    def _run_wave(self, frontier: list) -> list:
        wave_t0 = time.perf_counter()
        cached = getattr(self, "_cached_ft", None)
        if cached is not None and cached[0] is frontier:
            ft = cached[1]
        else:
            ft = _frontier_table(frontier)
        self._cached_ft = None
        urls = ft.column("url").to_pylist()
        hosts = ft.column("host").to_pylist()

        # 0. warm-cache split: rows served from a previous crawl's
        # output bypass fetch AND the politeness gate (no network
        # request happens for a cache hit — reference CacheMode)
        cached_summary = None
        if self.cache_from is not None:
            ft, cached_summary = self._serve_from_cache(ft)
            urls = ft.column("url").to_pylist()
            hosts = ft.column("host").to_pylist()

        # 1. politeness gate (robots + crawl-delay virtual schedule)
        gate = self.politeness.gate(urls, hosts)
        allowed = gate["allowed"] & gate["budget_ok"]
        denied_tbl = ft.filter(pa.array(~allowed))
        go_tbl = ft.filter(pa.array(allowed))
        # Politeness-stall accounting (SURVEY §7.5, VERDICT r4 #8):
        # the gate's virtual release times say when a real crawler
        # could fetch each admitted url under per-host crawl-delay;
        # this wave's stall = how far the wave pushes the virtual
        # makespan forward. On a hot-host-skewed corpus this separates
        # "the engine was slow" from "politeness serialized the hot
        # host" — engine-busy seconds (sec/gate/exec/discover) and
        # stall seconds are reported side by side per wave.
        if bool(allowed.any()):
            wave_rel_max = float(gate["release"][allowed].max())
        else:
            wave_rel_max = self._release_max
        wave_stall = max(0.0, wave_rel_max - self._release_max)
        self._release_max = max(self._release_max, wave_rel_max)
        t_gate = time.perf_counter()

        # 2. fetch + extract + persist (distributed, streaming). The
        # part callback overlaps discovery prep with stragglers: as
        # each task summary lands, its candidate links are flattened
        # and probed against the seen shards (read-only during a wave,
        # so verdicts equal discovery-time `contains`).
        wave_dir = os.path.join(self.out_dir, f"wave={self._wave:05d}")
        self._seen_inflight.clear()
        self._seen_pending.clear()
        self._seen_buf = []
        self._seen_buf_rows = 0
        fast_path = (
            self.url_filter is None
            and self.url_scorer is None
            and self.max_pages == inf
        )
        overlap = self.overlap_discovery and fast_path
        if overlap:
            n_f = len(frontier)
            self._ov_orders = np.fromiter(
                (t[3] for t in frontier), dtype=np.int64, count=n_f
            )
            self._ov_depths = np.fromiter(
                (t[1] for t in frontier), dtype=np.int64, count=n_f
            )
            self._ov_parts = []
            self._ov_links = 0
            self._ov_frontier = []
        if self.url_filter is not None and self._filter_ref is None:
            self._filter_ref = ray.put(self.url_filter)
        if self.url_scorer is not None and self._scorer_ref is None:
            self._scorer_ref = ray.put(self.url_scorer)
        status_tbl = run_fetch_extract_wave(
            self.corpus_dir,
            go_tbl,
            self.out_dir,
            self._wave,
            batch_size=self.batch_size,
            include_external=self.include_external,
            fetch_concurrency=self.fetch_concurrency,
            url_filter=self._filter_ref if self.url_filter is not None else None,
            url_scorer=self._scorer_ref if self.url_scorer is not None else None,
            prefetch=self.prefetch,
            part_cb=self._overlap_fold_part if overlap else self._prefetch_seen_part,
            latency=self.fetch_latency,
        )
        if cached_summary is not None and cached_summary.num_rows:
            status_tbl = pa.concat_tables(
                [status_tbl, cached_summary], promote_options="permissive"
            )
            if overlap:
                # cached rows discover too — fold them as one more part
                self._overlap_fold_part(cached_summary)
        self._merge_cached_parts()
        t_exec = time.perf_counter()

        # 3. politeness feedback (backoff/decay per host)
        if status_tbl.num_rows:
            self.politeness.update(
                status_tbl.column("host").to_pylist(),
                status_tbl.column("status_code").to_pylist(),
            )

        # 4. merge failures (robots-denied) into the wave result order
        denied_orders = set(denied_tbl.column("order").to_pylist())
        n_success = int(pc.sum(status_tbl.column("success")).as_py() or 0)
        if denied_tbl.num_rows:
            self._write_denied(denied_tbl, wave_dir)

        # 5. link discovery + seen dedup + next frontier
        if overlap:
            next_frontier = self._discover_overlap_tail(frontier, status_tbl)
        elif fast_path:
            next_frontier = self._discover_fast(
                frontier, status_tbl, denied_orders
            )
        elif not getattr(self, "use_serial_discovery", False):
            # filter/scorer verdicts precomputed in the wave tasks;
            # only the capacity tail is serial (O(results))
            next_frontier = self._discover_filtered(
                frontier, status_tbl, denied_orders
            )
        else:
            # reference-shaped serial loop, kept as the semantics spec
            # for the bit-equality parity tests
            success_by_order = dict(
                zip(
                    status_tbl.column("order").to_pylist(),
                    status_tbl.column("success").to_pylist(),
                )
            )
            links_by_order = dict(
                zip(
                    status_tbl.column("order").to_pylist(),
                    status_tbl.column("canon_urls").to_pylist(),
                )
            )
            next_frontier = self._discover(
                frontier, links_by_order, success_by_order, denied_orders
            )

        now = time.perf_counter()
        self.stats.waves.append(
            {
                "wave": self._wave,
                "frontier": len(frontier),
                "fetched": int(go_tbl.num_rows),
                "denied": int(denied_tbl.num_rows),
                "successes": n_success,
                "next_frontier": len(next_frontier),
                "sec": round(now - wave_t0, 3),
                "gate_sec": round(t_gate - wave_t0, 3),
                "exec_sec": round(t_exec - t_gate, 3),
                "discover_sec": round(now - t_exec, 3),
                # engine-busy vs politeness-stall split: `sec` is what
                # the engine spent; `stall_sec` is the virtual-schedule
                # wait a real crawler would ALSO pay this wave
                "stall_sec": round(wave_stall, 3),
                "release_max_sec": round(self._release_max, 3),
            }
        )
        return next_frontier

    def _serve_from_cache(self, ft: pa.Table):
        """Split a frontier table into cache misses (returned for the
        normal fetch path) and cache hits, whose result rows are read
        from ``cache_from``, re-persisted into THIS crawl's wave dir
        with this run's order/depth/parent, and summarized exactly like
        fetched rows — so discovery, stats and crawl_log are
        bit-identical to a cold crawl.  With ``cache_revalidate``,
        hits whose validators went stale fall back to the fetch path
        (reference cache_validator semantics)."""
        from .cache import read_cached_results, revalidate_cached

        if self._cached_url_set is None:
            from .cache import completed_urls

            self._cached_url_set = set(completed_urls(self.cache_from).to_pylist())
        urls = ft.column("url").to_pylist()
        hit_mask = np.fromiter(
            (u in self._cached_url_set for u in urls), dtype=bool, count=len(urls)
        )
        if not hit_mask.any():
            return ft, None
        hits_ft = ft.filter(pa.array(hit_mask))
        cached = read_cached_results(
            self.cache_from, hits_ft.column("url"), columns=None
        )
        if self.cache_revalidate and cached.num_rows:
            cached = revalidate_cached(cached, self.corpus_dir)
            keep = pc.is_in(
                cached.column("validation"),
                value_set=pa.array(["fresh", "error"]),
            )
            stale_urls = set(
                cached.filter(pc.invert(keep)).column("url").to_pylist()
            )
            cached = cached.drop_columns(["validation"]).filter(keep)
            if stale_urls:
                for u in stale_urls:
                    self._cached_url_set.discard(u)
                stale_mask = np.fromiter(
                    (u in stale_urls for u in urls), dtype=bool, count=len(urls)
                )
                hit_mask &= ~stale_mask
                hits_ft = ft.filter(pa.array(hit_mask))
        if not hit_mask.any():
            return ft, None
        miss_ft = ft.filter(pa.array(~hit_mask))

        # align cached rows to THIS run's frontier metadata
        idx = pc.index_in(hits_ft.column("url"), cached.column("url"))
        aligned = cached.take(idx)
        for col in ("order", "depth", "parent_url", "host"):
            src = hits_ft.column(col)
            if col in aligned.column_names:
                aligned = aligned.set_column(
                    aligned.schema.get_field_index(col), col, src
                )
            else:
                aligned = aligned.append_column(col, src)
        self.stats_cache_hits += int(hit_mask.sum())

        # persist into this crawl's wave dir (same layout as fetched)
        wave_dir = os.path.join(self.out_dir, f"wave={self._wave:05d}")
        tmp = wave_dir + ".cached.tmp"
        os.makedirs(tmp, exist_ok=True)
        lo = min(aligned.column("order").to_pylist())
        path = os.path.join(tmp, f"part-{lo:012d}-{aligned.num_rows}.parquet")
        pq.write_table(aligned, path + ".tmp")
        os.replace(path + ".tmp", path)
        self._pending_cached_parts = getattr(self, "_pending_cached_parts", [])
        self._pending_cached_parts.append((tmp, wave_dir))

        summary = _wave_summary(
            aligned, self.include_external, self.url_filter, self.url_scorer
        )
        return miss_ft, summary

    def _merge_cached_parts(self) -> None:
        for tmp, wave_dir in getattr(self, "_pending_cached_parts", []):
            os.makedirs(wave_dir, exist_ok=True)
            for f in os.listdir(tmp):
                os.replace(os.path.join(tmp, f), os.path.join(wave_dir, f))
            shutil.rmtree(tmp, ignore_errors=True)
        self._pending_cached_parts = []

    def _write_denied(self, denied_tbl: pa.Table, wave_dir: str) -> None:
        """Persist robots-denied rows alongside the wave results."""
        os.makedirs(wave_dir, exist_ok=True)
        t = pa.table(
            {
                "url": denied_tbl.column("url"),
                "order": denied_tbl.column("order"),
                "depth": denied_tbl.column("depth"),
                "parent_url": denied_tbl.column("parent_url"),
                "success": pa.array([False] * denied_tbl.num_rows),
                "status_code": pa.array([403] * denied_tbl.num_rows, pa.int16()),
                "error_message": pa.array(
                    ["Access denied by robots.txt"] * denied_tbl.num_rows
                ),
            }
        )
        path = os.path.join(wave_dir, "denied.parquet")
        pq.write_table(t, path + ".tmp")
        os.replace(path + ".tmp", path)

    def _discover(
        self,
        frontier: list,
        by_order: dict,
        success_by_order: dict,
        denied_orders: set,
    ) -> list:
        """Sequential-semantics link acceptance over compact metadata.

        Replicates bfs_strategy link_discovery exactly: iterate wave
        results in frontier order; visited first-wins (including
        additions made earlier in the same wave); per-result capacity
        truncation against ``max_pages``; truncated urls stay seen.
        """
        # one batched membership probe against the seen shards
        all_urls = sorted({cu for lst in by_order.values() for cu in lst})
        pre_seen = (
            dict(zip(all_urls, self.seen.contains(all_urls))) if all_urls else {}
        )

        next_frontier: list = []
        wave_accepted: list[str] = []
        wave_local: set[str] = set()
        for url, depth, parent, order in frontier:
            if order in denied_orders:
                self.stats.urls_failed += 1
                continue
            success = success_by_order.get(order, False)
            if not success:
                self.stats.urls_failed += 1
                continue
            self._pages_crawled += 1
            next_depth = depth + 1
            if next_depth > self.max_depth:
                continue
            remaining = self.max_pages - self._pages_crawled
            if remaining <= 0:
                continue
            valid: list[tuple[str, float]] = []
            for canon in by_order.get(order, []):
                if canon in wave_local or pre_seen.get(canon, False):
                    continue
                if not is_valid_crawl_url(canon):
                    self.stats.urls_skipped += 1
                    continue
                if self.url_filter is not None and not self.url_filter(canon):
                    self.stats.urls_skipped += 1
                    continue
                score = self.url_scorer(canon) if self.url_scorer else 0.0
                if score < self.score_threshold:
                    self.stats.urls_skipped += 1
                    continue
                wave_local.add(canon)
                wave_accepted.append(canon)
                valid.append((canon, score))
            if len(valid) > remaining:
                if self.url_scorer:
                    valid.sort(key=lambda x: x[1], reverse=True)
                valid = valid[: int(remaining)]
            for u, _ in valid:
                next_frontier.append((u, next_depth, url, self._order))
                self._order += 1

        if wave_accepted:
            self.seen.check_and_add(wave_accepted, list(range(len(wave_accepted))))
        return next_frontier

    def _discover_filtered(
        self,
        frontier: list,
        status_tbl: pa.Table,
        denied_orders: set,
    ) -> list:
        """Vectorized discovery for the filter/scorer/max_pages path —
        bit-equivalent to ``_discover`` (pinned by
        tests/test_crawl_parity.py), with the per-URL predicate work
        already done in the wave tasks (``canon_ok``/``canon_score``
        summary columns) and only the per-result capacity tail serial.

        Sequential semantics reproduced exactly:
        - results processed in frontier ``order``;
        - ``wave_local`` first-occurrence-wins == dictionary-encode
          first appearance over the *considered* flat link stream
          (results that fail, exceed depth, or arrive after capacity
          exhaustion contribute no links — their links are neither
          counted skipped nor marked seen);
        - rejected urls (invalid / filtered / below threshold) never
          enter ``wave_local`` so every occurrence counts skipped,
          except occurrences of urls already seen before the wave;
        - accepted urls are marked seen even when capacity-truncated.
        """
        n = len(frontier)
        orders = np.fromiter((t[3] for t in frontier), dtype=np.int64, count=n)
        depths = np.fromiter((t[1] for t in frontier), dtype=np.int64, count=n)

        st = status_tbl.sort_by("order") if status_tbl.num_rows else status_tbl
        st_succ = (
            st.column("success").to_numpy(zero_copy_only=False)
            if st.num_rows
            else np.zeros(0, dtype=bool)
        )
        n_success = int(st_succ.sum())
        self.stats.urls_failed += n - n_success
        pages_before = self._pages_crawled
        self._pages_crawled += n_success
        if st.num_rows == 0:
            return []

        pos = np.searchsorted(
            orders, st.column("order").to_numpy(zero_copy_only=False)
        )
        depth_next = depths[pos] + 1
        # capacity: remaining BEFORE links of result r are examined =
        # max_pages - (pages_before + successes up to and incl. r)
        succ_prefix = np.cumsum(st_succ)
        if self.max_pages == inf:
            remaining = np.full(st.num_rows, np.inf)
        else:
            remaining = self.max_pages - (pages_before + succ_prefix)
        consider = st_succ & (depth_next <= self.max_depth) & (remaining > 0)
        if not consider.any():
            return []
        st_keep = st.filter(pa.array(consider))
        depth_keep = depth_next[consider]
        remaining_keep = remaining[consider]

        lc = st_keep.column("canon_urls").combine_chunks()
        if isinstance(lc, pa.ChunkedArray):
            lc = lc.chunk(0) if lc.num_chunks else pa.array([], pa.list_(pa.string()))
        lengths = pc.list_value_length(lc).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lc)
        if len(flat) == 0:
            return []

        def _flat_col(name, default):
            if name in st_keep.column_names:
                col = st_keep.column(name).combine_chunks()
                if isinstance(col, pa.ChunkedArray):
                    col = col.chunk(0)
                return pc.list_flatten(col).to_numpy(zero_copy_only=False)
            return np.full(len(flat), default)

        ok_flat = _flat_col("canon_ok", True).astype(bool)
        score_flat = _flat_col("canon_score", 0.0).astype(np.float64)

        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        _, first_pos = np.unique(codes, return_index=True)

        # unique candidates stay an ARROW array end-to-end: seen
        # probes hash the utf-8 buffer and ship per-shard Arrow takes;
        # validity is an RE2 kernel. Python strings materialize only
        # for ACCEPTED urls (frontier tuples need them).
        uniq_arr = enc.dictionary
        seen_u = self._seen_contains(uniq_arr)
        valid_u = valid_crawl_mask_arrow(uniq_arr)
        # per-unique verdicts (pure per-url, so first occurrence's
        # verdict is THE verdict)
        ok_u = ok_flat[first_pos]
        score_u = score_flat[first_pos]
        reject_u = ~valid_u | ~ok_u | (score_u < self.score_threshold)
        skip_u = ~seen_u & reject_u
        if skip_u.any():
            self.stats.urls_skipped += int(
                np.isin(codes, np.flatnonzero(skip_u)).sum()
            )
        accept_u = ~seen_u & ~reject_u
        accept_flat_pos = np.sort(first_pos[accept_u])
        if accept_flat_pos.size == 0:
            return []

        # accepted urls become seen in acceptance (first-occurrence)
        # order, BEFORE capacity truncation — truncated urls stay seen
        acc_codes = codes[accept_flat_pos]
        accepted_arr = uniq_arr.take(pa.array(acc_codes, pa.int64()))
        flat_h = _flat_hashes(st_keep, len(flat))
        self.seen.check_and_add(
            accepted_arr,
            list(range(len(accepted_arr))),
            hashes=flat_h[accept_flat_pos] if flat_h is not None else None,
        )
        url_of = dict(zip(acc_codes, accepted_arr.to_pylist()))

        # serial capacity tail: O(results), numpy slices per result
        result_starts = np.concatenate(([0], np.cumsum(lengths)))
        result_of_flat = np.searchsorted(
            result_starts, accept_flat_pos, side="right"
        ) - 1
        parents = st_keep.column("url").to_pylist()
        next_frontier: list = []
        for r in np.unique(result_of_flat):
            sel = accept_flat_pos[result_of_flat == r]
            cap = remaining_keep[r]
            entries = [(url_of[codes[p]], float(score_flat[p])) for p in sel]
            if len(entries) > cap:
                if self.url_scorer is not None:
                    entries.sort(key=lambda x: x[1], reverse=True)
                entries = entries[: int(cap)]
            d = int(depth_keep[r])
            parent = parents[r]
            for u, _s in entries:
                next_frontier.append((u, d, parent, self._order))
                self._order += 1
        return next_frontier

    def _overlap_fold_part(self, part: pa.Table) -> None:
        """overlap_discovery part hook (driver, between ``ray.wait``
        returns): buffer the completed part; once the buffer holds
        ``_FOLD_CHUNK_LINKS`` candidate links, fold the chunk into the
        next frontier while stragglers are still executing."""
        if part.num_rows == 0:
            return
        self._ov_parts.append(part)
        if "canon_urls" in part.column_names:
            self._ov_links += int(
                pc.sum(pc.list_value_length(part.column("canon_urls"))).as_py()
                or 0
            )
        if self._ov_links >= _FOLD_CHUNK_LINKS:
            self._ov_fold_chunk()

    def _ov_fold_chunk(self) -> None:
        """Fold the buffered parts into the next frontier. Acceptance
        is driven DIRECTLY by the seen shards' atomic first-wins
        ``check_and_add`` new-mask (no separate pre-wave contains round
        — the shards are the single source of truth, so cross-chunk
        duplicates resolve exactly). The skip stat probes pre-wave
        ``contains`` for the INVALID uniques only, which intra-wave
        mutation never touches (only valid urls are ever added), so
        stats totals equal the default path's."""
        parts = self._ov_parts
        self._ov_parts = []
        self._ov_links = 0
        if not parts:
            return
        st = pa.concat_tables(parts, promote_options="permissive")
        if st.num_rows == 0:
            return
        succ = st.column("success").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(
            self._ov_orders, st.column("order").to_numpy(zero_copy_only=False)
        )
        depth_next = self._ov_depths[pos] + 1
        keep = succ & (depth_next <= self.max_depth)
        if not keep.any():
            return
        st_keep = st.filter(pa.array(keep))
        depth_keep = depth_next[keep]
        lc = st_keep.column("canon_urls").combine_chunks()
        if isinstance(lc, pa.ChunkedArray):
            lc = lc.chunk(0) if lc.num_chunks else pa.array([], pa.list_(pa.string()))
        lengths = pc.list_value_length(lc).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lc)
        if len(flat) == 0:
            return
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        _, first_pos = np.unique(codes, return_index=True)
        uniq_arr = enc.dictionary
        valid_u = valid_crawl_mask_arrow(uniq_arr)
        inv = ~valid_u
        if inv.any():
            inv_seen = np.asarray(
                self.seen.contains(uniq_arr.filter(pa.array(inv))), dtype=bool
            )
            bad_codes = np.flatnonzero(inv)[~inv_seen]
            if bad_codes.size:
                self.stats.urls_skipped += int(np.isin(codes, bad_codes).sum())
        cand_pos = np.sort(first_pos[valid_u])
        if cand_pos.size == 0:
            return
        cand_arr = uniq_arr.take(pa.array(codes[cand_pos], pa.int64()))
        flat_h = _flat_hashes(st_keep, len(flat))
        acc = np.asarray(
            self.seen.check_and_add(
                cand_arr,
                list(range(len(cand_arr))),
                hashes=flat_h[cand_pos] if flat_h is not None else None,
            ),
            dtype=bool,
        )
        if not acc.any():
            return
        acc_pos = cand_pos[acc]
        parents = np.repeat(
            st_keep.column("url").to_numpy(zero_copy_only=False), lengths
        )
        depth_flat = np.repeat(depth_keep, lengths)
        accepted_urls = cand_arr.filter(pa.array(acc)).to_pylist()
        for u, p in zip(accepted_urls, acc_pos):
            self._ov_frontier.append(
                (u, int(depth_flat[p]), parents[p], self._order)
            )
            self._order += 1

    def _discover_overlap_tail(self, frontier: list, status_tbl: pa.Table) -> list:
        """Wave-end bookkeeping for overlap_discovery: fold whatever
        the part hook still holds, account pages/failures from the
        full status table, and hand over the accumulated frontier."""
        self._ov_fold_chunk()
        n = len(frontier)
        st_succ = (
            status_tbl.column("success").to_numpy(zero_copy_only=False)
            if status_tbl.num_rows
            else np.zeros(0, dtype=bool)
        )
        n_success = int(st_succ.sum())
        self.stats.urls_failed += n - n_success
        self._pages_crawled += n_success
        out = self._ov_frontier
        self._ov_frontier = []
        return out

    def _prefetch_seen_part(self, part: pa.Table) -> None:
        """Part-completion hook (runs on the driver between
        ``ray.wait`` returns): flatten the part's candidate links into
        a per-wave buffer; once the buffer holds ``_SEEN_FLUSH_ROWS``
        uniques a batched async ``contains`` probe ships to the seen
        shards, so the straggler tail of the wave pays for the RPC
        round-trips that discovery would otherwise serialize. Buffered
        flushing (vs one RPC per part per shard) keeps the driver's
        serial cost at O(flushes x shards) actor calls and hashes each
        hot url once per flush instead of once per part. Read-only —
        the seen set only mutates in discovery's ``check_and_add``
        AFTER all parts resolve, so a prefetched verdict equals the
        discovery-time verdict."""
        if part.num_rows == 0 or "canon_urls" not in part.column_names:
            return
        flat = pc.list_flatten(part.column("canon_urls"))
        if len(flat) == 0:
            return
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        fh = _flat_hashes(part, len(flat))
        if fh is None:  # summary predates canon_hashes — hash here
            from ..functions.hashing import hash64_batch

            fh = hash64_batch(flat)
        # dedup by the task-computed hash (no driver hashing; a hash
        # collision only drops a PROBE — the unresolved url falls back
        # to an exact batched probe in _seen_contains)
        hu, first = np.unique(fh, return_index=True)
        uniq = flat.take(pa.array(first, pa.int64()))
        self._seen_buf.append((uniq, hu))
        self._seen_buf_rows += len(uniq)
        if self._seen_buf_rows >= _SEEN_FLUSH_ROWS:
            self._flush_seen_probes()

    def _flush_seen_probes(self) -> None:
        """Dedup the buffered candidate urls by their 64-bit hashes —
        computed in the WAVE TASKS (canon_hashes column), never on the
        driver — against this wave's already-probed set (a vanishingly
        unlikely hash collision only SKIPS a probe; the unresolved url
        falls back to an exact batched probe in ``_seen_contains``, so
        verdicts stay exact) and fire one async ``contains`` per
        touched shard. The same hashes route shards (hash % shards as
        ShardedSeen._route), one buffer pass total, zero Python
        strings AND zero blake2b calls on the driver."""
        if not self._seen_buf:
            return
        h_all = np.concatenate([h for _, h in self._seen_buf])
        merged_all = pa.chunked_array(
            [u for u, _ in self._seen_buf]
        ).combine_chunks()
        self._seen_buf = []
        self._seen_buf_rows = 0
        h, first = np.unique(h_all, return_index=True)
        merged = merged_all.take(pa.array(first, pa.int64()))
        inflight = self._seen_inflight
        fresh = np.fromiter(
            (int(x) not in inflight for x in h), dtype=bool, count=len(h)
        )
        if not fresh.any():
            return
        inflight.update(int(x) for x in h[fresh])
        sub_all = merged.filter(pa.array(fresh))
        shard_ids = (h[fresh] % np.uint64(self.seen.num_shards)).astype(np.int64)
        for s in np.unique(shard_ids):
            sub = sub_all.take(pa.array(np.flatnonzero(shard_ids == s), pa.int64()))
            self._seen_pending.append(
                (sub, self.seen.shards[s].contains.remote(sub))
            )

    def _seen_contains(self, uniq) -> np.ndarray:
        """``seen.contains`` with the per-wave prefetched probe results
        resolved first — ONE exact Arrow index_in join against the
        concatenation of every in-flight probe payload (payloads are
        disjoint by construction: each flush dedups against the wave's
        probed-hash set), no url hashing in the verdict path. Anything
        the prefetch missed (e.g. warm-cache summary rows) falls back
        to a normal batched probe. Accepts a pyarrow string Array or a
        list."""
        self._flush_seen_probes()
        if not isinstance(uniq, pa.Array):
            uniq = pa.array(uniq, pa.string())
        out = np.zeros(len(uniq), dtype=bool)
        resolved = np.zeros(len(uniq), dtype=bool)
        if self._seen_pending:
            verds = ray.get([ref for _, ref in self._seen_pending])
            value_set = pa.chunked_array([sub for sub, _ in self._seen_pending])
            self._seen_pending.clear()
            verd = np.concatenate(
                [np.asarray(v, dtype=bool) for v in verds]
            ) if verds else np.zeros(0, dtype=bool)
            idx = pc.index_in(uniq, value_set=value_set)
            posn = pc.fill_null(idx, -1).to_numpy(zero_copy_only=False).astype(np.int64)
            resolved = posn >= 0
            if resolved.any():
                out[resolved] = verd[posn[resolved]]
        missing = ~resolved
        if missing.any():
            sub = uniq.filter(pa.array(missing))
            out[missing] = self.seen.contains(sub)
        return out

    def _discover_fast(
        self,
        frontier: list,
        status_tbl: pa.Table,
        denied_orders: set,
    ) -> list:
        """Arrow-vectorized `_discover` for the
        no-filter/no-scorer/no-cap case (the common bulk-crawl
        shape). Bit-equivalent to the sequential path:

        - results are processed in frontier (order-column) sequence —
          enforced by an arrow sort, not task completion order;
        - first-occurrence-wins dedup in that flat sequence IS the
          sequential path's `wave_local` semantics — computed via
          dictionary-encoding (codes assigned at first appearance);
        - Python touches only UNIQUE candidate urls (seen probe +
          validity), never the per-occurrence stream.

        Stats parity: every occurrence of an unseen invalid url is
        counted skipped (invalid urls never enter `wave_local`, so
        the sequential path re-counts each occurrence).
        """
        n = len(frontier)
        orders = np.fromiter((t[3] for t in frontier), dtype=np.int64, count=n)
        depths = np.fromiter((t[1] for t in frontier), dtype=np.int64, count=n)

        st = status_tbl.sort_by("order") if status_tbl.num_rows else status_tbl
        st_succ = (
            st.column("success").to_numpy(zero_copy_only=False)
            if st.num_rows
            else np.zeros(0, dtype=bool)
        )
        n_success = int(st_succ.sum())
        # every frontier entry either succeeded or failed (denied rows
        # are absent from status and count failed)
        self.stats.urls_failed += n - n_success
        self._pages_crawled += n_success
        if st.num_rows == 0:
            return []

        # frontier index of each status row (orders are ascending)
        pos = np.searchsorted(
            orders, st.column("order").to_numpy(zero_copy_only=False)
        )
        depth_next = depths[pos] + 1
        keep = st_succ & (depth_next <= self.max_depth)
        if not keep.any():
            return []
        st_keep = st.filter(pa.array(keep))
        depth_keep = depth_next[keep]

        lc = st_keep.column("canon_urls").combine_chunks()
        if isinstance(lc, pa.ChunkedArray):
            lc = lc.chunk(0) if lc.num_chunks else pa.array([], pa.list_(pa.string()))
        lengths = pc.list_value_length(lc).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lc)
        if len(flat) == 0:
            return []
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        # dictionary codes are assigned at first appearance, so
        # np.unique(return_index) yields each code's first flat pos
        _, first_pos = np.unique(codes, return_index=True)

        # Arrow end-to-end (see _discover_filtered): the driver never
        # builds a Python string per unique candidate url
        uniq_arr = enc.dictionary
        seen_u = self._seen_contains(uniq_arr)
        valid_u = valid_crawl_mask_arrow(uniq_arr)
        bad_u = ~seen_u & ~valid_u
        if bad_u.any():
            self.stats.urls_skipped += int(np.isin(codes, np.flatnonzero(bad_u)).sum())
        accept_u = ~seen_u & valid_u
        acc_pos = np.sort(first_pos[accept_u])
        if acc_pos.size == 0:
            return []

        parents = np.repeat(
            st_keep.column("url").to_numpy(zero_copy_only=False), lengths
        )
        depth_flat = np.repeat(depth_keep, lengths)
        accepted_arr = uniq_arr.take(pa.array(codes[acc_pos], pa.int64()))
        accepted_urls = accepted_arr.to_pylist()  # frontier needs str
        next_frontier = []
        for u, p in zip(accepted_urls, acc_pos):
            next_frontier.append(
                (u, int(depth_flat[p]), parents[p], self._order)
            )
            self._order += 1
        flat_h = _flat_hashes(st_keep, len(flat))
        self.seen.check_and_add(
            accepted_arr,
            list(range(len(accepted_arr))),
            hashes=flat_h[acc_pos] if flat_h is not None else None,
        )
        return next_frontier

    def close(self, kill: bool = False) -> None:
        """Release the seen/politeness actor pools. Idempotent.
        Default parks the shard actors in the process-level reuse
        pool (state/reuse.py) so the next crawler skips actor spawn;
        ``kill=True`` terminates them."""
        self._finalize_checkpoint()
        self.seen.close(kill=kill)
        self.politeness.close(kill=kill)

    def _write_metrics(self) -> None:
        """Per-wave metrics/lineage table (SURVEY §2.8 CrawlerMonitor,
        §4 metrics rollup): one Parquet row per wave with frontier
        size, fetch/deny/success counts and phase timings — the
        observability record a long crawl is debugged from."""
        if not self.stats.waves:
            return
        cols = sorted(self.stats.waves[0])
        t = pa.table(
            {c: pa.array([w.get(c) for w in self.stats.waves]) for c in cols}
        )
        path = os.path.join(self.out_dir, "metrics.parquet")
        pq.write_table(t, path + ".tmp")
        os.replace(path + ".tmp", path)

    def metrics_table(self) -> Optional[pa.Table]:
        path = os.path.join(self.out_dir, "metrics.parquet")
        return pq.read_table(path) if os.path.exists(path) else None

    # -- outputs ----------------------------------------------------------
    def results_dataset(self):
        """All crawled wave outputs as one Dataset (lazy)."""
        dirs = sorted(
            os.path.join(self.out_dir, d)
            for d in os.listdir(self.out_dir)
            if d.startswith("wave=")
        )
        files = []
        for d in dirs:
            files += [
                os.path.join(d, f)
                for f in os.listdir(d)
                if f.endswith(".parquet") and f != "denied.parquet"
            ]
        return rd.read_parquet(files) if files else None

    def crawl_log(self) -> pa.Table:
        """Compact ordered log: url, order, depth, parent, success,
        status_code, host — the parity surface vs the serial sim."""
        dirs = sorted(
            os.path.join(self.out_dir, d)
            for d in os.listdir(self.out_dir)
            if d.startswith("wave=")
        )
        parts = []
        for d in dirs:
            for f in os.listdir(d):
                if not f.endswith(".parquet"):
                    continue
                t = pq.read_table(os.path.join(d, f))
                cols = {
                    "url": t.column("url"),
                    "order": t.column("order"),
                    "depth": t.column("depth"),
                    "parent_url": t.column("parent_url"),
                    "success": t.column("success").cast(pa.bool_()),
                    "status_code": t.column("status_code").cast(pa.int16()),
                }
                if "text" in t.column_names:
                    cols["text"] = t.column("text")
                else:
                    cols["text"] = pa.array([""] * t.num_rows, pa.string())
                parts.append(pa.table(cols))
        if not parts:
            return pa.table({"url": pa.array([], pa.string())})
        out = pa.concat_tables(parts)
        return out.sort_by("order")
