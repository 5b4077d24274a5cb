"""Best-first and DFS deep-crawl engines (+ their ordering rules).

* ``BestFirstCrawler`` models ``BestFirstCrawlingStrategy``
  (crawl4ai/deep_crawling/bff_strategy.py:193-361): a priority queue of
  ``(-score, depth, url, parent)`` (heapq tie order identical to the
  reference's asyncio.PriorityQueue), popped in batches of
  ``BATCH_SIZE=10`` (:19); ``visited`` is marked at POP time (:265-268)
  — duplicate urls may sit in the queue and are skipped when popped;
  link discovery (:146-190) validates + records depth but does NOT
  mark visited; scoring + threshold happen at push (:316-333). Batch
  results are processed **in priority order**, never completion order
  (the explicit determinism comment at :276-286).

* ``DFSCrawler`` models ``DFSDeepCrawlStrategy``
  (crawl4ai/deep_crawling/dfs_strategy.py): one url popped per step;
  its own ``_dfs_seen`` discovery dedup set (:22-26) separate from the
  pop-time ``visited`` guard; children pushed in reverse so the first
  discovered link is crawled next (:101-104); capacity truncation
  sorted by score like BFS (:318-331). DFS order is inherently serial
  — each step's input depends on the previous page's links — so the
  engine's parallelism is inside the fetch+extract of each step; the
  wave machinery is reused with singleton frontiers.

Both reuse ``run_fetch_extract_wave`` (crawl.py) so heavy columns
never touch the driver, and both checkpoint (queue/stack + seen +
politeness) for resume exactly like the BFS engine.
"""

from __future__ import annotations

import heapq
import os
from math import inf
from typing import Callable, Optional
from urllib.parse import urlparse

import pyarrow as pa

from ..functions.urls import is_valid_crawl_url
from ..state.politeness import PolitenessPool
from ..state.seen import ShardedSeen
from .crawl import CrawlStats, _frontier_table, run_fetch_extract_wave

BATCH_SIZE = 10  # reference: bff_strategy.py:19


class BestFirstCrawler:
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
        batch_size: int = BATCH_SIZE,
        num_seen_shards: int = 4,
        num_politeness_shards: int = 2,
        fairness_steps: Optional[int] = None,
        wave_size: Optional[int] = None,
        frontier_mem_rows: Optional[int] = None,
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
        # fairness aging (reference async_dispatcher._get_priority_score,
        # :217-226): queue entries passed over for more than
        # ``fairness_steps`` batch selections take precedence over score
        # order, oldest first — a hot-host/high-score frontier can no
        # longer starve low-scored URLs indefinitely. None = off
        # (preserves strict best-first order parity).
        self.fairness_steps = fairness_steps
        # SCALE MODE (ordering relaxation, documented): the reference
        # pops BATCH_SIZE=10 urls per round (bff_strategy.py:19), which
        # serializes the engine at ~10 urls/barrier — fine as the
        # order-parity spec, useless against a big frontier. With
        # ``wave_size=K`` (size to ~batch_size x parallelism) each
        # round drains the top-K of the CURRENT heap; links discovered
        # within a round cannot preempt that round's tail the way they
        # could with K=10, so global order is "round-wise best-first"
        # rather than the reference's 10-wise order. The crawled SET
        # on an exhaustive crawl is unchanged. None = reference parity.
        self.wave_size = wave_size
        # SCALE MODE (memory): with ``frontier_mem_rows=N`` the
        # priority queue keeps at most N entries resident and spills
        # the rest to sorted Parquet runs (state/pqspill.py) — pop
        # order is BIT-IDENTICAL to the in-memory heap (streamed
        # k-way-merge against the run heads), so this composes with
        # wave_size and order parity both. A 10^8-entry frontier costs
        # the driver O(N) memory. Fairness aging keeps every queue
        # entry in its deque, so it requires the in-memory mode.
        if frontier_mem_rows is not None and fairness_steps is not None:
            raise ValueError(
                "frontier_mem_rows (spill mode) and fairness_steps "
                "(in-memory aging) are mutually exclusive"
            )
        self.frontier_mem_rows = frontier_mem_rows
        self._pq = None
        if frontier_mem_rows is not None:
            from ..state.pqspill import SpillPriorityQueue

            self._pq = SpillPriorityQueue(
                os.path.join(out_dir, "frontier_spill"),
                mem_entries=frontier_mem_rows,
            )
        self.seen = ShardedSeen(num_seen_shards)
        self.politeness = PolitenessPool(num_politeness_shards)
        # released by close()
        self.stats = CrawlStats()
        self.results: list[tuple] = []  # (order, url, depth, parent, success, score)

        os.makedirs(out_dir, exist_ok=True)

    def _can_process(self, url: str, depth: int) -> bool:
        if not is_valid_crawl_url(url):
            return False
        if depth != 0 and self.url_filter is not None and not self.url_filter(url):
            return False
        return True

    # -- checkpoint/resume (reference shadow-queue serialization,
    # bff_strategy.py:208-233, 331-345) --------------------------------
    def _ckpt_dir(self) -> str:

        return os.path.join(self.out_dir, "checkpoint")

    def _checkpoint(self, heap, pages_crawled, order, step) -> None:
        import json

        import pyarrow.parquet as pq

        ck = self._ckpt_dir()
        state_dir = os.path.join(ck, f"state-{step:05d}")
        os.makedirs(state_dir, exist_ok=True)
        self.seen.checkpoint(state_dir)
        self.politeness.checkpoint(state_dir)
        if self._pq is not None:
            # spill mode: heap part + live-run remainders, never a
            # full frontier materialization (state/pqspill.py)
            self._pq.checkpoint(state_dir)
        else:
            stale = getattr(self, "_ckpt_stale", None)
            if stale:
                from collections import Counter

                cnt = Counter(heap)
                for e, k in stale.items():
                    cnt[e] -= k
                q = sorted(el for e, k in cnt.items() if k > 0 for el in [e] * k)
            else:
                q = sorted(heap)
            qt = pa.table(
                {
                    "neg_score": pa.array([x[0] for x in q], pa.float64()),
                    "depth": pa.array([x[1] for x in q], pa.int32()),
                    "url": pa.array([x[2] for x in q], pa.string()),
                    "parent": pa.array([x[3] for x in q], pa.string()),
                }
            )
            pq.write_table(qt, os.path.join(state_dir, "queue.parquet"))
        rt = pa.table(
            {
                "order": pa.array([r[0] for r in self.results], pa.int64()),
                "url": pa.array([r[1] for r in self.results], pa.string()),
                "depth": pa.array([r[2] for r in self.results], pa.int32()),
                "parent": pa.array([r[3] for r in self.results], pa.string()),
                "success": pa.array([r[4] for r in self.results], pa.bool_()),
                "score": pa.array([r[5] for r in self.results], pa.float64()),
            }
        )
        pq.write_table(rt, os.path.join(state_dir, "results.parquet"))
        manifest = {
            "step": step,
            "order": order,
            "pages_crawled": pages_crawled,
            "state_dir": f"state-{step:05d}",
        }
        with open(os.path.join(ck, "manifest.json.tmp"), "w") as f:
            json.dump(manifest, f)
        os.replace(
            os.path.join(ck, "manifest.json.tmp"), os.path.join(ck, "manifest.json")
        )
        import shutil

        for d in os.listdir(ck):
            if d.startswith("state-") and d != manifest["state_dir"]:
                shutil.rmtree(os.path.join(ck, d), ignore_errors=True)

    def _restore(self):
        import json

        import pyarrow.parquet as pq

        mpath = os.path.join(self._ckpt_dir(), "manifest.json")
        if not os.path.exists(mpath):
            return None
        with open(mpath) as f:
            m = json.load(f)
        state_dir = os.path.join(self._ckpt_dir(), m["state_dir"])
        self.seen.restore(state_dir)
        self.politeness.restore(state_dir)
        heap: list = []
        has_spill_ckpt = os.path.exists(
            os.path.join(state_dir, "queue-manifest.json")
        )
        if self._pq is not None:
            # spill mode never materializes the frontier: attach the
            # checkpoint's files (or an in-memory-mode queue.parquet,
            # which is sorted) as streamed runs
            if has_spill_ckpt:
                self._pq.restore(state_dir)
            else:
                self._pq.adopt_file(os.path.join(state_dir, "queue.parquet"))
        elif has_spill_ckpt:
            # in-memory resume of a spill checkpoint: merge-drain it
            from ..state.pqspill import SpillPriorityQueue

            tmp = SpillPriorityQueue(
                os.path.join(self._ckpt_dir(), "_restore_tmp"), mem_entries=4
            )
            tmp.restore(state_dir)
            while True:
                e = tmp.pop()
                if e is None:
                    break
                heap.append(e)
            tmp.close()
            heapq.heapify(heap)
        else:
            qt = pq.read_table(os.path.join(state_dir, "queue.parquet"))
            heap = list(
                zip(
                    qt.column("neg_score").to_pylist(),
                    qt.column("depth").to_pylist(),
                    qt.column("url").to_pylist(),
                    qt.column("parent").to_pylist(),
                )
            )
            heapq.heapify(heap)
        rt = pq.read_table(os.path.join(state_dir, "results.parquet"))
        self.results = list(
            zip(
                rt.column("order").to_pylist(),
                rt.column("url").to_pylist(),
                rt.column("depth").to_pylist(),
                rt.column("parent").to_pylist(),
                rt.column("success").to_pylist(),
                rt.column("score").to_pylist(),
            )
        )
        return heap, m["pages_crawled"], m["order"], m["step"] + 1

    def run(
        self,
        seeds: list[str],
        robots: Optional[dict[str, str]] = None,
        resume: bool = False,
        checkpoint_every: int = 0,
        should_cancel: Optional[Callable[[], bool]] = None,
    ) -> CrawlStats:
        from collections import deque

        restored = self._restore() if resume else None
        if robots and restored is None:
            self.politeness.set_robots(list(robots), list(robots.values()))
        heap: list[tuple] = []
        age_q: deque = deque()
        taken_by_age: dict = {}
        taken_by_score: dict = {}
        pages_crawled = 0
        order = 0
        step = 0
        if restored is not None:
            heap, pages_crawled, order, step = restored
            self.stats.urls_failed = sum(1 for r in self.results if not r[4])
            if self.fairness_steps is not None:
                # aging clock restarts at the resume step
                for e in sorted(heap):
                    age_q.append((step, e))
        else:
            for u in seeds:
                s = self.url_scorer(u) if self.url_scorer else 0
                entry = (-s, 0, u, "")
                if self._pq is not None:
                    self._pq.push(entry)
                else:
                    heapq.heappush(heap, entry)
                if self.fairness_steps is not None:
                    age_q.append((0, entry))

        while (self._pq if self._pq is not None else heap) and (
            pages_crawled < self.max_pages
        ):
            # cooperative cancellation between batches (reference
            # should_cancel hook, bfs_strategy.py:103-131): the heap
            # is intact here, so a checkpointed cancel resumes exactly
            if should_cancel is not None and should_cancel():
                self._ckpt_stale = taken_by_age
                self._checkpoint(heap, pages_crawled, order, step - 1)
                break
            # pop up to BATCH_SIZE items; visited marked at pop.
            # With fairness aging, entries older than fairness_steps
            # selections take precedence (oldest first) over score order.
            popped: list[tuple] = []
            pop_limit = self.wave_size or BATCH_SIZE
            while (
                (self._pq if self._pq is not None else (heap or age_q))
                and len(popped) < pop_limit
            ):
                entry = None
                if self._pq is not None:
                    entry = self._pq.pop()
                    if entry is None:
                        break
                    popped.append(entry)
                    continue
                if self.fairness_steps is not None:
                    while age_q and taken_by_score.get(age_q[0][1], 0) > 0:
                        _, stale = age_q.popleft()
                        taken_by_score[stale] -= 1
                    if age_q and step - age_q[0][0] > self.fairness_steps:
                        _, entry = age_q.popleft()
                        taken_by_age[entry] = taken_by_age.get(entry, 0) + 1
                if entry is None:
                    while heap and taken_by_age.get(heap[0], 0) > 0:
                        stale = heapq.heappop(heap)
                        taken_by_age[stale] -= 1
                    if not heap:
                        break
                    entry = heapq.heappop(heap)
                    if self.fairness_steps is not None:
                        taken_by_score[entry] = taken_by_score.get(entry, 0) + 1
                popped.append(entry)
            if not popped:
                break
            urls = [p[2] for p in popped]
            # cross-step dedup via shards; in-pop first occurrence wins
            pre_seen = self.seen.contains(urls)
            batch: list[tuple] = []
            local: set = set()
            to_add: list[str] = []
            for (negs, depth, url, parent), seen_before in zip(popped, pre_seen):
                if seen_before or url in local:
                    continue
                local.add(url)
                to_add.append(url)
                batch.append((negs, depth, url, parent))
            if to_add:
                self.seen.check_and_add(to_add, list(range(len(to_add))))
            if not batch:
                continue

            # politeness gate
            b_urls = [b[2] for b in batch]
            hosts = [urlparse(u).netloc.lower() for u in b_urls]
            gate = self.politeness.gate(b_urls, hosts)
            allowed = gate["allowed"] & gate["budget_ok"]

            frontier_rows = [
                (url, depth, parent or None, order + i)
                for i, (negs, depth, url, parent) in enumerate(batch)
            ]
            go_rows = [r for r, a in zip(frontier_rows, allowed) if a]
            summary = run_fetch_extract_wave(
                self.corpus_dir,
                _frontier_table(go_rows),
                self.out_dir,
                step,
                batch_size=max(64, self.batch_size),
                include_external=self.include_external,
                prefix="batch",
                url_filter=self.url_filter,
                url_scorer=self.url_scorer,
            )
            self.politeness.update(
                [urlparse(u).netloc.lower() for u in summary.column("url").to_pylist()],
                summary.column("status_code").to_pylist(),
            )
            succ_by_order = dict(
                zip(summary.column("order").to_pylist(), summary.column("success").to_pylist())
            )
            links_by_order = dict(
                zip(summary.column("order").to_pylist(), summary.column("canon_urls").to_pylist())
            )
            # filter/scorer verdicts were computed inside the wave tasks
            has_verdicts = "canon_ok" in summary.column_names
            ok_by_order = (
                dict(zip(summary.column("order").to_pylist(), summary.column("canon_ok").to_pylist()))
                if has_verdicts else {}
            )
            score_by_order = (
                dict(zip(summary.column("order").to_pylist(), summary.column("canon_score").to_pylist()))
                if has_verdicts else {}
            )
            denied = {r[3] for r, a in zip(frontier_rows, allowed) if not a}

            # one batched probe for every candidate link in this batch
            # (the reference checks `in visited`, which cannot change
            # during discovery — so a single prefetch is exact)
            all_candidates = sorted(
                {c for lst in links_by_order.values() for c in lst}
            )
            seen_map = (
                dict(zip(all_candidates, self.seen.contains(all_candidates)))
                if all_candidates
                else {}
            )

            # process results in priority (batch) order
            stop = False
            for i, (negs, depth, url, parent) in enumerate(batch):
                o = order + i
                success = bool(succ_by_order.get(o, False)) and o not in denied
                self.results.append((o, url, depth, parent or None, success, -negs))
                if not success:
                    self.stats.urls_failed += 1
                    continue
                pages_crawled += 1
                if pages_crawled >= self.max_pages:
                    stop = True
                    break
                # link discovery (bff semantics: no visited-add here)
                new_depth = depth + 1
                if new_depth > self.max_depth:
                    continue
                if self.max_pages - pages_crawled <= 0:
                    continue
                oks = ok_by_order.get(o) if has_verdicts else None
                scores = score_by_order.get(o) if has_verdicts else None
                for li, canon in enumerate(links_by_order.get(o, [])):
                    if seen_map.get(canon, False):
                        continue
                    filter_ok = (
                        oks[li] if oks is not None
                        else (self.url_filter is None or self.url_filter(canon))
                    )
                    if not is_valid_crawl_url(canon) or not filter_ok:
                        self.stats.urls_skipped += 1
                        continue
                    s = (
                        scores[li] if scores is not None
                        else (self.url_scorer(canon) if self.url_scorer else 0)
                    )
                    if s < self.score_threshold:
                        self.stats.urls_skipped += 1
                        continue
                    entry = (-s, new_depth, canon, url)
                    if self._pq is not None:
                        self._pq.push(entry)
                    else:
                        heapq.heappush(heap, entry)
                    if self.fairness_steps is not None:
                        age_q.append((step, entry))
            order += len(batch)
            step += 1
            if checkpoint_every and step % checkpoint_every == 0:
                self._ckpt_stale = taken_by_age
                self._checkpoint(heap, pages_crawled, order, step - 1)
            if stop:
                break

        self.stats.pages_crawled = pages_crawled
        return self.stats

    def crawl_log(self) -> pa.Table:
        rows = sorted(self.results)
        return pa.table(
            {
                "order": pa.array([r[0] for r in rows], pa.int64()),
                "url": pa.array([r[1] for r in rows], pa.string()),
                "depth": pa.array([r[2] for r in rows], pa.int32()),
                "parent_url": pa.array([r[3] for r in rows], pa.string()),
                "success": pa.array([r[4] for r in rows], pa.bool_()),
                "score": pa.array([r[5] for r in rows], pa.float64()),
            }
        )


    def close(self, kill: bool = False) -> None:
        """Release the seen/politeness actor pools (parked for reuse
        by default — state/reuse.py). Idempotent."""
        if self._pq is not None:
            self._pq.close()
        self.seen.close(kill=kill)
        self.politeness.close(kill=kill)


class DFSCrawler:
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
        num_politeness_shards: int = 2,
    ):
        self.corpus_dir = corpus_dir
        self.out_dir = out_dir
        self.max_depth = max_depth
        self.max_pages = max_pages
        self.include_external = include_external
        self.url_filter = url_filter
        self.url_scorer = url_scorer
        self.score_threshold = score_threshold
        self.politeness = PolitenessPool(num_politeness_shards)
        self.stats = CrawlStats()
        self.results: list[tuple] = []

        os.makedirs(out_dir, exist_ok=True)

    def _can_process(self, url: str, depth: int) -> bool:
        if not is_valid_crawl_url(url):
            return False
        if depth != 0 and self.url_filter is not None and not self.url_filter(url):
            return False
        return True

    def _ckpt_path(self) -> str:

        return os.path.join(self.out_dir, "checkpoint")

    def _checkpoint(self, stack, visited, dfs_seen, pages_crawled, order, step) -> None:
        """Serial-traversal checkpoint (reference DFS resume state:
        stack + _dfs_seen + visited, dfs_strategy.py:22-60). All
        driver-local except politeness shard state."""
        import json

        ck = self._ckpt_path()
        state_dir = os.path.join(ck, f"state-{step:05d}")
        os.makedirs(state_dir, exist_ok=True)
        self.politeness.checkpoint(state_dir)
        data = {
            "stack": [[u, p, d] for (u, p, d) in stack],
            "visited": sorted(visited),
            "dfs_seen": sorted(dfs_seen),
            "results": [list(r) for r in self.results],
            "pages_crawled": pages_crawled,
            "order": order,
            "step": step,
            "state_dir": f"state-{step:05d}",
        }
        with open(os.path.join(state_dir, "traversal.json"), "w") as f:
            json.dump(data, f)
        with open(os.path.join(ck, "manifest.json.tmp"), "w") as f:
            json.dump({"state_dir": data["state_dir"]}, f)
        os.replace(
            os.path.join(ck, "manifest.json.tmp"), os.path.join(ck, "manifest.json")
        )
        import shutil

        for d in os.listdir(ck):
            if d.startswith("state-") and d != data["state_dir"]:
                shutil.rmtree(os.path.join(ck, d), ignore_errors=True)

    def _restore(self):
        import json

        mpath = os.path.join(self._ckpt_path(), "manifest.json")
        if not os.path.exists(mpath):
            return None
        with open(mpath) as f:
            m = json.load(f)
        state_dir = os.path.join(self._ckpt_path(), m["state_dir"])
        self.politeness.restore(state_dir)
        with open(os.path.join(state_dir, "traversal.json")) as f:
            d = json.load(f)
        self.results = [tuple(r) for r in d["results"]]
        return (
            [tuple(x) for x in d["stack"]],
            set(d["visited"]),
            set(d["dfs_seen"]),
            d["pages_crawled"],
            d["order"],
            d["step"] + 1,
        )

    def run(
        self,
        seeds: list[str],
        robots: Optional[dict[str, str]] = None,
        resume: bool = False,
        checkpoint_every: int = 0,
        should_cancel: Optional[Callable[[], bool]] = None,
    ) -> CrawlStats:
        restored = self._restore() if resume else None
        if robots and restored is None:
            self.politeness.set_robots(list(robots), list(robots.values()))
        if restored is not None:
            stack, visited, dfs_seen, pages_crawled, order, step = restored
            self.stats.urls_failed = sum(1 for r in self.results if not r[4])
        else:
            visited = set()
            dfs_seen = set(seeds)
            stack = [(u, None, 0) for u in reversed(seeds)]
            pages_crawled = 0
            order = 0
            step = 0
        depths: dict[str, int] = {u: 0 for u in seeds}

        while stack and pages_crawled < self.max_pages:
            if should_cancel is not None and should_cancel():
                self._checkpoint(stack, visited, dfs_seen, pages_crawled, order, step - 1)
                break
            url, parent, depth = stack.pop()
            if url in visited or depth > self.max_depth:
                continue
            visited.add(url)

            host = urlparse(url).netloc.lower()
            gate = self.politeness.gate([url], [host])
            allowed = bool(gate["allowed"][0] and gate["budget_ok"][0])
            if allowed:
                summary = run_fetch_extract_wave(
                    self.corpus_dir,
                    _frontier_table([(url, depth, parent, order)]),
                    self.out_dir,
                    step,
                    include_external=self.include_external,
                    prefix="step",
                    url_filter=self.url_filter,
                    url_scorer=self.url_scorer,
                )
                success = bool(summary.column("success").to_pylist()[0]) if summary.num_rows else False
                canon_urls = (
                    summary.column("canon_urls").to_pylist()[0] if summary.num_rows else []
                )
                if summary.num_rows and "canon_ok" in summary.column_names:
                    canon_oks = summary.column("canon_ok").to_pylist()[0]
                    canon_scores = summary.column("canon_score").to_pylist()[0]
                else:
                    canon_oks = canon_scores = None
                self.politeness.update([host], summary.column("status_code").to_pylist())
            else:
                success, canon_urls = False, []
                canon_oks = canon_scores = None
            self.results.append((order, url, depth, parent, success))
            order += 1
            step += 1
            if not success:
                self.stats.urls_failed += 1
                continue
            pages_crawled += 1
            if pages_crawled >= self.max_pages:
                break

            # DFS link discovery with _dfs_seen (dfs_strategy.py:244-331)
            new_depth = depth + 1
            if new_depth > self.max_depth:
                continue
            remaining = self.max_pages - pages_crawled
            if remaining <= 0:
                continue
            valid: list[tuple] = []
            for li, canon in enumerate(canon_urls):
                if canon in dfs_seen:
                    continue
                filter_ok = (
                    canon_oks[li] if canon_oks is not None
                    else (self.url_filter is None or self.url_filter(canon))
                )
                if not is_valid_crawl_url(canon) or not filter_ok:
                    self.stats.urls_skipped += 1
                    continue
                s = (
                    canon_scores[li] if canon_scores is not None
                    else (self.url_scorer(canon) if self.url_scorer else 0)
                )
                if s < self.score_threshold:
                    self.stats.urls_skipped += 1
                    continue
                dfs_seen.add(canon)
                valid.append((canon, s))
            if len(valid) > remaining:
                if self.url_scorer:
                    valid.sort(key=lambda x: x[1], reverse=True)
                valid = valid[: int(remaining)]
            new_links = [(u, url) for u, _ in valid]
            for u, _ in valid:
                depths[u] = new_depth
            for new_url, new_parent in reversed(new_links):
                stack.append((new_url, new_parent, depths.get(new_url, new_depth)))
            if checkpoint_every and step % checkpoint_every == 0:
                self._checkpoint(stack, visited, dfs_seen, pages_crawled, order, step - 1)

        self.stats.pages_crawled = pages_crawled
        return self.stats

    def crawl_log(self) -> pa.Table:
        rows = sorted(self.results)
        return pa.table(
            {
                "order": pa.array([r[0] for r in rows], pa.int64()),
                "url": pa.array([r[1] for r in rows], pa.string()),
                "depth": pa.array([r[2] for r in rows], pa.int32()),
                "parent_url": pa.array([r[3] for r in rows], pa.string()),
                "success": pa.array([r[4] for r in rows], pa.bool_()),
            }
        )

    def close(self, kill: bool = False) -> None:
        """Release the politeness actor pool (parked for reuse by
        default — state/reuse.py). Idempotent."""
        self.politeness.close(kill=kill)
