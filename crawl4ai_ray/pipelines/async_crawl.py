"""Continuously-fed asynchronous crawl engine (no inter-wave barrier).

SCALE MODE. ``BFSCrawler`` executes the frontier in depth-synchronous
waves — reference BFS parity (crawl4ai bfs_strategy.py semantics), but
every wave ends at a global barrier: the longest straggler gates EVERY
next-wave task, and the geometric ramp serializes the first waves.
The cost shows up directly in the scaling protocol (BASELINE.md
rounds 3-4): the barrier-free extract scan reaches raw 0.91 at 8->32
CPUs while the wave-barriered crawl composite sits at 0.50-0.63.

``AsyncCrawler`` removes the barrier. A bounded pool of in-flight
fetch tasks (~2 per CPU) is continuously refilled from a pending
frontier heap; each task gates its own chunk against the politeness
shards, fetch-extract-persists it, and folds its own discovered links
straight into the frontier through the seen shards' atomic first-wins
``check_and_add`` (the same fold as
``BFSCrawler(overlap_discovery=True)``, executed inside the task).
Only a tiny accepted-frontier table (url, depth, parent) returns to
the driver, whose whole per-completion job is heap-pushes and the
next dispatch — new work dispatches the moment capacity frees, and
there is never a point where the whole cluster waits on one
straggler. (The first cut of this engine gated and folded on the
driver: each completion paid 2 blocking scatter/gather round trips
plus a full-summary ``ray.get``, serializing the loop and starving
the pool — measured 1.6-2.4x slower than BFS. In-task fold/gate plus
the chunk-floor dispatch policy bring it to 0.89-0.98x BFS on the
CPU-bound synthetic corpus, where BFS's 512-row contiguous wave
slices amortize row-group decode better than the async backlog's
~96-row chunks ever can. The shape this engine exists for — real
network fetches with second-scale latency variance, where a wave
barrier idles the whole pool on every straggler — is MEASURED since
round 5 via the deterministic latency model at the fetch seam
(stages/latency.py, ``fetch_latency=``): at the 80k bench shape with
a rare 5s-capped Pareto tail, this engine runs **1.97x faster than
BFS** with byte-identical crawled sets (tools/ab_latency.py;
BASELINE.md round-5 table).)

Documented semantic relaxations (the same family as the best-first
``wave_size`` and BFS ``overlap_discovery`` modes; everything else —
politeness gating, robots, seen dedup, per-part Parquet persistence,
byte-identical extraction — is shared code with the wave engines):

- depth = FIRST-DISCOVERY depth. Async completion order can first
  reach a url through a longer path than BFS's level order, so a
  recorded depth can exceed the BFS shortest-path depth. The crawled
  SET therefore equals BFS exactly when ``max_depth`` does not
  truncate reachability (exhaustive crawls; pinned by
  tests/test_async_crawl.py on the synthetic corpus).
- ``order`` = dispatch order (completion-order attribution).
- ``max_pages`` is a dispatch cap: no new chunk dispatches once
  ``max_pages`` non-denied rows have been dispatched, so
  pages_crawled may overshoot by at most one chunk (< batch_size; an
  exact cap needs the barrier engines). Robots-denied rows are
  refunded against the cap (they never counted in the wave engines
  either).
- politeness updates are per-task: a chunk dispatched concurrently
  with another task's completion may gate before that task's
  host-budget update lands on the shard (actor-task ordering is per
  caller). Robots rules are static per host, so the DENIED set is
  unaffected; only adaptive crawl-delay/budget scheduling is
  completion-order, matching this engine's attribution semantics.
- checkpoints are EPOCHS, not waves: with ``checkpoint_pages=K`` the
  engine pauses dispatch every ~K completed pages, drains the
  in-flight pool (the only quiesce point — folds are in-task, so a
  consistent frontier/seen snapshot needs an empty pool), snapshots
  pending frontier + counters + denied rows + seen/politeness shard
  state + the completed-part manifest, then continues barrier-free.
  ``run(..., resume=True)`` restores the last epoch exactly: part
  files not named by the manifest (written after the snapshot, or by
  a crashed run) are deleted and their urls re-crawled from the
  restored frontier, so a SIGKILL at any instant replays to the same
  crawled set (part writes are deterministic in the frontier rows).
  ``checkpoint_pages=None`` (default) disables checkpointing — zero
  overhead for pure-throughput runs; ``should_cancel`` still stops
  dispatching and drains, writing a final epoch when enabled.

Scale shape: driver memory is O(frontier_mem_rows) — the pending
frontier is the spillable priority queue (state/pqspill.py, url-keyed
schema): overflow spills to sorted Parquet runs with bit-identical
pop order, and epoch checkpoints reference the runs without ever
materializing the frontier. Driver CPU is O(accepted urls) queue
pushes; seen/politeness state is already sharded actors, and every
gate/fold round trip runs inside worker tasks where it overlaps all
other work.
"""

from __future__ import annotations

import os
import shutil
import time
from math import inf
from typing import Callable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions.urls import valid_crawl_mask_arrow
from ..state.politeness import PolitenessPool
from ..state.pqspill import SpillPriorityQueue
from ..state.seen import ShardedSeen
from .crawl import (
    _flat_hashes,
    _frontier_table,
    _wave_extract_persist,
)

# pending-frontier entry layout for the spillable queue: url-ordered
# (the dispatch key — contiguous pops prune row-group reads), then
# depth/parent/order payload. Urls are unique (seen-set acceptance is
# first-wins) so comparisons never reach the nullable parent field.
_PENDING_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("depth", pa.int32()),
        ("parent_url", pa.string()),
        ("order", pa.int64()),
    ]
)

_EMPTY_ACCEPTED = pa.table(
    {
        "url": pa.array([], pa.string()),
        "depth": pa.array([], pa.int64()),
        "parent_url": pa.array([], pa.string()),
    }
)


def _fold_summary(
    summary: pa.Table, depth_of: dict, max_depth: int, seen: ShardedSeen
) -> pa.Table:
    """Fold one wave-slice summary into newly-accepted frontier rows.
    Acceptance is the seen shards' atomic first-wins ``check_and_add``
    — the single source of truth, so duplicates across any
    interleaving of concurrent folds resolve exactly once. Runs
    INSIDE the wave task (driver-free); pure function of the summary
    plus shard state."""
    if summary.num_rows == 0:
        return _EMPTY_ACCEPTED
    succ = summary.column("success").to_numpy(zero_copy_only=False)
    orders = summary.column("order").to_numpy(zero_copy_only=False)
    depth_next = (
        np.fromiter(
            (depth_of[int(o)] for o in orders), dtype=np.int64, count=len(orders)
        )
        + 1
    )
    keep = succ & (depth_next <= max_depth)
    if not keep.any():
        return _EMPTY_ACCEPTED
    st_keep = summary.filter(pa.array(keep))
    depth_keep = depth_next[keep]
    lc = st_keep.column("canon_urls").combine_chunks()
    if isinstance(lc, pa.ChunkedArray):
        lc = lc.chunk(0) if lc.num_chunks else pa.array([], pa.list_(pa.string()))
    lengths = pc.list_value_length(lc).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lc)
    if len(flat) == 0:
        return _EMPTY_ACCEPTED
    # first-wins in-chunk dedup, then valid-url mask, then the atomic
    # global first-wins probe (wave-task-computed hashes skip rehash)
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False)
    _, first_pos = np.unique(codes, return_index=True)
    uniq_arr = enc.dictionary
    valid_u = valid_crawl_mask_arrow(uniq_arr)
    cand_pos = np.sort(first_pos[valid_u])
    if cand_pos.size == 0:
        return _EMPTY_ACCEPTED
    cand_arr = uniq_arr.take(pa.array(codes[cand_pos], pa.int64()))
    flat_h = _flat_hashes(st_keep, len(flat))
    acc = np.asarray(
        seen.check_and_add(
            cand_arr,
            list(range(len(cand_arr))),
            hashes=flat_h[cand_pos] if flat_h is not None else None,
        ),
        dtype=bool,
    )
    if not acc.any():
        return _EMPTY_ACCEPTED
    acc_pos = cand_pos[acc]
    parents = np.repeat(
        st_keep.column("url").to_numpy(zero_copy_only=False), lengths
    )
    depth_flat = np.repeat(depth_keep, lengths)
    return pa.table(
        {
            "url": cand_arr.filter(pa.array(acc)),
            "depth": pa.array(depth_flat[acc_pos], pa.int64()),
            "parent_url": pa.array(list(parents[acc_pos]), pa.string()),
        }
    )


@ray.remote
def _async_task(
    ft: pa.Table,
    corpus_dir: str,
    tmp_dir: str,
    include_external: bool,
    prefetch: bool,
    max_depth: int,
    seen: ShardedSeen,
    politeness: PolitenessPool,
    latency: Optional[dict] = None,
):
    """One barrier-free crawl slice: politeness gate -> fused
    fetch/extract/persist -> politeness update -> in-task discovery
    fold. Returns ``(accepted_tbl, denied_tbl, n_success, n_fail)`` —
    the only bytes that cross back to the driver. The facades are
    plain handle holders, so every shard round trip here runs on a
    worker and overlaps every other in-flight slice."""
    gate = politeness.gate(
        ft.column("url").to_pylist(), ft.column("host").to_pylist()
    )
    allowed = gate["allowed"] & gate["budget_ok"]
    denied_tbl = ft.filter(pa.array(~allowed)).select(["url", "order"])
    ft = ft.filter(pa.array(allowed))
    if ft.num_rows == 0:
        return _EMPTY_ACCEPTED, denied_tbl, 0, 0
    summary = _wave_extract_persist(
        ft, corpus_dir, tmp_dir, include_external, prefetch=prefetch,
        latency=latency,
    )
    politeness.update(
        summary.column("host").to_pylist(),
        summary.column("status_code").to_pylist(),
    )
    # ack inside the task (off the driver's critical path) so a shard
    # failure surfaces as THIS task's error instead of a silent drop
    politeness._drain_updates()
    succ = summary.column("success").to_numpy(zero_copy_only=False)
    depth_of = dict(
        zip(
            (int(o) for o in ft.column("order").to_pylist()),
            (int(d) for d in ft.column("depth").to_pylist()),
        )
    )
    accepted = _fold_summary(summary, depth_of, max_depth, seen)
    return accepted, denied_tbl, int(succ.sum()), int(len(succ) - succ.sum())


class AsyncCrawler:
    """Barrier-free crawl over a corpus directory (see module doc)."""

    def __init__(
        self,
        corpus_dir: str,
        out_dir: str,
        *,
        max_depth: int = 3,
        max_pages: float = inf,
        include_external: bool = False,
        num_seen_shards: int = 4,
        num_politeness_shards: int = 2,
        batch_size: int = 512,
        max_inflight: Optional[int] = None,
        prefetch: bool = False,
        chunk_floor: int = 96,
        checkpoint_pages: Optional[int] = None,
        frontier_mem_rows: int = 500_000,
        fetch_latency: Optional[dict] = None,
    ):
        self.corpus_dir = corpus_dir
        self.out_dir = out_dir
        self.max_depth = max_depth
        self.max_pages = max_pages
        self.include_external = include_external
        self.batch_size = batch_size
        self.prefetch = prefetch
        if max_inflight is None:
            try:
                ncpu = int(ray.cluster_resources().get("CPU", 8))
            except Exception:
                ncpu = 8
            # network-latency mode overlaps fetch waits (fractional-CPU
            # tasks, see dispatch) — keep more chunks in flight so the
            # pool never drains while stragglers sleep. 4x, not more:
            # past the fractional-CPU slot count the extra in-flight
            # budget only fragments the backlog into floor-sized
            # chunks, each paying its own straggler max (measured at
            # 20k: 8x = 13.3s, 4x = 9.8s vs BFS 22.9s)
            max_inflight = (4 if fetch_latency is not None else 2) * ncpu
        self.max_inflight = max(1, max_inflight)
        self.chunk_floor = max(16, min(batch_size, chunk_floor))
        self.checkpoint_pages = checkpoint_pages
        # resident pending-frontier bound: past this the queue spills
        # sorted Parquet runs (state/pqspill.py) — driver memory stays
        # O(frontier_mem_rows) at any frontier size
        self.frontier_mem_rows = max(64, frontier_mem_rows)
        # deterministic simulated network latency at the fetch seam
        # (stages/latency.py); None = no-op — the A/B knob for the
        # heavy-tailed-straggler shape this engine exists for.
        self.fetch_latency = fetch_latency
        self._ckpt_seq = 0
        self.seen = ShardedSeen(num_seen_shards)
        self.politeness = PolitenessPool(num_politeness_shards)
        self.pages_crawled = 0
        self.urls_failed = 0
        self.urls_denied = 0
        self.wall_sec = 0.0
        self._order = 0
        os.makedirs(out_dir, exist_ok=True)

    # -- checkpoint/restore (epoch snapshots; see module doc) --------------
    def _ckpt_dir(self) -> str:
        return os.path.join(self.out_dir, "checkpoint")

    def _write_checkpoint(
        self, pending: SpillPriorityQueue, denied_rows: list[tuple], tmp: str
    ) -> None:
        """Snapshot one epoch. MUST be called with the in-flight pool
        empty: folds are in-task, so only a drained pool guarantees
        the seen-shard state and the driver's pending queue describe
        the same instant. Durability order matches the wave engines:
        state dir (shards + frontier + denied) -> manifest rename ->
        prune older state dirs."""
        import pyarrow.parquet as pq

        ck = self._ckpt_dir()
        state = f"state-{self._ckpt_seq:05d}"
        state_dir = os.path.join(ck, state)
        os.makedirs(state_dir, exist_ok=True)
        refs = self.seen.checkpoint_async(state_dir) + self.politeness.checkpoint_async(
            state_dir
        )
        # bounded-memory frontier snapshot: resident heap becomes one
        # sorted run file, spilled runs are referenced/copied (the
        # frontier is never materialized)
        pending.checkpoint(state_dir)
        dt = pa.table(
            {
                "url": pa.array([u for u, _ in denied_rows], pa.string()),
                "order": pa.array([o for _, o in denied_rows], pa.int64()),
            }
        )
        p = os.path.join(state_dir, "denied.parquet")
        pq.write_table(dt, p + ".tmp")
        os.replace(p + ".tmp", p)
        parts = sorted(
            n
            for n in os.listdir(tmp)
            if n.startswith("part-") and n.endswith(".parquet")
        )
        manifest = {
            "seq": self._ckpt_seq,
            "order": self._order,
            "dispatched": self._dispatched,
            "pages_crawled": self.pages_crawled,
            "urls_failed": self.urls_failed,
            "urls_denied": self.urls_denied,
            "state_dir": state,
            "parts": parts,
        }
        ray.get(refs)
        import json

        mp = os.path.join(ck, "manifest.json")
        with open(mp + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.replace(mp + ".tmp", mp)
        for d in os.listdir(ck):
            if d.startswith("state-") and d != state:
                shutil.rmtree(os.path.join(ck, d), ignore_errors=True)
        self._ckpt_seq += 1

    def _restore(self, tmp: str, pending: SpillPriorityQueue):
        """Restore the last epoch INTO ``pending``: shard state,
        counters, frontier runs, denied rows; delete part files the
        manifest does not name (post-snapshot or crashed-run output —
        their urls sit in the restored frontier and re-crawl).
        Returns denied_rows, or None when no checkpoint exists."""
        import json

        import pyarrow.parquet as pq

        mp = os.path.join(self._ckpt_dir(), "manifest.json")
        if not os.path.exists(mp):
            return None
        with open(mp) as f:
            m = json.load(f)
        state_dir = os.path.join(self._ckpt_dir(), m["state_dir"])
        self.seen.restore(state_dir)
        self.politeness.restore(state_dir)
        self._order = m["order"]
        self._dispatched = m["dispatched"]
        self.pages_crawled = m["pages_crawled"]
        self.urls_failed = m["urls_failed"]
        self.urls_denied = m["urls_denied"]
        self._ckpt_seq = m["seq"] + 1
        keep = set(m["parts"])
        for n in os.listdir(tmp):
            if (
                n.startswith("part-")
                and n.endswith(".parquet")
                and n not in keep
            ):
                os.remove(os.path.join(tmp, n))
        pending.restore(state_dir)
        dt = pq.read_table(os.path.join(state_dir, "denied.parquet"))
        denied_rows = list(
            zip(dt.column("url").to_pylist(), dt.column("order").to_pylist())
        )
        return denied_rows

    # -- main loop ---------------------------------------------------------
    def run(
        self,
        seeds: list[str],
        robots: Optional[dict[str, str]] = None,
        should_cancel: Optional[Callable[[], bool]] = None,
        resume: bool = False,
    ):
        t0 = time.perf_counter()
        if robots:
            self.politeness.set_robots(list(robots), list(robots.values()))
        wave_dir = os.path.join(self.out_dir, "wave=00000")
        tmp = wave_dir + ".tmp"
        if resume:
            # a graceful stop renamed tmp -> wave_dir; a crash left
            # tmp. Normalize to tmp, preferring tmp's (newer) files.
            os.makedirs(tmp, exist_ok=True)
            if os.path.exists(wave_dir):
                for name in os.listdir(wave_dir):
                    dst = os.path.join(tmp, name)
                    if not os.path.exists(dst):
                        os.replace(os.path.join(wave_dir, name), dst)
                shutil.rmtree(wave_dir)
        else:
            for d in (wave_dir, tmp, self._ckpt_dir()):
                if os.path.exists(d):
                    shutil.rmtree(d)
            os.makedirs(tmp)

        # url-sorted spillable min-queue: popping the n smallest urls
        # yields a CONTIGUOUS key range, so each task's row-group-exact
        # corpus read touches few row groups (a FIFO chunk of random
        # urls touches nearly all of them — measured 2.4x slower end
        # to end). Resident entries are bounded by frontier_mem_rows;
        # overflow spills sorted Parquet runs with bit-identical pop
        # order (state/pqspill.py), so a 10^10-url frontier never
        # lives in driver memory.
        spill_dir = os.path.join(self.out_dir, "frontier_spill")
        if os.path.exists(spill_dir):
            shutil.rmtree(spill_dir)  # stale runs from a prior run/crash
        pending = SpillPriorityQueue(
            spill_dir,
            mem_entries=self.frontier_mem_rows,
            schema=_PENDING_SCHEMA,
        )
        denied_rows: list[tuple] = []
        restored = self._restore(tmp, pending) if resume else None
        if restored is not None:
            denied_rows = restored
        else:
            if resume:
                # resume requested but nothing was ever checkpointed:
                # cold start (drop any unmanifested partial output)
                shutil.rmtree(tmp)
                os.makedirs(tmp)
            if seeds:
                # seeds enter the seen set up front so a link back to
                # a seed never re-crawls it
                fresh = np.asarray(
                    self.seen.check_and_add(
                        list(seeds), list(range(len(seeds)))
                    ),
                    dtype=bool,
                )
                for i, u in enumerate(seeds):
                    if fresh[i]:
                        pending.push((u, 0, None, self._order))
                        self._order += 1

        in_flight: dict = {}  # ref -> n_rows
        if restored is None:
            self._dispatched = 0
        cancelled = False
        pages_at_ckpt = self.pages_crawled
        ckpt_drain = False  # stop dispatching until the pool drains

        # Efficient chunk floor: per-task fixed cost (scheduling, gate
        # RPC, corpus open, part-file write, row-group decode
        # amplification) amortizes past ~64-128 rows. Throughput =
        # in-flight ROWS / task latency, so the policy maximizes
        # in-flight rows subject to chunks >= this floor — holding a
        # sub-floor fragment back only while other tasks are still
        # running to top it up. (A first cut held ALL fragments below
        # batch_size back whenever >=4 tasks were in flight; pending
        # never reached batch_size on an expanding frontier, pinning
        # average parallelism at ~4 of 32 CPUs — measured 2.2x slower
        # than BFS. Floor sweep on the 80k bench corpus: 32 -> 4259,
        # 64 -> 4763, 96 -> 4932, 128 -> 4574, 192+ much worse
        # [parallelism loss dominates]; 96 is the shipped default.)
        chunk_floor = self.chunk_floor

        def dispatch() -> None:
            nonlocal cancelled
            while pending and len(in_flight) < self.max_inflight:
                if self._dispatched >= self.max_pages or (
                    should_cancel is not None and should_cancel()
                ):
                    cancelled = True
                    return
                if len(pending) >= self.batch_size:
                    # plenty of work: full-size chunks (per-row task
                    # overhead and row-group read amplification both
                    # drop with chunk size)
                    n = self.batch_size
                elif len(pending) >= chunk_floor:
                    n = chunk_floor
                elif in_flight:
                    # sub-floor fragment and the pool is busy — hold it
                    # back so completions top it up to an efficient
                    # chunk (the pool can't starve: any completion
                    # re-enters dispatch, and an empty pool drains)
                    return
                else:
                    # ramp seed or final tail: drain the fragment
                    n = len(pending)
                rows = [pending.pop() for _ in range(n)]
                ft = _frontier_table(rows)
                # heap pops are already url-ascending; the explicit
                # sort keeps row-group pruning correct if a caller
                # ever feeds unsorted rows
                ft = ft.take(pc.sort_indices(ft.column("url")))
                task = (
                    _async_task
                    if self.fetch_latency is None
                    # network-wait-dominated: don't burn a core per
                    # sleeping chunk (same rationale as
                    # run_fetch_extract_wave's latency path)
                    else _async_task.options(num_cpus=0.25)
                )
                ref = task.remote(
                    ft,
                    self.corpus_dir,
                    tmp,
                    self.include_external,
                    self.prefetch,
                    self.max_depth,
                    self.seen,
                    self.politeness,
                    self.fetch_latency,
                )
                in_flight[ref] = ft.num_rows
                self._dispatched += ft.num_rows

        dispatch()
        while in_flight:
            done, _ = ray.wait(list(in_flight), num_returns=1)
            ref = done[0]
            in_flight.pop(ref)
            accepted, denied_tbl, n_success, n_fail = ray.get(ref)
            self.pages_crawled += n_success
            self.urls_failed += n_fail
            if denied_tbl.num_rows:
                self.urls_denied += denied_tbl.num_rows
                # denied rows never counted toward the cap in the wave
                # engines; refund them so the cap measures real fetches
                self._dispatched -= denied_tbl.num_rows
                denied_rows.extend(
                    zip(
                        denied_tbl.column("url").to_pylist(),
                        denied_tbl.column("order").to_pylist(),
                    )
                )
            if accepted.num_rows:
                for u, d, p in zip(
                    accepted.column("url").to_pylist(),
                    accepted.column("depth").to_pylist(),
                    accepted.column("parent_url").to_pylist(),
                ):
                    pending.push((u, int(d), p, self._order))
                    self._order += 1
            if (
                self.checkpoint_pages is not None
                and self.pages_crawled - pages_at_ckpt >= self.checkpoint_pages
            ):
                ckpt_drain = True
            if ckpt_drain:
                if not in_flight:
                    # epoch boundary: pool drained, snapshot, resume
                    # barrier-free dispatch
                    self._write_checkpoint(pending, denied_rows, tmp)
                    pages_at_ckpt = self.pages_crawled
                    ckpt_drain = False
                    dispatch()
            else:
                dispatch()

        if self.checkpoint_pages is not None:
            # final epoch (post-drain; also the resume point after a
            # should_cancel stop)
            self._write_checkpoint(pending, denied_rows, tmp)

        if denied_rows:
            dt = pa.table(
                {
                    "order": pa.array([o for _, o in denied_rows], pa.int64()),
                    "url": pa.array([u for u, _ in denied_rows], pa.string()),
                }
            )
            import pyarrow.parquet as pq

            pq.write_table(dt, os.path.join(tmp, "denied-00000.parquet"))
        os.replace(tmp, wave_dir)
        # spill runs still pending were captured by the final epoch
        # checkpoint (when enabled); the working spill dir is done
        pending.close()
        shutil.rmtree(spill_dir, ignore_errors=True)
        self.wall_sec = time.perf_counter() - t0
        self.cancelled = cancelled
        return self

    def crawled_urls(self) -> list[str]:
        """Successfully crawled url set from the persisted parts."""
        import pyarrow.parquet as pq

        wave_dir = os.path.join(self.out_dir, "wave=00000")
        urls: list[str] = []
        for name in sorted(os.listdir(wave_dir)):
            if not name.startswith("part-"):
                continue
            t = pq.read_table(
                os.path.join(wave_dir, name), columns=["url", "success"]
            )
            urls.extend(t.filter(t.column("success")).column("url").to_pylist())
        return urls

    def close(self, kill: bool = False) -> None:
        self.seen.close(kill=kill)
        self.politeness.close(kill=kill)
