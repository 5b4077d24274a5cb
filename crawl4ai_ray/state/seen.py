"""Sharded URL-seen set (the crawl's `visited` state).

The reference keeps a per-crawl Python ``set``
(``crawl4ai/deep_crawling/bfs_strategy.py:231``); at 10^10-URL scale
that must shard. Here: an actor pool of ``SeenShard``s keyed by
``url_hash % num_shards``. Each shard holds

* the exact canonical-url set (source of truth), and
* a ``CuckooFilter`` accelerator (definite-miss short circuit),

checkpointing both to per-shard Parquet + filter bytes, so a resumed
crawl rebuilds the identical state (north rule: resumable
per-partition checkpoints).

All RPCs are *batched* (one call per (shard, wave-batch)); the client
groups urls by shard with the stable ``hash64`` before calling, so a
wave of W urls costs O(num_shards) RPCs, not O(W).

Positional semantics: ``check_and_add(urls, pos)`` keeps the minimum
position per url so distributed first-wins matches the reference's
serial discovery order.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..functions.hashing import hash64_batch
from . import reuse
from .filters import CuckooFilter


@ray.remote(num_cpus=0)
class SeenShard:
    """One shard of the URL-seen set."""

    def __init__(self, shard_id: int, filter_capacity: int = 1 << 20):
        self.shard_id = shard_id
        self.exact: dict[str, int] = {}  # canonical url -> first-seen pos
        self.filter = CuckooFilter(filter_capacity)

    def reset(self, filter_capacity: int = 1 << 20) -> None:
        """Re-arm for a new owner (actor reuse pool): drop all state."""
        self.exact = {}
        self.filter = CuckooFilter(filter_capacity)

    def check_and_add(self, urls, pos: Sequence[int]) -> list[bool]:
        """Returns ``new`` mask: True where the url was not seen before
        this call. Duplicate urls inside one call: first (lowest pos
        given caller ordering) wins. ``urls`` may arrive as a pyarrow
        string Array (zero-copy off the wire); Python strings are
        materialized HERE, on the shard — never on the driver."""
        if isinstance(urls, pa.Array):
            urls = urls.to_pylist()
        out = []
        for u, p in zip(urls, pos):
            if u in self.filter and u in self.exact:
                out.append(False)
                continue
            self.exact[u] = int(p)
            self.filter.add(u)
            out.append(True)
        return out

    def contains(self, urls) -> list[bool]:
        if isinstance(urls, pa.Array):
            urls = urls.to_pylist()
        return [(u in self.filter and u in self.exact) for u in urls]

    def add(self, urls: Sequence[str], pos: Sequence[int]) -> int:
        n = 0
        for u, p in zip(urls, pos):
            if u not in self.exact:
                self.exact[u] = int(p)
                self.filter.add(u)
                n += 1
        return n

    def size(self) -> int:
        return len(self.exact)

    def dump(self) -> list[str]:
        return sorted(self.exact)

    def checkpoint(self, directory: str) -> str:
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, f"seen_shard_{self.shard_id:05d}.parquet")
        tmp = path + ".tmp"
        urls = list(self.exact)
        tbl = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "pos": pa.array([self.exact[u] for u in urls], pa.int64()),
            }
        )
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        fpath = os.path.join(directory, f"seen_shard_{self.shard_id:05d}.cuckoo")
        with open(fpath + ".tmp", "wb") as f:
            f.write(self.filter.to_bytes())
        os.replace(fpath + ".tmp", fpath)
        return path

    def restore(self, directory: str) -> int:
        path = os.path.join(directory, f"seen_shard_{self.shard_id:05d}.parquet")
        if not os.path.exists(path):
            return 0
        tbl = pq.read_table(path)
        self.exact = dict(
            zip(tbl.column("url").to_pylist(), tbl.column("pos").to_pylist())
        )
        fpath = os.path.join(directory, f"seen_shard_{self.shard_id:05d}.cuckoo")
        if os.path.exists(fpath):
            with open(fpath, "rb") as f:
                self.filter = CuckooFilter.from_bytes(f.read())
        else:
            self.filter = CuckooFilter(max(1 << 20, 2 * len(self.exact)))
            for u in self.exact:
                self.filter.add(u)
        return len(self.exact)


class ShardedSeen:
    """Client facade over the shard pool. Driver- or task-side."""

    def __init__(self, num_shards: int = 8, filter_capacity: int = 1 << 20):
        self.num_shards = num_shards
        self.shards, fresh = reuse.acquire(
            "seen", num_shards, lambda i: SeenShard.remote(i, filter_capacity)
        )
        if not fresh:
            # per-actor call ordering makes the reset happen-before any
            # later RPC from this owner — no stale state observable
            for sh in self.shards:
                sh.reset.remote(filter_capacity)

    def _route(self, urls, hashes=None) -> np.ndarray:
        # hash64_batch hashes pyarrow arrays straight from the utf-8
        # buffer — no Python-string materialization on the driver.
        # Callers that already hold the urls' hash64 values (wave
        # summaries ship them as a canon_hashes column) pass ``hashes``
        # and skip driver-side hashing entirely.
        if hashes is not None:
            h = np.asarray(hashes, dtype=np.uint64)
        else:
            h = hash64_batch(urls if isinstance(urls, pa.Array) else list(urls))
        return (h % np.uint64(self.num_shards)).astype(np.int64)

    @staticmethod
    def _take(urls, flat_idx: np.ndarray):
        """Per-shard payload: an Arrow take (shipped zero-copy) for
        Arrow input, a list for sequence input."""
        if isinstance(urls, pa.Array):
            return urls.take(pa.array(flat_idx, pa.int64()))
        arr = np.asarray(urls, dtype=object)
        return list(arr[flat_idx])

    def check_and_add(
        self, urls, pos: Optional[Sequence[int]] = None, hashes=None
    ) -> np.ndarray:
        """Batched first-wins membership+insert. Returns boolean mask
        aligned with ``urls`` (True = newly seen). ``urls`` order
        within a shard defines first-wins for in-call duplicates, so
        callers pass urls already sorted by discovery position.
        Accepts a pyarrow string Array (preferred at scale: routing
        hashes read the Arrow buffer, per-shard slices ship as Arrow).
        ``hashes`` (uint64 per url) skips routing's hash computation
        when the caller already has them (wave-task-computed)."""
        if len(urls) == 0:
            return np.zeros(0, dtype=bool)
        if pos is None:
            pos = np.arange(len(urls))
        shard_ids = self._route(urls, hashes)
        refs = {}
        idxs = {}
        pos_arr = np.asarray(pos)
        for s in np.unique(shard_ids):
            flat = np.flatnonzero(shard_ids == s)
            idxs[s] = flat
            refs[s] = self.shards[s].check_and_add.remote(
                self._take(urls, flat), [int(x) for x in pos_arr[flat]]
            )
        out = np.zeros(len(urls), dtype=bool)
        for s, ref in refs.items():
            out[idxs[s]] = ray.get(ref)
        return out

    def contains(self, urls, hashes=None) -> np.ndarray:
        if len(urls) == 0:
            return np.zeros(0, dtype=bool)
        shard_ids = self._route(urls, hashes)
        refs, idxs = {}, {}
        for s in np.unique(shard_ids):
            flat = np.flatnonzero(shard_ids == s)
            idxs[s] = flat
            refs[s] = self.shards[s].contains.remote(self._take(urls, flat))
        out = np.zeros(len(urls), dtype=bool)
        for s, ref in refs.items():
            out[idxs[s]] = ray.get(ref)
        return out

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def dump(self) -> list[str]:
        out: list[str] = []
        for part in ray.get([s.dump.remote() for s in self.shards]):
            out.extend(part)
        return sorted(out)

    def close(self, kill: bool = False) -> None:
        """Release shard actors. Default parks them (reset) in the
        process-level reuse pool so the next crawler skips actor
        spawn; ``kill=True`` terminates them (explicit memory
        release). Either way this pool object is done."""
        if kill:
            for sh in self.shards:
                try:
                    ray.kill(sh)
                except Exception:
                    pass
        else:
            for sh in self.shards:
                sh.reset.remote()  # park empty: large seen sets freed now
            reuse.release("seen", self.shards)
        self.shards = []

    def checkpoint(self, directory: str) -> None:
        ray.get(self.checkpoint_async(directory))

    def checkpoint_async(self, directory: str) -> list:
        """Fire shard checkpoints, return refs (caller overlaps the wait)."""
        return [s.checkpoint.remote(directory) for s in self.shards]

    def restore(self, directory: str) -> int:
        return sum(ray.get([s.restore.remote(directory) for s in self.shards]))
