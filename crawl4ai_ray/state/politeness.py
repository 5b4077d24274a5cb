"""Per-host politeness + robots gating, as stateful actor shards.

Reference semantics being modeled:

* robots: ``RobotsParser`` (crawl4ai/utils.py:252-377) — rules cached
  per domain with 7-day TTL, allow-on-missing/error; deny produces a
  403 failed CrawlResult without fetching
  (async_webcrawler.py:384-397).
* rate limiting: ``RateLimiter`` (crawl4ai/async_dispatcher.py:28-85)
  — per-domain ``DomainState(last_request_time, current_delay,
  fail_count)``; base delay drawn uniform from ``base_delay=(1,3)`` s;
  on 429/503 the delay doubles with ±25% jitter capped at
  ``max_delay=60``; on success it decays toward the base by ×0.75;
  ``max_retries=3`` then the url is marked failed.

Ray mapping: one ``PolitenessShard`` actor per ``hash64(host) %
num_shards``. A single actor owns each true host, so crawl-delay is
enforced exactly even when hot-host salting spreads a host's *queue
storage* across partitions. Time is **virtual**: the shard computes
each request's release time from the host schedule instead of
sleeping, so the sandbox measures engine throughput, not simulated
network stalls; the accumulated stall budget is reported per wave as
a politeness metric. Randomness is replaced by a deterministic
hash-seeded jitter so checkpoint/resume and reruns are bit-identical.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional, Sequence
from urllib.parse import urlparse

import numpy as np
import ray

from ..functions.hashing import hash64, hash64_batch
from . import reuse


def parse_robots(body: str) -> list[tuple[bool, str]]:
    """Parse robots.txt into [(allow, path_prefix)] for agent '*'.

    Longest-prefix-match semantics (Google/RFC 9309 style). Returns
    rules in file order; ``can_fetch`` resolves by longest match,
    allow winning ties.
    """
    rules: list[tuple[bool, str]] = []
    active = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            active = val == "*"
        elif active and key in ("allow", "disallow") and val:
            rules.append((key == "allow", val))
    return rules


def robots_crawl_delay(body: str) -> Optional[float]:
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip().lower()
        if line.startswith("crawl-delay:"):
            try:
                return float(line.split(":", 1)[1].strip())
            except ValueError:
                return None
    return None


def _paths_of(urls) -> list:
    """Vectorized path extraction (pandas C regex) — the gate loop ran
    urlparse per url, dominating large-wave admission. Equivalence
    with urlparse().path or "/" is unit-tested."""
    import pandas as pd

    s = pd.Series(list(urls), dtype=object)
    # strip scheme://netloc; drop query/fragment; drop ;params (which
    # urlparse splits from the LAST path segment only)
    p = s.str.replace(r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//[^/?#]*", "", regex=True)
    p = p.str.replace(r"[?#].*$", "", regex=True)
    p = p.str.replace(r";[^/]*$", "", regex=True)
    return p.where(p != "", "/").tolist()


def can_fetch(rules: list[tuple[bool, str]], path: str) -> bool:
    """Longest-match allow/disallow; allow on no match (reference is
    allow-on-error, utils.py:343-352)."""
    best_len = -1
    best_allow = True
    for allow, prefix in rules:
        if not path.startswith(prefix):
            continue
        # longest match wins; at equal length allow wins (RFC 9309)
        if len(prefix) > best_len or (len(prefix) == best_len and allow):
            best_len = len(prefix)
            best_allow = allow
    return best_allow


def _jitter(host: str, n: int, lo: float = 0.75, hi: float = 1.25) -> float:
    """Deterministic stand-in for random.uniform(0.75, 1.25)."""
    h = hash64(f"{host}:{n}")
    return lo + (hi - lo) * ((h & 0xFFFFFFFF) / 0xFFFFFFFF)


class _HostState:
    __slots__ = ("next_free", "current_delay", "fail_count", "pages", "rules", "crawl_delay")

    def __init__(self):
        self.next_free = 0.0
        self.current_delay = 0.0
        self.fail_count = 0
        self.pages = 0
        self.rules: Optional[list] = None
        self.crawl_delay: Optional[float] = None


@ray.remote(num_cpus=0)
class PolitenessShard:
    """Owns robots rules + rate state for ``hash64(host) % S == id``."""

    def __init__(
        self,
        shard_id: int,
        base_delay: tuple[float, float] = (1.0, 3.0),
        max_delay: float = 60.0,
        max_retries: int = 3,
        max_pages_per_host: Optional[int] = None,
    ):
        self.shard_id = shard_id
        self.base_delay = base_delay
        self.max_delay = max_delay
        self.max_retries = max_retries
        self.max_pages_per_host = max_pages_per_host
        self.hosts: dict[str, _HostState] = {}

    def reset(
        self,
        base_delay: tuple[float, float] = (1.0, 3.0),
        max_delay: float = 60.0,
        max_retries: int = 3,
        max_pages_per_host: Optional[int] = None,
    ) -> None:
        """Re-arm for a new owner (actor reuse pool): drop all host
        state and take the new owner's config."""
        self.base_delay = base_delay
        self.max_delay = max_delay
        self.max_retries = max_retries
        self.max_pages_per_host = max_pages_per_host
        self.hosts = {}

    def _state(self, host: str) -> _HostState:
        st = self.hosts.get(host)
        if st is None:
            st = self.hosts[host] = _HostState()
        return st

    def set_robots(self, hosts: Sequence[str], bodies: Sequence[str]) -> None:
        for h, b in zip(hosts, bodies):
            st = self._state(h)
            st.rules = parse_robots(b)
            st.crawl_delay = robots_crawl_delay(b)

    def gate(self, urls: Sequence[str], hosts: Sequence[str]) -> dict:
        """Batched admission: for each url returns
        (allowed_by_robots, within_budget, virtual_release_time).

        Release times serialize per host on crawl-delay (virtual
        clock); robots-denied urls do not consume schedule slots
        (the reference fails them before fetching).
        """
        allowed = np.zeros(len(urls), dtype=bool)
        budget_ok = np.ones(len(urls), dtype=bool)
        release = np.zeros(len(urls), dtype=np.float64)
        paths = _paths_of(urls)
        for i, (u, h) in enumerate(zip(urls, hosts)):
            st = self._state(h)
            path = paths[i]
            ok = can_fetch(st.rules, path) if st.rules is not None else True
            allowed[i] = ok
            if not ok:
                continue
            if (
                self.max_pages_per_host is not None
                and st.pages >= self.max_pages_per_host
            ):
                budget_ok[i] = False
                continue
            delay = st.current_delay
            if delay <= 0:
                base = st.crawl_delay
                if base is None:
                    lo, hi = self.base_delay
                    base = lo + (hi - lo) * ((hash64(h) & 0xFFFF) / 0xFFFF)
                delay = st.current_delay = float(base)
            st.next_free = st.next_free + delay
            release[i] = st.next_free
            st.pages += 1
        return {"allowed": allowed, "budget_ok": budget_ok, "release": release}

    def update(self, hosts: Sequence[str], status_codes: Sequence[int]) -> None:
        """Post-fetch backoff/decay (async_dispatcher.py:65-85)."""
        for h, code in zip(hosts, status_codes):
            st = self._state(h)
            if code in (429, 503):
                st.fail_count += 1
                st.current_delay = min(
                    self.max_delay,
                    max(st.current_delay, 1.0) * 2.0 * _jitter(h, st.fail_count),
                )
            else:
                base = st.crawl_delay if st.crawl_delay is not None else self.base_delay[0]
                st.current_delay = max(float(base), st.current_delay * 0.75)

    def stats(self) -> dict:
        return {
            "hosts": len(self.hosts),
            "pages": sum(s.pages for s in self.hosts.values()),
            "max_next_free": max((s.next_free for s in self.hosts.values()), default=0.0),
        }

    def checkpoint(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, f"politeness_shard_{self.shard_id:05d}.pkl")
        data = {
            h: (s.next_free, s.current_delay, s.fail_count, s.pages, s.rules, s.crawl_delay)
            for h, s in self.hosts.items()
        }
        with open(path + ".tmp", "wb") as f:
            pickle.dump(data, f)
        os.replace(path + ".tmp", path)

    def restore(self, directory: str) -> int:
        path = os.path.join(directory, f"politeness_shard_{self.shard_id:05d}.pkl")
        if not os.path.exists(path):
            return 0
        with open(path, "rb") as f:
            data = pickle.load(f)
        self.hosts = {}
        for h, (nf, cd, fc, pg, rules, delay) in data.items():
            st = self._state(h)
            st.next_free, st.current_delay, st.fail_count, st.pages = nf, cd, fc, pg
            st.rules, st.crawl_delay = rules, delay
        return len(self.hosts)


class PolitenessPool:
    """Client facade: routes host batches to their owning shard."""

    def __init__(self, num_shards: int = 4, max_pages_per_host: Optional[int] = None, **kw):
        self.num_shards = num_shards
        self.shards, fresh = reuse.acquire(
            "politeness",
            num_shards,
            lambda i: PolitenessShard.remote(i, max_pages_per_host=max_pages_per_host, **kw),
        )
        if not fresh:
            for sh in self.shards:
                sh.reset.remote(max_pages_per_host=max_pages_per_host, **kw)
        # in-flight update acks, drained off the critical path (next
        # update / gate / stats / close) so a failed shard update
        # surfaces instead of silently leaving stale budgets
        self._pending_updates: list = []

    def _drain_updates(self) -> None:
        if self._pending_updates:
            refs, self._pending_updates = self._pending_updates, []
            ray.get(refs)

    def _route(self, hosts: Sequence[str]) -> np.ndarray:
        return (hash64_batch(list(hosts)) % np.uint64(self.num_shards)).astype(np.int64)

    def set_robots(self, hosts: Sequence[str], bodies: Sequence[str]) -> None:
        ids = self._route(hosts)
        refs = []
        for s in np.unique(ids):
            mask = ids == s
            refs.append(
                self.shards[s].set_robots.remote(
                    [h for h, m in zip(hosts, mask) if m],
                    [b for b, m in zip(bodies, mask) if m],
                )
            )
        ray.get(refs)

    def gate(self, urls: Sequence[str], hosts: Sequence[str]) -> dict:
        n = len(urls)
        allowed = np.zeros(n, dtype=bool)
        budget_ok = np.ones(n, dtype=bool)
        release = np.zeros(n, dtype=np.float64)
        if n == 0:
            return {"allowed": allowed, "budget_ok": budget_ok, "release": release}
        ids = self._route(hosts)
        refs, idxs = {}, {}
        urls_arr = np.asarray(urls, dtype=object)
        hosts_arr = np.asarray(hosts, dtype=object)
        for s in np.unique(ids):
            mask = ids == s
            idxs[s] = np.where(mask)[0]
            refs[s] = self.shards[s].gate.remote(
                list(urls_arr[mask]), list(hosts_arr[mask])
            )
        for s, ref in refs.items():
            r = ray.get(ref)
            allowed[idxs[s]] = r["allowed"]
            budget_ok[idxs[s]] = r["budget_ok"]
            release[idxs[s]] = r["release"]
        return {"allowed": allowed, "budget_ok": budget_ok, "release": release}

    def update(self, hosts: Sequence[str], status_codes: Sequence[int]) -> None:
        """Async with deferred ack: Ray orders actor tasks per caller,
        so the next wave's ``gate`` RPC to the same shard is guaranteed
        to observe this update — no reason for the driver to block on
        the ack on the exec→discovery critical path. Acks are kept and
        drained at the next update/stats/close so a shard failure
        surfaces instead of silently serving stale budgets."""
        if not len(hosts):
            return
        # surface any failure from the PREVIOUS wave's update tasks
        # (already executed by now — actor tasks are caller-ordered)
        # and bound the in-flight queue before enqueuing new ones
        self._drain_updates()
        ids = self._route(hosts)
        codes = np.asarray(status_codes)
        hosts_arr = np.asarray(hosts, dtype=object)
        for s in np.unique(ids):
            mask = ids == s
            self._pending_updates.append(
                self.shards[s].update.remote(
                    list(hosts_arr[mask]), [int(c) for c in codes[mask]]
                )
            )

    def stats(self) -> dict:
        self._drain_updates()
        parts = ray.get([s.stats.remote() for s in self.shards])
        return {
            "hosts": sum(p["hosts"] for p in parts),
            "pages": sum(p["pages"] for p in parts),
            "politeness_makespan_sec": max(p["max_next_free"] for p in parts),
        }

    def close(self, kill: bool = False) -> None:
        """Release shard actors. Default parks them (reset) in the
        process-level reuse pool so the next crawler skips actor
        spawn; ``kill=True`` terminates them."""
        if not kill:
            self._drain_updates()
        else:
            self._pending_updates = []
        if kill:
            for sh in self.shards:
                try:
                    ray.kill(sh)
                except Exception:
                    pass
        else:
            for sh in self.shards:
                sh.reset.remote()
            reuse.release("politeness", self.shards)
        self.shards = []

    def checkpoint(self, directory: str) -> None:
        ray.get(self.checkpoint_async(directory))

    def checkpoint_async(self, directory: str) -> list:
        """Fire shard checkpoints, return refs (caller overlaps the wait)."""
        return [s.checkpoint.remote(directory) for s in self.shards]

    def restore(self, directory: str) -> int:
        return sum(ray.get([s.restore.remote(directory) for s in self.shards]))
