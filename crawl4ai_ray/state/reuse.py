"""Process-level shard-actor reuse pool.

A crawler owns its state actors (URL-seen shards, politeness shards).
Creating a crawler therefore used to spawn ``num_seen_shards +
num_politeness_shards`` fresh actor processes, each paying worker
spawn + module import (~0.5-1 s even with the lazy package
``__init__``); a workload that constructs many short-lived crawlers
(the bench harness, the test suite, a hub serving per-config engines)
repaid that cost every time.

This pool parks *reset* shard actors on ``close()`` and hands them
back to the next pool of the same (kind, shard-count) shape — the
actor-process analog of connection pooling. Semantics are preserved
because acquisition always fires a ``reset(...)`` RPC with the new
owner's config before any other call, and Ray guarantees per-actor
call ordering, so the new owner can never observe stale state.

On a long-running multi-node crawl this is a no-op (one crawler, one
actor set, spawn amortized over hours); it matters for the
many-short-jobs shape. Pool entries are keyed by the Ray job id so a
``ray.shutdown()``/``ray.init()`` cycle in one process invalidates
stale handles instead of erroring.
"""

from __future__ import annotations

from typing import Callable, Optional

import ray

# key -> list of parked shard-lists (each a full [shard_0..shard_{n-1}])
_FREE: dict[tuple, list] = {}
_SESSION: Optional[str] = None


def _session_id() -> Optional[str]:
    try:
        return ray.get_runtime_context().get_job_id()
    except Exception:
        return None


def acquire(kind: str, n: int, factory: Callable[[int], "ray.actor.ActorHandle"]):
    """Return (shards, fresh). ``shards`` is a list of n actors with
    shard ids 0..n-1; ``fresh`` is False when they came from the pool
    (caller must then fire ``reset`` RPCs with its own config)."""
    global _SESSION
    s = _session_id()
    if s != _SESSION:
        _FREE.clear()
        _SESSION = s
    parked = _FREE.get((kind, n))
    if parked:
        return parked.pop(), False
    return [factory(i) for i in range(n)], True


def release(kind: str, shards: list) -> None:
    """Park a full shard list for reuse. Caller has already fired
    ``reset`` RPCs so parked actors hold no crawl state."""
    if not shards or _session_id() != _SESSION:
        return
    _FREE.setdefault((kind, len(shards)), []).append(list(shards))


def clear(kill: bool = True) -> int:
    """Drop (and by default kill) every parked actor. Returns the
    number of actors dropped. Test teardown / explicit memory release."""
    n = 0
    for lists in _FREE.values():
        for shards in lists:
            for a in shards:
                n += 1
                if kill:
                    try:
                        ray.kill(a)
                    except Exception:
                        pass
    _FREE.clear()
    return n
