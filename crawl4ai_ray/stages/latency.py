"""Deterministic per-url simulated fetch latency.

The synthetic corpus fetch is a local parquet range-read with ZERO
latency variance, so it cannot exhibit the scenario the barrier-free
``AsyncCrawler`` engine exists for: real network fetches with
second-scale, heavy-tailed per-url latency, where a wave barrier
idles the whole pool on every straggler.  The reference crawler's
``MemoryAdaptiveDispatcher`` exists for exactly this shape
(crawl4ai/async_dispatcher.py:148-215 — per-url tasks so a slow fetch
delays only itself).

This module injects that shape at the fetch seam without touching any
oracle: a crawler constructed with ``fetch_latency={...}`` sleeps, per
fetch task, the MAX of its chunk's per-url delays — the wall-clock a
real concurrent (aiohttp-style) fetcher pays for a chunk, since all
urls in the chunk fetch in parallel and the task completes with its
slowest response.  Crawl results (pages, order, seen set) are
byte-identical with or without the model; only wall time changes.

Delays are a pure function of (url, seed): splitmix64 over the url's
stable 64-bit hash mixed with the seed, mapped through a bounded
Pareto tail

    delay(u) = min(cap, base * U(u) ** (-1/alpha)),   U(u) in (0, 1]

so ~(base/cap)^alpha of urls sit at the cap (with the defaults:
base=30ms, alpha=1.3, cap=3s — about 0.25% of urls are multi-second
stragglers, the documented head-of-line shape of real crawls).
Determinism makes every A/B exactly reproducible.
"""

from __future__ import annotations

import time

import numpy as np

# splitmix64 constants (public-domain PRNG finalizer)
_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (x + _GAMMA).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * _M1
        z = (z ^ (z >> np.uint64(27))) * _M2
        return z ^ (z >> np.uint64(31))


def url_delays(
    urls: list[str],
    *,
    seed: int = 0,
    base: float = 0.03,
    alpha: float = 1.3,
    cap: float = 3.0,
) -> np.ndarray:
    """Deterministic heavy-tailed per-url delay vector (seconds)."""
    from ..functions.hashing import hash64_batch

    h = np.asarray(hash64_batch(list(urls)), dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = _splitmix64(h ^ (np.uint64(seed & 0xFFFFFFFFFFFFFFFF) * _GAMMA))
    # map to (0, 1]: 0 would blow up the Pareto inverse CDF
    u = (z.astype(np.float64) + 1.0) / 2.0**64
    return np.minimum(cap, base * u ** (-1.0 / alpha))


def simulate_fetch_latency(urls, latency: dict | None) -> float:
    """Sleep the chunk's concurrent-fetch wall time (max per-url
    delay); returns the slept seconds.  ``latency=None`` is a no-op —
    the default everywhere, so oracles and parity tests never see it."""
    if latency is None or len(urls) == 0:
        return 0.0
    d = float(url_delays(list(urls), **latency).max())
    time.sleep(d)
    return d
