"""CrawlerHub — named crawler registry (reference ``crawl4ai/hub.py``:
``CrawlerHub`` resolves names like ``amazon_product`` to crawler
classes shipped in ``crawl4ai/crawlers/``).

Here a "named crawler" is a preconfigured engine factory: name ->
callable(corpus_dir, out_dir, **overrides) -> engine instance. Ships
the same built-ins shape the reference exposes (a default BFS, a
best-first, a DFS, and an adaptive digest) and accepts user
registration — the user-extension seam of SURVEY §2.13.
"""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, Callable] = {}


def register(name: str, factory: Callable) -> None:
    """Register a named crawler factory (last registration wins,
    mirroring the reference's module-scan override behavior)."""
    _REGISTRY[name] = factory


def get(name: str) -> Callable:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown crawler {name!r}; available: {sorted(_REGISTRY)}"
        ) from None


def names() -> list[str]:
    return sorted(_REGISTRY)


def _bfs(corpus_dir: str, out_dir: str, **kw):
    from .crawl import BFSCrawler

    return BFSCrawler(corpus_dir, out_dir, **kw)


def _best_first(corpus_dir: str, out_dir: str, **kw):
    from .strategies import BestFirstCrawler

    return BestFirstCrawler(corpus_dir, out_dir, **kw)


def _dfs(corpus_dir: str, out_dir: str, **kw):
    from .strategies import DFSCrawler

    return DFSCrawler(corpus_dir, out_dir, **kw)


def _adaptive(corpus_dir: str, out_dir: str, **kw):
    from .adaptive import AdaptiveConfig, AdaptiveCrawler

    cfg = AdaptiveConfig(**kw) if kw else None
    return AdaptiveCrawler(corpus_dir, out_dir=out_dir, config=cfg)


def _async(corpus_dir: str, out_dir: str, **kw):
    from .async_crawl import AsyncCrawler

    return AsyncCrawler(corpus_dir, out_dir, **kw)


register("bfs", _bfs)
register("best_first", _best_first)
register("dfs", _dfs)
register("adaptive", _adaptive)
register("async", _async)
