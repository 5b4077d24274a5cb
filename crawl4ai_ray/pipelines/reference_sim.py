"""Serial reference-semantics crawl simulator (test oracle only).

A faithful single-process reimplementation of the reference's BFS
deep-crawl loop (``crawl4ai/deep_crawling/bfs_strategy.py:207-301``)
over the synthetic corpus, used by the test suite as ground truth for
*crawl ordering and URL-seen parity* of the distributed engine
(north rule: "crawl ordering and final URL-seen set must match the
reference under the same seed list + politeness budget").

Reference behaviors replicated exactly:

* ``visited`` starts EMPTY — seed urls are not pre-added
  (bfs_strategy.py:228-234), so a seed rediscovered later is crawled
  again.
* Per-result sequential link discovery: ``visited`` is updated as
  links are found, so earlier results in a wave shadow later ones
  (first-wins in (result order, link order) position).
* ``pages_crawled`` counts successes only and increments before that
  result's link discovery; ``remaining_capacity`` truncates the
  result's valid links AFTER they were added to visited — truncated
  urls are permanently "seen but never crawled"
  (bfs_strategy.py:152-196).
* Links beyond ``max_depth`` are not discovered; depth-0 bypasses
  the filter chain (bfs_strategy.py:63-82).
* Robots-denied urls become failed results (403) with no link
  discovery (async_webcrawler.py:384-397).
"""

from __future__ import annotations

from math import inf
from typing import Callable, Optional
from urllib.parse import urlparse

from ..functions.urls import is_valid_crawl_url, normalize_url_for_deep_crawl
from ..stages.extract import scrape_page
from ..state.politeness import can_fetch, parse_robots


class SimResult:
    __slots__ = ("url", "depth", "parent_url", "success", "status_code", "order", "text", "host")

    def __init__(self, url, depth, parent_url, success, status_code, order, text, host):
        self.url = url
        self.depth = depth
        self.parent_url = parent_url
        self.success = success
        self.status_code = status_code
        self.order = order
        self.text = text
        self.host = host


def simulate_best_first_crawl(
    corpus: dict[str, bytes],
    seeds: list[str],
    max_depth: int,
    robots: Optional[dict[str, str]] = None,
    max_pages: float = inf,
    include_external: bool = False,
    url_filter: Optional[Callable[[str], bool]] = None,
    url_scorer: Optional[Callable[[str], float]] = None,
    score_threshold: float = -inf,
    batch_size: int = 10,
) -> tuple[list[SimResult], set[str]]:
    """Serial best-first (bff_strategy.py:193-361): priority queue of
    (-score, depth, url, parent); visited marked at pop; BATCH_SIZE
    pops per round; results processed in priority order; discovery
    does not mark visited; threshold applied at push."""
    import heapq

    robots_rules = {h: parse_robots(b) for h, b in (robots or {}).items()}
    heap: list[tuple] = []
    depths: dict[str, int] = {}
    for u in seeds:
        s = url_scorer(u) if url_scorer else 0
        heapq.heappush(heap, (-s, 0, u, ""))
        depths[u] = 0
    visited: set[str] = set()
    pages_crawled = 0
    order = 0
    results: list[SimResult] = []

    def can_process(url: str, depth: int) -> bool:
        if not is_valid_crawl_url(url):
            return False
        if depth != 0 and url_filter is not None and not url_filter(url):
            return False
        return True

    while heap and pages_crawled < max_pages:
        batch = []
        for _ in range(batch_size):
            if not heap:
                break
            item = heapq.heappop(heap)
            if item[2] in visited:
                continue
            visited.add(item[2])
            batch.append(item)
        if not batch:
            continue
        stop = False
        for negs, depth, url, parent in batch:
            host = urlparse(url).netloc.lower()
            path = urlparse(url).path or "/"
            rules = robots_rules.get(host)
            if rules is not None and not can_fetch(rules, path):
                results.append(SimResult(url, depth, parent or None, False, 403, order, "", host))
                order += 1
                continue
            html = corpus.get(url)
            if html is None:
                results.append(SimResult(url, depth, parent or None, False, 404, order, "", host))
                order += 1
                continue
            row = scrape_page(url, html)
            results.append(SimResult(url, depth, parent or None, True, 200, order, row["text"], host))
            order += 1
            pages_crawled += 1
            if pages_crawled >= max_pages:
                stop = True
                break
            # bff link_discovery (:146-190) — no visited marking
            new_depth = depth + 1
            if new_depth > max_depth:
                continue
            if max_pages - pages_crawled <= 0:
                continue
            links = list(row["links_internal"])
            if include_external:
                links += list(row["links_external"])
            for link in links:
                canon = normalize_url_for_deep_crawl(link["href"], url)
                if canon in visited:
                    continue
                if not can_process(canon, new_depth):
                    continue
                depths[canon] = new_depth
                s = url_scorer(canon) if url_scorer else 0
                if s < score_threshold:
                    continue
                heapq.heappush(heap, (-s, depths.get(canon, new_depth), canon, url))
        if stop:
            break
    return results, visited


def simulate_dfs_crawl(
    corpus: dict[str, bytes],
    seeds: list[str],
    max_depth: int,
    robots: Optional[dict[str, str]] = None,
    max_pages: float = inf,
    include_external: bool = False,
    url_filter: Optional[Callable[[str], bool]] = None,
    url_scorer: Optional[Callable[[str], float]] = None,
    score_threshold: float = -inf,
) -> tuple[list[SimResult], set[str]]:
    """Serial DFS (dfs_strategy.py): stack pops one url per step;
    separate ``_dfs_seen`` discovery set; children pushed reversed."""
    robots_rules = {h: parse_robots(b) for h, b in (robots or {}).items()}
    visited: set[str] = set()
    dfs_seen: set[str] = set(seeds)
    stack = [(u, None, 0) for u in reversed(seeds)]
    depths = {u: 0 for u in seeds}
    pages_crawled = 0
    order = 0
    results: list[SimResult] = []

    def can_process(url: str, depth: int) -> bool:
        if not is_valid_crawl_url(url):
            return False
        if depth != 0 and url_filter is not None and not url_filter(url):
            return False
        return True

    while stack and pages_crawled < max_pages:
        url, parent, depth = stack.pop()
        if url in visited or depth > max_depth:
            continue
        visited.add(url)
        host = urlparse(url).netloc.lower()
        path = urlparse(url).path or "/"
        rules = robots_rules.get(host)
        if rules is not None and not can_fetch(rules, path):
            results.append(SimResult(url, depth, parent, False, 403, order, "", host))
            order += 1
            continue
        html = corpus.get(url)
        if html is None:
            results.append(SimResult(url, depth, parent, False, 404, order, "", host))
            order += 1
            continue
        row = scrape_page(url, html)
        results.append(SimResult(url, depth, parent, True, 200, order, row["text"], host))
        order += 1
        pages_crawled += 1
        if pages_crawled >= max_pages:
            break
        new_depth = depth + 1
        if new_depth > max_depth:
            continue
        remaining = max_pages - pages_crawled
        if remaining <= 0:
            continue
        links = list(row["links_internal"])
        if include_external:
            links += list(row["links_external"])
        valid = []
        for link in links:
            canon = normalize_url_for_deep_crawl(link["href"], url)
            if not canon or canon in dfs_seen:
                continue
            if not can_process(canon, new_depth):
                continue
            s = url_scorer(canon) if url_scorer else 0
            if s < score_threshold:
                continue
            dfs_seen.add(canon)
            valid.append((canon, s))
        if len(valid) > remaining:
            if url_scorer:
                valid.sort(key=lambda x: x[1], reverse=True)
            valid = valid[: int(remaining)]
        new_links = [(u, url) for u, _ in valid]
        for u, _ in valid:
            depths[u] = new_depth
        for new_url, new_parent in reversed(new_links):
            stack.append((new_url, new_parent, depths.get(new_url, new_depth)))
    return results, visited


def simulate_bfs_crawl(
    corpus: dict[str, bytes],
    seeds: list[str],
    max_depth: int,
    robots: Optional[dict[str, str]] = None,
    max_pages: float = inf,
    include_external: bool = False,
    url_filter: Optional[Callable[[str], bool]] = None,
    url_scorer: Optional[Callable[[str], float]] = None,
    score_threshold: float = -inf,
) -> tuple[list[SimResult], set[str]]:
    """Run the serial BFS. Returns (ordered results, visited set)."""
    robots_rules = {
        h: parse_robots(b) for h, b in (robots or {}).items()
    }
    visited: set[str] = set()
    current_level: list[tuple[str, Optional[str]]] = [(u, None) for u in seeds]
    depths: dict[str, int] = {u: 0 for u in seeds}
    pages_crawled = 0
    order = 0
    results: list[SimResult] = []

    def can_process(url: str, depth: int) -> bool:
        if not is_valid_crawl_url(url):
            return False
        if depth != 0 and url_filter is not None and not url_filter(url):
            return False
        return True

    while current_level:
        if pages_crawled >= max_pages:
            break
        next_level: list[tuple[str, Optional[str]]] = []
        for url, parent in current_level:
            host = urlparse(url).netloc.lower()
            depth = depths.get(url, 0)
            rules = robots_rules.get(host)
            path = urlparse(url).path or "/"
            if rules is not None and not can_fetch(rules, path):
                results.append(
                    SimResult(url, depth, parent, False, 403, order, "", host)
                )
                order += 1
                continue
            html = corpus.get(url)
            if html is None:
                results.append(
                    SimResult(url, depth, parent, False, 404, order, "", host)
                )
                order += 1
                continue
            row = scrape_page(url, html)
            results.append(
                SimResult(url, depth, parent, True, 200, order, row["text"], host)
            )
            order += 1
            pages_crawled += 1

            # link discovery (bfs_strategy.py:133-205)
            next_depth = depth + 1
            if next_depth > max_depth:
                continue
            remaining = max_pages - pages_crawled
            if remaining <= 0:
                continue
            links = list(row["links_internal"])
            if include_external:
                links += list(row["links_external"])
            valid: list[tuple[str, float]] = []
            for link in links:
                canon = normalize_url_for_deep_crawl(link["href"], url)
                if canon in visited:
                    continue
                if not can_process(canon, next_depth):
                    continue
                score = url_scorer(canon) if url_scorer else 0.0
                if score < score_threshold:
                    continue
                visited.add(canon)
                valid.append((canon, score))
            if len(valid) > remaining:
                if url_scorer:
                    valid.sort(key=lambda x: x[1], reverse=True)
                valid = valid[: int(remaining)]
            for u, _ in valid:
                next_level.append((u, url))
                depths[u] = next_depth
        current_level = next_level

    return results, visited
