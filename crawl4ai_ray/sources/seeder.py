"""URL seeder — sitemap + index discovery and cross-source union.

Models ``AsyncUrlSeeder`` (crawl4ai/async_url_seeder.py):

* ``_from_sitemaps`` / ``_iter_sitemap_content`` (:885-1104) —
  sitemap.xml and sitemap_index.xml parsing (namespace-tolerant),
  gzip handling, lastmod extraction;
* ``_from_cc`` (:829-882) — Common-Crawl index source; in this
  sandbox the corpus table IS the CC-style index, so the source is a
  column-pruned ``read_parquet`` over (url, warc_ts);
* cross-source dedup ``seen`` set (:447-456) -> ``ds.union`` +
  ``groupby(url).min(...)`` first-wins;
* ``max_urls`` cap (:390) -> ``ds.limit``; optional ``URLPatternFilter``
  mask applied inside ``map_batches``.

Sitemap parsing is a ``flat_map``-shaped kernel: one (source_url,
xml bytes) row in, many (url, lastmod, source) rows out.
"""

from __future__ import annotations

import gzip
import re
import xml.etree.ElementTree as ET
from typing import Iterator, Optional

import pyarrow as pa

_NS_RE = re.compile(r"\{[^}]*\}")


def _localname(tag: str) -> str:
    return _NS_RE.sub("", tag)


def parse_sitemap(content: bytes | str) -> dict:
    """Parse sitemap XML -> {'urls': [(loc, lastmod)], 'sitemaps': [loc]}.

    Handles urlset and sitemapindex documents, any namespace prefix,
    and gzipped payloads (``.xml.gz``).
    """
    if isinstance(content, str):
        content = content.encode()
    if content[:2] == b"\x1f\x8b":
        content = gzip.decompress(content)
    out = {"urls": [], "sitemaps": []}
    try:
        root = ET.fromstring(content)
    except ET.ParseError:
        return out
    kind = _localname(root.tag)
    for node in root:
        name = _localname(node.tag)
        if name not in ("url", "sitemap"):
            continue
        loc, lastmod = None, None
        for child in node:
            c = _localname(child.tag)
            if c == "loc":
                loc = (child.text or "").strip()
            elif c == "lastmod":
                lastmod = (child.text or "").strip()
        if not loc:
            continue
        if kind == "sitemapindex" or name == "sitemap":
            out["sitemaps"].append(loc)
        else:
            out["urls"].append((loc, lastmod))
    return out


def sitemap_flat_batch(batch: pa.Table) -> pa.Table:
    """map_batches kernel: (source, xml: binary) -> url rows."""
    sources = batch.column("source").to_pylist()
    xmls = batch.column("xml").to_pylist()
    s_out, u_out, l_out, nested = [], [], [], []
    for src, xml in zip(sources, xmls):
        parsed = parse_sitemap(xml or b"")
        for loc, lastmod in parsed["urls"]:
            s_out.append(src)
            u_out.append(loc)
            l_out.append(lastmod)
        for loc in parsed["sitemaps"]:
            nested.append((src, loc))
    # nested sitemap refs are emitted as rows with url=None for the
    # driver loop to fetch next round (sitemap_index recursion)
    for src, loc in nested:
        s_out.append(src)
        u_out.append(None)
        l_out.append(loc)
    return pa.table(
        {
            "source": pa.array(s_out, pa.string()),
            "url": pa.array(u_out, pa.string()),
            "ref": pa.array(l_out, pa.string()),
        }
    )


def seed_union(
    datasets: list,
    max_urls: Optional[int] = None,
    url_filter=None,
):
    """Union seed sources and dedup first-wins by url.

    Each input Dataset must have columns (url, source). Returns a
    Dataset of (url, source) with one row per distinct url (the
    lexicographically-first source wins ties, deterministically).
    """
    import ray.data as rd

    ds = datasets[0]
    for other in datasets[1:]:
        ds = ds.union(other)
    if url_filter is not None:
        def apply_filter(t: pa.Table) -> pa.Table:
            mask = url_filter.apply_batch(t.column("url").to_pylist())
            return t.filter(pa.array(mask))

        ds = ds.map_batches(apply_filter, batch_format="pyarrow")
    ds = ds.groupby("url").min("source")
    ds = ds.map_batches(
        lambda t: t.rename_columns(["url", "source"]), batch_format="pyarrow"
    )
    if max_urls is not None:
        ds = ds.limit(max_urls)
    return ds


def seed_urls_scored(
    seed_ds,
    corpus_dir: str,
    query: str,
    score_threshold: float = 0.0,
    max_urls: Optional[int] = None,
):
    """Query-scored seed discovery — the reference
    ``AsyncUrlSeeder.urls(query=..., scoring_method="bm25",
    score_threshold=...)`` pipeline (async_url_seeder.py:364-556):
    discovered urls -> head fetch -> simplified-BM25 relevance vs the
    query -> threshold -> score-desc ordering -> cap.

    ``seed_ds``: (url, source) Dataset (e.g. from ``seed_union``).
    Head "fetch" resolves against the corpus like the crawl fetch
    stage; the returned Dataset has (url, source, relevance_score).
    """
    import ray.data as rd

    from ..stages.fetch import fetch_batch
    from ..stages.head_filters import ContentRelevanceHead, head_of

    scorer = ContentRelevanceHead(query, threshold=score_threshold)

    def score_batch(t: pa.Table) -> pa.Table:
        n = t.num_rows
        frontier = pa.table(
            {
                "url": t.column("url"),
                "order": pa.array(list(range(n)), pa.int64()),
            }
        )
        fetched = fetch_batch(frontier, corpus_dir)
        htmls = fetched.column("html").to_pylist()
        scores = [
            scorer.score_head(head_of(h)) if h is not None else 0.0 for h in htmls
        ]
        out = t.append_column(
            "relevance_score", pa.array([round(s, 6) for s in scores], pa.float64())
        )
        return out.filter(
            pa.array([s >= score_threshold for s in scores], pa.bool_())
        )

    # sort urls within the scoring stage's input for pruned head reads
    ds = seed_ds.sort("url").map_batches(score_batch, batch_format="pyarrow")
    ds = ds.sort(["relevance_score", "url"], descending=[True, False])
    if max_urls is not None:
        ds = ds.limit(max_urls)
    return ds
