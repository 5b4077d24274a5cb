"""Domain mapper — reference ``DomainMapper.scan``
(crawl4ai/domain_mapper.py:206-330): multi-source URL/host discovery
for a domain with per-source attribution and cross-source dedup
(source string like ``"subdomains+homepage+sitemap"``).

Ray mapping (SURVEY §2.1): one Dataset per source ->
``ds.union(...)`` -> first-wins dedup by url keeping the source list
aggregated. The network-touching sources (crt.sh, wayback, live CC)
are replaced by in-sandbox equivalents resolved against the corpus:

- ``subdomains``: common-prefix guesses probed against the corpus
  host set (reference DEFAULT_COMMON_SUBDOMAINS guessing)
- ``homepage``: fetch the domain's homepage from the corpus and take
  its out-link urls (reference homepage source)
- ``sitemap``: urls from a provided sitemap blob via the seeder's
  parser (reference sitemap source)
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# reference DEFAULT_COMMON_SUBDOMAINS head (domain_mapper.py:72+)
COMMON_SUBDOMAINS = [
    "www", "api", "blog", "docs", "shop", "app", "dev", "staging",
    "mail", "cdn", "static", "m",
]

VALID_SOURCES = {"subdomains", "homepage", "sitemap"}


def _empty() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([], pa.string()),
            "host": pa.array([], pa.string()),
            "source": pa.array([], pa.string()),
        }
    )


def _subdomain_source(domain: str, corpus_dir: str) -> rd.Dataset:
    """Probe common-subdomain guesses against the corpus host set."""
    import pyarrow.dataset as pads

    from ..functions.urls import hosts_of

    urls = (
        pads.dataset(corpus_dir, format="parquet")
        .to_table(columns=["url"])
        .column("url")
    )
    hosts = set(hosts_of(urls.to_pylist()))
    rows = []
    for cand in [domain] + [f"{p}.{domain}" for p in COMMON_SUBDOMAINS]:
        if cand in hosts:
            rows.append((f"https://{cand}/", cand, "subdomains"))
    if not rows:
        return rd.from_arrow(_empty())
    u, h, s = zip(*rows)
    return rd.from_arrow(
        pa.table(
            {
                "url": pa.array(list(u), pa.string()),
                "host": pa.array(list(h), pa.string()),
                "source": pa.array(list(s), pa.string()),
            }
        )
    )


def _homepage_source(domain: str, corpus_dir: str) -> rd.Dataset:
    """Out-links of the domain's homepage (fetched from the corpus)."""
    from ..functions.urls import hosts_of
    from ..stages.extract import extract_batch
    from ..stages.fetch import fetch_batch

    candidates = [f"https://{domain}/", f"https://{domain}"]
    frontier = pa.table(
        {
            "url": pa.array(candidates, pa.string()),
            "order": pa.array(list(range(len(candidates))), pa.int64()),
        }
    )
    fetched = fetch_batch(frontier, corpus_dir)
    ok = fetched.filter(fetched.column("fetched"))
    if ok.num_rows == 0:
        # no literal homepage in the corpus: use the host's first url
        # (url-sorted corpus -> range scan, first row)
        import pyarrow.dataset as pads

        lo, hi = f"https://{domain}/", f"https://{domain}0"
        first = (
            pads.dataset(corpus_dir, format="parquet")
            .to_table(
                filter=(pc.field("url") >= lo) & (pc.field("url") < hi),
                columns=["url"],
            )
            .column("url")
        )
        if len(first) == 0:
            return rd.from_arrow(_empty())
        frontier = pa.table(
            {
                "url": pa.array([sorted(first.to_pylist())[0]], pa.string()),
                "order": pa.array([0], pa.int64()),
            }
        )
        fetched = fetch_batch(frontier, corpus_dir)
        ok = fetched.filter(fetched.column("fetched"))
    if ok.num_rows == 0:
        return rd.from_arrow(_empty())
    ext = extract_batch(ok)
    links = []
    for lst in ext.column("links_internal").to_pylist():
        links.extend(d["href"] for d in lst)
    for lst in ext.column("links_external").to_pylist():
        links.extend(d["href"] for d in lst)
    if not links:
        return rd.from_arrow(_empty())
    return rd.from_arrow(
        pa.table(
            {
                "url": pa.array(links, pa.string()),
                "host": pa.array(hosts_of(links), pa.string()),
                "source": pa.array(["homepage"] * len(links), pa.string()),
            }
        )
    )


def _sitemap_source(domain: str, sitemap_blob: Optional[bytes]) -> rd.Dataset:
    from ..functions.urls import hosts_of
    from .seeder import parse_sitemap

    if not sitemap_blob:
        return rd.from_arrow(_empty())
    parsed = parse_sitemap(sitemap_blob)
    urls = [loc for loc, _lastmod in parsed.get("urls", [])]
    if not urls:
        return rd.from_arrow(_empty())
    return rd.from_arrow(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "host": pa.array(hosts_of(urls), pa.string()),
                "source": pa.array(["sitemap"] * len(urls), pa.string()),
            }
        )
    )


def scan(
    domain: str,
    corpus_dir: str,
    source: str = "subdomains+homepage",
    sitemap_blob: Optional[bytes] = None,
) -> rd.Dataset:
    """Multi-source domain scan -> deduped (url, host, sources) rows.

    ``sources`` aggregates every source that found the url
    ('+'-joined, sorted), reference scan result attribution.
    """
    wanted = {s.strip().lower() for s in source.split("+") if s.strip()}
    invalid = wanted - VALID_SOURCES
    if invalid:
        raise ValueError(f"Invalid source(s): {invalid}. Valid: {VALID_SOURCES}")

    parts = []
    if "subdomains" in wanted:
        parts.append(_subdomain_source(domain, corpus_dir))
    if "homepage" in wanted:
        parts.append(_homepage_source(domain, corpus_dir))
    if "sitemap" in wanted:
        parts.append(_sitemap_source(domain, sitemap_blob))
    if not parts:
        return rd.from_arrow(_empty())
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)

    def agg_sources(g):
        import pandas as pd

        return pd.DataFrame(
            {
                "url": [g["url"].iloc[0]],
                "host": [g["host"].iloc[0]],
                "sources": ["+".join(sorted(set(g["source"])))],
            }
        )

    return ds.groupby("url").map_groups(agg_sources, batch_format="pandas")
