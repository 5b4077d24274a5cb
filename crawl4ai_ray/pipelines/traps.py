"""Crawler-trap detection — URL-template collapse statistics per host.

Crawler traps (calendar pages, session-id URLs, faceted navigation)
are host URL spaces that explode combinatorially while carrying
near-identical content; a production frontier demotes or caps hosts
whose URL census collapses onto few path TEMPLATES. The reference's
URLPatternFilter (deep_crawling/filters.py) lets a user exclude known
patterns by hand; this operator is the corpus-scale analog that FINDS
them: normalize every url's path to a template (digit runs -> ``D``,
>=8-char hex runs -> ``H``), then per host report how many distinct
urls collapse onto how many templates.

Trap signals per host:

- ``n_urls`` / ``n_templates`` — census sizes;
- ``top_template_share`` — fraction of the host's urls under its most
  populous template (ties by template string, exact division);
- ``trap_score = 1 - n_templates / n_urls`` — 0 for all-unique path
  shapes, -> 1 when millions of urls share a handful of templates.

Scale shape: stage 1 is a ``map_batches`` scan that templates paths
with RE2 kernels and PRE-AGGREGATES per (host, template) inside the
batch — the ONE shuffle moves one row per distinct (host, template)
per batch, never per url — bucketed by ``hash(host) % buckets`` so a
single bounded cogroup co-locates everything a host needs and the
template fold and the host stats fuse into one group pass. A hot
host costs one group of (its template count x batches) partial rows —
template counts per host are small by construction (that is the trap
signal), so no url-level key ever shuffles and no group exceeds
worker memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions.hashing import hash64_batch
from ..functions.scaling import auto_buckets

_DIGITS = "[0-9]+"
_HEX8 = "[0-9a-f]{8,}"


def _template_batch(buckets: int):
    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        urls = t.column("url")
        # path = everything from the first '/' after the scheme-host
        # prefix; RE2 kernel, no per-row Python
        path = pc.replace_substring_regex(urls, r"^[a-z]+://[^/]*", "")
        tmpl = pc.replace_substring_regex(path, _HEX8, "H")
        tmpl = pc.replace_substring_regex(tmpl, _DIGITS, "D")
        host = pc.replace_substring_regex(
            urls, r"^[a-z]+://([^/]*).*$", "\\1"
        )
        df = pd.DataFrame(
            {
                "host": host.to_pandas(),
                "template": tmpl.to_pandas(),
            }
        )
        part = (
            df.groupby(["host", "template"], sort=False)
            .size()
            .reset_index(name="n")
        )
        part["bucket"] = (
            hash64_batch(part["host"].tolist()) % np.uint64(buckets)
        ).astype("int64")
        return pa.table(
            {
                "host": pa.array(part["host"], pa.string()),
                "template": pa.array(part["template"], pa.string()),
                "n": pa.array(part["n"].to_numpy(), pa.int64()),
                "bucket": pa.array(part["bucket"].to_numpy(), pa.int64()),
            }
        )

    return fn


def url_trap_stats(
    urls_ds: "rd.Dataset", buckets: int | None = None
) -> pd.DataFrame:
    """Per-host template-collapse stats over a Dataset with a ``url``
    column: (host, n_urls, n_templates, top_template_share,
    trap_score), sorted by host. Assumes urls are distinct (a crawl
    frontier / seen set / corpus census is). Pass input-proportional
    ``buckets`` (functions/scaling.auto_buckets over the SOURCE bytes)
    when the source size is known — calling ``size_bytes()`` on a lazy
    input would execute the whole census twice."""
    if buckets is None:
        buckets = auto_buckets(0)  # the floor; fine for bounded hosts

    def fold_hosts(g: pd.DataFrame) -> pd.DataFrame:
        # per-(host, template) partials from every batch are all here
        # (bucketed by host): fold template counts, then host stats,
        # in one pass
        tc = (
            g.groupby(["host", "template"], sort=False)["n"].sum().reset_index()
        )
        agg = tc.groupby("host", sort=True).agg(
            n_urls=("n", "sum"), n_templates=("n", "size"), top_n=("n", "max")
        )
        return pd.DataFrame(
            {
                "host": agg.index,
                "n_urls": agg["n_urls"].astype("int64"),
                "n_templates": agg["n_templates"].astype("int64"),
                "top_template_share": agg["top_n"] / agg["n_urls"],
                "trap_score": 1.0 - agg["n_templates"] / agg["n_urls"],
            }
        )

    out = (
        urls_ds.map_batches(_template_batch(buckets), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold_hosts, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("host").reset_index(drop=True)


def corpus_url_census(sf_dir: str) -> "rd.Dataset":
    """The corpus's full url surface as a Dataset — each page's
    canonical ``/page/p`` plus its ``/r/p`` and ``/rr/p`` redirect
    aliases (sources/corpus.py alias rules), derived arithmetically
    from doc_id so the oracle replays it in SQL."""
    import os

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def urls(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        hosts = [f"site-{int(i) % 16}.example.com" for i in ids]
        out = []
        for seg in ("page", "r", "rr"):
            out.extend(f"https://{h}/{seg}/{int(i)}" for h, i in zip(hosts, ids))
        return pa.table({"url": pa.array(out, pa.string())})

    return ds.map_batches(urls, batch_format="pyarrow")


def trap_stats(sf_dir: str) -> pd.DataFrame:
    """Trap statistics over the corpus url census (the queries()
    surface; oracle replays the census + template rule in SQL)."""
    from ..functions.scaling import input_nbytes

    return url_trap_stats(
        corpus_url_census(sf_dir), buckets=auto_buckets(input_nbytes(sf_dir))
    )


TRAP_STATS_SQL = """
    WITH urls AS (
      SELECT 'site-' || CAST(doc_id % 16 AS VARCHAR) || '.example.com' AS host,
             '/' || seg || '/' || CAST(doc_id AS VARCHAR) AS path
      FROM documents, (VALUES ('page'), ('r'), ('rr')) s(seg)
    ),
    tmpl AS (
      SELECT host,
             regexp_replace(regexp_replace(path, '[0-9a-f]{8,}', 'H', 'g'),
                            '[0-9]+', 'D', 'g') AS template
      FROM urls
    ),
    tc AS (SELECT host, template, count(*) AS n FROM tmpl GROUP BY 1, 2),
    hs AS (
      SELECT host, CAST(sum(n) AS BIGINT) AS n_urls,
             CAST(count(*) AS BIGINT) AS n_templates,
             CAST(max(n) AS BIGINT) AS top_n
      FROM tc GROUP BY 1
    )
    SELECT host, n_urls, n_templates,
           CAST(top_n AS DOUBLE) / n_urls AS top_template_share,
           1.0 - CAST(n_templates AS DOUBLE) / n_urls AS trap_score
    FROM hs ORDER BY host
"""
