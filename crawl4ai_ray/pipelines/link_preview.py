"""Link preview: head extraction + contextual scoring for page links.

Models the reference ``LinkPreview`` feature (crawl4ai/link_preview.py
+ ``AsyncUrlSeeder.extract_head_for_urls``, async_url_seeder.py:592-755):
after a page is scraped, its links are pattern-filtered, each
candidate's ``<head>`` is fetched, a BM25 contextual score against an
optional query is computed **relative to the page's candidate set**,
and every link gets ``total_score = 0.7*intrinsic + 0.3*contextual``
(utils.py:3459-3506) with smart fallbacks.

Semantics preserved exactly:

* ``_filter_links`` (link_preview.py:112-176): internal then external
  hrefs, fnmatch include then exclude patterns, truncate to
  ``max_links`` **before** dedup, order-preserving dedup.
* nonsense-URL skip (``_is_nonsense_url``, async_url_seeder.py:1607-
  1650): robots/sitemap/utility files never get a head fetch.
* head text context (``_extract_text_context``, :1466-1517): title,
  standard/OG/Twitter/DC meta fields joined with spaces.
* BM25Okapi + per-page min-max normalization (:1703-1755) via
  functions/bm25.py; URL-string relevance fallback (:1519-1605) for
  valid heads with no text.
* ``score_threshold`` drops a link's *head result* (not the link):
  links below threshold keep intrinsic-only total scores
  (extract_head_for_urls:737-738 filters results, _merge_head_data
  keeps every original link).
* unfiltered/unfetched links still get ``total_score`` from their
  intrinsic score (link_preview.py:344-352, 396-404).

Ray shape (scale-first): pages -> flatten links (map_batches) ->
``sort("href")`` so the corpus-keyed head fetch hits row-group-pruned
ranges (same pattern as the crawl fetch stage) -> per-page regroup
(``groupby("page_url").map_groups``) for the candidate-set-relative
BM25 + blending. Only link metadata and short head strings move
through the shuffles — never page HTML.
"""

from __future__ import annotations

import fnmatch
from dataclasses import dataclass
from typing import List, Optional, Sequence
from urllib.parse import urlparse

import pyarrow as pa

from ..functions.bm25 import bm25_okapi_scores, minmax_normalize
from ..functions.page_utils import calculate_total_score

_UTILITY_FILES = (
    "ads.txt", "humans.txt", "security.txt", ".well-known/security.txt",
    "crossdomain.xml", "browserconfig.xml", "manifest.json",
    "apple-app-site-association", ".well-known/apple-app-site-association",
    "favicon.ico", "apple-touch-icon.png", "android-chrome-192x192.png",
)


@dataclass
class LinkPreviewConfig:
    """Mirror of the reference LinkPreviewConfig
    (async_configs.py:1155-1250) including its validation rules."""

    include_internal: bool = True
    include_external: bool = False
    include_patterns: Optional[List[str]] = None
    exclude_patterns: Optional[List[str]] = None
    concurrency: int = 10
    timeout: int = 5
    max_links: int = 100
    query: Optional[str] = None
    score_threshold: Optional[float] = None
    verbose: bool = False

    def __post_init__(self):
        if self.concurrency <= 0:
            raise ValueError("concurrency must be positive")
        if self.timeout <= 0:
            raise ValueError("timeout must be positive")
        if self.max_links <= 0:
            raise ValueError("max_links must be positive")
        if self.score_threshold is not None and not (0.0 <= self.score_threshold <= 1.0):
            raise ValueError("score_threshold must be between 0.0 and 1.0")
        if not self.include_internal and not self.include_external:
            raise ValueError(
                "At least one of include_internal or include_external must be True"
            )


def is_nonsense_url(url: str) -> bool:
    """Utility-file skip (async_url_seeder.py:1607-1650 — only the
    uncommented sections: robots/sitemaps/utility files)."""
    path = urlparse(url).path.lower()
    if path.endswith(("/robots.txt", "/sitemap.xml", "/sitemap_index.xml")):
        return True
    if "/sitemap" in path and path.endswith((".xml", ".xml.gz", ".txt")):
        return True
    return any(path.endswith("/" + f) for f in _UTILITY_FILES)


def filter_link_urls(
    internal_hrefs: Sequence[str],
    external_hrefs: Sequence[str],
    cfg: LinkPreviewConfig,
) -> List[str]:
    """_filter_links parity (link_preview.py:112-176): order is
    internal-then-external; include patterns, exclude patterns,
    max_links truncation, then order-preserving dedup."""
    urls: List[str] = []
    if cfg.include_internal:
        urls.extend(h for h in internal_hrefs if h)
    if cfg.include_external:
        urls.extend(h for h in external_hrefs if h)
    if cfg.include_patterns:
        urls = [
            u for u in urls
            if any(fnmatch.fnmatch(u, p) for p in cfg.include_patterns)
        ]
    if cfg.exclude_patterns:
        urls = [
            u for u in urls
            if not any(fnmatch.fnmatch(u, p) for p in cfg.exclude_patterns)
        ]
    if cfg.max_links > 0 and len(urls) > cfg.max_links:
        urls = urls[: cfg.max_links]
    seen: set = set()
    out = []
    for u in urls:
        if u not in seen:
            seen.add(u)
            out.append(u)
    return out


def url_relevance_score(query: str, url: str) -> float:
    """URL-string relevance fallback for heads with no text context
    (async_url_seeder.py:1519-1605), arithmetic order preserved."""
    query_lower = query.lower()
    parsed = urlparse(url)
    domain = parsed.netloc.replace("www.", "")
    path = parsed.path.strip("/")
    all_parts = domain.split(".") + [p for p in path.split("/") if p]
    if parsed.query:
        for param in parsed.query.split("&"):
            if "=" in param:
                k, v = param.split("=", 1)
                all_parts.extend([k, v])

    scores: List[float] = []
    query_tokens = query_lower.split()
    for part in all_parts:
        pl = part.lower()
        if query_lower in pl:
            scores.append(1.0)
        elif pl in query_lower:
            scores.append(0.9)
    for token in query_tokens:
        token_scores = []
        for part in all_parts:
            pl = part.lower()
            if token in pl:
                token_scores.append(0.7 * (len(token) / len(pl)))
            elif pl in token:
                token_scores.append(0.6 * (len(pl) / len(token)))
        if token_scores:
            scores.append(max(token_scores))
    url_text = " ".join(all_parts).lower()
    if len(query_lower) >= 3 and len(url_text) >= 3:
        qn = {query_lower[i : i + 3] for i in range(len(query_lower) - 2)}
        un = {url_text[i : i + 3] for i in range(len(url_text) - 2)}
        if qn and un:
            union = len(qn | un)
            scores.append(0.5 * (len(qn & un) / union if union > 0 else 0))
    if not scores:
        return 0.0
    scores.sort(reverse=True)
    weighted = 0.0
    total_w = 0.0
    for i, s in enumerate(scores):
        w = 1 / (i + 1)
        weighted += s * w
        total_w += w
    return min(weighted / total_w if total_w > 0 else 0, 1.0)


def extract_text_context(head_data: dict) -> str:
    """_extract_text_context parity (async_url_seeder.py:1466-1517);
    jsonld handling omitted (corpus heads carry none) but field order
    is exactly the reference's."""
    parts: List[str] = []
    if head_data.get("title"):
        parts.append(head_data["title"])
    meta = head_data.get("meta", {})
    for key in ("description", "keywords", "author", "subject", "summary", "abstract"):
        if meta.get(key):
            parts.append(meta[key])
    for key in ("og:title", "og:description", "og:site_name", "article:tag"):
        if meta.get(key):
            parts.append(meta[key])
    for key in ("twitter:title", "twitter:description", "twitter:image:alt"):
        if meta.get(key):
            parts.append(meta[key])
    for key in ("dc.title", "dc.description", "dc.subject", "dc.creator"):
        if meta.get(key):
            parts.append(meta[key])
    return " ".join(filter(None, parts))


# ---------------------------------------------------------------------------
# Ray stages
# ---------------------------------------------------------------------------

_FLAT_SCHEMA = pa.schema(
    [
        ("page_url", pa.string()),
        ("href", pa.string()),
        ("is_internal", pa.bool_()),
        ("pos", pa.int64()),
        ("text", pa.string()),
        ("title_attr", pa.string()),
        ("intrinsic_score", pa.float64()),
        ("selected", pa.bool_()),
    ]
)


def flatten_links_batch(batch: pa.Table, cfg: LinkPreviewConfig) -> pa.Table:
    """Extracted pages -> one row per link, tagged ``selected`` when
    the link survives the filter chain + nonsense skip (i.e. will get
    a head fetch)."""
    cols: dict = {name: [] for name in _FLAT_SCHEMA.names}
    pages = batch.column("url").to_pylist()
    internals = batch.column("links_internal").to_pylist()
    externals = batch.column("links_external").to_pylist()
    for page, ilinks, elinks in zip(pages, internals, externals):
        ilinks = ilinks or []
        elinks = elinks or []
        chosen = set(
            filter_link_urls(
                [d["href"] for d in ilinks], [d["href"] for d in elinks], cfg
            )
        )
        for is_int, links in ((True, ilinks), (False, elinks)):
            for pos, d in enumerate(links):
                cols["page_url"].append(page)
                cols["href"].append(d["href"])
                cols["is_internal"].append(is_int)
                cols["pos"].append(pos)
                cols["text"].append(d["text"])
                cols["title_attr"].append(d["title"])
                cols["intrinsic_score"].append(d.get("intrinsic_score", 0.0))
                cols["selected"].append(
                    d["href"] in chosen and not is_nonsense_url(d["href"])
                )
    return pa.Table.from_arrays(
        [pa.array(cols[n], type=_FLAT_SCHEMA.field(n).type) for n in _FLAT_SCHEMA.names],
        schema=_FLAT_SCHEMA,
    )


def head_fetch_batch(batch: pa.Table, corpus_dir: str) -> pa.Table:
    """Stateless task: corpus-keyed head fetch for ``selected`` rows.

    Input batches arrive href-sorted (upstream ``sort("href")``), so
    the underlying ranged + isin scan (stages/fetch.py, per-worker
    dataset-handle cache) stays row-group-pruned — the keyed-store
    analog of the reference's parallel HEAD requests. Adds
    head_status / head_title / head_ctx (nulls for unselected rows).
    A stateless task (not an actor pool) so the stage shares CPUs
    elastically with extract/sort instead of reserving them."""
    import pyarrow.compute as pc

    from ..stages.fetch import fetch_batch
    from ..stages.head_filters import extract_meta_tags, get_title, head_of

    sel_mask = batch.column("selected")
    sel_urls = pc.filter(batch.column("href"), sel_mask)
    html_by_url: dict = {}
    if len(sel_urls):
        if isinstance(sel_urls, pa.ChunkedArray):
            sel_urls = sel_urls.combine_chunks()
        uniq = pc.unique(sel_urls)
        uniq = uniq.take(pc.array_sort_indices(uniq))
        fetched = fetch_batch(pa.table({"url": uniq}), corpus_dir)
        for u, h, ok in zip(
            fetched.column("url").to_pylist(),
            fetched.column("html").to_pylist(),
            fetched.column("fetched").to_pylist(),
        ):
            if ok:
                html_by_url[u] = h
    status, titles, ctxs = [], [], []
    for href, sel in zip(batch.column("href").to_pylist(), sel_mask.to_pylist()):
        if not sel:
            status.append(None)
            titles.append(None)
            ctxs.append(None)
            continue
        html = html_by_url.get(href)
        if html is None:
            status.append("not_valid")
            titles.append(None)
            ctxs.append(None)
            continue
        head = head_of(html)
        head_data = {"title": get_title(head), "meta": extract_meta_tags(head)}
        status.append("valid")
        titles.append(head_data["title"])
        ctxs.append(extract_text_context(head_data))
    return (
        batch.append_column("head_status", pa.array(status, pa.string()))
        .append_column("head_title", pa.array(titles, pa.string()))
        .append_column("head_ctx", pa.array(ctxs, pa.string()))
    )


class ScorePage:
    """map_groups stage: per-page BM25 (candidate-set-relative),
    threshold, total_score blending, relevance ordering."""

    def __init__(self, cfg: LinkPreviewConfig, score_links: bool):
        self.cfg = cfg
        self.score_links = score_links

    def __call__(self, group: pa.Table) -> pa.Table:
        cfg = self.cfg
        rows = group.to_pylist()
        # reconstruct per-list original order
        rows.sort(key=lambda r: (not r["is_internal"], r["pos"]))
        relevance: dict = {}  # row index -> contextual score
        if cfg.query:
            # BM25 set = fetched heads with text context, in head-result
            # order (selected internal-then-external, pos order)
            bm25_idx = [
                i for i, r in enumerate(rows)
                if r["head_status"] == "valid" and r["head_ctx"]
            ]
            docs = [rows[i]["head_ctx"] for i in bm25_idx]
            if docs:
                raw = bm25_okapi_scores(
                    cfg.query.lower().split(),
                    [d.lower().split() for d in docs],
                )
                for i, s in zip(bm25_idx, minmax_normalize(raw)):
                    relevance[i] = float(s)
            for i, r in enumerate(rows):
                if r["head_status"] == "valid" and not r["head_ctx"]:
                    relevance[i] = url_relevance_score(cfg.query, r["href"])
            if cfg.score_threshold is not None:
                # below-threshold head results are dropped from the
                # result set -> the link keeps no head data/score
                for i in list(relevance):
                    if relevance[i] < cfg.score_threshold:
                        del relevance[i]
                for i, r in enumerate(rows):
                    if r["head_status"] is not None and i not in relevance:
                        r["head_status"] = None
                        r["head_title"] = None
                        r["head_ctx"] = None
        out_rows = []
        for i, r in enumerate(rows):
            contextual = relevance.get(i)
            has_head = r["head_status"] is not None
            total = calculate_total_score(
                intrinsic_score=r["intrinsic_score"],
                contextual_score=contextual if has_head else None,
                score_links_enabled=self.score_links,
                query_provided=bool(cfg.query),
            )
            out_rows.append(
                {
                    "page_url": r["page_url"],
                    "href": r["href"],
                    "is_internal": r["is_internal"],
                    "pos": r["pos"],
                    "text": r["text"],
                    "title_attr": r["title_attr"],
                    "intrinsic_score": r["intrinsic_score"],
                    "head_status": r["head_status"],
                    "head_title": r["head_title"],
                    "contextual_score": contextual,
                    "total_score": total,
                    "_rel": contextual if contextual is not None else 0.0,
                }
            )
        # reference sorts each list by relevance desc (stable) only when
        # any link carries a relevance score (link_preview.py:396-407)
        if any(r["contextual_score"] is not None for r in out_rows):
            internal = [r for r in out_rows if r["is_internal"]]
            external = [r for r in out_rows if not r["is_internal"]]
            internal.sort(key=lambda r: r["_rel"], reverse=True)
            external.sort(key=lambda r: r["_rel"], reverse=True)
            out_rows = internal + external
        for rank, r in enumerate(out_rows):
            r["rank"] = rank
            del r["_rel"]
        return pa.Table.from_pylist(out_rows, schema=_OUT_SCHEMA)


_OUT_SCHEMA = pa.schema(
    [
        ("page_url", pa.string()),
        ("href", pa.string()),
        ("is_internal", pa.bool_()),
        ("pos", pa.int64()),
        ("text", pa.string()),
        ("title_attr", pa.string()),
        ("intrinsic_score", pa.float64()),
        ("head_status", pa.string()),
        ("head_title", pa.string()),
        ("contextual_score", pa.float64()),
        ("total_score", pa.float64()),
        ("rank", pa.int64()),
    ]
)


def link_preview_dataset(
    sf_dir: str,
    cfg: LinkPreviewConfig,
    *,
    score_links: bool = True,
    corpus_dir: Optional[str] = None,
):
    """Full pipeline: corpus pages -> extract(score_links) -> flatten
    -> href-sorted head fetch -> per-page scoring."""
    import ray.data as rd

    from ..sources import corpus as C
    from ..stages.extract import extract_batch

    corpus_dir = corpus_dir or C.build_corpus(sf_dir)
    pages = rd.read_parquet(corpus_dir, columns=["url", "html"])
    extracted = pages.map_batches(
        extract_batch,
        batch_format="pyarrow",
        batch_size=128,
        fn_kwargs={"score_links": score_links},
    )
    flat = extracted.select_columns(
        ["url", "links_internal", "links_external"]
    ).map_batches(flatten_links_batch, batch_format="pyarrow", fn_kwargs={"cfg": cfg})
    with_heads = flat.sort("href").map_batches(
        head_fetch_batch,
        batch_format="pyarrow",
        batch_size=512,
        fn_kwargs={"corpus_dir": corpus_dir},
    )
    scorer = ScorePage(cfg, score_links)

    def score_page(group: pa.Table) -> pa.Table:
        return scorer(group)

    return with_heads.groupby("page_url").map_groups(
        score_page, batch_format="pyarrow"
    )
