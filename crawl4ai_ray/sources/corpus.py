"""Deterministic synthetic Common-Crawl-style corpus.

The sandbox has no network, so "the web" is a Parquet table with the
shape required by BASELINE.json's input hint::

    url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string

Pages are a **pure deterministic function of the driver's
``documents`` table** (``doc_id, text, lang, source, n_chars``), so a
DuckDB oracle can recompute every crawl-level fact (link graph, BFS
reachability/depths, per-host counts, extracted text) with plain SQL
over ``documents`` — that is how the driver's correctness gate
verifies the whole crawl-and-extract loop, including byte-identical
extracted text per url.

Corpus rules (mirrored in SQL by ``crawl4ai_ray.pipelines.oracles``):

* ``P`` pages, page ``p`` derives from document ``p % N_docs``.
  ``variants=V`` amplifies the corpus for benchmarks (``P = V*N``);
  correctness runs use ``V=1`` so page ids == doc ids.
* host(p)  = ``site-{p % N_HOSTS}.example.com`` with ``N_HOSTS=16``.
  All hosts share the registered domain ``example.com`` so cross-host
  links classify as *internal* (reference ``get_base_domain`` takes the
  last two labels: utils.py:2480-2528).
* url(p)   = ``https://site-{p%16}.example.com/page/{p}``
* links: page p has ``2 + (p % 4)`` out-links, j-th target
  ``t = 4 + ((p*73 + j*179 + 11) % (P - 4))`` — never targets pages
  0..3 (the crawl seeds), so the reference's quirk of not pre-seeding
  ``visited`` with the start URLs can never re-crawl a seed.
  The raw href is decorated per ``j % 4`` (tracking params / fragment /
  scheme-relative / uppercased scheme+host); every decoration
  canonicalizes back to ``url(t)`` under the reference's
  ``normalize_url`` -> ``normalize_url_for_deep_crawl`` composition.
* robots: host h disallows everything iff ``h % 7 == 5`` (hosts 5 and
  12); crawl-delay is ``h % 3`` seconds (politeness exercised in
  virtual time).
* The document text is embedded verbatim (HTML-escaped) as
  ``<p class="para">`` blocks split on ``\\n\\n``; extraction must
  recover it byte-identically (``str.split``/``str.join`` round-trip
  plus ``html.escape``/``unescape`` round-trip are exact).
"""

from __future__ import annotations

import html as _html
import os
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa

N_HOSTS = 16
RESERVED_SEEDS = 4  # pages 0..3 are link-graph roots; nothing links to them
BLOCKED_HOST_MOD = 7
BLOCKED_HOST_REM = 5
BASE_TS = 1767225600_000000  # 2026-01-01T00:00:00Z in microseconds

CORPUS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.large_binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def host_id(page_id: int) -> int:
    return page_id % N_HOSTS


def host_name(h: int) -> str:
    return f"site-{h}.example.com"


def page_url(page_id: int) -> str:
    return f"https://{host_name(host_id(page_id))}/page/{page_id}"


def host_blocked(h: int) -> bool:
    return h % BLOCKED_HOST_MOD == BLOCKED_HOST_REM


def host_crawl_delay(h: int) -> int:
    return h % 3


def n_links(page_id: int) -> int:
    return 2 + (page_id % 4)


def link_target(page_id: int, j: int, total_pages: int) -> int:
    """j-th out-link target. Every third (page, j) pair is redirected
    to the HOT host (host 1) — a Zipf-ish head that concentrates ~1/3
    of all crawl traffic on one host, exercising hot-host politeness
    scheduling and frontier skew end-to-end. Mirrored exactly by the
    links CTE in pipelines/oracles.py."""
    t = RESERVED_SEEDS + (
        (page_id * 73 + j * 179 + 11) % (total_pages - RESERVED_SEEDS)
    )
    if (page_id + j) % 3 == 0:
        t = t - (t % N_HOSTS) + 1
        if t < RESERVED_SEEDS:
            t += N_HOSTS
        elif t >= total_pages:
            t -= N_HOSTS
    return t


def link_href(page_id: int, j: int, total_pages: int) -> str:
    """Raw href as it appears in the page's HTML (decorated)."""
    t = link_target(page_id, j, total_pages)
    h = host_id(t)
    mode = j % 4
    if mode == 0:
        return f"https://site-{h}.example.com/page/{t}?utm_source=corpus&ref=related"
    if mode == 1:
        return f"https://site-{h}.example.com/page/{t}#section-2"
    if mode == 2:
        return f"//site-{h}.example.com/page/{t}"
    return f"HTTPS://SITE-{h}.EXAMPLE.COM/page/{t}"


# -- redirect aliases (fetch-time rule; adds NO corpus rows) ----------------
#
# The reference's HTTP strategy lets aiohttp follow redirects and then
# surfaces ``redirected_url=str(response.url)`` (final url) and, on the
# browser path, the first hop's status as ``redirected_status_code``
# (async_crawler_strategy.py:2771, :766; models.py:341-343).  The
# synthetic web mirrors that with alias urls that 301-chain onto
# canonical pages — a pure url-arithmetic rule, so the DuckDB oracle
# can recompute the whole chain:
#
# * ``/r/{p}``  -> 301 -> ``/page/{p}``           (one hop)
# * ``/rr/{p}`` -> 301 -> ``/r/{p}`` -> ``/page/{p}`` (two hops)
# * valid only on page p's own host (h == p % 16); anything else is a
#   dead url (404, no redirect), the misconfigured-vhost case.

REDIRECT_STATUS = 301
_ALIAS_RE = None  # compiled lazily (module import stays regex-free)


def alias_url(page_id: int, hops: int = 1) -> str:
    """Alias url that 301-redirects to ``page_url(page_id)`` in
    ``hops`` (1 or 2) hops."""
    seg = {1: "r", 2: "rr"}[hops]
    return f"https://{host_name(host_id(page_id))}/{seg}/{page_id}"


def resolve_redirect_hop(url: str):
    """One redirect hop for ``url``, or None if it is not an alias."""
    global _ALIAS_RE
    if _ALIAS_RE is None:
        import re

        _ALIAS_RE = re.compile(r"^https://site-(\d+)\.example\.com/(rr?)/(\d+)$")
    m = _ALIAS_RE.match(url)
    if not m:
        return None
    h, seg, p = int(m.group(1)), m.group(2), int(m.group(3))
    if h != host_id(p):
        return None
    if seg == "rr":
        return f"https://{host_name(h)}/r/{p}"
    return page_url(p)


def resolve_redirects_batch(urls, max_hops: int = 5):
    """Follow the alias chain for each url (aiohttp-style).

    Returns ``(final_urls, first_statuses)`` — final url per input
    (== the input when no redirect fired) and the FIRST hop's status
    (301) or None, the reference's ``redirected_status_code``.
    """
    finals, first = [], []
    for u in urls:
        status = None
        cur = u
        for _ in range(max_hops):
            nxt = resolve_redirect_hop(cur)
            if nxt is None:
                break
            if status is None:
                status = REDIRECT_STATUS
            cur = nxt
        finals.append(cur)
        first.append(status)
    return finals, first


def robots_body(h: int) -> str:
    delay = host_crawl_delay(h)
    if host_blocked(h):
        return f"User-agent: *\nDisallow: /\nCrawl-delay: {delay}\n"
    return f"User-agent: *\nAllow: /\nCrawl-delay: {delay}\n"


def page_html(page_id: int, text: str, lang: str, total_pages: int) -> str:
    """Deterministic HTML for one page. Text embedded verbatim.

    Beyond the base template, pages carry extraction-branch features
    gated on SQL-expressible page-id conditions (FIXTURES.md §1
    grammar); every gate below is mirrored by the
    ``cleaned_html_stats`` oracle formulas in pipelines/oracles.py:

    * ``p%11==7``  — ``<base href>`` + j=0 link written *relative*
      (resolves to the identical target, so the link graph and every
      crawl oracle are unchanged)
    * ``p%3==1``   — duplicate decorated link to the j=0 target
      (dedup-by-normalized-href keeps link counts identical)
    * ``p%7==2``   — ``<pre><code class="language-python">`` block
      with entities (whitespace-significant path)
    * ``p%17==3``  — mermaid SVG (replaced by a fenced block)
    * ``p%19==4``  — ``<picture>``/srcset image variants
    * ``p%23==6``  — HTML comment containing fake markup
    * ``p%29==8``  — ``<form>`` with a non-para ``<p>`` inside
      (boilerplate exclusion keeps it out of ``text``)
    * ``p%31==10`` — base64 ``data:`` image src (cleanup pass)
    * ``p%13==9``  — malformed unclosed tail before ``</body>``
    * ``p%37==12`` — external ``co.uk`` public-suffix link
      (get_base_domain multi-label branch; affects n_external only)

    Document text still lives ONLY in ``<p class="para">`` outside
    boilerplate containers, so ``text`` stays byte-reconstructable.
    """
    h = host_id(page_id)
    paras = text.split("\n\n")
    body_paras = "\n".join(
        f'<p class="para">{_html.escape(p)}</p>' for p in paras
    )
    links = []
    t0 = link_target(page_id, 0, total_pages)
    base_tag = ""
    for j in range(n_links(page_id)):
        t = link_target(page_id, j, total_pages)
        if j == 0 and page_id % 11 == 7:
            # relative href resolved through <base href> to url(t0)
            base_tag = f'<base href="https://site-{host_id(t0)}.example.com/page/">'
            href = str(t0)
        else:
            href = _html.escape(link_href(page_id, j, total_pages), quote=True)
        links.append(f'<li><a href="{href}" title="Related {t}">Related page {t}</a></li>')
    if page_id % 3 == 1:
        links.append(
            f'<li><a href="https://site-{host_id(t0)}.example.com/page/{t0}?utm_medium=dup">'
            f"Dup {t0}</a></li>"
        )
    links.append(
        f'<li><a href="https://cdn-{page_id % 3}.external.org/asset/{page_id}">'
        f"External asset {page_id}</a></li>"
    )
    if page_id % 37 == 12:
        # co.uk-style public-suffix host: exercises get_base_domain's
        # multi-label registered-domain handling (utils.py:2509-2523)
        # through the whole pipeline; external -> no crawl-graph impact
        links.append(
            f'<li><a href="https://news.bbc.co.uk/story/{page_id}">UK story {page_id}</a></li>'
        )
    links_html = "\n".join(links)
    desc = _html.escape(text[:80], quote=True)
    extras = []
    if page_id % 5 == 0:
        extras.append(
            "<table><caption>Stats</caption>"
            "<thead><tr><th>k</th><th>v</th></tr></thead>"
            f"<tbody><tr><td>id</td><td>{page_id}</td></tr>"
            f"<tr><td>host</td><td>{h}</td></tr></tbody></table>"
        )
    if page_id % 7 == 2:
        extras.append(
            '<pre data-language="python"><code class="language-python">'
            f"def f_{page_id}():\n    return {page_id} &amp; 1</code></pre>"
        )
    if page_id % 17 == 3:
        extras.append(
            f'<svg id="mermaid-{page_id}" aria-roledescription="flowchart">'
            '<g class="nodeLabel">Step A</g><g class="nodeLabel">Step B</g></svg>'
        )
    if page_id % 19 == 4:
        extras.append(
            f'<picture><source srcset="/img/{page_id}-lg.webp 800w">'
            f'<img src="/img/{page_id}.webp" alt="Pic {page_id}" '
            f'srcset="/img/{page_id}-2x.webp 2x"></picture>'
        )
    if page_id % 23 == 6:
        extras.append(f"<!-- hidden {page_id} <p>not text</p> -->")
    if page_id % 29 == 8:
        extras.append(
            '<form action="/search"><p>Search this site now</p>'
            '<input type="text" name="q"></form>'
        )
    if page_id % 31 == 10:
        extras.append(
            f'<img src="data:image/png;base64,QUJD{page_id}" alt="inline">'
        )
    extras_html = "\n".join(extras)
    tail = ""
    if page_id % 13 == 9:
        tail = f"<div><b>unclosed trailing {page_id}"
    return f"""<!DOCTYPE html>
<html lang="{lang}">
<head>
<meta charset="utf-8">
<title>Document {page_id} — site-{h}</title>
{base_tag}<meta name="description" content="{desc}">
<meta name="keywords" content="doc,page,{lang}">
<meta property="og:title" content="Document {page_id}">
<meta property="og:site_name" content="site-{h}">
</head>
<body>
<nav class="nav"><a href="javascript:void(0)">Menu</a> <a href="mailto:info@example.com">Contact</a></nav>
<header><h1>Document {page_id}</h1></header>
<main>
<article id="content">
{body_paras}
</article>
<section class="links"><h2>Related</h2><ul>
{links_html}
</ul></section>
{extras_html}
<figure><img src="/img/{page_id}.jpg" alt="Figure {page_id}" width="300" height="200"></figure>
<img src="/icon.png" width="16" height="16" alt="">
</main>
<aside class="sidebar"><ul><li><span>Ad {page_id}</span></li></ul></aside>
<footer><p>&copy; {host_name(h)}</p></footer>
<script type="text/javascript">var pageId={page_id};</script>
{tail}
</body>
</html>"""


def synth_pages_batch(batch: pa.Table, total_pages: int, variants: int) -> pa.Table:
    """map_batches kernel: documents rows -> corpus page rows.

    With ``variants=V`` each document row emits V pages (page ids
    ``doc_id + v * n_docs``); the variant index is prepended to the
    text so near-identical pages stay distinguishable byte-wise.
    """
    n_docs = total_pages // variants
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()

    urls, tss, htmls, out_texts, out_langs = [], [], [], [], []
    for v in range(variants):
        for d, txt, lang in zip(doc_ids, texts, langs):
            p = d + v * n_docs
            t = txt if v == 0 else f"[variant {v}] {txt}"
            urls.append(page_url(p))
            tss.append(BASE_TS + p * 1_000_000)
            htmls.append(page_html(p, t, lang, total_pages).encode("utf-8"))
            out_texts.append(t)
            out_langs.append(lang)
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.timestamp("us")),
            pa.array(htmls, pa.large_binary()),
            pa.array(out_texts, pa.string()),
            pa.array(out_langs, pa.string()),
        ],
        schema=CORPUS_SCHEMA,
    )


# bump when page_html changes so cached /tmp corpora regenerate
CORPUS_VERSION = 5


def corpus_dir_for(sf_dir: str, variants: int = 1, root: str = "/tmp/c4r_corpus") -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(root, f"{tag}_v{variants}_g{CORPUS_VERSION}")


def build_corpus(
    sf_dir: str,
    variants: int = 1,
    root: str = "/tmp/c4r_corpus",
    force: bool = False,
) -> str:
    """Build (or reuse) the corpus for a testdata dir. Returns the
    corpus directory containing partitioned Parquet sorted by url.

    Ray-Data-first: read documents -> map_batches(synth) -> sort(url)
    -> write_parquet. Sorting by url clusters each host's pages into
    contiguous row groups, so the sandbox fetcher's url-range predicate
    pushdown prunes row groups exactly like a keyed remote store.
    """
    import ray.data as rd

    out = corpus_dir_for(sf_dir, variants, root)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker) and not force:
        return out
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    total = n_docs * variants

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    ds = ds.map_batches(
        synth_pages_batch,
        fn_kwargs={"total_pages": total, "variants": variants},
        batch_format="pyarrow",
        batch_size=1024,
    )
    ds = ds.sort("url")
    tmp = out + ".tmp"
    import shutil

    for d in (out, tmp):
        if os.path.exists(d):
            shutil.rmtree(d)
    # Small row groups matter twice: (a) a downstream
    # read_parquet->map_batches fusion can never run wider than the
    # row-group count (5 groups = 5 tasks, idling a 32-CPU pool);
    # (b) the crawl's url-range fetch prunes at row-group granularity,
    # so smaller groups = tighter keyed reads. 512 rows x ~4.5KB html
    # ~= 2MB per group; profiled better than 128-row groups (per-group
    # filter/metadata overhead outweighs the decode waste here).
    ds.write_parquet(tmp, row_group_size=512)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def robots_table(total_pages: int) -> pa.Table:
    """Tiny robots table (one row per host) — broadcast side."""
    hosts = [host_name(h) for h in range(N_HOSTS)]
    bodies = [robots_body(h) for h in range(N_HOSTS)]
    return pa.Table.from_arrays(
        [pa.array(hosts), pa.array(bodies)], names=["host", "body"]
    )


def seed_urls(n_seeds: int = RESERVED_SEEDS) -> list[str]:
    return [page_url(p) for p in range(n_seeds)]
