"""Redirect following at the fetch seam (sources/corpus.py alias
rules + stages/fetch.py resolver plumbing) — reference surface
``AsyncCrawlResponse.redirected_url`` / ``redirected_status_code``
(crawl4ai async_crawler_strategy.py:2771/:766, models.py:341-343)."""

import pyarrow as pa
import pytest

from conftest import SF_SMALL

from crawl4ai_ray.sources import corpus as C
from crawl4ai_ray.stages.fetch import CorpusFetcher, fetch_batch


def test_alias_resolution_pure():
    # one hop
    assert C.resolve_redirect_hop(C.alias_url(42, 1)) == C.page_url(42)
    # two hops: /rr -> /r -> /page
    hop1 = C.resolve_redirect_hop(C.alias_url(42, 2))
    assert hop1 == C.alias_url(42, 1)
    assert C.resolve_redirect_hop(hop1) == C.page_url(42)
    # non-alias urls and wrong-host aliases do not resolve
    assert C.resolve_redirect_hop(C.page_url(42)) is None
    wrong = f"https://site-{(C.host_id(42) + 1) % 16}.example.com/r/42"
    assert C.resolve_redirect_hop(wrong) is None


def test_resolve_batch_first_status():
    urls = [C.alias_url(7, 1), C.alias_url(8, 2), C.page_url(9), "https://other.example.org/x"]
    finals, first = C.resolve_redirects_batch(urls)
    assert finals == [C.page_url(7), C.page_url(8), C.page_url(9), urls[3]]
    assert first == [301, 301, None, None]


def test_fetch_follows_redirects(small_corpus):
    urls = [
        C.alias_url(5, 1),      # 1 hop -> 200
        C.alias_url(6, 2),      # 2 hops -> 200
        C.page_url(7),          # direct -> 200
        f"https://site-{(C.host_id(5) + 1) % 16}.example.com/r/5",  # dead
    ]
    batch = pa.table({"url": pa.array(urls, pa.string())})
    out = fetch_batch(
        batch, small_corpus, resolver=C.resolve_redirects_batch
    )
    assert out.column("redirected_url").to_pylist() == [
        C.page_url(5), C.page_url(6), C.page_url(7), urls[3],
    ]
    assert out.column("redirected_status_code").to_pylist() == [301, 301, None, None]
    assert out.column("status_code").to_pylist() == [200, 200, 200, 404]
    assert out.column("fetched").to_pylist() == [True, True, True, False]
    # redirected fetch returns the TARGET page's payload
    direct = fetch_batch(
        pa.table({"url": pa.array([C.page_url(5)], pa.string())}), small_corpus
    )
    assert out.column("html").to_pylist()[0] == direct.column("html").to_pylist()[0]


def test_corpus_fetcher_flag(small_corpus, ray_session):
    f_on = CorpusFetcher(small_corpus, follow_redirects=True)
    f_off = CorpusFetcher(small_corpus)
    batch = pa.table({"url": pa.array([C.alias_url(11, 1)], pa.string())})
    on = f_on(batch)
    off = f_off(batch)
    assert on.column("status_code").to_pylist() == [200]
    assert "redirected_url" in on.column_names
    # default path unchanged: alias is a dead link, no redirect columns
    assert off.column("status_code").to_pylist() == [404]
    assert "redirected_url" not in off.column_names


def test_query_registered_in_window():
    from crawl4ai_ray.pipelines.queries import QUERIES
    from crawl4ai_ray.pipelines.oracles import ORACLES

    keys = list(QUERIES)
    assert "redirect_fetch" in keys[:50]
    assert "redirect_fetch" in ORACLES
