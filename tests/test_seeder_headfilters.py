"""Sitemap seeder + head-based SEO/relevance filters."""

import gzip

import pyarrow as pa
import pytest

from crawl4ai_ray.sources.seeder import parse_sitemap, seed_union, sitemap_flat_batch
from crawl4ai_ray.stages.head_filters import (
    ContentRelevanceHead,
    SEOHead,
    extract_meta_tags,
    get_title,
    head_of,
)

SITEMAP = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.example.com/p1</loc><lastmod>2026-01-01</lastmod></url>
  <url><loc>https://a.example.com/p2</loc></url>
</urlset>"""

SITEMAP_INDEX = b"""<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.example.com/sitemap1.xml</loc></sitemap>
  <sitemap><loc>https://a.example.com/sitemap2.xml</loc></sitemap>
</sitemapindex>"""


class TestSitemap:
    def test_urlset(self):
        out = parse_sitemap(SITEMAP)
        assert out["urls"] == [
            ("https://a.example.com/p1", "2026-01-01"),
            ("https://a.example.com/p2", None),
        ]
        assert out["sitemaps"] == []

    def test_index(self):
        out = parse_sitemap(SITEMAP_INDEX)
        assert len(out["sitemaps"]) == 2 and not out["urls"]

    def test_gzip(self):
        out = parse_sitemap(gzip.compress(SITEMAP))
        assert len(out["urls"]) == 2

    def test_malformed(self):
        assert parse_sitemap(b"<not-xml") == {"urls": [], "sitemaps": []}

    def test_flat_batch(self):
        batch = pa.table(
            {"source": ["s1", "s2"], "xml": [SITEMAP, SITEMAP_INDEX]}
        )
        out = sitemap_flat_batch(batch)
        urls = [u for u in out.column("url").to_pylist() if u]
        assert len(urls) == 2
        refs = [
            r
            for u, r in zip(out.column("url").to_pylist(), out.column("ref").to_pylist())
            if u is None
        ]
        assert len(refs) == 2  # nested sitemap refs for recursion

    def test_seed_union_dedup(self, ray_session):
        import ray.data as rd

        a = rd.from_items(
            [{"url": "https://x.com/1", "source": "sitemap"},
             {"url": "https://x.com/2", "source": "sitemap"}]
        )
        b = rd.from_items(
            [{"url": "https://x.com/2", "source": "cc"},
             {"url": "https://x.com/3", "source": "cc"}]
        )
        out = seed_union([a, b]).to_pandas().sort_values("url").reset_index(drop=True)
        assert list(out["url"]) == ["https://x.com/1", "https://x.com/2", "https://x.com/3"]
        assert list(out["source"]) == ["sitemap", "cc", "cc"]


HEAD = """<html><head>
<title>A Practical Machine Learning Guide For Busy Engineers</title>
<meta name="description" content="{desc}">
<meta name="keywords" content="ml, models">
<link rel="canonical" href="https://a.example.com/p">
<script type="application/ld+json">{{}}</script>
</head><body><p>body</p></body></html>"""


class TestHeadHelpers:
    def test_head_slice_and_title(self):
        h = head_of(HEAD.format(desc="d"))
        assert get_title(h).startswith("A Practical")

    def test_meta_both_orders(self):
        h = '<head><meta content="x" name="author"><meta name="description" content="y"></head>'
        meta = extract_meta_tags(h)
        assert meta["author"] == "x" and meta["description"] == "y"


class TestSEOHead:
    def test_good_page_passes(self):
        desc = "A carefully sized meta description that lands inside the googled sweet spot range ok and then adds a few more words for length safety."
        html = HEAD.format(desc=desc)
        f = SEOHead(threshold=0.5, keywords=["machine", "learning"])
        assert f.apply_head("https://a.example.com/p", head_of(html))

    def test_noindex_fails(self):
        html = HEAD.format(desc="d").replace(
            "</title>", '</title><meta name="robots" content="noindex">'
        )
        f = SEOHead(threshold=0.65, keywords=["machine"])
        score_ok = SEOHead(threshold=0.65, keywords=["machine"]).score(
            "https://a.example.com/p", head_of(HEAD.format(desc="d"))
        )
        score_no = f.score("https://a.example.com/p", head_of(html))
        assert score_no == pytest.approx(score_ok - 0.20, abs=1e-9)

    def test_batch_stage(self):
        batch = pa.table(
            {
                "url": ["https://a.example.com/p"],
                "html": [HEAD.format(desc="short").encode()],
            }
        )
        out = SEOHead()(batch)
        assert "seo_score" in out.column_names and "seo_ok" in out.column_names


class TestRelevanceHead:
    def test_relevant_vs_irrelevant(self):
        f = ContentRelevanceHead("machine learning guide", threshold=0.5)
        rel = f.score_head(head_of(HEAD.format(desc="machine learning basics")))
        irr = f.score_head(head_of("<head><title>Cooking pasta</title></head>"))
        assert rel > irr
        assert f.apply_head(head_of(HEAD.format(desc="machine learning")))


class TestDomainMapper:
    def test_scan_multi_source_dedup(self, ray_session, small_corpus):
        from crawl4ai_ray.sources.domain_mapper import scan

        df = scan("site-0.example.com", small_corpus, source="subdomains+homepage").to_pandas()
        assert len(df) > 0
        assert df["url"].is_unique
        srcs = set("+".join(df["sources"]).split("+"))
        assert "homepage" in srcs

    def test_scan_sitemap_source_attribution(self, ray_session, small_corpus):
        from crawl4ai_ray.sources.domain_mapper import scan

        base = scan("site-0.example.com", small_corpus, source="homepage").to_pandas()
        known = base["url"].iloc[0]
        sm = (
            b'<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            b"<url><loc>" + known.encode() + b"</loc></url></urlset>"
        )
        df = scan(
            "site-0.example.com",
            small_corpus,
            source="sitemap+homepage",
            sitemap_blob=sm,
        ).to_pandas()
        row = df[df["url"] == known]
        assert row["sources"].iloc[0] == "homepage+sitemap"

    def test_invalid_source_raises(self, ray_session, small_corpus):
        import pytest

        from crawl4ai_ray.sources.domain_mapper import scan

        with pytest.raises(ValueError, match="Invalid source"):
            scan("x.y", small_corpus, source="crtsh")


class TestExportByHost:
    def test_partitioned_export(self, ray_session, small_corpus, tmp_path):
        import glob
        import os

        from crawl4ai_ray.pipelines.crawl import BFSCrawler
        from crawl4ai_ray.sources import corpus as C
        from crawl4ai_ray.sources.sinks import export_by_host

        res = str(tmp_path / "res")
        cr = BFSCrawler(small_corpus, res, max_depth=1)
        robots = {C.host_name(h): C.robots_body(h) for h in range(C.N_HOSTS)}
        cr.run(C.seed_urls(), robots=robots)
        cr.close()
        out = str(tmp_path / "byhost")
        n = export_by_host(res, out, columns=["url", "host", "success"])
        assert n > 0
        parts = glob.glob(os.path.join(out, "host=*"))
        assert len(parts) >= 2

    def test_empty_results_dir(self, tmp_path):
        from crawl4ai_ray.sources.sinks import export_by_host

        assert export_by_host(str(tmp_path), str(tmp_path / "o")) == 0


class TestScoredSeeder:
    def test_query_scored_discovery(self, ray_session, small_corpus):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from crawl4ai_ray.sources.seeder import seed_union, seed_urls_scored

        urls = pq.read_table(small_corpus, columns=["url"]).column("url").to_pylist()[:80]
        a = rd.from_arrow(pa.table({"url": urls[:50], "source": ["sitemap"] * 50}))
        b = rd.from_arrow(pa.table({"url": urls[30:], "source": ["cc"] * 50}))
        scored = seed_urls_scored(
            seed_union([a, b]),
            small_corpus,
            query="table merge sort",
            score_threshold=0.1,
            max_urls=15,
        )
        df = scored.to_pandas()
        assert len(df) == 15
        assert (df["relevance_score"] >= 0.1).all()
        assert df["relevance_score"].is_monotonic_decreasing
        assert df["url"].is_unique

    def test_threshold_filters_everything(self, ray_session, small_corpus):
        import pyarrow as pa
        import ray.data as rd

        from crawl4ai_ray.sources.seeder import seed_urls_scored

        seeds = rd.from_arrow(
            pa.table({"url": ["https://nowhere.example/x"], "source": ["cc"]})
        )
        df = seed_urls_scored(
            seeds, small_corpus, query="anything", score_threshold=99.0
        ).to_pandas()
        assert len(df) == 0
