"""Extraction kernel: byte-identity of text round-trip, link walk,
metadata, media scoring, tables, markdown regression."""

import html as _html

import pyarrow.parquet as pq
import pytest

from crawl4ai_ray.functions.htmlparse import parse_html
from crawl4ai_ray.functions.markdown import (
    convert_links_to_citations,
    html_to_markdown,
)
from crawl4ai_ray.functions.urls import normalize_url_for_deep_crawl
from crawl4ai_ray.sources import corpus as C
from crawl4ai_ray.stages.extract import extract_batch, scrape_page

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return pq.read_table(f"{SF}/documents.parquet").to_pylist()


class TestTextByteIdentity:
    def test_all_500_docs_roundtrip(self, docs):
        n = len(docs)
        for d in docs:
            p = d["doc_id"]
            html = C.page_html(p, d["text"], d["lang"], n)
            r = scrape_page(C.page_url(p), html.encode())
            assert r["success"]
            assert r["text"] == d["text"], f"text mismatch doc {p}"

    def test_multiparagraph_and_entities(self):
        text = 'a < b & c > d\n\n"quotes" & <tags>\n\n\nempty-ish\n\nlast'
        html = C.page_html(7, text, "en", 100)
        r = scrape_page(C.page_url(7), html.encode())
        assert r["text"] == text


class TestLinks:
    def test_canonical_targets(self, docs):
        n = len(docs)
        d = docs[42]
        p = d["doc_id"]
        r = scrape_page(C.page_url(p), C.page_html(p, d["text"], d["lang"], n).encode())
        canon = [
            normalize_url_for_deep_crawl(l["href"], C.page_url(p))
            for l in r["links_internal"]
        ]
        expected = [C.page_url(C.link_target(p, j, n)) for j in range(C.n_links(p))]
        assert canon == expected

    def test_external_classified(self, docs):
        d = docs[10]
        r = scrape_page(
            C.page_url(10), C.page_html(10, d["text"], d["lang"], 500).encode()
        )
        ext = [l["href"] for l in r["links_external"]]
        assert "javascript:void(0)" in ext
        assert "mailto:info@example.com" in ext
        assert any("external.org" in e for e in ext)

    def test_first_wins_dedup(self):
        html = b'<html><body><a href="/x">one</a><a href="/x#frag">two</a></body></html>'
        r = scrape_page("https://a.example.com/p", html)
        # normalize_url drops fragments -> same canonical href, first wins
        assert len(r["links_internal"]) == 1
        assert r["links_internal"][0]["text"] == "one"

    def test_base_href_override(self):
        html = b'<html><head><base href="https://b.example.com/dir/"></head><body><a href="x">l</a></body></html>'
        r = scrape_page("https://a.example.com/p", html)
        assert r["links_internal"][0]["href"] == "https://b.example.com/dir/x"


class TestMetadata:
    def test_fields(self, docs):
        d = docs[3]
        r = scrape_page(
            C.page_url(3), C.page_html(3, d["text"], d["lang"], 500).encode()
        )
        import json

        meta = json.loads(r["metadata"])
        assert meta["title"] == "Document 3 — site-3"
        assert meta["og:title"] == "Document 3"
        assert meta["og:site_name"] == "site-3"
        assert meta["description"].startswith(d["text"][:20])

    def test_og_title_fallback(self):
        html = b'<html><head><meta property="og:title" content="OG"></head><body></body></html>'
        r = scrape_page("https://a.example.com/p", html)
        assert r["title"] == "OG"


class TestMediaAndTables:
    def test_image_scoring(self, docs):
        d = docs[0]
        r = scrape_page(
            C.page_url(0), C.page_html(0, d["text"], d["lang"], 500).encode()
        )
        srcs = [i["src"] for i in r["images"]]
        assert f"/img/0.jpg" in srcs  # big image kept
        assert "/icon.png" not in srcs  # 16x16 icon filtered

    def test_table_extraction(self, docs):
        d = docs[6]
        r0 = scrape_page(
            C.page_url(0), C.page_html(0, docs[0]["text"], "en", 500).encode()
        )
        assert r0["tables"] and r0["tables"][0]["headers"] == ["k", "v"]
        r6 = scrape_page(
            C.page_url(6), C.page_html(6, d["text"], d["lang"], 500).encode()
        )
        assert r6["tables"] == []  # only every 5th page has a table

    def test_layout_table_rejected(self):
        html = b'<html><body><table role="presentation"><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table></body></html>'
        r = scrape_page("https://a.example.com/p", html)
        assert r["tables"] == []


class TestMarkdown:
    def test_basic_blocks(self):
        md = html_to_markdown(
            "<html><body><h1>T</h1><p>para <strong>bold</strong></p>"
            "<ul><li>a</li><li>b</li></ul><pre>code()</pre></body></html>"
        )
        assert "# T" in md
        assert "para **bold**" in md
        assert "* a" in md and "* b" in md
        assert "```\ncode()\n```" in md

    def test_links_and_images(self):
        md = html_to_markdown(
            '<body><p><a href="/x" title="tt">go</a> <img src="/i.png" alt="pic"></p></body>'
        )
        assert '[go](/x "tt")' in md
        assert "![pic](/i.png)" in md

    def test_citations(self):
        md = '[one](https://a.com/1) and [two](https://a.com/2) and [one again](https://a.com/1)'
        cited, refs = convert_links_to_citations(md)
        assert "one⟨1⟩" in cited and "two⟨2⟩" in cited and "one again⟨1⟩" in cited
        assert "⟨1⟩ https://a.com/1" in refs and "⟨2⟩ https://a.com/2" in refs

    def test_cleaned_html_strips_scripts(self, docs):
        d = docs[1]
        r = scrape_page(
            C.page_url(1), C.page_html(1, d["text"], d["lang"], 500).encode(),
            with_fit=True,
        )
        assert "<script" not in r["cleaned_html"]
        assert "pageId" not in r["raw_markdown"]
        assert "var pageId" not in r["fit_markdown"]

    def test_fit_default_off_like_reference(self, docs):
        # fit markdown is opt-in (reference computes it only when a
        # content filter is configured)
        d = docs[1]
        r = scrape_page(
            C.page_url(1), C.page_html(1, d["text"], d["lang"], 500).encode()
        )
        assert r["fit_markdown"] == ""

    def test_fit_excludes_boilerplate(self, docs):
        d = docs[1]
        r = scrape_page(
            C.page_url(1), C.page_html(1, d["text"], d["lang"], 500).encode(),
            with_fit=True,
        )
        assert "Ad 1" in r["raw_markdown"]  # aside present in raw
        assert "Ad 1" not in r["fit_markdown"]  # pruned in fit
        assert d["text"].split("\n\n")[0] in r["fit_markdown"]


class TestArrowBatch:
    def test_extract_batch_schema(self, docs):
        import pyarrow as pa

        n = len(docs)
        batch = pa.table(
            {
                "url": [C.page_url(d["doc_id"]) for d in docs[:20]],
                "html": pa.array(
                    [
                        C.page_html(d["doc_id"], d["text"], d["lang"], n).encode()
                        for d in docs[:20]
                    ],
                    pa.large_binary(),
                ),
                "depth": pa.array([0] * 20, pa.int32()),
            }
        )
        out = extract_batch(batch)
        assert out.num_rows == 20
        assert out.column("success").to_pylist() == [True] * 20
        assert "depth" in out.column_names  # passthrough
        assert out.column("text").to_pylist() == [d["text"] for d in docs[:20]]


class TestHtmlParserRobustness:
    def test_malformed_html(self):
        r = scrape_page("https://a.example.com/p", b"<p>unclosed <b>bold<p>next</td></html>")
        assert r["success"]
        assert "unclosed" in r["text"]

    def test_empty(self):
        r = scrape_page("https://a.example.com/p", b"")
        assert r["success"]
        assert r["text"] == ""
