"""Property-based robustness: the extract kernel must never throw and
always produce its full schema for ARBITRARY byte/html input — at
100 TB the crawler will see every malformed page on the web."""

import string

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crawl4ai_ray.stages.extract import scrape_page

EXPECTED_KEYS = None


def _check(row: dict) -> None:
    global EXPECTED_KEYS
    if EXPECTED_KEYS is None:
        EXPECTED_KEYS = set(scrape_page("http://a.b/x", b"<html></html>"))
    assert set(row) == EXPECTED_KEYS
    assert isinstance(row["success"], bool)
    assert isinstance(row["raw_markdown"], str)
    assert isinstance(row["links_internal"], list)


TAGS = ["div", "p", "a", "b", "script", "style", "table", "tr", "td", "img",
        "nav", "h1", "pre", "code", "br", "iframe", "form", "svg", "video"]


@st.composite
def html_soup(draw):
    """Tag soup: random nesting, unclosed tags, stray brackets,
    attributes with quotes/entities, comments, doctypes."""
    parts = []
    for _ in range(draw(st.integers(0, 30))):
        kind = draw(st.integers(0, 6))
        tag = draw(st.sampled_from(TAGS))
        if kind == 0:
            attr = draw(st.text(string.printable, max_size=20))
            parts.append(f'<{tag} class="{attr}">')
        elif kind == 1:
            parts.append(f"</{tag}>")
        elif kind == 2:
            parts.append(draw(st.text(max_size=40)))
        elif kind == 3:
            parts.append(f"<!-- {draw(st.text(max_size=20))} -->")
        elif kind == 4:
            parts.append(f'<a href="{draw(st.text(string.printable, max_size=30))}">x</a>')
        elif kind == 5:
            parts.append("<" + draw(st.text(max_size=10)))
        else:
            parts.append(f"<{tag}/>")
    return "".join(parts)


class TestFuzzExtract:
    @settings(max_examples=150, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(html=html_soup())
    def test_tag_soup_never_throws(self, html):
        _check(scrape_page("https://h.example.com/p", html.encode("utf-8", "replace")))

    @settings(max_examples=100, deadline=None)
    @given(data=st.binary(max_size=2048))
    def test_arbitrary_bytes_never_throw(self, data):
        _check(scrape_page("https://h.example.com/p", data))

    @settings(max_examples=50, deadline=None)
    @given(url=st.text(max_size=100), data=st.binary(max_size=256))
    def test_arbitrary_url_never_throws(self, url, data):
        _check(scrape_page(url, data))

    def test_pathological_nesting(self):
        _check(scrape_page("http://a.b/x", (b"<div>" * 2000) + b"deep" + (b"</div>" * 2000)))

    def test_huge_attribute(self):
        _check(scrape_page("http://a.b/x", b'<p class="' + b"A" * 500_000 + b'">t</p>'))

    def test_null_bytes_and_controls(self):
        _check(scrape_page("http://a.b/x", b"<p>\x00\x01\x02 text \xff\xfe</p>"))


class TestFuzzUrlFastPaths:
    """Property-based equivalence of the regex fast paths vs the
    general urlparse algorithms over arbitrary href strings."""

    @settings(max_examples=300, deadline=None)
    @given(href=st.text(max_size=80))
    def test_normalize_url_equivalence(self, href):
        from urllib.parse import parse_qsl, urlencode, urljoin, urlparse, urlunparse

        from crawl4ai_ray.functions.urls import _TRACKING_FULL, normalize_url

        base = "https://base.example.com/dir/page"

        def general(h):
            if not h:
                return None
            try:
                full = urljoin(base, h.strip())
                p = urlparse(full)
            except ValueError:
                return None
            q = p.query
            if q:
                params = [
                    (k, v)
                    for k, v in parse_qsl(q, keep_blank_values=True)
                    if k.lower() not in _TRACKING_FULL
                ]
                params.sort(key=lambda kv: kv[0])
                q = urlencode(params, doseq=True) if params else ""
            return urlunparse((p.scheme, p.netloc.lower(), p.path, p.params, q, ""))

        try:
            expected = general(href)
        except Exception:
            return  # stdlib itself rejects the input; nothing to compare
        assert normalize_url(href, base) == expected

    @settings(max_examples=300, deadline=None)
    @given(href=st.text(alphabet=string.printable, max_size=60))
    def test_deep_crawl_equivalence(self, href):
        from urllib.parse import parse_qs, urlencode, urljoin, urlparse, urlunparse

        from crawl4ai_ray.functions.urls import (
            _TRACKING_DEEP,
            normalize_url_for_deep_crawl,
        )

        base = "https://b.x.y/p"

        def general(h):
            if not h:
                return None
            full = urljoin(base, h.strip())
            p = urlparse(full)
            q = p.query
            if q:
                params = parse_qs(q)
                for t in _TRACKING_DEEP:
                    params.pop(t, None)
                q = urlencode(params, doseq=True) if params else ""
            return urlunparse(
                (p.scheme, p.netloc.lower(), p.path or "/", p.params, q, "")
            )

        try:
            expected = general(href)
        except Exception:
            return
        assert normalize_url_for_deep_crawl(href, base) == expected


class TestMalformedRobustness:
    """Regressions from mutation fuzzing: the kernel must contain
    errors the way the reference does (per-link/image skip, markdown
    error strings) instead of crashing the batch."""

    def test_invalid_ipv6_href_skipped(self):
        from crawl4ai_ray.stages.extract import scrape_page

        html = '<body><p>words here</p><a href="http://[::bad">x</a><a href="/ok">ok</a></body>'
        r = scrape_page("https://s.example.com/p", html)
        assert r["success"]
        assert any(l["href"].endswith("/ok") for l in r["links_internal"])

    def test_valueless_attributes(self):
        from crawl4ai_ray.stages.extract import scrape_page

        html = "<body><p>w</p><a href title>t</a><img src srcset alt></body>"
        r = scrape_page("https://s.example.com/p", html)
        assert r["success"]

    def test_markdown_error_contained(self):
        from crawl4ai_ray.functions.markdown import generate_markdown

        md = generate_markdown('<a href="http://[::bad">x</a>', base_url="https://b.example/")
        assert md.raw_markdown.startswith("Error converting HTML to markdown:")

    def test_mutation_sweep_no_crashes(self):
        import random

        from crawl4ai_ray.sources.corpus import page_html, page_url
        from crawl4ai_ray.stages.extract import scrape_page

        base = page_html(37, "Para one here.\n\nPara two here.", "en", 2000)
        for i in range(300):
            r = random.Random(i)
            b = bytearray(base.encode())
            mode = r.randrange(4)
            if mode == 0:
                b = b[: r.randrange(1, len(b))]
            elif mode == 1:
                for _ in range(r.randrange(1, 12)):
                    b[r.randrange(len(b))] = r.randrange(256)
            elif mode == 2:
                pos = r.randrange(len(b))
                b = b[:pos] + b"<a href='http://[z'>x</a>" + b[pos:]
            else:
                lo = r.randrange(len(b))
                hi = min(len(b), lo + r.randrange(200))
                b = b[:lo] + b[lo:hi] + b[lo:]
            row = scrape_page(page_url(37), bytes(b))
            assert isinstance(row["text"], str)
