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
