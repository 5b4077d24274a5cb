"""Differential parity vs the reference's ACTUAL code (round-2 batch 2):
antibot_detector, cache_context, proxy_strategy — all direct-loaded from
/root/reference (see tests/_refload.py).
"""

from __future__ import annotations

import asyncio
import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _refload import (  # noqa: E402
    load_ref_antibot,
    load_ref_cache_context,
    load_ref_proxies,
)

from crawl4ai_ray.pipelines.cache import (  # noqa: E402
    CacheContext,
    CacheMode,
    legacy_to_cache_mode,
)
from crawl4ai_ray.stages import antibot as ours_ab  # noqa: E402
from crawl4ai_ray.state.proxies import (  # noqa: E402
    ProxyConfig,
    ProxyRotator,
    assign_round_robin,
)

# ---------------------------------------------------------------------------
# antibot_detector.is_blocked — exact (bool, reason) parity under fuzz
# ---------------------------------------------------------------------------

_BLOCK_SNIPPETS = [
    "Reference #18.2d351ab8.1557333295.a4e16ab",
    "Pardon Our Interruption",
    '<form class="challenge-form" action="x?__cf_chl_f_tk=abc">',
    '<span class="cf-error-code">1020</span>',
    "/cdn-cgi/challenge-platform/h/b/orchestrate/jsch/v1",
    "window._pxAppId = 'PX12345';",
    "https://captcha.px-cdn.net/xyz",
    "https://captcha-delivery.com/captcha",
    "_Incapsula_Resource?SWJIYLWA=1",
    "Incapsula incident ID: 123-456",
    "Sucuri WebSite Firewall - Access Denied",
    "KPSDK.scriptStart = KPSDK.now();",
    "You've been blocked by network security.",
    "Access Denied",
    "Checking your browser before accessing",
    "<title>Just a moment...</title>",
    '<div class="g-recaptcha" data-sitekey="x"></div>',
    '<div class="h-captcha"></div>',
    "Access to This Page Has Been Blocked",
    "blocked by security policy",
    "Request unsuccessful. Incapsula incident",
]

_FILLER = [
    "<p>Lorem ipsum dolor sit amet, consectetur adipiscing elit.</p>",
    "<h1>A perfectly normal page</h1>",
    "<li>item</li><td>cell</td>",
    "<a href='/x'>link</a>",
    "<script>var a = 1;</script>",
    "<style>body { color: red; }</style>",
    "<div>plain div no content elements</div>",
    "<span>inline</span>",
    "<pre>code block</pre>",
    "word " * 40,
]

_WRAPPERS = [
    lambda body: f"<html><head><title>t</title></head><body>{body}</body></html>",
    lambda body: f"<html><body>{body}</body></html>",
    lambda body: f"<!DOCTYPE html><html><body>{body}</body></html>",
    lambda body: body,  # no body tag
    lambda body: f"<html><head>{body}</head></html>",  # no body tag either
]

_DATA_DOCS = [
    '{"ok": true, "items": [1, 2, 3]}',
    '[{"a": 1}]',
    '<?xml version="1.0"?><root><a/></root>',
    '<html><body><pre>{"wrapped": "json"}</pre></body></html>',
    "",
    "   ",
]


def _random_doc(rng: random.Random) -> str:
    kind = rng.random()
    if kind < 0.12:
        return rng.choice(_DATA_DOCS)
    parts = []
    n = rng.randint(0, 8)
    for _ in range(n):
        if rng.random() < 0.35:
            parts.append(rng.choice(_BLOCK_SNIPPETS))
        else:
            parts.append(rng.choice(_FILLER))
    body = "\n".join(parts)
    if rng.random() < 0.2:  # bulk the page past size thresholds
        pad_tag = rng.choice(
            ["<script>var x = '%s';</script>", "<style>.c { content: '%s'; }</style>", "<div>%s</div>"]
        )
        body += pad_tag % ("x" * rng.choice([3000, 9000, 20000, 60000]))
    return rng.choice(_WRAPPERS)(body)


class TestAntibotParity:
    def test_fuzz_exact_tuple(self):
        ref = load_ref_antibot()
        rng = random.Random(20260817)
        statuses = [None, 200, 301, 403, 404, 429, 500, 503, 520]
        checked = 0
        for i in range(4000):
            html = _random_doc(rng)
            status = rng.choice(statuses)
            exp = ref.is_blocked(status, html)
            got = ours_ab.is_blocked(status, html)
            assert got == exp, (
                f"seed case {i}: status={status} len={len(html)}\n"
                f"ref={exp}\nours={got}\nhtml[:300]={html[:300]!r}"
            )
            checked += 1
        assert checked == 4000

    def test_fuzz_hits_both_outcomes(self):
        ref = load_ref_antibot()
        rng = random.Random(7)
        outcomes = set()
        for _ in range(500):
            html = _random_doc(rng)
            status = rng.choice([200, 403, 429, None])
            outcomes.add(ref.is_blocked(status, html)[0])
        assert outcomes == {True, False}

    def test_structural_reason_strings(self):
        ref = load_ref_antibot()
        cases = [
            "<html><body><script>var x=1;</script></body></html>",  # shell
            "<html><body></body></html>",  # empty small page
            "<div>no body tag here</div>",
            "<html><body>" + "<div>x</div>" * 400 + "</body></html>",
        ]
        for html in cases:
            assert ours_ab.is_blocked(200, html) == ref.is_blocked(200, html)

    def test_looks_like_data(self):
        ref = load_ref_antibot()
        for doc in _DATA_DOCS + ["<html><body><p>hi</p></body></html>", "plain"]:
            assert ours_ab._looks_like_data(doc) == ref._looks_like_data(doc)


# ---------------------------------------------------------------------------
# cache_context — CacheContext / legacy flag mapping, full cross product
# ---------------------------------------------------------------------------


class TestCacheContextParity:
    URLS = [
        "http://a.example/x",
        "https://b.example/y?q=1",
        "file:///tmp/z.html",
        "raw:<html><body>hi</body></html>",
        "ftp://c.example/f",
        "about:blank",
        "",
    ]

    def test_context_cross_product(self):
        ref = load_ref_cache_context()
        for url in self.URLS:
            for mode in CacheMode:
                for bypass in (False, True):
                    r = ref.CacheContext(
                        url, ref.CacheMode(mode.value), always_bypass=bypass
                    )
                    o = CacheContext(url, mode, always_bypass=bypass)
                    assert o.should_read() == r.should_read(), (url, mode, bypass)
                    assert o.should_write() == r.should_write(), (url, mode, bypass)
                    assert o.is_cacheable == r.is_cacheable
                    assert o.is_web_url == r.is_web_url
                    assert o.is_local_file == r.is_local_file
                    assert o.is_raw_html == r.is_raw_html
                    assert o.display_url == r.display_url

    def test_legacy_flag_mapping(self):
        ref = load_ref_cache_context()
        from itertools import product

        for dc, bc, nr, nw in product((False, True), repeat=4):
            exp = ref._legacy_to_cache_mode(
                disable_cache=dc, bypass_cache=bc, no_cache_read=nr, no_cache_write=nw
            )
            got = legacy_to_cache_mode(
                disable_cache=dc, bypass_cache=bc, no_cache_read=nr, no_cache_write=nw
            )
            assert got.value == exp.value, (dc, bc, nr, nw)

    def test_mode_values_match(self):
        ref = load_ref_cache_context()
        assert {m.name: m.value for m in CacheMode} == {
            m.name: m.value for m in ref.CacheMode
        }


# ---------------------------------------------------------------------------
# proxy_strategy — ProxyConfig parsing + RoundRobin sticky sessions
# ---------------------------------------------------------------------------


def _run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


class TestProxyParity:
    def test_from_string_parsing(self):
        ref = load_ref_proxies()
        for s in ["1.2.3.4:8080:user:pw", "5.6.7.8:3128"]:
            r = ref.ProxyConfig.from_string(s)
            o = ProxyConfig.from_string(s)
            assert o.to_dict() == r.to_dict()
        for bad in ["1.2.3.4", "a:b:c", "a:b:c:d:e"]:
            with pytest.raises(ValueError):
                ProxyConfig.from_string(bad)
            with pytest.raises(ValueError):
                ref.ProxyConfig.from_string(bad)

    def test_ip_extraction(self):
        ref = load_ref_proxies()
        for server in [
            "http://10.0.0.1:8080",
            "socks5://9.9.9.9:1080",
            "10.1.1.1:9999",
            "hostname.example:80",
        ]:
            assert (
                ProxyConfig(server=server).ip == ref.ProxyConfig(server=server).ip
            ), server

    def test_from_env(self, monkeypatch):
        ref = load_ref_proxies()
        monkeypatch.setenv(
            "PROXIES_TEST", "1.1.1.1:80:u:p,2.2.2.2:81,,3.3.3.3:82:a:b"
        )
        r = ref.ProxyConfig.from_env("PROXIES_TEST")
        o = ProxyConfig.from_env("PROXIES_TEST")
        assert [x.to_dict() for x in o] == [x.to_dict() for x in r]

    def test_clone(self):
        ref = load_ref_proxies()
        r = ref.ProxyConfig("http://1.2.3.4:80", username="u").clone(password="p2")
        o = ProxyConfig("http://1.2.3.4:80", username="u").clone(password="p2")
        assert o.to_dict() == r.to_dict()

    def test_round_robin_order(self):
        ref = load_ref_proxies()
        servers = [f"http://10.0.0.{i}:8080" for i in range(1, 6)]
        r = ref.RoundRobinProxyStrategy([ref.ProxyConfig(s) for s in servers])
        o = ProxyRotator([ProxyConfig(s) for s in servers])
        ref_seq = [_run(r.get_next_proxy()).server for _ in range(17)]
        our_seq = [o.get_next_proxy().server for _ in range(17)]
        assert our_seq == ref_seq

    def test_empty_pool(self):
        ref = load_ref_proxies()
        assert _run(ref.RoundRobinProxyStrategy().get_next_proxy()) is None
        assert ProxyRotator().get_next_proxy() is None

    def test_sticky_sessions_and_ttl(self, monkeypatch):
        ref = load_ref_proxies()
        now = {"t": 1000.0}
        monkeypatch.setattr(ref.time, "time", lambda: now["t"])
        servers = [f"http://10.0.0.{i}:8080" for i in range(1, 4)]
        r = ref.RoundRobinProxyStrategy([ref.ProxyConfig(s) for s in servers])
        o = ProxyRotator(
            [ProxyConfig(s) for s in servers], clock=lambda: now["t"]
        )

        script = [
            ("s1", 30), ("s2", None), ("s1", 30), ("s3", 10), ("s2", None),
        ]
        for sid, ttl in script:
            assert (
                o.get_proxy_for_session(sid, ttl).server
                == _run(r.get_proxy_for_session(sid, ttl)).server
            ), sid

        # same session, not expired
        now["t"] += 5
        assert (
            o.get_proxy_for_session("s3", 10).server
            == _run(r.get_proxy_for_session("s3", 10)).server
        )
        # expire s3 (ttl 10), keep s1 (ttl 30)
        now["t"] += 6
        assert o.get_session_proxy("s3") is None
        assert r.get_session_proxy("s3") is None
        assert (
            o.get_proxy_for_session("s3", 10).server
            == _run(r.get_proxy_for_session("s3", 10)).server
        )
        assert (
            o.get_active_sessions().keys() == r.get_active_sessions().keys()
        )
        # release + cleanup parity
        _run(r.release_session("s2"))
        o.release_session("s2")
        now["t"] += 1000
        assert o.cleanup_expired_sessions() == _run(r.cleanup_expired_sessions())
        assert sorted(o.get_active_sessions()) == sorted(r.get_active_sessions())

    def test_assign_round_robin_matches_cycle_drain(self):
        ref = load_ref_proxies()
        servers = [f"http://10.0.0.{i}:8080" for i in range(1, 4)]
        r = ref.RoundRobinProxyStrategy([ref.ProxyConfig(s) for s in servers])
        pool = [ProxyConfig(s) for s in servers]
        keys = [f"u{i}" for i in range(10)]
        ours = [p.server for p in assign_round_robin(keys, pool, start=0)]
        refs = [_run(r.get_next_proxy()).server for _ in keys]
        assert ours == refs
        # second batch continues the cycle
        ours2 = [p.server for p in assign_round_robin(keys, pool, start=len(keys))]
        refs2 = [_run(r.get_next_proxy()).server for _ in keys]
        assert ours2 == refs2


# ---------------------------------------------------------------------------
# utils.calculate_total_score — the LinkPreview blend (utils.py:3459-3505)
# ---------------------------------------------------------------------------


class TestTotalScoreParity:
    def test_fuzz_blend(self):
        from _refload import load_ref_utils

        from crawl4ai_ray.functions.page_utils import calculate_total_score

        ref = load_ref_utils()
        rng = random.Random(99)
        for _ in range(3000):
            intr = rng.choice([None, rng.uniform(-2, 14)])
            ctx = rng.choice([None, rng.uniform(-0.5, 2.0)])
            enabled = rng.random() < 0.5
            query = rng.random() < 0.5
            assert calculate_total_score(intr, ctx, enabled, query) == (
                ref.calculate_total_score(intr, ctx, enabled, query)
            )


# ---------------------------------------------------------------------------
# utils.HeadPeekr.extract_meta_tags / get_title (utils.py:3060-3083)
# ---------------------------------------------------------------------------


class TestHeadPeekrParity:
    def test_fuzz_meta_and_title(self):
        from _refload import load_ref_utils

        from crawl4ai_ray.stages.head_filters import extract_meta_tags, get_title

        ref = load_ref_utils()
        metas = [
            '<meta name="description" content="A page about things">',
            "<meta property='og:title' content='OG Title'>",
            '<meta content="backwards" name="keywords">',
            '<meta name="robots">',
            '<meta charset="utf-8">',
            '<meta property="og:image" content="http://x/y.png" name="dup">',
            '<META NAME="upper" CONTENT="case">',
            '<meta name="description" content="overrides the first">',
            '<meta name="canonical" content="https://c.example/p">',
            '<link rel="canonical" href="https://l.example/p">',
        ]
        titles = [
            "<title>Hello</title>",
            "<title>Multi\nline  </title>",
            "<TITLE>caps</TITLE>",
            "<title>first</title><title>second</title>",
            "",
        ]
        rng = random.Random(5)
        for _ in range(3000):
            head = (
                "<head>"
                + "".join(rng.sample(metas, rng.randint(0, len(metas))))
                + rng.choice(titles)
                + "</head>"
            )
            assert extract_meta_tags(head) == ref.HeadPeekr.extract_meta_tags(head)
            assert get_title(head) == ref.HeadPeekr.get_title(head)


# ---------------------------------------------------------------------------
# SEOFilter / ContentRelevanceFilter scoring internals (filters.py:502-691)
# ---------------------------------------------------------------------------


class TestHeadFilterScoringParity:
    HEADS = None

    @staticmethod
    def _heads():
        rng = random.Random(11)
        titles = [
            "Short",
            "A title tuned to land in the fifty-to-sixty char window!!",
            "A machine learning guide with keywords sprinkled through the text",
            "",
        ]
        descs = [
            "tiny",
            "d" * 150,
            "e" * 130,
            "f" * 250,
        ]
        extras = [
            '<meta name="robots" content="noindex">',
            '<meta name="robots" content="index,follow">',
            '<meta name="canonical" content="https://a.example.com/p">',
            '<meta name="canonical" content="https://other.example/q">',
            '<script type="application/ld+json">{}</script>',
            '<meta name="keywords" content="machine learning models">',
            "",
        ]
        heads = []
        for _ in range(300):
            heads.append(
                "<head><title>%s</title><meta name=\"description\" content=\"%s\">%s</head>"
                % (
                    rng.choice(titles),
                    rng.choice(descs),
                    "".join(rng.sample(extras, rng.randint(0, 4))),
                )
            )
        return heads

    def test_seo_score_parity(self):
        from urllib.parse import urlparse

        from _refload import load_ref_filters, load_ref_utils

        from crawl4ai_ray.stages.head_filters import SEOHead

        ref_f = load_ref_filters()
        ref_u = load_ref_utils()
        urls = [
            "https://a.example.com/p",
            "https://a.example.com/a-very-long-path/" + "seg/" * 25,
            "https://a.example.com/post-2024-archive?page=2",
            "https://a.example.com/under_scored/path",
        ]
        for kw in (None, ["machine", "learning"]):
            ref_filter = ref_f.SEOFilter(threshold=0.65, keywords=kw)
            ours = SEOHead(threshold=0.65, keywords=kw)
            for head in self._heads():
                meta = ref_u.HeadPeekr.extract_meta_tags(head)
                title = ref_u.HeadPeekr.get_title(head) or ""
                for url in urls:
                    # reference apply() composition (filters.py:620-641)
                    scores = {
                        "title_length": ref_filter._score_title_length(title),
                        "title_kw": ref_filter._score_keyword_presence(title),
                        "meta_description": ref_filter._score_meta_description(
                            meta.get("description", "")
                        ),
                        "canonical": ref_filter._score_canonical(
                            meta.get("canonical"), url
                        ),
                        "robot_ok": 1.0
                        if "noindex" not in meta.get("robots", "")
                        else 0.0,
                        "schema_org": ref_filter._score_schema_org(head),
                        "url_quality": ref_filter._score_url_quality(urlparse(url)),
                    }
                    ref_score = sum(
                        w * scores[f] for f, w in ref_filter._weights.items()
                    )
                    assert ours.score(url, head) == ref_score, (url, head[:80])

    def test_bm25_relevance_parity(self):
        from _refload import load_ref_filters, load_ref_utils

        from crawl4ai_ray.stages.head_filters import ContentRelevanceHead

        ref_f = load_ref_filters()
        ref_u = load_ref_utils()
        for query in ["machine learning", ["guide", "models"], "zzz absent"]:
            ref_filter = ref_f.ContentRelevanceFilter(query=query, threshold=0.5)
            ours = ContentRelevanceHead(query=query, threshold=0.5)
            for head in self._heads():
                fields = {
                    "title": ref_u.HeadPeekr.get_title(head) or "",
                    "meta": ref_u.HeadPeekr.extract_meta_tags(head),
                }
                ref_score = ref_filter._bm25(ref_filter._build_document(fields))
                assert ours.score_head(head) == ref_score, head[:80]
