"""Differential fuzzing: OUR scorers/filters/chunkers vs the reference's
ACTUAL code, direct-loaded from /root/reference (see tests/_refload.py).

This is the strongest parity evidence available in-sandbox: the same
randomized inputs are pushed through both implementations and the outputs
must agree exactly (scores: float-equal; filters: bool-equal; chunkers:
list-equal).  Covers crawl4ai/deep_crawling/scorers.py (all 5 scorers +
composite), deep_crawling/filters.py (URLPatternFilter, ContentTypeFilter,
DomainFilter, FilterChain semantics), and chunking_strategy.py (the 5
NLTK-free chunkers).
"""

from __future__ import annotations

import random
import re

import pytest

from crawl4ai_ray.functions import chunking as our_chunking
from crawl4ai_ray.functions import url_filters as our_filters
from crawl4ai_ray.functions import url_scorers as our_scorers

from _refload import (
    load_ref_chunking,
    load_ref_filters,
    load_ref_scorers,
    load_ref_utils,
)


# ---------------------------------------------------------------- URL fuzz

_SCHEMES = ["https://", "http://", "", "ftp://", "HTTPS://"]
_HOSTS = [
    "example.com", "sub.example.com", "a.b.co.uk", "EXAMPLE.com",
    "example.com:8080", "192.168.1.1", "xn--bcher-kva.de", "localhost",
    "python.org", "github.com", "blog.python.org", "docs.github.com",
]
_SEGMENTS = [
    "blog", "news", "2021", "2023-05-01", "archive_1999_12", "a.b",
    "page", "index", "deep", "x" * 30, "post-2025", "v2.0", "~user",
    "café", "%20space", "UPPER",
]
_FILES = [
    "", "index.html", "doc.pdf", "pic.jpg", "data.json", "app.js",
    "x.tar.gz", "page.php", "file.XYZ", "noext", "a.b.c.HTML",
    "movie.mp4", "style.css", "run.exe", "s.svg", "f.unknownext",
    "page.php;v=1", "x.", ".hidden",
]
_TAILS = [
    "", "?id=1", "?q=a.b/c", "?y=2020", "#frag", "#a/b", "?a=1&b=2.5",
    ";jsessionid=1", "?next=/login", "#.html",
]


def _gen_urls(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    urls = []
    for _ in range(n):
        depth = rng.randint(0, 5)
        path = "/".join(rng.choice(_SEGMENTS) for _ in range(depth))
        url = (
            rng.choice(_SCHEMES)
            + rng.choice(_HOSTS)
            + ("/" + path if path else rng.choice(["", "/"]))
            + ("/" + rng.choice(_FILES) if rng.random() < 0.7 else "")
            + rng.choice(_TAILS)
        )
        urls.append(url)
    # fixed adversarial cases
    urls += [
        "https://example.com", "https://example.com/", "example.com/a/b",
        "", "https://", "mailto:x@example.com", "https://a.com//double//slash/",
        "https://a.com/b/c/../d", "https://user:pw@example.com/x",
        "https://example.com/path/2019/05/03/post.html",
        "https://example.com/1850/not-a-year", "https://a.com/2099-file",
    ]
    return urls


URLS = _gen_urls(2500, seed=0xC4A1)


# ---------------------------------------------------------------- scorers


def _assert_scores_equal(ours, ref, urls, label):
    for u in urls:
        a = ours.score(u)
        b = ref.score(u)
        assert a == b, f"{label}: score diverges on {u!r}: ours={a!r} ref={b!r}"


class TestScorerParity:
    def test_keyword_relevance(self):
        ref_mod = load_ref_scorers()
        for kws, cs, w in [
            (["blog", "2021"], False, 1.0),
            (["BLOG"], True, 0.35),
            (["example", "news", "pdf"], False, 2.5),
            ([], False, 1.0),
            (["café"], False, 0.7),
        ]:
            _assert_scores_equal(
                our_scorers.KeywordRelevanceScorer(kws, weight=w, case_sensitive=cs),
                ref_mod.KeywordRelevanceScorer(kws, weight=w, case_sensitive=cs),
                URLS, f"keyword {kws} cs={cs} w={w}",
            )

    def test_path_depth(self):
        ref_mod = load_ref_scorers()
        for depth, w in [(0, 1.0), (1, 0.5), (3, 1.0), (7, 1.7), (2, 0.123)]:
            _assert_scores_equal(
                our_scorers.PathDepthScorer(optimal_depth=depth, weight=w),
                ref_mod.PathDepthScorer(optimal_depth=depth, weight=w),
                URLS, f"pathdepth {depth} w={w}",
            )

    def test_content_type(self):
        ref_mod = load_ref_scorers()
        weight_sets = [
            {".html$": 1.0, ".pdf$": 0.3},
            {".html$": 1.0, ".htm$": 0.9, ".php$": 0.8, ".jpg$": 0.1},
            {r"\.tar\.gz": 0.5, ".gz$": 0.9},
            {"blog": 0.7, ".json$": 0.2, "news": 0.8},
            {},
        ]
        for tw in weight_sets:
            _assert_scores_equal(
                our_scorers.ContentTypeScorer(dict(tw), weight=1.3),
                ref_mod.ContentTypeScorer(dict(tw), weight=1.3),
                URLS, f"contenttype {tw}",
            )

    def test_freshness(self):
        ref_mod = load_ref_scorers()
        for year, w in [(2024, 1.0), (2026, 0.8), (2000, 1.1)]:
            _assert_scores_equal(
                our_scorers.FreshnessScorer(weight=w, current_year=year),
                ref_mod.FreshnessScorer(weight=w, current_year=year),
                URLS, f"freshness {year} w={w}",
            )

    def test_domain_authority(self):
        ref_mod = load_ref_scorers()
        weights = {
            "python.org": 1.0, "github.com": 0.9, "example.com": 0.6,
            "sub.example.com": 0.8, "192.168.1.1": 0.2, "localhost": 0.1,
        }
        for dflt, w in [(0.5, 1.0), (0.0, 2.0), (0.9, 0.4)]:
            _assert_scores_equal(
                our_scorers.DomainAuthorityScorer(dict(weights), default_weight=dflt, weight=w),
                ref_mod.DomainAuthorityScorer(dict(weights), default_weight=dflt, weight=w),
                URLS, f"domainauth d={dflt} w={w}",
            )

    def test_composite(self):
        ref_mod = load_ref_scorers()
        for normalize in (True, False):
            ours = our_scorers.CompositeScorer(
                [
                    our_scorers.KeywordRelevanceScorer(["blog"], weight=0.7),
                    our_scorers.PathDepthScorer(optimal_depth=2, weight=1.3),
                    our_scorers.FreshnessScorer(weight=0.9),
                ],
                normalize=normalize,
            )
            ref = ref_mod.CompositeScorer(
                [
                    ref_mod.KeywordRelevanceScorer(["blog"], weight=0.7),
                    ref_mod.PathDepthScorer(optimal_depth=2, weight=1.3),
                    ref_mod.FreshnessScorer(weight=0.9),
                ],
                normalize=normalize,
            )
            _assert_scores_equal(ours, ref, URLS, f"composite norm={normalize}")


# ---------------------------------------------------------------- filters


def _assert_filters_equal(ours, ref, urls, label):
    for u in urls:
        a = bool(ours.apply(u))
        b = bool(ref.apply(u))
        assert a == b, f"{label}: verdict diverges on {u!r}: ours={a} ref={b}"


class TestFilterParity:
    PATTERN_SETS = [
        "*.html",
        ["*.html", "*.pdf"],
        "https://example.com/*",
        "*/blog/*",
        ["*blog*"],
        "^https://.*\\.org",
        ".*\\d{4}.*",
        "*.example.com",
        ["https://*.example.com/page/*"],
        "/news/*",
        "*.tar.gz",
        ["**/archive/**"],
        "https://{example.com,python.org}/*",
        # "*.php$" is rejected by re.compile in BOTH engines (the reference
        # categorizes any '$'-suffixed pattern as a raw regex) — not fuzzable
        [re.compile(r"/\d{4}/")],
    ]

    @pytest.mark.parametrize("reverse", [False, True])
    def test_url_pattern(self, reverse):
        ref_mod = load_ref_filters()
        for pats in self.PATTERN_SETS:
            _assert_filters_equal(
                our_filters.URLPatternFilter(pats, reverse=reverse),
                ref_mod.URLPatternFilter(pats, reverse=reverse),
                URLS, f"pattern {pats!r} rev={reverse}",
            )

    def test_content_type(self):
        ref_mod = load_ref_filters()
        for allowed, check in [
            (["text/html"], True),
            ("text/html", True),
            (["text/html", "application/pdf"], True),
            (["image"], True),
            (["application/x-httpd-php"], True),
            (["video", "audio"], True),
            (["text/html"], False),
        ]:
            _assert_filters_equal(
                our_filters.ContentTypeFilter(allowed, check_extension=check),
                ref_mod.ContentTypeFilter(allowed, check_extension=check),
                URLS, f"contenttype {allowed} check={check}",
            )

    def test_domain(self):
        ref_mod = load_ref_filters()
        for allowed, blocked in [
            (["example.com"], None),
            (None, ["example.com"]),
            (["example.com", "python.org"], ["sub.example.com"]),
            ("EXAMPLE.com", None),
            (None, None),
            (["b.co.uk"], ["a.b.co.uk"]),
            (["example.com:8080"], None),
        ]:
            _assert_filters_equal(
                our_filters.DomainFilter(allowed_domains=allowed, blocked_domains=blocked),
                ref_mod.DomainFilter(allowed_domains=allowed, blocked_domains=blocked),
                URLS, f"domain allow={allowed} block={blocked}",
            )


# -------------------------------------------------------- utils scalar fns

_HREFS = [
    "page.html", "./page.html", "../up/page.html", "/abs/path", "//cdn.example.com/x.js",
    "sub/dir/", "?q=1", "#frag", "page.html#sec", "page.html?utm_source=x&b=2",
    "page.html?b=2&a=1&a=3", "page.html?blank=&x=1", "HTTP://UPPER.COM/Path",
    "https://other.com:8080/x", "mailto:a@b.com", "javascript:void(0)", "tel:+123",
    "  spaced.html  ", "", "page with space.html", "page%20enc.html",
    "https://example.com", "https://example.com/", "/", "..", ".",
    "https://example.com/a;param=1?x=2#y", "ftp://files.example.com/f.zip",
    "//example.com/proto-relative", "http://example.com/downgrade",
    "https://example.com/x?utm_source=a&utm_medium=b&utm_campaign=c&gclid=1&fbclid=2&ref=3&ref_src=4&keep=5",
    "data:text/html,hi", "page.html?a=%26amp%3B&b=c d",
]
_BASES = [
    "https://example.com/dir/page.html",
    "https://example.com/dir/",
    "http://example.com",
    "https://sub.example.co.uk/a/b?c=1",
    "https://www.example.com:8443/x/",
]


class TestUtilsParity:
    def test_normalize_url(self):
        ref = load_ref_utils()
        from crawl4ai_ray.functions import urls as ours
        kwargsets = [
            {},
            {"drop_query_tracking": False},
            {"sort_query": False},
            {"keep_fragment": True},
            {"extra_drop_params": ["b", "KEEP"]},
            {"preserve_https": True, "original_scheme": "https"},
        ]
        for kw in kwargsets:
            for base in _BASES:
                for href in _HREFS:
                    a = ours.normalize_url(href, base, **kw)
                    b = ref.normalize_url(href, base, **kw)
                    assert a == b, f"normalize_url({href!r}, {base!r}, {kw}) -> {a!r} != {b!r}"

    def test_normalize_url_for_deep_crawl(self):
        ref = load_ref_utils()
        from crawl4ai_ray.functions import urls as ours
        for ph, sch in [(False, None), (True, "https"), (True, "http")]:
            for base in _BASES:
                for href in _HREFS:
                    a = ours.normalize_url_for_deep_crawl(href, base, ph, sch)
                    b = ref.normalize_url_for_deep_crawl(href, base, ph, sch)
                    assert a == b, f"deep_crawl({href!r}, {base!r}, {ph}, {sch}) -> {a!r} != {b!r}"

    def test_efficient_normalize_url_for_deep_crawl(self):
        ref = load_ref_utils()
        from crawl4ai_ray.functions import urls as ours
        for base in _BASES:
            for href in _HREFS:
                a = ours.efficient_normalize_url_for_deep_crawl(href, base)
                b = ref.efficient_normalize_url_for_deep_crawl(href, base)
                assert a == b, f"efficient({href!r}, {base!r}) -> {a!r} != {b!r}"

    def test_get_base_domain(self):
        ref = load_ref_utils()
        from crawl4ai_ray.functions import urls as ours
        for u in URLS + [
            "https://www.example.co.uk/x", "https://a.b.c.d.gov.ag/x",
            "https://www.ac.uk", "http://www.com", "https://x.mil.af:9/p",
        ]:
            assert ours.get_base_domain(u) == ref.get_base_domain(u), u

    def test_is_external_url(self):
        ref = load_ref_utils()
        from crawl4ai_ray.functions import urls as ours
        bases = ["example.com", "www.example.com", "sub.example.co.uk", "EXAMPLE.com:80", ""]
        for b in bases:
            for u in URLS + _HREFS:
                a = ours.is_external_url(u, b)
                r = ref.is_external_url(u, b)
                assert a == r, f"is_external({u!r}, {b!r}) -> {a} != {r}"

    def test_clean_tokens(self):
        ref = load_ref_utils()
        from crawl4ai_ray.stages.content_filters import clean_tokens as ours
        rng = random.Random(7)
        vocab = (
            "the a an and are news ↑top ▲up ⬆️go can't won't n't alpha beta "
            "myself themselves about python ray data cc ccp xyz so yet none "
            "do did doing under until upon what which who how all other"
        ).split() + ["↑", "▲", "⬆️x", "ab", "abc", ""]
        for _ in range(200):
            toks = [rng.choice(vocab) for _ in range(rng.randint(0, 60))]
            assert ours(list(toks)) == ref.clean_tokens(list(toks)), toks

    def test_merge_chunks_based_on_token_threshold(self):
        ref = load_ref_utils()
        from crawl4ai_ray.functions.chunking import (
            merge_chunks_based_on_token_threshold as ours,
        )
        rng = random.Random(21)
        for _ in range(150):
            chunks = [
                " ".join(f"t{rng.randint(0,9)}" for _ in range(rng.randint(0, 20)))
                for _ in range(rng.randint(0, 10))
            ]
            th = rng.choice([1, 8, 40, 200])
            assert ours(list(chunks), th) == ref.merge_chunks_based_on_token_threshold(
                list(chunks), th
            ), (chunks, th)

    def test_chunk_documents(self):
        ref = load_ref_utils()
        from crawl4ai_ray.functions.chunking import chunk_documents as ours
        rng = random.Random(22)
        for _ in range(120):
            docs = [
                " ".join(f"w{rng.randint(0,30)}" for _ in range(rng.randint(0, 50)))
                for _ in range(rng.randint(0, 6))
            ]
            # NOTE: overlap must stay well under the threshold — when a
            # whole chunk qualifies as overlap the REFERENCE's while-loop
            # (utils.py:114-152) re-queues everything it dequeued and
            # never terminates; the reference's own caller uses
            # overlap_rate=0.1, so fuzz in that regime.
            th = rng.choice([4, 10, 64])
            ov = rng.choice([0, 1]) if th == 4 else rng.choice([0, 1, th // 8])
            rate = rng.choice([0.75, 1.0, 1.4])
            tokenizer = (lambda s: s.split()) if rng.random() < 0.3 else None
            a = list(ours(list(docs), th, ov, word_token_rate=rate, tokenizer=tokenizer))
            b = list(ref.chunk_documents(list(docs), th, ov, word_token_rate=rate, tokenizer=tokenizer))
            assert a == b, (docs, th, ov, rate, bool(tokenizer))

    def test_merge_chunks(self):
        ref = load_ref_utils()
        from crawl4ai_ray.functions.chunking import merge_chunks as ours
        rng = random.Random(13)
        for _ in range(150):
            docs = [
                " ".join(f"w{rng.randint(0,50)}" for _ in range(rng.randint(0, 40)))
                for _ in range(rng.randint(0, 8))
            ]
            target = rng.choice([1, 5, 16, 100])
            overlap = rng.choice([0, 2, 5])
            ratio = rng.choice([1.0, 0.75, 1.3])
            a = ours(list(docs), target, overlap=overlap, word_token_ratio=ratio)
            b = ref.merge_chunks(list(docs), target, overlap=overlap, word_token_ratio=ratio)
            assert a == b, f"merge_chunks(target={target}, ov={overlap}, r={ratio}) on {docs!r}"


# ------------------------------------------------- scalar helper functions


def _fuzz_strings(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    pieces = [
        "plain", 'quo"te', "back\\slash", "tab\t", "nl\n", "cr\r", "bell\x07",
        "del\x7f", "c1\x85", "uni—dash", "émoji🎉", "<b>html</b>", "{brace}",
        "[bracket]", "a'b", "\x00nul", "café", "…", "  spaced  ", "",
    ]
    out = []
    for _ in range(n):
        out.append("".join(rng.choice(pieces) for _ in range(rng.randint(0, 8))))
    return out


class TestScalarHelperParity:
    def test_sanitize_input_encode(self):
        ref = load_ref_utils()
        from crawl4ai_ray.functions.text_utils import sanitize_input_encode as ours
        for s in _fuzz_strings(300, 1) + ["\ud800bad-surrogate\udfff", "ok"]:
            assert ours(s) == ref.sanitize_input_encode(s), repr(s)

    def test_escape_json_string(self):
        ref = load_ref_utils()
        from crawl4ai_ray.functions.text_utils import escape_json_string as ours
        for s in _fuzz_strings(300, 2):
            a, b = ours(s), ref.escape_json_string(s)
            assert a == b, f"{s!r}: {a!r} != {b!r}"

    def test_sanitize_html(self):
        ref = load_ref_utils()
        from crawl4ai_ray.functions.page_utils import sanitize_html as ours
        for s in _fuzz_strings(200, 3):
            if not s:
                continue  # ours maps falsy to "" (None guard extension)
            assert ours(s) == ref.sanitize_html(s), repr(s)

    def test_truncate(self):
        ref = load_ref_utils()
        from crawl4ai_ray.functions.text_utils import truncate as ours
        for s in _fuzz_strings(100, 4):
            for th in (0, 3, 10, 500):
                assert ours(s, th) == ref.truncate(s, th), (s, th)

    def test_extract_xml_tags_and_data(self):
        ref = load_ref_utils()
        from crawl4ai_ray.functions.text_utils import (
            extract_xml_data as ours_data,
            extract_xml_data_legacy as ours_legacy,
            extract_xml_tags as ours_tags,
        )
        rng = random.Random(5)
        frags = [
            "<name>A</name>", "<name>Longer Bob</name>", "<age>7</age>",
            "<name><inner>x</inner></name>", "<empty></empty>", "text",
            "<open>unclosed", "<name>\nmulti\nline\n</name>", "<Name>case</Name>",
        ]
        for _ in range(200):
            body = " ".join(rng.choice(frags) for _ in range(rng.randint(0, 6)))
            tags = ["name", "age", "empty", "inner", "missing", "Name"]
            assert sorted(ours_tags(body)) == sorted(ref.extract_xml_tags(body)), body
            assert ours_data(tags, body) == ref.extract_xml_data(tags, body), body
            assert ours_legacy(tags, body) == ref.extract_xml_data_legacy(tags, body), body

    def test_split_and_parse_json_objects(self):
        ref = load_ref_utils()
        from crawl4ai_ray.functions.text_utils import split_and_parse_json_objects as ours
        rng = random.Random(6)
        frags = [
            '{"a": 1}', '{"b": [1, 2]}', '{"nested": {"x": 2}}', "{bad json}",
            "noise", '{"s": "str"}', "[", "]", ",", '{"unclosed": 1',
        ]
        cases = [
            "".join(rng.choice(frags) for _ in range(rng.randint(0, 6)))
            for _ in range(250)
        ]
        cases += ['[{"a":1},{"b":2}]', "[]", "", '[{"a":1}', "{}{}"]
        for s in cases:
            assert ours(s) == ref.split_and_parse_json_objects(s), repr(s)

    def test_advanced_split(self):
        ref = load_ref_utils()
        from crawl4ai_ray.functions.page_utils import advanced_split as ours
        rng = random.Random(8)
        pieces = [
            "word", "two words", "a+=b", "x==y", "n--", "p?.q", "a=>b",
            "tail<=>head", "e===f", "über", "naïve", "•bullet", "…", "«q»",
            "aÿb", "Ānonlatin", "num123", "(par)", "semi;colon",
        ]
        for _ in range(250):
            text = " ".join(rng.choice(pieces) for _ in range(rng.randint(0, 12)))
            assert ours(text) == ref.advanced_split(text), repr(text)

    def test_fast_format_html(self):
        ref = load_ref_utils()
        from crawl4ai_ray.functions.page_utils import fast_format_html as ours
        rng = random.Random(9)
        frags = [
            "<div>", "</div>", "<p class='x'>", "</p>", "text node",
            "<br/>", "<img src='x'/>", "<br>", "<!-- c -->", "</span>",
            "<span>", "multi  space", "<a href=\"y\">", "</a>",
        ]
        for _ in range(200):
            html = "".join(rng.choice(frags) for _ in range(rng.randint(0, 10)))
            assert ours(html) == ref.fast_format_html(html), repr(html)

    def test_head_fingerprint_and_content_hash(self):
        """Signal-extraction parity: the reference hashes with xxhash
        (absent here), so swap its xxhash for a shim that applies OUR
        content_hash — outputs then agree iff the extracted signal
        strings agree."""
        ref = load_ref_utils()
        from crawl4ai_ray.functions.hashing import content_hash
        from crawl4ai_ray.functions.page_utils import compute_head_fingerprint as ours

        class _Shim:
            @staticmethod
            def xxh64(data):
                class H:
                    @staticmethod
                    def hexdigest():
                        return content_hash(data.decode("utf-8", "surrogatepass"))
                return H
        old = ref.xxhash
        ref.xxhash = _Shim
        try:
            rng = random.Random(10)
            frags = [
                "<title>My Page</title>", "<title >Other</title>",
                '<meta name="description" content="d1">',
                "<meta content='d2' name='description'>",
                '<meta property="og:title" content="og t">',
                '<meta property="og:updated_time" content="2024-01-01">',
                '<meta property="article:modified_time" content="t9">',
                '<meta name="last-modified" content="yesterday">',
                '<meta property="og:image" content="/x.png">',
                "<script>junk</script>", "plain",
            ]
            for _ in range(200):
                head = "".join(rng.choice(frags) for _ in range(rng.randint(0, 6)))
                assert ours(head) == ref.compute_head_fingerprint(head), repr(head)
            assert ours("") == ref.compute_head_fingerprint("") == ""
            assert content_hash("abc") == ref.generate_content_hash("abc")
        finally:
            ref.xxhash = old

    def test_extract_page_context(self):
        ref = load_ref_utils()
        from crawl4ai_ray.functions.page_utils import extract_page_context as ours
        cases = [
            ("My Title", "H1 text! More.", "A description, here", "https://docs.example.com/x"),
            ("", "", "", "https://api.foo.dev/"),
            (None, None, None, "not a url"),
            ("Tiny tl", "ab cd efg", "", "https://example.com"),
            ("Ünïcode Wörds", "punct, (parens) [brk]", "q:colon", "https://developer.x.y/p"),
        ]
        for t, h, m, b in cases:
            assert ours(t, h, m, b) == ref.extract_page_context(t, h, m, b), (t, h, m, b)

    def test_calculate_link_intrinsic_score(self):
        ref = load_ref_utils()
        from crawl4ai_ray.functions.page_utils import (
            calculate_link_intrinsic_score as ours,
            extract_page_context,
        )
        ctx = extract_page_context(
            "Python Ray Data Guide", "Streaming Execution! Datasets.",
            "A guide to ray data pipelines", "https://docs.example.com/guide",
        )
        rng = random.Random(11)
        texts = ["", "click here", "Read the Ray Data guide", "API Reference", "x", "Datasets streaming execution pipelines guide"]
        urls_ = [
            "https://docs.example.com/api/x", "http://a.com/blog/p", "https://a.com/admin/x",
            "https://a.com/a/b/c/d/e/f/g", "https://a.com/", "/rel/tutorial/x",
        ]
        titles = ["", "t", "a real title"]
        classes = ["", "nav primary", "ad banner", "menu promo"]
        rels = ["", "nofollow", "next chapter", "sponsored ugc"]
        for _ in range(400):
            args = (
                rng.choice(texts), rng.choice(urls_), rng.choice(titles),
                rng.choice(classes), rng.choice(rels), ctx,
            )
            assert ours(*args) == ref.calculate_link_intrinsic_score(*args), args


# ---------------------------------------------------------------- chunkers


def _gen_texts(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    words = [
        "alpha", "beta", "gamma", "delta\n", "x", "longword" * 4,
        "tab\there", "end.", "comma,", "été",
    ]
    texts = []
    for _ in range(n):
        k = rng.randint(0, 400)
        sep = rng.choice([" ", "  ", " \n ", "\n\n", "\t"])
        texts.append(sep.join(rng.choice(words) for _ in range(k)))
    texts += ["", " ", "\n\n", "one", "a\n\nb\n\nc", "  lead and trail  "]
    return texts


TEXTS = _gen_texts(300, seed=0x7E07)


class TestChunkerParity:
    def test_identity(self):
        ref = load_ref_chunking()
        for t in TEXTS:
            assert our_chunking.IdentityChunking().chunk(t) == ref.IdentityChunking().chunk(t)

    def test_regex(self):
        ref = load_ref_chunking()
        for pats in [None, [r"\n\n"], [r"\n\n", r"\. "], [r"x"]]:
            ours = our_chunking.RegexChunking(patterns=pats)
            theirs = ref.RegexChunking(patterns=pats)
            for t in TEXTS:
                assert ours.chunk(t) == theirs.chunk(t), f"regex {pats} on {t[:40]!r}"

    def test_fixed_length_word(self):
        ref = load_ref_chunking()
        for size in [1, 7, 100]:
            ours = our_chunking.FixedLengthWordChunking(chunk_size=size)
            theirs = ref.FixedLengthWordChunking(chunk_size=size)
            for t in TEXTS:
                assert ours.chunk(t) == theirs.chunk(t), f"fixed {size} on {t[:40]!r}"

    def test_sliding_window(self):
        ref = load_ref_chunking()
        for win, step in [(100, 50), (10, 3), (5, 5), (2, 1)]:
            ours = our_chunking.SlidingWindowChunking(window_size=win, step=step)
            theirs = ref.SlidingWindowChunking(window_size=win, step=step)
            for t in TEXTS:
                assert ours.chunk(t) == theirs.chunk(t), f"slide {win}/{step} on {t[:40]!r}"

    def test_overlapping_window(self):
        ref = load_ref_chunking()
        for win, ov in [(1000, 100), (20, 5), (10, 0), (6, 3)]:
            ours = our_chunking.OverlappingWindowChunking(window_size=win, overlap=ov)
            theirs = ref.OverlappingWindowChunking(window_size=win, overlap=ov)
            for t in TEXTS:
                assert ours.chunk(t) == theirs.chunk(t), f"overlap {win}/{ov} on {t[:40]!r}"
