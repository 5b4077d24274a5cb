"""Canonicalization behavior pinned to the reference's semantics
(crawl4ai/utils.py:2216-2412; test model: reference
tests/test_normalize_url.py)."""

from crawl4ai_ray.functions.urls import (
    efficient_normalize_url_for_deep_crawl,
    get_base_domain,
    host_of,
    is_external_url,
    is_valid_crawl_url,
    normalize_url,
    normalize_url_for_deep_crawl,
)

BASE = "https://www.example.com/dir/page.html"


class TestNormalizeUrl:
    def test_relative_join(self):
        assert normalize_url("sub/x.html", BASE) == "https://www.example.com/dir/sub/x.html"
        assert normalize_url("/abs", BASE) == "https://www.example.com/abs"
        assert normalize_url("//cdn.other.com/a", BASE) == "https://cdn.other.com/a"

    def test_tracking_params_dropped_case_insensitive(self):
        u = "https://a.com/p?utm_source=x&UTM_MEDIUM=y&gclid=1&keep=2"
        assert normalize_url(u, BASE) == "https://a.com/p?keep=2"

    def test_query_sorted(self):
        assert normalize_url("https://a.com/p?b=2&a=1", BASE) == "https://a.com/p?a=1&b=2"

    def test_blank_values_kept(self):
        # parse_qsl(keep_blank_values=True) path
        assert normalize_url("https://a.com/p?a=&b=1", BASE) == "https://a.com/p?a=&b=1"

    def test_fragment_dropped_by_default(self):
        assert normalize_url("https://a.com/p#sec", BASE) == "https://a.com/p"
        assert (
            normalize_url("https://a.com/p#sec", BASE, keep_fragment=True)
            == "https://a.com/p#sec"
        )

    def test_netloc_lowercased_path_case_preserved(self):
        assert (
            normalize_url("HTTPS://WWW.Example.COM/Dir/Page", BASE)
            == "https://www.example.com/Dir/Page"
        )

    def test_trailing_slash_preserved(self):
        assert normalize_url("https://a.com/p/", BASE) == "https://a.com/p/"
        assert normalize_url("https://a.com/p", BASE) == "https://a.com/p"

    def test_plus_sign_not_mangled(self):
        assert normalize_url("https://a.com/a+b", BASE) == "https://a.com/a+b"

    def test_none_and_empty(self):
        assert normalize_url(None, BASE) is None
        assert normalize_url("", BASE) is None


class TestDeepCrawlNormalizer:
    def test_five_tracking_params_only(self):
        # deep variant drops utm_source/utm_medium/utm_campaign/ref/fbclid
        u = "https://a.com/p?utm_source=x&ref=y&keep=1"
        assert normalize_url_for_deep_crawl(u, BASE) == "https://a.com/p?keep=1"
        # but NOT gclid / utm_term (unlike normalize_url)
        u2 = "https://a.com/p?gclid=1&utm_term=t"
        assert normalize_url_for_deep_crawl(u2, BASE) == "https://a.com/p?gclid=1&utm_term=t"

    def test_query_not_sorted_first_occurrence_order(self):
        # parse_qs keeps first-occurrence key order; no sorting
        assert (
            normalize_url_for_deep_crawl("https://a.com/p?b=2&a=1", BASE)
            == "https://a.com/p?b=2&a=1"
        )

    def test_blank_values_dropped(self):
        # parse_qs default drops blank values
        assert (
            normalize_url_for_deep_crawl("https://a.com/p?a=&b=1", BASE)
            == "https://a.com/p?b=1"
        )

    def test_duplicate_keys_grouped(self):
        assert (
            normalize_url_for_deep_crawl("https://a.com/p?a=1&b=2&a=3", BASE)
            == "https://a.com/p?a=1&a=3&b=2"
        )

    def test_empty_path_becomes_root(self):
        assert normalize_url_for_deep_crawl("https://a.com", BASE) == "https://a.com/"

    def test_fragment_removed(self):
        assert normalize_url_for_deep_crawl("https://a.com/p#x", BASE) == "https://a.com/p"

    def test_composition_with_full_normalizer(self):
        # the frontier applies deep(full(href)) — corpus decorations
        # must collapse to the bare url
        href = "https://SITE-3.EXAMPLE.COM/page/7?utm_source=c&ref=related#s"
        full = normalize_url(href, BASE)
        assert normalize_url_for_deep_crawl(full, BASE) == "https://site-3.example.com/page/7"

    def test_efficient_variant_keeps_query(self):
        assert (
            efficient_normalize_url_for_deep_crawl("https://A.com/p?utm_source=x", BASE)
            == "https://a.com/p?utm_source=x"
        )


class TestDomains:
    def test_base_domain(self):
        assert get_base_domain("https://www.example.com/x") == "example.com"
        assert get_base_domain("https://sub.a.example.com/x") == "example.com"
        assert get_base_domain("https://shop.example.co.uk/") == "example.co.uk"
        assert get_base_domain("https://example.com:8080/") == "example.com"
        assert get_base_domain("not a url") == ""

    def test_external(self):
        assert not is_external_url("https://site-4.example.com/p", "example.com")
        assert is_external_url("https://other.org/p", "example.com")
        assert is_external_url("mailto:a@b.com", "example.com")
        assert is_external_url("javascript:void(0)", "example.com")
        assert not is_external_url("/relative", "example.com")

    def test_valid_crawl_url(self):
        assert is_valid_crawl_url("https://a.com/p")
        assert not is_valid_crawl_url("ftp://a.com/p")
        assert not is_valid_crawl_url("https://localhost/p")  # no dot
        assert not is_valid_crawl_url(None)
        assert not is_valid_crawl_url("not a url")

    def test_host_of(self):
        assert host_of("https://Site-3.Example.com:8443/p") == "site-3.example.com:8443"


class TestVectorizedUrlOps:
    CASES = [
        "http://a.b/c", "https://x.y", "ftp://a.b", "http://nodot/x",
        "http:///x", "", "https://u:p@h.co:8080/p?q#f", "not a url",
        "HTTP://A.B/", "http://a.b#frag", "mailto:x@y.z", "/relative",
        "http://a.b?q=.", "https://-.-/", "//host.com/x",
        "http://A.B.C/Path", "javascript:void(0)", "tel:+123",
        "http://h.co", "https://sub.domain.example.com/deep/path",
    ]

    def test_valid_mask_matches_scalar(self):
        from crawl4ai_ray.functions.urls import is_valid_crawl_url, valid_crawl_mask

        mask = valid_crawl_mask(self.CASES)
        assert list(mask) == [is_valid_crawl_url(c) for c in self.CASES]

    def test_hosts_match_scalar(self):
        from crawl4ai_ray.functions.urls import host_of, hosts_of

        assert hosts_of(self.CASES) == [host_of(c) for c in self.CASES]

    def test_arrow_mask_matches_pandas(self):
        import numpy as np
        import pyarrow as pa

        from crawl4ai_ray.functions.urls import (
            valid_crawl_mask,
            valid_crawl_mask_arrow,
        )

        cases = self.CASES + ["héllo/ünïcode漢字", "http://ü.example/x"]
        arr = pa.array(cases, pa.string())
        assert list(valid_crawl_mask_arrow(arr)) == list(valid_crawl_mask(cases))
        # null -> invalid (never crawled), empty input ok
        assert list(valid_crawl_mask_arrow(pa.array(["http://a.b/c", None]))) == [
            True,
            False,
        ]
        assert valid_crawl_mask_arrow(pa.array([], pa.string())).shape == (0,)
        # sliced array (non-zero offset into the shared buffer)
        assert list(valid_crawl_mask_arrow(arr.slice(3, 10))) == list(
            valid_crawl_mask(cases[3:13])
        )
        assert np.asarray(valid_crawl_mask_arrow(arr)).dtype == bool


class TestArrowHashing:
    """hash64_arrow must hash the utf-8 buffer to the exact same u64
    as the per-string hash64 — across offsets, dictionary encoding,
    chunking and large_string (the seen-shard routing contract)."""

    def _cases(self):
        import random
        import string

        random.seed(11)
        out = []
        for i in range(600):
            r = random.random()
            if r < 0.6:
                out.append(f"http://host{i % 37}.example.com/p/{i}")
            elif r < 0.8:
                out.append(
                    "".join(random.choices(string.printable, k=random.randint(0, 40)))
                )
            elif r < 0.9:
                out.append("héllo" + "漢字" * random.randint(0, 4))
            else:
                out.append("")
        return out

    def test_arrow_equals_scalar(self):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from crawl4ai_ray.functions.hashing import (
            hash64,
            hash64_arrow,
            hash64_batch,
        )

        cases = self._cases()
        exp = np.array([hash64(u) for u in cases], dtype=np.uint64)
        arr = pa.array(cases, pa.string())
        assert np.array_equal(hash64_arrow(arr), exp)
        # hash64_batch dispatches Arrow input to the buffer path
        assert np.array_equal(hash64_batch(arr), exp)
        # sliced (non-zero offset), dictionary, chunked, large_string
        assert np.array_equal(hash64_arrow(arr.slice(17, 300)), exp[17:317])
        assert np.array_equal(hash64_arrow(pc.dictionary_encode(arr)), exp)
        chunked = pa.chunked_array([arr.slice(0, 100), arr.slice(100)])
        assert np.array_equal(hash64_arrow(chunked), exp)
        assert np.array_equal(hash64_arrow(arr.cast(pa.large_string())), exp)


class TestFastPathEquivalence:
    """The absolute-url fast paths must be bit-equivalent to the
    general urlparse-based algorithms."""

    BASE = "https://base.example.com/dir/page"
    CASES = [
        "http://a.b/c", "https://A.B/Path/To", "http://a.b", "https://a.b/",
        "HTTP://HOST.com/x", "http://a.b/c?x=1", "http://a.b/c#f",
        "http://a.b/c;p=1", "http://a.b/c/d.html", "https://sub.x.y:8080/p",
        "ftp://a.b/c", "/rel/path", "http://a.b/c%20d", "http://a.b/+plus/",
        "https://u:p@h.co/x", "http://a.b/c?utm_source=x",
        "http://a.b/c?b=2&a=1", "httpx://a.b/c", "  http://a.b/c  ",
        "http://a.b?x=1",
    ]

    def test_normalize_url(self):
        from urllib.parse import parse_qsl, urlencode, urljoin, urlparse, urlunparse

        from crawl4ai_ray.functions.urls import _TRACKING_FULL, normalize_url

        def general(href, base_url):
            full = urljoin(base_url, href.strip())
            p = urlparse(full)
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

        for c in self.CASES:
            assert normalize_url(c, self.BASE) == general(c, self.BASE), c

    def test_normalize_url_for_deep_crawl(self):
        from urllib.parse import parse_qs, urlencode, urljoin, urlparse, urlunparse

        from crawl4ai_ray.functions.urls import (
            _TRACKING_DEEP,
            normalize_url_for_deep_crawl,
        )

        def general(href, base_url):
            full = urljoin(base_url, href.strip())
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

        for c in self.CASES:
            assert normalize_url_for_deep_crawl(c, self.BASE) == general(
                c, self.BASE
            ), c

    def test_is_external_fast_netloc(self):
        from urllib.parse import urlparse

        from crawl4ai_ray.functions.urls import is_external_url

        def general(url, bd):
            if any(
                url.lower().startswith(p)
                for p in ("mailto:", "tel:", "ftp:", "file:", "data:", "javascript:")
            ):
                return True
            try:
                p = urlparse(url)
                if not p.netloc:
                    return False
                ud = p.netloc.lower().split(":")[0].replace("www.", "")
                return not ud.endswith(bd.lower().split(":")[0].replace("www.", ""))
            except Exception:
                return False

        for c in self.CASES:
            assert is_external_url(c, "a.b") == general(c, "a.b"), c
