"""fit_html preprocessing, head fingerprint, prefetch links,
link intrinsic scoring, anti-bot classifier."""

import pyarrow as pa

from crawl4ai_ray.functions.page_utils import (
    calculate_link_intrinsic_score,
    compute_head_fingerprint,
    extract_page_context,
    preprocess_html_for_schema,
    quick_extract_links,
)
from crawl4ai_ray.stages.antibot import AntibotBatch, is_blocked


class TestFitHtml:
    def test_drops_head_and_scripts(self):
        html = "<html><head><title>T</title></head><body><script>x</script><p class='a'>hi</p></body></html>"
        out = preprocess_html_for_schema(html)
        assert "<title>" not in out and "<script>" not in out
        assert "hi" in out

    def test_keeps_structural_attrs_only(self):
        html = '<body><div id="a" class="b" style="color:red" onclick="x()" data-k="v">t</div></body>'
        out = preprocess_html_for_schema(html)
        assert 'id="a"' in out and 'class="b"' in out and 'data-k="v"' in out
        assert "style" not in out and "onclick" not in out

    def test_text_truncation(self):
        html = "<body><p class='x'>" + "a" * 300 + "</p></body>"
        out = preprocess_html_for_schema(html, text_threshold=100)
        assert "a" * 100 + "..." in out
        assert "a" * 101 not in out

    def test_duplicate_sibling_removal(self):
        html = (
            "<body>"
            '<div class="card">same text</div>'
            '<div class="card">same text</div>'
            '<div class="card">other text</div>'
            "</body>"
        )
        out = preprocess_html_for_schema(html)
        assert out.count("same text") == 1
        assert "other text" in out

    def test_size_cap(self):
        html = "<body>" + "".join(f"<p class='p{i}'>x</p>" for i in range(5000)) + "</body>"
        out = preprocess_html_for_schema(html, max_size=10000)
        assert len(out) <= 10004


class TestHeadFingerprint:
    HEAD = """<head><title>My Page</title>
    <meta name="description" content="desc here">
    <meta property="og:title" content="OG Title"></head>"""

    def test_stable(self):
        assert compute_head_fingerprint(self.HEAD) == compute_head_fingerprint(self.HEAD)

    def test_changes_with_title(self):
        other = self.HEAD.replace("My Page", "New Page")
        assert compute_head_fingerprint(self.HEAD) != compute_head_fingerprint(other)

    def test_attribute_order_both_ways(self):
        a = '<head><meta name="description" content="x"></head>'
        b = '<head><meta content="x" name="description"></head>'
        assert compute_head_fingerprint(a) == compute_head_fingerprint(b) != ""

    def test_empty(self):
        assert compute_head_fingerprint("") == ""
        assert compute_head_fingerprint("<head><style>x</style></head>") == ""


class TestQuickLinks:
    def test_extract_and_classify(self):
        html = """<html><body>
        <a href="/page/1">one</a>
        <a href="https://other.org/x">ext</a>
        <a href="#frag">skip</a>
        <a href="javascript:void(0)">skip</a>
        <a href="/page/1#dup">dup</a>
        </body></html>"""
        out = quick_extract_links(html, "https://site.example.com/")
        assert [l["href"] for l in out["internal"]] == ["https://site.example.com/page/1"]
        assert [l["href"] for l in out["external"]] == ["https://other.org/x"]

    def test_base_href(self):
        html = '<html><head><base href="https://cdn.example.com/r/"></head><body><a href="x">t</a></body></html>'
        out = quick_extract_links(html, "https://site.example.com/")
        assert out["internal"][0]["href"] == "https://cdn.example.com/r/x"

    def test_text_truncated(self):
        html = f'<body><a href="/x">{"t" * 500}</a></body>'
        out = quick_extract_links(html, "https://a.example.com/")
        assert len(out["internal"][0]["text"]) == 200


class TestLinkScore:
    def test_rich_link_beats_generic(self):
        ctx = extract_page_context("Python API Guide", "Tutorial", "", "https://docs.example.com/")
        good = calculate_link_intrinsic_score(
            "Python API tutorial guide", "https://docs.example.com/docs/api",
            title_attr="API docs", page_context=ctx,
        )
        bad = calculate_link_intrinsic_score(
            "click here", "http://x.com/a/b/c/d/e/f/g", page_context=ctx,
        )
        assert good > bad
        assert 0.0 <= bad <= good <= 10.0

    def test_docs_site_detection(self):
        ctx = extract_page_context("T", "", "", "https://docs.foo.com/")
        assert ctx["is_docs_site"]
        ctx2 = extract_page_context("T", "", "", "https://www.foo.com/")
        assert not ctx2["is_docs_site"]


class TestAntibot:
    def test_429(self):
        assert is_blocked(429, "<html>x</html>")[0]

    def test_cloudflare_markers(self):
        b, r = is_blocked(200, '<span class="cf-error-code">1020</span>')
        assert b and "Cloudflare" in r

    def test_akamai_reference(self):
        b, r = is_blocked(200, "<html><body><p>Reference #18.2d351ab8.1557333295.a4e16ab</p></body></html>")
        assert b and "Akamai" in r

    def test_403_html_blocked_but_json_not(self):
        assert is_blocked(403, "<html><body><p>" + "x" * 200 + "</p></body></html>")[0]
        assert not is_blocked(403, '{"error": "forbidden"}')[0]

    def test_healthy_page_passes(self):
        html = "<html><body>" + "".join(
            f"<p>paragraph {i} with plenty of visible text content</p>" for i in range(20)
        ) + "</body></html>"
        assert not is_blocked(200, html)[0]

    def test_empty_200_blocked(self):
        assert is_blocked(200, "  ")[0]

    def test_structural_shell(self):
        shell = (
            "<html><body><script>"
            + "var bundle = 'x';" * 20
            + "</script></body></html>"
        )
        b, r = is_blocked(200, shell)
        assert b and "Structural" in r

    def test_batch_stage(self):
        batch = pa.table(
            {
                "status_code": pa.array([200, 429], pa.int16()),
                "html": pa.array(
                    [
                        (
                            "<html><body>"
                            + "".join(
                                f"<p>paragraph {i} of visible text content</p>"
                                for i in range(10)
                            )
                            + "</body></html>"
                        ).encode(),
                        b"<html>x</html>",
                    ],
                    pa.large_binary(),
                ),
            }
        )
        out = AntibotBatch()(batch)
        assert out.column("blocked").to_pylist() == [False, True]


class TestScalarHtmlHelpers:
    def test_sanitize_html(self):
        from crawl4ai_ray.functions.page_utils import sanitize_html

        # reference semantics: backslash-escape quotes only
        assert sanitize_html('<a href="x">&</a>') == '<a href=\\"x\\">&</a>'
        assert sanitize_html("") == ""

    def test_fast_format_html_indents(self):
        from crawl4ai_ray.functions.page_utils import fast_format_html

        # reference semantics: only "/>" is self-closing, so a bare <br>
        # increments indent and the following close tags sit one deeper
        out = fast_format_html("<div><p>Hi<br></p></div>")
        assert out == "<div>\n  <p>\n    Hi\n    <br>\n    </p>\n  </div>"

    def test_advanced_split(self):
        from crawl4ai_ray.functions.page_utils import advanced_split

        # reference SPLITS table quirk: 'A' (65) and 'a' (97) are split
        # bytes, so a leading bare 'A' vanishes
        assert advanced_split("A. B! C?\nD") == ["B", "C", "D"]
        assert advanced_split("") == []
