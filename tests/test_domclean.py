"""Unit fixtures for the cleaned_html pruning passes (reference
content_scraping_strategy.py:517-612, 615-1010)."""

from crawl4ai_ray.functions.domclean import (
    clean_base64_images,
    clone_node,
    remove_empty_elements,
    remove_unwanted_attributes,
    replace_mermaid_svgs,
    strip_to_text,
    subset_content,
)
from crawl4ai_ray.functions.htmlparse import parse_html
from crawl4ai_ray.stages.extract import scrape_page


def _ser(html):
    return parse_html(html)


class TestRemoveEmpty:
    def test_drops_childless_zero_word(self):
        t = _ser("<div><p></p><span>  </span><p>kept words</p></div>")
        remove_empty_elements(t, 1)
        s = t.serialize()
        assert "<p></p>" not in s and "<span>" not in s
        assert "kept words" in s

    def test_bypass_tags_survive(self):
        t = _ser('<div><img src="/x.png"><br><hr><td></td><input></div>')
        remove_empty_elements(t, 1)
        s = t.serialize()
        for frag in ("<img", "<br", "<hr", "<td", "<input"):
            assert frag in s

    def test_pre_code_whitespace_spans_survive(self):
        t = _ser('<pre><span class="w"> </span><span>x</span></pre><p> </p>')
        remove_empty_elements(t, 1)
        s = t.serialize()
        assert s.count("<span") == 2
        assert "<p>" not in s

    def test_parent_with_element_children_kept(self):
        t = _ser("<div><section><img src='/a'></section></div>")
        remove_empty_elements(t, 1)
        assert "<section>" in t.serialize()

    def test_sibling_text_preserved_on_removal(self):
        t = _ser("<div><b></b>tail stays</div>")
        remove_empty_elements(t, 1)
        assert "tail stays" in t.serialize()

    def test_word_threshold(self):
        t = _ser("<div><p>one two</p><p>one two three four five</p></div>")
        remove_empty_elements(t, 5)
        s = t.serialize()
        assert "one two three four five" in s
        assert "<p>one two</p>" not in s


class TestRemoveAttributes:
    def test_keeps_important_only(self):
        t = _ser(
            '<div style="x" data-a="1" class="c" id="i">'
            '<a href="/x" onclick="f()" title="t" rel="nofollow">x</a>'
            '<img src="/i" srcset="/i2" width="5" height="6" loading="lazy"></div>'
        )
        remove_unwanted_attributes(t)
        s = t.serialize()
        for kept in ('class="c"', 'id="i"', 'href="/x"', 'title="t"', 'src="/i"', 'width="5"', 'height="6"'):
            assert kept in s
        for gone in ("style=", "data-a", "onclick", "rel=", "srcset", "loading"):
            assert gone not in s

    def test_keep_data_attributes(self):
        t = _ser('<div data-a="1" style="x">y</div>')
        remove_unwanted_attributes(t, keep_data_attributes=True)
        s = t.serialize()
        assert 'data-a="1"' in s and "style=" not in s


class TestMermaid:
    def test_fenced_replacement(self):
        t = _ser(
            '<div><svg id="mermaid-9" aria-roledescription="sequence">'
            '<g class="nodeLabel">A</g><g class="nodeLabel">B</g></svg></div>'
        )
        replace_mermaid_svgs(t)
        s = t.serialize()
        assert "<svg" not in s
        assert 'data-language="mermaid"' in s
        assert "%% sequence diagram" in s and "A\nB" in s

    def test_inside_pre_becomes_span(self):
        t = _ser('<pre><svg id="mermaid-1"><text>L1</text></svg></pre>')
        replace_mermaid_svgs(t)
        s = t.serialize()
        assert "<span>" in s and "L1" in s and "<svg" not in s

    def test_non_mermaid_svg_untouched(self):
        t = _ser('<svg id="logo"><text>X</text></svg>')
        replace_mermaid_svgs(t)
        assert "<svg" in t.serialize()


class TestOnlyTextAndBase64:
    def test_only_text_flattens_inline(self):
        t = _ser("<p><b>bold <i>nested</i></b> tail</p>")
        strip_to_text(t)
        s = t.serialize()
        assert "<b>" not in s and "<span>bold nested</span>" in s

    def test_base64_src_cleared(self):
        t = _ser('<img src="data:image/png;base64,AAAA" alt="x"><img src="/k.png">')
        clean_base64_images(t)
        s = t.serialize()
        assert "base64" not in s and '/k.png' in s


class TestSubsetContent:
    HTML = (
        '<body><article id="a"><p>art text</p></article>'
        '<div class="side"><p>side text</p></div></body>'
    )

    def test_css_selector_wraps_copies(self):
        t = _ser(self.HTML)
        content = subset_content(t, css_selector="#a")
        s = content.serialize()
        assert s.startswith("<div>") and "art text" in s and "side text" not in s

    def test_css_selector_no_match_falls_back(self):
        t = _ser(self.HTML)
        content = subset_content(t, css_selector="#nope")
        assert content is t

    def test_target_elements(self):
        t = _ser(self.HTML)
        content = subset_content(t, target_elements=[".side"])
        s = content.serialize()
        assert "side text" in s and "art text" not in s

    def test_copies_isolated_from_later_mutation(self):
        t = _ser(self.HTML)
        content = subset_content(t, css_selector="#a")
        remove_unwanted_attributes(t)
        # copy retains id even though tree was pruned afterwards
        assert 'id="a"' in content.serialize()

    def test_clone_deep(self):
        t = _ser("<div><p>x<span>y</span></p></div>")
        node = next(t.iter("div"))
        dup = clone_node(node)
        node.remove_children(lambda n: True)
        assert "y" in dup.text_content()


class TestScrapeOptions:
    PAGE = (
        '<html><head><title>T</title></head><body>'
        '<article><p>real words here</p>'
        '<a href="https://ads.example.net/z">ad link</a>'
        '<a href="/keep">keep</a></article>'
        '<div class="promo"><p>promo text</p></div>'
        "</body></html>"
    )

    def test_excluded_selector_removes(self):
        r = scrape_page("https://s.example.com/p", self.PAGE, excluded_selector=".promo")
        assert "promo text" not in r["cleaned_html"]
        assert "real words" in r["cleaned_html"]

    def test_exclude_external_links_deletes_anchor(self):
        r = scrape_page(
            "https://s.example.com/p", self.PAGE, exclude_external_links=True
        )
        assert "ad link" not in r["cleaned_html"]
        assert r["links_external"] == []
        assert any(l["href"].endswith("/keep") for l in r["links_internal"])

    def test_css_selector_subsets_cleaned_html(self):
        r = scrape_page("https://s.example.com/p", self.PAGE, css_selector="article")
        assert "promo text" not in r["cleaned_html"]
        # link walk still sees the whole page
        assert len(r["links_external"]) == 1

    def test_only_text_mode(self):
        page = "<body><p>a <b>bold</b> c</p></body>"
        r = scrape_page("https://s.example.com/p", page, only_text=True)
        assert "<b>" not in r["cleaned_html"]

    def test_image_variants_and_picture(self):
        page = (
            "<body><p>words words words</p><picture>"
            '<source srcset="/img/l.webp 900w">'
            '<img src="/img/m.webp" alt="big thing" width="400" height="300" '
            'srcset="/img/m-2x.webp 2x" data-lazy-src="http://cdn.example.com/m.webp">'
            "</picture></body>"
        )
        r = scrape_page("https://s.example.com/p", page)
        srcs = {i["src"] for i in r["images"]}
        assert srcs == {
            "/img/m.webp", "/img/m-2x.webp", "/img/l.webp",
            "http://cdn.example.com/m.webp",
        }
        widths = {i["src"]: i["width"] for i in r["images"]}
        assert widths["/img/l.webp"] == "900"
        assert all(i["group_id"] == 0 for i in r["images"])
        assert all(i["format"] == "webp" for i in r["images"])

    def test_icon_image_skipped(self):
        page = '<body><img src="/logo-icon.png" alt="brand"><p>w</p></body>'
        r = scrape_page("https://s.example.com/p", page)
        assert r["images"] == []

    def test_video_sources_expand(self):
        page = '<body><video src="/v.mp4"><source src="/v.webm"></video></body>'
        r = scrape_page("https://s.example.com/p", page)
        assert [v["src"] for v in r["videos"]] == ["/v.mp4", "/v.webm"]
