"""Branch-covering HTML fixtures for markdown byte-parity goldens.

Each fixture exercises a specific behavior of the reference's vendored
html2text engine (crawl4ai/html2text/__init__.py) under the crawl4ai
default options.  The golden outputs in ``markdown_goldens.parquet``
are generated from the *reference engine itself*
(``gen_markdown_goldens.py``, run in an environment where
/root/reference is present) and committed; tests and the
``markdown_parity`` driver query compare this repo's engine against
them byte-for-byte.

Fixture ids are stable — appending is fine, renaming/reordering means
regenerating goldens.
"""

from __future__ import annotations

BASEURL = "https://fixtures.example/docs/page.html"

# (id, html) — converted with baseurl=BASEURL unless the id ends with
# "/nobase", in which case baseurl="".
FIXTURES: list[tuple[str, str]] = [
    # --- headings -------------------------------------------------------
    ("h/levels", "<h1>One</h1><h2>Two</h2><h3>Three</h3><h4>Four</h4><h5>Five</h5><h6>Six</h6>"),
    ("h/inline-marks", "<h2>Mid <b>bold</b> and <em>em</em> end</h2>"),
    ("h/inside-anchor", '<a href="/x"><h2>Linked heading</h2></a>'),
    ("h/anchor-inside", '<h2><a href="/x">text</a> tail</h2>'),
    ("h/h7-not-heading", "<h7>not a heading</h7><p>after</p>"),
    # --- paragraphs / divs / whitespace --------------------------------
    ("p/two", "<p>First para.</p><p>Second para.</p>"),
    ("p/div-soup", "<div>a<div>b</div><div><div>c</div>d</div></div>"),
    ("p/whitespace-collapse", "<p>  lots\n of\t\t whitespace  </p>"),
    ("p/leading-trailing", "  stray text  <p> padded </p>  tail  "),
    ("p/nested-p-div", "<div><p>inner para</p>trailing div text</div>"),
    ("p/empty-paras", "<p></p><p>real</p><p>  </p><p>next</p>"),
    # --- line breaks / hr ----------------------------------------------
    ("br/simple", "<p>line one<br>line two<br/>line three</p>"),
    ("br/in-blockquote", "<blockquote>quoted<br>second line</blockquote>"),
    ("hr/between", "<p>above</p><hr><p>below</p>"),
    # --- blockquotes ----------------------------------------------------
    ("bq/simple", "<blockquote><p>quoted para</p></blockquote>"),
    ("bq/nested", "<blockquote>outer<blockquote>inner</blockquote>tail</blockquote>"),
    ("bq/multi-para", "<blockquote><p>one</p><p>two</p></blockquote><p>after</p>"),
    ("bq/bare-text", "<blockquote>bare quoted text</blockquote>"),
    # --- emphasis -------------------------------------------------------
    ("em/basic", "<p>a <em>em</em> b <i>i</i> c <u>u</u> d</p>"),
    ("em/strong", "<p>a <strong>strong</strong> b <b>b</b> c</p>"),
    ("em/strike", "<p>a <del>del</del> b <strike>strike</strike> c <s>s</s> d</p>"),
    ("em/tight-join", "<p>foo<em>bar</em>baz</p>"),
    ("em/tight-strong", "<p>foo<b>bar</b>baz</p>"),
    ("em/star-adjacent", "<p>*<b>starred</b></p>"),
    ("em/tilde-adjacent", "<p>~<del>struck</del></p>"),
    ("em/space-inside", "<p>a <em> padded </em> b</p>"),
    ("em/empty", "<p>a <b></b> b <em></em> c</p>"),
    ("em/nested", "<p><b><i>both</i></b> plain</p>"),
    ("em/punct-join", "<p>end.<em>next</em></p>"),
    ("em/after-stressed-punct", "<p><b>bold</b>, tail</p>"),
    ("em/after-stressed-word", "<p><b>bold</b>tail</p>"),
    ("em/after-stressed-bracket", "<p><b>bold</b>(paren)</p>"),
    # --- inline code / kbd / tt ----------------------------------------
    ("code/inline", "<p>run <code>ls -la</code> now</p>"),
    ("code/newline-inside", "<p>x <code>a\nb</code> y</p>"),
    ("code/kbd-tt", "<p>press <kbd>Ctrl</kbd> in <tt>term</tt></p>"),
    ("code/in-link", '<p><a href="/api"><code>fn()</code></a></p>'),
    ("code/specials", "<p><code>a*b_c`d</code></p>"),
    # --- pre / fences ---------------------------------------------------
    ("pre/plain", "<pre>line1\nline2\n  indented</pre>"),
    ("pre/language", '<pre data-language="python">def f():\n    return 1</pre>'),
    ("pre/with-code-tag", '<pre><code class="language-js">const x = 1;\nlet y;</code></pre>'),
    ("pre/entities", "<pre>a &lt; b &amp;&amp; c &gt; d</pre>"),
    ("pre/specials-raw", "<pre>*not em* [not link](x)</pre>"),
    ("pre/between-paras", "<p>before</p><pre>code here</pre><p>after</p>"),
    ("pre/inline-marks-inside", "<pre>plain <b>bold?</b> tail</pre>"),
    ("pre/in-list", "<ul><li>item<pre>code\nblock</pre></li></ul>"),
    # --- lists ----------------------------------------------------------
    ("list/ul", "<ul><li>one</li><li>two</li><li>three</li></ul>"),
    ("list/ol", "<ol><li>first</li><li>second</li></ol>"),
    ("list/ol-start", '<ol start="5"><li>five</li><li>six</li></ol>'),
    ("list/ol-start-bad", '<ol start="x"><li>one</li></ol>'),
    ("list/nested-ul", "<ul><li>a<ul><li>a1</li><li>a2</li></ul></li><li>b</li></ul>"),
    ("list/ul-in-ol", "<ol><li>a<ul><li>bullet</li></ul></li><li>b</li></ol>"),
    ("list/ol-in-ul", "<ul><li>a<ol><li>num</li></ol></li></ul>"),
    ("list/deep", "<ul><li>1<ul><li>2<ul><li>3</li></ul></li></ul></li></ul>"),
    ("list/li-with-p", "<ul><li><p>para in item</p></li><li>plain</li></ul>"),
    ("list/adjacent", "<ul><li>a</li></ul><ul><li>b</li></ul>"),
    ("list/after-para", "<p>intro:</p><ul><li>x</li></ul><p>outro</p>"),
    ("list/li-inline", "<ul><li>has <b>bold</b> and <a href='/l'>link</a></li></ul>"),
    ("list/bare-li", "<li>orphan item</li>"),
    ("list/empty-li", "<ul><li></li><li>real</li></ul>"),
    # --- definition lists ----------------------------------------------
    ("dl/basic", "<dl><dt>Term</dt><dd>Definition</dd><dt>T2</dt><dd>D2</dd></dl>"),
    ("dl/multi-dd", "<dl><dt>Term</dt><dd>one</dd><dd>two</dd></dl>"),
    # --- links ----------------------------------------------------------
    ("a/relative", '<p>see <a href="/other">other</a></p>'),
    ("a/relative/nobase", '<p>see <a href="/other">other</a></p>'),
    ("a/absolute", '<p><a href="https://ext.example/x">ext</a></p>'),
    ("a/title", '<p><a href="/x" title="The Title">text</a></p>'),
    ("a/title-empty", '<p><a href="/x" title="">text</a></p>'),
    ("a/title-specials", '<p><a href="/x" title="a (b) [c]">text</a></p>'),
    ("a/mailto", '<p><a href="mailto:a@b.c">mail me</a></p>'),
    ("a/internal", '<p><a href="#frag">frag link</a></p>'),
    ("a/automatic", '<p><a href="https://auto.example/x">https://auto.example/x</a></p>'),
    ("a/automatic-relative", '<p><a href="/x">/x</a></p>'),
    ("a/empty", '<p><a href="/x"></a>after</p>'),
    ("a/no-href", "<p><a>plain anchor</a></p>"),
    ("a/href-empty", '<p><a href="">empty href</a></p>'),
    ("a/img-inside", '<p><a href="/target"><img src="/i.png" alt="pic"></a></p>'),
    ("a/img-no-alt-inside", '<p><a href="/target"><img src="/i.png"></a></p>'),
    ("a/b-first", '<p><a href="/x"><b>bold link</b></a></p>'),
    ("a/span-first", '<p><a href="/x"><span>span link</span></a></p>'),
    ("a/url-specials", '<p><a href="/pa(th)_x">odd url</a></p>'),
    ("a/duplicate", '<p><a href="/same">one</a> and <a href="/same">two</a></p>'),
    ("a/nested-brackets", '<p><a href="/x">text [with] brackets</a></p>'),
    ("a/query-fragment", '<p><a href="/x?a=1&amp;b=2#frag">q</a></p>'),
    # --- images ---------------------------------------------------------
    ("img/basic", '<p><img src="/img.png" alt="An image"></p>'),
    ("img/no-alt", '<p><img src="/img.png"></p>'),
    ("img/no-src", "<p><img alt='lost'></p>"),
    ("img/alt-specials", '<p><img src="/i.png" alt="a [b] (c)"></p>'),
    ("img/between-text", '<p>before <img src="rel.jpg" alt="x"> after</p>'),
    ("img/nobase", '<p><img src="rel.jpg" alt="x"></p>'),
    # --- tables ---------------------------------------------------------
    ("table/basic", "<table><tr><th>H1</th><th>H2</th></tr><tr><td>a</td><td>b</td></tr></table>"),
    ("table/thead-tbody", "<table><thead><tr><th>A</th><th>B</th></tr></thead><tbody><tr><td>1</td><td>2</td></tr><tr><td>3</td><td>4</td></tr></tbody></table>"),
    ("table/caption", "<table><caption>Cap</caption><tr><th>H</th></tr><tr><td>v</td></tr></table>"),
    ("table/single-row", "<table><tr><td>only</td><td>row</td></tr></table>"),
    ("table/empty", "<table></table><p>after</p>"),
    ("table/ragged", "<table><tr><th>A</th><th>B</th><th>C</th></tr><tr><td>1</td></tr></table>"),
    ("table/inline-in-cell", "<table><tr><th>H</th></tr><tr><td><b>bold</b> cell</td></tr></table>"),
    ("table/link-in-cell", '<table><tr><th>H</th></tr><tr><td><a href="/c">cell link</a></td></tr></table>'),
    ("table/between-paras", "<p>pre</p><table><tr><td>x</td></tr></table><p>post</p>"),
    ("table/p-in-cell", "<table><tr><td><p>para cell</p></td></tr></table>"),
    # --- q / abbr -------------------------------------------------------
    ("q/simple", "<p>He said <q>hi</q> loudly</p>"),
    ("q/nested", "<p><q>outer <q>inner</q> tail</q></p>"),
    ("abbr/titled", '<p>The <abbr title="World Health Organization">WHO</abbr> says</p>'),
    ("abbr/untitled", "<p>An <abbr>abbr</abbr> here</p>"),
    # --- entities -------------------------------------------------------
    ("ent/named", "<p>A &amp; B &lt; C &gt; D &quot;q&quot;</p>"),
    ("ent/typographic", "<p>&ldquo;x&rdquo; &mdash; &ndash; &rsquo; &copy; &rarr;</p>"),
    ("ent/nbsp", "<p>a&nbsp;&nbsp;b</p>"),
    ("ent/numeric", "<p>&#8212; &#x2014; &#65; &#x41;</p>"),
    ("ent/numeric-nbsp", "<p>a&#160;b</p>"),
    ("ent/accents", "<p>caf&eacute; na&iuml;ve &auml;</p>"),
    ("ent/unknown", "<p>&bogus; stays</p>"),
    ("ent/invalid-numeric", "<p>x&#1114112;y</p>"),
    ("ent/lrm", "<p>a&lrm;b&rlm;c</p>"),
    ("ent/star-charref", "<p>&#42;not bold&#42;</p>"),
    # --- escaping -------------------------------------------------------
    ("esc/backslash", "<p>path\\to\\[file]</p>"),
    ("esc/backslash-plain", "<p>back\\slash no special</p>"),
    ("esc/md-chars-kept", "<p>1. not a list *star* _under_ # hash</p>"),
    ("esc/brackets", "<p>[not](a-link)</p>"),
    # --- head / scripts / styles / comments ----------------------------
    ("quiet/head-title", "<html><head><title>T</title><style>p{color:red}</style></head><body><p>visible</p></body></html>"),
    ("quiet/script", "<p>a</p><script>var x = '<b>no</b>';</script><p>b</p>"),
    ("quiet/style-mid", "<p>a</p><style>.x{a:b}</style><p>b</p>"),
    ("quiet/comment", "<p>a<!-- hidden -->b</p>"),
    ("quiet/unclosed-head", "<html><head><title>T</title><body><p>body text</p></body></html>"),
    # --- base tag -------------------------------------------------------
    ("base/override", '<html><head><base href="https://based.example/sub/"></head><body><p><a href="x.html">rel</a></p></body></html>'),
    ("base/img", '<html><head><base href="https://based.example/sub/"></head><body><img src="i.png" alt="a"></body></html>'),
    # --- malformed html -------------------------------------------------
    ("bad/unclosed-b", "<p>a <b>bold rest</p><p>next</p>"),
    ("bad/stray-close", "<p>a</div> b</p>"),
    ("bad/unquoted-attrs", "<p><a href=/x title=hi>t</a></p>"),
    ("bad/mismatched-nest", "<b><i>both</b></i> tail"),
    ("bad/li-no-ul", "<li>a</li><li>b</li>"),
    ("bad/double-open", "<p><p>double</p>"),
    # --- sup/sub (off by default) --------------------------------------
    ("supsub/default", "<p>x<sup>2</sup> and y<sub>i</sub></p>"),
    # --- mixed real-page shapes ----------------------------------------
    (
        "page/article",
        '<html><head><title>Article</title><meta name="description" content="d">'
        "</head><body><nav><a href='/home'>Home</a> | <a href='/about'>About</a></nav>"
        "<article><h1>Main Title</h1><p>Lead paragraph with <b>bold</b> and "
        '<a href="/ref1">a reference</a>.</p><h2>Section</h2><p>Body text &amp; more.</p>'
        "<ul><li>point one</li><li>point two</li></ul>"
        '<pre data-language="py">x = 1</pre>'
        "<blockquote>A quote.</blockquote></article>"
        "<footer>(C) 2026 <a href='/legal'>Legal</a></footer></body></html>",
    ),
    (
        "page/table-heavy",
        "<body><h1>Data</h1><table><thead><tr><th>Name</th><th>Qty</th></tr></thead>"
        "<tbody><tr><td>alpha</td><td>3</td></tr><tr><td>beta</td><td>5</td></tr></tbody>"
        "</table><p>Notes follow.</p></body>",
    ),
    (
        "page/links-images",
        '<body><p>Gallery: <img src="/a.png" alt="A"> and <img src="/b.png" alt="B">.</p>'
        '<p>More at <a href="https://deep.example/gallery">https://deep.example/gallery</a>'
        ' or <a href="/local" title="local gallery">here</a>.</p></body>',
    ),
]


def _corpus_page_fixtures() -> list[tuple[str, str]]:
    """Full corpus-template pages (sources/corpus.py page_html) with
    fixed sample text — proves byte parity on the exact page shape the
    crawl pipeline processes, not just hand-picked snippets. Page ids
    chosen to hit every corpus feature gate (base-href, dup links,
    pre/code, mermaid, picture, comments, forms, base64, malformed
    tail, co.uk link, table)."""
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    )
    from crawl4ai_ray.sources.corpus import page_html

    text = (
        "First paragraph with enough words to look real & some specials: "
        "a*b, [brackets], (parens), back\\slash.\n\n"
        "Second paragraph — em dash, 'quotes', café.\n\n"
        "Third short one."
    )
    gate_pages = [0, 18, 23, 20, 61, 29, 37, 41, 74, 160, 49]
    return [
        (f"corpus/p{p}", page_html(p, text, "en", 2000)) for p in gate_pages
    ]


FIXTURES.extend(_corpus_page_fixtures())


def fixture_baseurl(fixture_id: str) -> str:
    if fixture_id.startswith("corpus/p"):
        from crawl4ai_ray.sources.corpus import page_url

        return page_url(int(fixture_id.split("corpus/p")[1]))
    return "" if fixture_id.endswith("/nobase") else BASEURL
