"""Content-filter behavior modeled on the reference's offline suites
(tests/async/test_content_filter_prune.py, test_content_filter_bm25.py)."""

from crawl4ai_ray.functions.htmlparse import parse_html
from crawl4ai_ray.functions.markdown import generate_markdown
from crawl4ai_ray.stages.content_filters import (
    BM25ContentFilter,
    BM25Okapi,
    PruningContentFilter,
    clean_tokens,
)

PAGE = """
<html><head>
<title>Machine Learning Guide</title>
<meta name="description" content="A practical guide to machine learning models">
</head><body>
<nav><a href="/">Home</a><a href="/about">About</a></nav>
<article>
<h1>Machine Learning Guide</h1>
<p>Machine learning models learn patterns from large training datasets.
This long paragraph explains gradient descent, regularization and
model evaluation in enough words to carry strong text density through
the pruning score so it must clearly survive filtering here.</p>
</article>
<div class="sidebar"><a href="/x">x</a><a href="/y">y</a><a href="/z">z</a></div>
<div class="social"><a href="/share">share</a></div>
<footer>Copyright</footer>
</body></html>
"""


class TestPruning:
    def test_quality_paragraph_survives(self):
        blocks = PruningContentFilter().filter_content(PAGE)
        joined = " ".join(blocks)
        assert "gradient descent" in joined

    def test_boilerplate_removed(self):
        blocks = PruningContentFilter().filter_content(PAGE)
        joined = " ".join(blocks)
        assert "Home" not in joined  # nav excluded outright
        assert "Copyright" not in joined  # footer excluded
        assert "share" not in joined  # link-only social div pruned

    def test_preserve_whitelist(self):
        # reference regression test_pruning_preserve_whitelist_1900
        f = PruningContentFilter(preserve_classes=["sidebar"])
        joined = " ".join(f.filter_content(PAGE))
        assert '"sidebar"' in joined or "sidebar" in joined

    def test_min_word_threshold(self):
        html = "<body><p>short</p><p>%s</p></body>" % ("word " * 60)
        blocks = PruningContentFilter(min_word_threshold=10).filter_content(html)
        joined = " ".join(blocks)
        assert "short" not in joined
        assert "word" in joined

    def test_empty_input(self):
        assert PruningContentFilter().filter_content("") == []
        assert PruningContentFilter().filter_content(None) == []

    def test_dynamic_threshold_runs(self):
        blocks = PruningContentFilter(threshold_type="dynamic").filter_content(PAGE)
        assert any("gradient" in b for b in blocks)

    def test_fit_markdown_integration(self):
        md = generate_markdown(PAGE, content_filter=PruningContentFilter())
        assert "gradient descent" in md.fit_markdown
        assert "Home" not in md.fit_markdown
        assert md.fit_html.startswith("<div>")


class TestBM25:
    def test_relevant_chunk_selected(self):
        f = BM25ContentFilter(user_query="machine learning models", bm25_threshold=0.1)
        blocks = f.filter_content(PAGE)
        assert any("learn patterns" in b for b in blocks)

    def test_irrelevant_dropped(self):
        html = """
        <body><h1>Cooking pasta</h1>
        <p>Machine learning models learn patterns from training data today.</p>
        <p>Boil water with salt and add the spaghetti for nine minutes.</p>
        </body>"""
        f = BM25ContentFilter(user_query="machine learning", bm25_threshold=0.5)
        blocks = f.filter_content(html)
        joined = " ".join(blocks)
        assert "learn patterns" in joined
        assert "spaghetti" not in joined

    def test_metadata_query_fallback(self):
        f = BM25ContentFilter(bm25_threshold=0.01)
        blocks = f.filter_content(PAGE)
        assert blocks  # title+meta provide the query

    def test_dedup_keep_first(self):
        # reference regression test_issue_1213_bm25_dedup
        html = """
        <body><h1>other headline</h1>
        <p>alpha beta gamma delta content block</p>
        <div><p>alpha beta gamma delta content block</p></div>
        <p>unrelated filler text paragraph here</p>
        <p>more unrelated filler text content</p>
        </body>"""
        f = BM25ContentFilter(user_query="alpha beta", bm25_threshold=0.01)
        blocks = f.filter_content(html)
        texts = [parse_html(b).text_content() for b in blocks]
        assert len([t for t in texts if "alpha beta gamma delta" in t]) == 1

    def test_doc_order_preserved(self):
        html = """
        <body>
        <p>zebra query match first zebra zebra</p>
        <p>middle unrelated text block entirely</p>
        <p>zebra query match second zebra zebra</p>
        </body>"""
        f = BM25ContentFilter(user_query="zebra", bm25_threshold=0.01)
        blocks = f.filter_content(html)
        first = next(i for i, b in enumerate(blocks) if "first" in b)
        second = next(i for i, b in enumerate(blocks) if "second" in b)
        assert first < second


class TestBM25Okapi:
    def test_scoring_sanity(self):
        corpus = [["cat", "dog"], ["cat", "cat", "cat"], ["fish"]]
        bm = BM25Okapi(corpus)
        scores = bm.get_scores(["cat"])
        assert scores[1] > scores[0] > scores[2] == 0.0

    def test_epsilon_floor(self):
        # a term in every doc gets negative raw idf -> epsilon * avg
        corpus = [["common", "a%d" % i] for i in range(10)]
        bm = BM25Okapi(corpus)
        assert bm.idf["common"] > 0


class TestCleanTokens:
    def test_removes_stopwords_and_short(self):
        toks = clean_tokens(["the", "machine", "of", "ml", "learning", "↑up"])
        assert toks == ["machine", "learning"]
