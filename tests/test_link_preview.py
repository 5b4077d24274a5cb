"""LinkPreview parity: filter chain, BM25Okapi scoring chain,
total-score blending, threshold/ordering semantics.

Reference spec: crawl4ai/link_preview.py (filter + merge),
async_url_seeder.py:592-755 + 1466-1755 (head extraction, text
context, BM25Okapi + min-max normalize, URL fallback),
utils.py:3459-3506 (calculate_total_score).
"""

import math

import pytest

from crawl4ai_ray.functions.bm25 import (
    bm25_okapi_scores,
    bm25_relevance,
    minmax_normalize,
)
from crawl4ai_ray.functions.page_utils import calculate_total_score
from crawl4ai_ray.pipelines.link_preview import (
    LinkPreviewConfig,
    ScorePage,
    extract_text_context,
    filter_link_urls,
    is_nonsense_url,
    url_relevance_score,
)


class TestConfig:
    def test_defaults(self):
        cfg = LinkPreviewConfig()
        assert cfg.include_internal and not cfg.include_external
        assert cfg.max_links == 100 and cfg.concurrency == 10 and cfg.timeout == 5

    @pytest.mark.parametrize(
        "kwargs",
        [
            {"concurrency": 0},
            {"timeout": 0},
            {"max_links": 0},
            {"score_threshold": 1.5},
            {"score_threshold": -0.1},
            {"include_internal": False, "include_external": False},
        ],
    )
    def test_validation(self, kwargs):
        with pytest.raises(ValueError):
            LinkPreviewConfig(**kwargs)


class TestFilterLinks:
    INT = ["https://a.com/1", "https://a.com/2", "https://a.com/3"]
    EXT = ["https://b.org/x", "https://c.net/y"]

    def test_internal_only_default(self):
        cfg = LinkPreviewConfig()
        assert filter_link_urls(self.INT, self.EXT, cfg) == self.INT

    def test_include_external_appends(self):
        cfg = LinkPreviewConfig(include_external=True)
        assert filter_link_urls(self.INT, self.EXT, cfg) == self.INT + self.EXT

    def test_patterns(self):
        cfg = LinkPreviewConfig(
            include_external=True,
            include_patterns=["https://*"],
            exclude_patterns=["*b.org*"],
        )
        out = filter_link_urls(self.INT, self.EXT, cfg)
        assert out == self.INT + ["https://c.net/y"]

    def test_truncate_before_dedup(self):
        # reference truncates max_links FIRST, then dedups
        # (link_preview.py:158-176): with dups inside the window the
        # final list is shorter than max_links
        urls = ["u1", "u1", "u2", "u3"]
        cfg = LinkPreviewConfig(max_links=3)
        assert filter_link_urls(urls, [], cfg) == ["u1", "u2"]

    def test_empty_hrefs_skipped(self):
        cfg = LinkPreviewConfig()
        assert filter_link_urls(["", "https://a.com/1"], [], cfg) == ["https://a.com/1"]


class TestNonsense:
    @pytest.mark.parametrize(
        "url,bad",
        [
            ("https://a.com/robots.txt", True),
            ("https://a.com/sitemap.xml", True),
            ("https://a.com/sitemaps/news.xml.gz", True),
            ("https://a.com/favicon.ico", True),
            ("https://a.com/.well-known/security.txt", True),
            ("https://a.com/page/1", False),
            ("https://a.com/docs/sitemap-guide", False),
        ],
    )
    def test_cases(self, url, bad):
        assert is_nonsense_url(url) is bad


class TestBM25:
    def test_hand_computed_single_doc_pair(self):
        # two docs, query term in exactly one: df=1, N=2 ->
        # idf = ln(2-1+0.5) - ln(1.5) = 0 -> scores all 0 -> minmax 0.5
        docs = ["alpha beta", "gamma delta"]
        assert bm25_relevance("alpha", docs) == [0.5, 0.5]

    def test_hand_computed_three_docs(self):
        # N=3, df=1 -> idf = ln(2.5) - ln(1.5) > 0; doc lengths equal
        # so denominators equal; only doc0 has tf=1
        docs = ["alpha beta", "gamma delta", "epsilon zeta"]
        idf = math.log(2.5) - math.log(1.5)
        raw = bm25_okapi_scores(["alpha"], [d.split() for d in docs])
        expected0 = idf * (1 * 2.5 / (1 + 1.5 * (0.25 + 0.75 * 2 / 2)))
        assert raw[0] == pytest.approx(expected0, rel=1e-12)
        assert raw[1] == 0.0 and raw[2] == 0.0
        norm = minmax_normalize(raw)
        assert norm == [1.0, 0.0, 0.0]

    def test_epsilon_floor_for_common_terms(self):
        # term in every doc -> idf negative -> floored to
        # 0.25 * average_idf (rank_bm25 BM25Okapi semantics)
        docs = [["the", "a"], ["the", "b"], ["the", "c"]]
        n = 3
        idfs = {}
        for w, df in {"the": 3, "a": 1, "b": 1, "c": 1}.items():
            idfs[w] = math.log(n - df + 0.5) - math.log(df + 0.5)
        avg = sum(idfs.values()) / len(idfs)
        eps = 0.25 * avg
        raw = bm25_okapi_scores(["the"], docs)
        expected = eps * (1 * 2.5 / (1 + 1.5 * (0.25 + 0.75 * 2 / 2)))
        assert all(abs(s - expected) < 1e-12 for s in raw)

    def test_absent_term_scores_zero(self):
        assert list(bm25_okapi_scores(["zz"], [["a"], ["b"]])) == [0.0, 0.0]

    def test_empty_inputs(self):
        assert bm25_relevance("", ["a"]) == [0.0]
        assert bm25_relevance("q", []) == []
        assert bm25_relevance("q", ["", ""]) == [0.0, 0.0]

    def test_minmax(self):
        assert minmax_normalize([2.0, 1.0, 3.0]) == [0.5, 0.0, 1.0]
        assert minmax_normalize([1.0, 1.0]) == [0.5, 0.5]
        assert minmax_normalize([]) == []


class TestUrlRelevanceFallback:
    def test_exact_part_match_dominates(self):
        s = url_relevance_score("docs", "https://a.com/docs/intro")
        assert 0.5 < s <= 1.0

    def test_no_match_low(self):
        s = url_relevance_score("qqq", "https://a.com/x/y")
        assert 0.0 <= s < 0.3

    def test_capped_at_one(self):
        assert url_relevance_score("a", "https://a.a/a?a=a") <= 1.0


class TestTextContext:
    def test_field_order_and_join(self):
        head = {
            "title": "T",
            "meta": {
                "description": "D",
                "keywords": "K",
                "og:title": "OT",
                "og:site_name": "OS",
                "twitter:title": "TT",
            },
        }
        assert extract_text_context(head) == "T D K OT OS TT"

    def test_empty_fields_skipped(self):
        assert extract_text_context({"title": "", "meta": {"description": ""}}) == ""


class TestTotalScore:
    def test_disabled_neutral(self):
        assert calculate_total_score(9.0, 0.9, False, True) == 5.0

    def test_intrinsic_only(self):
        assert calculate_total_score(7.0, None, True, True) == 7.0
        assert calculate_total_score(12.0, None, True, False) == 10.0
        assert calculate_total_score(None, None, True, False) == 0.0

    def test_blend(self):
        # 0.7*6 + 0.3*min(0.5*10,10) = 4.2 + 1.5
        assert calculate_total_score(6.0, 0.5, True, True) == pytest.approx(5.7)

    def test_contextual_scaled_capped(self):
        assert calculate_total_score(0.0, 2.0, True, True) == pytest.approx(3.0)


def _mk_group(rows):
    import pyarrow as pa

    schema = pa.schema(
        [
            ("page_url", pa.string()),
            ("href", pa.string()),
            ("is_internal", pa.bool_()),
            ("pos", pa.int64()),
            ("text", pa.string()),
            ("title_attr", pa.string()),
            ("intrinsic_score", pa.float64()),
            ("selected", pa.bool_()),
            ("head_status", pa.string()),
            ("head_title", pa.string()),
            ("head_ctx", pa.string()),
        ]
    )
    defaults = {
        "page_url": "p", "text": "", "title_attr": "", "intrinsic_score": 0.0,
        "selected": True, "head_status": "valid", "head_title": "t",
        "is_internal": True,
    }
    full = [{**defaults, **r} for r in rows]
    return pa.Table.from_pylist(full, schema=schema)


class TestScorePage:
    def test_relevance_ordering_stable(self):
        cfg = LinkPreviewConfig(query="alpha")
        g = _mk_group(
            [
                {"href": "u0", "pos": 0, "head_ctx": "beta beta"},
                {"href": "u1", "pos": 1, "head_ctx": "alpha x"},
                {"href": "u2", "pos": 2, "head_ctx": "beta gamma"},
            ]
        )
        out = ScorePage(cfg, True)(g).to_pylist()
        # u1 carries the only tf>0 -> contextual 1.0 -> first; ties
        # (u0, u2 both 0.0) keep original order (stable sort)
        assert [r["href"] for r in out] == ["u1", "u0", "u2"]
        assert [r["rank"] for r in out] == [0, 1, 2]
        assert out[0]["contextual_score"] == 1.0

    def test_no_query_keeps_original_order(self):
        cfg = LinkPreviewConfig()
        g = _mk_group(
            [
                {"href": "u1", "pos": 1},
                {"href": "u0", "pos": 0},
                {"href": "e0", "pos": 0, "is_internal": False},
            ]
        )
        out = ScorePage(cfg, True)(g).to_pylist()
        assert [r["href"] for r in out] == ["u0", "u1", "e0"]
        assert all(r["contextual_score"] is None for r in out)

    def test_threshold_drops_head_not_link(self):
        cfg = LinkPreviewConfig(query="alpha", score_threshold=0.9)
        # 3 docs so df=1 < N/2 -> idf > 0 -> only u0 scores, minmax
        # gives [1.0, 0.0, 0.0]
        g = _mk_group(
            [
                {"href": "u0", "pos": 0, "head_ctx": "alpha", "intrinsic_score": 6.0},
                {"href": "u1", "pos": 1, "head_ctx": "beta", "intrinsic_score": 6.0},
                {"href": "u2", "pos": 2, "head_ctx": "gamma", "intrinsic_score": 6.0},
            ]
        )
        out = {r["href"]: r for r in ScorePage(cfg, True)(g).to_pylist()}
        # u0 normalized to 1.0 (max) -> kept; u1/u2 0.0 < 0.9 -> head
        # dropped, link kept with intrinsic-only total
        assert out["u0"]["head_status"] == "valid"
        assert out["u0"]["contextual_score"] == 1.0
        assert out["u1"]["head_status"] is None
        assert out["u1"]["contextual_score"] is None
        assert out["u1"]["total_score"] == 6.0

    def test_url_fallback_for_ctxless_valid_head(self):
        cfg = LinkPreviewConfig(query="docs")
        g = _mk_group(
            [
                {"href": "https://a.com/docs/x", "pos": 0, "head_ctx": ""},
                {"href": "https://a.com/other", "pos": 1, "head_ctx": "docs docs"},
            ]
        )
        out = {r["href"]: r for r in ScorePage(cfg, True)(g).to_pylist()}
        fb = out["https://a.com/docs/x"]["contextual_score"]
        assert fb == pytest.approx(
            url_relevance_score("docs", "https://a.com/docs/x")
        )
        # single-doc BM25 set -> min==max -> 0.5
        assert out["https://a.com/other"]["contextual_score"] == 0.5

    def test_score_links_disabled_neutral_totals(self):
        cfg = LinkPreviewConfig()
        g = _mk_group([{"href": "u0", "pos": 0, "intrinsic_score": 8.0}])
        out = ScorePage(cfg, False)(g).to_pylist()
        assert out[0]["total_score"] == 5.0


@pytest.mark.usefixtures("ray_session")
class TestEndToEnd:
    def test_unscored_pipeline_shape(self, small_corpus):
        from crawl4ai_ray.pipelines.link_preview import (
            LinkPreviewConfig,
            link_preview_dataset,
        )

        cfg = LinkPreviewConfig(
            include_internal=True,
            include_external=True,
            include_patterns=["https://*"],
            exclude_patterns=["*.external.org/*"],
            max_links=4,
        )
        df = (
            link_preview_dataset(
                "/root/testdata/sf0.001", cfg, corpus_dir=small_corpus
            )
            .to_pandas()
        )
        page = df[df.page_url == "https://site-0.example.com/page/0"].sort_values("rank")
        # page 0: 2 internal links + js/mailto/cdn externals
        assert list(page.is_internal) == [True, True, False, False, False]
        # selected internals got corpus heads
        assert list(page.head_status)[:2] == ["valid", "valid"]
        assert page.head_title.iloc[0].startswith("Document ")
        # pattern-excluded externals got none
        assert page.head_status.iloc[2:].isna().all()
        # unscored -> rank preserves original order
        assert list(page["rank"]) == [0, 1, 2, 3, 4]
