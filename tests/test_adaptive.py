"""Adaptive crawler (statistical strategy) — scoring formulas, stop
criteria, digest loop, state persistence."""

import pytest

from crawl4ai_ray.pipelines.adaptive import (
    AdaptiveConfig,
    AdaptiveCrawler,
    AdaptiveState,
    StatisticalScorer,
    tokenize,
)

SF = "/root/testdata/sf0.001"


class TestScoring:
    def _state_with_docs(self, docs, query="alpha beta"):
        st = AdaptiveState(query=query)
        sc = StatisticalScorer()
        sc.update_state(
            st, [{"url": f"u{i}", "markdown": d, "links": []} for i, d in enumerate(docs)]
        )
        return st, sc

    def test_tokenize_reference_semantics(self):
        assert tokenize("Hello, world! a an the big-dog") == [
            "Hello",
            "world",
            "the",
            "big",
            "dog",
        ]

    def test_coverage_zero_without_docs(self):
        st = AdaptiveState(query="alpha")
        assert StatisticalScorer().coverage(st) == 0.0

    def test_coverage_full_when_all_terms_everywhere(self):
        st, sc = self._state_with_docs(["alpha beta gamma", "alpha beta delta"])
        assert sc.coverage(st) == 1.0

    def test_consistency_single_doc_is_one(self):
        st, sc = self._state_with_docs(["alpha beta"])
        assert sc.consistency(st) == 1.0

    def test_consistency_identical_docs(self):
        st, sc = self._state_with_docs(["alpha beta gamma"] * 3)
        assert sc.consistency(st) == 1.0

    def test_saturation_decreasing_discovery(self):
        st = AdaptiveState()
        st.new_terms_history = [10, 5, 1]
        assert StatisticalScorer().saturation(st) == pytest.approx(0.9)

    def test_authority_url_shapes(self):
        sc = StatisticalScorer()
        assert sc.authority({"href": "https://x.y/docs/api/z"}) == pytest.approx(0.9)
        assert sc.authority({"href": "https://x.y/img.png"}) == pytest.approx(0.2)
        assert sc.authority({"href": ""}) == 0.0

    def test_rank_prefers_relevant_novel_links(self):
        st, sc = self._state_with_docs(["alpha beta gamma"], query="omega")
        st.pending_links = [
            {"href": "https://x.y/a", "text": "omega content here", "title": ""},
            {"href": "https://x.y/b", "text": "alpha beta gamma", "title": ""},
        ]
        ranked = sc.rank_links(st, AdaptiveConfig())
        assert ranked[0][0]["href"] == "https://x.y/a"

    def test_stop_on_max_pages(self):
        st = AdaptiveState(query="q")
        st.crawled_urls = {f"u{i}" for i in range(20)}
        st.pending_links = [{"href": "x"}]
        assert StatisticalScorer().should_stop(st, AdaptiveConfig(max_pages=20))


class TestDigest:
    def test_digest_runs_and_stops(self, ray_session, small_corpus):
        from crawl4ai_ray.sources import corpus as C

        cfg = AdaptiveConfig(max_pages=10, confidence_threshold=0.75)
        cr = AdaptiveCrawler(small_corpus, config=cfg)
        st = cr.digest(C.seed_urls()[0], "table merge sort key")
        assert 1 <= len(st.crawled_urls) <= 10
        assert st.total_documents == len(st.crawl_order)
        assert 0.0 <= st.metrics["confidence"] <= 1.0
        assert st.metrics["confidence"] >= 0.75 or len(st.crawled_urls) <= 10

    def test_digest_deterministic(self, ray_session, small_corpus):
        from crawl4ai_ray.sources import corpus as C

        cfg = AdaptiveConfig(max_pages=6)
        a = AdaptiveCrawler(small_corpus, config=cfg).digest(
            C.seed_urls()[0], "window frame"
        )
        b = AdaptiveCrawler(small_corpus, config=cfg).digest(
            C.seed_urls()[0], "window frame"
        )
        assert a.crawl_order == b.crawl_order
        assert a.metrics == b.metrics

    def test_state_roundtrip(self, tmp_path):
        st = AdaptiveState(query="q")
        StatisticalScorer().update_state(
            st, [{"url": "u", "markdown": "alpha beta words here", "links": []}]
        )
        p = str(tmp_path / "state.json")
        st.save(p)
        st2 = AdaptiveState.load(p)
        assert st2.term_frequencies == st.term_frequencies
        assert st2.doc_terms == st.doc_terms
        assert st2.query == "q"
