"""Differential parity: crawl4ai_ray EmbeddingScorer vs the reference's
actual EmbeddingStrategy (adaptive_crawler.py:615-1290), both driven by
the same deterministic fake embedder / query expander — the same
direct-load pattern as the url-filter and proxy parity suites.

Also pins end-to-end determinism of the embedding adaptive digest.
"""

from __future__ import annotations

import asyncio
import json
import random
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, "tests")
from _refload import load_ref_adaptive, load_ref_utils

from crawl4ai_ray.pipelines.adaptive import (
    AdaptiveConfig,
    AdaptiveState,
    EmbeddingScorer,
)
from crawl4ai_ray.stages.cosine_extract import HashingEmbedder

EMB = HashingEmbedder(48)


def _run(coro):
    return asyncio.run(coro)


VARIATIONS = [
    "how do tables merge",
    "sort key selection guide",
    "merge sort internals",
    "table partitioning basics",
    "composite sort keys",
    "merge performance tuning",
    "key distribution skew",
    "sorted table joins",
    "clustering versus sorting",
    "zone map pruning",
    "ordered ingestion",
    "compaction and sort order",
    "vacuum and re-sort",
]


def fake_expander(query: str, n: int) -> list[str]:
    return VARIATIONS[:n]


@pytest.fixture(scope="module")
def ref():
    mod = load_ref_adaptive()
    utils = load_ref_utils()

    async def fake_get_text_embeddings(texts, llm_config=None,
                                       model_name=None, batch_size=32):
        return EMB.encode(list(texts))

    class _Msg:
        def __init__(self, content):
            self.content = content

    class _Choice:
        def __init__(self, content):
            self.message = _Msg(content)

    class _Resp:
        def __init__(self, content):
            self.choices = [_Choice(content)]

    def fake_completion(**kw):
        # the prompt embeds n_total; mirror fake_expander's output
        return _Resp(json.dumps({"queries": list(VARIATIONS)}))

    utils.get_text_embeddings = fake_get_text_embeddings
    utils.perform_completion_with_backoff = fake_completion
    return mod


def _mk_cfg(**over):
    cfg = AdaptiveConfig(strategy="embedding", **over)
    return cfg


def _ref_cfg(mod, cfg):
    ns = types.SimpleNamespace(
        embedding_min_confidence_threshold=cfg.embedding_min_confidence_threshold,
        embedding_coverage_radius=cfg.embedding_coverage_radius,
        embedding_k_exp=cfg.embedding_k_exp,
        embedding_nearest_weight=cfg.embedding_nearest_weight,
        embedding_top_k_weight=cfg.embedding_top_k_weight,
        embedding_overlap_threshold=cfg.embedding_overlap_threshold,
        embedding_min_relative_improvement=cfg.embedding_min_relative_improvement,
        embedding_validation_min_score=cfg.embedding_validation_min_score,
        embedding_quality_min_confidence=cfg.embedding_quality_min_confidence,
        embedding_quality_max_confidence=cfg.embedding_quality_max_confidence,
        embedding_quality_scale_factor=cfg.embedding_quality_scale_factor,
        coverage_tau=cfg.coverage_tau,
        max_pages=cfg.max_pages,
        n_query_variations=cfg.n_query_variations,
        alpha_shape_alpha=0.5,
        _embedding_llm_config_dict=None,
        _query_llm_config_dict=None,
    )
    return ns


class _RefLink:
    def __init__(self, href, text, title=None):
        self.href = href
        self.text = text
        self.title = title
        self.meta = None
        self.head_data = None
        self.contextual_score = None


LINKS = [
    {"href": f"https://x.test/p/{i}", "text": t, "title": f"t{i}"}
    for i, t in enumerate(
        [
            "merge sort deep dive",
            "sorting stability notes",
            "table layout on disk",
            "key encoding tricks",
            "unrelated cooking recipe",
            "zone maps and pruning",
        ]
    )
]

KB_TEXTS = [
    "tables merge by sort key when ranges overlap",
    "the optimizer prunes row groups via zone maps",
    "compaction rewrites files in sorted order",
]


def _mk_states(mod, cfg, kb_texts=KB_TEXTS):
    """Build mirrored (ours, reference) states with identical KB and
    query embeddings."""
    q = EMB.encode(["q one about merge", "q two about keys"])
    kb = EMB.encode(kb_texts) if kb_texts else None
    mine = AdaptiveState(query="merge sort keys")
    mine.query_embeddings = q
    mine.kb_embeddings = kb
    theirs = mod.CrawlState(query="merge sort keys")
    theirs.query_embeddings = q
    theirs.kb_embeddings = kb
    return mine, theirs


class TestEmbeddingParity:
    def test_query_space_split(self, ref):
        cfg = _mk_cfg()
        mine = EmbeddingScorer(
            embedder=EMB, query_expander=fake_expander, shuffle=random.shuffle
        )
        strat = ref.EmbeddingStrategy()
        strat.config = _ref_cfg(ref, cfg)
        random.seed(1234)
        my_emb, my_train = mine.map_query_semantic_space(
            "merge sort keys", cfg.n_query_variations
        )
        random.seed(1234)
        their_emb, their_train = _run(
            strat.map_query_semantic_space(
                "merge sort keys", cfg.n_query_variations
            )
        )
        assert my_train == their_train
        np.testing.assert_allclose(my_emb, their_emb)
        assert mine._validation_queries == strat._validation_queries

    def test_coverage_gaps(self, ref):
        cfg = _mk_cfg()
        mine_sc = EmbeddingScorer(embedder=EMB, query_expander=fake_expander)
        strat = ref.EmbeddingStrategy()
        strat.config = _ref_cfg(ref, cfg)
        q = EMB.encode(["alpha beta", "gamma delta", "merge keys"])
        kb = EMB.encode(KB_TEXTS)
        g_mine = mine_sc.find_coverage_gaps(kb, q)
        g_ref = strat.find_coverage_gaps(kb, q)
        assert len(g_mine) == len(g_ref)
        for (qa, da), (qb, db) in zip(g_mine, g_ref):
            np.testing.assert_allclose(qa, qb)
            assert abs(da - db) < 1e-12
        # empty KB: all gaps 1.0
        assert [d for _, d in mine_sc.find_coverage_gaps(None, q)] == [
            d for _, d in strat.find_coverage_gaps(None, q)
        ]

    def test_link_selection_scores(self, ref):
        cfg = _mk_cfg()
        mine_sc = EmbeddingScorer(embedder=EMB, query_expander=fake_expander)
        strat = ref.EmbeddingStrategy()
        strat.config = _ref_cfg(ref, cfg)
        q = EMB.encode(["merge sort keys", "zone map pruning"])
        kb = EMB.encode(KB_TEXTS)
        gaps_mine = mine_sc.find_coverage_gaps(kb, q)
        gaps_ref = strat.find_coverage_gaps(kb, q)
        my = mine_sc.select_links_for_expansion(LINKS, gaps_mine, kb, cfg)
        ref_links = [_RefLink(**l) for l in LINKS]
        their = _run(
            strat.select_links_for_expansion(ref_links, gaps_ref, kb)
        )
        my_scores = {l["href"]: s for l, s in my}
        their_scores = {l.href: s for l, s in their}
        assert set(my_scores) == set(their_scores)
        for href in my_scores:
            assert abs(my_scores[href] - their_scores[href]) < 1e-10, href

    def test_confidence(self, ref):
        cfg = _mk_cfg()
        mod = ref
        mine_sc = EmbeddingScorer(embedder=EMB, query_expander=fake_expander)
        strat = mod.EmbeddingStrategy()
        strat.config = _ref_cfg(mod, cfg)
        mine, theirs = _mk_states(mod, cfg)
        c_mine = mine_sc.confidence(mine, cfg)
        c_theirs = _run(strat.calculate_confidence(theirs))
        assert abs(c_mine - c_theirs) < 1e-7
        for k in ("coverage_score", "avg_best_similarity",
                  "median_best_similarity"):
            assert abs(mine.metrics[k] - theirs.metrics[k]) < 1e-7
        # hit-rate mode
        cfg2 = _mk_cfg(coverage_tau=0.3)
        strat.config = _ref_cfg(mod, cfg2)
        assert abs(
            mine_sc.confidence(mine, cfg2)
            - _run(strat.calculate_confidence(theirs))
        ) < 1e-7

    def test_validate_coverage(self, ref):
        cfg = _mk_cfg()
        mine_sc = EmbeddingScorer(
            embedder=EMB, query_expander=fake_expander,
            shuffle=random.shuffle,
        )
        strat = ref.EmbeddingStrategy()
        strat.config = _ref_cfg(ref, cfg)
        random.seed(7)
        mine_sc.map_query_semantic_space("merge sort keys", 10)
        random.seed(7)
        _run(strat.map_query_semantic_space("merge sort keys", 10))
        mine, theirs = _mk_states(ref, cfg)
        v_mine = mine_sc.validate_coverage(mine)
        v_theirs = _run(strat.validate_coverage(theirs))
        assert abs(v_mine - v_theirs) < 1e-10

    def test_should_stop_sequence(self, ref):
        cfg = _mk_cfg(max_pages=50)
        mod = ref
        mine_sc = EmbeddingScorer(
            embedder=EMB, query_expander=fake_expander,
            shuffle=random.shuffle,
        )
        strat = mod.EmbeddingStrategy()
        strat.config = _ref_cfg(mod, cfg)
        random.seed(9)
        mine_sc.map_query_semantic_space("merge sort keys", 10)
        random.seed(9)
        _run(strat.map_query_semantic_space("merge sort keys", 10))
        mine, theirs = _mk_states(mod, cfg)
        mine.pending_links = list(LINKS)
        theirs.pending_links = [_RefLink(**l) for l in LINKS]
        mine.crawled_urls = {"a", "b"}
        theirs.crawled_urls = {"a", "b"}
        for conf in (0.42, 0.55, 0.56, 0.561, 0.5612):
            mine.metrics["confidence"] = conf
            theirs.metrics["confidence"] = conf
            s_mine = mine_sc.should_stop(mine, cfg)
            s_theirs = _run(strat.should_stop(theirs, cfg))
            assert s_mine == s_theirs, conf
            assert mine.metrics.get("avg_improvement") == pytest.approx(
                theirs.metrics.get("avg_improvement", float("nan")), nan_ok=True
            ) or "avg_improvement" not in mine.metrics
            if s_mine:
                break
        assert mine.metrics.get("stopped_reason") == theirs.metrics.get(
            "stopped_reason"
        )
        # below-minimum-relevance early exit
        mine2, theirs2 = _mk_states(mod, cfg)
        mine2.crawled_urls = {"a"}
        theirs2.crawled_urls = {"a"}
        mine2.metrics["confidence"] = 0.05
        theirs2.metrics["confidence"] = 0.05
        assert mine_sc.should_stop(mine2, cfg) is True
        assert _run(strat.should_stop(theirs2, cfg)) is True
        assert (
            mine2.metrics["stopped_reason"]
            == theirs2.metrics["stopped_reason"]
            == "below_minimum_relevance_threshold"
        )

    def test_update_state_dedup(self, ref):
        cfg = _mk_cfg()
        mod = ref
        mine_sc = EmbeddingScorer(embedder=EMB, query_expander=fake_expander)
        strat = mod.EmbeddingStrategy()
        strat.config = _ref_cfg(mod, cfg)
        mine, theirs = _mk_states(mod, cfg, kb_texts=None)

        texts = [
            "tables merge by sort key",
            "tables merge by sort key",  # exact dup of first
            "completely different topic entirely",
        ]
        my_results = [
            {"url": f"u{i}", "markdown": t} for i, t in enumerate(texts)
        ]

        class _Md:
            def __init__(self, t):
                self.raw_markdown = t

        class _Res:
            def __init__(self, i, t):
                self.url = f"u{i}"
                self.markdown = _Md(t)

        their_results = [_Res(i, t) for i, t in enumerate(texts)]
        mine_sc.update_state(mine, my_results, cfg)
        _run(strat.update_state(theirs, their_results))
        assert mine.crawl_order == theirs.crawl_order
        np.testing.assert_allclose(mine.kb_embeddings, theirs.kb_embeddings)
        # second round dedups against existing KB
        mine_sc.update_state(mine, my_results, cfg)
        _run(strat.update_state(theirs, their_results))
        assert mine.crawl_order == theirs.crawl_order
        assert len(mine.kb_embeddings) == len(theirs.kb_embeddings)

    def test_quality_confidence(self, ref):
        cfg = _mk_cfg()
        mod = ref
        for learning, validated, val_score in [
            (0.3, True, 0.5),
            (0.55, True, 0.5),
            (0.8, True, 0.5),
            (0.55, False, 0.0),
        ]:
            mine_sc = EmbeddingScorer(
                embedder=EMB, query_expander=fake_expander
            )
            strat = mod.EmbeddingStrategy()
            strat.config = _ref_cfg(mod, cfg)
            mine, theirs = _mk_states(mod, cfg)
            mine.metrics["coverage_score"] = learning
            theirs.metrics["learning_score"] = learning
            # reference get_quality_confidence reads 'learning_score'
            # (set by the commented-out confidence variant); its LIVE
            # calculate_confidence stores 'coverage_score'. We feed both
            # names so the mapping math itself is compared.
            theirs.metrics["coverage_score"] = learning
            mine.metrics["validation_confidence"] = val_score
            theirs.metrics["validation_confidence"] = val_score
            mine_sc._validation_passed = validated
            strat._validation_passed = validated
            q_mine = mine_sc.get_quality_confidence(mine, cfg)
            # align reference input name
            theirs.metrics["learning_score"] = learning
            q_theirs = strat.get_quality_confidence(theirs)
            assert abs(q_mine - q_theirs) < 1e-12, (learning, validated)


class TestEmbeddingDigest:
    def test_digest_deterministic(self, ray_session, tmp_path):
        from crawl4ai_ray.pipelines.adaptive import AdaptiveCrawler
        from crawl4ai_ray.sources import corpus as C

        cd = C.build_corpus("/root/testdata/sf0.001", variants=1)
        outs = []
        for i in range(2):
            cr = AdaptiveCrawler(
                cd,
                str(tmp_path / f"d{i}"),
                config=AdaptiveConfig(
                    strategy="embedding",
                    max_pages=12,
                    confidence_threshold=0.95,
                    min_gain_threshold=1e-6,
                ),
            )
            st = cr.digest(
                C.seed_urls()[0], "related page tutorial reference"
            )
            outs.append(
                (
                    st.crawl_order,
                    sorted(st.crawled_urls),
                    round(st.metrics["confidence"], 12),
                    st.metrics.get("stopped_reason"),
                )
            )
        assert outs[0] == outs[1]
        assert outs[0][3] == "converged_validated"
        assert len(outs[0][1]) >= 3  # expanded beyond the seed

    def test_digest_save_resume(self, ray_session, tmp_path):
        from crawl4ai_ray.pipelines.adaptive import AdaptiveCrawler
        from crawl4ai_ray.sources import corpus as C

        cd = C.build_corpus("/root/testdata/sf0.001", variants=1)
        sp = str(tmp_path / "state.json")
        cr = AdaptiveCrawler(
            cd,
            str(tmp_path / "d"),
            config=AdaptiveConfig(
                strategy="embedding",
                max_pages=12,
                confidence_threshold=0.95,
                min_gain_threshold=1e-6,
                save_state=True,
                state_path=sp,
            ),
        )
        st = cr.digest(C.seed_urls()[0], "related page tutorial reference")
        st2 = AdaptiveState.load(sp)
        assert st2.kb_embeddings.shape == st.kb_embeddings.shape
        assert st2.query_embeddings.shape == st.query_embeddings.shape
        assert st2.validation_queries == st.validation_queries
        # resume continues without re-expanding the query space
        cr2 = AdaptiveCrawler(
            cd,
            str(tmp_path / "d2"),
            config=AdaptiveConfig(
                strategy="embedding", max_pages=12, min_gain_threshold=1e-6
            ),
        )
        st3 = cr2.digest(
            C.seed_urls()[0],
            "related page tutorial reference",
            resume_from=sp,
        )
        assert st3.query_embeddings.shape == st.query_embeddings.shape
