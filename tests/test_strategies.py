"""Best-first and DFS engines vs their serial reference simulators."""

import pytest

from crawl4ai_ray.pipelines.reference_sim import (
    simulate_best_first_crawl,
    simulate_dfs_crawl,
)
from crawl4ai_ray.pipelines.strategies import BestFirstCrawler, DFSCrawler
from crawl4ai_ray.sources import corpus as C

ROBOTS = {C.host_name(h): C.robots_body(h) for h in range(C.N_HOSTS)}
SEEDS = C.seed_urls(4)


def scorer(u: str) -> float:
    return (int(u.rsplit("/", 1)[1]) % 10) / 10.0


def log_tuples(t):
    return list(
        zip(
            t.column("order").to_pylist(),
            t.column("url").to_pylist(),
            t.column("depth").to_pylist(),
            t.column("success").to_pylist(),
        )
    )


def sim_tuples(results):
    return [(r.order, r.url, r.depth, r.success) for r in results]


class TestBestFirstParity:
    def test_scored_order_and_pages(self, small_corpus, small_corpus_dict, tmp_path):
        ref, ref_visited = simulate_best_first_crawl(
            small_corpus_dict, SEEDS, max_depth=3, robots=ROBOTS,
            url_scorer=scorer, max_pages=60,
        )
        eng = BestFirstCrawler(
            small_corpus, str(tmp_path / "bff"), max_depth=3,
            url_scorer=scorer, max_pages=60,
        )
        eng.run(SEEDS, robots=ROBOTS)
        assert log_tuples(eng.crawl_log()) == sim_tuples(ref)
        assert set(eng.seen.dump()) == ref_visited

    def test_unscored(self, small_corpus, small_corpus_dict, tmp_path):
        ref, ref_visited = simulate_best_first_crawl(
            small_corpus_dict, SEEDS, max_depth=2, robots=ROBOTS,
        )
        eng = BestFirstCrawler(small_corpus, str(tmp_path / "bffu"), max_depth=2)
        eng.run(SEEDS, robots=ROBOTS)
        assert log_tuples(eng.crawl_log()) == sim_tuples(ref)
        assert set(eng.seen.dump()) == ref_visited

    def test_highest_score_first(self, small_corpus, small_corpus_dict, tmp_path):
        ref, _ = simulate_best_first_crawl(
            small_corpus_dict, SEEDS, max_depth=3, robots=ROBOTS,
            url_scorer=scorer, max_pages=30,
        )
        # after the seed batch, popped urls follow descending score
        post_seed = [r for r in ref if r.depth > 0]
        scores = [scorer(r.url) for r in post_seed[:10]]
        assert scores == sorted(scores, reverse=True)


class TestDFSParity:
    def test_order_and_set(self, small_corpus, small_corpus_dict, tmp_path):
        ref, ref_visited = simulate_dfs_crawl(
            small_corpus_dict, SEEDS, max_depth=2, robots=ROBOTS, max_pages=25,
        )
        eng = DFSCrawler(
            small_corpus, str(tmp_path / "dfs"), max_depth=2, max_pages=25,
        )
        eng.run(SEEDS, robots=ROBOTS)
        assert log_tuples(eng.crawl_log()) == sim_tuples(ref)

    def test_depth_first_property(self, small_corpus_dict):
        ref, _ = simulate_dfs_crawl(
            small_corpus_dict, SEEDS, max_depth=3, robots=ROBOTS, max_pages=20,
        )
        # DFS must reach depth 3 before exhausting depth 1 of later seeds
        depths = [r.depth for r in ref if r.success]
        first_deep = depths.index(3) if 3 in depths else len(depths)
        assert first_deep < len(depths) - 1


class TestBestFirstResume:
    def test_cancel_checkpoint_resume_matches_uninterrupted(
        self, ray_session, small_corpus, tmp_path
    ):
        from crawl4ai_ray.functions.url_scorers import KeywordRelevanceScorer
        from crawl4ai_ray.pipelines.strategies import BestFirstCrawler
        from crawl4ai_ray.sources import corpus as C

        robots = {C.host_name(h): C.robots_body(h) for h in range(C.N_HOSTS)}
        sc = KeywordRelevanceScorer(["page", "site-1"]).score

        full = BestFirstCrawler(
            small_corpus, str(tmp_path / "full"), max_depth=3, max_pages=60, url_scorer=sc
        )
        full.run(C.seed_urls(), robots=robots)
        full_log = [(r[0], r[1]) for r in sorted(full.results)]
        full.close()

        out = str(tmp_path / "int")
        part = BestFirstCrawler(
            small_corpus, out, max_depth=3, max_pages=60, url_scorer=sc
        )
        flags = iter([False, False, False] + [True] * 50)
        part.run(
            C.seed_urls(),
            robots=robots,
            checkpoint_every=1,
            should_cancel=lambda: next(flags),
        )
        part.close()

        res = BestFirstCrawler(
            small_corpus, out, max_depth=3, max_pages=60, url_scorer=sc
        )
        res.run([], robots=robots, resume=True)
        assert [(r[0], r[1]) for r in sorted(res.results)] == full_log
        res.close()


class TestDFSResume:
    def test_cancel_checkpoint_resume_matches_uninterrupted(
        self, ray_session, small_corpus, tmp_path
    ):
        from crawl4ai_ray.pipelines.strategies import DFSCrawler
        from crawl4ai_ray.sources import corpus as C

        robots = {C.host_name(h): C.robots_body(h) for h in range(C.N_HOSTS)}
        full = DFSCrawler(small_corpus, str(tmp_path / "full"), max_depth=3, max_pages=50)
        full.run(C.seed_urls(), robots=robots)
        full_log = [(r[0], r[1]) for r in sorted(full.results)]
        full.close()

        out = str(tmp_path / "int")
        part = DFSCrawler(small_corpus, out, max_depth=3, max_pages=50)
        flags = iter([False] * 12 + [True] * 500)
        part.run(
            C.seed_urls(),
            robots=robots,
            checkpoint_every=1,
            should_cancel=lambda: next(flags),
        )
        part.close()

        res = DFSCrawler(small_corpus, out, max_depth=3, max_pages=50)
        res.run([], robots=robots, resume=True)
        assert [(r[0], r[1]) for r in sorted(res.results)] == full_log
        res.close()
