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


class TestBestFirstScaleMode:
    def test_exhaustive_set_matches_parity_mode(
        self, small_corpus, small_corpus_dict, tmp_path
    ):
        """wave_size=K relaxes only ORDER (round-wise best-first); an
        exhaustive crawl visits the identical page set with identical
        per-page success/depth-invariants."""
        # depth cap high enough to exhaust the reachable graph: a
        # depth-capped crawl is order-dependent by construction (the
        # depth a url is FIRST reached at depends on pop order), so
        # set-equality is only defined for exhaustive crawls
        base = BestFirstCrawler(
            small_corpus, str(tmp_path / "b10"), max_depth=99,
            url_scorer=scorer,
        )
        base.run(SEEDS, robots=ROBOTS)
        scale = BestFirstCrawler(
            small_corpus, str(tmp_path / "b50"), max_depth=99,
            url_scorer=scorer, wave_size=50,
        )
        scale.run(SEEDS, robots=ROBOTS)
        a = log_tuples(base.crawl_log())
        b = log_tuples(scale.crawl_log())
        assert sorted((u, s) for _, u, _, s in a) == sorted(
            (u, s) for _, u, _, s in b
        )
        assert set(base.seen.dump()) == set(scale.seen.dump())
        # scale mode takes far fewer rounds (steps = batch dirs)
        import os

        n_base = len(
            [d for d in os.listdir(tmp_path / "b10") if d.startswith("batch=")]
        )
        n_scale = len(
            [d for d in os.listdir(tmp_path / "b50") if d.startswith("batch=")]
        )
        assert n_scale < n_base / 2

    def test_round_is_best_first(self, small_corpus, tmp_path):
        """Within the scale mode's first post-seed round, crawl order
        follows descending score (top-K heap drain)."""
        eng = BestFirstCrawler(
            small_corpus, str(tmp_path / "bk"), max_depth=2,
            url_scorer=scorer, wave_size=25, max_pages=60,
        )
        eng.run(SEEDS, robots=ROBOTS)
        # round 1 = batch=00001 dir; its rows, in order, are the top-K
        # heap drain of that round (dedup may shrink it below K)
        import pyarrow.parquet as pq

        t = pq.read_table(
            str(tmp_path / "bk" / "batch=00001"), columns=["order", "url"]
        )
        rows = sorted(
            zip(t.column("order").to_pylist(), t.column("url").to_pylist())
        )
        scores = [scorer(u) for _, u in rows]
        assert len(scores) >= 10
        assert scores == sorted(scores, reverse=True)

    def test_max_pages_respected(self, small_corpus, tmp_path):
        eng = BestFirstCrawler(
            small_corpus, str(tmp_path / "bm"), max_depth=3,
            url_scorer=scorer, wave_size=40, max_pages=17,
        )
        st = eng.run(SEEDS, robots=ROBOTS)
        assert st.pages_crawled == 17


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


class TestFairnessAging:
    """Fairness aging (reference async_dispatcher.py:217-226 analog):
    a frontier dominated by high-scored URLs must not starve
    low-scored hosts' URLs indefinitely."""

    def _run(self, corpus_dir, tmp_path, name, fairness_steps):
        from crawl4ai_ray.pipelines.strategies import BestFirstCrawler
        from crawl4ai_ray.sources import corpus as C

        def scorer(u):
            # host 4 is the starved minority: every other host scores high
            host = u.split("//site-")[1].split(".")[0]
            return 0.0 if host == "4" else 10.0

        cr = BestFirstCrawler(
            corpus_dir, str(tmp_path / name),
            max_depth=6, max_pages=150, url_scorer=scorer,
            num_seen_shards=2, num_politeness_shards=2,
            fairness_steps=fairness_steps,
        )
        robots = {C.host_name(h): C.robots_body(h) for h in range(C.N_HOSTS)}
        cr.run(C.seed_urls(), robots=robots)
        log = cr.crawl_log()
        rows = list(zip(log.column("order").to_pylist(), log.column("url").to_pylist()))
        cr.close()
        return rows

    def test_aged_minority_host_drains_early(self, small_corpus, tmp_path):
        fair = self._run(small_corpus, tmp_path, "fair", fairness_steps=2)
        unfair = self._run(small_corpus, tmp_path, "unfair", fairness_steps=None)

        def first_minority_pos(rows):
            for i, (_, u) in enumerate(rows):
                if "//site-4." in u:
                    return i
            return None

        pos_fair = first_minority_pos(fair)
        pos_unfair = first_minority_pos(unfair)
        # with aging, host-4 urls surface; strictly earlier than (or
        # present where absent in) the pure best-first order
        assert pos_fair is not None
        if pos_unfair is None:
            assert True
        else:
            assert pos_fair < pos_unfair

    def test_fairness_off_preserves_order(self, small_corpus, tmp_path):
        a = self._run(small_corpus, tmp_path, "off1", fairness_steps=None)
        b = self._run(small_corpus, tmp_path, "off2", fairness_steps=None)
        assert a == b
