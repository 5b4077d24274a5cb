"""Spillable best-first frontier (state/pqspill.py + BestFirstCrawler
frontier_mem_rows): pop order bit-identical to an unbounded heapq, and
the engine's crawl identical with a frontier capped far below its real
size — including cancel -> checkpoint -> resume, where the frontier is
never materialized in driver memory."""

import heapq
import random

import pytest

from crawl4ai_ray.state.pqspill import SpillPriorityQueue


def _rand_entry(rng):
    return (
        -round(rng.random(), 3),
        rng.randrange(5),
        f"https://site-{rng.randrange(8)}.example.com/page/{rng.randrange(1000)}",
        "parent",
    )


class TestQueueParity:
    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_interleaved_push_pop_matches_heapq(self, tmp_path, seed):
        rng = random.Random(seed)
        q = SpillPriorityQueue(str(tmp_path / f"s{seed}"), mem_entries=8, chunk_rows=4)
        ref: list = []
        for step in range(2000):
            if ref and rng.random() < 0.4:
                assert q.pop() == heapq.heappop(ref)
            else:
                e = _rand_entry(rng)
                q.push(e)
                heapq.heappush(ref, e)
            assert len(q) == len(ref)
        while ref:
            assert q.pop() == heapq.heappop(ref)
        assert q.pop() is None and not q
        assert q.spills > 0  # the cap actually forced spill runs

    @pytest.mark.parametrize("seed", [5, 6])
    def test_compaction_preserves_order(self, tmp_path, seed):
        """max_runs=2 forces constant stream-merges; pop order must
        still be bit-identical and the live run count bounded."""
        rng = random.Random(seed)
        q = SpillPriorityQueue(
            str(tmp_path / f"m{seed}"), mem_entries=8, chunk_rows=4, max_runs=2
        )
        ref: list = []
        for _ in range(600):
            if ref and rng.random() < 0.35:
                assert q.pop() == heapq.heappop(ref)
            else:
                e = _rand_entry(rng)
                q.push(e)
                heapq.heappush(ref, e)
            assert len(q._runs) <= 3  # merge runs right after overflow
        assert q.compactions > 0
        while ref:
            assert q.pop() == heapq.heappop(ref)
        assert q.pop() is None

    def test_duplicates_survive(self, tmp_path):
        q = SpillPriorityQueue(str(tmp_path / "d"), mem_entries=4, chunk_rows=2)
        e = (-0.5, 1, "https://a.example.com/x", "")
        for _ in range(10):
            q.push(e)
        assert len(q) == 10
        assert [q.pop() for _ in range(10)] == [e] * 10

    def test_peek_does_not_consume(self, tmp_path):
        q = SpillPriorityQueue(str(tmp_path / "p"), mem_entries=4, chunk_rows=2)
        rng = random.Random(7)
        entries = sorted(_rand_entry(rng) for _ in range(20))
        for e in entries:
            q.push(e)
        assert q.peek() == entries[0]
        assert len(q) == 20
        assert q.pop() == entries[0]

    def test_checkpoint_restore_mid_stream(self, tmp_path):
        rng = random.Random(11)
        q = SpillPriorityQueue(str(tmp_path / "c"), mem_entries=8, chunk_rows=4)
        ref: list = []
        for _ in range(500):
            e = _rand_entry(rng)
            q.push(e)
            heapq.heappush(ref, e)
        for _ in range(123):  # consume into the middle of runs
            assert q.pop() == heapq.heappop(ref)
        q.checkpoint(str(tmp_path / "ckpt"))
        # the checkpoint must not consume the live queue
        live = [q.pop() for _ in range(len(ref))]
        assert live == sorted(ref)
        q2 = SpillPriorityQueue(str(tmp_path / "c2"), mem_entries=8, chunk_rows=4)
        assert q2.restore(str(tmp_path / "ckpt")) == len(ref)
        assert [q2.pop() for _ in range(len(ref))] == sorted(ref)
        assert q2.pop() is None


class TestBestFirstSpillMode:
    def test_capped_frontier_crawl_equals_uncapped(
        self, ray_session, small_corpus, tmp_path
    ):
        from crawl4ai_ray.pipelines.strategies import BestFirstCrawler
        from crawl4ai_ray.sources import corpus as C

        robots = {C.host_name(h): C.robots_body(h) for h in range(C.N_HOSTS)}

        def sc(u: str) -> float:
            return (int(u.rsplit("/", 1)[1]) % 10) / 10.0

        base = BestFirstCrawler(
            small_corpus, str(tmp_path / "mem"), max_depth=3, max_pages=60, url_scorer=sc
        )
        base.run(C.seed_urls(), robots=robots)
        base_log = sorted(base.results)
        base.close()

        # cap the resident frontier far below its real size: every pop
        # beyond 16 entries must stream from spill runs
        cap = BestFirstCrawler(
            small_corpus,
            str(tmp_path / "cap"),
            max_depth=3,
            max_pages=60,
            url_scorer=sc,
            frontier_mem_rows=16,
        )
        cap.run(C.seed_urls(), robots=robots)
        assert cap._pq.spills > 0  # the frontier really exceeded the cap
        assert sorted(cap.results) == base_log
        cap.close()

    def test_cancel_resume_with_spilled_frontier(
        self, ray_session, small_corpus, tmp_path
    ):
        from crawl4ai_ray.pipelines.strategies import BestFirstCrawler
        from crawl4ai_ray.sources import corpus as C

        robots = {C.host_name(h): C.robots_body(h) for h in range(C.N_HOSTS)}

        def sc(u: str) -> float:
            return (int(u.rsplit("/", 1)[1]) % 10) / 10.0

        kw = dict(max_depth=3, max_pages=60, url_scorer=sc, frontier_mem_rows=16)
        full = BestFirstCrawler(small_corpus, str(tmp_path / "full"), **kw)
        full.run(C.seed_urls(), robots=robots)
        full_log = [(r[0], r[1]) for r in sorted(full.results)]
        full.close()

        out = str(tmp_path / "int")
        part = BestFirstCrawler(small_corpus, out, **kw)
        flags = iter([False, False, False] + [True] * 50)
        part.run(
            C.seed_urls(),
            robots=robots,
            checkpoint_every=1,
            should_cancel=lambda: next(flags),
        )
        assert part._pq.spills > 0  # checkpointed WITH live spill runs
        part.close()

        res = BestFirstCrawler(small_corpus, out, **kw)
        res.run([], robots=robots, resume=True)
        assert [(r[0], r[1]) for r in sorted(res.results)] == full_log
        res.close()

    def test_spill_resume_of_inmemory_checkpoint_and_back(
        self, ray_session, small_corpus, tmp_path
    ):
        """Cross-mode resume both ways: an in-memory checkpoint resumed
        in spill mode, and a spill checkpoint resumed in memory."""
        from crawl4ai_ray.pipelines.strategies import BestFirstCrawler
        from crawl4ai_ray.sources import corpus as C

        robots = {C.host_name(h): C.robots_body(h) for h in range(C.N_HOSTS)}
        kw = dict(max_depth=3, max_pages=40)

        full = BestFirstCrawler(small_corpus, str(tmp_path / "full"), **kw)
        full.run(C.seed_urls(), robots=robots)
        full_log = [(r[0], r[1]) for r in sorted(full.results)]
        full.close()

        for a_kw, b_kw, name in [
            (dict(), dict(frontier_mem_rows=16), "mem2spill"),
            (dict(frontier_mem_rows=16), dict(), "spill2mem"),
        ]:
            out = str(tmp_path / name)
            part = BestFirstCrawler(small_corpus, out, **kw, **a_kw)
            flags = iter([False, False] + [True] * 50)
            part.run(
                C.seed_urls(), robots=robots, checkpoint_every=1,
                should_cancel=lambda: next(flags),
            )
            part.close()
            res = BestFirstCrawler(small_corpus, out, **kw, **b_kw)
            res.run([], robots=robots, resume=True)
            assert [(r[0], r[1]) for r in sorted(res.results)] == full_log, name
            res.close()

    def test_fairness_and_spill_exclusive(self, small_corpus, tmp_path):
        from crawl4ai_ray.pipelines.strategies import BestFirstCrawler

        with pytest.raises(ValueError):
            BestFirstCrawler(
                small_corpus, str(tmp_path / "x"),
                fairness_steps=5, frontier_mem_rows=16,
            )
