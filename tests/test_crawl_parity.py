"""Distributed BFS engine vs serial reference-semantics simulator.

The north rule requires crawl ordering and the final URL-seen set to
match the reference under the same seed list + politeness budget;
the simulator (pipelines/reference_sim.py) encodes the reference's
serial BFS semantics, and these tests pin the Ray engine to it.
"""

import os

import pytest

from crawl4ai_ray.pipelines.crawl import BFSCrawler
from crawl4ai_ray.pipelines.reference_sim import simulate_bfs_crawl
from crawl4ai_ray.sources import corpus as C

N = 500
ROBOTS = {C.host_name(h): C.robots_body(h) for h in range(C.N_HOSTS)}
SEEDS = C.seed_urls(4)


def run_engine(corpus_dir, tmp_path, name, **kw):
    crawler = BFSCrawler(corpus_dir, str(tmp_path / name), num_seen_shards=4,
                         num_politeness_shards=2, **kw)
    crawler.run(SEEDS, robots=ROBOTS)
    return crawler


def sim(corpus_dict, **kw):
    return simulate_bfs_crawl(corpus_dict, SEEDS, robots=ROBOTS, **kw)


def log_tuples(crawler):
    t = crawler.crawl_log()
    return list(
        zip(
            t.column("order").to_pylist(),
            t.column("url").to_pylist(),
            t.column("depth").to_pylist(),
            t.column("success").to_pylist(),
            t.column("status_code").to_pylist(),
        )
    )


def sim_tuples(results):
    return [(r.order, r.url, r.depth, r.success, r.status_code) for r in results]


class TestBFSParity:
    def test_depth3_order_and_set(self, small_corpus, small_corpus_dict, tmp_path):
        ref, ref_visited = sim(small_corpus_dict, max_depth=3)
        eng = run_engine(small_corpus, tmp_path, "d3", max_depth=3)
        assert log_tuples(eng) == sim_tuples(ref)
        assert set(eng.seen.dump()) == ref_visited

    def test_depth3_text_byte_identity(self, small_corpus, small_corpus_dict, tmp_path):
        ref, _ = sim(small_corpus_dict, max_depth=3)
        eng = run_engine(small_corpus, tmp_path, "d3t", max_depth=3)
        t = eng.crawl_log()
        eng_text = dict(zip(t.column("url").to_pylist(), t.column("text").to_pylist()))
        for r in ref:
            if r.success:
                assert eng_text[r.url] == r.text

    def test_full_crawl_depth6(self, small_corpus, small_corpus_dict, tmp_path):
        ref, ref_visited = sim(small_corpus_dict, max_depth=6)
        eng = run_engine(small_corpus, tmp_path, "d6", max_depth=6)
        assert log_tuples(eng) == sim_tuples(ref)
        assert set(eng.seen.dump()) == ref_visited
        # reachable successes under the hot-host-skewed link graph
        # (~1/3 of links redirect to host 1; see corpus.link_target)
        succ = sum(1 for r in ref if r.success)
        assert eng.stats.pages_crawled == succ == 421

    def test_max_pages_capacity_parity(self, small_corpus, small_corpus_dict, tmp_path):
        ref, ref_visited = sim(small_corpus_dict, max_depth=6, max_pages=57)
        eng = run_engine(small_corpus, tmp_path, "mp", max_depth=6, max_pages=57)
        assert log_tuples(eng) == sim_tuples(ref)
        # over-capacity urls are seen-but-never-crawled in both
        assert set(eng.seen.dump()) == ref_visited

    def test_url_filter_parity(self, small_corpus, small_corpus_dict, tmp_path):
        flt = lambda u: not u.endswith("7")  # arbitrary URLPattern-ish predicate
        ref, ref_visited = sim(small_corpus_dict, max_depth=4, url_filter=flt)
        eng = run_engine(small_corpus, tmp_path, "flt", max_depth=4, url_filter=flt)
        assert log_tuples(eng) == sim_tuples(ref)
        assert set(eng.seen.dump()) == ref_visited

    def test_scorer_threshold_parity(self, small_corpus, small_corpus_dict, tmp_path):
        scorer = lambda u: (int(u.rsplit("/", 1)[1]) % 10) / 10.0
        ref, ref_visited = sim(
            small_corpus_dict, max_depth=4, url_scorer=scorer, score_threshold=0.3
        )
        eng = run_engine(
            small_corpus, tmp_path, "sc", max_depth=4, url_scorer=scorer,
            score_threshold=0.3,
        )
        assert log_tuples(eng) == sim_tuples(ref)
        assert set(eng.seen.dump()) == ref_visited

    def test_scorer_with_capacity_truncation(self, small_corpus, small_corpus_dict, tmp_path):
        scorer = lambda u: (int(u.rsplit("/", 1)[1]) % 7) / 7.0
        ref, ref_visited = sim(
            small_corpus_dict, max_depth=6, url_scorer=scorer, max_pages=40
        )
        eng = run_engine(
            small_corpus, tmp_path, "sctr", max_depth=6, url_scorer=scorer, max_pages=40
        )
        assert log_tuples(eng) == sim_tuples(ref)
        assert set(eng.seen.dump()) == ref_visited


class TestResume:
    def test_resume_matches_uninterrupted(self, small_corpus, small_corpus_dict, tmp_path):
        # uninterrupted run
        full = run_engine(small_corpus, tmp_path, "full", max_depth=4)
        full_log = log_tuples(full)

        # interrupted: run 2 waves only, then resume in a NEW crawler
        part = BFSCrawler(
            small_corpus, str(tmp_path / "part"), max_depth=4,
            num_seen_shards=4, num_politeness_shards=2,
        )
        part.set_robots(ROBOTS)
        frontier = []
        for u in SEEDS:
            frontier.append((u, 0, None, part._order))
            part._order += 1
        for _ in range(2):
            frontier = part._run_wave(frontier)
            part._wave += 1
            part._checkpoint(frontier)

        resumed = BFSCrawler(
            small_corpus, str(tmp_path / "part"), max_depth=4,
            num_seen_shards=4, num_politeness_shards=2,
        )
        resumed.run(SEEDS, robots=ROBOTS, resume=True)
        assert log_tuples(resumed) == full_log
        assert set(resumed.seen.dump()) == set(full.seen.dump())


class TestRobotsAndPoliteness:
    def test_blocked_hosts_403(self, small_corpus, tmp_path):
        eng = run_engine(small_corpus, tmp_path, "rb", max_depth=3)
        t = eng.crawl_log()
        for u, s, code in zip(
            t.column("url").to_pylist(),
            t.column("success").to_pylist(),
            t.column("status_code").to_pylist(),
        ):
            h = int(u.split("site-")[1].split(".")[0])
            if C.host_blocked(h):
                assert not s and code == 403
            else:
                assert s and code == 200

    def test_politeness_budget(self, small_corpus, small_corpus_dict, tmp_path):
        # per-host page budget (max_pages_per_host) caps fetches per host
        crawler = BFSCrawler(
            small_corpus, str(tmp_path / "budget"), max_depth=6,
            num_seen_shards=2, num_politeness_shards=2,
        )
        crawler.politeness = __import__(
            "crawl4ai_ray.state.politeness", fromlist=["PolitenessPool"]
        ).PolitenessPool(2, max_pages_per_host=5)
        crawler.run(SEEDS, robots=ROBOTS)
        t = crawler.crawl_log()
        from collections import Counter

        per_host = Counter(
            u.split("//")[1].split("/")[0]
            for u, s in zip(t.column("url").to_pylist(), t.column("success").to_pylist())
            if s
        )
        assert per_host and max(per_host.values()) <= 5

    def test_virtual_schedule_accumulates(self, small_corpus, tmp_path):
        eng = run_engine(small_corpus, tmp_path, "vt", max_depth=3)
        st = eng.politeness.stats()
        assert st["pages"] > 0
        assert st["politeness_makespan_sec"] > 0.0


class TestMetricsLineage:
    def test_metrics_parquet_written(self, small_corpus, tmp_path):
        from crawl4ai_ray.pipelines.crawl import BFSCrawler
        from crawl4ai_ray.sources import corpus as C

        cr = BFSCrawler(small_corpus, str(tmp_path), max_depth=2)
        robots = {C.host_name(h): C.robots_body(h) for h in range(C.N_HOSTS)}
        cr.run(C.seed_urls(), robots=robots)
        m = cr.metrics_table()
        assert m is not None
        assert m.num_rows == len(cr.stats.waves)
        assert {"wave", "frontier", "successes", "exec_sec"} <= set(m.column_names)
        assert sum(m.column("successes").to_pylist()) == cr.stats.pages_crawled
        cr.close()


class TestBFSCancel:
    def test_cancel_resume_matches_uninterrupted(self, small_corpus, tmp_path):
        from crawl4ai_ray.pipelines.crawl import BFSCrawler
        from crawl4ai_ray.sources import corpus as C

        robots = {C.host_name(h): C.robots_body(h) for h in range(C.N_HOSTS)}
        full = BFSCrawler(small_corpus, str(tmp_path / "full"), max_depth=3)
        full.run(C.seed_urls(), robots=robots)
        fl = sorted(
            zip(
                full.crawl_log().column("url").to_pylist(),
                full.crawl_log().column("order").to_pylist(),
            )
        )
        full.close()

        out = str(tmp_path / "int")
        part = BFSCrawler(small_corpus, out, max_depth=3)
        flags = iter([False, False] + [True] * 30)
        part.run(C.seed_urls(), robots=robots, should_cancel=lambda: next(flags))
        part.close()

        res = BFSCrawler(small_corpus, out, max_depth=3)
        res.run([], robots=robots, resume=True)
        rl = sorted(
            zip(
                res.crawl_log().column("url").to_pylist(),
                res.crawl_log().column("order").to_pylist(),
            )
        )
        assert rl == fl
        res.close()


class TestCrawlerIsolation:
    def test_interleaved_crawlers_are_isolated(self, small_corpus, tmp_path):
        """Two engines sharing one Ray session must not share state:
        wave-interleaved crawls match solo runs exactly."""
        from crawl4ai_ray.pipelines.crawl import BFSCrawler
        from crawl4ai_ray.sources import corpus as C

        robots = {C.host_name(h): C.robots_body(h) for h in range(C.N_HOSTS)}

        def log_of(cr):
            t = cr.crawl_log()
            return sorted(
                zip(t.column("url").to_pylist(), t.column("order").to_pylist())
            )

        a = BFSCrawler(small_corpus, str(tmp_path / "a"), max_depth=2)
        b = BFSCrawler(small_corpus, str(tmp_path / "b"), max_depth=2)
        ga = a.run_stream(C.seed_urls(), robots=robots)
        gb = b.run_stream(C.seed_urls(), robots=robots)
        done_a = done_b = False
        while not (done_a and done_b):
            if not done_a:
                try:
                    next(ga)
                except StopIteration:
                    done_a = True
            if not done_b:
                try:
                    next(gb)
                except StopIteration:
                    done_b = True
        ref = BFSCrawler(small_corpus, str(tmp_path / "r"), max_depth=2)
        ref.run(C.seed_urls(), robots=robots)
        assert log_of(a) == log_of(ref)
        assert log_of(b) == log_of(ref)
        for c in (a, b, ref):
            c.close()


class TestIncludeExternal:
    def test_external_links_enter_frontier_and_fail_cleanly(
        self, small_corpus, tmp_path
    ):
        from crawl4ai_ray.pipelines.crawl import BFSCrawler
        from crawl4ai_ray.sources import corpus as C

        robots = {C.host_name(h): C.robots_body(h) for h in range(C.N_HOSTS)}
        cr = BFSCrawler(
            small_corpus, str(tmp_path), max_depth=2, include_external=True
        )
        st = cr.run(C.seed_urls(), robots=robots)
        log = cr.crawl_log().to_pandas()
        ext = log[~log["url"].str.contains(".example.com", regex=False)]
        assert len(ext) > 0  # externals entered the frontier
        assert (~ext["success"]).all()  # off-corpus: clean 404 failures
        assert st.pages_crawled > 0
        cr.close()


class TestVectorizedFilteredDiscovery:
    """_discover_filtered (wave-task verdicts + vectorized driver merge)
    must be bit-equal to the serial reference-shaped _discover loop."""

    def test_serial_vs_vectorized_bit_equal(self, small_corpus, tmp_path):
        flt = lambda u: not u.endswith("7")  # noqa: E731
        scorer = lambda u: (hash(u) % 100) / 100.0  # not used: unstable hash
        def stable_scorer(u):
            return float(int(u.rsplit("/", 1)[-1]) % 17)

        kw = dict(max_depth=5, max_pages=73, url_filter=flt, url_scorer=stable_scorer)
        vec = run_engine(small_corpus, tmp_path, "vec", **kw)
        ser = BFSCrawler(
            small_corpus, str(tmp_path / "ser"), num_seen_shards=4,
            num_politeness_shards=2, **kw,
        )
        ser.use_serial_discovery = True
        ser.run(SEEDS, robots=ROBOTS)
        assert log_tuples(vec) == log_tuples(ser)
        assert vec.stats.urls_skipped == ser.stats.urls_skipped
        assert vec.stats.urls_failed == ser.stats.urls_failed
        assert vec.stats.pages_crawled == ser.stats.pages_crawled

    def test_filter_only_vs_serial(self, small_corpus, tmp_path):
        flt = lambda u: "/page/1" not in u  # noqa: E731
        kw = dict(max_depth=4, url_filter=flt)
        vec = run_engine(small_corpus, tmp_path, "vf", **kw)
        ser = BFSCrawler(
            small_corpus, str(tmp_path / "sf"), num_seen_shards=4,
            num_politeness_shards=2, **kw,
        )
        ser.use_serial_discovery = True
        ser.run(SEEDS, robots=ROBOTS)
        assert log_tuples(vec) == log_tuples(ser)
        assert vec.stats.urls_skipped == ser.stats.urls_skipped


class TestFrontierSpillAndSlicing:
    """max_wave_size slicing + Parquet frontier spill must preserve the
    crawl's seen set and per-url results (wave composition may differ,
    but discovery order, dedup winners and success flags may not)."""

    def test_sliced_crawl_matches_unsliced(self, small_corpus, tmp_path):
        full = run_engine(small_corpus, tmp_path, "full", max_depth=4)
        sliced = BFSCrawler(
            small_corpus, str(tmp_path / "sliced"), num_seen_shards=4,
            num_politeness_shards=2, max_depth=4,
            max_wave_size=37, frontier_mem_rows=29,
        )
        sliced.run(SEEDS, robots=ROBOTS)
        assert sliced.stats.pages_crawled == full.stats.pages_crawled
        f = sorted(log_tuples(full))
        s = sorted(log_tuples(sliced))
        assert f == s

    def test_spill_buffer_fifo(self, tmp_path):
        from crawl4ai_ray.state.frontier import FrontierBuffer

        buf = FrontierBuffer(str(tmp_path / "sp"), mem_rows=10)
        rows = [(f"u{i}", 0, None, i) for i in range(95)]
        buf.extend(rows[:40])
        buf.extend(rows[40:])
        assert len(buf) == 95
        assert buf.spilled_rows > 0
        got = []
        while len(buf):
            got.extend(buf.take(7))
        assert got == rows

    def test_resume_with_spill(self, small_corpus, tmp_path):
        kw = dict(max_depth=4, max_wave_size=31, frontier_mem_rows=17)
        # run to completion uninterrupted
        ref = BFSCrawler(small_corpus, str(tmp_path / "ref"), num_seen_shards=4,
                         num_politeness_shards=2, **kw)
        ref.run(SEEDS, robots=ROBOTS)
        # cancel after 3 waves, then resume
        waves = {"n": 0}

        def cancel():
            waves["n"] += 1
            return waves["n"] > 3

        cr = BFSCrawler(small_corpus, str(tmp_path / "res"), num_seen_shards=4,
                        num_politeness_shards=2, **kw)
        cr.run(SEEDS, robots=ROBOTS, should_cancel=cancel)
        cr.close()
        cr2 = BFSCrawler(small_corpus, str(tmp_path / "res"), num_seen_shards=4,
                         num_politeness_shards=2, **kw)
        cr2.run(SEEDS, robots=ROBOTS, resume=True)
        assert sorted(log_tuples(cr2)) == sorted(log_tuples(ref))


class TestWarmCacheCrawl:
    """CacheMode-style warm crawl: a second run over the same corpus
    served from the first run's output must reproduce the cold crawl
    log exactly while fetching nothing for cache hits."""

    def test_warm_run_matches_cold(self, small_corpus, tmp_path):
        cold = run_engine(small_corpus, tmp_path, "cold", max_depth=4)
        warm = BFSCrawler(
            small_corpus, str(tmp_path / "warm"), num_seen_shards=4,
            num_politeness_shards=2, max_depth=4,
            cache_from=str(tmp_path / "cold"),
        )
        warm.run(SEEDS, robots=ROBOTS)
        assert log_tuples(warm) == log_tuples(cold)
        # everything except nothing was fetched: every url was a hit
        assert warm.stats_cache_hits > 0

    def test_warm_run_with_revalidation(self, small_corpus, tmp_path):
        cold = run_engine(small_corpus, tmp_path, "rcold", max_depth=3)
        warm = BFSCrawler(
            small_corpus, str(tmp_path / "rwarm"), num_seen_shards=4,
            num_politeness_shards=2, max_depth=3,
            cache_from=str(tmp_path / "rcold"), cache_revalidate=True,
        )
        warm.run(SEEDS, robots=ROBOTS)
        assert log_tuples(warm) == log_tuples(cold)

    def test_partial_cache(self, small_corpus, tmp_path):
        # cache only covers depth<=2 results; a depth-4 warm crawl
        # must fetch the rest and still match a cold depth-4 run
        shallow = run_engine(small_corpus, tmp_path, "shallow", max_depth=2)
        cold4 = run_engine(small_corpus, tmp_path, "cold4", max_depth=4)
        warm4 = BFSCrawler(
            small_corpus, str(tmp_path / "warm4"), num_seen_shards=4,
            num_politeness_shards=2, max_depth=4,
            cache_from=str(tmp_path / "shallow"),
        )
        warm4.run(SEEDS, robots=ROBOTS)
        assert log_tuples(warm4) == log_tuples(cold4)
        assert 0 < warm4.stats_cache_hits < warm4.stats.pages_crawled + 1


class TestPrefetchMode:
    """prefetch=True (reference README 'prefetch mode'): URL discovery
    only — frontier, seen set and crawl order must be IDENTICAL to a
    full crawl since the same DOM link walk runs."""

    def test_prefetch_matches_full_crawl(self, small_corpus, tmp_path):
        full = run_engine(small_corpus, tmp_path, "pf_full", max_depth=4)
        pre = BFSCrawler(
            small_corpus, str(tmp_path / "pf_pre"), num_seen_shards=4,
            num_politeness_shards=2, max_depth=4, prefetch=True,
        )
        pre.run(SEEDS, robots=ROBOTS)
        t_full, t_pre = full.crawl_log(), pre.crawl_log()
        for col in ("order", "url", "depth", "success"):
            assert t_full.column(col).to_pylist() == t_pre.column(col).to_pylist()
        assert set(pre.seen.dump()) == set(full.seen.dump())
        # prefetch parts must NOT carry the heavy columns
        import glob

        import pyarrow.parquet as pq

        part = sorted(glob.glob(str(tmp_path / "pf_pre" / "wave=*" / "part-*.parquet")))[0]
        names = pq.read_schema(part).names
        assert "links_internal" in names
        assert "raw_markdown" not in names and "cleaned_html" not in names


class TestOverlapDiscoveryMode:
    """overlap_discovery=True (scale mode): acceptance via the seen
    shards' atomic check_and_add per completion-order chunk. The
    crawled SET, per-url depth, per-wave shape and stats must equal
    the default path's exactly; only intra-wave parent/order
    attribution is relaxed (documented, like best-first wave_size)."""

    def test_set_depth_stats_equal_default(
        self, small_corpus, small_corpus_dict, tmp_path
    ):
        a = run_engine(small_corpus, tmp_path, "ov_a", max_depth=30)
        b = run_engine(
            small_corpus, tmp_path, "ov_b", max_depth=30, overlap_discovery=True
        )
        ta, tb = a.crawl_log(), b.crawl_log()
        key = lambda t: set(
            zip(
                t.column("url").to_pylist(),
                t.column("depth").to_pylist(),
                t.column("success").to_pylist(),
                t.column("status_code").to_pylist(),
            )
        )
        assert key(ta) == key(tb)
        assert set(a.seen.dump()) == set(b.seen.dump())
        assert a.stats.pages_crawled == b.stats.pages_crawled
        assert a.stats.urls_failed == b.stats.urls_failed
        assert a.stats.urls_skipped == b.stats.urls_skipped
        wa = [(w["frontier"], w["fetched"], w["successes"]) for w in a.stats.waves]
        wb = [(w["frontier"], w["fetched"], w["successes"]) for w in b.stats.waves]
        assert wa == wb

    def test_matches_simulator_set(self, small_corpus, small_corpus_dict, tmp_path):
        ref, ref_visited = sim(small_corpus_dict, max_depth=3)
        eng = run_engine(
            small_corpus, tmp_path, "ov_sim", max_depth=3, overlap_discovery=True
        )
        got = {(u, d, s, c) for _, u, d, s, c in log_tuples(eng)}
        exp = {(r.url, r.depth, r.success, r.status_code) for r in ref}
        assert got == exp
        assert set(eng.seen.dump()) == ref_visited

    def test_cancel_resume_set_equal(self, small_corpus, tmp_path):
        # overlap mode's frontier ordering is completion-dependent,
        # so resume parity is SET-level: cancel mid-crawl, resume,
        # and the final crawled set must equal an uninterrupted run
        full = run_engine(
            small_corpus, tmp_path, "ov_full", max_depth=3,
            overlap_discovery=True,
        )
        fl = {
            (u, d, s, c)
            for _, u, d, s, c in log_tuples(full)
        }
        out = str(tmp_path / "ov_int")
        part = BFSCrawler(
            small_corpus, out, num_seen_shards=4, num_politeness_shards=2,
            max_depth=3, overlap_discovery=True,
        )
        flags = iter([False, False] + [True] * 30)
        part.run(SEEDS, robots=ROBOTS, should_cancel=lambda: next(flags))
        part.close()
        res = BFSCrawler(
            small_corpus, out, num_seen_shards=4, num_politeness_shards=2,
            max_depth=3, overlap_discovery=True,
        )
        res.run([], robots=ROBOTS, resume=True)
        rl = {
            (u, d, s, c)
            for _, u, d, s, c in log_tuples(res)
        }
        assert rl == fl
        res.close()

    def test_warm_cache_set_equal(self, small_corpus, tmp_path):
        # overlap mode + warm cache: cached rows fold as the final
        # chunk; the crawled set must still equal a cold default run
        cold = run_engine(small_corpus, tmp_path, "ov_ccold", max_depth=4)
        warm = BFSCrawler(
            small_corpus, str(tmp_path / "ov_cwarm"), num_seen_shards=4,
            num_politeness_shards=2, max_depth=4,
            cache_from=str(tmp_path / "ov_ccold"), overlap_discovery=True,
        )
        warm.run(SEEDS, robots=ROBOTS)
        key = lambda t: {(u, d, s, c) for _, u, d, s, c in t}
        assert key(log_tuples(warm)) == key(log_tuples(cold))
        assert warm.stats_cache_hits > 0
