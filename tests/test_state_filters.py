"""Bloom / Cuckoo filter invariants (design precedent:
crawl4ai/deep_crawling/crazy.py:102-165)."""

import pytest

from crawl4ai_ray.state.filters import BloomFilter, CuckooFilter


class TestBloom:
    def test_no_false_negatives(self):
        f = BloomFilter(10_000, 0.01)
        items = [f"https://site-{i}.example.com/page/{i}" for i in range(5000)]
        for it in items:
            f.add(it)
        assert all(it in f for it in items)

    def test_fp_rate_reasonable(self):
        f = BloomFilter(10_000, 0.01)
        for i in range(10_000):
            f.add(f"in-{i}")
        fps = sum(1 for i in range(10_000) if f"out-{i}" in f)
        assert fps < 400  # ~1% target, generous bound

    def test_cardinality_estimate(self):
        f = BloomFilter(10_000, 0.01)
        for i in range(3000):
            f.add(f"x-{i}")
        est = f.estimated_cardinality()
        assert 2400 < est < 3600

    def test_serialize_roundtrip(self):
        f = BloomFilter(1000)
        for i in range(500):
            f.add(f"k{i}")
        g = BloomFilter.from_bytes(f.to_bytes())
        assert all(f"k{i}" in g for i in range(500))
        assert g.count == f.count


class TestCuckoo:
    def test_no_false_negatives(self):
        f = CuckooFilter(10_000)
        items = [f"https://site-{i % 16}.example.com/page/{i}" for i in range(8000)]
        ok = [f.add(it) for it in items]
        assert all(ok)
        assert all(it in f for it in items)

    def test_delete(self):
        f = CuckooFilter(1000)
        f.add("a")
        f.add("b")
        assert "a" in f
        assert f.delete("a")
        # "a" may still collide with "b"'s fingerprint only with ~2^-16 prob
        assert "b" in f
        assert f.count == 1

    def test_fp_rate(self):
        f = CuckooFilter(20_000)
        for i in range(10_000):
            f.add(f"in-{i}")
        fps = sum(1 for i in range(10_000) if f"out-{i}" in f)
        assert fps < 100  # 16-bit fingerprints → ~0.1% expected

    def test_serialize_roundtrip_deterministic(self):
        f = CuckooFilter(4000)
        for i in range(3000):
            f.add(f"k{i}")
        g = CuckooFilter.from_bytes(f.to_bytes())
        assert (g.table == f.table).all()
        # continued inserts replay identically (deterministic eviction)
        f.add("next-1")
        g.add("next-1")
        assert (g.table == f.table).all()

    def test_full_table_returns_false(self):
        f = CuckooFilter(8)  # tiny
        results = [f.add(f"v{i}") for i in range(200)]
        assert not all(results)  # must eventually report full, not loop forever


import numpy as np


class TestHotHostSkew:
    """Hot-host behavior: one host dominating the frontier must (a)
    keep a strictly serialized per-host virtual schedule, (b) respect
    per-host page budgets exactly, (c) not affect other hosts'
    schedules — the skew contract SURVEY §4 documents."""

    def test_release_serializes_per_host(self, ray_session):
        from crawl4ai_ray.state.politeness import PolitenessPool

        pool = PolitenessPool(num_shards=4)
        hot = "hot.example.com"
        urls = [f"https://{hot}/p/{i}" for i in range(200)] + [
            "https://cold.example.com/x"
        ]
        hosts = [hot] * 200 + ["cold.example.com"]
        gate = pool.gate(urls, hosts)
        rel_hot = gate["release"][:200]
        assert (np.diff(rel_hot) > 0).all()  # strictly increasing
        # cold host schedule independent of the hot host's backlog
        assert gate["release"][200] < rel_hot[-1]
        pool.close()

    def test_per_host_budget_exact(self, ray_session):
        from crawl4ai_ray.state.politeness import PolitenessPool

        pool = PolitenessPool(num_shards=2, max_pages_per_host=25)
        hot = "hot.example.com"
        urls = [f"https://{hot}/p/{i}" for i in range(100)]
        gate = pool.gate(urls, [hot] * 100)
        assert int(gate["budget_ok"].sum()) == 25
        # second wave: budget already exhausted
        gate2 = pool.gate(urls[:10], [hot] * 10)
        assert int(gate2["budget_ok"].sum()) == 0
        pool.close()

    def test_skewed_crawl_completes(self, ray_session, small_corpus, tmp_path):
        """Seed 90% of the frontier on one host — the crawl must
        complete and per-host counts stay within budget."""
        from crawl4ai_ray.pipelines.crawl import BFSCrawler
        from crawl4ai_ray.sources import corpus as C

        seeds = [f"https://site-0.example.com/page/{i*16}" for i in range(18)] + [
            "https://site-1.example.com/page/1",
            "https://site-2.example.com/page/2",
        ]
        robots = {C.host_name(h): C.robots_body(h) for h in range(C.N_HOSTS)}
        cr = BFSCrawler(
            small_corpus, str(tmp_path), max_depth=1, max_pages_per_host=5
        )
        st = cr.run(seeds, robots=robots)
        log = cr.crawl_log().to_pandas()
        ok = log[log["success"]]
        hosts = ok["url"].str.split("//").str[1].str.split("/").str[0]
        assert (hosts.value_counts() <= 5).all()
        cr.close()


class TestRateLimiterBackoff:
    """Reference RateLimiter semantics (async_dispatcher.py:65-85):
    429/503 doubles the delay (+/-25% jitter) capped at max_delay;
    success decays x0.75 floored at the base delay."""

    def test_backoff_doubles_and_caps(self, ray_session):
        from crawl4ai_ray.state.politeness import PolitenessPool

        pool = PolitenessPool(num_shards=1)
        h = "h.example.com"
        pool.gate([f"https://{h}/a"], [h])  # establishes current_delay
        d0 = pool.stats()["politeness_makespan_sec"]
        for _ in range(12):  # repeated 429s must saturate at the cap
            pool.update([h], [429])
        pool.gate([f"https://{h}/b"], [h])
        stats = pool.stats()
        # a single additional gated url advanced next_free by the
        # (capped) delay: strictly more than the initial schedule,
        # bounded by the 60s cap + initial
        assert stats["politeness_makespan_sec"] > d0
        assert stats["politeness_makespan_sec"] <= d0 + 60.0 + 1e-6
        pool.close()

    def test_success_decays_toward_base(self, ray_session):
        from crawl4ai_ray.state.politeness import PolitenessPool

        pool = PolitenessPool(num_shards=1)
        h = "h.example.com"
        pool.gate([f"https://{h}/a"], [h])
        for _ in range(6):
            pool.update([h], [429])
        t_backed = pool.stats()["politeness_makespan_sec"]
        for _ in range(40):  # long success streak -> decay to base
            pool.update([h], [200])
        pool.gate([f"https://{h}/b"], [h])
        t_after = pool.stats()["politeness_makespan_sec"]
        # the post-decay increment is far below the backed-off delay
        assert (t_after - t_backed) < 5.0
        pool.close()


class TestRobotsParser:
    """RFC 9309 semantics of the robots.txt parser (reference
    RobotsParser, utils.py:252-377: allow-on-error, agent-* scope)."""

    def test_longest_match_wins(self):
        from crawl4ai_ray.state.politeness import can_fetch, parse_robots

        rules = parse_robots(
            "User-agent: *\nDisallow: /private\nAllow: /private/public"
        )
        assert not can_fetch(rules, "/private/secret")
        assert can_fetch(rules, "/private/public/page")
        assert can_fetch(rules, "/open")

    def test_allow_wins_equal_length_ties(self):
        from crawl4ai_ray.state.politeness import can_fetch, parse_robots

        # same prefix length, disallow listed first: allow must win
        rules = parse_robots("User-agent: *\nDisallow: /a/\nAllow: /b/")
        r2 = parse_robots("User-agent: *\nDisallow: /x\nAllow: /x")
        assert can_fetch(r2, "/x/anything")

    def test_other_agent_sections_ignored(self):
        from crawl4ai_ray.state.politeness import can_fetch, parse_robots

        rules = parse_robots(
            "User-agent: badbot\nDisallow: /\n\nUser-agent: *\nAllow: /\n"
        )
        assert can_fetch(rules, "/anything")

    def test_comments_and_noise(self):
        from crawl4ai_ray.state.politeness import can_fetch, parse_robots

        rules = parse_robots(
            "# banner\nUser-agent: * # all\nDisallow: /tmp # scratch\nnot-a-line\n"
        )
        assert not can_fetch(rules, "/tmp/x")
        assert can_fetch(rules, "/ok")

    def test_empty_allows_everything(self):
        from crawl4ai_ray.state.politeness import can_fetch, parse_robots

        assert can_fetch(parse_robots(""), "/whatever")

    def test_crawl_delay(self):
        from crawl4ai_ray.state.politeness import robots_crawl_delay

        assert robots_crawl_delay("User-agent: *\nCrawl-delay: 2.5\n") == 2.5
        assert robots_crawl_delay("User-agent: *\nCrawl-delay: nope\n") is None
        assert robots_crawl_delay("User-agent: *\n") is None


class TestGatePathExtraction:
    def test_matches_urlparse(self):
        from urllib.parse import urlparse

        from crawl4ai_ray.state.politeness import _paths_of

        cases = [
            "https://a.b/x/y?q=1#f", "http://a.b", "https://a.b/",
            "https://u:p@h.co:8/p;x?y", "http://a.b#f",
            "https://a.b/deep/path/page.html", "HTTP://A.B/Case",
            "https://a.b/a;b/c", "https://a.b/a/c;p=1",
            "https://a.b/;only", "//h.co/x", "/rel/p", "https://a.b/%20x",
        ]
        assert _paths_of(cases) == [urlparse(c).path or "/" for c in cases]
