"""AsyncCrawler (pipelines/async_crawl.py): the barrier-free
continuously-fed engine must produce the same crawled SET, success
set, robots-denied count and failure totals as the wave-barriered
BFSCrawler on an exhaustive crawl (the documented parity envelope:
max_pages=inf, max_depth not truncating reachability)."""

import os

import pyarrow.parquet as pq
import pytest

from crawl4ai_ray.pipelines.async_crawl import AsyncCrawler
from crawl4ai_ray.pipelines.crawl import BFSCrawler
from crawl4ai_ray.sources import corpus as C


def _bfs_reference(small_corpus, tmp_path, robots, **kw):
    cr = BFSCrawler(small_corpus, str(tmp_path / "bfs"), **kw)
    stats = cr.run(C.seed_urls(), robots=robots)
    log = cr.crawl_log().to_pandas()
    cr.close()
    return stats, log


@pytest.fixture(scope="module")
def robots():
    return {C.host_name(h): C.robots_body(h) for h in range(C.N_HOSTS)}


class TestAsyncSetParity:
    def test_exhaustive_set_equals_bfs(
        self, ray_session, small_corpus, tmp_path, robots
    ):
        kw = dict(max_depth=30)
        stats, log = _bfs_reference(small_corpus, tmp_path, robots, **kw)
        bfs_success = set(log[log.success]["url"])

        ac = AsyncCrawler(
            small_corpus, str(tmp_path / "async"), max_depth=30, batch_size=64
        )
        ac.run(C.seed_urls(), robots=robots)
        got = set(ac.crawled_urls())
        assert got == bfs_success
        assert ac.pages_crawled == stats.pages_crawled
        assert ac.urls_failed + ac.urls_denied == stats.urls_failed
        ac.close()

    def test_small_inflight_pool_still_exhausts(
        self, ray_session, small_corpus, tmp_path, robots
    ):
        stats, log = _bfs_reference(
            small_corpus, tmp_path, robots, max_depth=30
        )
        ac = AsyncCrawler(
            small_corpus,
            str(tmp_path / "tiny"),
            max_depth=30,
            batch_size=16,
            max_inflight=2,
        )
        ac.run(C.seed_urls(), robots=robots)
        assert set(ac.crawled_urls()) == set(log[log.success]["url"])
        ac.close()

    def test_depth_cap_subset_of_reachable(
        self, ray_session, small_corpus, tmp_path, robots
    ):
        """With a binding max_depth the async set is documented as a
        SUBSET of BFS's (first-discovery depth >= shortest-path
        depth); every crawled url must still be BFS-reachable at an
        unbounded depth."""
        _, full_log = _bfs_reference(
            small_corpus, tmp_path, robots, max_depth=30
        )
        reachable = set(full_log[full_log.success]["url"])
        ac = AsyncCrawler(
            small_corpus, str(tmp_path / "cap"), max_depth=2, batch_size=32
        )
        ac.run(C.seed_urls(), robots=robots)
        got = set(ac.crawled_urls())
        assert got and got <= reachable
        ac.close()

    def test_max_pages_dispatch_cap(
        self, ray_session, small_corpus, tmp_path, robots
    ):
        ac = AsyncCrawler(
            small_corpus,
            str(tmp_path / "capped"),
            max_depth=30,
            max_pages=40,
            batch_size=16,
            max_inflight=2,
        )
        ac.run(C.seed_urls(), robots=robots)
        # cap is dispatch-level: no new chunk once 40 rows dispatched,
        # so overshoot is bounded by one chunk (< batch_size)
        assert 40 <= ac.pages_crawled < 40 + 16
        ac.close()

    def test_cancel_checkpoint_resume_equals_uninterrupted(
        self, ray_session, small_corpus, tmp_path, robots
    ):
        """Epoch checkpointing: cancel mid-crawl, resume in a NEW
        engine object, final crawled set equals the exhaustive BFS
        set with no url crawled twice across part files."""
        _, log = _bfs_reference(small_corpus, tmp_path, robots, max_depth=30)
        expected = set(log[log.success]["url"])
        out = str(tmp_path / "ckpt")
        flags = iter([False] * 6 + [True] * 100000)
        ac = AsyncCrawler(
            small_corpus, out, max_depth=30, batch_size=32,
            checkpoint_pages=40,
        )
        ac.run(C.seed_urls(), robots=robots, should_cancel=lambda: next(flags))
        assert ac.cancelled
        partial = set(ac.crawled_urls())
        assert partial < expected
        ac.close()

        ac2 = AsyncCrawler(
            small_corpus, out, max_depth=30, batch_size=32,
            checkpoint_pages=40,
        )
        ac2.run([], robots=robots, resume=True)
        assert not ac2.cancelled
        wave_dir = os.path.join(out, "wave=00000")
        urls = []
        for name in sorted(os.listdir(wave_dir)):
            if name.startswith("part-"):
                t = pq.read_table(os.path.join(wave_dir, name), columns=["url"])
                urls.extend(t.column("url").to_pylist())
        assert len(urls) == len(set(urls)), "a url was crawled twice"
        assert set(ac2.crawled_urls()) == expected
        assert ac2.pages_crawled == len(expected)
        ac2.close()

    def test_crash_replay_drops_unmanifested_parts(
        self, ray_session, small_corpus, tmp_path, robots
    ):
        """A part file the manifest does not name (written between the
        last epoch snapshot and a crash) must be deleted at restore
        and its work re-crawled — the SIGKILL replay path."""
        import pyarrow as pa

        _, log = _bfs_reference(small_corpus, tmp_path, robots, max_depth=30)
        expected = set(log[log.success]["url"])
        out = str(tmp_path / "crash")
        flags = iter([False] * 6 + [True] * 100000)
        ac = AsyncCrawler(
            small_corpus, out, max_depth=30, batch_size=32,
            checkpoint_pages=30,
        )
        ac.run(C.seed_urls(), robots=robots, should_cancel=lambda: next(flags))
        ac.close()
        # forge post-snapshot output from a "crashed" run: a part the
        # manifest does not name, holding a url outside the real set
        wave_dir = os.path.join(out, "wave=00000")
        fake = pa.table(
            {
                "url": pa.array(["https://site-0.example.com/page/999999"]),
                "success": pa.array([True]),
            }
        )
        pq.write_table(fake, os.path.join(wave_dir, "part-999999999900-1.parquet"))

        ac2 = AsyncCrawler(
            small_corpus, out, max_depth=30, batch_size=32,
            checkpoint_pages=30,
        )
        ac2.run([], robots=robots, resume=True)
        got = set(ac2.crawled_urls())
        assert "https://site-0.example.com/page/999999" not in got
        assert got == expected
        ac2.close()

    def test_spilled_frontier_same_set(
        self, ray_session, small_corpus, tmp_path, robots
    ):
        """frontier_mem_rows far below the frontier size forces the
        pending queue through Parquet spill runs; crawled set and
        checkpoint/resume behavior must be unchanged."""
        _, log = _bfs_reference(small_corpus, tmp_path, robots, max_depth=30)
        expected = set(log[log.success]["url"])
        out = str(tmp_path / "spill")
        flags = iter([False] * 6 + [True] * 100000)
        ac = AsyncCrawler(
            small_corpus, out, max_depth=30, batch_size=32,
            checkpoint_pages=40, frontier_mem_rows=64,
        )
        ac.run(C.seed_urls(), robots=robots, should_cancel=lambda: next(flags))
        assert ac.cancelled
        ac.close()
        ac2 = AsyncCrawler(
            small_corpus, out, max_depth=30, batch_size=32,
            checkpoint_pages=40, frontier_mem_rows=64,
        )
        ac2.run([], robots=robots, resume=True)
        assert set(ac2.crawled_urls()) == expected
        assert not os.path.exists(os.path.join(out, "frontier_spill"))
        ac2.close()

    def test_parts_on_disk_match_stats(
        self, ray_session, small_corpus, tmp_path, robots
    ):
        ac = AsyncCrawler(
            small_corpus, str(tmp_path / "disk"), max_depth=30, batch_size=64
        )
        ac.run(C.seed_urls(), robots=robots)
        wave_dir = os.path.join(str(tmp_path / "disk"), "wave=00000")
        n = 0
        for name in sorted(os.listdir(wave_dir)):
            if name.startswith("part-"):
                t = pq.read_table(os.path.join(wave_dir, name), columns=["success"])
                n += int(sum(t.column("success").to_pylist()))
        assert n == ac.pages_crawled
        assert not any(x.endswith(".tmp") for x in os.listdir(str(tmp_path / "disk")))
        ac.close()
