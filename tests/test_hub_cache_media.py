"""CrawlerHub registry, cache anti-join semantics, audio/video
multimodal stages, LLM seams."""

import numpy as np
import pyarrow as pa
import pytest

from crawl4ai_ray.pipelines import hub
from crawl4ai_ray.pipelines.cache import (
    CacheMode,
    read_cached_results,
    split_cached,
)
from crawl4ai_ray.stages.llm import LLMContentFilterStage, LLMExtractionStage
from crawl4ai_ray.stages.multimodal import (
    AudioFeatureStage,
    VideoFrameSampleStage,
    synth_audio_table,
    synth_video_table,
)


class TestHub:
    def test_builtin_names(self):
        assert {"bfs", "best_first", "dfs", "adaptive"} <= set(hub.names())

    def test_get_unknown_raises_with_choices(self):
        with pytest.raises(KeyError, match="available"):
            hub.get("nope")

    def test_factory_builds_engine(self, ray_session, small_corpus, tmp_path):
        from crawl4ai_ray.sources import corpus as C

        eng = hub.get("bfs")(small_corpus, str(tmp_path), max_depth=1)
        robots = {C.host_name(h): C.robots_body(h) for h in range(C.N_HOSTS)}
        st = eng.run(C.seed_urls(), robots=robots)
        assert st.pages_crawled > 0
        eng.close()

    def test_user_registration_wins(self):
        hub.register("custom", lambda c, o, **kw: ("custom", c, o))
        assert hub.get("custom")("x", "y")[0] == "custom"


class TestCache:
    def _crawl(self, corpus, out):
        from crawl4ai_ray.pipelines.crawl import BFSCrawler
        from crawl4ai_ray.sources import corpus as C

        cr = BFSCrawler(corpus, out, max_depth=1)
        robots = {C.host_name(h): C.robots_body(h) for h in range(C.N_HOSTS)}
        cr.run(C.seed_urls(), robots=robots)
        cr.close()

    def test_split_and_read(self, ray_session, small_corpus, tmp_path):
        from crawl4ai_ray.sources import corpus as C

        out = str(tmp_path / "results")
        self._crawl(small_corpus, out)
        frontier = pa.table(
            {"url": pa.array(C.seed_urls() + ["https://nowhere.example.com/x"])}
        )
        to_fetch, cached = split_cached(frontier, out, CacheMode.ENABLED)
        assert cached.num_rows == len(C.seed_urls())
        assert to_fetch.num_rows == 1
        rows = read_cached_results(out, cached.column("url"), columns=["url", "success"])
        assert rows.num_rows == len(C.seed_urls())

    def test_bypass_fetches_everything(self, ray_session, small_corpus, tmp_path):
        from crawl4ai_ray.sources import corpus as C

        out = str(tmp_path / "results")
        self._crawl(small_corpus, out)
        frontier = pa.table({"url": pa.array(C.seed_urls())})
        to_fetch, cached = split_cached(frontier, out, CacheMode.BYPASS)
        assert to_fetch.num_rows == frontier.num_rows
        assert cached.num_rows == 0

    def test_empty_cache_dir(self, tmp_path):
        frontier = pa.table({"url": pa.array(["https://a.b/c"])})
        to_fetch, cached = split_cached(frontier, str(tmp_path), CacheMode.ENABLED)
        assert to_fetch.num_rows == 1 and cached.num_rows == 0


class TestAudioVideo:
    def test_audio_features(self):
        stage = AudioFeatureStage()
        out = stage(synth_audio_table(8))
        assert out.num_rows == 8
        assert out.column("rms").to_pylist() == pytest.approx(
            AudioFeatureStage()(synth_audio_table(8)).column("rms").to_pylist()
        )
        assert all(0 < v < 1 for v in out.column("rms").to_pylist())
        assert all(v > 0 for v in out.column("spectral_centroid_hz").to_pylist())

    def test_video_frame_sampling(self):
        stage = VideoFrameSampleStage(every_k=10)
        t = synth_video_table(4)
        out = stage(t)
        expected = sum(-(-nf // 10) for nf in t.column("n_frames").to_pylist())
        assert out.num_rows == expected
        assert out.column("frame").to_pylist()[:3] == [0, 10, 20]

    def test_actor_pool_runs(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(synth_audio_table(16))
        out = ds.map_batches(
            AudioFeatureStage, batch_format="pyarrow", concurrency=2, batch_size=4
        ).to_pandas()
        assert len(out) == 16


class TestLLMSeams:
    def test_raises_without_endpoint(self):
        stage = LLMExtractionStage("extract titles")
        with pytest.raises(NotImplementedError, match="inject complete="):
            stage(pa.table({"url": ["u"], "text": ["some text"]}))

    def test_injected_fake_completion(self):
        stage = LLMExtractionStage(
            "extract", complete=lambda p: f"FAKE({len(p)})", chunk_token_threshold=8
        )
        out = stage(
            pa.table({"url": ["u"], "text": ["para one\n\npara two\n\npara three"]})
        )
        assert out.num_rows >= 1
        assert all(x.startswith("FAKE(") for x in out.column("extracted").to_pylist())
        assert stage.usage.total_tokens > 0

    def test_content_filter_seam(self):
        stage = LLMContentFilterStage(complete=lambda p: "filtered")
        out = stage(pa.table({"url": ["u"], "raw_markdown": ["# doc"]}))
        assert out.column("fit_markdown_llm").to_pylist() == ["filtered"]


class TestSmartCacheValidation:
    """Reference cache_validator.py semantics over the corpus probe."""

    def _cached_row(self, p, ts=None, fp=None):
        import pyarrow as pa

        from crawl4ai_ray.sources import corpus as C

        cols = {"url": [C.page_url(p)]}
        if ts is not None:
            cols["warc_ts"] = pa.array([ts], pa.timestamp("us"))
        if fp is not None:
            cols["head_fingerprint"] = [fp]
        return pa.table(cols)

    def test_fresh_by_timestamp(self, small_corpus):
        import pyarrow.parquet as pq

        from crawl4ai_ray.pipelines.cache import revalidate_cached
        from crawl4ai_ray.sources import corpus as C

        # stored ts == live ts -> FRESH without touching the fingerprint
        live = pq.read_table(small_corpus, columns=["url", "warc_ts"])
        ts = live.column("warc_ts")[10].as_py()
        import pyarrow as pa
        t = pa.table({
            "url": [live.column("url")[10].as_py()],
            "warc_ts": pa.array([ts], pa.timestamp("us")),
        })
        out = revalidate_cached(t, small_corpus)
        assert out.column("validation").to_pylist() == ["fresh"]

    def test_stale_by_timestamp_then_fingerprint(self, small_corpus):
        import datetime

        import pyarrow as pa

        from crawl4ai_ray.functions.page_utils import compute_head_fingerprint
        from crawl4ai_ray.pipelines.cache import revalidate_cached
        from crawl4ai_ray.sources import corpus as C
        import pyarrow.parquet as pq

        live = pq.read_table(small_corpus, columns=["url", "html"])
        url = live.column("url")[5].as_py()
        html = bytes(live.column("html")[5].as_py()).decode()
        head = html[: html.find("</head>") + 7]
        good_fp = compute_head_fingerprint(head)
        old_ts = datetime.datetime(2020, 1, 1)
        # wrong ts but matching fingerprint -> FRESH (layer 4 catches it)
        t = pa.table({
            "url": [url],
            "warc_ts": pa.array([old_ts], pa.timestamp("us")),
            "head_fingerprint": [good_fp],
        })
        assert revalidate_cached(t, small_corpus).column("validation").to_pylist() == ["fresh"]
        # wrong ts and wrong fingerprint -> STALE
        t2 = pa.table({
            "url": [url],
            "warc_ts": pa.array([old_ts], pa.timestamp("us")),
            "head_fingerprint": ["deadbeef"],
        })
        assert revalidate_cached(t2, small_corpus).column("validation").to_pylist() == ["stale"]

    def test_unknown_without_validators(self, small_corpus):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from crawl4ai_ray.pipelines.cache import revalidate_cached

        live = pq.read_table(small_corpus, columns=["url"])
        t = pa.table({"url": [live.column("url")[0].as_py()]})
        assert revalidate_cached(t, small_corpus).column("validation").to_pylist() == ["unknown"]

    def test_vanished_url_is_stale(self, small_corpus):
        import pyarrow as pa

        from crawl4ai_ray.pipelines.cache import revalidate_cached

        t = pa.table({"url": ["https://site-0.example.com/page/99999999"]})
        assert revalidate_cached(t, small_corpus).column("validation").to_pylist() == ["stale"]
