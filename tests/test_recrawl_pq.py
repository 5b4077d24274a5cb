"""Round-5 additions: recrawl scheduler (Cho & Garcia-Molina change-rate
estimation) and product-quantization ANN."""

import numpy as np

SF = "/root/testdata/sf0.001"


class TestRecrawlSchedule:
    def test_oracle_parity(self, ray_session):
        import duckdb

        from crawl4ai_ray.pipelines.oracles import ORACLES
        from crawl4ai_ray.pipelines.recrawl import recrawl_schedule

        got = recrawl_schedule(SF)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        exp = con.execute(ORACLES["recrawl_schedule"]).fetchdf()
        assert list(got["doc_id"]) == list(exp["doc_id"])
        assert list(got["n_changes"]) == list(exp["n_changes"])
        np.testing.assert_allclose(got["lambda_hat"], exp["lambda_hat"], atol=1e-12)
        np.testing.assert_allclose(
            got["recrawl_interval"], exp["recrawl_interval"], atol=1e-12
        )

    def test_estimator_edges(self, ray_session):
        from crawl4ai_ray.pipelines.recrawl import (
            MAX_INTERVAL,
            MIN_INTERVAL,
            recrawl_schedule,
        )

        got = recrawl_schedule(SF)
        # never-changed pages pin to the max revisit interval, and the
        # rate is +0.0 (not -0.0, which would flip 1/lam to -inf)
        still = got[got["n_changes"] == 0]
        assert len(still) and (still["recrawl_interval"] == MAX_INTERVAL).all()
        assert all(str(v) == "0.0" for v in still["lambda_hat"])
        hot = got[got["n_changes"] == 3]
        assert len(hot) and (hot["recrawl_interval"] >= MIN_INTERVAL).all()
        # rate is monotone in observed changes
        by_x = got.groupby("n_changes")["lambda_hat"].first()
        assert by_x.is_monotonic_increasing

    def test_bucket_invariance(self, ray_session):
        from crawl4ai_ray.pipelines.recrawl import recrawl_schedule

        a = recrawl_schedule(SF, buckets=4)
        b = recrawl_schedule(SF, buckets=64)
        assert a.equals(b)


class TestPqTopk:
    def test_recall_vs_brute(self, ray_session):
        from crawl4ai_ray.pipelines.similarity import (
            brute_topk,
            pq_topk,
            recall_at_k,
        )

        for qid in (0, 7):
            exact = brute_topk(SF, query_id=qid, k=10)
            approx = pq_topk(SF, query_id=qid, k=10)
            assert recall_at_k(approx, exact) >= 0.7

    def test_deterministic(self, ray_session):
        from crawl4ai_ray.pipelines.similarity import pq_topk

        a = pq_topk(SF, query_id=3, k=10)
        b = pq_topk(SF, query_id=3, k=10)
        assert a.equals(b)

    def test_codes_shape_and_compression(self):
        from crawl4ai_ray.pipelines.similarity import _pq_codes, train_pq

        rng = np.random.default_rng(5)
        sample = rng.normal(size=(256, 64))
        books = train_pq(sample, m=8, ks=16)
        assert books.shape == (8, 16, 8)
        codes = _pq_codes(sample, books)
        assert codes.shape == (256, 8) and codes.dtype == np.uint8
        assert codes.max() < 16
        # reconstruction beats a zero-vector baseline comfortably
        recon = np.concatenate(
            [books[j][codes[:, j]] for j in range(8)], axis=1
        )
        err = ((sample - recon) ** 2).sum()
        assert err < 0.9 * (sample**2).sum()


class TestTrapStats:
    def test_oracle_parity(self, ray_session):
        import duckdb

        from crawl4ai_ray.pipelines.oracles import ORACLES
        from crawl4ai_ray.pipelines.traps import trap_stats

        got = trap_stats(SF)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        exp = con.execute(ORACLES["trap_stats"]).fetchdf()
        assert list(got["host"]) == list(exp["host"])
        assert list(got["n_urls"]) == list(exp["n_urls"])
        assert list(got["n_templates"]) == list(exp["n_templates"])
        np.testing.assert_allclose(got["trap_score"], exp["trap_score"], atol=1e-12)

    def test_detects_trap_host(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from crawl4ai_ray.pipelines.traps import url_trap_stats

        # trappy host: 200 calendar urls, one template; clean host:
        # 6 urls with distinct path shapes
        trappy = [
            f"https://cal.example.com/events/2024/{m:02d}/{d:02d}"
            for m in range(1, 11)
            for d in range(1, 21)
        ]
        clean = [
            "https://ok.example.com/about",
            "https://ok.example.com/contact-us",
            "https://ok.example.com/products/widget",
            "https://ok.example.com/blog/why-we-crawl",
            "https://ok.example.com/team",
            "https://ok.example.com/session/a1b2c3d4e5f60789",
        ]
        ds = rd.from_arrow(pa.table({"url": pa.array(trappy + clean)}))
        out = url_trap_stats(ds, buckets=8).set_index("host")
        assert out.loc["cal.example.com", "n_templates"] == 1
        assert out.loc["cal.example.com", "trap_score"] > 0.99
        # the hex session id collapses to H but the other 5 paths stay
        # distinct -> low trap score
        assert out.loc["ok.example.com", "n_templates"] == 6
        assert out.loc["ok.example.com", "trap_score"] == 0.0

    def test_bucket_invariance(self, ray_session):
        from crawl4ai_ray.pipelines.traps import corpus_url_census, url_trap_stats

        a = url_trap_stats(corpus_url_census(SF), buckets=4)
        b = url_trap_stats(corpus_url_census(SF), buckets=128)
        assert a.equals(b)


class TestHostPagerank:
    def test_oracle_parity(self, ray_session):
        import duckdb

        from crawl4ai_ray.pipelines.oracles import ORACLES
        from crawl4ai_ray.pipelines.pagerank import host_pagerank

        got = host_pagerank(SF, iters=3)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        exp = con.execute(ORACLES["host_pagerank"]).fetchdf()
        assert list(got["host"]) == list(exp["host"])
        np.testing.assert_allclose(got["pr"], exp["pr"], atol=1e-9)

    def test_probability_mass_and_shape(self, ray_session):
        from crawl4ai_ray.pipelines.pagerank import host_pagerank

        got = host_pagerank(SF, iters=5)
        assert len(got) == 16 and (got["pr"] > 0).all()
        # no dangling hosts (asserted internally) -> mass conserved
        # (each of the 16 values is rounded to 6 decimals)
        assert abs(got["pr"].sum() - 1.0) < 1e-5


class TestCcnetBuckets:
    def test_oracle_parity(self, ray_session):
        import duckdb

        from crawl4ai_ray.pipelines.ccnet import ccnet_buckets
        from crawl4ai_ray.pipelines.oracles import ORACLES

        got = ccnet_buckets(SF)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        exp = con.execute(ORACLES["ccnet_buckets"]).fetchdf()
        assert list(got["doc_id"]) == list(exp["doc_id"])
        assert list(got["bucket"]) == list(exp["bucket"])
        np.testing.assert_allclose(got["ppl"], exp["ppl"], atol=1e-9)

    def test_tercile_sizes_per_lang(self, ray_session):
        from crawl4ai_ray.pipelines.ccnet import _cut_ranks, ccnet_buckets

        got = ccnet_buckets(SF)
        for _lang, grp in got.groupby("lang"):
            n = len(grp)
            k1, k2 = _cut_ranks(n)
            sizes = grp["bucket"].value_counts()
            assert sizes.get("head", 0) == k1
            assert sizes.get("middle", 0) == k2 - k1
            assert sizes.get("tail", 0) == n - k2

    def test_duplicate_texts_tie_break(self, ray_session, tmp_path):
        import os

        import pandas as pd

        # exact duplicate texts -> identical ppl; the doc_id tie-break
        # must split them deterministically across the cut
        docs = pd.DataFrame(
            {
                "doc_id": range(6),
                "lang": ["en"] * 6,
                "text": ["same words here"] * 6,
            }
        )
        docs.to_parquet(os.path.join(tmp_path, "documents.parquet"), index=False)
        from crawl4ai_ray.pipelines.ccnet import ccnet_buckets

        got = ccnet_buckets(str(tmp_path))
        assert list(got["bucket"]) == [
            "head", "head", "middle", "middle", "tail", "tail",
        ]
