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
