"""Similarity search (brute/LSH/IVF) and exact n-gram Jaccard dedup."""

import itertools

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(ray_session):
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist())
    mat = np.vstack(t.column("embedding").to_pylist()).astype(np.float64)
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat / np.where(n == 0, 1, n)


def exact_topk(ids, mat_n, qid=0, k=10):
    q = mat_n[list(ids).index(qid)]
    sims = mat_n @ q
    order = np.lexsort((ids, -sims))
    return list(ids[order][:k])


class TestANN:
    def test_brute_matches_numpy(self, ray_session, emb):
        from crawl4ai_ray.pipelines.similarity import brute_topk

        ids, mat_n = emb
        got = brute_topk(SF, query_id=0, k=10)["vec_id"].tolist()
        assert got == exact_topk(ids, mat_n)

    def test_embedding_matrix_zero_copy_path(self, ray_session, emb):
        from crawl4ai_ray.pipelines.similarity import embedding_matrix

        t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
        m = embedding_matrix(t)
        ref = np.vstack(t.column("embedding").to_pylist()).astype(np.float64)
        assert np.allclose(m, ref)

    def test_lsh_recall(self, ray_session, emb):
        from crawl4ai_ray.pipelines.similarity import lsh_topk, recall_at_k

        ids, mat_n = emb
        exact = pd.DataFrame({"vec_id": exact_topk(ids, mat_n)})
        approx = lsh_topk(SF, query_id=0, k=10)
        assert recall_at_k(approx, exact) >= 0.7

    def test_ivf_recall(self, ray_session, emb):
        from crawl4ai_ray.pipelines.similarity import ivf_topk, recall_at_k

        ids, mat_n = emb
        exact = pd.DataFrame({"vec_id": exact_topk(ids, mat_n)})
        approx = ivf_topk(SF, query_id=0, k=10)
        assert recall_at_k(approx, exact) >= 0.7

    def test_multi_brute_matches_per_query_brute(self, ray_session, emb):
        """One-scan batch ANN == per-query single-scan ANN, all queries."""
        from crawl4ai_ray.pipelines.similarity import (
            brute_multi_topk,
            brute_topk,
        )

        qids = [0, 3, 6, 9]
        multi = brute_multi_topk(SF, qids, k=10)
        for q in qids:
            single = brute_topk(SF, query_id=q, k=10)["vec_id"].tolist()
            got = multi[multi["query_id"] == q]["vec_id"].tolist()
            assert got == single, q
        ids, mat_n = emb
        assert multi[multi["query_id"] == 0]["vec_id"].tolist() == exact_topk(
            ids, mat_n, qid=0
        )

    def test_multi_lsh_recall_and_pair_dedup(self, ray_session, emb):
        from crawl4ai_ray.pipelines.similarity import (
            brute_multi_topk,
            lsh_multi_topk,
        )

        qids = [0, 3, 6, 9, 12]
        exact = brute_multi_topk(SF, qids, k=10)
        approx = lsh_multi_topk(SF, qids, k=10)
        # no duplicate (query, vec) pairs despite multi-table probing
        assert not approx.duplicated(["query_id", "vec_id"]).any()
        recs = []
        for q in qids:
            a = set(approx[approx["query_id"] == q]["vec_id"])
            e = set(exact[exact["query_id"] == q]["vec_id"])
            recs.append(len(a & e) / len(e))
        assert sum(recs) / len(recs) >= 0.7, recs

    def test_ivf_recall_on_cluster_sorted_corpus(self, ray_session, tmp_path):
        """The head-sampling failure case (VERDICT r3 #3): a corpus
        sorted by stratum (lang-/url-/time-sorted parquet) puts one
        cluster first; a quantizer trained on the file head never sees
        the other clusters and recall for them collapses. The strided
        whole-file sample must keep recall for a query in the LAST
        cluster."""
        import pyarrow as pa

        from crawl4ai_ray.pipelines.similarity import (
            _strided_sample,
            brute_topk,
            ivf_topk,
            recall_at_k,
        )

        rng = np.random.default_rng(42)
        dim, per, nclust = 16, 512, 4
        means = rng.normal(size=(nclust, dim)) * 8.0
        mat = np.concatenate(
            [means[c] + rng.normal(size=(per, dim)) for c in range(nclust)]
        )  # sorted by cluster: stratum 0 occupies the file head
        t = pa.table(
            {
                "vec_id": pa.array(range(nclust * per), pa.int64()),
                "embedding": pa.array(
                    [r.astype(np.float32) for r in mat], pa.list_(pa.float32())
                ),
            }
        )
        sf = tmp_path / "sorted_sf"
        sf.mkdir()
        pq.write_table(t, str(sf / "embeddings.parquet"), row_group_size=256)

        # the sample itself must span all strata, not just the head
        sample = _strided_sample(str(sf / "embeddings.parquet"), 512)
        d2 = ((sample[:, None, :] - (means / np.linalg.norm(means, axis=1, keepdims=True))[None]) ** 2).sum(axis=2)
        assert len(np.unique(d2.argmin(axis=1))) == nclust

        qid = nclust * per - 10  # query deep in the last cluster
        exact = brute_topk(str(sf), query_id=qid, k=10)
        approx = ivf_topk(str(sf), query_id=qid, k=10, nprobe=4, sample_rows=512)
        assert recall_at_k(approx, exact) >= 0.9

    def test_lsh_scans_fewer_candidates_than_brute(self, ray_session, emb):
        """The bucket filter must actually prune (scale-path sanity)."""
        from crawl4ai_ray.pipelines.similarity import (
            _hyperplanes,
            _signatures,
        )

        ids, mat_n = emb
        planes = _hyperplanes(mat_n.shape[1], 16, 8, 7)
        sigs = _signatures(mat_n, planes)
        q = sigs[list(ids).index(0)]
        cand = np.zeros(len(ids), dtype=bool)
        for t in range(16):
            cand |= sigs[:, t] == q[t]
        # even before multiprobe widening, buckets must not be trivial
        assert 0 < cand.sum() < len(ids)


class TestNgramJaccard:
    def test_matches_bruteforce(self, ray_session):
        from crawl4ai_ray.pipelines.dedup import ngram_jaccard_pairs

        t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        K = 7
        sets = {
            i: set(x[j : j + K] for j in range(len(x) - K + 1)) if len(x) >= K else set()
            for i, x in zip(ids, texts)
        }
        expected = []
        for a, b in itertools.combinations(sorted(ids), 2):
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter and inter / (len(sa) + len(sb) - inter) >= 0.5:
                expected.append((a, b))

        got = ngram_jaccard_pairs(SF, k=7, threshold=0.5)
        assert list(zip(got["doc_a"], got["doc_b"])) == expected

    def test_jaccard_values_in_range(self, ray_session):
        from crawl4ai_ray.pipelines.dedup import ngram_jaccard_pairs

        got = ngram_jaccard_pairs(SF, k=7, threshold=0.5)
        assert ((got["jaccard"] >= 0.5) & (got["jaccard"] <= 1.0)).all()


class TestEmbeddingLshNearDup:
    def test_recall_and_no_false_positives(self, ray_session):
        from crawl4ai_ray.pipelines.dedup import (
            embedding_near_pairs,
            embedding_near_pairs_lsh,
        )

        exact = embedding_near_pairs(SF, 0.45)
        approx = embedding_near_pairs_lsh(SF, 0.45)
        e = set(zip(exact["vec_a"], exact["vec_b"]))
        a = set(zip(approx["vec_a"], approx["vec_b"]))
        assert a <= e  # within-bucket verify is exact: no false positives
        assert len(a & e) / max(1, len(e)) >= 0.85


class TestHllSketch:
    def test_accuracy_and_mergeability(self):
        import numpy as np

        from crawl4ai_ray.functions.sketches import (
            hll_estimate,
            hll_merge,
            hll_partial,
        )

        vals = [f"item-{i}" for i in range(50_000)]
        parts = [hll_partial(vals[i : i + 5000]) for i in range(0, len(vals), 5000)]
        merged = hll_estimate(hll_merge(parts))
        assert abs(merged - 50_000) / 50_000 < 0.05
        # merge order must not matter and must equal a single pass
        assert hll_estimate(hll_merge(parts[::-1])) == merged
        assert abs(hll_estimate(hll_partial(vals)) - merged) < 1e-9

    def test_small_cardinality_linear_counting(self):
        from crawl4ai_ray.functions.sketches import hll_estimate, hll_partial

        est = hll_estimate(hll_partial([f"u{i}" for i in range(20)]))
        assert abs(est - 20) < 2

    def test_distributed(self, ray_session):
        import ray.data as rd

        from crawl4ai_ray.functions.sketches import approx_distinct

        ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
        import duckdb

        exact = duckdb.sql(
            f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
        ).fetchone()[0]
        est = approx_distinct(ds, "user_id")
        assert abs(est - exact) / exact < 0.05
