"""DSIR importance resampling (pipelines/dsir.py) and domain-mixture
weights (pipelines/mixture.py)."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


class TestDsir:
    @pytest.fixture(scope="class")
    def selected(self, ray_session):
        from crawl4ai_ray.pipelines.dsir import dsir_select

        return (
            dsir_select(SF, k=50)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def test_selects_exactly_k(self, selected):
        assert selected["selected"].sum() == 50
        assert len(selected) == 500

    def test_selection_is_topk_by_logw(self, selected):
        ranked = selected.sort_values(
            ["logw", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        assert (ranked["selected"].iloc[:50] == 1).all()
        assert (ranked["selected"].iloc[50:] == 0).all()

    def test_importance_prefers_target_lang(self, ray_session, selected):
        # Target-language docs must score higher on average: that is
        # the point of the estimator.
        langs = pd.read_parquet(
            os.path.join(SF, "documents.parquet"), columns=["doc_id", "lang"]
        )
        m = selected.merge(langs, on="doc_id")
        en = m[m.lang == "en"]["logw"].mean()
        rest = m[m.lang != "en"]["logw"].mean()
        assert en > rest
        # and the selected set should be majority target-language
        sel_langs = m[m.selected == 1]["lang"]
        assert (sel_langs == "en").mean() > 0.5

    def test_empty_doc_scores_zero(self):
        from crawl4ai_ray.pipelines.dsir import _doc_features

        fdocs, feats = _doc_features(pd.Series(["", None, "one two"]))
        assert set(fdocs) == {2}
        assert sorted(feats) == ["one", "one two", "two"]

    def test_bucket_hash_matches_md5_definition(self):
        import hashlib

        from crawl4ai_ray.pipelines.dsir import _hash_buckets

        feats = np.array(["alpha", "beta gamma", "alpha"], dtype=object)
        b = _hash_buckets(feats, 256)
        want = [
            int(hashlib.md5(g.encode()).hexdigest()[:16], 16) % 256
            for g in ["alpha", "beta gamma", "alpha"]
        ]
        assert list(b) == want
        assert b[0] == b[2]


class TestMixture:
    @pytest.fixture(scope="class")
    def weights(self, ray_session):
        from crawl4ai_ray.pipelines.mixture import mixture_weights

        return mixture_weights(SF)

    def test_normalized(self, weights):
        assert abs(weights["weight"].sum() - 1.0) < 1e-4
        assert abs(weights["prop"].sum() - 1.0) < 1e-4

    def test_temperature_flattens(self, weights):
        # tau<1 boosts below-average-share domains, shrinks the rest.
        small = weights.loc[weights.prop.idxmin()]
        big = weights.loc[weights.prop.idxmax()]
        if small.prop < big.prop:  # non-degenerate corpus
            assert small.boost > big.boost

    def test_tau_one_is_proportional(self, ray_session):
        from crawl4ai_ray.pipelines.mixture import mixture_weights

        w = mixture_weights(SF, tau=1.0)
        assert np.allclose(w["weight"], w["prop"], atol=2e-6)
        assert np.allclose(w["boost"], 1.0, atol=2e-6)
