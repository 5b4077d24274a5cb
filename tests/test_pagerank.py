"""PageRank (pipelines/pagerank.py): edge extraction vs the corpus
link rule, rank values vs a numpy reference, mass conservation."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from conftest import SF_SMALL

from crawl4ai_ray.pipelines.pagerank import edge_batch, pagerank
from crawl4ai_ray.sources import corpus as C


def _arith_edges(n_pages: int):
    """Distinct internal edges straight from the link rule."""
    edges = {}
    for p in range(n_pages):
        tgts = {
            C.link_target(p, j, n_pages) for j in range(C.n_links(p))
        }
        edges[p] = sorted(tgts)
    return edges


def _numpy_pagerank(n: int, edges: dict, iters=5, d=0.85):
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - d) / n)
        for s, tgts in edges.items():
            if tgts:
                share = d * r[s] / len(tgts)
                for t in tgts:
                    nxt[t] += share
        r = nxt
    return r


def test_edge_batch_matches_link_rule(small_corpus, ray_session):
    t = pq.read_table(small_corpus, columns=["url", "html"])
    out = edge_batch(t.slice(0, 50))
    n = t.num_rows
    want = _arith_edges(n)
    got: dict = {}
    for s, dst, deg in zip(
        out.column("src").to_pylist(),
        out.column("dst").to_pylist(),
        out.column("outdeg").to_pylist(),
    ):
        p = int(s.rsplit("/", 1)[1])
        got.setdefault(p, []).append(int(dst.rsplit("/", 1)[1]))
        assert deg == len(want[p])
    for p, tgts in got.items():
        assert sorted(tgts) == want[p]
    assert set(got) == {int(u.rsplit("/", 1)[1]) for u in t.column("url").to_pylist()[:50]}


def test_pagerank_matches_numpy_reference(ray_session):
    got = pagerank(SF_SMALL, iters=5, damping=0.85)
    n = len(got)
    ref = _numpy_pagerank(n, _arith_edges(n))
    ids = got["url"].map(lambda u: int(u.rsplit("/", 1)[1])).to_numpy()
    np.testing.assert_allclose(got["pr"].to_numpy(), np.round(ref[ids], 6), atol=2e-6)
    # probability mass conserved (no dangling nodes in the synthetic graph)
    assert abs(got["pr"].sum() - 1.0) < 1e-4


def test_pagerank_bucket_invariance(ray_session):
    a = pagerank(SF_SMALL, iters=2, buckets=4)
    b = pagerank(SF_SMALL, iters=2, buckets=17)
    pd.testing.assert_frame_equal(a, b)


def test_query_registered_in_window():
    from crawl4ai_ray.pipelines.queries import QUERIES
    from crawl4ai_ray.pipelines.oracles import ORACLES

    keys = list(QUERIES)
    assert "pagerank" in keys[:50]
    assert "pagerank" in ORACLES


def _numpy_hits(n: int, edges: dict, iters=5):
    a = np.ones(n)
    h = np.ones(n)
    for _ in range(iters):
        a = np.zeros(n)
        for s, tgts in edges.items():
            for t in tgts:
                a[t] += h[s]
        a /= np.sqrt((a * a).sum())
        h = np.zeros(n)
        for s, tgts in edges.items():
            for t in tgts:
                h[s] += a[t]
        h /= np.sqrt((h * h).sum())
    return a, h


def test_hits_matches_numpy_reference(ray_session):
    from crawl4ai_ray.pipelines.pagerank import hits

    got = hits(SF_SMALL, iters=4)
    n = len(got)
    a, h = _numpy_hits(n, _arith_edges(n), iters=4)
    ids = got["url"].map(lambda u: int(u.rsplit("/", 1)[1])).to_numpy()
    np.testing.assert_allclose(
        got["authority"].to_numpy(), np.round(a[ids], 6), atol=2e-6
    )
    np.testing.assert_allclose(got["hub"].to_numpy(), np.round(h[ids], 6), atol=2e-6)
    # L2-normalized on the last half-iteration of each pass
    assert abs((got["authority"] ** 2).sum() - 1.0) < 1e-4
    assert abs((got["hub"] ** 2).sum() - 1.0) < 1e-4


def test_hits_bucket_invariance(ray_session):
    from crawl4ai_ray.pipelines.pagerank import hits

    a = hits(SF_SMALL, iters=2, buckets=4)
    b = hits(SF_SMALL, iters=2, buckets=17)
    pd.testing.assert_frame_equal(a, b)


def test_hits_registered():
    from crawl4ai_ray.pipelines.oracles import ORACLES
    from crawl4ai_ray.pipelines.queries import QUERIES

    assert "hits" in list(QUERIES)[:50]
    assert "hits" in ORACLES
    # semdedup must not have been evicted from the driver window
    assert "semdedup" in list(QUERIES)[:50]


def test_inlink_stats_vs_arith(ray_session):
    from crawl4ai_ray.pipelines.pagerank import inlink_stats

    got = inlink_stats(SF_SMALL)
    n = 500
    edges = _arith_edges(n)
    inl: dict = {}
    for s, tgts in edges.items():
        for t in tgts:
            inl.setdefault(t, []).append(s)
    assert len(got) == len(inl)
    byu = got.set_index("url")
    for t, srcs in list(inl.items())[:50]:
        u = f"https://site-{t % 16}.example.com/page/{t}"
        assert byu.loc[u, "n_inlinks"] == len(srcs)
        assert byu.loc[u, "n_src_hosts"] == len({s % 16 for s in srcs})
        assert byu.loc[u, "anchor"] == f"Related page {t}"


def test_inlink_bucket_invariance(ray_session):
    from crawl4ai_ray.pipelines.pagerank import inlink_stats

    a = inlink_stats(SF_SMALL, buckets=4)
    b = inlink_stats(SF_SMALL, buckets=19)
    pd.testing.assert_frame_equal(a, b)
