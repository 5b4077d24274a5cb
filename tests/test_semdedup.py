"""SemDeDup (pipelines/semdedup.py) — distributed == brute twin, eps
limit properties, and greedy-keep kernel invariants."""

import numpy as np
import pandas as pd
import pytest

from conftest import SF_SMALL

from crawl4ai_ray.pipelines.semdedup import (
    _greedy_keep,
    semdedup,
    semdedup_brute,
)


def test_distributed_equals_brute(ray_session):
    a = semdedup(SF_SMALL, eps=0.6)
    b = semdedup_brute(SF_SMALL, eps=0.6)
    pd.testing.assert_frame_equal(a, b)
    # meaningful prune at this eps on the synthetic table
    assert 0 < (~a["keep"]).sum() < len(a)


def test_distributed_equals_brute_default_eps(ray_session):
    a = semdedup(SF_SMALL)
    b = semdedup_brute(SF_SMALL)
    pd.testing.assert_frame_equal(a, b)


def test_eps_limits():
    # eps >= 2 -> thresh <= -1: everything is a duplicate of the first
    # kept item in its cluster -> exactly one survivor per cluster.
    hi = semdedup_brute(SF_SMALL, eps=2.0)
    assert int(hi["keep"].sum()) == hi["cluster"].nunique()
    # eps ~ 0 -> thresh ~ 1: only exact-direction duplicates drop; the
    # synthetic table has none.
    lo = semdedup_brute(SF_SMALL, eps=1e-9)
    assert bool(lo["keep"].all())


def test_keep_monotone_in_eps():
    k1 = semdedup_brute(SF_SMALL, eps=0.5)["keep"].sum()
    k2 = semdedup_brute(SF_SMALL, eps=0.6)["keep"].sum()
    k3 = semdedup_brute(SF_SMALL, eps=0.7)["keep"].sum()
    assert k1 >= k2 >= k3


def test_greedy_keep_kernel():
    # three colinear vectors + one orthogonal; thresh 0.99
    m = np.array(
        [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1e-9]],
        dtype=np.float64,
    )
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    order = np.arange(4)
    keep = _greedy_keep(m, order, 0.99)
    assert keep.tolist() == [True, False, True, False]
    # visiting order decides the survivor
    keep_rev = _greedy_keep(m, np.array([1, 0, 2, 3]), 0.99)
    assert keep_rev.tolist() == [False, True, True, False]
    assert _greedy_keep(np.zeros((0, 2)), np.arange(0), 0.5).shape == (0,)


def test_greedy_keep_matches_quadratic_reference():
    rng = np.random.default_rng(7)
    m = rng.normal(size=(60, 8))
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    order = rng.permutation(60)
    thresh = 0.4
    keep = _greedy_keep(m, order, thresh)
    # quadratic reference
    kept = []
    ref = np.zeros(60, dtype=bool)
    for i in order:
        if not kept or max(float(m[j] @ m[i]) for j in kept) < thresh:
            kept.append(i)
            ref[i] = True
    assert np.array_equal(keep, ref)


def test_query_registered():
    from crawl4ai_ray.pipelines.queries import QUERIES

    keys = list(QUERIES)
    assert "semdedup" in keys[:50], "semdedup must sit in the driver's window"
