"""Sketch aggregates (SURVEY §2.8 'Bloom cardinality estimate' row):
approximate distinct counting as a streaming, mergeable sketch.

HyperLogLog with 2^p registers: each ``map_batches`` task emits one
tiny partial register array (2^p bytes); partials merge by
element-wise max — associative and commutative, so the combine tree
can run anywhere and the full column never concentrates. This is the
100 TB shape for COUNT(DISTINCT) over a shuffled-out key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .hashing import hash64_batch


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_partial(values, p: int = 12) -> np.ndarray:
    """Register array (uint8, 2^p) for one batch of values."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = hash64_batch([str(v) for v in values])
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    # rank = leading zeros of the remaining 64-p bits, +1
    lz = np.full(len(h), 64 - p, dtype=np.int64)
    nonzero = rest != 0
    # leading zeros via float trick is lossy; do it exactly in chunks
    r = rest[nonzero]
    count = np.zeros(len(r), dtype=np.int64)
    cur = r.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur < (np.uint64(1) << np.uint64(64 - shift))
        count[mask] += shift
        cur[mask] = cur[mask] << np.uint64(shift)
    lz[nonzero] = count
    rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(partials) -> np.ndarray:
    out = None
    for p_ in partials:
        out = p_.copy() if out is None else np.maximum(out, p_)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(2.0 ** -regs.astype(np.float64))
    if est <= 2.5 * m:
        zeros = int((regs == 0).sum())
        if zeros:
            est = m * np.log(m / zeros)  # linear counting correction
    return float(est)


def approx_distinct(
    ds: rd.Dataset, column: str, p: int = 12
) -> float:
    """Distributed approximate COUNT(DISTINCT column).

    map_batches emits one 2^p register row per batch; the driver
    merges the tiny partials (at multi-node scale this merge is a
    tree-reduce over ~KB objects, never a shuffle of the column)."""

    def partial(t: pa.Table) -> pa.Table:
        regs = hll_partial(t.column(column).to_pylist(), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = [
        np.frombuffer(b.as_py(), dtype=np.uint8)
        for batch in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
        for b in batch.column("regs")
    ]
    return hll_estimate(hll_merge(parts))
