"""Exact-substring (k-token window) dedup + decontamination
(pipelines/dedup.py): window-hash explode vs a brute nested-loop
reference on window STRINGS, bucket-count invariance, and the
broadcast decontamination flags. The sf0.01 oracle-SQL parity runs in
tests/test_oracle_parity.py (substring_dedup / decontaminate keys)."""

import numpy as np
import pandas as pd
import pytest

from crawl4ai_ray.functions.wstokens import WS_TOKEN_RE
from crawl4ai_ray.pipelines.dedup import (
    _window_hashes,
    decontaminate,
    substring_dedup_counts,
    substring_dedup_removal,
)


def brute_counts(docs: dict[int, str], k: int) -> pd.DataFrame:
    """Reference: first-wins over window STRINGS in (doc_id, pos) order."""
    seen: set = set()
    rows = []
    for did in sorted(docs):
        toks = WS_TOKEN_RE.findall(docs[did] or "")
        wins = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        if not wins:
            continue
        n_dup = 0
        for w in wins:
            if w in seen:
                n_dup += 1
            else:
                seen.add(w)
        rows.append((did, len(wins), n_dup, n_dup / len(wins)))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_windows", "n_dup_windows", "dup_ratio"]
    )


DOCS = {
    0: "the quick brown fox jumps over the lazy dog again and again",
    1: "a b c the quick brown fox jumps over the lazy dog tail",
    2: "x y z w v u t s",  # exactly 8 tokens: one window, unique
    3: "short doc",  # < k tokens: no windows
    4: "r r r r r r r r r r r r",  # self-repeating windows inside one doc
    5: "",  # empty
    6: "x y z w v u t s",  # duplicate of doc 2's single window
}


class TestWindowHashes:
    def test_matches_string_windows(self):
        k = 4
        ids = np.array(sorted(DOCS), dtype=np.int64)
        texts = pd.Series([DOCS[i] for i in sorted(DOCS)])
        d, p, h = _window_hashes(ids, texts, k)
        # group hash by window string: identical strings -> identical
        # hashes; distinct strings -> distinct hashes (no collisions)
        by_string: dict = {}
        for did, pos, hv in zip(d, p, h):
            toks = WS_TOKEN_RE.findall(DOCS[did])
            w = " ".join(toks[pos : pos + k])
            by_string.setdefault(w, set()).add(int(hv))
        assert all(len(v) == 1 for v in by_string.values())
        hashes = [next(iter(v)) for v in by_string.values()]
        assert len(set(hashes)) == len(by_string)
        # exhaustive (doc, pos) coverage
        want = sum(
            max(0, len(WS_TOKEN_RE.findall(t)) - k + 1) for t in DOCS.values()
        )
        assert len(d) == want

    def test_boundary_windows_masked(self):
        # two docs whose concatenation would create a cross-doc window
        ids = np.array([10, 11], dtype=np.int64)
        texts = pd.Series(["a b c", "d e f"])
        d, p, h = _window_hashes(ids, texts, 3)
        assert list(d) == [10, 11] and list(p) == [0, 0]

    def test_short_and_empty_docs(self):
        d, p, h = _window_hashes(
            np.array([1, 2], dtype=np.int64), pd.Series(["one two", ""]), 8
        )
        assert len(d) == len(p) == len(h) == 0


class TestSubstringDedup:
    @pytest.fixture()
    def docs_dir(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pa.table(
            {
                "doc_id": pa.array(sorted(DOCS), pa.int64()),
                "text": pa.array([DOCS[i] for i in sorted(DOCS)], pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_matches_brute(self, ray_session, docs_dir):
        for k in (3, 4, 8):
            got = substring_dedup_counts(docs_dir, k=k)
            want = brute_counts(DOCS, k)
            pd.testing.assert_frame_equal(
                got.reset_index(drop=True), want, check_dtype=False
            )

    def test_bucket_count_invariance(self, ray_session, docs_dir):
        a = substring_dedup_counts(docs_dir, k=4, buckets=2, doc_buckets=2)
        b = substring_dedup_counts(docs_dir, k=4, buckets=64, doc_buckets=32)
        pd.testing.assert_frame_equal(a, b)

    def test_within_doc_repeats_count(self, ray_session, docs_dir):
        got = substring_dedup_counts(docs_dir, k=4)
        r4 = got[got.doc_id == 4].iloc[0]
        # 12 identical tokens -> 9 identical windows: 1 kept, 8 dups
        assert r4.n_windows == 9 and r4.n_dup_windows == 8


def brute_removal(docs: dict[int, str], k: int) -> pd.DataFrame:
    """Reference: positions covered by >=1 duplicated window."""
    seen: set = set()
    covered: dict[int, set] = {}
    n_toks: dict[int, int] = {}
    for did in sorted(docs):
        toks = WS_TOKEN_RE.findall(docs[did] or "")
        if len(toks) < k:
            continue
        n_toks[did] = len(toks)
        covered[did] = set()
        for i in range(len(toks) - k + 1):
            w = " ".join(toks[i : i + k])
            if w in seen:
                covered[did].update(range(i, i + k))
            else:
                seen.add(w)
    rows = [
        (d, n_toks[d], len(covered[d]), len(covered[d]) / n_toks[d])
        for d in sorted(n_toks)
    ]
    return pd.DataFrame(
        rows, columns=["doc_id", "n_tokens", "n_removed_tokens", "removed_ratio"]
    )


class TestSubstringRemoval:
    @pytest.fixture()
    def docs_dir(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pa.table(
            {
                "doc_id": pa.array(sorted(DOCS), pa.int64()),
                "text": pa.array([DOCS[i] for i in sorted(DOCS)], pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_matches_brute(self, ray_session, docs_dir):
        for k in (3, 4, 8):
            got = substring_dedup_removal(docs_dir, k=k)
            want = brute_removal(DOCS, k)
            pd.testing.assert_frame_equal(
                got.reset_index(drop=True), want, check_dtype=False
            )

    def test_overlapping_spans_union_once(self, ray_session, tmp_path):
        """Overlapping dup windows must not double-count positions."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        docs = {
            0: "a b c d e f",  # source: windows abc..def at k=3
            1: "a b c d e f tail",  # 4 dup windows covering pos 0..5
        }
        t = pa.table(
            {
                "doc_id": pa.array(sorted(docs), pa.int64()),
                "text": pa.array([docs[i] for i in sorted(docs)], pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = substring_dedup_removal(str(tmp_path), k=3)
        r1 = out[out.doc_id == 1].iloc[0]
        # dup windows at pos 0..3 cover tokens 0..5 -> 6, not 4*3
        assert r1.n_removed_tokens == 6 and r1.n_tokens == 7
        r0 = out[out.doc_id == 0].iloc[0]
        assert r0.n_removed_tokens == 0


class TestDecontaminate:
    def test_flags_eval_overlap(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        docs = {
            0: "alpha beta gamma delta epsilon zeta",  # EVAL (0 % 3 == 0)
            1: "unrelated text with no shared windows here",
            2: "prefix alpha beta gamma delta suffix",  # hits eval window
            3: "noise noise noise noise",  # EVAL
            4: "tiny",  # < k tokens -> 0 overlaps
            5: "noise noise noise noise tail",  # hits doc 3's window
        }
        t = pa.table(
            {
                "doc_id": pa.array(sorted(docs), pa.int64()),
                "text": pa.array([docs[i] for i in sorted(docs)], pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = decontaminate(str(tmp_path), k=4, eval_mod=3)
        assert list(out.doc_id) == [1, 2, 4, 5]  # eval docs excluded
        got = dict(zip(out.doc_id, out.contaminated))
        assert got == {1: False, 2: True, 4: False, 5: True}
        n = dict(zip(out.doc_id, out.n_overlap_windows))
        assert n[2] == 1 and n[5] == 1  # one hit window position each
