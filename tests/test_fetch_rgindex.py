"""Row-group index robustness: a corpus whose files have OVERLAPPING
url ranges (externally built / non-globally-sorted, or truncated
string statistics) must still resolve every key — the disjoint
fast-path only applies when footer ranges are verified disjoint.

Regression for the single-candidate bug: with overlapping ranges,
mapping each key to one row group silently 404s urls that ARE in the
corpus."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.stages import fetch as F


def _write(path, urls):
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "html": pa.array(
                [f"<html>{u}</html>".encode() for u in urls], pa.binary()
            ),
        }
    )
    pq.write_table(t, path, row_group_size=2)


def _mkbatch(urls):
    return pa.table({"url": pa.array(urls, pa.string())})


class TestOverlappingRowGroups:
    def test_interleaved_files_resolve_all_keys(self, tmp_path):
        # two files with interleaved url ranges -> row-group ranges
        # overlap globally even though each file is locally sorted
        d = tmp_path / "corpus"
        d.mkdir()
        a = [f"http://h{i:03d}.com/" for i in range(0, 20, 2)]
        b = [f"http://h{i:03d}.com/" for i in range(1, 20, 2)]
        _write(str(d / "a.parquet"), a)
        _write(str(d / "b.parquet"), b)

        F._RGINDEX.pop(str(d), None)
        F._DATASETS.pop(str(d), None)
        idx = F._rg_index(str(d))
        assert idx is not None
        assert idx["disjoint"] is False

        all_urls = sorted(a + b)
        out = F.fetch_batch(_mkbatch(all_urls), str(d))
        assert out.column("fetched").to_pylist() == [True] * len(all_urls)
        got = [h.as_py().decode() for h in out.column("html")]
        assert got == [f"<html>{u}</html>" for u in all_urls]

    def test_miss_still_404(self, tmp_path):
        d = tmp_path / "corpus2"
        d.mkdir()
        _write(str(d / "a.parquet"), ["http://a.com/", "http://c.com/"])
        _write(str(d / "b.parquet"), ["http://b.com/", "http://d.com/"])
        F._RGINDEX.pop(str(d), None)
        F._DATASETS.pop(str(d), None)
        out = F.fetch_batch(
            _mkbatch(["http://b.com/", "http://zz.com/"]), str(d)
        )
        assert out.column("fetched").to_pylist() == [True, False]
        assert out.column("status_code").to_pylist() == [200, 404]

    def test_sorted_corpus_still_disjoint_fastpath(self, tmp_path):
        d = tmp_path / "corpus3"
        d.mkdir()
        urls = [f"http://h{i:03d}.com/" for i in range(12)]
        _write(str(d / "a.parquet"), urls[:6])
        _write(str(d / "b.parquet"), urls[6:])
        F._RGINDEX.pop(str(d), None)
        F._DATASETS.pop(str(d), None)
        idx = F._rg_index(str(d))
        assert idx["disjoint"] is True
        out = F.fetch_batch(_mkbatch(urls), str(d))
        assert out.column("fetched").to_pylist() == [True] * len(urls)
