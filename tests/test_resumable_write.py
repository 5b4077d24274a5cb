"""Generic resumable partitioned writer (sources/sinks.py)."""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
N_PARTS = 10  # 500 docs / 50


def make_ds(parts_cap=None):
    import pyarrow as pa
    import ray.data as rd

    def add_part(t: pa.Table) -> pa.Table:
        part = pa.compute.divide(t.column("doc_id"), 50).cast(pa.int64())
        return t.append_column("part", part)

    ds = rd.read_parquet(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(add_part, batch_format="pyarrow")
    if parts_cap is not None:
        import pyarrow.compute as pc

        ds = ds.map_batches(
            lambda t: t.filter(pc.less(t.column("part"), parts_cap)),
            batch_format="pyarrow",
        )
    return ds


def make_transform(spy_dir):
    def transform(ds):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            for p in df["part"].unique():
                open(os.path.join(spy_dir, f"{int(p)}.{os.getpid()}"), "a").write("x")
            out = pd.DataFrame(
                {
                    "doc_id": df["doc_id"].astype("int64"),
                    "n_chars": df["text"].fillna("").str.len().astype("int64"),
                    "part": df["part"].astype("int64"),
                }
            )
            return out

        return ds.map_batches(fn, batch_format="pandas")

    return transform


def read_all(out_dir):
    from crawl4ai_ray.sources.sinks import read_resumable

    return (
        read_resumable(out_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


class TestResumableWrite:
    def test_resume_skips_done_partitions(self, ray_session, tmp_path):
        from crawl4ai_ray.sources.sinks import resumable_write

        ref_dir = str(tmp_path / "ref")
        spy0 = tmp_path / "spy0"
        spy0.mkdir()
        r = resumable_write(make_ds(), make_transform(str(spy0)), ref_dir)
        assert r["written"] == list(range(N_PARTS)) and r["skipped"] == []
        reference = read_all(ref_dir)
        assert len(reference) == 500

        # phase 1: "killed" job that finished parts 0-4 only
        out_dir = str(tmp_path / "out")
        spy1 = tmp_path / "spy1"
        spy1.mkdir()
        r1 = resumable_write(
            make_ds(parts_cap=5), make_transform(str(spy1)), out_dir
        )
        assert r1["written"] == [0, 1, 2, 3, 4]

        # phase 2: full input resumes; done parts must not reprocess
        spy2 = tmp_path / "spy2"
        spy2.mkdir()
        r2 = resumable_write(make_ds(), make_transform(str(spy2)), out_dir)
        assert r2["skipped"] == [0, 1, 2, 3, 4]
        assert r2["written"] == [5, 6, 7, 8, 9]
        processed = {int(f.name.split(".")[0]) for f in spy2.iterdir()}
        assert processed == {5, 6, 7, 8, 9}

        pd.testing.assert_frame_equal(read_all(out_dir), reference)

    def test_missing_marker_reruns_partition(self, ray_session, tmp_path):
        from crawl4ai_ray.sources.sinks import resumable_write

        out_dir = str(tmp_path / "out")
        spy = tmp_path / "spy"
        spy.mkdir()
        resumable_write(make_ds(), make_transform(str(spy)), out_dir)
        ref = read_all(out_dir)

        # crash window: data written but marker lost -> part re-runs
        os.remove(os.path.join(out_dir, "_done", "3.marker"))
        spyb = tmp_path / "spyb"
        spyb.mkdir()
        r = resumable_write(make_ds(), make_transform(str(spyb)), out_dir)
        assert r["written"] == [3]
        processed = {int(f.name.split(".")[0]) for f in spyb.iterdir()}
        assert processed == {3}
        pd.testing.assert_frame_equal(read_all(out_dir), ref)
