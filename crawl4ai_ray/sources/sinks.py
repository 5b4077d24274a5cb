"""Output sinks (SURVEY §2.1 'File download sink' row): partitioned
Parquet export of crawl results.

``export_by_host`` rewrites a crawl's wave output into
host-partitioned Parquet (`host=<h>/...parquet`) — the resumable,
per-key layout a 100 TB pipeline needs so downstream consumers read
one host (or shard of hosts) without touching the rest, and a failed
export re-runs only missing partitions.
"""

from __future__ import annotations

import glob
import os

import ray.data as rd


def export_by_host(
    results_dir: str,
    out_dir: str,
    columns: list[str] | None = None,
) -> int:
    """results waves -> `out_dir/host=<host>/*.parquet`; returns rows
    written. Streaming: read -> (column-prune) -> write_parquet with a
    partition column; no driver materialization."""
    import pyarrow.parquet as pq

    parts = sorted(glob.glob(os.path.join(results_dir, "*", "part-*.parquet")))
    if not parts:
        return 0
    ds = rd.read_parquet(parts, columns=columns)
    ds.write_parquet(out_dir, partition_cols=["host"])
    # row count from footers — no second pipeline execution
    return sum(pq.read_metadata(p).num_rows for p in parts)


# -- generic resumable partitioned writer (round 4) -------------------------
#
# The crawl engines already checkpoint per wave; this gives the same
# property to ANY dataset pipeline (quality scans, dedup outputs,
# curation manifests): output lands as `out_dir/part=<p>/data.parquet`
# written atomically (tmp + rename) with a `_done/<p>.marker` per
# finished partition. Re-running the same write SKIPS done partitions
# BEFORE the heavy transform runs — the filter sits between the
# part-keyed source scan and the transform, so a resumed 100-TB job
# re-pays only the source scan for finished partitions, not the
# compute or the write.


def _done_parts(out_dir: str) -> set:
    d = os.path.join(out_dir, "_done")
    if not os.path.isdir(d):
        return set()
    return {
        int(f[: -len(".marker")])
        for f in os.listdir(d)
        if f.endswith(".marker")
    }


def resumable_write(
    ds_with_part,
    transform,
    out_dir: str,
) -> dict:
    """Resumable partitioned write.

    ``ds_with_part``: Dataset carrying an int64 ``part`` column
    derived from SOURCE columns (so pending-filtering happens before
    any heavy work). ``transform``: Dataset -> Dataset, must preserve
    ``part``. Each partition's rows are written to
    ``out_dir/part=<p>/data.parquet`` via tmp+rename, then its marker
    lands; a crash between the two re-runs just that partition (the
    rename makes the data file appear at most once). Returns
    {"written": [parts], "skipped": [parts]}.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.join(out_dir, "_done"), exist_ok=True)
    done = _done_parts(out_dir)

    def drop_done(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        if not done:
            return t
        mask = np.isin(
            t.column("part").to_numpy(zero_copy_only=False), list(done)
        )
        return t.filter(pa.array(~mask))

    import ray.data as _rd  # noqa: F401 (documents the contract)

    pending = ds_with_part.map_batches(drop_done, batch_format="pyarrow")
    out = transform(pending)

    def write_group(g):
        import pandas as pd

        p = int(g["part"].iloc[0])
        part_dir = os.path.join(out_dir, f"part={p}")
        os.makedirs(part_dir, exist_ok=True)
        tmp = os.path.join(part_dir, ".data.parquet.tmp")
        g.drop(columns=["part"]).to_parquet(tmp, index=False)
        os.replace(tmp, os.path.join(part_dir, "data.parquet"))
        marker = os.path.join(out_dir, "_done", f"{p}.marker")
        with open(marker + ".tmp", "w") as f:
            f.write(str(len(g)))
        os.replace(marker + ".tmp", marker)
        return pd.DataFrame({"part": [p], "n_rows": [len(g)]})

    written = out.groupby("part").map_groups(
        write_group, batch_format="pandas"
    ).to_pandas()
    return {
        "written": sorted(int(p) for p in written["part"]),
        "skipped": sorted(done),
    }


def read_resumable(out_dir: str):
    """Read back a resumable_write output (done partitions only)."""
    import ray.data as _rd

    done = sorted(_done_parts(out_dir))
    paths = [
        os.path.join(out_dir, f"part={p}", "data.parquet") for p in done
    ]
    return _rd.read_parquet([p for p in paths if os.path.exists(p)])
