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
