"""CLI — reference ``crwl`` (crawl4ai/cli.py) equivalent:

    python -m crawl4ai_ray crawl   --corpus DIR --out DIR --seeds URL [URL...]
    python -m crawl4ai_ray extract --corpus DIR --out DIR
    python -m crawl4ai_ray bench
    python -m crawl4ai_ray queries [--sf DIR] [NAME...]

Owns its Ray session (guarded init; the library itself never calls
ray.init)."""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init(num_cpus: int | None, address: str | None = None):
    """Own the Ray session. ``address`` defaults to $RAY_ADDRESS or
    "local"; under ``ray job submit`` pass ``--ray-address auto`` (or
    let the job runtime export RAY_ADDRESS) to attach to the hosting
    cluster instead of spawning a local one."""
    import os

    import ray

    if not ray.is_initialized():
        addr = address or os.environ.get("RAY_ADDRESS", "local")
        kwargs = dict(
            address=addr, include_dashboard=False, logging_level="ERROR"
        )
        if num_cpus and addr == "local":
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_crawl(args) -> int:
    ray = _ray_init(args.num_cpus, args.ray_address)
    from .pipelines import hub

    kw = {"max_depth": args.max_depth}
    if args.max_pages is not None:
        kw["max_pages"] = args.max_pages
    if args.engine == "bfs":
        if args.prefetch:
            kw["prefetch"] = True
        if args.cache_from:
            kw["cache_from"] = args.cache_from
            kw["cache_revalidate"] = args.cache_revalidate
        if args.max_wave_size:
            kw["max_wave_size"] = args.max_wave_size
        if args.overlap_discovery:
            kw["overlap_discovery"] = True
    if args.engine == "best_first" and args.fairness_steps is not None:
        kw["fairness_steps"] = args.fairness_steps
    eng = hub.get(args.engine)(args.corpus, args.out, **kw)
    robots = {}
    if args.synthetic_robots:
        from .sources import corpus as C

        robots = {C.host_name(h): C.robots_body(h) for h in range(C.N_HOSTS)}
    stats = eng.run(args.seeds, robots=robots, resume=args.resume)
    print(json.dumps(stats.as_dict() if hasattr(stats, "as_dict") else vars(stats), default=str))
    eng.close()
    ray.shutdown()
    return 0


def cmd_extract(args) -> int:
    ray = _ray_init(args.num_cpus, args.ray_address)
    import ray.data as rd

    from .stages.extract import extract_batch

    ds = rd.read_parquet(args.corpus, columns=["url", "html"]).map_batches(
        extract_batch, batch_format="pyarrow", batch_size=args.batch_size
    )
    ds.write_parquet(args.out)
    import glob as _glob

    import pyarrow.parquet as pq

    n = sum(
        pq.read_metadata(f).num_rows
        for f in _glob.glob(f"{args.out}/*.parquet")
    )
    print(json.dumps({"rows": n, "out": args.out}))
    ray.shutdown()
    return 0


def cmd_warc(args) -> int:
    """Export a parquet corpus to .warc.gz shards (+CDX), or ingest a
    WARC dir back to parquet — the Common Crawl interchange path."""
    ray = _ray_init(args.num_cpus, args.ray_address)

    if args.direction == "export":
        from .sources.warc import write_warc

        manifest = write_warc(args.src, args.out).to_pandas()
        print(
            json.dumps(
                {
                    "shards": len(manifest),
                    "records": int(manifest["n_records"].sum()),
                    "bytes": int(manifest["n_bytes"].sum()),
                    "out": args.out,
                }
            )
        )
    else:
        from .sources.warc import read_warc

        ds = read_warc(args.src)
        ds.write_parquet(args.out)
        print(json.dumps({"out": args.out}))
    ray.shutdown()
    return 0


def cmd_bench(args) -> int:
    import subprocess

    cmd = [sys.executable, "bench.py"] + (["--scaling"] if args.scaling else [])
    return subprocess.call(cmd)


def cmd_queries(args) -> int:
    from .pipelines.queries import QUERIES

    names = args.names or sorted(QUERIES)
    for name in names:  # validate before paying for a Ray session
        if name not in QUERIES:
            print(
                f"unknown query {name!r}; available: {sorted(QUERIES)}",
                file=sys.stderr,
            )
            return 2
    _ray_init(args.num_cpus, args.ray_address)
    import pandas as pd

    for name in names:
        res = QUERIES[name](args.sf)
        d = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        print(json.dumps({"query": name, "rows": len(d), "columns": list(d.columns)}))
    import ray

    ray.shutdown()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="crawl4ai_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--ray-address", default=None,
                   help='Ray cluster address (default $RAY_ADDRESS or "local"; '
                        'use "auto" under ray job submit)')
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run a crawl engine over a corpus")
    c.add_argument("--corpus", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--seeds", nargs="+", required=True)
    c.add_argument("--engine", default="bfs", choices=["bfs", "best_first", "dfs"])
    c.add_argument("--max-depth", type=int, default=3)
    c.add_argument("--max-pages", type=int, default=None)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--cache-from", default=None,
                   help="previous crawl output dir: serve hits from cache (bfs)")
    c.add_argument("--cache-revalidate", action="store_true",
                   help="revalidate cache hits (timestamp + head fingerprint)")
    c.add_argument("--max-wave-size", type=int, default=None,
                   help="slice BFS waves to at most N urls (frontier spills)")
    c.add_argument("--fairness-steps", type=int, default=None,
                   help="best_first: age-priority window against starvation")
    c.add_argument("--overlap-discovery", action="store_true",
                   help="BFS scale mode: fold discovery while stragglers run "
                        "(same crawl set/depths; completion-order attribution)")
    c.add_argument("--prefetch", action="store_true",
                   help="URL-discovery-only crawl (skip markdown/media/tables)")
    c.add_argument(
        "--synthetic-robots",
        action="store_true",
        help="install the synthetic corpus robots rules",
    )
    c.set_defaults(fn=cmd_crawl)

    e = sub.add_parser("extract", help="fetchless extract scan of a corpus")
    e.add_argument("--corpus", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--batch-size", type=int, default=128)
    e.set_defaults(fn=cmd_extract)

    w = sub.add_parser("warc", help="WARC export/ingest (Common Crawl format)")
    w.add_argument("direction", choices=["export", "ingest"])
    w.add_argument("--src", required=True,
                   help="export: corpus parquet dir; ingest: .warc.gz dir")
    w.add_argument("--out", required=True)
    w.set_defaults(fn=cmd_warc)

    b = sub.add_parser("bench", help="run bench.py")
    b.add_argument("--scaling", action="store_true")
    b.set_defaults(fn=cmd_bench)

    q = sub.add_parser("queries", help="run registry queries")
    q.add_argument("names", nargs="*")
    q.add_argument("--sf", default="/root/testdata/sf0.001")
    q.set_defaults(fn=cmd_queries)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
