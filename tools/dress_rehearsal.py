"""Dress rehearsal: cold large-corpus crawl with a mid-run SIGKILL +
fresh-process resume; verify the resumed crawl output equals an
uninterrupted run's, record wall/pages/s (BASELINE.md round-4).

ENGINE=bfs   (default): wave engine, per-wave checkpoints, compares
             the full (url, depth, success) crawl log bit-exactly.
ENGINE=async: barrier-free engine with epoch checkpoints
             (checkpoint_pages); depth/order are documented as
             completion-order-relaxed, so compares the deterministic
             surface — sorted (url, success) — plus the seen set.

Usage:
  python tools/dress_rehearsal.py child <out_dir> [--resume]  # one crawl process
  python tools/dress_rehearsal.py                             # orchestrator
"""
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VARIANTS = int(os.environ.get("GRAFT_CORPUS_VARIANTS", "64"))
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
ENGINE = os.environ.get("ENGINE", "bfs")
KILL_AFTER = int(os.environ.get("KILL_AFTER", "8" if ENGINE == "bfs" else "2"))


def child(out_dir: str, resume: bool) -> None:
    os.environ.setdefault("RAY_idle_worker_killing_time_threshold_ms", "600000")
    os.environ.setdefault("RAY_enable_worker_prestart", "true")
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    sys.path.insert(0, REPO)
    import hashlib

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from crawl4ai_ray.sources import corpus as C

    corpus_dir = C.build_corpus(SF_DIR, variants=VARIANTS)
    robots = {C.host_name(h): C.robots_body(h) for h in range(C.N_HOSTS)}
    t0 = time.perf_counter()
    if ENGINE == "bfs":
        from crawl4ai_ray.pipelines.crawl import BFSCrawler

        cr = BFSCrawler(
            corpus_dir, out_dir, max_depth=30, num_seen_shards=8,
            num_politeness_shards=4, fetch_concurrency=max(2, NUM_CPUS // 4),
            batch_size=512, overlap_discovery=True,
        )
        st = cr.run(C.seed_urls(), robots=robots, resume=resume)
        wall = time.perf_counter() - t0
        pages, waves = st.pages_crawled, len(st.waves)
        log = cr.crawl_log().select(["url", "depth", "success"])
    else:
        from crawl4ai_ray.pipelines.async_crawl import AsyncCrawler

        cr = AsyncCrawler(
            corpus_dir, out_dir, max_depth=30, num_seen_shards=8,
            num_politeness_shards=4, batch_size=512, checkpoint_pages=20000,
        )
        cr.run(C.seed_urls(), robots=robots, resume=resume)
        wall = time.perf_counter() - t0
        pages, waves = cr.pages_crawled, cr._ckpt_seq
        # deterministic surface only (depth is first-discovery):
        parts = []
        wave_dir = os.path.join(out_dir, "wave=00000")
        for name in sorted(os.listdir(wave_dir)):
            if name.startswith("part-"):
                parts.append(pq.read_table(
                    os.path.join(wave_dir, name), columns=["url", "success"]))
        import pyarrow as pa

        log = pa.concat_tables(parts)
    log = log.take(pc.sort_indices(log.column("url")))
    pq.write_table(log, os.path.join(out_dir, "final_log.parquet"))
    seen = sorted(cr.seen.dump())
    seen_h = hashlib.sha256("\n".join(seen).encode()).hexdigest()
    print(json.dumps({
        "wall_sec": round(wall, 2), "pages": pages,
        "pages_per_sec": round(pages / wall, 1),
        "waves": waves, "seen_n": len(seen), "seen_sha": seen_h,
        "resume": resume,
    }), flush=True)
    cr.close(kill=True)
    ray.shutdown()


def spawn(out_dir: str, resume: bool = False) -> subprocess.Popen:
    args = [sys.executable, __file__, "child", out_dir] + (["--resume"] if resume else [])
    return subprocess.Popen(args, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True, cwd=REPO)


def orchestrate() -> None:
    base = f"/tmp/dress_r4_{ENGINE}"
    os.makedirs(base, exist_ok=True)
    ref_dir, kill_dir = f"{base}/ref", f"{base}/killed"
    for d in (ref_dir, kill_dir):
        subprocess.run(["rm", "-rf", d])

    # Phase 1: uninterrupted cold reference run
    p = spawn(ref_dir)
    ref = json.loads(p.communicate()[0].strip().splitlines()[-1])
    print("reference:", ref, flush=True)

    # Phase 2: cold run, SIGKILL once the checkpoint counter reaches
    # KILL_AFTER (BFS manifests carry "wave"; async epochs carry "seq")
    p = spawn(kill_dir)
    killed_at = None
    while p.poll() is None:
        n = -1
        mf = os.path.join(kill_dir, "checkpoint", "manifest.json")
        if os.path.exists(mf):
            try:
                m = json.load(open(mf))
                n = m.get("wave", m.get("seq", -1))
            except Exception:
                pass
        if n >= KILL_AFTER:
            os.kill(p.pid, signal.SIGKILL)
            killed_at = n
            break
        time.sleep(0.5)
    p.wait()
    if killed_at is None:
        print("WARN: crawl finished before kill threshold — rerun with lower KILL_AFTER")
        return
    print(f"killed mid-run after checkpoint {killed_at} (rc={p.returncode})", flush=True)

    # Phase 3: resume in a fresh process
    t0 = time.perf_counter()
    p = spawn(kill_dir, resume=True)
    res = json.loads(p.communicate()[0].strip().splitlines()[-1])
    res["resume_wall_sec"] = round(time.perf_counter() - t0, 2)
    print("resumed:", res, flush=True)

    # Phase 4: compare
    import pyarrow.parquet as pq

    a = pq.read_table(os.path.join(ref_dir, "final_log.parquet"))
    b = pq.read_table(os.path.join(kill_dir, "final_log.parquet"))
    same_log = a.equals(b)
    same_seen = ref["seen_sha"] == res["seen_sha"] and ref["seen_n"] == res["seen_n"]
    print(json.dumps({
        "engine": ENGINE,
        "crawl_log_identical": same_log,
        "seen_set_identical": same_seen,
        "ref_wall_sec": ref["wall_sec"], "ref_pages_per_sec": ref["pages_per_sec"],
        "pages": ref["pages"], "waves": ref["waves"],
        "killed_after": killed_at,
        "resume_reported_pages": res["pages"],
    }), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(sys.argv[2], "--resume" in sys.argv)
    else:
        orchestrate()
