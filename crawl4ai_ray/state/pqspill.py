"""External (spillable) best-first priority queue.

The best-first engine's frontier is a priority queue ordered by
``(-score, depth, url, parent)`` (reference bff_strategy.py shadow
queue semantics). In-memory heapq is the parity mode; at crawl scale
the frontier can reach 10^8 entries — far beyond driver memory — so
this queue bounds resident entries and spills the REST to sorted
Parquet runs:

- an in-memory heap holds at most ``mem_entries`` tuples; when a push
  overflows it, the worst (largest) half is written out as one sorted
  run file and dropped from memory;
- ``pop`` compares the heap minimum against each run's buffered head
  (runs are sorted, so their head IS their minimum) and takes the
  global minimum — **bit-identical pop order to a plain heapq** with
  unbounded memory, proven by the interleaving parity test
  (tests/test_pqspill.py);
- runs stream back in ``chunk_rows``-row slices, so resident memory is
  O(mem_entries + runs x chunk_rows) regardless of frontier size;
- ``checkpoint`` persists the heap part as one more sorted run plus
  each live run's unread remainder (bounded-memory copy, never a full
  materialization), and ``restore`` re-attaches the files as runs —
  resume never loads the frontier into memory either.

Single-writer (the driver's frontier loop), like the reference's
in-process queue. Tuples must be totally ordered (floats/ints/strs).
"""

from __future__ import annotations

import heapq
import json
import os
import shutil
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq

_SCHEMA = pa.schema(
    [
        ("neg_score", pa.float64()),
        ("depth", pa.int32()),
        ("url", pa.string()),
        ("parent", pa.string()),
    ]
)


def _to_table(entries: list, schema: pa.Schema = _SCHEMA) -> pa.Table:
    return pa.Table.from_arrays(
        [
            pa.array([e[i] for e in entries], f.type)
            for i, f in enumerate(schema)
        ],
        schema=schema,
    )


def _to_entries(tbl: pa.Table) -> list:
    return list(
        zip(*(tbl.column(i).to_pylist() for i in range(tbl.num_columns)))
    )


class _Run:
    """One sorted spill file, streamed in chunk_rows slices."""

    def __init__(self, path: str, chunk_rows: int, skip: int = 0):
        self.path = path
        self.chunk_rows = chunk_rows
        self._file = pq.ParquetFile(path)
        self._batches = self._file.iter_batches(batch_size=chunk_rows)
        self._buf: list = []
        self._i = 0
        self.remaining = self._file.metadata.num_rows - skip
        # fast-forward past already-consumed rows (restore path)
        while skip > 0:
            self._fill()
            if not self._buf:
                break
            take = min(skip, len(self._buf) - self._i)
            self._i += take
            skip -= take

    def _fill(self) -> None:
        if self._i < len(self._buf):
            return
        try:
            batch = next(self._batches)
        except StopIteration:
            self._buf, self._i = [], 0
            return
        self._buf = _to_entries(pa.Table.from_batches([batch]))
        self._i = 0

    def head(self):
        self._fill()
        return self._buf[self._i] if self._i < len(self._buf) else None

    def next(self):
        h = self.head()
        if h is not None:
            self._i += 1
            self.remaining -= 1
        return h

    def consumed(self) -> int:
        return self._file.metadata.num_rows - self.remaining

    def close(self, delete: bool = False) -> None:
        self._batches = None
        self._file = None
        if delete:
            try:
                os.remove(self.path)
            except OSError:
                pass


class SpillPriorityQueue:
    def __init__(
        self,
        spill_dir: str,
        mem_entries: int = 100_000,
        chunk_rows: int = 4096,
        max_runs: int = 64,
        schema: pa.Schema = _SCHEMA,
    ):
        # entry tuples map positionally onto ``schema``'s columns;
        # comparisons are plain tuple order, so any engine whose
        # frontier key is the tuple prefix can reuse this queue (the
        # async engine orders by url with schema url/depth/parent/
        # order; the default is the best-first -score/depth/url/parent)
        self.schema = schema
        self.spill_dir = spill_dir
        self.mem_entries = max(4, mem_entries)
        self.chunk_rows = chunk_rows
        # every pop compares all live run heads, so run count is a
        # per-pop cost; when spills push it past max_runs the runs are
        # stream-merged into ONE sorted run (bounded memory: k-way
        # heapq.merge over the runs' chunked readers)
        self.max_runs = max(2, max_runs)
        self._heap: list = []
        self._runs: list[_Run] = []
        self._run_seq = 0
        self.spills = 0  # observability: how many runs were written
        self.compactions = 0
        os.makedirs(spill_dir, exist_ok=True)

    def __len__(self) -> int:
        return len(self._heap) + sum(r.remaining for r in self._runs)

    def __bool__(self) -> bool:
        return bool(self._heap) or any(r.remaining > 0 for r in self._runs)

    def push(self, entry: tuple) -> None:
        heapq.heappush(self._heap, entry)
        if len(self._heap) > self.mem_entries:
            self._spill()

    def _spill(self) -> None:
        entries = sorted(self._heap)
        keep = self.mem_entries // 2
        self._heap = entries[:keep]  # ascending order IS a valid heap
        dump = entries[keep:]
        path = os.path.join(self.spill_dir, f"run-{self._run_seq:06d}.parquet")
        self._run_seq += 1
        pq.write_table(
            _to_table(dump, self.schema), path, row_group_size=self.chunk_rows
        )
        self._runs.append(_Run(path, self.chunk_rows))
        self.spills += 1
        if len(self._runs) > self.max_runs:
            self._compact()

    def _compact(self) -> None:
        """Stream-merge ALL live runs into one sorted run (external
        k-way merge): per-run memory stays one chunk_rows buffer, the
        writer emits chunk_rows slices, and pop cost drops back to a
        single head comparison."""

        def _drain(r: _Run):
            while True:
                e = r.next()
                if e is None:
                    return
                yield e

        path = os.path.join(self.spill_dir, f"run-{self._run_seq:06d}.parquet")
        self._run_seq += 1
        old = self._runs
        writer = pq.ParquetWriter(path, self.schema)
        buf: list = []
        total = 0
        for e in heapq.merge(*(_drain(r) for r in old)):
            buf.append(e)
            if len(buf) >= self.chunk_rows:
                writer.write_table(_to_table(buf, self.schema))
                total += len(buf)
                buf = []
        if buf:
            writer.write_table(_to_table(buf, self.schema))
            total += len(buf)
        writer.close()
        for r in old:
            r.close(delete=True)
        self._runs = [_Run(path, self.chunk_rows)] if total else []
        if not total:
            try:
                os.remove(path)
            except OSError:
                pass
        self.compactions += 1

    def pop(self) -> Optional[tuple]:
        best = self._heap[0] if self._heap else None
        best_run = None
        for r in self._runs:
            h = r.head()
            if h is not None and (best is None or h < best):
                best, best_run = h, r
        if best is None:
            return None
        if best_run is None:
            return heapq.heappop(self._heap)
        out = best_run.next()
        if best_run.remaining == 0:
            self._runs.remove(best_run)
            best_run.close(delete=True)
        return out

    def peek(self) -> Optional[tuple]:
        best = self._heap[0] if self._heap else None
        for r in self._runs:
            h = r.head()
            if h is not None and (best is None or h < best):
                best = h
        return best

    # -- checkpoint / restore -------------------------------------------
    def checkpoint(self, directory: str) -> None:
        """Persist the queue WITHOUT consuming it and with bounded
        memory: the heap part becomes one sorted run file; each live
        run's unread remainder is referenced by (file, consumed-rows)
        in the manifest — run files already live on disk, so only the
        small heap part is written."""
        os.makedirs(directory, exist_ok=True)
        heap_path = os.path.join(directory, "queue-heap.parquet")
        pq.write_table(
            _to_table(sorted(self._heap), self.schema),
            heap_path,
            row_group_size=self.chunk_rows,
        )
        runs = []
        for k, r in enumerate(self._runs):
            if r.remaining <= 0:
                continue
            dst = os.path.join(directory, f"queue-run-{k:06d}.parquet")
            # streamed copy (remainder tracked via skip) so the
            # checkpoint survives the live run's later deletion and
            # never loads a run file into memory
            shutil.copyfile(r.path, dst)
            runs.append({"file": os.path.basename(dst), "skip": r.consumed()})
        with open(os.path.join(directory, "queue-manifest.json"), "w") as f:
            json.dump({"runs": runs, "heap": "queue-heap.parquet"}, f)

    def restore(self, directory: str) -> int:
        """Attach a checkpoint's files as runs — the frontier is never
        materialized in memory. Files are copied into the live spill
        dir first (checkpoint state dirs get garbage-collected by
        later checkpoints). Returns the restored entry count."""
        with open(os.path.join(directory, "queue-manifest.json")) as f:
            m = json.load(f)

        def _adopt(src: str, skip: int) -> None:
            dst = os.path.join(self.spill_dir, f"run-{self._run_seq:06d}.parquet")
            self._run_seq += 1
            shutil.copyfile(src, dst)
            self._runs.append(_Run(dst, self.chunk_rows, skip=skip))

        heap_run = os.path.join(directory, m["heap"])
        if pq.ParquetFile(heap_run).metadata.num_rows:
            _adopt(heap_run, 0)
        for spec in m["runs"]:
            _adopt(os.path.join(directory, spec["file"]), spec["skip"])
        return len(self)

    def adopt_file(self, path: str, skip: int = 0) -> None:
        """Attach an existing SORTED queue parquet (e.g. the in-memory
        mode's checkpoint file) as a run, copying it into the spill
        dir."""
        dst = os.path.join(self.spill_dir, f"run-{self._run_seq:06d}.parquet")
        self._run_seq += 1
        shutil.copyfile(path, dst)
        self._runs.append(_Run(dst, self.chunk_rows, skip=skip))

    def close(self) -> None:
        for r in self._runs:
            r.close()
        self._runs = []
        self._heap = []
