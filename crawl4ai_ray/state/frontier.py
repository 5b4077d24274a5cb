"""FIFO frontier buffer with Parquet spill.

At 100 TB scale a single BFS wave can discover 10^8+ links; holding
the whole frontier as Python tuples on the driver is a scale killer
(round-1 verdict item).  This buffer keeps at most ``mem_rows``
entries in driver memory — overflow spills to Parquet chunks on local
disk (object-store-adjacent storage on a real cluster) and streams
back in FIFO order as waves drain.  Together with
``BFSCrawler(max_wave_size=...)`` the driver's footprint per wave is
bounded regardless of crawl breadth.

Logical order is  head (memory) -> spill chunks (disk, FIFO) -> tail
(memory);  ``extend`` appends to the logical end, ``take`` pops from
the logical front.  Checkpointing persists all three segments in
order (crawl.py ``_checkpoint``).
"""

from __future__ import annotations

import os
from collections import deque

import pyarrow as pa
import pyarrow.parquet as pq

ROW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("depth", pa.int32()),
        ("parent_url", pa.string()),
        ("order", pa.int64()),
    ]
)


def _rows_to_table(rows: list) -> pa.Table:
    return pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows], pa.string()),
            pa.array([r[1] for r in rows], pa.int32()),
            pa.array([r[2] for r in rows], pa.string()),
            pa.array([r[3] for r in rows], pa.int64()),
        ],
        schema=ROW_SCHEMA,
    )


def _table_to_rows(t: pa.Table) -> list:
    return list(
        zip(
            t.column("url").to_pylist(),
            t.column("depth").to_pylist(),
            t.column("parent_url").to_pylist(),
            t.column("order").to_pylist(),
        )
    )


class FrontierBuffer:
    def __init__(self, spill_dir: str, mem_rows: int = 500_000):
        self.spill_dir = spill_dir
        self.mem_rows = max(1, mem_rows)
        self._head: list = []
        self._spill: deque[tuple[str, int]] = deque()  # (path, n_rows)
        self._tail: list = []
        self._seq = 0
        self._n_spilled = 0

    def __len__(self) -> int:
        return len(self._head) + self._n_spilled + len(self._tail)

    @property
    def spilled_rows(self) -> int:
        return self._n_spilled

    def extend(self, rows: list) -> None:
        if not rows:
            return
        if not self._spill and not self._tail:
            self._head.extend(rows)
            if len(self._head) > self.mem_rows:
                self._tail = self._head[self.mem_rows :]
                del self._head[self.mem_rows :]
        else:
            self._tail.extend(rows)
        while len(self._tail) > self.mem_rows:
            self._spill_chunk(self._tail[: self.mem_rows])
            del self._tail[: self.mem_rows]

    def _spill_chunk(self, rows: list) -> None:
        os.makedirs(self.spill_dir, exist_ok=True)
        path = os.path.join(self.spill_dir, f"spill-{self._seq:06d}.parquet")
        self._seq += 1
        pq.write_table(_rows_to_table(rows), path + ".tmp", compression="zstd")
        os.replace(path + ".tmp", path)
        self._spill.append((path, len(rows)))
        self._n_spilled += len(rows)

    def take(self, n: int) -> list:
        out: list = []
        while len(out) < n:
            if self._head:
                if not out and n >= len(self._head) and not self._spill and not self._tail:
                    # full drain: hand back the head list itself so the
                    # caller's identity-keyed table cache can hit
                    out = self._head
                    self._head = []
                    break
                grab = min(n - len(out), len(self._head))
                out.extend(self._head[:grab])
                del self._head[:grab]
            elif self._spill:
                path, rows = self._spill.popleft()
                self._n_spilled -= rows
                self._head = _table_to_rows(pq.read_table(path))
                os.unlink(path)
            elif self._tail:
                self._head = self._tail
                self._tail = []
            else:
                break
        return out

    # -- checkpoint support -------------------------------------------------

    def segments(self) -> tuple[list, list[str], list]:
        """(head rows, spill file paths in FIFO order, tail rows)."""
        return self._head, [p for p, _ in self._spill], self._tail

    def restore_segments(
        self, head: list, spill_paths: list[str], tail: list
    ) -> None:
        """Load checkpointed segments; spill files are re-imported into
        this buffer's own spill dir."""
        self._head = list(head)
        self._spill.clear()
        self._n_spilled = 0
        self._tail = list(tail)
        import shutil

        for src in spill_paths:
            os.makedirs(self.spill_dir, exist_ok=True)
            dst = os.path.join(self.spill_dir, f"spill-{self._seq:06d}.parquet")
            self._seq += 1
            shutil.copy2(src, dst)
            n = pq.read_metadata(dst).num_rows
            self._spill.append((dst, n))
            self._n_spilled += n
