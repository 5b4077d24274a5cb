"""Approximate-membership filters for the URL-seen set.

The reference ships an experimental Bloom filter
(``crawl4ai/deep_crawling/crazy.py:102-165``, mmh3+bitarray) as the
design precedent for a frontier seen-set at 10^10-URL scale. Neither
mmh3 nor bitarray exists in this environment, so both filters here are
numpy-backed and seeded with stable blake2b-derived hashes
(``functions/hashing.py``), deterministic across processes — a hard
requirement for checkpoint/resume parity.

* ``BloomFilter`` — classic double-hashing Bloom over a numpy bit
  array; optimal m/k from (capacity, fp_rate).
* ``CuckooFilter`` — 4-slot-bucket cuckoo filter with 16-bit
  fingerprints; supports delete and ~95% load factor. Used as the
  fast-path accelerator inside each seen shard; the exact url set
  remains the source of truth (the filter only short-circuits
  definite-misses).

Both serialize to bytes for per-partition Parquet checkpoints.
"""

from __future__ import annotations

import math
import pickle

import numpy as np

from ..functions.hashing import hash64

_FP_MASK = (1 << 16) - 1


def _h2(item: str | bytes) -> tuple[int, int]:
    """Two independent 64-bit hashes from one blake2b-128."""
    from hashlib import blake2b

    if isinstance(item, str):
        item = item.encode("utf-8", "surrogatepass")
    d = blake2b(item, digest_size=16).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little")


class BloomFilter:
    """Bloom filter with optimal sizing (reference design precedent:
    crazy.py:102-165)."""

    def __init__(self, capacity: int, fp_rate: float = 0.01):
        self.capacity = capacity
        self.fp_rate = fp_rate
        m = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.m = (m + 7) // 8 * 8
        self.k = max(1, round(self.m / capacity * math.log(2)))
        self.bits = np.zeros(self.m // 8, dtype=np.uint8)
        self.count = 0

    def _positions(self, item) -> np.ndarray:
        h1, h2 = _h2(item)
        idx = (h1 + np.arange(self.k, dtype=np.uint64) * np.uint64(h2 & _FP_MASK | 1)) % np.uint64(self.m)
        return idx.astype(np.int64)

    def add(self, item) -> None:
        pos = self._positions(item)
        # bitwise_or.at handles duplicate byte indices (plain |= drops them)
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        self.count += 1

    def __contains__(self, item) -> bool:
        pos = self._positions(item)
        return bool(np.all((self.bits[pos >> 3] >> (pos & 7)) & 1))

    def estimated_cardinality(self) -> float:
        """Bits-set cardinality estimate (crazy.py:139-159)."""
        set_bits = int(np.unpackbits(self.bits).sum())
        if set_bits == 0:
            return 0.0
        if set_bits >= self.m:
            return float("inf")
        return -self.m / self.k * math.log(1 - set_bits / self.m)

    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {
                "capacity": self.capacity,
                "fp_rate": self.fp_rate,
                "bits": self.bits,
                "count": self.count,
            }
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        d = pickle.loads(data)
        f = cls(d["capacity"], d["fp_rate"])
        f.bits = d["bits"]
        f.count = d["count"]
        return f


class CuckooFilter:
    """Cuckoo filter: 16-bit fingerprints, 4 slots/bucket.

    Deterministic eviction walk (seeded per-filter counter, not
    ``random``) so a checkpoint/restore replays identically.
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int):
        nbuckets = max(8, 1 << math.ceil(math.log2(max(1, capacity) / self.SLOTS / 0.95)))
        self.nbuckets = nbuckets
        self.table = np.zeros((nbuckets, self.SLOTS), dtype=np.uint16)  # 0 = empty
        self.count = 0
        self._kick_seed = 0

    def _fingerprint_and_index(self, item) -> tuple[int, int]:
        h = hash64(item)
        fp = (h & _FP_MASK) or 1
        i1 = (h >> 16) % self.nbuckets
        return fp, i1

    def _alt_index(self, i: int, fp: int) -> int:
        return (i ^ hash64(fp.to_bytes(2, "little"))) % self.nbuckets

    def add(self, item) -> bool:
        fp, i1 = self._fingerprint_and_index(item)
        i2 = self._alt_index(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.where(row == 0)[0]
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict
        i = i1 if (self._kick_seed & 1) == 0 else i2
        for _ in range(self.MAX_KICKS):
            self._kick_seed = (self._kick_seed * 6364136223846793005 + 1442695040888963407) & _FP_MASK | 1
            slot = self._kick_seed % self.SLOTS
            fp, self.table[i][slot] = int(self.table[i][slot]), fp
            i = self._alt_index(i, fp)
            row = self.table[i]
            empty = np.where(row == 0)[0]
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        return False  # table full — caller falls back to exact set

    def __contains__(self, item) -> bool:
        fp, i1 = self._fingerprint_and_index(item)
        i2 = self._alt_index(i1, fp)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def delete(self, item) -> bool:
        fp, i1 = self._fingerprint_and_index(item)
        for i in (i1, self._alt_index(i1, fp)):
            hits = np.where(self.table[i] == fp)[0]
            if hits.size:
                self.table[i][hits[0]] = 0
                self.count -= 1
                return True
        return False

    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {
                "nbuckets": self.nbuckets,
                "table": self.table,
                "count": self.count,
                "kick": self._kick_seed,
            }
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        d = pickle.loads(data)
        f = cls.__new__(cls)
        f.nbuckets = d["nbuckets"]
        f.table = d["table"]
        f.count = d["count"]
        f._kick_seed = d["kick"]
        return f
