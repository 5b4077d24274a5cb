"""Stable 64-bit hashing for URL-seen sharding / partitioning.

The reference uses xxh64 (crawl4ai/utils.py:2841-2843) as its
content-hash. xxhash is not available in this environment, so we use
the first 8 bytes of blake2b (stdlib, C-speed) as our stable 64-bit
hash. The hash is an internal partitioning/dedup key only — frontier
identity is the canonical URL *string* — so any stable 64-bit hash
preserves parity with the reference's crawl set.

All hashes are unsigned 64-bit ints, deterministic across processes,
Python versions, and machines (unlike builtin ``hash``).
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np

_MASK64 = (1 << 64) - 1


def hash64(s: str | bytes) -> int:
    """Stable unsigned 64-bit hash of a string/bytes."""
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return int.from_bytes(blake2b(s, digest_size=8).digest(), "little")


def hash64_batch(values) -> np.ndarray:
    """Vector form: list/array of str -> uint64 ndarray."""
    out = np.empty(len(values), dtype=np.uint64)
    frombytes = int.from_bytes
    for i, v in enumerate(values):
        if isinstance(v, str):
            v = v.encode("utf-8", "surrogatepass")
        out[i] = frombytes(blake2b(v, digest_size=8).digest(), "little")
    return out


def content_hash(content: str) -> str:
    """Hex content hash for cache addressing (reference uses
    ``xxhash.xxh64(...).hexdigest()``, utils.py:2841-2843)."""
    if isinstance(content, str):
        content = content.encode("utf-8", "surrogatepass")
    return blake2b(content, digest_size=8).hexdigest()


def shard_of(h: int, num_shards: int) -> int:
    return int(h % np.uint64(num_shards)) if isinstance(h, np.uint64) else h % num_shards


def rolling_hash(text: str, window: int = 16, base: int = 1000003) -> np.ndarray:
    """Deterministic rolling (Rabin-Karp style) hash over a text's
    byte stream — document fingerprinting primitive. Returns the
    uint64 hash of every ``window``-byte window (vectorized)."""
    data = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    n = data.size
    if n < window:
        return np.array([hash64(text)], dtype=np.uint64)
    powers = np.power(
        np.uint64(base), np.arange(window, dtype=np.uint64), dtype=np.uint64
    )
    # windows matrix via stride tricks, then dot mod 2**64 (wraps naturally)
    strided = np.lib.stride_tricks.sliding_window_view(data, window)
    return (strided.astype(np.uint64) * powers[::-1]).sum(axis=1, dtype=np.uint64)
