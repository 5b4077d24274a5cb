"""Chunking strategies — text -> list[str], used as ``flat_map`` /
``map_batches`` stages that explode documents into chunk rows.

Models ``crawl4ai/chunking_strategy.py:28-255``:

* ``IdentityChunking``          (:28-34)
* ``RegexChunking``             (:38-62, default pattern ``\\n\\n``)
* ``NlpSentenceChunking``       (:66-88; the reference uses NLTK
  sent_tokenize — unavailable here, so we use the regex splitter the
  reference ships commented-out at :79-83, which is its own fallback)
* ``TopicSegmentationChunking`` (:92-141; NLTK TextTiling unavailable
  -> paragraph-boundary segmentation with keyword extraction)
* ``FixedLengthWordChunking``   (:145-170)
* ``SlidingWindowChunking``     (:173-216)
* ``OverlappingWindowChunking`` (:219-255)

plus ``merge_chunks`` (crawl4ai/utils.py:162-224): token-budget chunk
merger with word overlap.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import List

import pyarrow as pa


class ChunkingStrategy:
    def chunk(self, text: str) -> List[str]:
        raise NotImplementedError


class IdentityChunking(ChunkingStrategy):
    def chunk(self, text: str) -> List[str]:
        return [text]


class RegexChunking(ChunkingStrategy):
    def __init__(self, patterns=None, **kwargs):
        if patterns is None:
            patterns = [r"\n\n"]
        self.patterns = patterns

    def chunk(self, text: str) -> List[str]:
        paragraphs = [text]
        for pattern in self.patterns:
            out: List[str] = []
            for p in paragraphs:
                out.extend(re.split(pattern, p))
            paragraphs = out
        return paragraphs


class NlpSentenceChunking(ChunkingStrategy):
    """Sentence splitting via the reference's own regex fallback
    (chunking_strategy.py:79-83)."""

    _SENT_RE = re.compile(
        r"(?<!\w\.\w.)(?<![A-Z][a-z]\.)(?<![A-Z][A-Z]\.)(?<![A-Za-z]\.)(?<=\.|\?|\!|\n)\s"
    )

    def chunk(self, text: str) -> List[str]:
        return [s.strip() for s in self._SENT_RE.split(text) if s]


class TopicSegmentationChunking(ChunkingStrategy):
    """Paragraph-boundary topic segmentation (TextTiling stand-in)
    with most-common-keyword extraction (chunking_strategy.py:92-141)."""

    _STOP = frozenset(
        "the a an and or of to in is are was were be been it this that for on with as at by".split()
    )

    def __init__(self, num_keywords: int = 3, **kwargs):
        self.num_keywords = num_keywords

    def chunk(self, text: str) -> List[str]:
        return [seg for seg in re.split(r"\n\s*\n", text) if seg.strip()]

    def extract_keywords(self, text: str) -> List[str]:
        tokens = [
            t.lower()
            for t in re.findall(r"\w+", text)
            if t.lower() not in self._STOP
        ]
        return [w for w, _ in Counter(tokens).most_common(self.num_keywords)]

    def chunk_with_topics(self, text: str) -> List[tuple]:
        return [(seg, self.extract_keywords(seg)) for seg in self.chunk(text)]


class FixedLengthWordChunking(ChunkingStrategy):
    def __init__(self, chunk_size: int = 100, **kwargs):
        self.chunk_size = chunk_size

    def chunk(self, text: str) -> List[str]:
        words = text.split()
        return [
            " ".join(words[i : i + self.chunk_size])
            for i in range(0, len(words), self.chunk_size)
        ]


class SlidingWindowChunking(ChunkingStrategy):
    def __init__(self, window_size: int = 100, step: int = 50, **kwargs):
        self.window_size = window_size
        self.step = step

    def chunk(self, text: str) -> List[str]:
        words = text.split()
        if len(words) <= self.window_size:
            return [text]
        chunks = []
        i = 0
        for i in range(0, len(words) - self.window_size + 1, self.step):
            chunks.append(" ".join(words[i : i + self.window_size]))
        if i + self.window_size < len(words):
            chunks.append(" ".join(words[-self.window_size :]))
        return chunks


class OverlappingWindowChunking(ChunkingStrategy):
    def __init__(self, window_size: int = 1000, overlap: int = 100, **kwargs):
        self.window_size = window_size
        self.overlap = overlap

    def chunk(self, text: str) -> List[str]:
        words = text.split()
        if len(words) <= self.window_size:
            return [text]
        chunks = []
        start = 0
        while start < len(words):
            end = start + self.window_size
            chunks.append(" ".join(words[start:end]))
            if end >= len(words):
                break
            start = end - self.overlap
        return chunks


def merge_chunks(
    chunks: List[str],
    target_size: int,
    overlap: int = 0,
    word_token_ratio: float = 1.0,
    splitter=None,
) -> List[str]:
    """Token-budget chunk merger, algorithm-parity with
    crawl4ai/utils.py:162-224 (pinned by differential fuzz in
    tests/test_reference_differential.py): tokenize every doc, skip docs
    whose scaled token count rounds to zero, pre-allocate
    ``ceil(total/target)`` output slots, then stream individual tokens
    into slots — advancing (with an ``overlap``-token carry) whenever the
    current slot reaches ``target_size``, except into the last slot which
    absorbs the remainder."""
    splitter = splitter or str.split
    all_tokens: List[List[str]] = []
    total = 0
    for doc in chunks:
        tokens = splitter(doc)
        count = int(len(tokens) * word_token_ratio)
        if count:
            all_tokens.append(tokens)
            total += count
    if not total:
        return []

    num_out = max(1, (total + target_size - 1) // target_size)
    out: List[List[str]] = [[] for _ in range(num_out)]
    cur = 0
    cur_size = 0
    for tokens in all_tokens:
        for tok in tokens:
            if cur_size >= target_size and cur < num_out - 1:
                if overlap > 0:
                    carry = out[cur][-overlap:]
                    cur += 1
                    out[cur].extend(carry)
                    cur_size = len(carry)
                else:
                    cur += 1
                    cur_size = 0
            out[cur].append(tok)
            cur_size += 1
    return [" ".join(c) for c in out if c]


def merge_chunks_based_on_token_threshold(
    chunks: List[str], token_threshold: int
) -> List[str]:
    """Greedy small-chunk merger (reference utils.py:2040-2070): word
    count × 1.3 estimates tokens; a chunk that would cross the threshold
    starts a new section; sections join with blank lines."""
    merged: List[str] = []
    current: List[str] = []
    total = 0.0
    for chunk in chunks:
        est = len(chunk.split()) * 1.3
        if total + est < token_threshold:
            current.append(chunk)
            total += est
        else:
            if current:
                merged.append("\n\n".join(current))
            current = [chunk]
            total = est
    if current:
        merged.append("\n\n".join(current))
    return merged


def chunk_documents(
    documents,
    chunk_token_threshold: int,
    overlap: int,
    word_token_rate: float = 0.75,
    tokenizer=None,
):
    """Streaming token-budget chunker with overlap, algorithm-parity
    with reference utils.py:76-160 (pinned by differential fuzz): docs
    feed a token queue; whenever the queued contribution total reaches
    the threshold a chunk is emitted up to (not over) the threshold,
    its tail ``overlap`` tokens are pushed back for the next chunk, and
    the emitted text EXCLUDES the pushed-back tail; the final partial
    queue flushes as one chunk."""
    from collections import deque

    tok_q: deque = deque()
    contrib_q: deque = deque()
    count = 0.0
    for doc in documents:
        if tokenizer:
            tokens = tokenizer(doc)
            contributions = [1.0] * len(tokens)
        else:
            tokens = doc.split()
            contributions = [word_token_rate] * len(tokens)
        tok_q.extend(tokens)
        contrib_q.extend(contributions)
        count += sum(contributions)

        while count >= chunk_token_threshold:
            chunk_toks: List[str] = []
            chunk_contrib: List[float] = []
            chunk_total = 0.0
            while contrib_q:
                nxt = contrib_q[0]
                if chunk_total + nxt > chunk_token_threshold:
                    break
                chunk_total += nxt
                chunk_contrib.append(contrib_q.popleft())
                chunk_toks.append(tok_q.popleft())
            if not chunk_contrib:  # single token exceeds the threshold
                chunk_contrib.append(contrib_q.popleft())
                chunk_toks.append(tok_q.popleft())

            overlap_total = 0.0
            overlap_idx = 0
            for c in reversed(chunk_contrib):
                if overlap_total + c > overlap:
                    break
                overlap_total += c
                overlap_idx += 1
            if overlap_idx > 0:
                tok_q.extendleft(reversed(chunk_toks[-overlap_idx:]))
                contrib_q.extendleft(reversed(chunk_contrib[-overlap_idx:]))
                count += overlap_total
            count -= sum(chunk_contrib)
            yield " ".join(
                chunk_toks[: len(chunk_toks) - overlap_idx] if overlap_idx else chunk_toks
            )
    if tok_q:
        yield " ".join(tok_q)


def chunk_documents_batch(
    batch: pa.Table,
    strategy: ChunkingStrategy,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> pa.Table:
    """map_batches stage: explode documents into chunk rows
    (id, chunk_idx, chunk)."""
    ids = batch.column(id_column).to_pylist()
    texts = batch.column(text_column).to_pylist()
    out_ids, out_idx, out_chunks = [], [], []
    for i, t in zip(ids, texts):
        for j, c in enumerate(strategy.chunk(t or "")):
            out_ids.append(i)
            out_idx.append(j)
            out_chunks.append(c)
    return pa.table(
        {
            id_column: pa.array(out_ids),
            "chunk_idx": pa.array(out_idx, pa.int32()),
            "chunk": pa.array(out_chunks, pa.string()),
        }
    )
