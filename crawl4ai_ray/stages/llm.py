"""LLM-backed strategy seams — reference ``LLMExtractionStrategy``
(crawl4ai/extraction_strategy.py:533-1042), ``LLMContentFilter``
(content_filter_strategy.py:808-1091) and ``LLMTableExtraction``.

No network and no model in this sandbox, so these are SEAMS, not
implementations: the batching, chunking, token accounting and output
assembly are real; the single ``complete()`` call raises
``NotImplementedError`` unless a completion callable is injected.
A deployment passes ``complete=`` (an OpenAI-compatible callable or a
local pipeline); tests inject deterministic fakes.

Ray mapping: an LLM stage is an actor-pool ``map_batches`` class —
client/session built once per actor in ``__init__``, requests batched
per ``__call__`` — exactly the CosineStrategy pattern with a remote
call instead of local inference.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import pyarrow as pa

from ..functions.chunking import merge_chunks


@dataclass
class TokenUsage:
    """Reference TokenUsage accounting (extraction_strategy.py:533+)."""

    completion_tokens: int = 0
    prompt_tokens: int = 0
    total_tokens: int = 0

    def add(self, prompt: int, completion: int) -> None:
        self.prompt_tokens += prompt
        self.completion_tokens += completion
        self.total_tokens += prompt + completion


def _approx_tokens(text: str) -> int:
    return max(1, len(text) // 4)


class LLMExtractionStage:
    """Actor-pool seam: (url, content) -> extracted JSON rows.

    ``complete(prompt) -> str`` is the injected model call. Content is
    chunked to ``chunk_token_threshold`` with overlap (reference
    merge_chunks), one completion per chunk, usage accounted.
    """

    def __init__(
        self,
        instruction: str,
        complete: Optional[Callable[[str], str]] = None,
        chunk_token_threshold: int = 2048,
        overlap_rate: float = 0.1,
        input_column: str = "text",
    ):
        self.instruction = instruction
        self.complete = complete
        self.chunk_token_threshold = chunk_token_threshold
        self.overlap_rate = overlap_rate
        self.input_column = input_column
        self.usage = TokenUsage()

    def _llm(self, prompt: str) -> str:
        if self.complete is None:
            raise NotImplementedError(
                "no LLM endpoint in this environment — inject complete="
            )
        out = self.complete(prompt)
        self.usage.add(_approx_tokens(prompt), _approx_tokens(out))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column(self.input_column).to_pylist()
        o_url, o_chunk, o_out = [], [], []
        for url, text in zip(urls, texts):
            chunks = merge_chunks(
                (text or "").split("\n\n"),
                target_size=self.chunk_token_threshold,
                overlap=int(self.chunk_token_threshold * self.overlap_rate),
            )
            for ci, chunk in enumerate(chunks):
                o_url.append(url)
                o_chunk.append(ci)
                o_out.append(self._llm(f"{self.instruction}\n\n{chunk}"))
        return pa.table(
            {
                "url": pa.array(o_url, pa.string()),
                "chunk": pa.array(o_chunk, pa.int32()),
                "extracted": pa.array(o_out, pa.string()),
            }
        )


class LLMContentFilterStage:
    """Seam for fit-markdown via LLM (reference LLMContentFilter):
    per-page single completion producing filtered markdown."""

    def __init__(
        self,
        instruction: str = "Extract the main content as markdown.",
        complete: Optional[Callable[[str], str]] = None,
        input_column: str = "raw_markdown",
    ):
        self.instruction = instruction
        self.complete = complete
        self.input_column = input_column
        self.usage = TokenUsage()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.complete is None:
            raise NotImplementedError(
                "no LLM endpoint in this environment — inject complete="
            )
        texts = batch.column(self.input_column).to_pylist()
        out = []
        for t in texts:
            prompt = f"{self.instruction}\n\n{t or ''}"
            r = self.complete(prompt)
            self.usage.add(_approx_tokens(prompt), _approx_tokens(r))
            out.append(r)
        return batch.append_column("fit_markdown_llm", pa.array(out, pa.string()))
