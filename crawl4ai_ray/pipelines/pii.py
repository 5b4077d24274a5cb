"""PII scrubbing: redact emails / phones / IPs / UUIDs / card numbers.

A standard curation pass a training-data pipeline runs before
publishing a web corpus: find PII spans, replace each with a
``[LABEL]`` placeholder, and report per-document counts. The span
patterns are the reference's RegexExtractionStrategy catalog
(extraction_strategy.py:2634-2664, ast-pinned in
stages/regex_extract.py) — this operator turns that *extraction*
surface into the *redaction* surface.

Shape: one ``map_batches`` scan with an actor-pool class (patterns
compiled once per actor in ``__init__``); per batch the work is
vectorized ``Series.str.count`` / ``str.replace`` over compiled
regexes — no per-row Python. Output rows are constant-width
(counts + scrubbed length + a bounded tail sample), so a 100-TB scan
emits metadata, not text; ``keep_text=True`` additionally carries the
scrubbed text through for a write-back pipeline.

Replacement semantics (mirrored exactly by the SQL oracle):
labels are applied in SPECIFICITY ORDER — email, credit_card, ipv4,
uuid, phone_intl — each pattern scanning the text produced by the
previous replacement. Order matters: any 13-16-digit card number is
also a ``phone_intl`` match (``\\+?\\d[\\d .()-]{7,}\\d``), so the
card pattern must claim its spans first, and an email's digits can
never later match as a phone. Matches are leftmost non-overlapping.
Flags are the reference's IGNORECASE | MULTILINE; note Python ``\\w``
is Unicode where RE2's is ASCII — identical on ASCII corpora, and the
catalog is ASCII-defined (same caveat as functions/wstokens.py).
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence

import pandas as pd

from ..stages.regex_extract import DEFAULT_PATTERNS, _FLAGS

# catalog subset that is PII, in application (specificity) order
PII_LABELS: List[str] = ["email", "credit_card", "ipv4", "uuid", "phone_intl"]
TAIL_CHARS = 48  # bounded scrubbed-text sample surfaced per doc


class PiiScrubber:
    """Callable class for ``map_batches(..., concurrency=N)``:
    compiles the catalog once per actor, scrubs per batch."""

    def __init__(
        self,
        labels: Optional[Sequence[str]] = None,
        text_column: str = "text",
        id_column: str = "doc_id",
        keep_text: bool = False,
    ):
        self._labels = list(labels or PII_LABELS)
        self._res = [
            (lab, re.compile(DEFAULT_PATTERNS[lab], _FLAGS))
            for lab in self._labels
        ]
        self._text_column = text_column
        self._id_column = id_column
        self._keep_text = keep_text

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        s = df[self._text_column].fillna("").astype(str)
        out = {self._id_column: df[self._id_column].to_numpy()}
        for lab, rx in self._res:
            out[f"n_{lab}"] = s.str.count(rx).to_numpy("int64")
            s = s.str.replace(rx, f"[{lab.upper()}]", regex=True)
        out["scrubbed_len"] = s.str.len().to_numpy("int64")
        out["scrubbed_tail"] = s.str.slice(-TAIL_CHARS).to_numpy(object)
        if self._keep_text:
            out["scrubbed_text"] = s.to_numpy(object)
        return pd.DataFrame(out)
