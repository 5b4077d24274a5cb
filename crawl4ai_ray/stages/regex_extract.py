"""Regex extraction strategy — precompiled pattern catalog over text
columns, exploding to one row per match.

Models ``RegexExtractionStrategy``
(crawl4ai/extraction_strategy.py:2558-2727): the same 21 built-in
labels (email, phones, url, ipv4/6, uuid, currency, percentage,
number, dates, time, postals, hex color, twitter, hashtag, mac, iban,
credit card), IGNORECASE|MULTILINE compilation, ``{url, label, value,
span}`` match rows, custom-pattern overrides.

Ray mapping: a **stateful actor stage** — patterns compile once per
actor in ``__init__`` (the reference compiles once per strategy
instance), matches stream out via ``flat_map``-style row explosion
inside ``map_batches``.
"""

from __future__ import annotations

import re
from enum import IntFlag, auto
from typing import Dict, List, Optional, Tuple, Union

import pyarrow as pa


class Pattern(IntFlag):
    EMAIL = auto()
    PHONE_INTL = auto()
    PHONE_US = auto()
    URL = auto()
    IPV4 = auto()
    IPV6 = auto()
    UUID = auto()
    CURRENCY = auto()
    PERCENTAGE = auto()
    NUMBER = auto()
    DATE_ISO = auto()
    DATE_US = auto()
    TIME_24H = auto()
    POSTAL_US = auto()
    POSTAL_UK = auto()
    HTML_COLOR_HEX = auto()
    TWITTER_HANDLE = auto()
    HASHTAG = auto()
    MAC_ADDR = auto()
    IBAN = auto()
    CREDIT_CARD = auto()

    @classmethod
    def all(cls) -> "Pattern":
        out = cls(0)
        for p in cls:
            out |= p
        return out


# Same catalog semantics as the reference's DEFAULT_PATTERNS
# (extraction_strategy.py:2634-2664)
DEFAULT_PATTERNS: Dict[str, str] = {
    "email": r"[\w.+-]+@[\w-]+\.[\w.-]+",
    "phone_intl": r"\+?\d[\d .()-]{7,}\d",
    "phone_us": r"\(?\d{3}\)?[ -. ]?\d{3}[ -. ]?\d{4}",
    "url": r"https?://[^\s\"'<>]+",
    "ipv4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "ipv6": r"[A-F0-9]{1,4}(?::[A-F0-9]{1,4}){7}",
    "uuid": r"[0-9a-f]{8}-[0-9a-f]{4}-[1-5][0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}",
    "currency": r"(?:USD|EUR|RM|\$|€|£)\s?\d+(?:[.,]\d{2})?",
    "percentage": r"\d+(?:\.\d+)?%",
    "number": r"\b\d{1,3}(?:[,.\s]\d{3})*(?:\.\d+)?\b",
    "date_iso": r"\d{4}-\d{2}-\d{2}",
    "date_us": r"\d{1,2}/\d{1,2}/\d{2,4}",
    "time_24h": r"\b(?:[01]?\d|2[0-3]):[0-5]\d(?:[:.][0-5]\d)?\b",
    "postal_us": r"\b\d{5}(?:-\d{4})?\b",
    "postal_uk": r"\b[A-Z]{1,2}\d[A-Z\d]? ?\d[A-Z]{2}\b",
    "html_color_hex": r"#[0-9A-Fa-f]{6}\b",
    "twitter_handle": r"@[\w]{1,15}",
    "hashtag": r"#[\w-]+",
    "mac_addr": r"(?:[0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}",
    "iban": r"[A-Z]{2}\d{2}[A-Z0-9]{11,30}",
    "credit_card": r"\b(?:4\d{12}(?:\d{3})?|5[1-5]\d{14}|3[47]\d{13}|6(?:011|5\d{2})\d{12})\b",
}

_FLAGS = re.IGNORECASE | re.MULTILINE


class RegexExtractor:
    """Callable actor class for ``map_batches``. Compiles once in
    ``__init__``; per batch explodes (key, text) rows to match rows
    (key, label, value, span_start, span_end)."""

    def __init__(
        self,
        pattern: Pattern = Pattern.all(),
        custom: Optional[Union[Dict[str, str], List[Tuple[str, str]]]] = None,
        text_column: str = "text",
        key_column: str = "url",
    ):
        merged = {
            label: rx
            for label, rx in DEFAULT_PATTERNS.items()
            if Pattern[label.upper()] & pattern
        }
        if custom:
            items = custom.items() if isinstance(custom, dict) else custom
            merged.update(dict(items))
        self.compiled = {lbl: re.compile(rx, _FLAGS) for lbl, rx in merged.items()}
        self.text_column = text_column
        self.key_column = key_column

    def extract(self, key: str, content: str) -> List[dict]:
        out = []
        for label, cre in self.compiled.items():
            for m in cre.finditer(content):
                out.append(
                    {
                        self.key_column: key,
                        "label": label,
                        "value": m.group(0),
                        "span_start": m.start(),
                        "span_end": m.end(),
                    }
                )
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_column).to_pylist()
        texts = batch.column(self.text_column).to_pylist()
        k_out, l_out, v_out, s_out, e_out = [], [], [], [], []
        for k, t in zip(keys, texts):
            for row in self.extract(k, t or ""):
                k_out.append(row[self.key_column])
                l_out.append(row["label"])
                v_out.append(row["value"])
                s_out.append(row["span_start"])
                e_out.append(row["span_end"])
        return pa.table(
            {
                self.key_column: pa.array(k_out),
                "label": pa.array(l_out, pa.string()),
                "value": pa.array(v_out, pa.string()),
                "span_start": pa.array(s_out, pa.int64()),
                "span_end": pa.array(e_out, pa.int64()),
            }
        )
