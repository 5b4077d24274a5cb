"""Scalar text/JSON helpers (SURVEY §2.11; reference:
crawl4ai/utils.py:777 ``sanitize_input_encode``, :795
``escape_json_string``, :707 ``split_and_parse_json_objects``, :1709
``extract_xml_data``, :3004 ``truncate``). Plain Python scalars used
inside batch UDFs — written from scratch to the reference's contract.
"""

from __future__ import annotations

import json
import re
from typing import Optional


def sanitize_input_encode(text) -> str:
    """Coerce arbitrary input to a valid utf-8 str (bad surrogates and
    undecodable bytes replaced); None -> ''."""
    if text is None:
        return ""
    if isinstance(text, (bytes, bytearray)):
        return bytes(text).decode("utf-8", errors="replace")
    if not isinstance(text, str):
        text = str(text)
    return text.encode("utf-8", errors="replace").decode("utf-8")


def escape_json_string(s: Optional[str]) -> str:
    """Escape a string for embedding inside a JSON string literal."""
    if s is None:
        return ""
    return json.dumps(s)[1:-1]


def extract_xml_data(tags: list[str], body: str) -> dict[str, str]:
    """Pull ``<tag>...</tag>`` contents for each requested tag (first
    match wins, missing tag -> ''), tolerant of attributes and
    whitespace."""
    out = {}
    for tag in tags:
        m = re.search(
            rf"<{re.escape(tag)}(?:\s[^>]*)?>(.*?)</{re.escape(tag)}>",
            body or "",
            re.DOTALL | re.IGNORECASE,
        )
        out[tag] = m.group(1).strip() if m else ""
    return out


def split_and_parse_json_objects(s: str) -> tuple[list, list[str]]:
    """Split a string containing concatenated/embedded JSON objects
    into (parsed_objects, unparseable_segments). Brace-depth scan that
    honors strings and escapes."""
    parsed: list = []
    bad: list[str] = []
    if not s:
        return parsed, bad
    depth = 0
    start = None
    in_str = False
    esc = False
    for i, ch in enumerate(s):
        if esc:
            esc = False
            continue
        if in_str:
            if ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
        elif ch == "{":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "}":
            if depth > 0:
                depth -= 1
                if depth == 0 and start is not None:
                    seg = s[start : i + 1]
                    try:
                        parsed.append(json.loads(seg))
                    except json.JSONDecodeError:
                        bad.append(seg)
                    start = None
    if depth > 0 and start is not None:
        bad.append(s[start:])
    return parsed, bad


def truncate(text: str, max_len: int, ellipsis: str = "...") -> str:
    """Length cap with trailing marker (reference utils.py:3004)."""
    if text is None:
        return ""
    if len(text) <= max_len:
        return text
    if max_len <= len(ellipsis):
        return text[:max_len]
    return text[: max_len - len(ellipsis)] + ellipsis
