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
    # errors="ignore" (drop, not replace) on the str path — reference
    # utils.py:777-793 parity
    return text.encode("utf-8", errors="ignore").decode("utf-8")


def escape_json_string(s: Optional[str]) -> str:
    """Escape a string for embedding inside a JSON string literal —
    transform-parity with reference utils.py:795-822: backslash first,
    then quote, named control escapes, then a \\uXXXX sweep over the
    remaining C0/C1 control ranges (non-ASCII printable chars are left
    as-is, unlike ``json.dumps``)."""
    if s is None:
        return ""
    s = s.replace("\\", "\\\\").replace('"', '\\"')
    for ch, esc in (
        ("\b", "\\b"), ("\f", "\\f"), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t"),
    ):
        s = s.replace(ch, esc)
    return re.sub(
        r"[\x00-\x1f\x7f-\x9f]", lambda m: "\\u{:04x}".format(ord(m.group())), s
    )


def extract_xml_tags(body: str) -> list[str]:
    """Distinct bare ``<tag>`` names found in the string (reference
    utils.py:1666-1677; unordered there too)."""
    return list(set(re.findall(r"<(\w+)>", body)))


def extract_xml_data(tags: list[str], body: str) -> dict[str, str]:
    """Pull ``<tag>...</tag>`` contents for each requested tag —
    reference utils.py:1709-1741 semantics: among all non-self-nested
    occurrences the LONGEST content wins (stripped); missing tag -> ''.
    Case-sensitive, bare tags only."""
    out = {}
    for tag in tags:
        pattern = f"<{tag}>((?:(?!<{tag}>).)*)</{tag}>"
        matches = re.findall(pattern, body or "", re.DOTALL)
        out[tag] = max(matches, key=len).strip() if matches else ""
    return out


def extract_xml_data_legacy(tags: list[str], body: str) -> dict[str, str]:
    """First-occurrence variant (reference utils.py:1680-1706)."""
    out = {}
    for tag in tags:
        pattern = f"<{tag}>((?:(?!<{tag}>).)*)</{tag}>"
        m = re.search(pattern, body or "", re.DOTALL)
        out[tag] = m.group(1).strip() if m else ""
    return out


def split_and_parse_json_objects(s: str) -> tuple[list, list[str]]:
    """Split a string of JSON objects into (parsed, unparseable
    segments) — algorithm-parity with reference utils.py:707-749: trim a
    single ``[...]`` wrapper, then a bare brace-depth scan (braces inside
    JSON strings are NOT honored — a known reference limitation kept for
    parity; segments that fail ``json.loads`` land in the second list)."""
    if s.startswith("[") and s.endswith("]"):
        s = s[1:-1].strip()
    segments = []
    depth = 0
    start = 0
    for i, ch in enumerate(s):
        if ch == "{":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                segments.append(s[start : i + 1])
    parsed: list = []
    bad: list[str] = []
    for seg in segments:
        try:
            parsed.append(json.loads(seg))
        except json.JSONDecodeError:
            bad.append(seg)
    return parsed, bad


def truncate(text: str, max_len: int, ellipsis: str = "...") -> str:
    """Length cap with trailing marker APPENDED after the slice
    (reference utils.py:3004-3007: result may exceed the threshold by
    the marker length)."""
    if text is None:
        return ""
    if len(text) > max_len:
        return text[:max_len] + ellipsis
    return text
