"""Canonical whitespace tokenization for beyond-reference text ops.

Pinned to RE2's ``\\s`` character class ``[ \\t\\n\\r\\f]`` so every
Python batch function and its DuckDB oracle
(``list_filter(regexp_split_to_array(coalesce(text,''), '\\s+'),
x -> x <> '')``) agree byte-for-byte on ALL inputs. Python's
``str.split()`` additionally splits on ``\\x0b`` / NBSP / Unicode
spaces, which RE2 does not — on real web text that silently diverges
the production path from the oracle (ADVICE r2, medium).

A token is a maximal run of non-``[ \\t\\n\\r\\f]`` characters; empty
tokens are impossible by construction.
"""

from __future__ import annotations

import re

# maximal runs of non-whitespace == RE2 split on \s+ with '' filtered
WS_TOKEN_RE = re.compile(r"[^ \t\n\r\f]+")
# runs of whitespace (for strip-all-whitespace character counts)
WS_RUN_RE = re.compile(r"[ \t\n\r\f]+")


def tokens(text: str) -> list[str]:
    """Scalar tokenizer (oracle-exact)."""
    return WS_TOKEN_RE.findall(text or "")
