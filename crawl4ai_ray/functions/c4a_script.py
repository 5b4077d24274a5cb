"""C4A-Script compiler: the reference's web-automation DSL -> JS.

Re-implements the ``crawl4ai.script`` package (reference:
crawl4ai/script/c4ai_script.py:1-690 — grammar + IR + JS emitter;
crawl4ai/script/c4a_compile.py:27-320 — result-based API;
crawl4ai/script/c4a_result.py:13-219 — result dataclasses; exported
top-level as ``c4a_compile``/``c4a_validate``/``c4a_compile_file``,
crawl4ai/__init__.py:93-95) from scratch:

- The reference parses with a Lark LALR grammar; ``lark`` is not in
  this container, so the parser here is an original hand-written
  tokenizer + recursive-descent parser over the same language
  (grammar spec: c4ai_script.py:131-193). Newlines are insignificant
  (the reference ``%ignore``-s them), keywords are uppercase and
  take priority over NAME, and backtick strings may span lines.
- The JS emitter's output strings are the observable contract (they
  feed ``CrawlerRunConfig(js_code=[...])``), so the templates here
  reproduce the reference emitter byte-for-byte — including its
  ``textwrap.dedent`` behavior, where a multi-line insert defeats
  dedent and the template's source-column indentation leaks into the
  output (``_ref_block`` emulates exactly that), and the quirk that
  coordinate-based DOUBLE_CLICK/RIGHT_CLICK emit a plain ``click``
  event (c4ai_script.py:451 passes evt/button/detail only on the
  selector path).
- The LLM script-generation helper (c4a_compile.py:322-382,
  ``generate_script``) is a live-completion seam and stays out of
  scope here like the rest of the LLM provider plumbing (SURVEY §8).

Compilation passes mirror the reference pipeline
(c4ai_script.py:331-384): parse with includes -> collect PROCs ->
inline CALLs (top level only; CALLs nested in IF/REPEAT are inlined
at emission) -> apply SETVARs ($name substitution, TYPE/EVAL/SET args
only) -> emit JS per command.
"""

from __future__ import annotations

import json
import pathlib
import re
import textwrap
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Dict, List, Optional, Union

# ---------------------------------------------------------------------------
# result surface (reference c4a_result.py:13-219)
# ---------------------------------------------------------------------------


class ErrorType(Enum):
    SYNTAX = "syntax"
    SEMANTIC = "semantic"
    RUNTIME = "runtime"


class Severity(Enum):
    ERROR = "error"
    WARNING = "warning"
    INFO = "info"


@dataclass
class Suggestion:
    """A suggestion for fixing an error."""

    message: str
    fix: Optional[str] = None

    def to_dict(self) -> dict:
        return {"message": self.message, "fix": self.fix}


@dataclass
class ErrorDetail:
    """Detailed information about a compilation error."""

    type: ErrorType
    code: str  # E001, E002, ...
    severity: Severity
    message: str
    line: int
    column: int
    source_line: str
    end_line: Optional[int] = None
    end_column: Optional[int] = None
    line_before: Optional[str] = None
    line_after: Optional[str] = None
    suggestions: List[Suggestion] = field(default_factory=list)
    documentation_url: Optional[str] = None

    def to_dict(self) -> dict:
        return {
            "type": self.type.value,
            "code": self.code,
            "severity": self.severity.value,
            "message": self.message,
            "location": {
                "line": self.line,
                "column": self.column,
                "endLine": self.end_line,
                "endColumn": self.end_column,
            },
            "context": {
                "sourceLine": self.source_line,
                "lineBefore": self.line_before,
                "lineAfter": self.line_after,
                "marker": {
                    "start": self.column - 1,
                    "length": (self.end_column - self.column) if self.end_column else 1,
                },
            },
            "suggestions": [s.to_dict() for s in self.suggestions],
            "documentationUrl": self.documentation_url,
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @property
    def formatted_message(self) -> str:
        lines = [f"\n{'=' * 60}"]
        lines.append(f"{self.type.value.title()} Error [{self.code}]")
        lines.append(f"{'=' * 60}")
        lines.append(f"Location: Line {self.line}, Column {self.column}")
        lines.append(f"Error: {self.message}")
        if self.source_line:
            marker = " " * (self.column - 1) + "^"
            if self.end_column:
                marker += "~" * (self.end_column - self.column - 1)
            lines.append("\nCode:")
            if self.line_before:
                lines.append(f"  {self.line - 1: >3} | {self.line_before}")
            lines.append(f"  {self.line: >3} | {self.source_line}")
            lines.append(f"      | {marker}")
            if self.line_after:
                lines.append(f"  {self.line + 1: >3} | {self.line_after}")
        if self.suggestions:
            lines.append("\nSuggestions:")
            for i, s in enumerate(self.suggestions, 1):
                lines.append(f"  {i}. {s.message}")
                if s.fix:
                    lines.append(f"     Fix: {s.fix}")
        lines.append("=" * 60)
        return "\n".join(lines)

    @property
    def simple_message(self) -> str:
        return f"Line {self.line}: {self.message}"


@dataclass
class WarningDetail:
    """Information about a compilation warning."""

    code: str
    message: str
    line: int
    column: int

    def to_dict(self) -> dict:
        return {
            "code": self.code,
            "message": self.message,
            "line": self.line,
            "column": self.column,
        }


@dataclass
class CompilationResult:
    """Result of C4A-Script compilation (no exceptions)."""

    success: bool
    js_code: Optional[List[str]] = None
    errors: List[ErrorDetail] = field(default_factory=list)
    warnings: List[WarningDetail] = field(default_factory=list)
    metadata: Dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {
            "success": self.success,
            "jsCode": self.js_code,
            "errors": [e.to_dict() for e in self.errors],
            "warnings": [w.to_dict() for w in self.warnings],
            "metadata": self.metadata,
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @property
    def has_errors(self) -> bool:
        return len(self.errors) > 0

    @property
    def has_warnings(self) -> bool:
        return len(self.warnings) > 0

    @property
    def first_error(self) -> Optional[ErrorDetail]:
        return self.errors[0] if self.errors else None

    def __str__(self) -> str:
        if self.success:
            msg = "✓ Compilation successful"
            if self.js_code:
                msg += f" - {len(self.js_code)} statements generated"
            if self.warnings:
                msg += f" ({len(self.warnings)} warnings)"
            return msg
        return f"✗ Compilation failed - {len(self.errors)} error(s)"


@dataclass
class ValidationResult:
    """Result of script validation."""

    valid: bool
    errors: List[ErrorDetail] = field(default_factory=list)
    warnings: List[WarningDetail] = field(default_factory=list)

    def to_dict(self) -> dict:
        return {
            "valid": self.valid,
            "errors": [e.to_dict() for e in self.errors],
            "warnings": [w.to_dict() for w in self.warnings],
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @property
    def first_error(self) -> Optional[ErrorDetail]:
        return self.errors[0] if self.errors else None


# ---------------------------------------------------------------------------
# exceptions (reference c4ai_script.py:20-125 C4AScriptError surface;
# the internal _Unexpected* classes stand in for lark's
# UnexpectedToken/UnexpectedCharacters, carrying the same fields the
# reference error handlers read off the lark exceptions)
# ---------------------------------------------------------------------------


class _UnexpectedToken(Exception):
    """Parser found a token that doesn't fit — analog of lark's
    UnexpectedToken. ``expected`` uses lark-style terminal names
    (THEN, RPAR, COMMA, BACKTICK_STRING, ...) so the downstream error
    heuristics match the reference's string checks."""

    def __init__(self, token_type: str, token_value: str, line: int, column: int, expected: List[str]):
        self.token_type = token_type
        self.token_value = token_value
        self.line = line
        self.column = column
        self.expected = expected
        super().__init__(f"Unexpected token {token_type} ({token_value!r}) at {line}:{column}")


class _UnexpectedChars(Exception):
    """Lexer hit a character no token starts with — analog of lark's
    UnexpectedCharacters."""

    def __init__(self, line: int, column: int, char: str):
        self.line = line
        self.column = column
        self.char = char
        super().__init__(f"Unexpected character {char!r} at {line}:{column}")


class C4AScriptError(Exception):
    """Formatted compilation error for the exception-based API
    (reference c4ai_script.py:20-125)."""

    def __init__(
        self,
        message: str,
        line: int = None,
        column: int = None,
        error_type: str = "Syntax Error",
        details: str = None,
    ):
        self.message = message
        self.line = line
        self.column = column
        self.error_type = error_type
        self.details = details
        super().__init__(self._format_message())

    def _format_message(self) -> str:
        lines = [f"\n{'=' * 60}"]
        lines.append(f"C4A-Script {self.error_type}")
        lines.append(f"{'=' * 60}")
        if self.line:
            lines.append(
                f"Location: Line {self.line}" + (f", Column {self.column}" if self.column else "")
            )
        lines.append(f"Error: {self.message}")
        if self.details:
            lines.append(f"\nDetails: {self.details}")
        lines.append("=" * 60)
        return "\n".join(lines)

    @classmethod
    def from_exception(cls, exc: Exception, script: Union[str, List[str]]) -> "C4AScriptError":
        text = script if isinstance(script, str) else "\n".join(script)
        script_lines = text.split("\n")

        if isinstance(exc, _UnexpectedToken):
            line, column = exc.line, exc.column
            if 0 < line <= len(script_lines):
                problem = script_lines[line - 1]
                marker = " " * (column - 1) + "^"
                details = f"\nCode:\n  {problem}\n  {marker}\n"
                if exc.token_type == "CLICK" and "THEN" in exc.expected:
                    message = "Missing 'THEN' keyword after IF condition"
                elif exc.token_type == "$END":
                    message = (
                        "Unexpected end of script. Check for missing ENDPROC or incomplete commands"
                    )
                elif "RPAR" in exc.expected:
                    message = "Missing closing parenthesis ')'"
                elif "COMMA" in exc.expected:
                    message = "Missing comma ',' in command"
                else:
                    message = f"Unexpected '{exc.token_value}'"
                    shown = [e for e in exc.expected if not e.startswith("_")]
                    if shown:
                        message += f". Expected: {', '.join(shown[:3])}"
                details += f"Token: {exc.token_type} ('{exc.token_value}')"
            else:
                message, details = str(exc), None
            return cls(message, line, column, "Syntax Error", details)

        if isinstance(exc, _UnexpectedChars):
            line, column = exc.line, exc.column
            if 0 < line <= len(script_lines):
                problem = script_lines[line - 1]
                marker = " " * (column - 1) + "^"
                details = f"\nCode:\n  {problem}\n  {marker}\n"
                message = f"Invalid character or unexpected text at position {column}"
            else:
                message, details = str(exc), None
            return cls(message, line, column, "Syntax Error", details)

        if isinstance(exc, ValueError):
            message = str(exc)
            if "Unknown procedure" in message:
                m = re.search(r"'([^']+)'", message)
                if m:
                    proc_name = m.group(1)
                    for i, ln in enumerate(script_lines, 1):
                        if proc_name in ln and not ln.strip().startswith("PROC"):
                            details = (
                                f"\nCode:\n  {ln.strip()}\n\nMake sure the procedure "
                                f"'{proc_name}' is defined with PROC...ENDPROC"
                            )
                            return cls(
                                f"Undefined procedure '{proc_name}'", i, None, "Runtime Error", details
                            )
            return cls(message, None, None, "Runtime Error", None)

        return cls(str(exc), None, None, "Compilation Error", None)


# ---------------------------------------------------------------------------
# IR (reference c4ai_script.py:198-207)
# ---------------------------------------------------------------------------


@dataclass
class Cmd:
    op: str
    args: List[Any]


@dataclass
class Proc:
    name: str
    body: List[Cmd]


# ---------------------------------------------------------------------------
# lexer + parser (original; language per reference grammar
# c4ai_script.py:131-193)
# ---------------------------------------------------------------------------

_KEYWORDS = {
    "WAIT", "GO", "RELOAD", "BACK", "FORWARD",
    "CLICK", "DOUBLE_CLICK", "RIGHT_CLICK", "MOVE", "DRAG", "SCROLL",
    "TYPE", "CLEAR", "SET", "PRESS", "KEY_DOWN", "KEY_UP",
    "EVAL", "SETVAR", "PROC", "ENDPROC", "USE",
    "IF", "THEN", "ELSE", "NOT", "EXISTS", "REPEAT",
}
_COMMAND_KEYWORDS = {
    "WAIT", "GO", "RELOAD", "BACK", "FORWARD",
    "CLICK", "DOUBLE_CLICK", "RIGHT_CLICK", "MOVE", "DRAG", "SCROLL",
    "TYPE", "CLEAR", "SET", "PRESS", "KEY_DOWN", "KEY_UP",
    "EVAL", "SETVAR", "IF", "REPEAT",
}

_NAME_RE = re.compile(r"\$?[A-Za-z_][A-Za-z0-9_]*")
_NUMBER_RE = re.compile(r"\d+(?:\.\d+)?(?:[eE][+-]?\d+)?")
_URL_RE = re.compile(r"(?:http|https)://\S+")
_WORD_RE = re.compile(r"[A-Za-z0-9+]+")
_DIR_RE = re.compile(r"UP|DOWN|LEFT|RIGHT", re.IGNORECASE)
_PUNCT = {"(": "LPAR", ")": "RPAR", ",": "COMMA", "=": "EQUAL"}


@dataclass
class _Tok:
    type: str  # keyword name, NAME, NUMBER, ESCAPED_STRING, BACKTICK_STRING, URL, WORD, DIR, LPAR, RPAR, COMMA, EQUAL, COMMENT, $END
    value: str
    line: int
    column: int


class _Parser:
    """Recursive-descent parser producing the Cmd/Proc IR.

    The lexer is contextual like lark's LALR lexer: URL / WORD / DIR
    tokens only exist right after GO / PRESS-KEY_* / SCROLL, so
    ``GO https://x.com`` and ``PRESS Ctrl+A`` lex without ambiguity
    against NAME."""

    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self._pushed: Optional[_Tok] = None

    # -- low-level scanning ------------------------------------------------
    def _line_col(self, pos: int) -> tuple:
        line = self.text.count("\n", 0, pos) + 1
        last_nl = self.text.rfind("\n", 0, pos)
        return line, pos - last_nl

    def _skip_ws(self):
        while self.pos < len(self.text) and self.text[self.pos] in " \t\r\n":
            self.pos += 1

    def _scan_regex(self, regex: re.Pattern, token_type: str) -> Optional[_Tok]:
        self._skip_ws()
        m = regex.match(self.text, self.pos)
        if not m:
            return None
        line, col = self._line_col(self.pos)
        self.pos = m.end()
        return _Tok(token_type, m.group(0), line, col)

    def _next_generic(self) -> _Tok:
        if self._pushed is not None:
            t, self._pushed = self._pushed, None
            return t
        self._skip_ws()
        if self.pos >= len(self.text):
            line, col = self._line_col(self.pos)
            return _Tok("$END", "", line, col)
        ch = self.text[self.pos]
        line, col = self._line_col(self.pos)
        if ch == "#":
            end = self.text.find("\n", self.pos)
            end = len(self.text) if end == -1 else end
            tok = _Tok("COMMENT", self.text[self.pos : end], line, col)
            self.pos = end
            return tok
        if ch == '"':
            i = self.pos + 1
            while i < len(self.text):
                if self.text[i] == "\\":
                    i += 2
                    continue
                if self.text[i] == '"':
                    tok = _Tok("ESCAPED_STRING", self.text[self.pos : i + 1], line, col)
                    self.pos = i + 1
                    return tok
                i += 1
            raise _UnexpectedChars(line, col, ch)  # unterminated string
        if ch == "`":
            end = self.text.find("`", self.pos + 1)
            if end == -1:
                raise _UnexpectedChars(line, col, ch)
            tok = _Tok("BACKTICK_STRING", self.text[self.pos : end + 1], line, col)
            self.pos = end + 1
            return tok
        if ch.isdigit():
            m = _NUMBER_RE.match(self.text, self.pos)
            tok = _Tok("NUMBER", m.group(0), line, col)
            self.pos = m.end()
            return tok
        m = _NAME_RE.match(self.text, self.pos)
        if m:
            val = m.group(0)
            self.pos = m.end()
            return _Tok(val if val in _KEYWORDS else "NAME", val, line, col)
        if ch in _PUNCT:
            self.pos += 1
            return _Tok(_PUNCT[ch], ch, line, col)
        raise _UnexpectedChars(line, col, ch)

    def _push(self, tok: _Tok):
        assert self._pushed is None
        self._pushed = tok

    def _expect(self, *types: str) -> _Tok:
        tok = self._next_generic()
        if tok.type not in types:
            raise _UnexpectedToken(tok.type, tok.value, tok.line, tok.column, list(types))
        return tok

    def _expect_contextual(self, regex: re.Pattern, token_type: str) -> _Tok:
        tok = self._scan_regex(regex, token_type)
        if tok is None:
            # surface whatever generic token (or bad char) sits here
            bad = self._next_generic()
            raise _UnexpectedToken(bad.type, bad.value, bad.line, bad.column, [token_type])
        return tok

    # -- grammar -----------------------------------------------------------
    def parse_program(self) -> List[Any]:
        out = []
        while True:
            tok = self._next_generic()
            if tok.type == "$END":
                return out
            out.append(self._parse_line(tok))

    def _parse_line(self, tok: _Tok) -> Any:
        if tok.type == "COMMENT":
            return Cmd("NOP", [])
        if tok.type == "PROC":
            return self._parse_proc()
        if tok.type == "USE":
            path = self._expect("ESCAPED_STRING")
            return Cmd("INCLUDE", [_strip(path.value)])
        return self._parse_command(tok)

    def _parse_proc(self) -> Proc:
        name = self._expect("NAME")
        body: List[Any] = []
        while True:
            tok = self._next_generic()
            if tok.type == "ENDPROC":
                # nested Procs/includes parse but only Cmds survive in
                # the body (reference proc_def builder, c4ai_script.py:294)
                return Proc(name.value, [b for b in body if isinstance(b, Cmd)])
            if tok.type == "$END":
                raise _UnexpectedToken("$END", "", tok.line, tok.column, ["ENDPROC"])
            body.append(self._parse_line(tok))

    def _parse_command(self, tok: _Tok) -> Cmd:
        t = tok.type
        if t == "WAIT":
            return self._parse_wait()
        if t == "GO":
            url = self._expect_contextual(_URL_RE, "URL")
            return Cmd("GO", [url.value])
        if t == "RELOAD":
            return Cmd("RELOAD", [])
        if t == "BACK":
            return Cmd("BACK", [])
        if t == "FORWARD":
            return Cmd("FORWARD", [])
        if t in ("CLICK", "DOUBLE_CLICK", "RIGHT_CLICK"):
            op = {"CLICK": "CLICK", "DOUBLE_CLICK": "DBLCLICK", "RIGHT_CLICK": "RIGHTCLICK"}[t]
            arg = self._expect("BACKTICK_STRING", "NUMBER")
            if arg.type == "BACKTICK_STRING":
                return Cmd(op, [("selector", _strip(arg.value))])
            y = self._expect("NUMBER")
            return Cmd(op, [("coords", int(arg.value), int(y.value))])
        if t == "MOVE":
            return Cmd("MOVE", [self._parse_coords()])
        if t == "DRAG":
            return Cmd("DRAG", [self._parse_coords(), self._parse_coords()])
        if t == "SCROLL":
            d = self._expect_contextual(_DIR_RE, "DIR")
            nxt = self._next_generic()
            if nxt.type == "NUMBER":
                return Cmd("SCROLL", [d.value.upper(), int(nxt.value)])
            self._push(nxt)
            return Cmd("SCROLL", [d.value.upper(), 500])
        if t == "TYPE":
            arg = self._expect("ESCAPED_STRING", "NAME")
            return Cmd("TYPE", [_strip(arg.value)])
        if t == "CLEAR":
            sel = self._expect("BACKTICK_STRING")
            return Cmd("CLEAR", [_strip(sel.value)])
        if t == "SET":
            sel = self._expect("BACKTICK_STRING")
            val = self._expect("ESCAPED_STRING", "BACKTICK_STRING", "NAME")
            return Cmd("SET", [_strip(sel.value), _strip(val.value)])
        if t in ("PRESS", "KEY_DOWN", "KEY_UP"):
            op = {"PRESS": "PRESS", "KEY_DOWN": "KEYDOWN", "KEY_UP": "KEYUP"}[t]
            w = self._expect_contextual(_WORD_RE, "WORD")
            return Cmd(op, [w.value])
        if t == "EVAL":
            txt = self._expect("BACKTICK_STRING")
            return Cmd("EVAL", [_strip(txt.value)])
        if t == "SETVAR":
            name = self._expect("NAME")
            self._expect("EQUAL")
            val = self._expect("ESCAPED_STRING", "BACKTICK_STRING", "NUMBER")
            return Cmd("SETVAR", [name.value, _strip(val.value)])
        if t == "IF":
            return self._parse_if()
        if t == "REPEAT":
            return self._parse_repeat()
        if t == "NAME":
            return Cmd("CALL", [tok.value])
        raise _UnexpectedToken(tok.type, tok.value, tok.line, tok.column, sorted(_COMMAND_KEYWORDS) + ["NAME"])

    def _parse_wait(self) -> Cmd:
        rest = self._expect("ESCAPED_STRING", "BACKTICK_STRING", "NUMBER")
        nxt = self._next_generic()
        if nxt.type == "NUMBER":
            timeout = int(nxt.value)
        else:
            self._push(nxt)
            timeout = None
        rest_str = rest.value
        try:
            payload = (float(rest_str), "seconds")
        except ValueError:
            if rest_str.startswith('"') and rest_str.endswith('"'):
                payload = (_strip(rest_str), "text")
            elif rest_str.startswith("`") and rest_str.endswith("`"):
                payload = (_strip(rest_str), "selector")
            else:
                payload = (rest_str, "selector")
        return Cmd("WAIT", [payload, timeout])

    def _parse_coords(self) -> tuple:
        x = self._expect("NUMBER")
        y = self._expect("NUMBER")
        return ("coords", int(x.value), int(y.value))

    def _parse_condition(self) -> tuple:
        tok = self._expect("NOT", "EXISTS", "BACKTICK_STRING")
        if tok.type == "NOT":
            return ("NOT", self._parse_condition())
        if tok.type == "EXISTS":
            sel = self._expect("BACKTICK_STRING")
            return ("EXISTS", _strip(sel.value))
        return ("JS", _strip(tok.value))

    def _parse_if(self) -> Cmd:
        self._expect("LPAR")
        cond = self._parse_condition()
        self._expect("RPAR")
        then_tok = self._next_generic()
        if then_tok.type != "THEN":
            raise _UnexpectedToken(
                then_tok.type, then_tok.value, then_tok.line, then_tok.column, ["THEN"]
            )
        then_cmd = self._parse_command(self._next_generic())
        nxt = self._next_generic()
        if nxt.type == "ELSE":
            else_cmd = self._parse_command(self._next_generic())
            return Cmd("IF", [cond, then_cmd, else_cmd])
        self._push(nxt)
        return Cmd("IF", [cond, then_cmd, None])

    def _parse_repeat(self) -> Cmd:
        self._expect("LPAR")
        cmd = self._parse_command(self._next_generic())
        self._expect("COMMA")
        count = self._expect("NUMBER", "BACKTICK_STRING")
        self._expect("RPAR")
        # repeat_count keeps its raw token text — backticks included —
        # and the emitter strips them (reference c4ai_script.py:315-319, 573)
        return Cmd("REPEAT", [cmd, count.value])


def _strip(s: str) -> str:
    """Remove one layer of quotes/backticks; escaped-string contents
    are kept raw, NOT unescaped (reference ASTBuilder._strip,
    c4ai_script.py:214-219)."""
    if s.startswith('"') and s.endswith('"'):
        return s[1:-1]
    if s.startswith("`") and s.endswith("`"):
        return s[1:-1]
    return s


# ---------------------------------------------------------------------------
# compiler passes + JS emitter (reference c4ai_script.py:324-617)
# ---------------------------------------------------------------------------


def _ref_block(col: int, lines: List[str]) -> str:
    """Render a JS block exactly as the reference's
    ``textwrap.dedent(f-string).strip()`` does for a template whose
    content sits at source column ``col``: every template line is
    prefixed with ``col`` spaces BEFORE dedent, so a multi-line
    inserted value (whose continuation lines start at column 0)
    defeats dedent and the template indentation survives in the
    output — byte-for-byte the reference behavior."""
    raw = "\n".join(" " * col + ln for ln in lines)
    return textwrap.dedent(raw).strip()


class Compiler:
    """Compile C4A-Script text to a list of JS statements."""

    def __init__(self, root: Union[pathlib.Path, None] = None):
        self.root = pathlib.Path(root or ".").resolve()
        self.vars: Dict[str, Any] = {}
        self.procs: Dict[str, Proc] = {}

    def compile(self, text: Union[str, List[str]]) -> List[str]:
        if isinstance(text, list):
            text = "\n".join(text)
        ir = self._parse_with_includes(text)
        ir = self._collect_procs(ir)
        ir = self._inline_calls(ir)
        ir = self._apply_set_vars(ir)
        return [self._emit_js(c) for c in ir if isinstance(c, Cmd) and c.op != "NOP"]

    # -- passes --------------------------------------------------------
    def _parse_with_includes(self, txt: str, seen=None) -> List[Any]:
        seen = seen or set()
        cmds = _Parser(txt).parse_program()
        out: List[Any] = []
        for c in cmds:
            if isinstance(c, Cmd) and c.op == "INCLUDE":
                p = (self.root / c.args[0]).resolve()
                if p in seen:
                    raise ValueError(f"Circular include {p}")
                seen.add(p)
                out += self._parse_with_includes(p.read_text(), seen)
            else:
                out.append(c)
        return out

    def _collect_procs(self, ir: List[Any]) -> List[Any]:
        out = []
        for i in ir:
            if isinstance(i, Proc):
                self.procs[i.name] = i
            else:
                out.append(i)
        return out

    def _inline_calls(self, ir: List[Any]) -> List[Any]:
        out: List[Any] = []
        for c in ir:
            if isinstance(c, Cmd) and c.op == "CALL":
                if c.args[0] not in self.procs:
                    raise ValueError(f"Unknown procedure {c.args[0]!r}")
                out += self._inline_calls(self.procs[c.args[0]].body)
            else:
                out.append(c)
        return out

    def _apply_set_vars(self, ir: List[Any]) -> List[Any]:
        def sub(s):
            if not isinstance(s, str):
                return s
            return re.sub(r"\$(\w+)", lambda m: str(self.vars.get(m.group(1), m.group(0))), s)

        out = []
        for c in ir:
            if isinstance(c, Cmd):
                if c.op == "SETVAR":
                    self.vars[c.args[0].lstrip("$")] = c.args[1]
                else:
                    if c.op in ("TYPE", "EVAL", "SET"):
                        c.args = [sub(a) for a in c.args]
                    out.append(c)
        return out

    # -- emitter (output pinned to reference c4ai_script.py:387-617) ----
    def _emit_js(self, cmd: Cmd) -> str:
        op, a = cmd.op, cmd.args
        if op == "GO":
            return f"window.location.href = '{a[0]}';"
        if op == "RELOAD":
            return "window.location.reload();"
        if op == "BACK":
            return "window.history.back();"
        if op == "FORWARD":
            return "window.history.forward();"

        if op == "WAIT":
            arg, kind = a[0]
            timeout = a[1] or 10
            if kind == "seconds":
                return f"await new Promise(r=>setTimeout(r,{arg}*1000));"
            if kind == "selector":
                sel = arg.replace("\\", "\\\\").replace("'", "\\'")
                return _ref_block(20, [
                    "await new Promise((res,rej)=>{",
                    f"  const max = {timeout * 1000}, t0 = performance.now();",
                    "  const id = setInterval(()=>{",
                    f"    if(document.querySelector('{sel}')){{clearInterval(id);res();}}",
                    "    else if(performance.now()-t0>max){clearInterval(id);rej('WAIT selector timeout');}",
                    "  },100);",
                    "});",
                ])
            if kind == "text":
                txt = arg.replace("`", "\\`")
                return _ref_block(20, [
                    "await new Promise((res,rej)=>{",
                    f"  const max={timeout * 1000},t0=performance.now();",
                    "  const id=setInterval(()=>{",
                    f"    if(document.body.innerText.includes(`{txt}`)){{clearInterval(id);res();}}",
                    "    else if(performance.now()-t0>max){clearInterval(id);rej('WAIT text timeout');}",
                    "  },100);",
                    "});",
                ])

        def _js_click(sel, evt="click", button=0, detail=1):
            sel = sel.replace("'", "\\'")
            return _ref_block(16, [
                "(()=>{",
                f"  const el=document.querySelector('{sel}');",
                "  if(el){",
                "    el.focus&&el.focus();",
                f"    el.dispatchEvent(new MouseEvent('{evt}',{{bubbles:true,button:{button},detail:{detail}}}));",
                "  }",
                "})();",
            ])

        def _js_click_xy(x, y, evt="click", button=0, detail=1):
            return _ref_block(16, [
                "(()=>{",
                f"  const el=document.elementFromPoint({x},{y});",
                "  if(el){",
                "    el.focus&&el.focus();",
                f"    el.dispatchEvent(new MouseEvent('{evt}',{{bubbles:true,button:{button},detail:{detail}}}));",
                "  }",
                "})();",
            ])

        if op in ("CLICK", "DBLCLICK", "RIGHTCLICK"):
            evt = {"CLICK": "click", "DBLCLICK": "dblclick", "RIGHTCLICK": "contextmenu"}[op]
            btn = 2 if op == "RIGHTCLICK" else 0
            det = 2 if op == "DBLCLICK" else 1
            kind, *rest = a[0]
            # quirk kept from the reference (c4ai_script.py:451): the
            # coords path never forwards evt/btn/det, so DBLCLICK /
            # RIGHTCLICK at coordinates emit a plain left 'click'
            return _js_click_xy(*rest) if kind == "coords" else _js_click(rest[0], evt, btn, det)

        if op == "MOVE":
            _, x, y = a[0]
            return _ref_block(16, [
                f"document.dispatchEvent(new MouseEvent('mousemove',{{clientX:{x},clientY:{y},bubbles:true}}));",
            ])

        if op == "DRAG":
            (_, x1, y1), (_, x2, y2) = a
            return _ref_block(16, [
                "(()=>{",
                f"  const s=document.elementFromPoint({x1},{y1});",
                "  if(!s) return;",
                f"  s.dispatchEvent(new MouseEvent('mousedown',{{bubbles:true,clientX:{x1},clientY:{y1}}}));",
                f"  document.dispatchEvent(new MouseEvent('mousemove',{{bubbles:true,clientX:{x2},clientY:{y2}}}));",
                f"  document.dispatchEvent(new MouseEvent('mouseup',  {{bubbles:true,clientX:{x2},clientY:{y2}}}));",
                "})();",
            ])

        if op == "SCROLL":
            dir_, amt = a
            dx, dy = {"UP": (0, -amt), "DOWN": (0, amt), "LEFT": (-amt, 0), "RIGHT": (amt, 0)}[dir_]
            return f"window.scrollBy({dx},{dy});"

        if op == "TYPE":
            txt = a[0].replace("'", "\\'")
            return _ref_block(16, [
                "(()=>{",
                "  const el=document.activeElement;",
                "  if(el){",
                f"    el.value += '{txt}';",
                "    el.dispatchEvent(new Event('input',{bubbles:true}));",
                "  }",
                "})();",
            ])

        if op == "CLEAR":
            sel = a[0].replace("'", "\\'")
            return _ref_block(16, [
                "(()=>{",
                f"  const el=document.querySelector('{sel}');",
                "  if(el && 'value' in el){",
                "    el.value = '';",
                "    el.dispatchEvent(new Event('input',{bubbles:true}));",
                "    el.dispatchEvent(new Event('change',{bubbles:true}));",
                "  }",
                "})();",
            ])

        if op == "SET" and len(a) == 2:
            sel = a[0].replace("'", "\\'")
            val = a[1].replace("'", "\\'")
            return _ref_block(16, [
                "(()=>{",
                f"  const el=document.querySelector('{sel}');",
                "  if(el && 'value' in el){",
                "    el.value = '';",
                "    el.focus&&el.focus();",
                f"    el.value = '{val}';",
                "    el.dispatchEvent(new Event('input',{bubbles:true}));",
                "    el.dispatchEvent(new Event('change',{bubbles:true}));",
                "  }",
                "})();",
            ])

        if op in ("PRESS", "KEYDOWN", "KEYUP"):
            key = a[0]
            evs = {"PRESS": ("keydown", "keyup"), "KEYDOWN": ("keydown",), "KEYUP": ("keyup",)}[op]
            return (
                ";".join(
                    f"document.dispatchEvent(new KeyboardEvent('{e}',{{key:'{key}',bubbles:true}}))"
                    for e in evs
                )
                + ";"
            )

        if op == "EVAL":
            return _ref_block(16, [
                "(()=>{",
                "  try {",
                f"    {a[0]};",
                "  } catch (e) {",
                "    console.error('C4A-Script EVAL error:', e);",
                "  }",
                "})();",
            ])

        if op == "IF":
            condition, then_cmd, else_cmd = a
            js_condition = self._emit_condition(condition)
            then_js = self._handle_cmd_or_proc(then_cmd)
            else_js = self._handle_cmd_or_proc(else_cmd) if else_cmd else ""
            if else_cmd:
                return _ref_block(20, [
                    f"if ({js_condition}) {{",
                    f"  {then_js}",
                    "} else {",
                    f"  {else_js}",
                    "}",
                ])
            return _ref_block(20, [
                f"if ({js_condition}) {{",
                f"  {then_js}",
                "}",
            ])

        if op == "REPEAT":
            cmd_, count = a
            if count.isdigit():
                repeat_js = self._handle_cmd_or_proc(cmd_)
                return _ref_block(20, [
                    f"for (let _i = 0; _i < {count}; _i++) {{",
                    f"  {repeat_js}",
                    "}",
                ])
            count_expr = count[1:-1] if count.startswith("`") and count.endswith("`") else count
            repeat_js = self._handle_cmd_or_proc(cmd_)
            return _ref_block(20, [
                "(()=>{",
                f"  const _count = {count_expr};",
                "  if (typeof _count === 'number') {",
                "    for (let _i = 0; _i < _count; _i++) {",
                f"      {repeat_js}",
                "    }",
                "  } else if (_count) {",
                f"    {repeat_js}",
                "  }",
                "})();",
            ])

        raise ValueError(f"Unhandled op {op}")

    def _emit_condition(self, condition: tuple) -> str:
        cond_type = condition[0]
        if cond_type == "EXISTS":
            return f"!!document.querySelector('{condition[1]}')"
        if cond_type == "NOT":
            return f"!({self._emit_condition(condition[1])})"
        return condition[1]

    def _handle_cmd_or_proc(self, cmd) -> str:
        if not cmd:
            return ""
        if isinstance(cmd, Cmd):
            if cmd.op == "CALL":
                if cmd.args[0] not in self.procs:
                    raise ValueError(f"Unknown procedure {cmd.args[0]!r}")
                body = self.procs[cmd.args[0]].body
                return "\n".join(self._emit_js(c) for c in body if c.op != "NOP")
            return self._emit_js(cmd)
        return ""


# ---------------------------------------------------------------------------
# exception-based helpers (reference c4ai_script.py:623-663)
# ---------------------------------------------------------------------------


def compile_string(script: Union[str, List[str]], *, root: Union[pathlib.Path, None] = None) -> List[str]:
    """Compile C4A-Script to a list of JS statements; raises
    C4AScriptError with formatted context on failure."""
    try:
        return Compiler(root).compile(script)
    except Exception as e:
        raise C4AScriptError.from_exception(e, script)


def compile_file_raw(path: pathlib.Path) -> List[str]:
    """Compile a script file (exception API; reference compile_file,
    c4ai_script.py:642-651 — renamed here so the result-based
    ``compile_file`` below keeps the reference's public name)."""
    return compile_string(path.read_text(), root=path.parent)


def compile_lines(lines: List[str], *, root: Union[pathlib.Path, None] = None) -> List[str]:
    return compile_string(lines, root=root)


# ---------------------------------------------------------------------------
# result-based API (reference c4a_compile.py:27-320)
# ---------------------------------------------------------------------------


class C4ACompiler:
    """Result-based compiler API: never raises, always returns a
    CompilationResult / ValidationResult."""

    ERROR_CODES = {
        "missing_then": "E001",
        "missing_paren": "E002",
        "missing_comma": "E003",
        "missing_endproc": "E004",
        "undefined_proc": "E005",
        "missing_backticks": "E006",
        "invalid_command": "E007",
        "syntax_error": "E999",
    }

    @classmethod
    def compile(cls, script: Union[str, List[str]], root: Optional[pathlib.Path] = None) -> CompilationResult:
        if isinstance(script, list):
            script_text = "\n".join(script)
            script_lines = script
        else:
            script_text = script
            script_lines = script.split("\n")
        try:
            js_code = Compiler(root).compile(script_text)
            return CompilationResult(
                success=True,
                js_code=js_code,
                metadata={"lineCount": len(script_lines), "statementCount": len(js_code)},
            )
        except Exception as e:
            error = cls._exception_to_error(e, script_lines)
            return CompilationResult(
                success=False, errors=[error], metadata={"lineCount": len(script_lines)}
            )

    @classmethod
    def validate(cls, script: Union[str, List[str]]) -> ValidationResult:
        result = cls.compile(script)
        return ValidationResult(valid=result.success, errors=result.errors, warnings=result.warnings)

    @classmethod
    def compile_file(cls, path: Union[str, pathlib.Path]) -> CompilationResult:
        path = pathlib.Path(path)
        if not path.exists():
            error = ErrorDetail(
                type=ErrorType.RUNTIME,
                code="E100",
                severity=Severity.ERROR,
                message=f"File not found: {path}",
                line=0,
                column=0,
                source_line="",
            )
            return CompilationResult(success=False, errors=[error])
        try:
            return cls.compile(path.read_text(), root=path.parent)
        except Exception as e:
            error = ErrorDetail(
                type=ErrorType.RUNTIME,
                code="E101",
                severity=Severity.ERROR,
                message=f"Error reading file: {str(e)}",
                line=0,
                column=0,
                source_line="",
            )
            return CompilationResult(success=False, errors=[error])

    # -- exception -> ErrorDetail mapping --------------------------------
    @classmethod
    def _exception_to_error(cls, exc: Exception, script_lines: List[str]) -> ErrorDetail:
        if isinstance(exc, _UnexpectedToken):
            return cls._handle_unexpected_token(exc, script_lines)
        if isinstance(exc, _UnexpectedChars):
            return cls._handle_unexpected_chars(exc, script_lines)
        if isinstance(exc, ValueError):
            return cls._handle_value_error(exc, script_lines)
        return ErrorDetail(
            type=ErrorType.SYNTAX,
            code=cls.ERROR_CODES["syntax_error"],
            severity=Severity.ERROR,
            message=str(exc),
            line=1,
            column=1,
            source_line=script_lines[0] if script_lines else "",
        )

    @classmethod
    def _handle_unexpected_token(cls, exc: _UnexpectedToken, script_lines: List[str]) -> ErrorDetail:
        line, column = exc.line, exc.column
        source_line = script_lines[line - 1] if 0 < line <= len(script_lines) else ""
        line_before = script_lines[line - 2] if line > 1 and line <= len(script_lines) + 1 else None
        line_after = script_lines[line] if 0 < line < len(script_lines) else None

        if exc.token_type == "CLICK" and "THEN" in exc.expected:
            code = cls.ERROR_CODES["missing_then"]
            message = "Missing 'THEN' keyword after IF condition"
            suggestions = [
                Suggestion(
                    "Add 'THEN' after the condition",
                    source_line.replace("CLICK", "THEN CLICK") if source_line else None,
                )
            ]
        elif exc.token_type == "$END":
            code = cls.ERROR_CODES["missing_endproc"]
            message = "Unexpected end of script"
            suggestions = [
                Suggestion("Check for missing ENDPROC"),
                Suggestion("Ensure all procedures are properly closed"),
            ]
        elif "RPAR" in exc.expected:
            code = cls.ERROR_CODES["missing_paren"]
            message = "Missing closing parenthesis ')'"
            suggestions = [Suggestion("Add closing parenthesis at the end of the condition")]
        elif "COMMA" in exc.expected:
            code = cls.ERROR_CODES["missing_comma"]
            message = "Missing comma ',' in command"
            suggestions = [Suggestion("Add comma between arguments")]
        elif exc.token_type == "NAME" and "BACKTICK_STRING" in exc.expected:
            code = cls.ERROR_CODES["missing_backticks"]
            message = "Selector must be wrapped in backticks"
            suggestions = [Suggestion("Wrap the selector in backticks", f"`{exc.token_value}`")]
        else:
            code = cls.ERROR_CODES["syntax_error"]
            message = f"Unexpected '{exc.token_value}'"
            shown = [e for e in exc.expected if not e.startswith("_")][:3]
            if shown:
                message += f". Expected: {', '.join(shown)}"
            suggestions = []

        return ErrorDetail(
            type=ErrorType.SYNTAX,
            code=code,
            severity=Severity.ERROR,
            message=message,
            line=line,
            column=column,
            source_line=source_line,
            line_before=line_before,
            line_after=line_after,
            suggestions=suggestions,
        )

    @classmethod
    def _handle_unexpected_chars(cls, exc: _UnexpectedChars, script_lines: List[str]) -> ErrorDetail:
        line, column = exc.line, exc.column
        source_line = script_lines[line - 1] if 0 < line <= len(script_lines) else ""
        if "CLICK" in source_line and column > source_line.find("CLICK"):
            code = cls.ERROR_CODES["missing_backticks"]
            message = "Selector must be wrapped in backticks"
            suggestions = [
                Suggestion(
                    "Wrap the selector in backticks",
                    re.sub(r"CLICK\s+([^\s]+)", r"CLICK `\1`", source_line),
                )
            ]
        else:
            code = cls.ERROR_CODES["syntax_error"]
            message = f"Invalid character at position {column}"
            suggestions = []
        return ErrorDetail(
            type=ErrorType.SYNTAX,
            code=code,
            severity=Severity.ERROR,
            message=message,
            line=line,
            column=column,
            source_line=source_line,
            suggestions=suggestions,
        )

    @classmethod
    def _handle_value_error(cls, exc: ValueError, script_lines: List[str]) -> ErrorDetail:
        message = str(exc)
        if "Unknown procedure" in message:
            m = re.search(r"'([^']+)'", message)
            if m:
                proc_name = m.group(1)
                for i, ln in enumerate(script_lines):
                    if proc_name in ln and not ln.strip().startswith("PROC"):
                        return ErrorDetail(
                            type=ErrorType.RUNTIME,
                            code=cls.ERROR_CODES["undefined_proc"],
                            severity=Severity.ERROR,
                            message=f"Undefined procedure '{proc_name}'",
                            line=i + 1,
                            column=ln.find(proc_name) + 1,
                            source_line=ln,
                            suggestions=[
                                Suggestion(
                                    "Define the procedure before using it",
                                    f"PROC {proc_name}\n  # commands here\nENDPROC",
                                )
                            ],
                        )
        return ErrorDetail(
            type=ErrorType.RUNTIME,
            code="E999",
            severity=Severity.ERROR,
            message=message,
            line=1,
            column=1,
            source_line=script_lines[0] if script_lines else "",
        )


# convenience functions, exported top-level as c4a_compile /
# c4a_validate / c4a_compile_file (reference crawl4ai/__init__.py:93-95)
def compile(script: Union[str, List[str]], root: Optional[pathlib.Path] = None) -> CompilationResult:  # noqa: A001
    """Compile C4A-Script to JavaScript (result API, never raises)."""
    return C4ACompiler.compile(script, root)


def validate(script: Union[str, List[str]]) -> ValidationResult:
    """Validate C4A-Script syntax without using the output."""
    return C4ACompiler.validate(script)


def compile_file(path: Union[str, pathlib.Path]) -> CompilationResult:
    """Compile a C4A-Script file (result API, never raises)."""
    return C4ACompiler.compile_file(path)
