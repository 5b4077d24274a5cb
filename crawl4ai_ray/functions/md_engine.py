"""HTML -> Markdown emitter, byte-compatible with the reference engine.

The reference bundles a customized html2text fork
(``crawl4ai/html2text/__init__.py:37-1195``, defaults
``html2text/config.py``) and drives it from
``DefaultMarkdownGenerator.generate_markdown``
(``markdown_generation_strategy.py:148-260``) with the options
``body_width=0``, ``single_line_break=True``, ``mark_code=True`` and the
``CustomHTML2Text.__init__`` overrides (``ignore_mailto_links=True``,
``skip_internal_links=False``, every escape flag off).

This module re-implements that behavior from the spec as a single
stdlib ``HTMLParser`` subclass written for this repo.  Using the same
stdlib tokenizer as the reference means malformed-HTML recovery,
entity-reference chunking and start/end event order match by
construction; everything above the tokenizer (the paragraph-break
queue, list indentation, inline marks, link/citation forms, escape
rules) is implemented here and pinned byte-for-byte by committed golden
fixtures generated from the reference engine itself
(``tests/golden/gen_markdown_goldens.py``).

Unsupported reference modes (google-doc styling) raise immediately
rather than silently diverge.
"""

from __future__ import annotations

import html.entities
import html.parser
import re
import string
import urllib.parse
from textwrap import wrap

__all__ = ["MarkdownEmitter", "emit_markdown"]

# ---------------------------------------------------------------------------
# escape rules (reference: html2text/utils.py:199-236, config.py regexes)

_LINK_PART_SPECIALS = re.compile(r"([\\\[\]\(\)])")
_ALL_SPECIALS = re.compile(r"([`\*_{}\[\]\(\)#!])")
_BACKSLASH_BEFORE_SPECIAL = re.compile(
    r"(\\)(?=[%s])" % re.escape(r"\`*_{}[]()#+-.!")
)
_LINE_LEAD_DOT = re.compile(r"^(\s*\d+)(\.)(?=\s)", re.MULTILINE)
_LINE_LEAD_PLUS = re.compile(r"^(\s*)(\+)(?=\s)", re.MULTILINE)
_LINE_LEAD_DASH = re.compile(r"^(\s*)(-)(?=\s|\-)", re.MULTILINE)

# wrap-skip detection (utils.py:162-196)
_HAS_MD_LINK = re.compile(r"(\[.*?\] ?\(.*?\))|(\[.*?\]:.*?)")
_HAS_TABLE_SEP = re.compile(r" \| ")
_ORDERED_ITEM = re.compile(r"\d+\.\s")
_UNORDERED_ITEM = re.compile(r"[-\*\+]\s")
_SPACE_ONLY = re.compile(r"\s\+")  # (sic — reference config.py RE_SPACE)

_ABSOLUTE_URL = re.compile(r"^[a-zA-Z+]+://")
_AMP_LT_GT = re.compile(r"([&<>])")
_WS_RUN = re.compile(r"\s+")
_STRESS_JOINER = re.compile(r"[^][(){}\s.!?]")

# ASCII fallbacks for typographic entities (reference config.py UNIFIABLE;
# nbsp routed through a placeholder so paragraph whitespace collapsing
# cannot eat it — replaced at finish, html2text/__init__.py:143,174-181)
_NBSP_TOKEN = "&nbsp_place_holder;"
_ENTITY_ASCII = {
    "rsquo": "'", "lsquo": "'", "rdquo": '"', "ldquo": '"',
    "copy": "(C)", "mdash": "--", "nbsp": " ", "rarr": "->", "larr": "<-",
    "middot": "*", "ndash": "-", "oelig": "oe", "aelig": "ae",
    "agrave": "a", "aacute": "a", "acirc": "a", "atilde": "a",
    "auml": "a", "aring": "a",
    "egrave": "e", "eacute": "e", "ecirc": "e", "euml": "e",
    "igrave": "i", "iacute": "i", "icirc": "i", "iuml": "i",
    "ograve": "o", "oacute": "o", "ocirc": "o", "otilde": "o", "ouml": "o",
    "ugrave": "u", "uacute": "u", "ucirc": "u", "uuml": "u",
    "lrm": "", "rlm": "",
}
_CODEPOINT_ASCII = {
    html.entities.name2codepoint[k]: v
    for k, v in _ENTITY_ASCII.items()
    if k != "nbsp"
}

_BOLD_STYLE_VALUES = ("bold", "700", "800", "900")


def _escape_link_part(text: str) -> str:
    """Escape md specials inside link targets/titles (utils.escape_md)."""
    return _LINK_PART_SPECIALS.sub(r"\\\1", text)


def _escape_text(
    text: str,
    *,
    snob: bool,
    escape_dot: bool,
    escape_plus: bool,
    escape_dash: bool,
) -> str:
    """Document-section escaping (utils.escape_md_section; the caller in
    the reference never passes escape_backslash so its ``True`` default
    always applies)."""
    text = _BACKSLASH_BEFORE_SPECIAL.sub(r"\\\1", text)
    if snob:
        text = _ALL_SPECIALS.sub(r"\\\1", text)
    if escape_dot:
        text = _LINE_LEAD_DOT.sub(r"\1\\\2", text)
    if escape_plus:
        text = _LINE_LEAD_PLUS.sub(r"\1\\\2", text)
    if escape_dash:
        text = _LINE_LEAD_DASH.sub(r"\1\\\2", text)
    return text


def _heading_level(tag: str) -> int:
    if len(tag) == 2 and tag[0] == "h" and "0" < tag[1] <= "9":
        return int(tag[1])
    return 0


def _list_start_offset(attrs: dict) -> int:
    start = attrs.get("start")
    if start is not None:
        try:
            return int(start) - 1
        except ValueError:
            pass
    return 0


def _should_skip_wrap(
    para: str, wrap_links: bool, wrap_list_items: bool, wrap_tables: bool
) -> bool:
    """Paragraph classifier for the optional wrap pass (utils.skipwrap)."""
    if not wrap_links and _HAS_MD_LINK.search(para):
        return True
    if para[0:4] == "    " or para[0:1] == "\t":
        return True
    stripped = para.lstrip()
    if stripped[0:2] == "--" and len(stripped) > 2 and stripped[2] != "-":
        return False
    if stripped[0:1] in ("-", "*") and not stripped[0:2] == "**":
        return not wrap_list_items
    if not wrap_tables and _HAS_TABLE_SEP.search(para):
        return True
    return bool(
        _ORDERED_ITEM.match(stripped) or _UNORDERED_ITEM.match(stripped)
    )


class MarkdownEmitter(html.parser.HTMLParser):
    """Event-driven markdown writer.

    One instance per document is cheap; ``convert`` resets nothing, so
    (like the reference) reuse across documents is only safe for the
    fit-markdown second pass of the same document.
    """

    # options the reference exposes via update_params; identical names
    # keep user option dicts portable.
    def __init__(self, baseurl: str = "", bodywidth: int = 78) -> None:
        super().__init__(convert_charrefs=False)
        self.baseurl = baseurl
        self.body_width = bodywidth
        self.unicode_snob = False
        self.escape_snob = False
        self.escape_backslash = False
        self.escape_dot = False
        self.escape_plus = False
        self.escape_dash = False
        self.links_each_paragraph = False
        self.skip_internal_links = False   # CustomHTML2Text override
        self.inline_links = True
        self.protect_links = False
        self.ignore_links = False
        self.ignore_mailto_links = True    # CustomHTML2Text override
        self.ignore_images = False
        self.images_as_html = False
        self.images_to_alt = False
        self.images_with_size = False
        self.ignore_emphasis = False
        self.bypass_tables = False
        self.ignore_tables = False
        self.ul_item_mark = "*"
        self.emphasis_mark = "_"
        self.strong_mark = "**"
        self.single_line_break = False
        self.use_automatic_links = True
        self.hide_strikethrough = False
        self.mark_code = False
        self.wrap_list_items = False
        self.wrap_links = True
        self.wrap_tables = False
        self.pad_tables = False
        self.default_image_alt = ""
        self.open_quote = '"'
        self.close_quote = '"'
        self.include_sup_sub = False
        self.handle_code_in_pre = False
        self.preserve_tags: set[str] = set()
        self.google_doc = False  # accepted but rejected in update_params

        # writer state
        self._chunks: list[str] = []      # joined at finish
        self._chunk_count = 0             # index used for ref-style link notes
        self._quiet = 0                   # >0 inside head/style/script
        self._style_nest = 0
        self._pending_breaks = 0          # newlines owed before next chunk
        self._at_start = True
        self._pending_space = False
        self._br_suffix = ""              # "  " after an explicit <br>
        self._ends_with_nl = False
        self._bq_depth = 0
        self._lists: list[list] = []      # [kind, counter] per open list
        self._last_was_list = False
        self._pre = False
        self._pre_opening = False
        self._code = False
        self._in_header = False
        self._quote_open = False
        self._emph_nest = 0
        self._drop_ws = 0
        self._stressed = False
        self._after_stressed = False
        self._prior_data = ""
        self._latest_tag = ""
        self._anchor_stack: list = []
        self._auto_href: str | None = None
        self._link_is_empty = False
        self._note_links: list = []       # reference-style (non-inline) links
        self._note_count = 0
        self._abbr_term: str | None = None
        self._abbr_title: str | None = None
        self._abbr_defs: dict[str, str] = {}
        # table state
        self._cell_wants_sep = False
        self._row_cells = 0
        self._awaiting_header_rule = False
        # custom-engine state
        self._in_fence = False            # inside <pre> fenced block
        self._in_tick = False             # inside inline <code>
        self._in_anchor = False
        self._preserved: list[str] = []
        self._preserve_nest = 0
        self._preserving_tag: str | None = None

    # -- public API --------------------------------------------------------

    def update_params(self, **options) -> None:
        for key, value in options.items():
            if key == "preserve_tags":
                self.preserve_tags = set(value)
            elif key == "google_doc" and value:
                raise NotImplementedError(
                    "google-doc style emulation is out of scope "
                    "(reference html2text google_doc mode)"
                )
            else:
                setattr(self, key, value)

    def convert(self, data: str) -> str:
        self._at_start = True
        self.feed(data)
        self.feed("")
        text = self._finish()
        if self.body_width:
            text = self._wrap_paragraphs(text)
        if self.pad_tables:
            text = _pad_tables(text)
        return text

    # alias matching the reference engine's entry point name so option
    # dicts AND call sites stay portable
    handle = convert

    def convert_tree(self, root) -> str:
        """Convert an htmlparse Node tree by replaying its events,
        skipping the serialize -> re-tokenize round trip.

        Byte-equivalent to ``convert(root.serialize())`` because the
        serializer escapes only ``& < >`` in text — characters the
        escape pass never touches — and entity-boundary chunking only
        affects first/last-character checks, which see the same
        characters either way (pinned by tests/test_markdown_parity.py
        ``test_tree_replay_equivalence``).
        """
        self._at_start = True
        if getattr(root, "tag", "#root") == "#root":
            self._replay(root)
        else:
            from .htmlparse import VOID_TAGS

            self._element(root.tag, dict(root.attrs), True)
            if root.tag not in VOID_TAGS:
                self._replay(root)
                self._element(root.tag, {}, False)
        text = self._finish()
        if self.body_width:
            text = self._wrap_paragraphs(text)
        if self.pad_tables:
            text = _pad_tables(text)
        return text

    def _replay(self, node) -> None:
        from .htmlparse import VOID_TAGS

        for c in node.children:
            if isinstance(c, str):
                # chunk text exactly as serialize->retokenize would:
                # the serializer escapes & < > (entity events, flagged
                # from_entity) and leaves everything else as one data
                # run — chunk boundaries feed the stressed-adjacency
                # and whitespace rules, so they must match
                for seg in _AMP_LT_GT.split(c):
                    if seg:
                        if len(seg) == 1 and seg in "&<>":
                            self._text(seg, from_entity=True)
                        else:
                            self.handle_data(seg)
            elif c.tag == "#comment":
                continue
            elif c.tag == "#root":
                self._replay(c)
            else:
                self._element(c.tag, dict(c.attrs), True)
                if c.tag not in VOID_TAGS:
                    self._replay(c)
                    self._element(c.tag, {}, False)

    def feed(self, data: str) -> None:
        super().feed(data.replace("</' + 'script>", "</ignore>"))

    # -- low-level writer ---------------------------------------------------

    def _push(self, s: str) -> None:
        self._chunks.append(s)
        if s:
            self._ends_with_nl = s.endswith("\n")

    def _queue_block_break(self) -> None:
        """After a block element: one owed newline under
        single_line_break, else two (reference p())."""
        self._pending_breaks = 1 if self.single_line_break else 2

    def _queue_line_break(self) -> None:
        if self._pending_breaks == 0:
            self._pending_breaks = 1

    def _queue_soft_break(self) -> None:
        self._queue_line_break()
        self._br_suffix = "  "

    def _write(self, data: str, collapse: bool = False, force=False) -> None:
        """The central spacing/indentation gate (reference o(),
        html2text/__init__.py:802-905): resolves owed breaks, pending
        inter-word space, blockquote prefixes and pre indentation before
        the chunk is emitted."""
        if self._abbr_term is not None:
            self._abbr_term += data
        if self._quiet:
            return
        if collapse and not self._pre:
            data = _WS_RUN.sub(" ", data)
            if data and data[0] == " ":
                self._pending_space = True
                data = data[1:]
        if not data and not force:
            return

        if self._pre_opening:
            if not data.startswith("\n") and not data.startswith("\r\n"):
                data = "\n" + data
            if self.mark_code:
                self._push("\n[code]")
                self._pending_breaks = 0

        prefix = ">" * self._bq_depth
        if self._bq_depth and not (force and data and data[0] == ">"):
            prefix += " "
        if self._pre:
            if not self._lists:
                prefix += "    "
            prefix += "    " * len(self._lists)
            data = data.replace("\n", "\n" + prefix)
        if self._pre_opening:
            self._pre_opening = False
            if self._lists:
                data = data.lstrip("\n")

        if self._at_start:
            self._pending_space = False
            self._pending_breaks = 0
            self._at_start = False

        if force == "end":
            self._pending_breaks = 0
            self._push("\n")
            self._pending_space = False

        if self._pending_breaks:
            self._push((self._br_suffix + "\n" + prefix) * self._pending_breaks)
            self._pending_space = False
            self._br_suffix = ""

        if self._pending_space:
            if not self._ends_with_nl:
                self._push(" ")
            self._pending_space = False

        if self._note_links and (
            (self._pending_breaks == 2 and self.links_each_paragraph)
            or force == "end"
        ):
            if force == "end":
                self._push("\n")
            held = []
            for note in self._note_links:
                if self._chunk_count > note["written_at"]:
                    self._push(
                        "   [%d]: %s"
                        % (
                            note["index"],
                            urllib.parse.urljoin(
                                self.baseurl, note["attrs"]["href"]
                            ),
                        )
                    )
                    if note["attrs"].get("title") is not None:
                        self._push(" (" + note["attrs"]["title"] + ")")
                    self._push("\n")
                else:
                    held.append(note)
            if held != self._note_links:
                self._push("\n")
            self._note_links = held

        if self._abbr_defs and force == "end":
            for term, definition in self._abbr_defs.items():
                self._push("  *[" + term + "]: " + definition + "\n")

        self._pending_breaks = 0
        self._push(data)
        self._chunk_count += 1

    def _finish(self) -> str:
        self.close()
        self._queue_line_break()
        self._write("", force="end")
        text = "".join(self._chunks)
        nbsp = html.entities.html5["nbsp;"] if self.unicode_snob else " "
        text = text.replace(_NBSP_TOKEN, nbsp)
        self._chunks = []
        return text

    # -- tokenizer callbacks -----------------------------------------------

    def handle_starttag(self, tag, attrs):
        self._element(tag, dict(attrs), True)

    def handle_endtag(self, tag):
        self._element(tag, {}, False)

    def handle_charref(self, name):
        self._text(self._decode_charref(name), from_entity=True)

    def handle_entityref(self, name):
        decoded = self._decode_entityref(name)
        if decoded:
            self._text(decoded, from_entity=True)

    def handle_data(self, data):
        self._text(data)

    def _decode_charref(self, name: str) -> str:
        codepoint = int(name[1:], 16) if name[0] in "xX" else int(name)
        if not self.unicode_snob and codepoint in _CODEPOINT_ASCII:
            return _CODEPOINT_ASCII[codepoint]
        try:
            return chr(codepoint)
        except ValueError:
            return ""

    def _decode_entityref(self, name: str) -> str:
        if not self.unicode_snob and name in _ENTITY_ASCII:
            return _NBSP_TOKEN if name == "nbsp" else _ENTITY_ASCII[name]
        try:
            decoded = html.entities.html5[name + ";"]
        except KeyError:
            return "&" + name + ";"
        return _NBSP_TOKEN if name == "nbsp" else decoded

    # -- element dispatch ---------------------------------------------------

    def _element(self, tag: str, attrs: dict, opening: bool) -> None:
        """Custom-engine layer (reference CustomHTML2Text.handle_tag,
        html2text/__init__.py:1106-1176): <base>, preserved tags and the
        fenced pre / inline-code forms are intercepted before the
        classic engine rules run."""
        if tag == "base" and opening and attrs.get("href"):
            self.baseurl = attrs["href"]

        if tag in self.preserve_tags:
            if opening:
                if self._preserve_nest == 0:
                    self._preserving_tag = tag
                    self._preserved = [_raw_tag(tag, attrs)]
                else:
                    self._preserved.append(_raw_tag(tag, attrs))
                self._preserve_nest += 1
            else:
                self._preserve_nest -= 1
                if self._preserve_nest == 0:
                    self._preserved.append(f"</{tag}>")
                    self._write("\n" + "".join(self._preserved) + "\n")
                    self._preserving_tag = None
                else:
                    self._preserved.append(f"</{tag}>")
            return
        if self._preserve_nest > 0:
            self._preserved.append(
                _raw_tag(tag, attrs) if opening else f"</{tag}>"
            )
            return

        if tag == "pre":
            if opening:
                lang = attrs.get("data-language", "")
                self._write(f"\n```{lang}\n")
                self._in_fence = True
            else:
                self._write("\n```\n")
                self._in_fence = False
            return
        if tag == "code":
            if self._in_fence and not self.handle_code_in_pre:
                return
            if not self._in_anchor:
                self._write("`")
            self._in_tick = opening
            if self._in_anchor:
                self._classic_element(tag, attrs, opening)
            return

        self._classic_element(tag, attrs, opening)

    def _classic_element(self, tag: str, attrs: dict, opening: bool) -> None:
        """The classic html2text tag rules (reference handle_tag,
        html2text/__init__.py:306-780, google-doc branches excluded)."""
        self._latest_tag = tag

        if tag == "base" and opening and attrs.get("href"):
            self.baseurl = attrs["href"]

        # an element opening right after <a ...> means the link cannot
        # be an automatic <url> link: emit the bracket now
        if (
            opening
            and self._auto_href is not None
            and tag not in ("p", "div", "style", "dl", "dt")
            and (tag != "img" or self.ignore_images)
        ):
            self._write("[")
            self._auto_href = None
            self._link_is_empty = False

        level = _heading_level(tag)
        if level:
            if self._anchor_stack:
                if opening:
                    self._in_header = True
                    if self._chunks and self._chunks[-1] == "[":
                        self._chunks.pop()
                        self._pending_space = False
                        self._write("#" * level + " ")
                        self._write("[")
                else:
                    self._pending_breaks = 0
                    self._in_header = False
                    return
            else:
                self._queue_block_break()
                if opening:
                    self._in_header = True
                    self._write("#" * level + " ")
                else:
                    self._in_header = False
                    return

        if tag in ("p", "div"):
            if self._anchor_stack or self._cell_wants_sep:
                pass
            else:
                self._queue_block_break()

        if tag == "br" and opening:
            self._write("  \n> " if self._bq_depth > 0 else "  \n")

        if tag == "hr" and opening:
            self._queue_block_break()
            self._write("* * *")
            self._queue_block_break()

        if tag in ("head", "style", "script"):
            self._quiet += 1 if opening else -1
        if tag == "style":
            self._style_nest += 1 if opening else -1
        if tag == "body":
            self._quiet = 0

        if tag == "blockquote":
            if opening:
                self._queue_block_break()
                self._write("> ", force=True)
                self._at_start = True
                self._bq_depth += 1
            else:
                self._bq_depth -= 1
                self._queue_block_break()

        if tag in ("em", "i", "u") and not self.ignore_emphasis:
            mark = self.emphasis_mark
            if (
                opening
                and self._prior_data
                and self._prior_data[-1] not in string.whitespace
                and self._prior_data[-1] not in string.punctuation
            ):
                mark = " " + mark
                self._prior_data += " "
            self._write(mark)
            if opening:
                self._stressed = True

        if tag in ("strong", "b") and not self.ignore_emphasis:
            mark = self.strong_mark
            if (
                opening
                and self._prior_data
                and len(self.strong_mark) > 0
                and self._prior_data[-1] == self.strong_mark[0]
            ):
                mark = " " + mark
                self._prior_data += " "
            self._write(mark)
            if opening:
                self._stressed = True

        if tag in ("del", "strike", "s"):
            mark = "~~"
            if opening and self._prior_data and self._prior_data[-1] == "~":
                mark = " ~~"
                self._prior_data += " "
            self._write(mark)
            if opening:
                self._stressed = True

        if tag in ("kbd", "code", "tt") and not self._pre:
            self._write("`")
            self._code = not self._code

        if tag == "abbr":
            if opening:
                self._abbr_title = attrs.get("title")
                self._abbr_term = ""
            else:
                if self._abbr_title is not None:
                    self._abbr_defs[self._abbr_term or ""] = self._abbr_title
                    self._abbr_title = None
                self._abbr_term = None

        if tag == "q":
            self._write(
                self.close_quote if self._quote_open else self.open_quote
            )
            self._quote_open = not self._quote_open

        if tag == "a" and not self.ignore_links:
            if opening:
                self._in_anchor = True
                href = attrs.get("href")
                linkable = (
                    href is not None
                    and not (self.skip_internal_links and href.startswith("#"))
                    and not (
                        self.ignore_mailto_links and href.startswith("mailto:")
                    )
                )
                if linkable:
                    self._anchor_stack.append(attrs)
                    self._auto_href = href
                    self._link_is_empty = True
                    if self.protect_links:
                        attrs["href"] = "<" + href + ">"
                else:
                    self._anchor_stack.append(None)
            else:
                self._in_anchor = False
                if self._anchor_stack:
                    anchor = self._anchor_stack.pop()
                    if self._auto_href and not self._link_is_empty:
                        self._auto_href = None
                    elif anchor:
                        if self._link_is_empty:
                            self._write("[")
                            self._link_is_empty = False
                            self._auto_href = None
                        if self.inline_links:
                            self._pending_breaks = 0
                            title = _escape_link_part(anchor.get("title") or "")
                            self._close_inline_link(anchor["href"], title)
                        else:
                            self._write(
                                "][%d]" % self._note_index(anchor)
                            )

        if tag == "img" and opening and not self.ignore_images:
            self._image(attrs)

        if tag == "dl" and opening:
            self._queue_block_break()
            self._pending_breaks = 0
        elif tag == "dt" and opening:
            if self._pending_breaks == 0:
                self._write("\n\n")
            self._pending_breaks = 0
        elif tag == "dt" and not opening:
            self._write("\n")
        elif tag == "dd" and opening:
            self._write("    ")
        elif tag == "dd" and not opening:
            self._pending_breaks = 0

        if tag in ("ol", "ul"):
            if not self._lists and not self._last_was_list:
                self._queue_block_break()
            if opening:
                self._lists.append([tag, _list_start_offset(attrs)])
            else:
                if self._lists:
                    self._lists.pop()
                    if not self._lists:
                        self._write("\n")
            self._last_was_list = True
        else:
            self._last_was_list = False

        if tag == "li":
            self._queue_line_break()
            if opening:
                entry = self._lists[-1] if self._lists else ["ul", 0]
                # two spaces per open list; three when an unordered list
                # nests inside an ordered one (commonmark alignment)
                above = None
                for open_list in self._lists:
                    self._write(
                        "   " if above == "ol" and open_list[0] == "ul" else "  "
                    )
                    above = open_list[0]
                if entry[0] == "ul":
                    self._write(self.ul_item_mark + " ")
                else:
                    entry[1] += 1
                    self._write("%d. " % entry[1])
                self._at_start = True

        if tag == "caption" and not opening:
            self._queue_soft_break()

        if tag in ("table", "tr", "td", "th"):
            self._table_element(tag, attrs, opening)

        if tag in ("sup", "sub") and self.include_sup_sub:
            self._write(f"<{tag}>" if opening else f"</{tag}>")

    def _close_inline_link(self, href: str, escaped_title: str) -> None:
        url = _escape_link_part(urllib.parse.urljoin(self.baseurl, href))
        title = f' "{escaped_title}"' if escaped_title.strip() else ""
        self._write(f"]({url}{title})")

    def _note_index(self, attrs: dict) -> int:
        for note in self._note_links:
            known = note["attrs"]
            if known.get("href") == attrs.get("href") and (
                ("title" not in known and "title" not in attrs)
                or known.get("title") == attrs.get("title")
            ):
                return note["index"]
        self._note_count += 1
        self._note_links.append(
            {
                "attrs": attrs,
                "index": self._note_count,
                "written_at": self._chunk_count,
            }
        )
        return self._note_count

    def _image(self, attrs: dict) -> None:
        src = attrs.get("src")
        if src is None:
            return
        if not self.images_to_alt:
            attrs["href"] = src
        alt = attrs.get("alt") or self.default_image_alt
        if self.images_as_html or (
            self.images_with_size and ("width" in attrs or "height" in attrs)
        ):
            self._write("<img src='" + src + "' ")
            if attrs.get("width") is not None and "width" in attrs:
                self._write("width='" + attrs["width"] + "' ")
            if attrs.get("height") is not None and "height" in attrs:
                self._write("height='" + attrs["height"] + "' ")
            if alt:
                self._write("alt='" + alt + "' ")
            self._write("/>")
            return
        if self._auto_href is not None:
            if (
                self.images_to_alt
                and _escape_link_part(alt) == self._auto_href
                and _ABSOLUTE_URL.match(self._auto_href)
            ):
                self._write("<" + _escape_link_part(alt) + ">")
                self._link_is_empty = False
                return
            self._write("[")
            self._auto_href = None
            self._link_is_empty = False
        if self.images_to_alt:
            self._write(_escape_link_part(alt))
            return
        self._write("![" + _escape_link_part(alt) + "]")
        if self.inline_links:
            href = attrs.get("href") or ""
            self._write(
                "("
                + _escape_link_part(urllib.parse.urljoin(self.baseurl, href))
                + ")"
            )
        else:
            self._write("[%d]" % self._note_index(attrs))

    def _table_element(self, tag: str, attrs: dict, opening: bool) -> None:
        """GFM table cells (reference html2text/__init__.py:690-768;
        bypass/ignore modes included, pad mode post-processed)."""
        if self.ignore_tables:
            if tag == "tr" and not opening:
                self._queue_soft_break()
            return
        if self.bypass_tables:
            if opening:
                self._queue_soft_break()
                attr_str = "".join(
                    f' {k}="{v}"' if v is not None else f" {k}"
                    for k, v in attrs.items()
                )
                if tag in ("td", "th"):
                    self._write(f"<{tag}{attr_str}>\n\n")
                else:
                    self._write(f"<{tag}{attr_str}>")
            else:
                if tag in ("td", "th"):
                    self._write(f"\n</{tag}>")
                else:
                    self._write(f"</{tag}>")
            return

        if tag == "table":
            if opening:
                self._awaiting_header_rule = True
                if self.pad_tables:
                    self._write("<" + _TABLE_PAD_MARK + ">")
                    self._write("  \n")
                else:
                    self._queue_soft_break()
            elif self.pad_tables:
                self._queue_soft_break()
                self._write("</" + _TABLE_PAD_MARK + ">")
                self._write("  \n")
        if tag in ("td", "th") and opening:
            if self.pad_tables:
                if self._cell_wants_sep:
                    self._write("| ")
            else:
                self._write(" | " if self._cell_wants_sep else "| ")
            self._cell_wants_sep = True
        if tag == "tr" and opening:
            self._row_cells = 0
        if tag == "tr" and not opening:
            if not self.pad_tables:
                self._write(" |")
            self._cell_wants_sep = False
            self._queue_soft_break()
            if self._awaiting_header_rule:
                rule = ["---"] * self._row_cells
                if self.pad_tables:
                    self._write("|".join(rule))
                else:
                    self._write("| " + " | ".join(rule) + " |")
                self._queue_soft_break()
                self._awaiting_header_rule = False
        if tag in ("td", "th") and opening:
            self._row_cells += 1

    # -- text ---------------------------------------------------------------

    def _text(self, data: str, from_entity: bool = False) -> None:
        if self._preserve_nest > 0:
            self._preserved.append(data)
            return
        if self._in_fence:
            self._write(data)
            return
        if self._in_tick:
            self._write(data.replace("\n", " "))
            return
        if not data:
            return

        if self._stressed:
            data = data.strip()
            self._stressed = False
            self._after_stressed = True
        elif self._after_stressed:
            if (
                _STRESS_JOINER.match(data[0])
                and not _heading_level(self._latest_tag)
                and self._latest_tag not in ("a", "code", "pre")
            ):
                data = " " + data
            self._after_stressed = False

        if self._auto_href is not None:
            href = self._auto_href
            if (
                href == data
                and _ABSOLUTE_URL.match(href)
                and self.use_automatic_links
            ):
                self._write("<" + data + ">")
                self._link_is_empty = False
                return
            self._write("[")
            self._auto_href = None
            self._link_is_empty = False

        if not self._code and not self._pre and not from_entity:
            data = _escape_text(
                data,
                snob=self.escape_snob,
                escape_dot=self.escape_dot,
                escape_plus=self.escape_plus,
                escape_dash=self.escape_dash,
            )
        self._prior_data = data
        self._write(data, collapse=True)

    # -- wrapping (body_width > 0 only; reference optwrap) ------------------

    def _wrap_paragraphs(self, text: str) -> str:
        result = ""
        newlines = 0
        if not self.wrap_links:
            self.inline_links = False
        for para in text.split("\n"):
            if len(para) > 0:
                if not _should_skip_wrap(
                    para, self.wrap_links, self.wrap_list_items, self.wrap_tables
                ):
                    indent = ""
                    if para.startswith("  " + self.ul_item_mark):
                        indent = "    "
                    elif para.startswith("> "):
                        indent = "> "
                    wrapped = wrap(
                        para,
                        self.body_width,
                        break_long_words=False,
                        subsequent_indent=indent,
                    )
                    result += "\n".join(wrapped)
                    if para.endswith("  "):
                        result += "  \n"
                        newlines = 1
                    elif indent:
                        result += "\n"
                        newlines = 1
                    else:
                        result += "\n\n"
                        newlines = 2
                else:
                    if not _SPACE_ONLY.match(para):
                        result += para + "\n"
                        newlines = 1
            else:
                if newlines < 2:
                    result += "\n"
                    newlines += 1
        return result


def _raw_tag(tag: str, attrs: dict) -> str:
    attr_str = "".join(
        f' {k}="{v}"' for k, v in attrs.items() if v is not None
    )
    return f"<{tag}{attr_str}>"


_TABLE_PAD_MARK = "special_marker_for_table_padding"


def _pad_tables(text: str, right_margin: int = 1) -> str:
    """Pad-table post-processing (reference utils.pad_tables_in_text)."""
    out_lines: list[str] = []
    buffer: list[str] = []
    in_table = False
    for line in text.split("\n"):
        if _TABLE_PAD_MARK in line:
            in_table = not in_table
            if not in_table:
                out_lines.extend(_pad_table_block(buffer, right_margin))
                buffer = []
                out_lines.append("")
            continue
        (buffer if in_table else out_lines).append(line)
    return "\n".join(out_lines)


def _pad_table_block(lines: list[str], right_margin: int) -> list[str]:
    if not lines:
        return []
    widths = [len(c.rstrip()) + right_margin for c in lines[0].split("|")]
    for line in lines:
        cells = [c.rstrip() for c in line.split("|")]
        if len(cells) < len(widths):
            cells += [""] * (len(widths) - len(cells))
        elif len(widths) < len(cells):
            widths += [len(c) + right_margin for c in cells[len(widths):]]
        widths = [max(len(c) + right_margin, w) for c, w in zip(cells, widths)]
    padded = []
    for line in lines:
        cells = [c.rstrip() for c in line.split("|")]
        if set(line.strip()) == set("-|"):
            padded.append(
                "|-" + "|".join(c + "-" * (w - len(c)) for c, w in zip(cells, widths)) + "|"
            )
        else:
            padded.append(
                "| " + "|".join(c + " " * (w - len(c)) for c, w in zip(cells, widths)) + "|"
            )
    return padded


def emit_markdown(html_text: str, baseurl: str = "", **options) -> str:
    """One-shot conversion under the crawl4ai defaults
    (markdown_generation_strategy.py:180-191): no wrapping, single line
    breaks, fenced code."""
    emitter = MarkdownEmitter(baseurl=baseurl)
    emitter.update_params(
        body_width=0,
        ignore_emphasis=False,
        ignore_links=False,
        ignore_images=False,
        protect_links=False,
        single_line_break=True,
        mark_code=True,
        escape_snob=False,
        **options,
    )
    return emitter.convert(html_text)
