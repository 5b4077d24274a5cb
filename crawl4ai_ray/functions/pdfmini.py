"""Minimal real PDF writer + text extractor (stdlib only).

The container has no pypdf, but PDF itself needs nothing beyond zlib:
this module emits spec-conformant single-font PDFs (PDF 1.4: catalog,
pages tree, Type1 Helvetica, per-page FlateDecode content streams, a
correct xref table) and parses real PDFs back — object scanning,
stream inflation, content-stream tokenization of the text-showing
operators (Tj, ', ", TJ) with literal/hex string unescaping, /Kids
page ordering, /MediaBox geometry and /XObject image counting.

It replaces the round-1 fake byte format: the corpus PDF pipeline now
round-trips genuine PDFs (reference PDF processor:
crawl4ai/processors/pdf/processor.py — the spec for the per-page
text/image/geometry output).

Scope: the writer's own output plus straightforwardly-structured
third-party PDFs (uncompressed or Flate streams, non-encrypted,
non-object-stream xref). Anything else raises rather than answering
wrong.
"""

from __future__ import annotations

import re
import zlib
from typing import Optional

__all__ = ["write_pdf", "read_pdf", "PdfError"]


class PdfError(ValueError):
    pass


# ---------------------------------------------------------------------------
# writer

_ESC = {ord("\\"): b"\\\\", ord("("): b"\\(", ord(")"): b"\\)",
        ord("\n"): b"\\n", ord("\r"): b"\\r", ord("\t"): b"\\t"}


def _pdf_string(line: str) -> bytes:
    out = bytearray(b"(")
    for b in line.encode("utf-8"):
        esc = _ESC.get(b)
        if esc is not None:
            out += esc
        elif 32 <= b < 127:
            out.append(b)
        else:
            out += b"\\%03o" % b
    out += b")"
    return bytes(out)


def write_pdf(
    pages: list[str],
    width: int = 612,
    height: int = 792,
    *,
    font_size: int = 12,
    margin: int = 72,
    with_image: bool = False,
) -> bytes:
    """Serialize one text block per page into a valid PDF.

    Each ``\\n``-separated line becomes one ``Tj`` show with ``T*``
    line advances, so ``read_pdf`` round-trips the exact text.
    ``with_image`` embeds a 1x1 RGB image XObject per page (exercises
    the image-counting path).
    """
    objects: list[bytes] = []  # 1-indexed body of "N 0 obj ... endobj"

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    font_id = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    image_id = None
    if with_image:
        pixel = zlib.compress(b"\xff\x00\x00")
        image_id = add(
            b"<< /Type /XObject /Subtype /Image /Width 1 /Height 1 "
            b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode "
            b"/Length %d >>\nstream\n%s\nendstream" % (len(pixel), pixel)
        )

    page_ids: list[int] = []
    content_ids: list[int] = []
    for text in pages:
        lines = text.split("\n")
        ops = [
            b"BT /F1 %d Tf %d %d Td %d TL"
            % (font_size, margin, height - margin, font_size + 2)
        ]
        for i, line in enumerate(lines):
            if i:
                ops.append(b"T*")
            ops.append(_pdf_string(line) + b" Tj")
        ops.append(b"ET")
        if with_image:
            ops.append(b"q 10 0 0 10 %d %d cm /Im1 Do Q" % (margin, margin))
        stream = zlib.compress(b"\n".join(ops))
        content_ids.append(
            add(
                b"<< /Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream"
                % (len(stream), stream)
            )
        )

    pages_id_placeholder = len(objects) + len(pages) + 1
    for k in range(len(pages)):
        xobj = (
            b" /XObject << /Im1 %d 0 R >>" % image_id if image_id else b""
        )
        page_ids.append(
            add(
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %d %d] "
                b"/Resources << /Font << /F1 %d 0 R >>%s >> /Contents %d 0 R >>"
                % (pages_id_placeholder, width, height, font_id, xobj, content_ids[k])
            )
        )
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    pages_id = add(
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_ids))
    )
    assert pages_id == pages_id_placeholder
    catalog_id = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_id)

    # assemble with a correct xref
    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objects) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, catalog_id, xref_at)
    )
    return bytes(buf)


# ---------------------------------------------------------------------------
# parser

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_REF_RE = re.compile(rb"/%s\s+(\d+)\s+0\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.S)
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)


def _objects(data: bytes) -> dict[int, bytes]:
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        objs[int(m.group(1))] = m.group(2)
    if not objs:
        raise PdfError("no indirect objects found")
    return objs


def _ref(body: bytes, key: bytes) -> Optional[int]:
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+0\s+R", body)
    return int(m.group(1)) if m else None


def _stream_bytes(body: bytes) -> bytes:
    start = re.search(rb"stream\r?\n", body)
    if not start:
        raise PdfError("content object has no stream")
    lm = re.search(rb"/Length\s+(\d+)", body)
    if lm:
        # exact /Length slice — a trailing 0x0d data byte would
        # otherwise be eaten by a \r?\nendstream delimiter match
        raw = body[start.end() : start.end() + int(lm.group(1))]
    else:
        m = _STREAM_RE.search(body)
        if not m:
            raise PdfError("unterminated stream")
        raw = m.group(1)
    if b"/FlateDecode" in body:
        try:
            return zlib.decompress(raw)
        except zlib.error as e:
            raise PdfError(f"bad Flate stream: {e}") from None
    if b"/Filter" in body.split(b"stream", 1)[0]:
        raise PdfError("unsupported stream filter")
    return raw


def _unescape_literal(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        b = raw[i]
        if b != 0x5C:  # backslash
            out.append(b)
            i += 1
            continue
        i += 1
        if i >= len(raw):
            break
        c = raw[i : i + 1]
        simple = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\x08",
                  b"f": b"\x0c", b"(": b"(", b")": b")", b"\\": b"\\"}
        if c in simple:
            out += simple[c]
            i += 1
        elif c.isdigit():
            octal = raw[i : i + 3]
            j = 1
            while j < 3 and j < len(octal) and chr(octal[j]).isdigit():
                j += 1
            out.append(int(raw[i : i + j], 8) & 0xFF)
            i += j
        elif c in (b"\n", b"\r"):
            i += 1  # line continuation
        else:
            out += c
            i += 1
    return bytes(out)


def _content_strings(stream: bytes) -> list[bytes]:
    """Text-showing strings in order: Tj, ', \", and TJ array elements.
    Each Tj/'/\" counts as one line; T* between them is implied by the
    caller joining with newlines."""
    shows: list[bytes] = []
    i = 0
    n = len(stream)
    pending: list[bytes] = []  # strings seen since last operator
    while i < n:
        b = stream[i]
        if b == 0x28:  # (
            depth = 1
            j = i + 1
            buf = bytearray()
            while j < n and depth:
                c = stream[j]
                if c == 0x5C and j + 1 < n:
                    buf += stream[j : j + 2]
                    j += 2
                    continue
                if c == 0x28:
                    depth += 1
                elif c == 0x29:
                    depth -= 1
                    if depth == 0:
                        break
                buf.append(c)
                j += 1
            pending.append(_unescape_literal(bytes(buf)))
            i = j + 1
            continue
        if b == 0x3C and i + 1 < n and stream[i + 1] != 0x3C:  # <hex>
            j = stream.find(b">", i)
            if j == -1:
                break
            hexstr = re.sub(rb"\s", b"", stream[i + 1 : j])
            if len(hexstr) % 2:
                hexstr += b"0"
            pending.append(bytes.fromhex(hexstr.decode("ascii")))
            i = j + 1
            continue
        # operator tokens
        if stream[i : i + 2] in (b"Tj", b"TJ") or b in (0x27, 0x22):
            if pending:
                shows.append(b"".join(pending))
                pending = []
            i += 2 if stream[i : i + 2] in (b"Tj", b"TJ") else 1
            continue
        if stream[i : i + 2] in (b"BT", b"ET", b"T*", b"Td", b"TD", b"Tf", b"TL"):
            pending = pending if stream[i : i + 2] in (b"Td", b"TD") else pending
            i += 2
            continue
        i += 1
    return shows


def read_pdf(data: bytes) -> list[dict]:
    """-> per-page dicts: page, text, n_images, width, height."""
    data = bytes(data)
    if not data.startswith(b"%PDF-"):
        raise PdfError("not a PDF (missing %PDF- header)")
    if b"/Encrypt" in data:
        raise PdfError("encrypted PDFs unsupported")
    objs = _objects(data)

    # page order via the pages tree when present; fallback: object order
    page_ids = [
        num for num, body in sorted(objs.items())
        if re.search(rb"/Type\s*/Page\b(?!s)", body)
    ]
    root = next(
        (body for body in objs.values() if b"/Type /Pages" in body or b"/Type/Pages" in body),
        None,
    )
    if root is not None:
        m = _KIDS_RE.search(root)
        if m:
            ordered = [int(x) for x in re.findall(rb"(\d+)\s+0\s+R", m.group(1))]
            page_ids = [p for p in ordered if p in objs] or page_ids

    pages = []
    for k, pid in enumerate(page_ids):
        body = objs[pid]
        mb = _MEDIABOX_RE.search(body)
        width = int(float(mb.group(3))) if mb else 0
        height = int(float(mb.group(4))) if mb else 0
        text = ""
        cid = _ref(body, b"Contents")
        if cid is not None and cid in objs:
            stream = _stream_bytes(objs[cid])
            text = "\n".join(
                s.decode("utf-8", "replace") for s in _content_strings(stream)
            )
        n_images = 0
        xm = re.search(rb"/XObject\s*<<(.*?)>>", body, re.S)
        if xm:
            for ref in re.findall(rb"(\d+)\s+0\s+R", xm.group(1)):
                ob = objs.get(int(ref), b"")
                if re.search(rb"/Subtype\s*/Image\b", ob):
                    n_images += 1
        pages.append(
            {
                "page": k + 1,
                "text": text,
                "n_images": n_images,
                "width": width,
                "height": height,
            }
        )
    if not pages:
        raise PdfError("no /Type /Page objects found")
    return pages
