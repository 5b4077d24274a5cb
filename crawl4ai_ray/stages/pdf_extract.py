"""PDF parse kernel — the reference's ``PDFContentScrapingStrategy``
(crawl4ai/processors/pdf/__init__.py:31-71, processor.py) as an
alternate extract kernel dispatched on content type.

Decoders, chosen per actor:

* ``MiniPdfDecoder`` (default) — REAL PDF parsing via the stdlib-only
  engine in functions/pdfmini.py (object scan, Flate streams, content
  tokenization, /Kids ordering, image XObject counting). The corpus
  pipeline feeds it genuine PDFs produced by ``pdfmini.write_pdf``.
* ``PyPdfDecoder`` — import-gated pypdf, for environments that have it.
* ``NaivePdfDecoder`` — the legacy fake byte format (kept for
  back-compat tests only).

Output schema (one row per page, reference emits
``CrawlResult.markdown`` per page concatenated + page metadata):
(url, page, text, n_images, width, height).
"""

from __future__ import annotations

import re
import struct
from typing import Optional

import pyarrow as pa

PDF_MAGIC = b"%PDF-"
_FAKE_MAGIC = b"%PDF-1.7\n%fake-c4r\n"


def is_pdf(payload: bytes) -> bool:
    return bool(payload) and bytes(payload[:5]) == PDF_MAGIC


def make_fake_pdf(pages: list[str], width: int = 612, height: int = 792) -> bytes:
    """Deterministic stand-in PDF: magic + length-prefixed utf-8 pages."""
    out = [_FAKE_MAGIC, struct.pack("<III", len(pages), width, height)]
    for p in pages:
        b = p.encode("utf-8")
        out.append(struct.pack("<I", len(b)))
        out.append(b)
    return b"".join(out)


class NaivePdfDecoder:
    """Decodes only ``make_fake_pdf`` output (STUB for the sandbox)."""

    def decode(self, payload: bytes) -> list[dict]:
        payload = bytes(payload)
        if not payload.startswith(_FAKE_MAGIC):
            raise NotImplementedError(
                "real PDF decoding needs pypdf (not in this container); "
                "only make_fake_pdf payloads are decodable in-sandbox"
            )
        off = len(_FAKE_MAGIC)
        n, width, height = struct.unpack_from("<III", payload, off)
        off += 12
        pages = []
        for i in range(n):
            (ln,) = struct.unpack_from("<I", payload, off)
            off += 4
            text = payload[off : off + ln].decode("utf-8")
            off += ln
            pages.append(
                {
                    "page": i + 1,
                    "text": text,
                    "n_images": 0,
                    "width": width,
                    "height": height,
                }
            )
        return pages


class MiniPdfDecoder:
    """Real decoder over the stdlib PDF engine (functions/pdfmini.py)."""

    def decode(self, payload: bytes) -> list[dict]:
        from ..functions.pdfmini import read_pdf

        return read_pdf(bytes(payload))


class PyPdfDecoder:
    """Real decoder, import-gated (pypdf absent in this container)."""

    def __init__(self):
        try:
            import pypdf  # noqa: F401

            self._pypdf = pypdf
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError("pypdf not installed") from e

    def decode(self, payload: bytes) -> list[dict]:  # pragma: no cover
        import io

        reader = self._pypdf.PdfReader(io.BytesIO(bytes(payload)))
        out = []
        for i, page in enumerate(reader.pages):
            box = page.mediabox
            out.append(
                {
                    "page": i + 1,
                    "text": page.extract_text() or "",
                    "n_images": len(getattr(page, "images", []) or []),
                    "width": int(box.width),
                    "height": int(box.height),
                }
            )
        return out


class PdfExtractStage:
    """map_batches actor: (url, payload: binary) -> per-page rows.

    Decoder chosen once per actor in __init__ (reference loads its
    PDF processor once per strategy instance)."""

    def __init__(self, decoder: str = "mini"):
        if decoder == "pypdf":
            self.decoder = PyPdfDecoder()
        elif decoder == "naive":
            self.decoder = NaivePdfDecoder()
        else:
            self.decoder = MiniPdfDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_url, o_page, o_text, o_img, o_w, o_h = [], [], [], [], [], []
        for url, payload in zip(urls, payloads):
            if payload is None or not is_pdf(payload):
                continue
            for row in self.decoder.decode(payload):
                o_url.append(url)
                o_page.append(row["page"])
                o_text.append(row["text"])
                o_img.append(row["n_images"])
                o_w.append(row["width"])
                o_h.append(row["height"])
        return pa.table(
            {
                "url": pa.array(o_url, pa.string()),
                "page": pa.array(o_page, pa.int32()),
                "text": pa.array(o_text, pa.string()),
                "n_images": pa.array(o_img, pa.int32()),
                "width": pa.array(o_w, pa.int32()),
                "height": pa.array(o_h, pa.int32()),
            }
        )


_WS = re.compile(r"[ \t]+")


def pdf_pages_to_markdown(pages: list[dict]) -> str:
    """Join page texts the way the reference's PDF processor renders
    markdown (page separator + normalized intra-line whitespace)."""
    parts = []
    for p in pages:
        txt = _WS.sub(" ", p["text"]).strip()
        parts.append(f"## Page {p['page']}\n\n{txt}")
    return "\n\n".join(parts)
