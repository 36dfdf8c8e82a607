"""Minimal pure-stdlib PDF writer/reader — makes the rendering transforms
(T1 DOCX→PDF, T4 page print-to-PDF, T5 merge + cover) REAL in a container
without mammoth/weasyprint/pypdf/reportlab.

Produces valid PDF 1.4: uncompressed Helvetica text content streams, a
correct xref table, multi-page pagination. Reads back only what it (or
any writer of uncompressed text streams) produces — enough for golden
tests (page count, text round-trip) and for the T5 merge, which rebuilds
a merged document from its parts' content streams rather than attempting
general PDF surgery.

Layout contract (load-bearing for the SQL oracles): text is hard-wrapped
at WRAP_COLS characters, LINES_PER_PAGE lines per page — so for
single-line input text the page count is exactly
``greatest(1, ceil(length(text) / (WRAP_COLS * LINES_PER_PAGE)))``,
a pure-arithmetic cross-engine check.
"""

from __future__ import annotations

import re
import zlib

WRAP_COLS = 90
LINES_PER_PAGE = 50

_FONT_OBJ = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"


def _esc(line: str) -> str:
    """PDF string-literal escaping; non-latin-1 chars degrade to '?'
    (the built-in Helvetica encoding is single-byte)."""
    line = line.encode("latin-1", "replace").decode("latin-1")
    return line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def wrap_text(text: str, cols: int = WRAP_COLS) -> list[str]:
    """Hard character wrap (NOT word wrap — the arithmetic page-count
    oracle depends on ceil(len/cols) exactly)."""
    lines: list[str] = []
    for raw in text.split("\n"):
        if raw == "":
            lines.append("")
            continue
        for i in range(0, len(raw), cols):
            lines.append(raw[i : i + cols])
    return lines or [""]


def _page_stream(lines: list[str]) -> bytes:
    body = "BT /F1 11 Tf 14 TL 56 800 Td\n"
    for ln in lines:
        body += f"({_esc(ln)}) Tj T*\n"
    body += "ET"
    return body.encode("latin-1")


def build_pdf(page_streams: list[bytes]) -> bytes:
    """Assemble a complete PDF from per-page content streams (shared
    Helvetica /F1 resource, A4 media box, valid xref + trailer)."""
    n = len(page_streams)
    # object numbering: 1 catalog, 2 pages, 3 font, then per page i:
    # page obj 4+2i, content obj 5+2i
    objs: list[bytes] = []
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n))
    objs.append(f"<< /Type /Catalog /Pages 2 0 R >>".encode())
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode())
    objs.append(_FONT_OBJ.encode())
    for i, stream in enumerate(page_streams):
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 595 842] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {5 + 2 * i} 0 R >>"
            ).encode()
        )
        objs.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (num, obj)
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


def text_to_pdf(text: str) -> bytes:
    """Render plain text to a paginated PDF (WRAP_COLS × LINES_PER_PAGE)."""
    lines = wrap_text(text)
    pages = [
        _page_stream(lines[i : i + LINES_PER_PAGE])
        for i in range(0, len(lines), LINES_PER_PAGE)
    ] or [_page_stream([""])]
    return build_pdf(pages)


# ---------------------------------------------------------------------------
# readers (golden tests + merge)

_COUNT_RE = re.compile(rb"/Type\s*/Pages\b[^>]*?/Count\s+(\d+)")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_TJ_RE = re.compile(rb"\((.*?)(?<!\\)\)\s*Tj")
_FLATE_RE = re.compile(rb"/Filter\s*/FlateDecode")


def is_pdf(blob: bytes | None) -> bool:
    return bool(blob) and blob[:5] == b"%PDF-"


def page_count(blob: bytes) -> int:
    m = _COUNT_RE.search(blob)
    if m:
        return int(m.group(1))
    return blob.count(b"/Type /Page ") + blob.count(b"/Type /Page>")


def content_streams(blob: bytes) -> list[bytes]:
    """Raw content streams in document order (inflates FlateDecode so
    externally-produced single-filter PDFs merge too)."""
    out = []
    pos = 0
    for m in _STREAM_RE.finditer(blob):
        head = blob[pos : m.start()]
        data = m.group(1)
        if _FLATE_RE.search(head[-300:] if len(head) > 300 else head):
            try:
                data = zlib.decompress(data)
            except zlib.error:
                pass
        out.append(data)
        pos = m.end()
    return out


def extract_text(blob: bytes) -> str:
    """Text shown by Tj operators, newline per line (our writer's
    inverse; good enough for any uncompressed text-op PDF)."""
    lines = []
    for stream in content_streams(blob):
        for m in _TJ_RE.finditer(stream):
            raw = m.group(1)
            lines.append(
                raw.replace(rb"\(", b"(")
                .replace(rb"\)", b")")
                .replace(rb"\\", b"\\")
                .decode("latin-1")
            )
    return "\n".join(lines)


def merge_pdfs(parts: list[bytes], cover_text: str | None = None) -> bytes:
    """Concatenate the pages of ``parts`` into one document, optionally
    prefixed by a rendered cover page (T5,
    reference scraper_ringkoebing_skjern.py:33-67,188-243)."""
    pages: list[bytes] = []
    if cover_text is not None:
        pages.extend(_collect_pages(text_to_pdf(cover_text)))
    for blob in parts:
        pages.extend(_collect_pages(blob))
    return build_pdf(pages or [_page_stream([""])])


def _collect_pages(blob: bytes) -> list[bytes]:
    streams = content_streams(blob)
    return streams if streams else [_page_stream([""])]


def cover_page_text(title: str, date_text: str, participants: list[str]) -> str:
    """The reference's cover-page layout (title, date, 'Deltagere:' bullet
    list; scraper_ringkoebing_skjern.py:33-67) as plain text for
    text_to_pdf."""
    lines = [title, f"Dato: {date_text}", "", "Deltagere:"]
    if participants:
        lines += [f"- {p}" for p in participants]
    else:
        lines.append("(Ingen deltagere fundet paa dagsordenen)")
    return "\n".join(lines)
