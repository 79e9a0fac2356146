"""X1: PDF text extraction with the standard library only.

The environment has no pdfplumber/PyMuPDF (the libraries the spec
suggests, TEST_TECNICO_INGENIERO_DATOS.md:80-81), so this implements a
minimal born-digital-PDF text reconstructor from public format
knowledge (PDF 1.7 / ISO 32000: FlateDecode content streams; BT/ET text
objects; Tj/TJ show-text operators; octal/char escapes in literal
strings; negative kern values in TJ arrays approximating inter-word
gaps). It is deliberately scoped to what the spec's corpus needs —
born-digital reports with a real text layer (SURVEY.md §1.1) — and
slots behind the same interface a real extractor library would.

Spark integration: ``pages_udf`` is a Pandas UDF over the binaryFile
``content`` column returning ARRAY<STRUCT<page,text>> — one Arrow batch
per file group, parallelism = file count (SURVEY.md §4.3).
"""

from __future__ import annotations

import re
import zlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_STREAM_RE = re.compile(rb"stream\r?\n")
_SHOW_RE = re.compile(
    rb"\[((?:\((?:\\.|[^\\()])*\)|[^\]])*)\]\s*TJ"  # [ ... ] TJ arrays
    rb"|\((?:\\.|[^\\()])*\)\s*Tj"  # (..) Tj
    rb"|T\*|TD|Td|Tm"  # line/position ops -> newline
)
_ITEM_RE = re.compile(rb"\((?:\\.|[^\\()])*\)|-?\d+(?:\.\d+)?")
_ESC_CHAR = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}

#: TJ kern threshold (thousandths of em) below which we emit a space.
KERN_GAP = -150


def _unescape(lit: bytes) -> bytes:
    s = lit[1:-1]
    s = re.sub(rb"\\([nrtbf()\\])", lambda m: _ESC_CHAR[m.group(1)], s)
    return re.sub(rb"\\(\d{1,3})", lambda m: bytes([int(m.group(1), 8) & 0xFF]), s)


def _stream_text(content: bytes) -> str:
    """Reconstruct reading-order text of one decompressed content stream."""
    out: list[bytes] = []
    for m in _SHOW_RE.finditer(content):
        tok = m.group(0)
        if tok.endswith(b"TJ"):
            parts: list[bytes] = []
            for sm in _ITEM_RE.finditer(m.group(1) or b""):
                t = sm.group(0)
                if t.startswith(b"("):
                    parts.append(_unescape(t))
                else:
                    try:
                        if float(t) < KERN_GAP:
                            parts.append(b" ")
                    except ValueError:
                        pass
            out.append(b"".join(parts))
        elif tok.endswith(b"Tj"):
            out.append(_unescape(tok[: tok.rfind(b")") + 1]))
        else:
            out.append(b"\n")
    return b" ".join(x for x in out if x).decode("latin-1", "replace")


def extract_pages(pdf_bytes: bytes) -> list[tuple[int, str]]:
    """PDF bytes -> [(page_index, text)] over text-bearing content
    streams (stream order approximates page order for linear reports)."""
    pages: list[tuple[int, str]] = []
    idx = 0
    for m in _STREAM_RE.finditer(pdf_bytes):
        start = m.end()
        end = pdf_bytes.find(b"endstream", start)
        if end == -1:
            continue
        try:
            # decompressobj tolerates the EOL bytes between the deflate
            # payload and the `endstream` keyword; a plain decompress()
            # after rstrip would corrupt payloads that themselves end in
            # 0x0A/0x0D (~2% of streams).
            data = zlib.decompressobj().decompress(pdf_bytes[start:end])
        except zlib.error:
            continue
        if b"Tj" not in data and b"TJ" not in data:
            continue
        text = _stream_text(data)
        if text.strip():
            pages.append((idx, text))
            idx += 1
    return pages


PAGES_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("page", T.IntegerType()),
            T.StructField("text", T.StringType()),
        ]
    )
)


@F.pandas_udf(PAGES_TYPE)
def pages_udf(content: pd.Series) -> pd.Series:
    """X1 as an Arrow-batched Pandas UDF over binaryFile content."""
    return content.map(lambda b: extract_pages(bytes(b)) if b is not None else [])


# --------------------------------------------------------------- PDF renderer
# Synthetic born-digital PDFs for round-trip testing of the extractor at
# corpus scale (the real sample report is covered by the golden tests).
# Structure follows ISO 32000: catalog/pages/page objects, a FlateDecode
# content stream with BT..Tj..ET, a correct xref table and trailer.


def _pdf_escape(text: str) -> bytes:
    b = text.encode("latin-1", "replace")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def render_pdf(text: str) -> bytes:
    """text -> one-page PDF whose only text op is a single Tj literal,
    plus a non-text (graphics) stream the extractor must skip."""
    content = b"BT /F1 12 Tf (" + _pdf_escape(text) + b") Tj ET"
    stream = zlib.compress(content)
    gfx = zlib.compress(b"0 0 612 792 re f")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
        % (len(stream), stream),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
        % (len(gfx), gfx),
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


@F.pandas_udf(T.BinaryType())
def render_pdf_udf(text: pd.Series) -> pd.Series:
    """Vectorized PDF renderer (the inverse of pages_udf, for round-trip
    verification of the extractor over arbitrary corpora)."""
    return text.map(render_pdf)
