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
            data = zlib.decompress(pdf_bytes[start:end].rstrip(b"\r\n"))
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
