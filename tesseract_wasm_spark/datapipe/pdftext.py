"""PDF text extraction — the "PDF/layout parse" axis of the north rule's
extraction tier (HTML ✓ webtext.py, images ✓ OCR engine, PDF here).

Scope: the uncompressed-content-stream subset of PDF (text showing operators
inside BT..ET blocks, string literals in parentheses) — the layer every real
PDF text extractor bottoms out in once streams are inflated. Foreign filters
(FlateDecode needs zlib over binary columns — doable but the synthetic
corpus writes plain streams) are out of scope and documented.

Like webtext.py, the extractor is pure JVM expressions with RE2-safe
regexes, so the DuckDB oracle (queries.SQL_PDF_TEXT) runs the IDENTICAL
pipeline — a full dual derivation.

Extraction semantics: each ``(string) Tj`` text run is one line; runs are
emitted in stream order, joined with newlines. Escapes ``\\(`` ``\\)``
``\\\\`` are decoded (sufficient for the PDF string grammar our generator
emits; octal escapes are not produced by it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: text blocks, then string literals shown with Tj/TJ inside them
_BT_ET = r"(?s)BT(.*?)ET"
_TJ_STRING = r"(?s)\(((?:[^\\()]|\\.)*)\)\s*Tj"


def pdf_text_expr(pdf_str: Column) -> Column:
    """Decoded PDF bytes (as string) -> extracted text, one line per Tj run."""
    blocks = F.regexp_extract_all(pdf_str, F.lit(_BT_ET), 1)
    runs = F.flatten(
        F.transform(blocks, lambda b: F.regexp_extract_all(b, F.lit(_TJ_STRING), 1))
    )
    unescaped = F.transform(
        runs,
        lambda s: F.replace(
            F.replace(F.replace(s, F.lit(r"\("), F.lit("(")), F.lit(r"\)"), F.lit(")")),
            F.lit("\\\\"),
            F.lit("\\"),
        ),
    )
    return F.array_join(unescaped, "\n")


def pdf_text(docs: DataFrame, *, pdf_col: str = "pdf_text_raw",
             id_col: str = "url") -> DataFrame:
    return docs.select(id_col, pdf_text_expr(F.col(pdf_col)).alias("text_out"))


def pdf_escape_expr(text: Column) -> Column:
    """Inverse escape for building synthetic PDFs whose extraction
    round-trips: backslash first, then parentheses."""
    out = F.replace(text, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit("("), F.lit(r"\("))
    return F.replace(out, F.lit(")"), F.lit(r"\)"))


def make_simple_pdf(lines: list[str], *, compress: bool = False) -> bytes:
    """A minimal valid single-page PDF — the deterministic fixture generator.

    ``compress=False``: uncompressed content stream, pure ASCII, so the
    whole-file binary->string cast path (pdf_text_expr) applies.
    ``compress=True``: the content stream is FlateDecode (zlib) compressed —
    the real-world shape — which requires the byte-level decode path
    (pdf_pages_text / extract_pdf_bytes)."""
    def esc(s: str) -> str:
        return s.replace("\\", "\\\\").replace("(", r"\(").replace(")", r"\)")

    shows = "\n".join(f"({esc(ln)}) Tj 0 -14 Td" for ln in lines)
    content_b = f"BT /F1 12 Tf 72 720 Td\n{shows}\nET".encode("ascii")
    if compress:
        import zlib  # noqa: PLC0415

        content_b = zlib.compress(content_b, level=6)
        stream_dict = f"<< /Length {len(content_b)} /Filter /FlateDecode >>"
    else:
        stream_dict = f"<< /Length {len(content_b)} >>"
    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        stream_dict.encode("ascii") + b"\nstream\n" + content_b + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out: list[bytes] = [b"%PDF-1.4"]
    offsets = []
    pos = len(out[0]) + 1
    for i, body in enumerate(objs, start=1):
        obj = f"{i} 0 obj\n".encode("ascii") + body + b"\nendobj"
        offsets.append(pos)
        out.append(obj)
        pos += len(obj) + 1
    xref_pos = pos
    xref = ["xref", f"0 {len(objs) + 1}", "0000000000 65535 f "]
    xref += [f"{off:010d} 00000 n " for off in offsets]
    out.append("\n".join(xref).encode("ascii"))
    out.append(f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>".encode("ascii"))
    out.append(f"startxref\n{xref_pos}\n%%EOF".encode("ascii"))
    return b"\n".join(out)


# --- byte-level path: FlateDecode streams (the real-world PDF shape) --------

import re as _re  # noqa: E402

_STREAM_RE = _re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)\r?\nendstream", _re.S)
_BT_ET_B = _re.compile(rb"(?s)BT(.*?)ET")
_TJ_STRING_B = _re.compile(rb"(?s)\(((?:[^\\()]|\\.)*)\)\s*Tj")


def extract_pdf_bytes(raw: bytes) -> str:
    """Full byte-level PDF text extraction: walk every stream object, inflate
    /FlateDecode streams with zlib (stdlib — this is a DECODE step like
    drf.decode, so it lives on the Python side of the pipeline), then parse
    Tj runs exactly like the relational expression path."""
    import zlib  # noqa: PLC0415

    runs: list[str] = []
    for m in _STREAM_RE.finditer(raw):
        head, body = m.group(1), m.group(2)
        if b"/FlateDecode" in head:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue  # corrupt stream: skip, never throw (error-as-value)
        for block in _BT_ET_B.finditer(body):
            for s in _TJ_STRING_B.finditer(block.group(1)):
                txt = s.group(1).decode("latin-1")
                txt = txt.replace(r"\(", "(").replace(r"\)", ")").replace("\\\\", "\\")
                runs.append(txt)
    return "\n".join(runs)


def pdf_pages_text(pages: DataFrame, *, payload_col: str = "html",
                   id_col: str = "url") -> DataFrame:
    """Distributed byte-level extraction over (url, pdf binary) rows —
    handles compressed AND uncompressed streams. One vectorized pandas pass
    (per-row zlib inflate is C-speed; regex parse per document)."""
    from collections.abc import Iterator  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "text_out": [extract_pdf_bytes(bytes(b)) for b in pdf[payload_col]],
                }
            )

    return pages.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} string, text_out string"
    )
