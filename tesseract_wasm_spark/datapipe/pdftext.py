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


def make_simple_pdf(lines: list[str]) -> bytes:
    """A minimal valid single-page PDF with an UNCOMPRESSED content stream —
    the deterministic fixture generator (pure ASCII so binary->string casts
    are loss-free)."""
    def esc(s: str) -> str:
        return s.replace("\\", "\\\\").replace("(", r"\(").replace(")", r"\)")

    shows = "\n".join(f"({esc(ln)}) Tj 0 -14 Td" for ln in lines)
    content = f"BT /F1 12 Tf 72 720 Td\n{shows}\nET"
    objs = [
        "<< /Type /Catalog /Pages 2 0 R >>",
        "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        f"<< /Length {len(content)} >>\nstream\n{content}\nendstream",
        "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = ["%PDF-1.4"]
    offsets = []
    pos = len(out[0]) + 1
    for i, body in enumerate(objs, start=1):
        obj = f"{i} 0 obj\n{body}\nendobj"
        offsets.append(pos)
        out.append(obj)
        pos += len(obj) + 1
    xref_pos = pos
    xref = ["xref", f"0 {len(objs) + 1}", "0000000000 65535 f "]
    xref += [f"{off:010d} 00000 n " for off in offsets]
    out.append("\n".join(xref))
    out.append(f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>")
    out.append(f"startxref\n{xref_pos}\n%%EOF")
    return "\n".join(out).encode("ascii")
