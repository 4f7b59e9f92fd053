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

#: text blocks, then show operators inside them: literal-string ``(s) Tj``,
#: hex-string ``<48..> Tj``, and kerned-array ``[(a) -120 (b)] TJ`` — the
#: operator real-world PDFs overwhelmingly use. All RE2-safe (shared verbatim
#: by the DuckDB oracle and mirrored by the byte-level path).
_BT_ET = r"(?s)BT(.*?)ET"
_STR = r"\(((?:[^\\()]|\\.)*)\)"
_HEX = r"<([0-9A-Fa-f\s]*)>"
_TJ_STRING = rf"(?s){_STR}\s*Tj"
_SHOW_OP = rf"(?s)(?:{_STR}\s*Tj|{_HEX}\s*Tj|\[((?:[^\[\]\\]|\\.)*)\]\s*TJ)"
_TJ_ELEM = rf"(?:{_STR}|{_HEX}|-?\d+(?:\.\d+)?)"

#: a TJ kern adjustment at or below this (thousandths of text-space units,
#: negative = widen) renders as an inter-word gap; smaller nudges are glyph
#: kerning inside a word. -180 is the classic extractor heuristic (word
#: spaces in body text are typically -200..-600).
TJ_SPACE_KERN = -180.0

#: documented limitation: a literal ']' inside a TJ-array string element ends
#: the array match early (RE2 has no recursion); emit such text via Tj.

#: PDF string escapes (PDF 32000-1 §7.3.4.2): \ddd octal (1-3 digits),
#: \n \r \t \b \f control shorthands, \( \) \\ literals, backslash-newline =
#: line continuation (dropped), backslash before anything else = ignored
#: backslash. One regex tokenizes the escape in a single left-to-right pass
#: (chained replaces mis-handle sequences like '\\\\(').
_PDF_ESC = r"(?s)\\([0-7]{1,3}|.)"


def _esc_char(e: Column) -> Column:
    """One captured escape body -> its character (shared semantics with the
    byte path and the DuckDB twin; octal is mod 256, codepoints U+00NN —
    latin-1, matching the byte path's decode)."""
    oct_val = F.conv(e, 8, 10).cast("int") % 256
    return (
        F.when(e.rlike("^[0-7]{1,3}$"), F.char(oct_val))
        .when(e == "n", F.lit("\n"))
        .when(e == "r", F.lit("\r"))
        .when(e == "t", F.lit("\t"))
        .when(e == "b", F.lit("\b"))
        .when(e == "f", F.lit("\f"))
        .when(e == "\n", F.lit(""))  # line continuation
        .otherwise(e)  # \( \) \\ and 'ignore the backslash' for the rest
    )


def _unescape(s: Column) -> Column:
    """Split-and-rebuild single-pass unescape (same machinery as webtext's
    numeric-entity decode; split keeps trailing empties in both engines)."""
    parts = F.split(s, _PDF_ESC)
    ents = F.regexp_extract_all(s, F.lit(_PDF_ESC), 1)
    rebuilt = F.zip_with(
        F.slice(parts, 1, F.size(ents)), ents,
        lambda p, e: F.concat(p, _esc_char(e)),
    )
    return F.concat(F.array_join(rebuilt, ""), F.element_at(parts, -1))


def _hex_text(e: Column) -> Column:
    """Hex show-string -> text. PDF 32000-1 §7.3.4.3: an odd digit count
    implies a trailing 0. Bytes decode as latin-1 — the SAME single-byte
    semantics as literal strings (_unescape_b / _esc_char), so identical
    bytes show identically regardless of operator form — unless a UTF-16BE
    BOM (FEFF) leads, the other encoding real PDFs use for text strings."""
    h = F.regexp_replace(e, "[^0-9A-Fa-f]", "")
    h = F.when(F.length(h) % 2 == 1, F.concat(h, F.lit("0"))).otherwise(h)
    raw = F.unhex(h)
    return F.when(
        F.upper(F.substring(h, 1, 4)) == "FEFF", F.decode(raw, "UTF-16")
    ).otherwise(F.decode(raw, "ISO-8859-1"))


def _elem_text(e: Column) -> Column:
    """One TJ-array element -> shown text: strings/hex decode, a kern number
    becomes a space iff it is at or below TJ_SPACE_KERN (the cast is safe:
    non-string, non-hex elements match the numeric alternative of
    _TJ_ELEM by construction)."""
    return (
        F.when(F.substring(e, 1, 1) == "(",
               _unescape(F.regexp_extract(e, "(?s)" + _STR, 1)))
        .when(F.substring(e, 1, 1) == "<", _hex_text(e))
        .otherwise(
            F.when(e.cast("double") <= F.lit(TJ_SPACE_KERN), F.lit(" ")).otherwise(F.lit(""))
        )
    )


def _op_text(op: Column) -> Column:
    tj_text = F.array_join(
        F.transform(F.regexp_extract_all(op, F.lit(_TJ_ELEM), 0), _elem_text), ""
    )
    return (
        F.when(F.substring(op, 1, 1) == "[", tj_text)
        .when(F.substring(op, 1, 1) == "<", _hex_text(op))
        .otherwise(_unescape(F.regexp_extract(op, "(?s)" + _STR, 1)))
    )


def pdf_text_expr(pdf_str: Column) -> Column:
    """Decoded PDF bytes (as string) -> extracted text, one line per show
    operator (Tj literal, Tj hex, or TJ kerned array), in stream order."""
    blocks = F.regexp_extract_all(pdf_str, F.lit(_BT_ET), 1)
    ops = F.flatten(
        F.transform(blocks, lambda b: F.regexp_extract_all(b, F.lit(_SHOW_OP), 0))
    )
    return F.array_join(F.transform(ops, _op_text), "\n")


def pdf_text(docs: DataFrame, *, pdf_col: str = "pdf_text_raw",
             id_col: str = "url") -> DataFrame:
    return docs.select(id_col, pdf_text_expr(F.col(pdf_col)).alias("text_out"))


def pdf_escape_expr(text: Column) -> Column:
    """Inverse escape for building synthetic PDFs whose extraction
    round-trips: backslash first, then parentheses."""
    out = F.replace(text, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit("("), F.lit(r"\("))
    return F.replace(out, F.lit(")"), F.lit(r"\)"))


def make_simple_pdf(lines: list[str], *, compress: bool = False,
                    operators: str = "tj",
                    differences: dict[int, str] | None = None) -> bytes:
    """A minimal valid single-page PDF — the deterministic fixture generator.

    ``compress=False``: uncompressed content stream, pure ASCII, so the
    whole-file binary->string cast path (pdf_text_expr) applies.
    ``compress=True``: the content stream is FlateDecode (zlib) compressed —
    the real-world shape — which requires the byte-level decode path
    (pdf_pages_text / extract_pdf_bytes).
    ``operators="mixed"``: cycle the three show-operator forms across lines —
    literal ``Tj``, kerned-array ``TJ`` (word gaps as -240 kerns, an
    intra-word -120 nudge that must NOT become a space), and hex ``Tj`` —
    so extraction must handle all of them to round-trip.
    ``differences``: {code -> AGL glyph name} — the /F1 font gains an
    /Encoding /Differences array and every line character covered by the
    map is ENCODED as its remapped code (octal-escaped in literals, raw in
    hex), so extraction round-trips only by resolving the glyph names
    (_parse_font_encodings); uncovered characters must be ASCII."""
    rev = {
        _AGL[name]: code
        for code, name in (differences or {}).items() if name in _AGL
    }

    def code_line(ln: str) -> str:
        # latin-1 'coded' form: each remapped char becomes chr(its code)
        return "".join(chr(rev[c]) if c in rev else c for c in ln)

    def esc(s: str) -> str:
        s = s.replace("\\", "\\\\").replace("(", r"\(").replace(")", r"\)")
        return "".join(c if ord(c) < 128 else f"\\{ord(c):03o}" for c in s)

    def show(i: int, ln: str) -> str:
        ln = code_line(ln)
        if operators != "mixed" or i % 3 == 0:
            return f"({esc(ln)}) Tj 0 -14 Td"
        if i % 3 == 1:
            words = ln.split(" ")
            first = words[0]
            elems = (
                [f"({esc(first[:2])}) -120 ({esc(first[2:])})"]
                if len(first) > 2 else [f"({esc(first)})"]
            )
            elems += [f"-240 ({esc(w)})" for w in words[1:]]
            return f"[{' '.join(elems)}] TJ 0 -14 Td"
        enc = "latin-1" if differences else "utf-8"
        return f"<{ln.encode(enc).hex().upper()}> Tj 0 -14 Td"

    shows = "\n".join(show(i, ln) for i, ln in enumerate(lines))
    content_b = f"BT /F1 12 Tf 72 720 Td\n{shows}\nET".encode("ascii")
    if compress:
        import zlib  # noqa: PLC0415

        content_b = zlib.compress(content_b, level=6)
        stream_dict = f"<< /Length {len(content_b)} /Filter /FlateDecode >>"
    else:
        stream_dict = f"<< /Length {len(content_b)} >>"
    if differences:
        diff_arr = " ".join(f"{c} /{n}" for c, n in sorted(differences.items()))
        font_obj = (
            f"<< /Type /Font /Subtype /Type1 /BaseFont /Custom /Encoding "
            f"<< /Type /Encoding /Differences [ {diff_arr} ] >> >>"
        ).encode("ascii")
    else:
        font_obj = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        stream_dict.encode("ascii") + b"\nstream\n" + content_b + b"\nendstream",
        font_obj,
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

#: tempered dict match ((?!<<) keeps the head to the NEAREST dict before
#: 'stream', not a greedy span across earlier objects); the body match is a
#: fallback only — binary stream data is sliced by /Length when present,
#: because a compressed stream whose last byte happens to be 0x0D would lose
#: it to the \r?-tolerant terminator (a real 1-in-256 truncation, found by
#: the mixed-corpus soak)
_STREAM_RE = _re.compile(
    rb"<<((?:(?!<<).)*?)>>\s*stream\r?\n(.*?)\r?\nendstream", _re.S
)
#: (?![\d\s]*R) — not the narrower (?!\s+\d+\s+R) — so an indirect-ref
#: '/Length 15 0 R' cannot backtrack into matching '1' (digit-prefix
#: backtracking satisfied the old lookahead); a direct length followed by
#: another key ('/Length 44 /Filter') still matches because '/' breaks the
#: class before any R
_LENGTH_RE = _re.compile(rb"/Length\s+(\d+)(?![\d\s]*R)")
_BT_ET_B = _re.compile(rb"(?s)BT(.*?)ET")
_STR_B = _re.compile(_STR.encode("ascii"), _re.S)
_SHOW_OP_B = _re.compile(_SHOW_OP.encode("ascii"))
_TJ_ELEM_B = _re.compile(_TJ_ELEM.encode("ascii"), _re.S)


_PDF_ESC_B = _re.compile(rb"\\([0-7]{1,3}|.)", _re.S)
_ESC_SHORT = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\x08",
              b"f": b"\x0c", b"\n": b""}


def _unescape_raw(s: bytes) -> bytes:
    def sub(m: "_re.Match[bytes]") -> bytes:
        e = m.group(1)
        if e and all(c in b"01234567" for c in e) and len(e) <= 3:
            return bytes([int(e, 8) % 256])
        return _ESC_SHORT.get(e, e)

    return _PDF_ESC_B.sub(sub, s)


def _unescape_b(s: bytes) -> str:
    return _unescape_raw(s).decode("latin-1")


# --- simple-font /Encoding /Differences support (byte path only) ------------
#
# Real crawls are full of Type1/TrueType simple fonts whose /Encoding dict
# remaps character codes via a /Differences array of glyph NAMES (PDF
# 32000-1 §9.6.6). Scope: simple (one-byte-code) fonts with a Differences
# array, glyph names resolved through an Adobe-Glyph-List subset covering
# ASCII + common Latin-1 accents; codes outside the map fall back to latin-1
# identity (≈ StandardEncoding in the ASCII range); unknown glyph names
# yield U+FFFD. CID/Type0 composite fonts are out of scope (multi-byte
# codes, CMaps) and decode through the default path.

#: Adobe Glyph List subset: every ASCII punctuation/digit glyph name plus
#: the Latin-1 accents that appear in western-European crawls
_AGL: dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "agrave": "à", "aacute": "á", "acircumflex": "â",
    "adieresis": "ä", "ccedilla": "ç", "egrave": "è",
    "eacute": "é", "ecircumflex": "ê", "edieresis": "ë",
    "igrave": "ì", "iacute": "í", "idieresis": "ï",
    "ntilde": "ñ", "ograve": "ò", "oacute": "ó",
    "ocircumflex": "ô", "odieresis": "ö", "ugrave": "ù",
    "uacute": "ú", "ucircumflex": "û", "udieresis": "ü",
    "germandbls": "ß", "ydieresis": "ÿ",
    "Agrave": "À", "Aacute": "Á", "Adieresis": "Ä",
    "Ccedilla": "Ç", "Egrave": "È", "Eacute": "É",
    "Ntilde": "Ñ", "Odieresis": "Ö", "Udieresis": "Ü",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "endash": "–", "emdash": "—", "bullet": "•",
}
for _c in range(ord("A"), ord("z") + 1):  # letter glyph names are themselves
    if chr(_c).isalpha():
        _AGL.setdefault(chr(_c), chr(_c))

_OBJ_B = _re.compile(rb"(\d+)\s+0\s+obj(.*?)endobj", _re.S)
_DIFFS_B = _re.compile(rb"/Differences\s*\[(.*?)\]", _re.S)
_DIFF_TOK_B = _re.compile(rb"/([A-Za-z0-9.]+)|(\d+)")
_FONT_RES_B = _re.compile(rb"/Font\s*<<(.*?)>>", _re.S)
_FONT_REF_B = _re.compile(rb"/([A-Za-z0-9]+)\s+(\d+)\s+0\s+R")


def _parse_font_encodings(raw: bytes) -> dict[bytes, dict[int, str]]:
    """Resource name (b'F1') -> {char code -> decoded char} for every simple
    font object that carries an inline /Encoding /Differences array. Two
    passes over the raw (uncompressed object-level) file: collect per-object
    Differences maps, then bind them to resource names through the pages'
    /Resources /Font dicts. Resource dicts from different pages are merged —
    same-name-different-font collisions (rare; generators number fonts
    globally) resolve to the LAST binding, a documented approximation that
    avoids tracking page->stream ownership."""
    diffs_by_obj: dict[int, dict[int, str]] = {}
    for m in _OBJ_B.finditer(raw):
        body = m.group(2)
        if b"/Font" not in body and b"/Type1" not in body:
            continue
        dm = _DIFFS_B.search(body)
        if dm is None:
            continue
        code, table = 0, {}
        for tok in _DIFF_TOK_B.finditer(dm.group(1)):
            name, num = tok.group(1), tok.group(2)
            if num is not None:
                code = int(num)
            else:
                table[code] = _AGL.get(name.decode("latin-1"), "�")
                code += 1
        if table:
            diffs_by_obj[int(m.group(1))] = table
    if not diffs_by_obj:
        return {}
    fonts: dict[bytes, dict[int, str]] = {}
    for rm in _FONT_RES_B.finditer(raw):
        for ref in _FONT_REF_B.finditer(rm.group(1)):
            objnum = int(ref.group(2))
            if objnum in diffs_by_obj:
                fonts[ref.group(1)] = diffs_by_obj[objnum]
    return fonts


def _decode_codes(raw: bytes, diffmap: dict[int, str] | None) -> str:
    """Show-string bytes -> text under the active simple-font encoding:
    remapped codes through the Differences table, everything else latin-1
    identity (StandardEncoding agrees with latin-1 on printable ASCII)."""
    if not diffmap:
        return raw.decode("latin-1")
    return "".join(diffmap.get(b, chr(b)) for b in raw)


def _hex_bytes_text(hexpart: bytes,
                    diffmap: dict[int, str] | None = None) -> str:
    """Byte-path twin of _hex_text: strip whitespace, pad an odd digit count
    with a trailing 0 (PDF §7.3.4.3), then decode through the active font's
    Differences table if any, else latin-1 — matching literal strings — or
    UTF-16BE when a FEFF BOM leads (decoded with 'replace' so a truncated
    surrogate cannot raise; Java's String(bytes, charset) does the same
    U+FFFD substitution on the expression path)."""
    h = b"".join(hexpart.split())
    if len(h) % 2:
        h += b"0"
    raw = bytes.fromhex(h.decode("ascii"))
    if diffmap:
        return _decode_codes(raw, diffmap)
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace")
    return raw.decode("latin-1")


def _op_text_bytes(op: bytes, diffmap: dict[int, str] | None = None) -> str:
    """One show operator (bytes) -> shown text; exact mirror of the
    expression path's _op_text/_elem_text, plus the active simple-font
    encoding (``diffmap``). Never raises on a _SHOW_OP match: every
    alternative's decode path is total (latin-1/replace decoding, odd-hex
    padding)."""
    if op.startswith(b"["):
        parts: list[str] = []
        for e in _TJ_ELEM_B.finditer(op):
            tok = e.group(0)
            if tok.startswith(b"("):
                parts.append(_decode_codes(_unescape_raw(_STR_B.match(tok).group(1)), diffmap))
            elif tok.startswith(b"<"):
                parts.append(_hex_bytes_text(tok[1:-1], diffmap))
            elif float(tok.decode("ascii")) <= TJ_SPACE_KERN:
                parts.append(" ")
        return "".join(parts)
    if op.startswith(b"<"):
        return _hex_bytes_text(op[: op.index(b">")][1:], diffmap)
    return _decode_codes(_unescape_raw(_STR_B.match(op).group(1)), diffmap)


#: one alternation walking a text block in order: font selections (Tf) and
#: show operators — the Tf operand is how simple-font /Differences encodings
#: switch on and off mid-stream
_TF_SHOW_B = _re.compile(
    rb"/(?P<font>[A-Za-z0-9]+)\s+-?[\d.]+\s+Tf|(?P<show>"
    + _SHOW_OP.encode("ascii").replace(b"(?s)", b"", 1) + rb")",
    _re.S,
)


def extract_pdf_bytes(raw: bytes) -> str:
    """Full byte-level PDF text extraction: walk every stream object, inflate
    /FlateDecode streams with zlib (stdlib — this is a DECODE step like
    drf.decode, so it lives on the Python side of the pipeline), then parse
    show operators (Tj literal/hex, TJ kerned arrays) exactly like the
    relational expression path — tracking the active font (Tf) so simple
    fonts with an /Encoding /Differences array decode through their glyph
    table (_parse_font_encodings). The text font is graphics state, so the
    active font persists across BT blocks and stream boundaries."""
    import zlib  # noqa: PLC0415

    fonts = _parse_font_encodings(raw)
    diffmap: dict[int, str] | None = None
    runs: list[str] = []
    for m in _STREAM_RE.finditer(raw):
        head, body = m.group(1), m.group(2)
        ln = _LENGTH_RE.search(head)
        if ln is not None:  # exact byte count beats EOL-sniffing the end —
            # but only when it actually lands on the endstream keyword
            # (a wrong/placeholder /Length falls back to the regex body)
            end = m.start(2) + int(ln.group(1))
            if raw[end : end + 12].lstrip(b"\r\n").startswith(b"endstream"):
                body = raw[m.start(2) : end]
        if b"/FlateDecode" in head:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue  # corrupt stream: skip, never throw (error-as-value)
        for block in _BT_ET_B.finditer(body):
            if fonts:
                for t in _TF_SHOW_B.finditer(block.group(1)):
                    if t.group("font") is not None:
                        diffmap = fonts.get(t.group("font"))
                    else:
                        runs.append(_op_text_bytes(t.group("show"), diffmap))
            else:  # no Differences-encoded fonts: skip the Tf state machine
                for op in _SHOW_OP_B.finditer(block.group(1)):
                    runs.append(_op_text_bytes(op.group(0)))
    return "\n".join(runs)


def pdf_pages_text(pages: DataFrame, *, payload_col: str = "html",
                   id_col: str = "url") -> DataFrame:
    """Distributed byte-level extraction over (url, pdf binary) rows —
    handles compressed AND uncompressed streams. One vectorized pandas pass
    (per-row zlib inflate is C-speed; regex parse per document).

    Errors are VALUES: a malformed payload yields (text_out NULL, error set)
    — same contract as pipeline.extract_any — because one bad document must
    never kill a 10^12-row job."""
    from collections.abc import Iterator  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts: list[str | None] = []
            errors: list[str | None] = []
            for b in pdf[payload_col]:
                try:
                    texts.append(extract_pdf_bytes(bytes(b)))
                    errors.append(None)
                except Exception as exc:  # corrupt container: error-as-value
                    texts.append(None)
                    errors.append(str(exc))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "text_out": texts, "error": errors},
                columns=[id_col, "text_out", "error"],
            )

    return pages.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} string, text_out string, error string"
    )
