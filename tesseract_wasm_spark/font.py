"""Deterministic bitmap glyph font for the synthetic page corpus.

The reference OCR engine recognizes glyphs rendered by real-world fonts via a
trained LSTM (reference: src/lib.cpp:325-336 ``Recognize``). This environment
has no trained model or image codecs, so the project's byte-identity contract
(BASELINE.json: "byte-identical extracted text per url") is held against pages
rendered by *this* font: rendering is a pure function of (text, layout params),
and the recognizer inverts it exactly.

Font geometry (all glyphs monospace):
  - cell: CELL_W x CELL_H = 5 x 11 pixels of ink area, advance ADV = 6
    (one guaranteed-blank column between adjacent glyphs, so connected
    components never merge across glyphs).
  - vertical classes mirror Latin typography so that orientation detection
    (ascender/descender asymmetry — reference src/lib.cpp:242-288, based on
    Leptonica pixOrientDetect) has real signal:
      * capitals / digits / most symbols: rows 0..7  (ascender region + x-height)
      * lowercase x-height:               rows 3..7
      * lowercase ascenders (bdfhklt):    rows 0..7
      * lowercase descenders (gjpqy):     rows 3..10
    Baseline sits at the bottom edge of row BASELINE_ROW = 7.
  - every glyph is a single 4-connected component, has ink in column 0 of its
    cell (so a word's ink-left equals its pen position) and ink in the top and
    bottom row of its class range (so component bottoms identify the baseline).

Glyph ink patterns are derived from SHA-256 of the character (salted on the
rare collision), grown as a connected region from a left-column spine — fully
deterministic, no randomness at run time, and verified unique in tests.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np

CELL_W = 5
CELL_H = 11
ADV = CELL_W + 1  # glyph advance in px; column CELL_W of each cell is blank
BASELINE_ROW = 7  # ink rows 0..7 above/at baseline; 8..10 are descender rows
ASC_TOP = 0
XHEIGHT_TOP = 3
DESC_BOTTOM = CELL_H - 1

_LOWER_ASC = set("bdfhkltß")  # ß has a b-like ascender
_LOWER_DESC = set("gjpqy")
_UMLAUT_LOWER = set("äöü")  # diaeresis reaches the ascender band

#: Characters the font (and therefore the recognizer) supports.
PRINTABLE = "".join(chr(c) for c in range(32, 127))

#: Per-language character sets — the S4 model axis (SURVEY §2.1: the
#: reference hardcodes "eng", src/lib.cpp:138; the Spark pipeline dispatches
#: the model by each row's ``lang`` column). All charsets stay within
#: latin-1 so the recognizer's uint8 decode path holds.
LANG_CHARSETS: dict[str, str] = {
    "eng": PRINTABLE,
    "deu": PRINTABLE + "äöüÄÖÜß",
}
DEFAULT_LANG = "eng"

#: Emitted for an observed glyph cell that matches no template (can only
#: happen on non-font input such as rotated pages); mirrors Unicode U+FFFD.
REPLACEMENT_CHAR = "�"


def _class_range(ch: str) -> tuple[int, int]:
    """(top_row, bottom_row) inclusive of the glyph's ink within its cell."""
    if ch.isupper() or ch.isdigit():
        return ASC_TOP, BASELINE_ROW
    if ch.islower():
        if ch in _LOWER_DESC:
            return XHEIGHT_TOP, DESC_BOTTOM
        if ch in _LOWER_ASC or ch in _UMLAUT_LOWER:
            return ASC_TOP, BASELINE_ROW
        return XHEIGHT_TOP, BASELINE_ROW
    # punctuation / symbols: full ascender range keeps them visually distinct
    return ASC_TOP, BASELINE_ROW


def _grow_glyph(ch: str, salt: int) -> np.ndarray:
    """Deterministic connected ink pattern for one glyph.

    Start from a full-height spine in column 0 of the class range, then keep
    the hash-selected pixels that are 4-connected to the spine.
    """
    top, bottom = _class_range(ch)
    h = bottom - top + 1
    digest = hashlib.sha256(f"glyph:{ch}:{salt}".encode()).digest()
    bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))
    # candidate ink: spine col 0 always on; cols 1..CELL_W-1 from hash bits
    cand = np.zeros((h, CELL_W), dtype=bool)
    cand[:, 0] = True
    need = h * (CELL_W - 1)
    body = bits[:need].astype(bool).reshape(h, CELL_W - 1)
    cand[:, 1:] = body
    # flood from the spine, 4-connectivity, keep only reachable ink
    keep = np.zeros_like(cand)
    keep[:, 0] = True
    frontier = keep.copy()
    while frontier.any():
        nxt = np.zeros_like(keep)
        nxt[1:, :] |= frontier[:-1, :]
        nxt[:-1, :] |= frontier[1:, :]
        nxt[:, 1:] |= frontier[:, :-1]
        nxt[:, :-1] |= frontier[:, 1:]
        nxt &= cand & ~keep
        keep |= nxt
        frontier = nxt
    cell = np.zeros((CELL_H, CELL_W), dtype=bool)
    cell[top : bottom + 1, :] = keep
    return cell


def _shifted(cell: np.ndarray, dy: int) -> np.ndarray:
    out = np.zeros_like(cell)
    if dy > 0:
        out[dy:, :] = cell[:-dy, :]
    elif dy < 0:
        out[:dy, :] = cell[-dy:, :]
    else:
        out = cell
    return out


@lru_cache(maxsize=None)
def glyph_table(lang: str = DEFAULT_LANG) -> dict[str, np.ndarray]:
    """char -> CELL_H x CELL_W bool ink bitmap for the given language model.

    Uniqueness is enforced not just in place but under vertical shifts of
    +-DESC rows (3): an all-descender line offers no non-descender bottoms to
    anchor the baseline, so its glyphs may be matched 3 rows off — shift
    uniqueness guarantees such a misalignment can never silently match the
    wrong template (the recognizer then retries the corrected baseline).
    The ASCII subset is shared across languages (same salt-0-first growth
    order), so 'deu' extends 'eng' with umlaut/eszett glyphs that are unique
    against the full extended set."""
    desc = DESC_BOTTOM - BASELINE_ROW
    table: dict[str, np.ndarray] = {}
    seen: set[bytes] = set()
    for ch in LANG_CHARSETS[lang]:
        if ch == " ":
            continue
        salt = 0
        while True:
            cell = _grow_glyph(ch, salt)
            variants = [_shifted(cell, dy).tobytes() for dy in (-desc, 0, desc)]
            if not any(v in seen for v in variants):
                seen.update(variants)
                table[ch] = cell
                break
            salt += 1
    return table


@lru_cache(maxsize=None)
def template_matrix(lang: str = DEFAULT_LANG) -> tuple[np.ndarray, str]:
    """(T, chars): T is [n_glyphs, CELL_H*CELL_W] bool, row i = chars[i].

    Used by the recognizer for batched exact/nearest matching via matmul.
    """
    table = glyph_table(lang)
    chars = "".join(table.keys())
    mat = np.stack([table[c].reshape(-1) for c in chars])
    return mat, chars


# --- model blob (the .traineddata analog) ----------------------------------

MODEL_MAGIC = b"TWSM1"


def _model_digest(lang: str) -> bytes:
    """Checksum of the language's full glyph table — the blob's integrity
    seal (a truncated/garbage blob must fail to load, like the reference's
    traineddata validation)."""
    table = glyph_table(lang)
    h = hashlib.sha256()
    for ch in sorted(table):
        h.update(ch.encode("utf-8"))
        h.update(table[ch].tobytes())
    return h.digest()


def export_model(lang: str = DEFAULT_LANG) -> bytes:
    """Serialize the language model as a validated blob — the project's
    .traineddata analog (the reference ships eng.traineddata bytes into
    loadModel, src/ocr-engine.ts:152-165). Layout: magic | lang-length |
    lang utf-8 | sha256(glyph table). The glyph bitmaps themselves are a
    pure function of (lang), so the blob carries identity + integrity, and
    at cluster scale it is what a Spark broadcast would carry."""
    if lang not in LANG_CHARSETS:
        raise ValueError(f"unknown language model: {lang}")
    lang_b = lang.encode("utf-8")
    return MODEL_MAGIC + bytes([len(lang_b)]) + lang_b + _model_digest(lang)


def parse_model(blob: bytes) -> str:
    """Validate a model blob and return its language key; raises ValueError
    on any malformed/garbage/corrupt input (reference: "Text recognition
    model failed to load")."""
    blob = bytes(blob)
    if len(blob) < len(MODEL_MAGIC) + 1 or blob[: len(MODEL_MAGIC)] != MODEL_MAGIC:
        raise ValueError("bad model magic")
    n = blob[len(MODEL_MAGIC)]
    off = len(MODEL_MAGIC) + 1
    lang = blob[off : off + n].decode("utf-8", errors="replace")
    if lang not in LANG_CHARSETS:
        raise ValueError(f"unknown language model: {lang}")
    digest = blob[off + n :]
    if digest != _model_digest(lang):
        raise ValueError("model checksum mismatch")
    return lang


def glyph_ink_width(ch: str, lang: str = DEFAULT_LANG) -> int:
    """Rightmost ink column + 1 (used to compute word ink widths in tests)."""
    cell = glyph_table(lang)[ch]
    cols = np.flatnonzero(cell.any(axis=0))
    return int(cols[-1]) + 1 if cols.size else 0
