"""Font and DRF codec invariants (foundation of the byte-identity contract)."""

from __future__ import annotations

import numpy as np
import pytest

from tesseract_wasm_spark import drf
from tesseract_wasm_spark.engine.components import label_components
from tesseract_wasm_spark.font import (
    CELL_H,
    CELL_W,
    PRINTABLE,
    _class_range,
    glyph_table,
)


def test_glyphs_unique():
    table = glyph_table()
    seen = {}
    for ch, cell in table.items():
        key = cell.tobytes()
        assert key not in seen, f"{ch!r} collides with {seen.get(key)!r}"
        seen[key] = ch


def test_glyph_geometry_invariants():
    """Every glyph: ink in col 0 (word ink-left == pen position), ink in the
    top and bottom rows of its class range (baseline recovery), one single
    4-connected component (line/word clustering correctness)."""
    table = glyph_table()
    for ch, cell in table.items():
        top, bottom = _class_range(ch)
        assert cell[:, 0].any(), f"{ch!r}: no ink in column 0"
        assert cell[top].any(), f"{ch!r}: no ink in class top row"
        assert cell[bottom].any(), f"{ch!r}: no ink in class bottom row"
        assert not cell[:top].any() and not cell[bottom + 1 :].any()
        comps = label_components(cell)
        assert comps.n == 1, f"{ch!r}: {comps.n} components"


def test_all_printable_covered():
    table = glyph_table()
    for ch in PRINTABLE:
        if ch != " ":
            assert ch in table


def test_drf_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(33, 17, 4), dtype=np.uint8)
    out = drf.decode(drf.encode(img))
    assert np.array_equal(out, img)


def test_drf_error_messages_match_reference():
    # reference: test/ocr-engine-test.js:63-85 pins these exact messages
    with pytest.raises(ValueError, match="Image data length does not match width/height"):
        drf.decode(drf.encode_raw_invalid(100, 100, b"0123456789"))
    with pytest.raises(ValueError, match="Image width or height is zero"):
        drf.decode(drf.encode_raw_invalid(0, 100, b""))
    with pytest.raises(ValueError, match="Unsupported image format"):
        drf.decode(b"JUNKJUNKJUNKJUNKJUNK")
