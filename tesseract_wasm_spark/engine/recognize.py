"""P5/P6 — glyph sequence recognition with per-word confidence.

Plays the role of the reference's LSTM line recognizer + CTC decode
(reference: src/lib.cpp:325-336 Recognize; LSTM-only because the legacy engine
is compiled out, Makefile:108 -DDISABLED_LEGACY_ENGINE=ON). The environment has
no trained model, so recognition inverts the project's own deterministic font
(font.py): each word is sliced into fixed-advance glyph cells aligned to the
line baseline and matched against the full template set in one batched matmul
(numpy BLAS — the analog of the reference's SIMD dot-product path,
src/tesseract-init.js:30-39 ENV.DOTPRODUCT="sse").

Fully vectorized: cell extraction is a strided reshape per word (no per-glyph
Python), matching is one [n_cells, n_templates] matmul per page, and the
decode (exact / partial / replacement) is numpy select logic.

Confidence semantics follow the reference: a score in [0, 1] per word
(reference converts Tesseract's percentage via ``Confidence(level) * 0.01`` —
src/lib.cpp:302-304). An exact template match scores 1.0; otherwise the best
template's Jaccard overlap is used (and the replacement char is emitted when
overlap < 0.5), so garbage input degrades gracefully instead of failing.
"""

from __future__ import annotations

import numpy as np

from tesseract_wasm_spark.engine.segment import Line
from tesseract_wasm_spark.font import (
    ADV,
    BASELINE_ROW,
    CELL_H,
    CELL_W,
    REPLACEMENT_CHAR,
    template_matrix,
)

MIN_PARTIAL_OVERLAP = 0.5

_F32_CACHE: dict[tuple, tuple] = {}


def _filtered_templates(whitelist: str | None, lang: str = "eng"):
    """(templates, chars) for the language model, restricted to a whitelist
    (P11: the behavioral effect of ``tessedit_char_whitelist`` — Tesseract
    only ever emits whitelisted characters; reference exposes the variable
    through setVariable, src/lib.cpp:150-170). Empty/None = unrestricted; a
    whitelist that matches no font glyph falls back to unrestricted."""
    templates, chars = template_matrix(lang)
    if not whitelist:
        return templates, chars
    allowed = set(whitelist)
    idx = [i for i, c in enumerate(chars) if c in allowed]
    if not idx:
        return templates, chars
    return templates[idx], "".join(chars[i] for i in idx)


def _templates_f32(whitelist: str | None = None, lang: str = "eng"):
    """Cached float32 template matrix + ink sums (avoid per-page astype)."""
    key = ("t", whitelist or "", lang)
    if key not in _F32_CACHE:
        templates, chars = _filtered_templates(whitelist, lang)
        t = templates.astype(np.float32)
        _F32_CACHE[key] = (t, t.sum(axis=1), np.frombuffer(chars.encode("latin-1"), dtype=np.uint8))
    return _F32_CACHE[key]


def _pack_keys(bits: np.ndarray) -> np.ndarray:
    """bool[N, CELL_H*CELL_W] -> uint64[N]: the 55-bit cell bitmap as one
    integer key (packbits zero-pads to 56 bits, consistently on both sides)."""
    packed = np.packbits(bits, axis=1)  # [N, 7] uint8
    out = np.zeros((bits.shape[0], 8), dtype=np.uint8)
    out[:, :7] = packed
    return out.view(">u8")[:, 0]


def _template_keys(whitelist: str | None = None, lang: str = "eng"):
    """Cached (sorted template keys, chars in key order) for the exact-match
    fast path: recognizing a clean page is one packbits + one searchsorted,
    no dense matmul (the analog of the reference's beam-search early exit)."""
    key = ("k", whitelist or "", lang)
    if key not in _F32_CACHE:
        templates, chars = _filtered_templates(whitelist, lang)
        keys = _pack_keys(templates)
        order = np.argsort(keys)
        _F32_CACHE[key] = (
            keys[order],
            np.frombuffer(chars.encode("latin-1"), dtype=np.uint8)[order],
        )
    return _F32_CACHE[key]


def _extract_cells(mask: np.ndarray, lines: list[Line]) -> tuple[np.ndarray, list[tuple[int, int, int]]]:
    """Slice every word of every line into glyph cells.

    Returns (cells [N, CELL_H*CELL_W] bool, index [(line_i, word_i, n_cells)]).
    Cells are aligned vertically by the line baseline: rows
    [baseline - BASELINE_ROW, baseline + (CELL_H - 1 - BASELINE_ROW)].
    """
    h, w = mask.shape
    blocks: list[np.ndarray] = []
    index: list[tuple[int, int, int]] = []
    for li, line in enumerate(lines):
        if not line.words:
            continue
        r0 = line.baseline - BASELINE_ROW
        r1 = r0 + CELL_H
        sr0, sr1 = max(r0, 0), min(r1, h)
        anchors = np.fromiter(
            ((wd.pen_left if wd.pen_left >= 0 else wd.left) for wd in line.words),
            dtype=np.int64, count=len(line.words),
        )
        rights = np.fromiter((wd.right for wd in line.words), dtype=np.int64,
                             count=len(line.words))
        ns = np.maximum(1, -(-(rights - anchors + 1) // ADV))  # cells per word
        spans = ns * ADV
        # one gather per line: column index of every cell-column of every word
        offsets = np.repeat(np.cumsum(spans) - spans, spans)
        cols = np.arange(spans.sum()) - offsets + np.repeat(anchors, spans)
        valid = (cols >= 0) & (cols < w)
        cols_c = np.clip(cols, 0, w - 1)
        full = np.zeros((CELL_H, cols.size), dtype=bool)
        if sr0 < sr1:
            full[sr0 - r0 : sr1 - r0, :] = mask[sr0:sr1][:, cols_c]
        full[:, ~valid] = False
        total = int(ns.sum())
        # row-major reshape splits the gathered band into ADV-wide chunks;
        # dropping the spacer column yields the glyph cells in word order
        cells = full.reshape(CELL_H, total, ADV)[:, :, :CELL_W]
        blocks.append(cells.transpose(1, 0, 2).reshape(total, CELL_H * CELL_W))
        index.extend((li, wi, int(n)) for wi, n in enumerate(ns))
    if not index:
        return np.zeros((0, CELL_H * CELL_W), dtype=bool), index
    return np.concatenate(blocks), index


def recognize_words(mask: np.ndarray, lines: list[Line], *,
                    whitelist: str | None = None,
                    min_partial_overlap: float = MIN_PARTIAL_OVERLAP,
                    lang: str = "eng",
                    ) -> list[list[tuple[str, float]]]:
    """Per line, per word: (text, confidence). Batched over the whole page.

    ``whitelist`` restricts the emit alphabet (tessedit_char_whitelist);
    ``min_partial_overlap`` is the replacement-char threshold
    (twspark_min_partial_overlap); ``lang`` selects the glyph model (S4 —
    the reference hardcodes "eng", src/lib.cpp:138; the Spark pipeline
    dispatches per row)."""
    cells_bool, index = _extract_cells(mask, lines)
    results: list[list[tuple[str, float]]] = [[] for _ in lines]
    if len(index) == 0:
        return results

    # fast path: bitpacked exact match (covers every cell on clean pages)
    tkeys, tchars = _template_keys(whitelist, lang)
    keys = _pack_keys(cells_bool)
    pos = np.searchsorted(tkeys, keys)
    pos_c = np.minimum(pos, len(tkeys) - 1)
    exact = tkeys[pos_c] == keys
    n = cells_bool.shape[0]
    conf = exact.astype(np.float64)
    chars_arr = tchars[pos_c]  # valid where exact
    use_repl = np.zeros(n, dtype=bool)

    miss = np.flatnonzero(~exact)
    if miss.size:
        # slow path (garbage/degraded cells only): nearest template by
        # Hamming distance via one small matmul, Jaccard confidence
        t, tmpl_ink, chars_bytes = _templates_f32(whitelist, lang)  # [G, P]
        sub = cells_bool[miss].astype(np.float32)
        inter = sub @ t.T  # [M, G]
        cell_ink = sub.sum(axis=1)
        union = cell_ink[:, None] + tmpl_ink[None, :] - inter
        hamming = union - inter
        rows = np.arange(miss.size)
        best = np.argmin(hamming, axis=1)
        jacc = inter[rows, best] / np.maximum(union[rows, best], 1e-9)
        no_ink = cell_ink == 0
        conf[miss] = np.where(no_ink, 0.0, jacc)
        chars_arr[miss] = chars_bytes[best]
        use_repl[miss] = no_ink | (jacc < min_partial_overlap)

    # bulk decode: slice one latin-1 string per word; per-word confidence via
    # segmented reduceat (no per-cell Python in the common all-exact case)
    lens = np.fromiter((k for _, _, k in index), dtype=np.int64, count=len(index))
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    word_conf = np.add.reduceat(conf, starts) / lens
    word_has_repl = np.add.reduceat(use_repl.astype(np.int64), starts) > 0
    word_has_miss = np.add.reduceat((~exact).astype(np.int64), starts) > 0
    all_chars = chars_arr.tobytes().decode("latin-1")
    retry_lines: set[int] = set()
    for w, (li, wi, k) in enumerate(index):
        s, e = starts[w], starts[w] + k
        if word_has_miss[w]:
            retry_lines.add(li)
        if word_has_repl[w]:
            text = "".join(
                REPLACEMENT_CHAR if use_repl[i] else all_chars[i] for i in range(s, e)
            )
        else:
            text = all_chars[s:e]
        results[li].append((text, float(word_conf[w])))

    # baseline-correction retry: a line whose glyphs are ALL descenders has no
    # baseline-row bottoms, so segment() anchors DESC_ROWS too low; the font is
    # shift-unique (font.glyph_table), so the misalignment shows up as
    # unmatched cells rather than wrong text. Retry those lines 3 rows up and
    # accept only a perfect match.
    from tesseract_wasm_spark.engine.segment import DESC_ROWS  # noqa: PLC0415

    for li in retry_lines:
        line = lines[li]
        fixed = Line(
            top=line.top, bottom=line.bottom,
            baseline=line.baseline - DESC_ROWS, words=line.words,
        )
        cells2, idx2 = _extract_cells(mask, [fixed])
        keys2 = _pack_keys(cells2)
        pos2 = np.minimum(np.searchsorted(tkeys, keys2), len(tkeys) - 1)
        if not (tkeys[pos2] == keys2).all():
            continue
        decoded = tchars[pos2].tobytes().decode("latin-1")
        out = []
        p = 0
        for _, _, k in idx2:
            out.append((decoded[p : p + k], 1.0))
            p += k
        results[li] = out
        line.baseline -= DESC_ROWS
    return results
