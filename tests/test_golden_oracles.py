"""Golden-parquet oracle guards: every registered oracle that reads a
committed snapshot must find its file, and a DuckDB spot-check of the
ocr_lines dual derivation stays green without Spark."""

from __future__ import annotations

import re
from pathlib import Path

import duckdb

from tesseract_wasm_spark import queries as Q

GOLDEN = Path(__file__).parent / "golden" / "oracle"


def test_all_golden_files_exist():
    refs = set()
    for sql in Q.oracle_sql().values():
        refs.update(re.findall(r"read_parquet\('([^']+)'\)", sql))
    assert refs, "golden-backed oracles expected"
    for path in refs:
        assert Path(path).exists(), f"missing golden: {path} (run tools/make_goldens.py)"
        assert Path(path).parent == GOLDEN


def test_ocr_lines_oracle_runs_in_duckdb():
    con = duckdb.connect()
    rows = con.execute(Q.SQL_OCR_LINES).fetchall()
    assert len(rows) > 300
    cols = [d[0] for d in con.execute(Q.SQL_OCR_LINES).description]
    assert set(cols) == {
        "url", "line_id", "left", "top", "right", "bottom", "baseline",
        "block_id", "n_words", "avg_conf", "line_text",
    }


def test_simhash_oracle_runs_in_duckdb():
    con = duckdb.connect()
    rows = con.execute(Q.SQL_DEDUP_SIMHASH).fetchall()
    assert all(r[2] <= 3 for r in rows)
    assert len(rows) > 0
