"""Driver-gate emulation: every oracle-checked queries() entry must match its
DuckDB oracle at sf0.001 (row count + columns + order-insensitive values).
This is the same comparison the driver runs at sf0.01."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v) -> str:
    import datetime as dt

    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, dt.datetime):
        return v.isoformat()
    return str(v)


def _canon(rows, cols):
    cs = sorted(cols)
    return sorted("|".join(_norm(r[c]) for c in cs) for r in rows)


#: entries whose oracle reads a golden snapshot generated at the DRIVER's
#: gate SF (0.01) — their parity only holds against the sf0.01 tables
#: (tools/make_goldens.py regenerates; the driver always compares at sf0.01)
SF_LOCKED = {"dedup_simhash", "sim_srp_pairs", "ann_ivf"}
SF_LOCKED_DIR = "/root/testdata/sf0.01"


def _make_duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def duck():
    return _make_duck(SF_DIR)


@pytest.fixture(scope="module")
def duck_gate():
    return _make_duck(SF_LOCKED_DIR)


def _oracle_cases():
    from tesseract_wasm_spark.queries import REGISTRY

    return [name for name, (_, sql) in REGISTRY.items() if sql is not None]


def test_no_complex_output_columns(spark):
    """Driver-harness contract (round-3 judge finding): the driver's oracle
    canonicalizer sorts query output with pandas, which cannot factorize
    list/struct values — so EVERY queries() entry must emit only
    scalar/sortable columns. Guard the whole registry, not just the one
    entry that broke (html_block_langs, CORRECTNESS_r03)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from tesseract_wasm_spark.queries import REGISTRY

    offenders = []
    for name, (fn, _) in REGISTRY.items():
        sf_dir = SF_LOCKED_DIR if name in SF_LOCKED else SF_DIR
        schema = fn(spark, sf_dir).schema
        for field in schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{field.name}: {field.dataType}")
    assert offenders == []


@pytest.mark.parametrize("name", _oracle_cases())
def test_oracle_parity(spark, duck, duck_gate, name):
    from tesseract_wasm_spark.queries import REGISTRY

    fn, sql = REGISTRY[name]
    sf_dir, con = (SF_LOCKED_DIR, duck_gate) if name in SF_LOCKED else (SF_DIR, duck)
    sdf = fn(spark, sf_dir)
    srows = [r.asDict() for r in sdf.collect()]
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = [dict(zip(dcols, row)) for row in res.fetchall()]
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)
