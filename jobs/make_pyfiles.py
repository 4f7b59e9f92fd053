"""Build twspark.zip for spark-submit --py-files (north-rule packaging).

The dependency closure is numpy/pandas/pyarrow only (provided by executors'
Python env), so the zip carries just this package — the analog of the
reference's dead-weight-stripped WASM bundle (Makefile:72-77, README.md:14-19).
"""

from __future__ import annotations

import pathlib
import zipfile

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = ROOT / "dist" / "twspark.zip"


def main() -> None:
    OUT.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for path in sorted((ROOT / "tesseract_wasm_spark").rglob("*.py")):
            zf.write(path, path.relative_to(ROOT))
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
