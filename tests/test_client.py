"""OCRClient async-mirror tests (reference: test/ocr-client-test.js:17-159 —
the engine suite re-run through the worker RPC)."""

from __future__ import annotations

import pytest

from tesseract_wasm_spark.client import OCRClient
from tesseract_wasm_spark.fixtures import SMALL_PAGE_LINES, expected_text
from tesseract_wasm_spark.raster import render_page
from tesseract_wasm_spark.font import export_model


@pytest.fixture()
def client():
    c = OCRClient()
    yield c
    c.destroy()


def test_async_text_and_boxes(client):
    client.loadModel(export_model()).result()
    client.loadImage(render_page(SMALL_PAGE_LINES)).result()
    assert client.getText().result() == expected_text(SMALL_PAGE_LINES)
    words = client.getTextBoxes("word").result()
    # join-words parity with engine (reference: test/ocr-client-test.js:61)
    joined = " ".join(w["text"] for w in words)
    assert joined == " ".join(" ".join(ln.split()) for ln in SMALL_PAGE_LINES)
    assert client.getOrientation().result() == {"rotation": 0, "confidence": 1.0}


def test_async_errors_propagate(client):
    client.loadModel(export_model()).result()
    fut = client.getText()
    with pytest.raises(ValueError, match="No image loaded"):
        fut.result()


def test_async_progress_channel(client):
    client.loadModel(export_model()).result()
    client.loadImage(render_page(["hello world"])).result()
    seen: list[int] = []
    client.getText(seen.append).result()
    assert seen == sorted(seen) and seen[-1] == 100


def test_calls_execute_in_order(client):
    # no awaiting between calls — the worker serializes them (reference
    # comlink proxy semantics)
    client.loadModel(export_model())
    client.loadImage(render_page(["ordered execution"]))
    assert client.getText().result() == "ordered execution\n"
