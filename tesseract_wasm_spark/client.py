"""OCRClient — async mirror of OCREngine (reference: src/ocr-client.ts:53-263).

The reference offloads the engine to a Web Worker / node worker_thread behind
comlink RPC so the main thread never blocks (README.md:48-53), with progress
on a dedicated channel (ocr-client.ts:82-107). The Python analog runs the
engine in a worker thread behind concurrent.futures, preserving the API shape
(every method returns immediately with a Future) and the out-of-band progress
callback. The *distributed* offload is pipeline.ocr_pages — this class exists
for API-parity and single-page interactive use.
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import Future, ThreadPoolExecutor

from tesseract_wasm_spark.api import OCREngine


class OCRClient:
    """Single-worker async facade; methods execute in engine-call order on a
    dedicated thread (the reference's worker has the same serial semantics)."""

    def __init__(self) -> None:
        self._pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="ocr-worker")
        self._engine = OCREngine()

    def _submit(self, fn, *args) -> Future:
        return self._pool.submit(fn, *args)

    # --- API mirror (reference: ocr-client.ts loadModel/loadImage/getText/
    # getTextBoxes/getBoundingBoxes/getOrientation/getHOCR/clearImage/destroy)
    def loadModel(self, model: bytes) -> Future:
        return self._submit(self._engine.loadModel, model)

    def loadImage(self, image) -> Future:
        return self._submit(self._engine.loadImage, image)

    def getText(self, on_progress: Callable[[int], None] | None = None) -> Future:
        return self._submit(self._engine.getText, on_progress)

    def getTextBoxes(self, unit: str, on_progress=None) -> Future:
        return self._submit(self._engine.getTextBoxes, unit, on_progress)

    def getBoundingBoxes(self, unit: str) -> Future:
        return self._submit(self._engine.getBoundingBoxes, unit)

    def getOrientation(self) -> Future:
        return self._submit(self._engine.getOrientation)

    def getHOCR(self, on_progress=None) -> Future:
        return self._submit(self._engine.getHOCR, on_progress)

    def clearImage(self) -> Future:
        return self._submit(self._engine.clearImage)

    def destroy(self) -> None:
        """Terminate the worker (reference: ocr-client.ts:117-120)."""
        self._pool.shutdown(wait=True)
