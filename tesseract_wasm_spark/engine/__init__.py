"""Pure-numpy per-page OCR stages (the reference's "physical operators",
SURVEY.md §2.2). No Spark imports here — these run inside Arrow-batched
``mapInPandas`` workers and in fast local unit tests."""
