"""Large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) — first-class components alongside the OCR
engine, per the project brief. All hot paths are built-in Spark expressions or
Arrow-batched pandas UDFs; each operator documents its 100 TB execution shape.
"""
