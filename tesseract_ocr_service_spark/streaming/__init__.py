"""Structured Streaming surface.

The reference is strictly request/response — no watermarks, windows, or
cross-request state (`ocr/services/coordinates_store.py:8-12` is an
explicit no-persistence cache). The streaming surface of this engine is
therefore *incremental ingest*: newly-landed page files flow through the
same fused kernel exactly once (Spark's streaming file-source checkpoint
tracks processed files), which is the streaming twin of the batch
warc_day resume protocol in `plans.commit`.
"""
