"""Explicit Spark schemas for every table the engine reads or writes.

The reference fixes its shapes with Pydantic/dataclasses
(``ocr/schemas.py:22-294``); here every DataFrame boundary carries an
explicit ``StructType`` — never ``inferSchema`` (SURVEY.md §1.3).

Type mapping notes (SURVEY.md §1.2):
- bbox is a Struct, not a Map (Maps are awkward across Arrow/pandas).
- ``conf`` is int (``ocr/schemas.py:197-202``); word conf is clamped to 0
  when negative (``ocr_processor.py:215``).
- ``doc_id`` == ``url``: the reference keys spans by uuid4
  (``coordinates_store.py:40``) which is nondeterministic; byte-identical
  replay requires the deterministic primary key ``url`` (intentional,
  documented contract delta).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------- input

#: Common-Crawl-style input table (BASELINE.json input_hint).
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),  # noise column — never read
        StructField("lang", StringType(), True),
    ]
)

# ------------------------------------------------------------- outputs

#: bbox envelope — {left, top, right, bottom} (ocr/schemas.py:221,239,257).
BBOX = StructType(
    [
        StructField("left", IntegerType(), False),
        StructField("top", IntegerType(), False),
        StructField("right", IntegerType(), False),
        StructField("bottom", IntegerType(), False),
    ]
)

#: Word -> Line -> Paragraph -> Block -> Page hierarchy
#: (ocr/schemas.py:181-294; JSON shape at ocr/main.py:244-298).
WORD = StructType(
    [
        StructField("text", StringType(), False),
        StructField("left", IntegerType(), False),
        StructField("top", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("conf", IntegerType(), False),
    ]
)

LINE = StructType(
    [
        StructField("line_id", IntegerType(), False),
        StructField("text", StringType(), False),
        StructField("bbox", BBOX, False),
        StructField("words", ArrayType(WORD), False),
    ]
)

PARAGRAPH = StructType(
    [
        StructField("par_id", IntegerType(), False),
        StructField("bbox", BBOX, False),
        StructField("lines", ArrayType(LINE), False),
    ]
)

BLOCK = StructType(
    [
        StructField("block_id", IntegerType(), False),
        StructField("bbox", BBOX, False),
        StructField("paragraphs", ArrayType(PARAGRAPH), False),
    ]
)

PAGE_SPANS = StructType(
    [
        StructField("page_number", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("blocks", ArrayType(BLOCK), False),
    ]
)

#: per-page result (mirrors PageResult, ocr/schemas.py:58-80).
PAGE_RESULT = StructType(
    [
        StructField("page_number", IntegerType(), False),
        StructField("text", StringType(), False),
        StructField("confidence", DoubleType(), False),
        StructField("rotation_applied", IntegerType(), False),
        StructField("deskew_angle", DoubleType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
    ]
)

#: Single wide row per document out of the fused kernel; the pipeline
#: projects `extracted` / `spans` / lineage counters from it.
EXTRACTED_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("lang", StringType(), True),
        StructField("status", StringType(), False),
        StructField("error", StringType(), True),
        StructField("total_pages", IntegerType(), False),
        StructField("avg_confidence", DoubleType(), False),
        StructField("canonical_text", StringType(), False),
        StructField("pages", ArrayType(PAGE_RESULT), False),
        StructField("spans", ArrayType(PAGE_SPANS), False),
        # per-doc counters -> aggregated into the lineage table
        StructField("n_blocks_kept", IntegerType(), False),
        StructField("n_blocks_dropped", IntegerType(), False),
        StructField("n_words", IntegerType(), False),
        StructField("n_chars", IntegerType(), False),
    ]
)

#: lineage table — per-partition counters (the reference logs these per
#: request at ocr_processor.py:463-475,512-527; we persist them).
LINEAGE_SCHEMA = StructType(
    [
        StructField("warc_day", StringType(), False),
        StructField("n_docs", LongType(), False),
        StructField("n_ok", LongType(), False),
        StructField("n_rejected", LongType(), False),
        StructField("n_error", LongType(), False),
        StructField("n_empty", LongType(), False),
        StructField("n_pages", LongType(), False),
        StructField("n_blocks_kept", LongType(), False),
        StructField("n_blocks_dropped", LongType(), False),
        StructField("n_words", LongType(), False),
        StructField("n_chars", LongType(), False),
        StructField("wall_ms", LongType(), False),
        StructField("attempt", IntegerType(), False),
    ]
)

#: flat word-record intermediate (kernel-internal, unit-test surface;
#: FIXTURES.md §3). Matches Tesseract's image_to_data columnar dict keys
#: used by the reference: text, conf, block_num, par_num, line_num, left,
#: top, width, height (ocr_processor.py:72-77,136-153,199-226).
WORD_RECORDS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("page_number", IntegerType(), False),
        StructField("block_num", IntegerType(), False),
        StructField("par_num", IntegerType(), False),
        StructField("line_num", IntegerType(), False),
        StructField("word_num", IntegerType(), False),
        StructField("text", StringType(), False),
        StructField("left", IntegerType(), False),
        StructField("top", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("conf", IntegerType(), False),
    ]
)
