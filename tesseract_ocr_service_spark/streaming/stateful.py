"""Custom STATEFUL streaming operators over the pages stream.

Two canonical training-data shapes the stateless ingest can't express:

- :func:`streaming_first_seen` — cross-epoch streaming dedup via
  ``applyInPandasWithState``: per-key (url by default) GroupState
  remembers whether the key was ever emitted; only the FIRST occurrence
  across the whole stream lifetime flows downstream. This is the
  streaming twin of ``dedup.dedup_exact`` — at 10^12 urls the state
  store shards by key exactly like the batch digest shuffle, and the
  checkpoint makes the "seen" set survive restarts.
- :func:`windowed_lang_counts` — event-time windowed aggregation with a
  WATERMARK: per (1-day window, lang) page counts, late rows beyond the
  watermark dropped; ``append`` output emits a window only once it can
  no longer change — the streaming lineage-counters analog
  (reference logs per-request counters, ocr_processor.py:463-475; here
  they accumulate per event-time day under late-data discipline).

Both are driven by the same parquet file-source as streaming/ingest.py
(``trigger(availableNow=True)`` drains and stops, so batch tests replay
them deterministically). No DuckDB oracle entries: custom stateful
streaming is the documented non-SQL-expressible exemption — the pytest
suite pins cross-wave semantics instead.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

FIRST_SEEN_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("n_dupes_dropped", IntegerType(), False),
    ]
)

#: per-key state: how many occurrences have been observed so far.
_STATE_SCHEMA = StructType([StructField("seen", IntegerType(), False)])


def _first_seen_fn(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen = state.get[0] if state.exists else 0
    first_row = None
    n_new = 0
    for pdf in batches:
        if seen == 0 and first_row is None and len(pdf):
            first_row = pdf.iloc[0]
        n_new += len(pdf)
    state.update((seen + n_new,))
    if seen == 0 and first_row is not None:
        # duplicates observed in the SAME burst are counted right here;
        # later-epoch repeats only bump the state counter.
        yield pd.DataFrame(
            {
                "url": [key[0]],
                "warc_ts": [first_row["warc_ts"]],
                "n_dupes_dropped": [n_new - 1],
            }
        )


def streaming_first_seen(pages_stream: DataFrame) -> DataFrame:
    """First occurrence per url across the stream's lifetime (state
    survives epochs via the checkpoint). -> (url, warc_ts,
    n_dupes_dropped-within-first-burst)."""
    return (
        pages_stream.select("url", "warc_ts")
        .groupBy("url")
        .applyInPandasWithState(
            _first_seen_fn,
            outputStructType=FIRST_SEEN_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def windowed_lang_counts(
    pages_stream: DataFrame, late: str = "1 day"
) -> DataFrame:
    """Watermarked event-time aggregation: pages per (1-day window,
    lang); rows later than ``late`` past the max seen warc_ts are
    dropped, and append mode finalizes each window exactly once."""
    return (
        pages_stream.withWatermark("warc_ts", late)
        .groupBy(F.window("warc_ts", "1 day").alias("w"), F.col("lang"))
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("day_start"),
            "lang",
            "n_pages",
        )
    )
