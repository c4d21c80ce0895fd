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


def _make_first_seen_fn(ttl_ms: int | None):
    """State function factory; ``ttl_ms`` closes over the handler so
    applyInPandasWithState can serialize it to the workers."""

    def _first_seen_fn(
        key: Tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            # idle past the TTL: evict. The key re-admits (re-emits) if
            # it ever reappears — that's the documented recall trade.
            state.remove()
            return
        seen = state.get[0] if state.exists else 0
        first_row = None
        n_new = 0
        for pdf in batches:
            if seen == 0 and first_row is None and len(pdf):
                first_row = pdf.iloc[0]
            n_new += len(pdf)
        state.update((seen + n_new,))
        if ttl_ms is not None:
            # sliding idle-TTL: any new occurrence re-arms the clock
            state.setTimeoutDuration(ttl_ms)
        if seen == 0 and first_row is not None:
            # duplicates observed in the SAME burst are counted right
            # here; later-epoch repeats only bump the state counter.
            yield pd.DataFrame(
                {
                    "url": [key[0]],
                    "warc_ts": [first_row["warc_ts"]],
                    "n_dupes_dropped": [n_new - 1],
                }
            )

    return _first_seen_fn


def streaming_first_seen(
    pages_stream: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """First occurrence per url across the stream's lifetime (state
    survives epochs via the checkpoint). -> (url, warc_ts,
    n_dupes_dropped-within-first-burst).

    ``ttl_ms`` bounds the state store: without it the "seen" set grows
    without bound over the stream's lifetime (at 10^12 urls that is the
    whole crawl frontier held in state). With a TTL, a key idle for
    longer than ``ttl_ms`` of processing time is EVICTED
    (ProcessingTimeTimeout; timeouts fire on the next trigger after
    expiry, so an idle stream evicts lazily). RECALL TRADE, explicit:
    an evicted url that reappears later is re-emitted as if new —
    choose ttl >= the maximum plausible recrawl gap, or leave None and
    bound state some other way (e.g. periodic batch compaction of the
    output into a bloom/exact side table)."""
    return (
        pages_stream.select("url", "warc_ts")
        .groupBy("url")
        .applyInPandasWithState(
            _make_first_seen_fn(ttl_ms),
            outputStructType=FIRST_SEEN_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if ttl_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
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
