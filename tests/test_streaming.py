"""Incremental streaming ingest: backlog drain + exactly-once on new files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tesseract_ocr_service_spark.sources import gen
from tesseract_ocr_service_spark.streaming import ingest


@pytest.mark.slow
def test_streaming_incremental_extract(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # wave 1: 100 docs land
    gen.write_pages(spark, landing, 100, seed=21, partitions=2)
    q = ingest.start_incremental_extract(spark, landing, out, ckpt)
    q.awaitTermination(300)
    ext = spark.read.parquet(f"{out}/extracted")
    assert ext.count() == 100

    # wave 2: 60 MORE docs land in a side dir of the same landing root
    more = (
        gen.generate_pages(spark, 160, seed=21, partitions=2)
        .where(F.col("url").isin(
            [gen.doc(i, 21)["url"] for i in range(100, 160)]
        ))
        .withColumn("warc_day", F.to_date("warc_ts"))
    )
    more.write.mode("append").partitionBy("warc_day").parquet(landing)

    q = ingest.start_incremental_extract(spark, landing, out, ckpt)
    q.awaitTermination(300)
    ext = spark.read.parquet(f"{out}/extracted")
    # wave-1 files are NOT reprocessed (checkpoint), wave-2 flows once
    assert ext.count() == 160
    assert ext.select("url").distinct().count() == 160
    ok = ext.where(F.col("status") == "ok").count()
    assert ok > 100


@pytest.mark.slow
def test_epoch_sink_replay_is_idempotent(spark, tmp_path):
    """A replayed foreachBatch epoch (same epoch_id, same rows) must
    overwrite its own partitions, not append duplicates."""
    out = str(tmp_path / "out")
    batch = gen.generate_pages(spark, 40, seed=3, partitions=2)
    sink = ingest.epoch_sink(out)
    sink(batch, 7)
    first = spark.read.parquet(f"{out}/extracted").count()
    sink(batch, 7)  # crash-retry replay of the same epoch
    ext = spark.read.parquet(f"{out}/extracted")
    assert ext.count() == first == 40
    assert ext.select("url").distinct().count() == 40
    # a different epoch's output lands beside it untouched
    sink(gen.generate_pages(spark, 10, seed=4, partitions=1), 8)
    assert spark.read.parquet(f"{out}/extracted").count() == 50
