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


@pytest.mark.slow
def test_streaming_first_seen_dedups_across_epochs(spark, tmp_path):
    """applyInPandasWithState: a url that reappears in a later wave is
    suppressed by the checkpointed state — first occurrence only."""
    from tesseract_ocr_service_spark.streaming import ingest, stateful

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    wave1 = gen.generate_pages(spark, 50, seed=11, partitions=1)
    wave1.withColumn("warc_day", F.to_date("warc_ts")).write.mode(
        "append"
    ).partitionBy("warc_day").parquet(landing)

    def drain():
        q = (
            stateful.streaming_first_seen(ingest.stream_pages(spark, landing))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    drain()
    first = spark.read.parquet(out)
    assert first.count() == 50
    assert first.select("url").distinct().count() == 50

    # wave 2: 20 REPEAT urls + 10 new ones
    repeats = gen.generate_pages(spark, 20, seed=11, partitions=1)
    news = (
        gen.generate_pages(spark, 60, seed=11, partitions=1)
        .where(F.col("url").isin(
            [gen.doc(i, 11)["url"] for i in range(50, 60)]
        ))
    )
    for df in (repeats, news):
        df.withColumn("warc_day", F.to_date("warc_ts")).write.mode(
            "append"
        ).partitionBy("warc_day").parquet(landing)
    drain()
    after = spark.read.parquet(out)
    # only the 10 genuinely-new urls were emitted by wave 2
    assert after.count() == 60
    assert after.select("url").distinct().count() == 60


@pytest.mark.slow
def test_windowed_lang_counts_with_watermark(spark, tmp_path):
    """Watermarked windowed aggregation totals match the batch rollup
    for on-time data once the stream drains."""
    from tesseract_ocr_service_spark.streaming import ingest, stateful

    landing = str(tmp_path / "landing")
    gen.write_pages(spark, landing, 200, seed=13, partitions=2)

    q = (
        stateful.windowed_lang_counts(ingest.stream_pages(spark, landing))
        .writeStream.format("memory")
        .queryName("wlc")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (str(r["day_start"]), r["lang"]): r["n_pages"]
        for r in spark.sql("SELECT * FROM wlc").collect()
    }
    exp = {
        (str(r["day_start"]), r["lang"]): r["n"]
        for r in (
            spark.read.parquet(landing)
            .groupBy(
                F.date_trunc("day", "warc_ts").alias("day_start"), "lang"
            )
            .agg(F.count("*").alias("n"))
        ).collect()
    }
    # append mode only finalizes windows the watermark has passed; every
    # emitted window must match the batch truth, and most must emit
    assert got
    for k, v in got.items():
        assert exp.get(k) == v, (k, v, exp.get(k))
