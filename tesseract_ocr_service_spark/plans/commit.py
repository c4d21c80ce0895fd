"""Idempotent, resumable, lineage-tracked extraction runs.

The reference service is stateless per request — a failed request is
simply retried by the client (``ocr/main.py:151-175``). At 10^12
documents the unit of retry must be the *partition*: this module commits
extraction output per ``warc_day`` partition with the lineage table as
the commit marker, so any failed/killed run resumes exactly at the
un-committed partitions (north_rule: "resumable from checkpoint with
per-partition lineage + metrics").

Protocol (emulating the Iceberg snapshot-commit behaviors named by the
rule, with plain parquet — no Iceberg jars offline):

1. ``pending = input warc_days - committed warc_days`` where committed =
   days present in the lineage table. This is an metadata-only anti-join
   (distinct partition values vs a tiny lineage read).
2. Process ONLY pending days; write the wide output with **dynamic
   partition overwrite** — a re-attempt replaces exactly the partitions
   it produces, never touching committed ones, and Spark's output
   committer keeps half-written files in ``_temporary`` out of reads.
3. Append per-day counter rows to ``lineage/`` LAST. A crash between
   (2) and (3) leaves the day un-committed -> step 1 reprocesses it ->
   overwrite makes the retry idempotent. Bytes in committed partitions
   are never rewritten, so re-runs are also byte-stable.

Output layout (one wide columnar table — parquet column pruning means
text-only readers never touch the fat ``spans`` pages):

    out_root/extracted/warc_day=YYYY-MM-DD/*.parquet   (EXTRACTED_SCHEMA + warc_day)
    out_root/lineage/*.parquet                          (LINEAGE_SCHEMA)
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import ExtractConfig
from ..operators import extract as X


from pyspark.accumulators import AccumulatorParam


class _DayMsParam(AccumulatorParam):
    """AccumulatorParam merging {warc_day: milliseconds} dicts — the
    executor-side collector behind lineage's per-day kernel_ms."""

    def zero(self, value):
        return {}

    def addInPlace(self, a, b):
        for k, v in b.items():
            a[k] = a.get(k, 0.0) + v
        return a


def _exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf).exists(p)


def committed_days(spark: SparkSession, out_root: str) -> set[str]:
    """Days already committed = days present in the lineage table."""
    path = f"{out_root}/lineage"
    if not _exists(spark, path):
        return set()
    return {
        r["warc_day"]
        for r in spark.read.parquet(path).select("warc_day").distinct().collect()
    }


def attempt_numbers(spark: SparkSession, out_root: str) -> dict[str, int]:
    """Driver-side {day: max attempt} — an introspection convenience;
    run_checkpointed itself joins against the lineage table instead
    (a collected dict is unbounded at real day cardinality)."""
    path = f"{out_root}/lineage"
    if not _exists(spark, path):
        return {}
    rows = (
        spark.read.parquet(path)
        .groupBy("warc_day")
        .agg(F.max("attempt").alias("a"))
        .collect()
    )
    return {r["warc_day"]: r["a"] for r in rows}


@dataclass
class RunSummary:
    pending_days: list[str]
    skipped_days: list[str]
    n_docs: int
    wall_ms: int


def run_checkpointed(
    spark: SparkSession,
    pages_path: str,
    out_root: str,
    cfg: ExtractConfig = ExtractConfig(),
    ts_from=None,
    ts_to=None,
    salt_partitions: int = 0,
    languages=None,
    source_format: str = "parquet",
    _fail_before_commit: bool = False,  # test hook: crash between data & marker
) -> RunSummary:
    """One idempotent, resumable extraction run over [ts_from, ts_to].

    NOTE: the lineage commit log is scoped to ``out_root`` and marks a
    day done under THIS job's config — a day committed by a
    language-filtered run will be skipped by later runs against the
    same out_root even with a wider filter. One output root == one
    job config; use a fresh out_root when the config changes.

    ``source_format='warc'`` reads ``.warc.gz`` archives directly
    (sources/warc.py) — the direct-from-crawl path. Its warc_day is a
    parsed column, not a directory partition, so the ts range filters
    rows but cannot prune archive files; for repeated runs over one
    crawl, stage to the partitioned parquet/Iceberg table first (one
    extraction-free pass) and run this job against that.
    """
    t0 = time.perf_counter()
    persisted = None
    if source_format == "warc":
        from pyspark import StorageLevel

        from ..sources import warc as Wsrc

        pages = Wsrc.read_warc(spark, pages_path)
        if ts_from is not None:
            pages = pages.where(F.col("warc_day") >= F.lit(str(ts_from)))
        if ts_to is not None:
            pages = pages.where(F.col("warc_day") <= F.lit(str(ts_to)))
        # the day enumeration below and the extraction write are two
        # consumers, and each consumer re-runs the whole gunzip+parse
        # (CLAUDE.md extra-consumer rule) — which for WARC is the run's
        # dominant cost. Persist for the run (spills to executor disk:
        # this IS the staging pass the docstring recommends, done
        # in-flight), release before returning.
        persisted = pages.persist(StorageLevel.MEMORY_AND_DISK)
        pages = persisted
    else:
        pages = X.read_pages(spark, pages_path, ts_from, ts_to)

    try:
        return _run_checkpointed_body(
            spark, pages, out_root, cfg, t0, salt_partitions, languages,
            _fail_before_commit,
        )
    finally:
        if persisted is not None:
            persisted.unpersist()


def _run_checkpointed_body(
    spark, pages, out_root, cfg, t0, salt_partitions, languages,
    _fail_before_commit,
) -> RunSummary:
    # ---- step 1: partition-level anti-join against the commit log ----
    input_days = sorted(
        str(r["warc_day"])
        for r in pages.select("warc_day").distinct().collect()
    )
    done = committed_days(spark, out_root)
    pending = [d for d in input_days if d not in done]
    skipped = [d for d in input_days if d in done]
    if not pending:
        return RunSummary(pending, skipped, 0, int((time.perf_counter() - t0) * 1000))

    todo = pages.where(F.col("warc_day").isin(pending))

    # ---- step 2: process + dynamic-partition-overwrite the data ------
    # per-day kernel wall collected executor-side (accumulator filled
    # by kernel_iter during the write action below)
    day_acc = spark.sparkContext.accumulator({}, _DayMsParam())
    wide = X.extract(
        todo, cfg, salt_partitions=salt_partitions, languages=languages,
        day_timer_acc=day_acc,
    )
    # warc_ts is non-null by schema contract (undated WARC records ride
    # the epoch sentinel, sources/warc.UNDATED_TS), so warc_day here is
    # always a real partition value step 1 can enumerate.
    out = wide.withColumn("warc_day", F.date_format("warc_ts", "yyyy-MM-dd"))
    (
        out.write.mode("overwrite")
        # dynamic: replace only the partitions present in this write,
        # regardless of the session-level default.
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("warc_day")
        .parquet(f"{out_root}/extracted")
    )

    if _fail_before_commit:
        raise RuntimeError("injected failure between data write and commit marker")

    # ---- step 3: append lineage rows LAST (the commit marker) --------
    # counters re-read from the just-written files: a cheap columnar
    # scan of the counter columns only (spans pages never touched).
    wall_ms = int((time.perf_counter() - t0) * 1000)
    # explicit schema: a run whose rows were ALL filtered writes no
    # parquet files, and schema inference on an empty dir throws.
    from pyspark.sql.types import StringType, StructField, StructType

    from ..schema import EXTRACTED_SCHEMA

    ext_schema = StructType(
        list(EXTRACTED_SCHEMA.fields)
        + [StructField("warc_day", StringType(), True)]
    )
    if _exists(spark, f"{out_root}/extracted"):
        written = (
            spark.read.schema(ext_schema)
            .parquet(f"{out_root}/extracted")
            .where(F.col("warc_day").isin(pending))
        )
    else:
        written = spark.createDataFrame([], ext_schema)
    # EVERY pending day gets a marker row, including days whose rows
    # were all filtered away (0 output): without the zero-row marker a
    # filtered-empty day stays "pending" forever and resume never
    # converges.
    days_df = spark.createDataFrame(
        [(d,) for d in pending], "warc_day string"
    )
    counters = X.lineage_view(written)
    zero_filled = days_df.join(counters, "warc_day", "left").select(
        "warc_day",
        *[
            F.coalesce(F.col(c), F.lit(0).cast("bigint")).alias(c)
            for c in counters.columns
            if c != "warc_day"
        ],
    )
    # per-day kernel wall from the accumulator (filled by the write
    # action above; empty when salting/AQE retries raced it — metrics,
    # not a contract). kernel_ms attributes THIS day's extraction cost;
    # wall_ms stays the whole-run wall for cross-checking overheads.
    kern = spark.createDataFrame(
        [(d, int(ms)) for d, ms in day_acc.value.items()] or
        [(None, None)],
        "warc_day string, kernel_ms bigint",
    ).where(F.col("warc_day").isNotNull())
    # prior attempt number via a JOIN against the lineage table — a
    # create_map literal over all committed days grows unboundedly with
    # run count at 10^12-scale day cardinality.
    if _exists(spark, f"{out_root}/lineage"):
        prev = (
            spark.read.parquet(f"{out_root}/lineage")
            .groupBy("warc_day")
            .agg(F.max("attempt").alias("_prev_attempt"))
        )
    else:
        prev = spark.createDataFrame(
            [], "warc_day string, _prev_attempt int"
        )
    lineage = (
        zero_filled
        .join(kern, "warc_day", "left")
        .join(prev, "warc_day", "left")
        .withColumn("wall_ms", F.lit(wall_ms))
        .withColumn(
            "kernel_ms",
            F.coalesce(F.col("kernel_ms"), F.lit(0).cast("bigint")),
        )
        .withColumn(
            "attempt", F.coalesce(F.col("_prev_attempt"), F.lit(0)) + 1
        )
        .drop("_prev_attempt")
    )
    lineage.write.mode("append").parquet(f"{out_root}/lineage")
    n_docs = written.count()
    return RunSummary(pending, skipped, n_docs, wall_ms)


def read_extracted(spark: SparkSession, out_root: str) -> DataFrame:
    return spark.read.parquet(f"{out_root}/extracted")


def read_lineage(spark: SparkSession, out_root: str) -> DataFrame:
    return spark.read.parquet(f"{out_root}/lineage")
