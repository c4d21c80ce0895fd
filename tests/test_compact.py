"""Small-file compaction (plans/compact.py): layout planning, file
counts, content equality, partition-layout preservation, determinism."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from tesseract_ocr_service_spark.plans import compact as C


def _data_files(root: str) -> list[str]:
    return [
        p
        for p in glob.glob(os.path.join(root, "**", "*.parquet"),
                           recursive=True)
        if not os.path.basename(p).startswith(("_", "."))
    ]


@pytest.fixture()
def fragmented(spark, tmp_path):
    """3 hive partitions x 16 files each of ~100 rows — the small-file
    mess a daily committer accretes."""
    root = str(tmp_path / "frag")
    df = spark.range(0, 4800).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("day"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    df.repartition(16).write.partitionBy("day").parquet(root)
    return root


def test_plan_layout_counts(spark, fragmented):
    plan, layout = C.plan_compaction(spark, fragmented, target_bytes=1 << 40)
    assert layout.n_partitions == 3
    assert layout.n_files_in >= 3 * 8  # 16 writers, some may be empty
    assert layout.n_files_target == 3  # huge target -> 1 file each
    assert set(plan.columns) == {"day", "k"}
    assert plan.count() == 3


def test_compact_merges_files_and_preserves_rows(spark, fragmented, tmp_path):
    out = str(tmp_path / "tidy")
    layout = C.compact(
        spark, fragmented, out, id_col="doc_id", target_bytes=1 << 40,
        sort_within=["doc_id"],
    )
    # one file per partition dir, hive layout preserved
    for day in "012":
        files = _data_files(os.path.join(out, f"day={day}"))
        assert len(files) == 1, (day, files)
    before = spark.read.parquet(fragmented).orderBy("doc_id").collect()
    after = spark.read.parquet(out).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in before] == [r["doc_id"] for r in after]
    assert [r["payload"] for r in before] == [r["payload"] for r in after]
    assert layout.n_files_in > layout.n_files_target


def test_compact_splits_to_target_and_is_deterministic(
    spark, fragmented, tmp_path
):
    """A small byte target yields multiple files per partition; file
    placement is a pure function of the id, so a rerun lands every row
    in the same (partition, salt) slice."""
    plan, layout = C.plan_compaction(spark, fragmented, target_bytes=4096)
    ks = {r["day"]: r["k"] for r in plan.collect()}
    assert all(k > 1 for k in ks.values()), ks
    out1 = str(tmp_path / "t1")
    out2 = str(tmp_path / "t2")
    C.compact(spark, fragmented, out1, id_col="doc_id", target_bytes=4096)
    C.compact(spark, fragmented, out2, id_col="doc_id", target_bytes=4096)
    for day, k in ks.items():
        files = _data_files(os.path.join(out1, f"day={day}"))
        # approximate-by-design: (partition, salt) slices can hash-
        # collide into one task, so bound loosely around the plan
        assert k / 3 <= len(files) <= 2 * k, (day, k, len(files))
        assert len(files) > 1
    # determinism: the multiset of per-file id sets agrees across runs
    def file_id_sets(root):
        return sorted(
            tuple(sorted(
                r["doc_id"]
                for r in spark.read.parquet(f).collect()
            ))
            for f in _data_files(root)
        )

    assert file_id_sets(out1) == file_id_sets(out2)


def test_compact_unpartitioned(spark, tmp_path):
    root = str(tmp_path / "flat")
    spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    ).repartition(12).write.parquet(root)
    out = str(tmp_path / "flat_tidy")
    layout = C.compact(
        spark, root, out, id_col="doc_id", target_bytes=1 << 40
    )
    assert layout.n_partitions == 1  # the root itself
    assert len(_data_files(out)) == 1
    assert spark.read.parquet(out).count() == 2000


def test_compact_job_cli(spark, fragmented, tmp_path, capsys):
    import json

    from jobs import compact as J

    out = str(tmp_path / "cli_out")
    rc = J.main(
        [
            "--in", fragmented, "--out", out, "--id-col", "doc_id",
            "--target-mb", "1024",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_partitions"] == 3
    assert spark.read.parquet(out).count() == 4800


def test_compact_typed_partition_values_match(spark, tmp_path):
    """Externally-written zero-padded dirs (month=01) are read back by
    Spark's partition inference as int 1 — the plan join must cast the
    directory string to the data column's type, or every row misses
    the join and the partition silently collapses to one file."""
    root = str(tmp_path / "padded")
    spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "01").otherwise("02").alias("month"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    ).repartition(6).write.partitionBy("month").parquet(root)
    df = spark.read.parquet(root)
    assert dict(df.dtypes)["month"] in ("int", "bigint")  # inference
    plan, _ = C.plan_compaction(spark, root, target_bytes=4096)
    joined = C._with_plan(df, plan, ["month"])
    assert joined.where(F.col("k").isNull()).count() == 0
    out = str(tmp_path / "padded_out")
    C.compact(spark, root, out, id_col="doc_id", target_bytes=4096)
    for m in ("1", "2"):
        files = _data_files(os.path.join(out, f"month={m}"))
        assert len(files) > 1, (m, files)


def test_compact_preserves_multilevel_dir_order(spark, tmp_path):
    """year=/month= nesting must come back year=/month=, not
    alphabetical month=/year= — path-based consumers of the swapped-in
    root depend on the original partition-spec order."""
    root = str(tmp_path / "multi")
    spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.lit("2026").alias("year"),
        (F.col("id") % 2).cast("string").alias("month"),
    ).repartition(4).write.partitionBy("year", "month").parquet(root)
    out = str(tmp_path / "multi_out")
    C.compact(spark, root, out, id_col="doc_id", target_bytes=1 << 40)
    assert os.path.isdir(os.path.join(out, "year=2026", "month=0"))
    assert not os.path.isdir(os.path.join(out, "month=0"))


def test_plan_compaction_rejects_mixed_depth(spark, tmp_path):
    """A stray data file at a different partition depth fails loudly
    instead of silently getting the wrong k."""
    root = str(tmp_path / "mixed")
    spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2).cast("string").alias("day"),
    ).write.partitionBy("day").parquet(root)
    # stray unpartitioned file at the root
    spark.range(0, 5).select(F.col("id").alias("doc_id")).coalesce(
        1
    ).write.mode("append").parquet(root)
    with pytest.raises(ValueError, match="inconsistent partition layout"):
        C.plan_compaction(spark, root, target_bytes=1 << 30)


def test_compact_refuses_overlapping_roots(spark, fragmented, tmp_path):
    """mode('overwrite') must never destroy the only copy: equal or
    nested in/out roots are rejected BEFORE any write (Spark's own
    read-path check does not reliably catch a nested out_root)."""
    for bad_out in (
        fragmented,
        os.path.join(fragmented, "tidy"),   # nested under input
        os.path.join(fragmented, "..", os.path.basename(fragmented)),
    ):
        with pytest.raises(ValueError, match="overlaps in_root"):
            C.compact(spark, fragmented, bad_out, id_col="doc_id")
    # input nested under OUTPUT is just as destructive
    with pytest.raises(ValueError, match="overlaps in_root"):
        C.compact(
            spark, fragmented, str(tmp_path), id_col="doc_id"
        )
    assert len(_data_files(fragmented)) > 3  # source untouched


def test_plan_ignores_hidden_directories(spark, fragmented):
    """Leftovers from a crashed write (_temporary/.../part-*.parquet)
    sit under a HIDDEN directory with plain file names; they must not
    count as data (spark.read.parquet never scans them) — before this
    check they inflated bytes_in or raised a spurious mixed-layout
    error."""
    junk = os.path.join(fragmented, "_temporary", "0", "task_1")
    os.makedirs(junk)
    with open(os.path.join(junk, "part-0001.parquet"), "wb") as f:
        f.write(b"not parquet" * 1000)
    _, layout = C.plan_compaction(spark, fragmented, target_bytes=1 << 40)
    assert layout.n_partitions == 3
    assert layout.n_files_target == 3


def test_compact_refuses_equivalent_root_spellings(spark, fragmented):
    """Scheme-qualified vs bare and relative vs absolute spellings of
    the SAME root must not slip past the guard at its scheme
    early-exit: roots are Hadoop-qualified (makeQualified) before the
    nesting comparison, so every spelling of a nested out_root is
    rejected before any write."""
    nested = os.path.join(fragmented, "tidy")
    spellings = [
        "file:" + nested,        # Spark's single-slash local spelling
        "file://" + nested,
        os.path.relpath(nested), # relative vs absolute
    ]
    for bad_out in spellings:
        with pytest.raises(ValueError, match="overlaps in_root"):
            C.compact(spark, fragmented, bad_out, id_col="doc_id")
    # and the mirror: scheme-qualified INPUT vs bare nested output
    with pytest.raises(ValueError, match="overlaps in_root"):
        C.compact(spark, "file:" + fragmented, nested, id_col="doc_id")
