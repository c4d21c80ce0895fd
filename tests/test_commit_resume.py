"""Checkpointed commit / resume protocol tests (north_rule: idempotent
per-partition commit, lineage, resumability)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tesseract_ocr_service_spark.plans import commit as C
from tesseract_ocr_service_spark.sources import gen

N_DOCS = 300
SEED = 11


@pytest.fixture()
def paths(spark, tmp_path):
    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    gen.write_pages(spark, pages, N_DOCS, seed=SEED, partitions=4)
    return pages, out


def _texts(spark, out):
    return {
        r["url"]: r["canonical_text"]
        for r in C.read_extracted(spark, out)
        .select("url", "canonical_text")
        .collect()
    }


def test_full_run_then_noop_resume(spark, paths):
    pages, out = paths
    s1 = C.run_checkpointed(spark, pages, out)
    assert s1.n_docs == N_DOCS
    assert len(s1.pending_days) == 30 and not s1.skipped_days
    base = _texts(spark, out)
    assert len(base) == N_DOCS

    # second run: everything committed -> pure metadata no-op
    s2 = C.run_checkpointed(spark, pages, out)
    assert s2.n_docs == 0
    assert not s2.pending_days and len(s2.skipped_days) == 30
    assert _texts(spark, out) == base  # bytes untouched

    lineage = C.read_lineage(spark, out)
    assert lineage.count() == 30  # no duplicate markers
    assert lineage.agg(F.sum("n_docs")).collect()[0][0] == N_DOCS
    assert lineage.agg(F.max("attempt")).collect()[0][0] == 1


def test_window_runs_compose(spark, paths):
    pages, out = paths
    s1 = C.run_checkpointed(spark, pages, out, ts_from="2026-01-01", ts_to="2026-01-10")
    s2 = C.run_checkpointed(spark, pages, out)  # rest of the month
    assert set(s2.skipped_days) == set(s1.pending_days)
    assert s1.n_docs + s2.n_docs == N_DOCS
    assert len(_texts(spark, out)) == N_DOCS


def test_crash_before_marker_then_resume_is_idempotent(spark, paths):
    pages, out = paths
    # commit a prefix window normally
    C.run_checkpointed(spark, pages, out, ts_from="2026-01-01", ts_to="2026-01-05")
    committed_before = C.committed_days(spark, out)

    # crash AFTER data write, BEFORE the lineage marker
    with pytest.raises(RuntimeError, match="injected failure"):
        C.run_checkpointed(spark, pages, out, _fail_before_commit=True)

    # the crashed days are NOT committed...
    assert C.committed_days(spark, out) == committed_before

    # ...and the retry reprocesses exactly them, idempotently
    s = C.run_checkpointed(spark, pages, out)
    assert set(s.skipped_days) == committed_before
    assert len(s.pending_days) == 30 - len(committed_before)

    # final state: complete, correct, single lineage row per day
    texts = _texts(spark, out)
    assert len(texts) == N_DOCS
    lineage = C.read_lineage(spark, out).collect()
    assert len(lineage) == 30
    assert all(r["attempt"] == 1 for r in lineage)

    # a full reference run in a fresh dir produces identical bytes
    out2 = out + "_ref"
    C.run_checkpointed(spark, pages, out2)
    assert _texts(spark, out2) == texts


def test_lineage_per_day_kernel_ms(spark, paths):
    """Lineage carries a PER-DAY kernel wall (accumulator-attributed),
    not just the whole-run wall copied onto every row: days with docs
    get kernel_ms > 0, and the sum is bounded by run wall * cores."""
    pages, out = paths
    s = C.run_checkpointed(spark, pages, out)
    lineage = C.read_lineage(spark, out)
    rows = lineage.select("warc_day", "n_docs", "kernel_ms", "wall_ms").collect()
    assert all(r["kernel_ms"] > 0 for r in rows if r["n_docs"] > 0)
    # per-day values differ (not one broadcast constant)
    assert len({r["kernel_ms"] for r in rows}) > 1
    assert all(r["wall_ms"] == s.wall_ms for r in rows)


def test_lineage_counters_consistent(spark, paths):
    pages, out = paths
    C.run_checkpointed(spark, pages, out)
    lineage = C.read_lineage(spark, out)
    ext = C.read_extracted(spark, out)
    agg = ext.agg(
        F.count("*").alias("docs"),
        F.sum("n_words").alias("words"),
        F.count(F.when(F.col("status") == "ok", 1)).alias("ok"),
    ).collect()[0]
    lin = lineage.agg(
        F.sum("n_docs").alias("docs"),
        F.sum("n_words").alias("words"),
        F.sum("n_ok").alias("ok"),
    ).collect()[0]
    assert (agg["docs"], agg["words"], agg["ok"]) == (
        lin["docs"],
        lin["words"],
        lin["ok"],
    )
