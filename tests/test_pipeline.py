"""End-to-end Spark pipeline vs golden fixtures (byte-identical contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tesseract_ocr_service_spark.config import ExtractConfig
from tesseract_ocr_service_spark.operators import extract as X
from tesseract_ocr_service_spark.sources import gen

from . import golden

N_DOCS = 200
SEED = 42


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pages") / "pages")
    gen.write_pages(spark, path, N_DOCS, seed=SEED, partitions=4)
    return path


@pytest.fixture(scope="module")
def result_rows(spark, pages_path):
    pages = X.read_pages(spark, pages_path)
    wide = X.extract(pages, ExtractConfig())
    rows = wide.collect()
    assert len(rows) == N_DOCS
    return {r["url"]: r for r in rows}


def _expected_all():
    return {
        gen.doc(i, SEED)["url"]: golden.expected(i, SEED)
        for i in range(N_DOCS)
    }


def test_byte_identical_text_per_url(result_rows):
    """THE correctness gate (BASELINE.json): byte-identical extracted
    text per url vs the independently-computed goldens."""
    exp = _expected_all()
    assert set(result_rows) == set(exp)
    for url, e in exp.items():
        got = result_rows[url]
        assert got["status"] == e["status"], url
        assert got["canonical_text"].encode("utf-8") == e[
            "canonical_text"
        ].encode("utf-8"), url


def test_statuses_cover_all_paths(result_rows):
    statuses = {r["status"] for r in result_rows.values()}
    assert statuses == {"ok", "rejected", "error", "empty"}


def test_page_results_match_golden(result_rows):
    exp = _expected_all()
    for url, e in exp.items():
        if e["status"] != "ok":
            assert result_rows[url]["total_pages"] == 0
            continue
        got = result_rows[url]
        assert got["total_pages"] == e["total_pages"], url
        assert got["avg_confidence"] == pytest.approx(e["avg_confidence"]), url
        for gp, ep in zip(got["pages"], e["pages"]):
            assert gp["page_number"] == ep["page_number"], url
            assert gp["text"] == ep["text"], url
            assert gp["confidence"] == pytest.approx(ep["confidence"]), url
            assert gp["rotation_applied"] == ep["rotation_applied"], url
            assert gp["deskew_angle"] == pytest.approx(ep["deskew_angle"]), url
            assert (gp["width"], gp["height"]) == (ep["width"], ep["height"]), url


def test_spans_hierarchy_matches_golden(result_rows):
    exp = _expected_all()
    checked = 0
    for url, e in exp.items():
        if e["status"] != "ok":
            continue
        got = result_rows[url]
        for ps in got["spans"]:
            blocks = [b.asDict(recursive=True) for b in ps["blocks"]]
            assert blocks == e["spans_blocks"][ps["page_number"]], url
            checked += 1
    assert checked > 50


def test_counters_match_golden(result_rows):
    exp = _expected_all()
    for url, e in exp.items():
        got = result_rows[url]
        if "n_words" in e:
            assert got["n_words"] == e["n_words"], url
        if "n_blocks_kept" in e:
            assert got["n_blocks_kept"] == e["n_blocks_kept"], url
            assert got["n_blocks_dropped"] == e["n_blocks_dropped"], url
        # n_chars sums per-page text lengths (ocr_processor.py:464) —
        # page separators in canonical_text are NOT counted.
        expected_chars = sum(len(p["text"]) for p in e.get("pages", []))
        assert got["n_chars"] == expected_chars, url


def test_column_pruning_never_reads_text(spark, pages_path):
    """The noise `text` column must not reach the scan (SURVEY.md §4)."""
    pages = X.read_pages(spark, pages_path)
    plan = X.extract(pages)._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_lines, plan
    for line in scan_lines:
        assert "text" not in line, line
        assert "html" in line


def test_partition_pruning_on_warc_ts(spark, pages_path):
    pruned = X.read_pages(spark, pages_path, ts_from="2026-01-05", ts_to="2026-01-09")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "warc_day" in plan
    days = {str(r["warc_day"]) for r in pruned.select("warc_day").distinct().collect()}
    assert days and all("2026-01-05" <= d <= "2026-01-09" for d in days)


def test_salted_extract_same_results(spark, pages_path):
    """Salted repartition must not change any output byte."""
    pages = X.read_pages(spark, pages_path)
    base = {
        r["url"]: r["canonical_text"]
        for r in X.extract(pages).select("url", "canonical_text").collect()
    }
    salted = {
        r["url"]: r["canonical_text"]
        for r in X.extract(pages, salt_partitions=16)
        .select("url", "canonical_text")
        .collect()
    }
    assert base == salted


def test_language_gate_is_relational_filter(spark, pages_path):
    pages = X.read_pages(spark, pages_path)
    out = X.extract(pages, languages=("eng", "rus"))
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs <= {"eng", "rus"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "lang" in plan


def test_lineage_totals(spark, pages_path, result_rows):
    pages = X.read_pages(spark, pages_path)
    wide = X.extract(pages)
    lineage = X.lineage_view(wide).collect()
    assert sum(r["n_docs"] for r in lineage) == N_DOCS
    assert sum(r["n_ok"] for r in lineage) == sum(
        1 for r in result_rows.values() if r["status"] == "ok"
    )
    assert sum(r["n_words"] for r in lineage) == sum(
        r["n_words"] for r in result_rows.values()
    )


def test_store_stats_and_point_lookup(spark, pages_path, tmp_path_factory):
    pages = X.read_pages(spark, pages_path)
    wide = X.extract(pages)
    stats = X.store_stats(X.extracted_view(wide)).collect()[0]
    assert stats["total_documents"] == N_DOCS
    assert stats["oldest_ts"] <= stats["newest_ts"]

    spans_path = str(tmp_path_factory.mktemp("spans") / "spans")
    X.spans_view(wide).write.parquet(spans_path)
    url = gen.doc(1, SEED)["url"]
    got = X.lookup_spans(spark, spans_path, url).collect()
    assert len(got) == 1 and got[0]["url"] == url
