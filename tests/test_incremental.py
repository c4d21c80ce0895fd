"""Incremental dedup vs the one-shot pipeline: identical survivors,
store roundtrip, and the no-history-text-rescans plan property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tesseract_ocr_service_spark.operators import dedup as D
from tesseract_ocr_service_spark.operators import incremental as I

SF = "/root/testdata/sf0.01"


def _ids(df, col="doc_id"):
    return sorted(r[col] for r in df.select(col).collect())


@pytest.fixture(scope="module")
def halves(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    mid = docs.agg(F.max("doc_id")).collect()[0][0] // 2
    return (
        docs,
        docs.where(F.col("doc_id") <= mid),
        docs.where(F.col("doc_id") > mid),
    )


def test_incremental_equals_full_corpus(spark, halves):
    """kept(day1) + kept(day2 | store-after-day1) == dedup_corpus(all):
    the invariant the daily pipeline relies on (monotone ids)."""
    docs, d1, d2 = halves
    k1, s1 = I.dedup_incremental(d1, persist=False)
    k2, _ = I.dedup_incremental(d2, s1, persist=False)
    got = sorted(_ids(k1) + _ids(k2))
    want = _ids(D.dedup_corpus(docs))
    assert got == want
    # non-vacuous: the near phase crossed the day boundary
    assert len(got) < docs.count()


def test_incremental_first_batch_equals_dedup_corpus(spark, halves):
    _, d1, _ = halves
    k1, _ = I.dedup_incremental(d1, persist=False)
    assert _ids(k1) == _ids(D.dedup_corpus(d1))


def test_store_roundtrip_through_parquet(spark, halves, tmp_path):
    """Day-2 against a store READ BACK from parquet matches day-2
    against the in-memory increment (the real daily-job shape)."""
    _, d1, d2 = halves
    k2_mem, _ = I.dedup_incremental(
        d2, I.dedup_incremental(d1, persist=False)[1], persist=False
    )
    store = str(tmp_path / "sigs")
    _, s1 = I.dedup_incremental(d1, persist=False)
    I.append_signatures(s1, store)
    k2_disk, s2 = I.dedup_incremental(
        d2, I.read_signature_store(spark, store), persist=False
    )
    assert _ids(k2_mem) == _ids(k2_disk)
    # appending day-2 grows the store by exactly day-2's exact-survivors
    I.append_signatures(s2, store)
    n1 = s1.count()
    assert I.read_signature_store(spark, store).count() == n1 + s2.count()


def test_incremental_never_rescans_history_text(spark, halves, tmp_path):
    """THE scale property: the day-2 job's plan reads day-2 text and the
    signature store — the day-1 documents path must not appear anywhere
    (history is never re-read, let alone re-shingled)."""
    _, d1, d2 = halves
    day1 = str(tmp_path / "day1_docs")
    day2 = str(tmp_path / "day2_docs")
    d1.write.parquet(day1)
    d2.write.parquet(day2)
    store = str(tmp_path / "sigstore")
    _, s1 = I.dedup_incremental(
        spark.read.parquet(day1), persist=False
    )
    I.append_signatures(s1, store)

    kept2, _ = I.dedup_incremental(
        spark.read.parquet(day2),
        I.read_signature_store(spark, store),
        persist=False,
    )
    files = kept2.inputFiles()  # exact file set, immune to the plan
    # string's path truncation
    assert files and not any("day1_docs" in f for f in files), files
    assert any("day2_docs" in f for f in files)
    assert any("sigstore" in f for f in files)
    plan = kept2._jdf.queryExecution().executedPlan().toString()
    # and the store probes stream history past a BROADCAST new side:
    # the historical rows are never shuffled
    assert "BroadcastHashJoin" in plan


def test_cross_day_near_dup_is_dropped(spark):
    """A day-2 doc that near-dups a day-1 KEPT doc and one that dups a
    day-1 near-LOSER are both dropped (the store holds ALL historical
    exact-survivors, not just kept docs)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    d1 = spark.createDataFrame(
        [(1, base), (2, base + " lambda")],  # 2 near-dups 1 -> dropped
        ["doc_id", "text"],
    )
    d2 = spark.createDataFrame(
        [
            (10, base + " lambda"),  # near-dup of DROPPED 2 (exact, even)
            (11, base + " mu"),      # near-dup of kept 1
            (12, "completely different content about spark plans"),
        ],
        ["doc_id", "text"],
    )
    k1, s1 = I.dedup_incremental(d1, persist=False)
    assert _ids(k1) == [1]
    assert _ids(s1, "id") == [1, 2]  # exact-survivors incl. near-loser
    k2, _ = I.dedup_incremental(d2, s1, persist=False)
    assert _ids(k2) == [12]


def test_non_monotone_increment_ids_raise(spark):
    """A violated monotone-id precondition RAISES instead of silently
    diverging from the one-shot keep/drop (the cross-pair rule always
    drops the new side, which only equals 'drop the larger id' when
    new ids sort after every stored id). The guard is LAZY on the
    increment side (no extra eager consumer of new_docs — that would
    replay the day's whole extraction pipeline), so the raise surfaces
    at the first action over the returned frames, before any output
    materializes. check_monotone=False keeps the old caller-guaranteed
    behavior."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    d1 = spark.createDataFrame(
        [(10, base), (11, base + " nu")], ["doc_id", "text"]
    )
    d2 = spark.createDataFrame(
        [(3, base + " xi"), (12, "other words entirely here")],
        ["doc_id", "text"],
    )
    _, s1 = I.dedup_incremental(d1, persist=False)
    with pytest.raises(Exception, match="non-monotone increment ids"):
        k_bad, _ = I.dedup_incremental(d2, s1, persist=False)
        k_bad.collect()
    # explicit opt-out still runs (documented divergence risk)
    k2, _ = I.dedup_incremental(
        d2, s1, persist=False, check_monotone=False
    )
    assert len(_ids(k2)) >= 1


def test_incremental_empty_new_day(spark, halves):
    """A day with zero rows keeps nothing, drops nothing, appends an
    empty signature increment — the pipeline must not crash on a quiet
    day."""
    _, d1, _ = halves
    _, s1 = I.dedup_incremental(d1, persist=False)
    empty = d1.where(F.lit(False))
    kept, inc = I.dedup_incremental(empty, s1, persist=False)
    assert kept.count() == 0 and inc.count() == 0


def test_incremental_disjoint_day_keeps_everything(spark):
    """A new day with no exact or near dups against history survives
    intact and its whole signature set is appended."""
    d1 = spark.createDataFrame(
        [(1, "history words about extraction kernels and arrow batches")],
        ["doc_id", "text"],
    )
    d2 = spark.createDataFrame(
        [
            (10, "entirely fresh content concerning parquet bucketing"),
            (11, "another novel document on shuffle partition sizing"),
        ],
        ["doc_id", "text"],
    )
    _, s1 = I.dedup_incremental(d1, persist=False)
    kept, inc = I.dedup_incremental(d2, s1, persist=False)
    assert _ids(kept) == [10, 11]
    assert _ids(inc, "id") == [10, 11]


def test_dedup_daily_job_cli(spark, tmp_path, capsys):
    """jobs/dedup_daily.py end to end over two days in one process:
    day 1 bootstraps the store, day 2 dedups against it; the union of
    kept outputs equals the one-shot pipeline."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import jobs.dedup_daily as J

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    mid = docs.agg(F.max("doc_id")).collect()[0][0] // 2
    d1p, d2p = str(tmp_path / "day1"), str(tmp_path / "day2")
    docs.where(F.col("doc_id") <= mid).write.parquet(d1p)
    docs.where(F.col("doc_id") > mid).write.parquet(d2p)
    store = str(tmp_path / "store")
    outs = []
    for i, dp in enumerate((d1p, d2p), 1):
        out = str(tmp_path / f"kept{i}")
        assert J.main(["--docs", dp, "--store", store, "--out", out]) == 0
        outs.append(out)
    lines = [
        json.loads(l)
        for l in capsys.readouterr().out.splitlines()
        if l.startswith("{")
    ]
    assert lines[0]["had_history"] is False
    assert lines[1]["had_history"] is True
    # the metric must be computed BEFORE the store append: a post-
    # append re-evaluation anti-joins the increment against its own
    # fresh signatures and reports 0 (regression guard)
    assert lines[1]["n_sig_appended"] > 0
    got = sorted(
        r["doc_id"]
        for o in outs
        for r in spark.read.parquet(o).select("doc_id").collect()
    )
    assert got == _ids(D.dedup_corpus(docs))


def test_sig_increment_unpersist_releases_cache(spark, halves):
    """The returned sig_increment must BE the persisted plan, not a
    projection over it: CacheManager only uncaches exact sameResult
    plans, so unpersisting a projection is a silent no-op and the
    MEMORY_AND_DISK signature blocks would outlive every daily run in
    a long-lived session (jobs/dedup_daily.py calls inc.unpersist())."""
    _, d1, _ = halves
    kept, inc = I.dedup_incremental(d1, persist=True)
    kept.count()
    assert inc.storageLevel.useMemory or inc.storageLevel.useDisk
    inc.unpersist(blocking=True)
    assert not (inc.storageLevel.useMemory or inc.storageLevel.useDisk)
