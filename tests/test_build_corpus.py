"""End-to-end test for jobs/build_corpus.py — the composed curation
pipeline (quality -> dedup -> perplexity -> DSIR -> temperature sample
-> pack -> sharded write + manifest). Pins the funnel's monotonicity,
the manifest's internal consistency, and full rerun determinism (the
idempotent-retry contract: same input -> byte-identical shard
membership, digests included)."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _run(spark, out: str) -> dict:
    sys.path.insert(0, os.path.join(REPO, "jobs"))
    try:
        import build_corpus as J
    finally:
        sys.path.pop(0)
    args = J.parse_args(
        [
            "--docs", SF,
            "--out", out,
            "--target-lang", "en",
            "--temperature-sample",
            "--shards", "4",
        ]
    )
    return J.build(spark, args)


@pytest.mark.slow
def test_build_corpus_funnel_and_determinism(spark, tmp_path):
    out1, out2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    f1 = _run(spark, out1)
    f2 = _run(spark, out2)
    assert f1 == f2

    # funnel: every stage can only shrink the corpus, nothing vanishes
    stages = [
        "input", "quality_kept", "dedup_kept", "perplexity_kept",
        "dsir_kept", "sampled", "packed_docs",
    ]
    assert list(f1.keys()) == stages
    vals = [f1[s] for s in stages]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    assert vals[0] == 500 and vals[-1] > 0
    assert f1["sampled"] == f1["packed_docs"]

    m1 = sorted(
        (r.asDict()
         for r in spark.read.parquet(f"{out1}/_manifest").collect()),
        key=lambda d: d["shard"],
    )
    m2 = sorted(
        (r.asDict()
         for r in spark.read.parquet(f"{out2}/_manifest").collect()),
        key=lambda d: d["shard"],
    )
    assert m1 == m2  # identical digests = identical shard membership
    assert sum(d["n_docs"] for d in m1) == f1["packed_docs"]

    # the data itself: every surviving doc is in exactly one shard,
    # pack ids are dense-ish next-fit bins within each shard
    data = spark.read.parquet(f"{out1}/data")
    assert data.count() == f1["packed_docs"]
    assert data.select("doc_id").distinct().count() == f1["packed_docs"]
    rows = data.select("shard", "pack_id", "n_tok").collect()
    assert all(r["pack_id"] >= 0 for r in rows)
    # only English docs survive the lang-targeted DSIR + sampling? No —
    # DSIR keeps high-scoring docs of ANY lang; just check lang column
    # survived the pipeline for downstream mixing
    assert "lang" in data.columns


def test_build_corpus_longest_retention(spark, tmp_path):
    """retention=longest keeps the LONGEST near-dup cluster member
    (doc 2), where the default min-id rule would keep doc 1."""
    sys.path.insert(0, os.path.join(REPO, "jobs"))
    try:
        import build_corpus as J
    finally:
        sys.path.pop(0)
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
            "psi omega one two three four five six")
    rows = [
        (1, base, "en"),
        (2, base + " thirty thirtyone", "en"),  # longest member
        (3, "completely different content about spark shuffles", "en"),
    ]
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows, ["doc_id", "text", "lang"]).write.parquet(p)
    out = str(tmp_path / "out")
    args = J.parse_args(
        ["--docs", p, "--out", out, "--no-quality", "--no-perplexity",
         "--retention", "longest", "--shards", "1"]
    )
    f = J.build(spark, args)
    kept = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/data").select("doc_id").collect()
    )
    assert kept == [2, 3]
    assert f["dedup_kept"] == 2

    # the default rule on the same input keeps min-id doc 1 instead
    out2 = str(tmp_path / "out2")
    args2 = J.parse_args(
        ["--docs", p, "--out", out2, "--no-quality", "--no-perplexity",
         "--shards", "1"]
    )
    J.build(spark, args2)
    kept2 = sorted(
        r["doc_id"] for r in
        spark.read.parquet(f"{out2}/data").select("doc_id").collect()
    )
    assert kept2 == [1, 3]


def test_build_corpus_gopher_gate(spark, tmp_path):
    """--quality-gate gopher swaps the C4 keep rule for the complete
    Gopher rule set. The synthetic corpus fails Gopher wholesale (no
    stopwords / too short), so plant a mixed corpus: Gopher-passing
    prose for even ids, word-salad for odd — the funnel must keep
    exactly the independent gopher_keep count, and the all-dropped
    case must fail loudly instead of writing an unreadable dataset."""
    from pyspark.sql import functions as F

    from tesseract_ocr_service_spark.functions import textstats as T

    sys.path.insert(0, os.path.join(REPO, "jobs"))
    try:
        import build_corpus as J
    finally:
        sys.path.pop(0)
    prose = ("the quick brown fox and that have with of to be fine " * 8
             ).strip()
    docs_path = str(tmp_path / "docs")
    spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, prose)
        .otherwise(F.lit("salad words only")).alias("text"),
        F.lit("en").alias("lang"),
    ).write.parquet(docs_path)
    out = str(tmp_path / "gq")
    args = J.parse_args(
        [
            "--docs", docs_path, "--out", out, "--quality-gate", "gopher",
            "--no-dedup", "--no-perplexity", "--shards", "2",
        ]
    )
    f = J.build(spark, args)
    docs = spark.read.parquet(docs_path)
    want = docs.where(T.gopher_keep(F.col("text"))).count()
    assert want == 100
    assert f["quality_kept"] == want
    assert f["input"] == 200

    # all-dropped funnel: loud, typed failure (not UNABLE_TO_INFER_SCHEMA)
    args2 = J.parse_args(
        [
            "--docs", "/root/testdata/sf0.001", "--out",
            str(tmp_path / "empty"), "--quality-gate", "gopher",
            "--no-dedup", "--no-perplexity", "--shards", "2",
        ]
    )
    with pytest.raises(ValueError, match="no documents survived"):
        J.build(spark, args2)
