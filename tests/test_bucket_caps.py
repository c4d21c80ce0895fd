"""Degenerate-corpus guards: every LSH-style self-join must stay
bounded when the corpus is pathological (many identical texts /
vectors), with the dropped coverage REPORTED, never silent.

Mirrors the hot_shingle_cap discipline of ngram_jaccard_pairs: caps
bound the quadratic within-bucket join; telemetry (bucket_cap_stats /
log_drops) makes the recall cost visible.
"""

from __future__ import annotations

import logging

import pytest
from pyspark.sql import functions as F

from tesseract_ocr_service_spark.operators import dedup as D
from tesseract_ocr_service_spark.operators import similarity as S

N = 2000  # identical rows — uncapped this is ~2M candidate pairs/band


@pytest.fixture(scope="module")
def identical_texts(spark):
    return spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.lit("the same exact text repeated everywhere forever").alias(
            "text"
        ),
    )


@pytest.fixture(scope="module")
def identical_vectors(spark):
    vec = [float(i % 7) - 3.0 for i in range(16)]
    return spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(x) for x in vec]).alias("embedding"),
    )


def test_simhash_pairs_capped_bounded(identical_texts, caplog):
    with caplog.at_level(logging.WARNING, logger=D.__name__):
        out = D.simhash_pairs(
            identical_texts, max_bucket=100, log_drops=True
        )
        assert out.count() == 0  # entire corpus lives in capped buckets
    assert any("simhash_pairs: capped" in r.message for r in caplog.records)


def test_simhash_pairs_uncapped_still_works_small(spark):
    rows = [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
            (3, "completely different words here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = D.simhash_pairs(df, max_bucket=None).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in got] == [(1, 2, 0)]


def test_minhash_lsh_capped_bounded(identical_texts, caplog):
    with caplog.at_level(logging.WARNING, logger=D.__name__):
        cands = D.minhash_lsh_candidates(
            identical_texts, max_bucket=100, log_drops=True
        )
        assert cands.count() == 0
    assert any(
        "minhash_lsh_candidates: capped" in r.message for r in caplog.records
    )


def test_embedding_neardups_capped_bounded(identical_vectors, caplog):
    with caplog.at_level(logging.WARNING, logger=D.__name__):
        out = S.embedding_neardup_pairs(
            identical_vectors,
            dim=16,
            max_bucket=100,
            log_drops=True,
        )
        assert out.count() == 0
    assert any(
        "embedding_neardup_pairs: capped" in r.message
        for r in caplog.records
    )


def test_embedding_neardups_cap_keeps_normal_pairs(spark):
    """A cap far above real occupancy must not change results."""
    import random

    r = random.Random(3)
    base = [r.uniform(-1, 1) for _ in range(16)]
    rows = [(0, base), (1, [x + 0.001 for x in base])] + [
        (i, [r.uniform(-1, 1) for _ in range(16)]) for i in range(2, 40)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    capped = S.embedding_neardup_pairs(
        df, threshold=0.95, dim=16, max_bucket=1000
    ).collect()
    uncapped = S.embedding_neardup_pairs(
        df, threshold=0.95, dim=16, max_bucket=None
    ).collect()
    key = lambda r: (r["id_a"], r["id_b"])  # noqa: E731
    assert sorted(map(key, capped)) == sorted(map(key, uncapped))
    assert (0, 1) in {key(r) for r in capped}


def test_bucket_cap_stats(identical_texts):
    sh = D.simhash_table(identical_texts)
    banded = sh.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("sh", 16 * b).bitwiseAND(
                        F.lit(0xFFFF)
                    )
                    for b in range(4)
                ]
            )
        ).alias("band", "band_key"),
    )
    stats = D.bucket_cap_stats(banded, ["band", "band_key"], cap=100)
    assert stats["n_buckets"] == 4  # one bucket per band, all identical
    assert stats["n_capped_buckets"] == 4
    assert stats["n_dropped_rows"] == 4 * N
    assert stats["max_bucket"] == N
