"""As-of join semantics: inclusive match, no-match NULLs, key isolation."""

from __future__ import annotations

from datetime import datetime

from tesseract_ocr_service_spark.operators.asof import asof_join


def T(s):
    return datetime.fromisoformat(s)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, T("2024-01-01 10:00:00"), 100),  # before any right -> NULL
            (1, T("2024-01-01 11:00:00"), 101),  # == right ts: inclusive
            (1, T("2024-01-01 12:30:00"), 102),  # between rights -> 11:00
            (2, T("2024-01-01 12:00:00"), 200),  # other key isolated
            (3, T("2024-01-01 12:00:00"), 300),  # key with no rights
        ],
        ["user_id", "ts", "event_id"],
    )
    right = spark.createDataFrame(
        [
            (1, T("2024-01-01 11:00:00"), 900),
            (1, T("2024-01-01 13:00:00"), 901),
            (2, T("2024-01-01 11:59:00"), 902),
        ],
        ["user_id", "ts", "event_id"],
    )
    out = {
        r["event_id"]: (r["event_id_right"], r["ts_right"])
        for r in asof_join(
            left, right, on="ts", by="user_id", right_cols=["event_id"]
        ).collect()
    }
    assert out[100] == (None, None)
    assert out[101][0] == 900  # inclusive at equal ts
    assert out[102][0] == 900  # most recent preceding, not the later one
    assert out[200][0] == 902
    assert out[300] == (None, None)


def test_asof_tie_on_right_ts_is_deterministic(spark):
    left = spark.createDataFrame(
        [(1, T("2024-01-01 12:00:00"), 100)], ["user_id", "ts", "event_id"]
    )
    right = spark.createDataFrame(
        [
            (1, T("2024-01-01 11:00:00"), 7),
            (1, T("2024-01-01 11:00:00"), 9),  # tie: greatest payload wins
        ],
        ["user_id", "ts", "event_id"],
    )
    for _ in range(3):
        got = asof_join(
            left, right, on="ts", by="user_id", right_cols=["event_id"]
        ).collect()[0]["event_id_right"]
        assert got == 9


def test_asof_matched_row_is_atomic(spark):
    """A NULL payload field in the latest matching right row must come
    through as NULL — never stitched with an older row's value."""
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    sch = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("a", LongType()),
            StructField("b", LongType()),
        ]
    )
    right = spark.createDataFrame(
        [
            (1, T("2024-01-01 10:00:00"), 3, 4),
            (1, T("2024-01-01 11:00:00"), None, 5),
        ],
        sch,
    )
    left = spark.createDataFrame(
        [(1, T("2024-01-01 12:00:00"))], ["user_id", "ts"]
    )
    r = asof_join(left, right, on="ts", by="user_id", right_cols=["a", "b"]).collect()[0]
    assert (r["a_right"], r["b_right"]) == (None, 5)
    assert r["ts_right"] == T("2024-01-01 11:00:00")


def test_asof_null_ts_right_rows_never_match(spark):
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    sch = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("event_id", LongType()),
        ]
    )
    right = spark.createDataFrame([(1, None, 999)], sch)
    left = spark.createDataFrame(
        [(1, T("2024-01-01 09:00:00"), 1)], sch
    ).select("user_id", "ts", "event_id")
    r = asof_join(left, right, on="ts", by="user_id", right_cols=["event_id"]).collect()[0]
    assert r["event_id_right"] is None and r["ts_right"] is None


def test_ivf_tiny_corpus_fallback(spark):
    from tesseract_ocr_service_spark.operators.similarity import (
        ann_topk_ivf,
        ivf_centroids,
    )

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)], ["vec_id", "embedding"]
    )
    cents = ivf_centroids(df, n_lists=4)  # hash sample under-fills
    assert len(cents) == 4
    top = ann_topk_ivf(df, [2.0, 1.0], cents, k=1, n_probe=4).collect()
    assert top[0]["vec_id"] == 2


def test_asof_single_shuffle_plan(spark):
    left = spark.range(100).selectExpr(
        "id % 5 AS user_id",
        "timestamp'2024-01-01' + make_interval(0,0,0,0,0,0,id) AS ts",
        "id AS event_id",
    )
    right = left.selectExpr("user_id", "ts", "event_id + 1000 AS event_id")
    j = asof_join(left, right, on="ts", by="user_id", right_cols=["event_id"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1  # one window shuffle
    assert "Join" not in plan  # no O(LxR) join anywhere
