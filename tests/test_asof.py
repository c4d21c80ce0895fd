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
