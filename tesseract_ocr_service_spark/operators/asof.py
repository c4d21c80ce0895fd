"""As-of join — the time-series primitive Spark lacks natively.

``asof_join(left, right, on, by)`` matches every left row with the most
recent right row whose ``on`` <= left's ``on`` within the same ``by``
key (the semantics of pandas merge_asof / DuckDB ASOF JOIN).

Implementation is the union+window shape, not a UDF:

    tag left/right -> unionByName -> per-key window ordered by
    (on, side) with right rows sorting BEFORE left at equal timestamps
    (inclusive match) -> last_value(right cols, ignoreNulls) over
    unbounded-preceding..current -> keep left rows.

One shuffle total (the window partition), fully codegen'd — versus a
naive range self-join which is O(|L|x|R|) per key. At 10^12 rows the
window partitioning by key is the same shuffle a real asof engine
performs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: Sequence[str],
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: for each left row, the latest right row with
    ``right.on <= left.on`` and equal ``by``. ``right_cols`` are the
    right-side payload columns to carry (each emitted as
    ``<col><suffix>``, NULL when no right row precedes). The right
    ``on`` value itself is always emitted as ``<on><suffix>``.

    Deterministic under ties: among right rows sharing the same ``on``,
    the one with the greatest payload tuple (ordered by ``right_cols``)
    wins — an explicit rule where DuckDB/pandas leave it unspecified.
    """
    carry = [on] + [c for c in right_cols if c != on]
    l_tagged = left.withColumn("_side", F.lit(1))
    for c in carry:
        l_tagged = l_tagged.withColumn(
            f"_r_{c}", F.lit(None).cast(right.schema[c].dataType)
        )
    r_tagged = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in carry],
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # right rows order before left rows at equal `on` (inclusive <=);
    # ties among right rows resolved by the payload columns.
    w = (
        Window.partitionBy(by)
        .orderBy(
            F.col(on).asc(),
            F.col("_side").asc(),
            *[F.col(f"_r_{c}").asc_nulls_first() for c in carry],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u
    for c in carry:
        matched = matched.withColumn(
            f"_m_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w)
        )
    out = matched.where(F.col("_side") == 1)
    keep = [c for c in left.columns]
    return out.select(
        *keep,
        *[F.col(f"_m_{c}").alias(f"{c}{suffix}") for c in carry],
    )
