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
    the one with the greatest payload tuple (field order: ``on``, then
    ``right_cols``) wins — an explicit rule where DuckDB/pandas leave it
    unspecified. Right rows with a NULL ``on`` are excluded (they precede
    nothing — pandas merge_asof and SQL ``<=`` agree).
    """
    carry = [on] + [c for c in right_cols if c != on]
    # the carried payload travels as ONE struct so the matched row is
    # atomic — per-column last_value(ignorenulls) would stitch together
    # columns from different right rows whenever a payload field is NULL.
    r_struct = F.struct(*[F.col(c).alias(c) for c in carry])
    l_tagged = left.withColumn("_side", F.lit(1))
    r_tagged = right.where(
        F.col(on).isNotNull()  # a NULL-ts right row precedes nothing
    ).select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_side"),
        r_struct.alias("_r"),
    )
    l_tagged = l_tagged.withColumn(
        "_r", F.lit(None).cast(r_tagged.schema["_r"].dataType)
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # right rows order before left rows at equal `on` (inclusive <=);
    # ties among right rows resolved by the payload struct (greatest
    # wins via last-in-order).
    w = (
        Window.partitionBy(by)
        .orderBy(
            F.col(on).asc(),
            F.col("_side").asc(),
            F.col("_r").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u.withColumn(
        "_m", F.last("_r", ignorenulls=True).over(w)
    ).where(F.col("_side") == 1)
    keep = [c for c in left.columns]
    return out.select(
        *keep,
        *[F.col("_m")[c].alias(f"{c}{suffix}") for c in carry],
    )
