"""As-of (point-in-time) join — matching each left row to the most
recent right row at-or-before its timestamp, per key.

Spark has no native ASOF JOIN; the naive formulation (left⋈right on
``r.ts <= l.ts`` + keep max) is a per-key cross product. This module
uses the *union trick* instead: tag both sides, union them, and carry
the latest right-side payload forward with ``last(..., ignorenulls)``
over a (key, time)-ordered running window. One shuffle on the key, no
pair blow-up — each row is touched once, so the cost is
O((|L|+|R|) log) regardless of how many right rows precede each left
row. This is the scale path for 100 TB event tables.

Determinism: rows are ordered by (ts, side, event_id) with right rows
first, so equal-timestamp right rows ARE visible to a left row at the
same instant (<= semantics) and ties resolve to the highest right
event_id — the oracle mirrors this with ``ORDER BY v.ts DESC,
v.event_id DESC`` under ``row_number() = 1``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_events(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "view",
) -> DataFrame:
    """For each ``left_type`` event, the most recent ``right_type``
    event of the same user at-or-before it (NULL if none).

    Output: purchase_id, user_id, purchase_ts, asof_view_id,
    asof_view_ts, gap_s (whole seconds between the two).
    """
    tagged = events.filter(
        F.col("event_type").isin(left_type, right_type)
    ).select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == left_type).cast("int").alias("is_left"),
        F.when(F.col("event_type") == right_type, F.col("ts")).alias("r_ts"),
        F.when(F.col("event_type") == right_type, F.col("event_id")).alias("r_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("is_left"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("asof_view_ts", F.last("r_ts", ignorenulls=True).over(w))
        .withColumn("asof_view_id", F.last("r_id", ignorenulls=True).over(w))
        .filter(F.col("is_left") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "asof_view_id",
            "asof_view_ts",
            (
                F.unix_timestamp("ts") - F.unix_timestamp("asof_view_ts")
            ).alias("gap_s"),
        )
    )
