"""User-level analytics over the ``events`` table — set operations and
cardinality, the §2.8 surface the reference leaves empty (its only set
op is the implicit UNION ALL of a multi-file scan).

All operators are single-scan-per-branch with aggregate-before-set-op
shapes: the EXCEPT/INTERSECT runs over per-user aggregates (|users|
rows), never over raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _half_users(
    events: DataFrame, split: str, threshold: float, first: bool
) -> DataFrame:
    cond = F.col("ts") < F.to_timestamp(F.lit(split))
    return (
        events.filter(cond if first else ~cond)
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 2).alias("total"))
        .filter(F.col("total") > threshold)
        .select("user_id")
    )


def high_value_churn(
    events: DataFrame, split: str = "2024-01-15", threshold: float = 1500.0
) -> DataFrame:
    """Users above the value threshold before ``split`` but not after —
    EXCEPT (distinct set difference) over two thresholded aggregates.
    The HAVING sums are rounded to 2 dp so the threshold comparison is
    cross-engine deterministic. Output: user_id."""
    return _half_users(events, split, threshold, True).exceptAll(
        _half_users(events, split, threshold, False)
    ).distinct()


def high_value_retained(
    events: DataFrame, split: str = "2024-01-15", threshold: float = 1500.0
) -> DataFrame:
    """Users above the threshold in BOTH halves — INTERSECT. Output:
    user_id."""
    return _half_users(events, split, threshold, True).intersect(
        _half_users(events, split, threshold, False)
    )


def user_cardinality(events: DataFrame) -> DataFrame:
    """Exact vs approximate distinct-user counts per event type. The
    exact count is the oracle-checked value; ``approx_count_distinct``
    (HyperLogLog++, 2% default rsd) is the 100 TB path — fixed-size
    sketch per group instead of a distinct-shuffle — included here so
    the relative error is continuously visible next to the truth.
    Output: event_type, users_exact, users_approx."""
    return (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users_exact"),
            F.approx_count_distinct("user_id").alias("users_approx"),
        )
        .orderBy("event_type")
    )


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact interpolated value percentiles per event type (p50/p90/p99,
    4 dp). ``percentile`` is the exact sort-based implementation — at
    100 TB swap in ``approx_percentile`` (t-digest sketch, mergeable
    map-side) the same way ``user_cardinality`` pairs countDistinct with
    HLL. Output: event_type, p50, p90, p99."""
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        )
        .orderBy("event_type")
    )


def value_stats(events: DataFrame) -> DataFrame:
    """Distribution statistics per event type: sample stddev/variance of
    value and its correlation with time-of-day (seconds since midnight)
    — the moment aggregates (all algebraic, map-side combinable).
    Output: event_type, sd_value, var_value, corr_value_tod."""
    tod = (
        F.col("ts").cast("long") % 86400
    ).cast("double")
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.stddev_samp("value"), 6).alias("sd_value"),
            F.round(F.var_samp("value"), 6).alias("var_value"),
            F.round(F.corr(F.col("value"), tod), 6).alias("corr_value_tod"),
        )
        .orderBy("event_type")
    )
