"""Sliding-window revenue analytics (batch analogs of the streaming job).

The reference computes a watermarked sliding-window aggregation in
Structured Streaming (`services/streaming/streaming_sales_aggregator.py:
266-286`, SURVEY.md A3/T1-T3) and then runs a second layer of pandas
analytics over its Parquet output (`streaming_dashboard/app.py:79-154`,
rows A5-A9, F5-F6, O4-O8). Here both layers are Spark DataFrame operators:
the window aggregation itself works identically on a batch DataFrame
(same ``F.window`` semantics, minus the watermark), and the serving
queries run over its output — which is what makes them oracle-checkable.

Scale notes:
* ``sliding_window_agg`` is one shuffle on (window, key); with a 1h/15m
  spec each row expands to exactly 4 windows before the partial aggregate.
* ``latest_window_leaderboard`` finds max(window_end) with a tiny global
  aggregate broadcast back as a join key — no single-partition global
  window function, which would collapse 100 TB onto one task.
* ``timeline_points`` broadcasts the top-N key set (N≈8) instead of
  running N per-product filters like the reference (F6, SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sliding_window_agg(
    df: DataFrame,
    ts_col: str = "order_ts",
    key_col: str = "product",
    value_col: str = "amount",
    window: str = "1 hour",
    slide: str = "15 minutes",
    rounded: bool = True,
) -> DataFrame:
    """A3 (batch analog) — revenue per (sliding window × key).

    Output: window_start, window_end, product, revenue. P12's struct
    field extraction (`streaming_sales_aggregator.py:283-284`) inlined.
    ``rounded=False`` keeps full precision for downstream re-aggregation
    (round once, at the final output — SURVEY.md §7 float-parity note).
    """
    revenue = F.sum(value_col)
    if rounded:
        revenue = F.round(revenue, 2)
    # explicit F3 semantics (reference: drop unparseable event times):
    # F.window silently drops NULL-ts rows anyway — filtering first makes
    # the contract visible and keeps the SQL oracle engine-identical on
    # corpora with NULL event times (r15 degenerate sweep)
    return (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.window(ts_col, window, slide).alias("w"), F.col(key_col))
        .agg(revenue.alias("revenue"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(key_col).alias("product"),
            "revenue",
        )
    )


def latest_window_leaderboard(windowed: DataFrame, n: int = 12) -> DataFrame:
    """F5 + A6 + O7 — leaderboard of the most recent window
    (`streaming_dashboard/app.py:109-121`, display cap `script.js:179`).

    The latest window_end is computed as a 1-row aggregate and joined
    back (broadcast by AQE) — scales regardless of input size.
    """
    latest = windowed.agg(F.max("window_end").alias("window_end"))
    return (
        windowed.join(F.broadcast(latest), "window_end")
        .groupBy("product")
        .agg(F.round(F.sum("revenue"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("product"))
        .limit(n)
    )


def window_health(windowed: DataFrame, n: int = 96) -> DataFrame:
    """A7 + O6 — per-window rollup: total revenue + product count for the
    newest N windows (`streaming_dashboard/app.py:123-129`)."""
    return (
        windowed.groupBy("window_start", "window_end")
        .agg(
            F.round(F.sum("revenue"), 2).alias("total_revenue"),
            F.countDistinct("product").alias("product_count"),
        )
        .orderBy(F.desc("window_start"), F.desc("window_end"))
        .limit(n)
    )


def timeline_points(windowed: DataFrame, top_n: int = 8) -> DataFrame:
    """A9 + O4/O8 (flattened) — window series for the top-N products
    (`streaming_dashboard/app.py:87-107`).

    The reference filters the whole frame once per product (F6); here the
    top-N product set (tiny) is broadcast-joined in one pass. Points are
    returned as rows (product, window_start, window_end, revenue); the
    serving layer can reassemble per-product arrays with
    ``collect_list(struct(...))`` if the JSON shape is needed.
    """
    top = (
        windowed.groupBy("product")
        .agg(F.round(F.sum("revenue"), 2).alias("total_revenue"))
        .orderBy(F.desc("total_revenue"), F.asc("product"))
        .limit(top_n)
        .select("product")
    )
    return windowed.join(F.broadcast(top), "product").select(
        "product", "window_start", "window_end", F.round("revenue", 2).alias("revenue")
    )


def summary_stats(windowed: DataFrame) -> DataFrame:
    """A8 — stream summary (`streaming_dashboard/app.py:85,140-144`):
    distinct products, distinct window pairs, latest window end — one
    single-pass aggregate instead of three pandas passes."""
    return windowed.agg(
        F.countDistinct("product").alias("distinct_products"),
        F.countDistinct("window_start", "window_end").alias("window_pairs"),
        F.max("window_end").alias("latest_window_end"),
    )


def user_sessions(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Sessionize the raw event stream per user: events closer than
    ``gap`` merge into one session (``F.session_window`` — T2 extension;
    the reference has fixed sliding windows only).

    Works identically in batch and streaming mode. The group-by shuffles
    on user_id (uniform key); session merging is per-group, no second
    shuffle. Output: user_id, session_start, session_end (last event +
    gap), n_events, total_value (2 dp).
    """
    return (
        # F3 semantics, explicit: an event without an event time cannot
        # be sessionized (F.session_window would drop it silently; the
        # filter keeps the SQL oracle engine-identical — r15 sweep)
        events.filter(F.col("ts").isNotNull())
        .groupBy(
            F.session_window(F.col("ts"), gap).alias("w"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
