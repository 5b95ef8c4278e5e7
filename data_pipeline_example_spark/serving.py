"""Serving layer — the reference dashboards' JSON payloads, rebuilt on
Spark queries.

The reference serves `GET /api/daily` (`dashboard/app.py:21-50`) and
`GET /api/stream` (`streaming_dashboard/app.py:79-172`) by re-aggregating
curated outputs in pandas per request. Here the same payload shapes are
assembled from the engine's operators (SURVEY.md rows A4-A10, F5, O2-O8),
so the analytics run distributed and only the final bounded results are
collected: top-k rows, capped window lists, one-row summaries. Driver
memory is O(payload), never O(data) — the serving layer works unchanged
over a 100 TB curated store.

JSON field names, ordering, caps (96 windows / 8 series / 12 leaderboard
rows) and the Z-suffixed UTC timestamp format mirror the reference.
"""

from __future__ import annotations

import datetime
from typing import Any

from pyspark.sql import DataFrame, functions as F

from data_pipeline_example_spark.operators import retail, windows

MAX_WINDOWS = 96   # streaming_dashboard/app.py:16
MAX_SERIES = 8     # streaming_dashboard/app.py:17
MAX_LEADERBOARD = 12  # streaming_dashboard/static/script.js:179


def _fmt_ts(value: datetime.datetime) -> str:
    """UTC ISO-8601 with Z suffix (`streaming_dashboard/app.py:49-54`)."""
    if value.tzinfo is None:
        value = value.replace(tzinfo=datetime.timezone.utc)
    else:
        value = value.astimezone(datetime.timezone.utc)
    return value.isoformat().replace("+00:00", "Z")


def daily_payload(daily: DataFrame) -> dict[str, Any]:
    """`GET /api/daily` twin over the curated daily_product aggregate
    (order_date, product, total_amount)."""
    per_day = [
        {"order_date": str(r["order_date"]), "total_amount": r["total_amount"]}
        for r in retail.per_day_totals(daily).orderBy("order_date").collect()
    ]
    top = [
        {"product": r["product"], "total_amount": r["total_amount"]}
        for r in retail.top_products(daily).collect()
    ]
    sample = [
        {
            "order_date": str(r["order_date"]),
            "product": r["product"],
            "total_amount": r["total_amount"],
        }
        for r in daily.orderBy(
            F.desc("order_date"), F.asc("product")
        ).limit(50).collect()
    ]
    return {"status": "ok", "daily": per_day, "top_products": top, "sample": sample}


def stream_payload(windowed: DataFrame) -> dict[str, Any]:
    """`GET /api/stream` twin over the windowed aggregate
    (product, revenue, window_start, window_end)."""
    summary_row = windows.summary_stats(windowed).collect()
    if not summary_row or summary_row[0]["latest_window_end"] is None:
        return {"status": "no_data"}
    s = summary_row[0]

    points = windows.timeline_points(windowed, top_n=MAX_SERIES).collect()
    totals: dict[str, float] = {}
    series_points: dict[str, list[dict[str, Any]]] = {}
    for r in sorted(points, key=lambda r: (r["product"], r["window_start"])):
        totals[r["product"]] = round(totals.get(r["product"], 0.0) + r["revenue"], 2)
        series_points.setdefault(r["product"], []).append(
            {
                "window_start": _fmt_ts(r["window_start"]),
                "window_end": _fmt_ts(r["window_end"]),
                "revenue": r["revenue"],
            }
        )
    series = [
        {"product": p, "total_revenue": totals[p], "points": series_points[p]}
        for p in sorted(totals, key=lambda p: (-totals[p], p))
    ]

    leaderboard = [
        {
            "product": r["product"],
            "window_end": _fmt_ts(s["latest_window_end"]),
            "revenue": r["revenue"],
        }
        for r in windows.latest_window_leaderboard(
            windowed, n=MAX_LEADERBOARD
        ).collect()
    ]

    health = [
        {
            "window_start": _fmt_ts(r["window_start"]),
            "window_end": _fmt_ts(r["window_end"]),
            "total_revenue": r["total_revenue"],
            "product_count": r["product_count"],
        }
        for r in windows.window_health(windowed, n=MAX_WINDOWS).collect()
    ]

    return {
        "status": "ok",
        "last_updated": _fmt_ts(s["latest_window_end"]),
        "summary": {
            "unique_products": s["distinct_products"],
            "windows": s["window_pairs"],
            "latest_window_end": _fmt_ts(s["latest_window_end"]),
        },
        "timeline": series,
        "leaderboard": leaderboard,
        "window_health": health,
        "raw_windows": s["window_pairs"],
    }
