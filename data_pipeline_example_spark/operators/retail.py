"""Core batch aggregations + serving queries of the reference pipeline.

Implements SURVEY.md §2.6/§2.7 rows A1/A2/A4/A5, O1/O2/O3 as pure
``df -> df`` functions. The input contract is the conformed shape
(product:string, order_date:date, amount:double) produced by
``conform.conform`` — or any mapping onto it (plans/queries.py maps the
driver's ``events`` table via ts→order_date, event_type→product,
value→amount per FIXTURES.md F-D).

Scale notes: every function is a single hash-aggregate + (for top-k) a
TakeOrderedAndProject — one shuffle each, partial aggregation map-side,
no driver-side collection. A2 folds the reference's separate ``count()``
action (`pipeline_batch.py:213`) into the same single-pass aggregate
(SURVEY.md §4 fix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_example_spark.functions.materialize import materialize


def daily_revenue(df: DataFrame) -> DataFrame:
    """A1 + O1 — daily revenue per product (`pipeline_batch.py:205-207`).

    The flagship aggregate: GROUP BY order_date, product → sum(amount).
    Output: order_date, product, total_amount (2-dp rounded).
    """
    return (
        df.groupBy("order_date", "product")
        .agg(F.round(F.sum("amount"), 2).alias("total_amount"))
        .orderBy("order_date", "product")
    )


def kpis(df: DataFrame) -> DataFrame:
    """A2 — global KPI snapshot (`pipeline_batch.py:210-213`), single pass.

    The reference computes ``rows`` via a separate ``clean.count()``
    action and splices it in with ``lit``; here it is one aggregate —
    one job, one scan.
    """
    return df.agg(
        F.round(F.sum("amount"), 2).alias("grand_total"),
        F.countDistinct("product").alias("distinct_products"),
        F.count(F.lit(1)).alias("rows"),
    )


def kpis_long(df: DataFrame) -> DataFrame:
    """KPI snapshot reshaped wide→long via ``DataFrame.unpivot`` (the
    relational MELT — Spark's native unpivot operator, not a union of
    selects): one (metric, value) row per KPI, the shape metric stores
    and dashboards ingest. Values cast to double first — unpivot
    requires one common value type. Runs on the one-row aggregate, so
    the reshape itself is free at any corpus size."""
    wide = kpis(df).select(
        F.col("grand_total").cast("double").alias("grand_total"),
        F.col("distinct_products").cast("double").alias("distinct_products"),
        F.col("rows").cast("double").alias("rows"),
    )
    return wide.unpivot(
        [], ["grand_total", "distinct_products", "rows"], "metric", "value"
    )


def per_day_totals(daily: DataFrame) -> DataFrame:
    """A4 — per-day totals over the curated aggregate
    (`dashboard/app.py:33-36`), rebuilt as a Spark query."""
    return (
        daily.groupBy("order_date")
        .agg(F.round(F.sum("total_amount"), 2).alias("total_amount"))
        .orderBy("order_date")
    )


def top_products(daily: DataFrame, n: int = 10) -> DataFrame:
    """A5 + O2 — all-time top-N products (`dashboard/app.py:38-41`).

    Deterministic tie-break on product name (the reference's pandas sort
    is tie-unstable, SURVEY.md §2.7 O2). Ordering on the 2-dp-rounded
    total keeps ranking comparable across engines' float-sum orders.
    """
    return (
        daily.groupBy("product")
        .agg(F.round(F.sum("total_amount"), 2).alias("total_amount"))
        .orderBy(F.desc("total_amount"), F.asc("product"))
        .limit(n)
    )


def sample_rows(df: DataFrame, n: int = 50, id_col: str = "event_id") -> DataFrame:
    """O3 — newest-first sample (`dashboard/app.py:43`) with a unique
    tie-break key so the selected row set is deterministic."""
    return df.orderBy(
        F.desc("order_date"), F.asc("product"), F.asc(id_col)
    ).limit(n)


def revenue_rollup(df: DataFrame) -> DataFrame:
    """Multi-level revenue totals in one pass: ``ROLLUP(order_date,
    product)`` emits per-(date, product), per-date, and grand-total rows
    (NULL group keys mark rolled-up levels). One shuffle; Catalyst
    expands the grouping sets map-side, so it costs barely more than the
    finest-grained aggregate alone. The reference computes these three
    levels as three separate pandas passes (SURVEY.md A1/A4 + the KPI
    grand total)."""
    return (
        df.rollup("order_date", "product")
        .agg(F.round(F.sum("amount"), 2).alias("total_amount"))
    )


def day_over_day_revenue(daily: DataFrame) -> DataFrame:
    """Per-day revenue with the previous day's value and delta — a lag
    window over the (tiny) per-day aggregate, never over raw rows.
    Output: order_date, total_amount, prev_amount, delta."""
    from pyspark.sql.window import Window

    # a day-over-day series has no NULL day (reference F1: unparseable
    # dates are dropped before aggregation) — and Spark orders NULLs
    # first in a window ORDER BY while DuckDB orders them last, so an
    # explicit drop is also the only engine-exact choice (r15 sweep)
    per_day = per_day_totals(daily).filter(F.col("order_date").isNotNull())
    w = Window.orderBy("order_date")
    prev = F.lag("total_amount").over(w)
    return per_day.select(
        "order_date",
        "total_amount",
        prev.alias("prev_amount"),
        F.round(F.col("total_amount") - F.coalesce(prev, F.lit(0.0)), 2).alias("delta"),
    )


def rolling_revenue_7d(daily: DataFrame) -> DataFrame:
    """7-day rolling revenue per product — a RANGE window frame over the
    *calendar*, not over rows: days with no sales still age out of the
    frame after a week (a rows-frame would hold the last 7 *sale* days
    open indefinitely).

    The frame is keyed on an integer day number so the range arithmetic
    is engine-portable; partitioned by product, so the window state is
    per-key and the whole computation is one shuffle on product.
    Output: order_date, product, total_amount, rolling_7d.
    """
    from pyspark.sql.window import Window

    day_num = F.datediff(F.col("order_date"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("product")
        .orderBy(day_num)
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "order_date",
        "product",
        "total_amount",
        F.round(F.sum("total_amount").over(w), 2).alias("rolling_7d"),
    )


def daily_revenue_ma7(df: DataFrame) -> DataFrame:
    """Gap-filled daily revenue with a 7-day trailing moving average —
    the dashboard time series done right: missing days are zero-filled
    from a generated date spine (``sequence(min, max)``), so the MA
    window is a true calendar week, not "last 7 days with sales".

    Exactness: per-event amounts are 2-dp-rounded and scaled to integer
    CENTS before summing (float daily sums re-summed by a window would
    double the rounding hazards); revenue and the MA are each ONE
    division + 2-dp round (certified single-division precedent), with
    the MA denominator the actual rows in frame (series head averages
    over the days that exist). Scale: the windowed frame is the
    AGGREGATED day spine — calendar-bounded (≤ a few thousand rows at
    any corpus size), so the single ordered window is planning-sized,
    never corpus-sized. Input: a conformed retail frame (order_date,
    amount). Output: order_date, revenue, ma7.
    """
    from pyspark.sql.window import Window

    cents = F.round(F.round(F.col("amount"), 2) * 100, 0).cast("long")
    # calendar-bounded daily aggregate materialized once (r15): the
    # spine's min/max and the join both branch from it, and lazy
    # lineage re-ran the corpus scan + aggregate twice
    day = df.groupBy("order_date").agg(F.sum(cents).alias("c")).transform(
        materialize
    )
    spine = (
        day.agg(
            F.min("order_date").alias("lo"), F.max("order_date").alias("hi")
        )
        .select(
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("order_date")
        )
    )
    z = spine.join(day, "order_date", "left").select(
        "order_date", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    w = Window.orderBy("order_date").rowsBetween(-6, 0)
    return (
        z.select(
            "order_date",
            F.round(F.col("c") / 100.0, 2).alias("revenue"),
            F.round(
                F.sum("c").over(w) / (F.count(F.lit(1)).over(w) * 100.0), 2
            ).alias("ma7"),
        )
        .orderBy("order_date")
    )


def revenue_streaks(df: DataFrame) -> DataFrame:
    """Gaps-and-islands: per-product runs of CONSECUTIVE calendar days
    with at least one sale — the "momentum" readout behind streak
    badges and stock-out detection (a product whose longest streak
    dwarfs its current one has gone quiet). Generalizes the reference's
    daily-revenue table (`sales_batch_report.py` daily rollup) from
    per-day totals to run-length structure.

    Algorithm — the classic islands trick, fully relational: number
    each product's active days (``row_number`` over date), subtract
    the row number from the date; consecutive days share the resulting
    anchor date, so one ``groupBy (product, anchor)`` materializes the
    runs, and a second per-product aggregate folds them into the
    summary. The longest run is picked with a struct-max (length,
    then EARLIEST start on ties — the negated epoch-day makes max()
    prefer earlier dates), so the output is deterministic without a
    second window pass.

    Exactness: per-event amounts are 2-dp-rounded to integer CENTS
    before any sum (the MA7 discipline); the streak revenue is ONE
    division + 2-dp round at the end. All counts BIGINT.

    Scale: the windowed frame is the per-(product, day) AGGREGATE —
    calendar-bounded per product, never event-sized — and the window
    is partitioned by product, so no global ordering exists anywhere.
    Input: conformed retail frame. Output: product, active_days,
    n_streaks, longest_streak, streak_start, streak_end,
    streak_revenue.
    """
    from pyspark.sql.window import Window

    cents = F.round(F.round(F.col("amount"), 2) * 100, 0).cast("long")
    daily = df.groupBy("product", "order_date").agg(F.sum(cents).alias("c"))
    w = Window.partitionBy("product").orderBy("order_date")
    runs = daily.select(
        "product",
        "order_date",
        "c",
        F.date_sub(F.col("order_date"), F.row_number().over(w)).alias("anchor"),
    )
    streaks = runs.groupBy("product", "anchor").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.min("order_date").alias("start"),
        F.max("order_date").alias("end"),
        F.sum("c").alias("streak_c"),
    )
    best = F.max(
        F.struct(
            F.col("len"),
            (-F.datediff(F.col("start"), F.lit("1970-01-01").cast("date"))).alias(
                "neg_epoch"
            ),
            F.col("start"),
            F.col("end"),
            F.col("streak_c"),
        )
    ).alias("best")
    return (
        streaks.groupBy("product")
        .agg(
            F.sum("len").cast("long").alias("active_days"),
            F.count(F.lit(1)).cast("long").alias("n_streaks"),
            best,
        )
        .select(
            "product",
            "active_days",
            "n_streaks",
            F.col("best.len").alias("longest_streak"),
            F.col("best.start").alias("streak_start"),
            F.col("best.end").alias("streak_end"),
            F.round(F.col("best.streak_c") / 100.0, 2).alias("streak_revenue"),
        )
        .orderBy("product")
    )


def incremental_daily_revenue(df) -> "DataFrame":
    """Incremental view maintenance for the flagship daily-revenue
    rollup — the nightly pattern of a partitioned warehouse: history
    partials stay materialized, only the NEWEST day's partials are
    computed fresh, and the serving table is the re-aggregation of the
    partial frames. This op demonstrates the merge is EXACT: it splits
    the input at its max order_date, aggregates each side separately,
    merges, and the registered oracle is the direct single-pass GROUP
    BY over everything — hash-equal output proves partial-merge
    associativity.

    That associativity is exactly why revenue lives in integer CENTS
    here (``round(round(amount, 2) * 100)`` per row, then BIGINT sums):
    float partial sums are NOT associative — ``sum(A ∪ B)`` and
    ``sum(A) + sum(B)`` can differ in the last ulp and a 2-dp round
    can split them. A float-revenue IVM table silently drifts from its
    recompute; a cents one never does.

    Scale: ONE scan (the cents frame is materialized and feeds both
    the history and delta branches — the branch-reuse discipline);
    each branch is a map-side-combined partial aggregate; the merge
    re-aggregates the |days × products|-sized partial frames, never
    the events. Output: order_date, product, n_rows, total_cents.
    """
    from data_pipeline_example_spark.functions.materialize import materialize

    mx = df.agg(F.max("order_date").alias("mx"))
    cents = (
        df.crossJoin(F.broadcast(mx))
        .select(
            "order_date",
            "product",
            "mx",
            F.round(F.round(F.col("amount"), 2) * 100, 0)
            .cast("long")
            .alias("c"),
        )
        .transform(materialize)
    )

    def partials(frame):
        return frame.groupBy("order_date", "product").agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("c").cast("long").alias("total_cents"),
        )

    # NULL order_date rows fail BOTH < mx and == mx (three-valued
    # logic) and would silently vanish from the maintained table while
    # the direct GROUP BY oracle keeps a NULL-date group — route them
    # explicitly into the history branch so the merge covers the full
    # domain on nullable dates.
    base = partials(
        cents.filter(
            (F.col("order_date") < F.col("mx")) | F.col("order_date").isNull()
        )
    )
    delta = partials(cents.filter(F.col("order_date") == F.col("mx")))
    return (
        base.unionByName(delta)
        .groupBy("order_date", "product")
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("total_cents").cast("long").alias("total_cents"),
        )
        .orderBy("order_date", "product")
    )


def revenue_seasonality(df) -> "DataFrame":
    """Monthly seasonality index per product — each (product, month)'s
    share of the product's annual revenue against a flat-month
    baseline, the classic seasonality diagnostic behind inventory
    planning (an index near 1e6/12 ≈ flat; a December spike shows as a
    high month_share_micro). The time-series class the MA7/rolling
    ops don't cover: calendar re-bucketing with per-group baselines.

    Exactness: cents per row (the IVM discipline), BIGINT sums,
    integer-micro shares — ``month_cents*1e6 div year_cents``. One
    scan, one (product, year, month) aggregate, a per-(product, year)
    rollup derived from the materialized month frame (branch-reuse —
    never a second scan), broadcast back. Output: product, year,
    month, month_cents, year_cents, month_share_micro.
    """
    from data_pipeline_example_spark.functions.materialize import materialize

    cents = F.round(F.round(F.col("amount"), 2) * 100, 0).cast("long")
    monthly = (
        df.select(
            "product",
            F.year("order_date").alias("year"),
            F.month("order_date").alias("month"),
            cents.alias("c"),
        )
        .groupBy("product", "year", "month")
        .agg(F.sum("c").cast("long").alias("month_cents"))
        .transform(materialize)
    )
    yearly = monthly.groupBy("product", "year").agg(
        F.sum("month_cents").cast("long").alias("year_cents")
    )
    return (
        monthly.join(yearly, ["product", "year"])
        .select(
            "product",
            "year",
            "month",
            "month_cents",
            "year_cents",
            F.expr(
                "CASE WHEN year_cents = 0 THEN 0 "
                "ELSE (month_cents * 1000000) div year_cents END"
            ).alias("month_share_micro"),
        )
        .orderBy("product", "year", "month")
    )
