"""Join + aggregation queries over the TPC-H-ish star schema.

The reference implements *no joins* (SURVEY.md §2.5) — its serving
leaderboard is the natural first join use-case, and the driver's star
schema (TESTDATA.md) is where the engine's join surface gets exercised.
These queries are TPC-H-shaped, adapted to the available columns.

Scale notes (the point of this module):
* Dimension tables (region, nation, supplier, part, customer at low SF)
  are explicitly ``broadcast()`` — no shuffle of the fact table on dim
  joins; at 100 TB only lineitem⋈orders needs a shuffle (AQE picks
  sort-merge and handles skew).
* Filters are applied *before* joins so Catalyst pushes them into the
  parquet scans (verify with ``.explain``: PushedFilters on l_shipdate /
  c_mktsegment / r_name).
* Aggregates are keyed on low-cardinality columns → map-side partial
  aggregation shrinks shuffle traffic to ~|groups| per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-shaped pricing summary over lineitem only.

    One scan, one shuffle on a 6-ish-group key; avg columns rounded to
    4 dp and sums to 2 dp for cross-engine float parity.
    """
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_revenue_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1998-03-15",
    n: int = 10,
) -> DataFrame:
    """TPC-H Q3-shaped: top unshipped orders by revenue for a segment.

    customer is filtered then broadcast; orders⋈lineitem is the only
    shuffle join. Revenue ordering uses the rounded value + orderkey
    tie-break for determinism.
    """
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    return (
        orders.filter(F.col("o_orderdate") < F.lit(date).cast("date"))
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(
            lineitem.filter(F.col("l_shipdate") > F.lit(date).cast("date")),
            orders["o_orderkey"] == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(n)
    )


def supplier_nation_revenue(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q5-shaped: revenue by supplier nation within a region.

    region→nation→supplier is a chain of broadcast joins (all tiny);
    lineitem never shuffles for the joins — only for the final group-by.
    """
    dims = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == region_name)),
                    nation["n_regionkey"] == region["r_regionkey"],
                )
            ),
            supplier["s_nationkey"] == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    return (
        lineitem.join(F.broadcast(dims), lineitem["l_suppkey"] == dims["s_suppkey"])
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def customer_nation_revenue(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "EUROPE",
) -> DataFrame:
    """Order revenue by customer nation within a region (broadcast dims)."""
    dims = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == region_name)),
                    nation["n_regionkey"] == region["r_regionkey"],
                )
            ),
            customer["c_nationkey"] == F.col("n_nationkey"),
        )
        .select("c_custkey", "n_name")
    )
    return (
        orders.join(F.broadcast(dims), orders["o_custkey"] == dims["c_custkey"])
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def order_priority_count(
    orders: DataFrame, lineitem: DataFrame, min_qty: float = 45.0
) -> DataFrame:
    """TPC-H Q4-shaped: order count by priority where some line item has
    quantity ≥ min_qty — a LEFT SEMI join (no row multiplication, the
    semi-join short-circuits per key)."""
    big = lineitem.filter(F.col("l_quantity") >= min_qty).select("l_orderkey")
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def brand_volume(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Quantity/revenue by part brand — fact⋈broadcast(dim) pattern."""
    return (
        lineitem.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            lineitem["l_partkey"] == part["p_partkey"],
        )
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy("p_brand")
    )


def customer_order_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13-shaped: distribution of orders-per-customer.

    LEFT OUTER join keeps order-less customers (c_count = 0). The outer
    join shuffles on custkey (uniform key, no skew); the second group-by
    is tiny. Output: c_count, custdist.
    """
    counts = (
        customer.join(orders, customer["c_custkey"] == orders["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def promo_revenue_share(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14-shaped: monthly share of revenue from PROMO parts.

    Conditional aggregation over fact⋈broadcast(dim); one shuffle on the
    ship-month key. Output: ship_month, promo_share (2 dp percent),
    total_revenue (2 dp).
    """
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(
            F.broadcast(part.select("p_partkey", "p_type")),
            lineitem["l_partkey"] == part["p_partkey"],
        )
        .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("ship_month"))
        .agg(
            F.round(
                100
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                2,
            ).alias("promo_share"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
        )
        .orderBy("ship_month")
    )


def lapsed_customers(
    customer: DataFrame, orders: DataFrame, cutoff: str = "2001-06-01"
) -> DataFrame:
    """Customers with no orders on/after the cutoff — a LEFT ANTI join
    (the build side is pre-filtered to recent orders, so the anti-join
    probe carries only recent custkeys). Output per segment: customers,
    avg_acctbal.
    """
    recent = orders.filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit(cutoff))
    ).select("o_custkey")
    return (
        customer.join(recent, customer["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


def fulfilled_customers_by_nation(
    customer: DataFrame, orders: DataFrame, nation: DataFrame
) -> DataFrame:
    """Customers with ≥1 fulfilled ('F') order, counted per nation —
    LEFT SEMI join against the filtered orders plus a broadcast dim join.
    Output: n_name, customers."""
    fulfilled = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        customer.join(
            fulfilled, customer["c_custkey"] == fulfilled["o_custkey"], "left_semi"
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            customer["c_nationkey"] == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("customers"))
        .orderBy("n_name")
    )


def segment_stats(customer: DataFrame) -> DataFrame:
    """Per-segment customer stats — simple single-table aggregate."""
    return (
        customer.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
            F.round(F.min("c_acctbal"), 2).alias("min_acctbal"),
            F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


def large_orders(
    orders: DataFrame, lineitem: DataFrame, min_qty: float = 250.0
) -> DataFrame:
    """TPC-H Q18-shaped: orders whose total line quantity exceeds
    ``min_qty`` — aggregate-then-HAVING, joined back to the order header.
    The heavy side (lineitem) aggregates BEFORE the join, so the join
    probe is only the few qualifying orderkeys. Output: o_orderkey,
    o_orderdate, o_totalprice, total_qty.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") >= min_qty)
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"])
        .select("o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


def top_supplier_per_nation(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """TPC-H Q15-flavored: each nation's highest-revenue supplier via a
    rank window over the per-supplier aggregate. The window partitions
    by nation AFTER the heavy aggregation (supplier cardinality, not
    lineitem), so the sort is tiny. Ranking uses the rounded revenue +
    suppkey tie-break for cross-engine determinism. Output: n_name,
    s_suppkey, s_name, revenue.
    """
    rev = (
        lineitem.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    joined = (
        rev.join(
            F.broadcast(supplier.select("s_suppkey", "s_name", "s_nationkey")),
            rev["l_suppkey"] == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("n_name").orderBy(F.desc("revenue"), F.asc("s_suppkey"))
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("n_name", "s_suppkey", "s_name", "revenue")
        .orderBy("n_name")
    )


def small_quantity_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q17-shaped: revenue from line items whose quantity is below
    half their part's average quantity — the correlated scalar subquery
    decorrelated into a per-part aggregate joined back to the fact (the
    shape Catalyst itself rewrites correlated subqueries into; stating
    it directly keeps the plan obvious). Per-brand output keeps the
    result set readable. Output: p_brand, small_qty_revenue, line_count.
    """
    per_part = lineitem.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        lineitem.join(per_part, lineitem["l_partkey"] == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            lineitem["l_partkey"] == part["p_partkey"],
        )
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy("p_brand")
    )
