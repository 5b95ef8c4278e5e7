"""Distributed synthetic point-of-sale data generator.

Capability parity with the reference's single-process CSV generator
(`services/batch/generate_synthetic_data.py`): same output schema
(order_id "YYYYMMDD-seq", order_date ISO string, store_id, store_city,
product, quantity 1-5, 2-dp unit_price and amount strings), same
day-per-file layout, promotional discounts on a minority of rows.

Rebuilt Spark-first: ``spark.range(days × tx_per_day)`` plus
deterministic per-row pseudo-randomness derived from ``xxhash64(id,
seed)`` — no driver-side loop, so generating a 10-billion-row test
corpus is the same code as generating the demo's 1,440 rows. Values are
deterministic in (seed, row id) rather than replaying the reference's
Python ``random`` stream; distributions match, exact values don't (the
engine's cleanse/aggregate semantics never depend on them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (product, min_price, max_price) — same shape as the reference catalogue
CATALOGUE: tuple[tuple[str, float, float], ...] = (
    ("espresso beans", 8.5, 14.0),
    ("drip grinder", 29.0, 59.0),
    ("cold brew kit", 18.0, 32.0),
    ("ceramic mug", 6.0, 12.5),
    ("steel tumbler", 14.0, 24.0),
    ("pour-over stand", 22.0, 40.0),
    ("milk frother", 11.0, 21.0),
    ("filter papers", 3.0, 6.5),
)

STORES: tuple[tuple[str, str], ...] = (
    ("S-001", "Springfield"),
    ("S-002", "Riverton"),
    ("S-003", "Lakeside"),
    ("S-004", "Hillcrest"),
)

_DISCOUNTS = (1.0, 1.0, 1.0, 0.9, 0.95)  # occasional promotions


def synthetic_transactions(
    spark: SparkSession,
    days: int = 30,
    tx_per_day: int = 48,
    seed: int = 2024,
    start_date: str = "2024-01-01",
) -> DataFrame:
    """Deterministic synthetic transactions, one row per (day, seq)."""

    def r(salt: int) -> F.Column:
        # independent uniform 31-bit streams per salt, deterministic in id
        return F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt)), F.lit(2**31)).cast(
            "int"
        )

    day = F.date_add(F.lit(start_date).cast("date"), (F.col("id") / tx_per_day).cast("int"))
    seq = (F.col("id") % tx_per_day + 1).cast("int")

    prod_idx = r(1) % len(CATALOGUE)
    product = F.element_at(
        F.array(*[F.lit(p) for p, _, _ in CATALOGUE]), prod_idx + 1
    )
    lo = F.element_at(F.array(*[F.lit(a) for _, a, _ in CATALOGUE]), prod_idx + 1)
    hi = F.element_at(F.array(*[F.lit(b) for _, _, b in CATALOGUE]), prod_idx + 1)
    unit_price = F.round(
        (lo + (r(2) / F.lit(2.0**31)) * (hi - lo))
        * F.element_at(F.array(*[F.lit(d) for d in _DISCOUNTS]), (r(3) % 5) + 1),
        2,
    )
    quantity = (r(4) % 5 + 1).cast("int")
    store_idx = r(5) % len(STORES)

    return spark.range(days * tx_per_day).select(
        F.concat(F.date_format(day, "yyyyMMdd"), F.lit("-"), F.lpad(seq, 4, "0")).alias(
            "order_id"
        ),
        day.cast("string").alias("order_date"),
        F.element_at(F.array(*[F.lit(s) for s, _ in STORES]), store_idx + 1).alias(
            "store_id"
        ),
        F.element_at(F.array(*[F.lit(c) for _, c in STORES]), store_idx + 1).alias(
            "store_city"
        ),
        product.alias("product"),
        quantity.alias("quantity"),
        F.format_string("%.2f", unit_price).alias("unit_price"),
        F.format_string("%.2f", F.round(unit_price * quantity, 2)).alias("amount"),
    )


def write_daily_csvs(df: DataFrame, path: str) -> None:
    """One CSV directory per day (the reference writes one file per day;
    `read_csv_dir`'s recursive scan consumes either layout). The
    partition column is a copy so ``order_date`` stays in the files."""
    df.withColumn("day", F.col("order_date")).repartition("day").write.mode(
        "overwrite"
    ).partitionBy("day").option("header", True).csv(path)


def generate(
    spark: SparkSession,
    path: str,
    days: int = 30,
    tx_per_day: int = 48,
    seed: int = 2024,
    start_date: str = "2024-01-01",
) -> DataFrame:
    """Generate and write the synthetic corpus; returns the DataFrame."""
    df = synthetic_transactions(spark, days, tx_per_day, seed, start_date)
    write_daily_csvs(df, path)
    return df


def _parse_args(argv):
    """CLI twin of the reference's synthetic-data generator service
    (`services/batch/generate_synthetic_data.py` via
    `docker-compose.batch.yml`'s data-generator): same knobs, same
    daily-CSV layout, but generated distributed through the engine."""
    import argparse

    p = argparse.ArgumentParser(description="Generate synthetic daily CSVs")
    p.add_argument("--output", required=True, help="output directory for daily CSVs")
    p.add_argument("--days", type=int, default=30)
    p.add_argument("--transactions-per-day", type=int, default=48, dest="tx_per_day")
    p.add_argument("--seed", type=int, default=2024)
    p.add_argument("--start-date", default="2024-01-01")
    p.add_argument("--master", default=None, help="spark master override")
    return p.parse_args(argv)


def main(argv=None) -> int:
    from data_pipeline_example_spark.session import get_spark

    args = _parse_args(argv)
    spark = get_spark(app_name="datagen", master=args.master)
    generate(
        spark,
        args.output,
        days=args.days,
        tx_per_day=args.tx_per_day,
        seed=args.seed,
        start_date=args.start_date,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
